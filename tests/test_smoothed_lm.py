"""q213 interpolated absolute-discounting LM filter pinned against a
from-scratch Python scorer (the q207/q210/q212 discipline: DuckDB
proves cross-engine portability, an independent reference proves the
arithmetic). The reference reads raw text through DuckDB and
re-implements tokenization, censuses, discounting and back-off with
plain dicts — no polla_spark code on the reference path."""

from __future__ import annotations

import os
import re
from collections import Counter, defaultdict

import duckdb

DPPM = 750_000
PPM = 1_000_000


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text)


def _py_smoothed_lm(rows):
    """rows: [(doc_id, text)] -> bottom-20 [(doc_id, n_tri, n_ctx3,
    sum_p_ppm, avg_p_ppm)] replaying q213's documented model: docs
    with >=3 tokens; reference slice doc_id % 10 == 0; one floor
    division per level; context-unseen rows back off a full level."""
    docs = [
        (did, _toks(text)) for did, text in rows
        if text is not None and len(_toks(text)) >= 3
    ]
    ref = [(did, tk) for did, tk in docs if did % 10 == 0]
    c1, c23, c123 = Counter(), Counter(), Counter()
    for _, tk in ref:
        c1.update(tk)
        c23.update(zip(tk, tk[1:]))
        c123.update(zip(tk, tk[1:], tk[2:]))
    n_total = sum(c1.values())
    p1 = {w: (PPM * c) // n_total for w, c in c1.items()}
    c12, n1p2 = Counter(), defaultdict(set)
    for (a, b), c in c23.items():
        c12[a] += c
        n1p2[a].add(b)
    c12t, n1p3 = Counter(), defaultdict(set)
    for (a, b, c3), c in c123.items():
        c12t[(a, b)] += c
        n1p3[(a, b)].add(c3)

    def p2(a: str, b: str) -> int:
        if a not in c12:
            return p1.get(b, 0)
        disc = max(PPM * c23.get((a, b), 0) - DPPM, 0)
        interp = (DPPM * len(n1p2[a]) * p1.get(b, 0)) // PPM
        return (disc + interp) // c12[a]

    def p3(a: str, b: str, c: str) -> int:
        if (a, b) not in c12t:
            return p2(b, c)
        disc = max(PPM * c123.get((a, b, c), 0) - DPPM, 0)
        interp = (DPPM * len(n1p3[(a, b)]) * p2(b, c)) // PPM
        return (disc + interp) // c12t[(a, b)]

    out = []
    for did, tk in docs:
        if did % 10 == 0:
            continue
        grams = list(zip(tk, tk[1:], tk[2:]))
        s = sum(p3(*g) for g in grams)
        n_ctx3 = sum(1 for g in grams if (g[0], g[1]) in c12t)
        out.append((did, len(grams), n_ctx3, s, s // len(grams)))
    out.sort(key=lambda r: (r[4], r[0]))
    return out[:20]


def test_q213_matches_independent_python_scorer(spark):
    from polla_spark.plans.llmdata import q213_smoothed_lm_filter

    sf = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet') "
        f"ORDER BY doc_id"
    ).fetchall()
    want = _py_smoothed_lm(rows)
    got = [tuple(r) for r in q213_smoothed_lm_filter(spark, sf).collect()]
    assert got == want
    assert len(got) == 20
    # discounting actually engaged: at least one scored doc saw a known
    # trigram context (else the whole report degenerated to back-off)
    assert any(r[2] > 0 for r in got)


def test_smoothed_probabilities_bounded_and_backoff_ordered():
    """Model sanity on a crafted corpus: every conditional is in
    [0, 1e6]; an unseen trigram in a seen context scores BELOW the
    same trigram when observed; unseen context backs off exactly to
    the lower order."""
    rows = [
        (0, "a b c a b c a b d"),          # reference doc (id % 10 == 0)
        (10, "x y z x y z"),               # second reference doc
        (1, "a b c"),                      # seen trigram
        (2, "a b x"),                      # unseen trigram, seen context
        (3, "q q q"),                      # fully unseen
    ]
    got = {r[0]: r for r in _py_smoothed_lm(rows)}
    for did, (_, n_tri, _, s, avg) in got.items():
        assert 0 <= avg <= PPM, did
        assert 0 <= s <= n_tri * PPM, did
    assert got[1][3] > got[2][3] > got[3][3]
