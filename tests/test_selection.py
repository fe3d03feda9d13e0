"""Greedy coverage selection (operators/selection.py) — the pluggable
covered-set backends behind q201: exact distinct-frame vs the q183
bloom word table (the fixed-size 100 TB form)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polla_spark.operators.selection import coverage_selection

SF = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def _doc_tok(spark):
    from polla_spark.plans.llmdata import _with_shingle_sets

    d = _with_shingle_sets(spark.read.parquet(f"{SF}/documents.parquet"))
    return d.select("doc_id", F.explode("sh").alias("sh"))


def test_bloom_trace_equals_exact_on_documents(spark):
    # one-sided bloom error: covered shingles always hit, so at this
    # filter load (2 KB table, corpus-sized key set) no false positive
    # lands on a gain-deciding shingle — the greedy traces are
    # IDENTICAL. This is the pinned sketch-vs-exact agreement the
    # round-6 verdict asked for (its task #2).
    tok = _doc_tok(spark)
    exact = [tuple(r) for r in coverage_selection(tok, 3).collect()]
    bloom = [
        tuple(r)
        for r in coverage_selection(tok, 3, covered="bloom").collect()
    ]
    assert len(exact) == 3
    assert bloom == exact


def test_exact_backend_is_q201(spark):
    # q201 now delegates to the shared operator — same trace
    from polla_spark.plans.llmdata import q201_coverage_selection

    got = [tuple(r) for r in q201_coverage_selection(spark, SF).collect()]
    tok = _doc_tok(spark)
    want = [tuple(r) for r in coverage_selection(tok, 3).collect()]
    assert got == want


def test_synthetic_greedy_picks_and_exhaustion(spark):
    # doc 1 covers {a,b,c}, doc 2 {c,d}, doc 3 {a}: greedy picks
    # 1 (gain 3) then 2 (gain 1: only d is new); round 3 has zero
    # uncovered shingles left -> NO row (exhausted-coverage contract)
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "c"), (2, "d"), (3, "a")]
    tok = spark.createDataFrame(rows, "doc_id long, sh string")
    for mode in ("exact", "bloom"):
        trace = [
            tuple(r) for r in coverage_selection(tok, 3, covered=mode).collect()
        ]
        assert trace == [(1, 1, 3), (2, 2, 1)], (mode, trace)


def test_bloom_covered_state_is_bounded(spark):
    # the whole point of the bloom backend: the covered set is the
    # <=2048-row word table no matter how much is covered
    from polla_spark.functions.bloom import BLOOM_BITS

    tok = _doc_tok(spark)
    picked = tok.limit(5000)
    from polla_spark.functions.bloom import bloom_word_table

    words = bloom_word_table(picked.select(F.md5("sh").alias("hh")))
    assert words.count() <= BLOOM_BITS // 32


def test_rejects_bad_args(spark):
    tok = spark.createDataFrame([(1, "a")], "doc_id long, sh string")
    with pytest.raises(ValueError, match="covered"):
        coverage_selection(tok, 2, covered="kmv")
    with pytest.raises(ValueError, match="k must be"):
        coverage_selection(tok, 0)


def _independent_fs_census(sf_dir):
    """Agreement-pattern census computed WITHOUT any polla_spark code:
    DuckDB SQL written from the comparator definitions (raw-text \\s+
    tokenizer = production TOKS geometry, NOT lowercased; 24-char
    title-prefix bigrams for the 4th field)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute("""
        WITH docs AS (
          SELECT doc_id, lang, source, n_chars,
                 list_distinct(list_transform(
                   generate_series(1, greatest(
                     len(regexp_split_to_array(text, '\\s+')) - 2, 1)),
                   i -> concat_ws(' ',
                     regexp_split_to_array(text, '\\s+')[i],
                     regexp_split_to_array(text, '\\s+')[i+1],
                     regexp_split_to_array(text, '\\s+')[i+2])
                 )) AS sh,
                 list_distinct(list_transform(
                   generate_series(1, greatest(length(text[1:24]) - 1, 1)),
                   i -> text[1:24][i:i+1]
                 )) AS bg
          FROM documents
        ), neigh AS (
          SELECT source AS source_a, n_chars AS nc_a, sh AS sa, bg AS ba, i,
                 LEAD(doc_id, i) OVER w AS doc_b,
                 LEAD(source, i) OVER w AS source_b,
                 LEAD(n_chars, i) OVER w AS nc_b,
                 LEAD(sh, i) OVER w AS sb,
                 LEAD(bg, i) OVER w AS bb
          FROM docs CROSS JOIN (SELECT unnest([1, 2, 3]) AS i) t
          WINDOW w AS (PARTITION BY lang, i ORDER BY n_chars NULLS FIRST, doc_id)
        )
        SELECT CASE WHEN source_a = source_b THEN 1 ELSE 0 END,
               CASE WHEN abs(nc_a - nc_b) * 20 <= nc_a + nc_b THEN 1 ELSE 0 END,
               CASE WHEN 2 * len(list_intersect(sa, sb))
                    >= len(sa) + len(sb) - len(list_intersect(sa, sb))
                    THEN 1 ELSE 0 END,
               CASE WHEN 2 * len(list_intersect(ba, bb))
                    >= least(len(ba), len(bb)) THEN 1 ELSE 0 END,
               COUNT(*)
        FROM neigh WHERE doc_b IS NOT NULL GROUP BY 1, 2, 3, 4
    """).fetchall()


def _python_em(census, init, rounds):
    """From-scratch integer-ppm Winkler EM (no polla_spark code).
    census rows: (*flags, count). Yields (p, m[...], u[...]) per
    round, after the init round."""
    M = 1_000_000
    nf = len(census[0]) - 1
    p, m, u = init["p"], [init["m"]] * nf, [init["u"]] * nf
    for _ in range(rounds):
        sw = snw = n = 0
        swg, snwg = [0] * nf, [0] * nf
        for *gs, c in census:
            pm = p
            pu = M - p
            for k in range(nf):
                pm *= m[k] if gs[k] else M - m[k]
                pu *= u[k] if gs[k] else M - u[k]
            w = pm * M // (pm + pu)
            sw += w * c
            snw += (M - w) * c
            n += c
            for k in range(nf):
                swg[k] += w * c * gs[k]
                snwg[k] += (M - w) * c * gs[k]
        p = sw // n
        m = [swg[k] * M // sw for k in range(nf)]
        u = [snwg[k] * M // snw for k in range(nf)]
        yield p, list(m), list(u)


def test_q207_em_matches_independent_python_reference(spark):
    """q207's 2 unrolled EM rounds (4 comparator fields) pinned
    against a from-scratch Python implementation of Winkler's EM over
    an independently-derived agreement census (the q199/q201
    discipline: engine-vs-engine hash equality proves portability, an
    INDEPENDENT reference proves the algorithm itself)."""
    from polla_spark.functions.linkage import EM_INIT
    from polla_spark.plans.llmdata import q207_fs_em_weights

    got = {
        r["round"]: (r["p"], r["m1"], r["m2"], r["m3"], r["m4"],
                     r["u1"], r["u2"], r["u3"], r["u4"])
        for r in q207_fs_em_weights(spark, SF).collect()
    }
    census = _independent_fs_census(SF)
    assert got[0] == (EM_INIT["p"], *([EM_INIT["m"]] * 4), *([EM_INIT["u"]] * 4))
    for rnd, (p, m, u) in enumerate(_python_em(census, EM_INIT, 2), start=1):
        assert got[rnd] == (p, *m, *u), (rnd, got[rnd], (p, *m, *u))


def test_q208_posteriors_match_independent_python_reference(spark):
    """q208's pattern-level posterior table pinned against the same
    independent Python EM: train 2 rounds from scratch, compute each
    census pattern's exact-ppm posterior, and check every (pattern ->
    w_ppm) pair q208 assigned — plus the threshold verdicts."""
    from polla_spark.functions.linkage import (
        EM_INIT, LINK_PPM, POSSIBLE_PPM,
    )
    from polla_spark.plans.llmdata import q208_fs_trained_classify

    census = _independent_fs_census(SF)
    p, m, u = list(_python_em(census, EM_INIT, 2))[-1]
    M = 1_000_000

    def posterior(gs):
        pm, pu = p, M - p
        for k in range(4):
            pm *= m[k] if gs[k] else M - m[k]
            pu *= u[k] if gs[k] else M - u[k]
        return pm * M // (pm + pu)

    want_w = {tuple(gs): posterior(gs) for *gs, _ in census}
    rows = q208_fs_trained_classify(spark, SF).collect()
    n_pairs = sum(c for *_, c in census)
    assert len(rows) == n_pairs
    seen_w = {r["w_ppm"] for r in rows}
    assert seen_w <= set(want_w.values())
    for r in rows:
        w = r["w_ppm"]
        want_v = ("link" if w >= LINK_PPM
                  else "possible" if w >= POSSIBLE_PPM else "non_link")
        assert r["verdict"] == want_v, (r, want_v)
