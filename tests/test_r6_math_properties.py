"""Property-based armor for round-6 algorithmic rewrites.

Both tests mirror the exact integer arithmetic the Spark plans use
(q127's PPJoin filters, q134's endpoint sweep) in pure Python and
fuzz them with hypothesis against brute force — the oracle parity
checks catch corpus-level regressions, these catch the adversarial
edge cases a fixed corpus never hits (tie-heavy starts, boundary
Jaccard values, prefix collisions at the last slot).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# q127: PPJoin prefix + length + positional filters are exact for τ = 4/5
# ---------------------------------------------------------------------------


def _prefix_len(n: int) -> int:
    # n - ⌈4n/5⌉ + 1, in the plan's integer form
    return n - (4 * n + 4) // 5 + 1


def _ppjoin_keeps(A: list[int], B: list[int]) -> bool:
    """Mirror of the q127 candidate join: elements are ints whose
    value IS their global (df, shingle) rank; returns True iff at
    least one prefix-collision row survives all three filters."""
    na, nb = len(A), len(B)
    if not (5 * nb >= 4 * na and 5 * na >= 4 * nb):  # length filter
        return False
    pa = {e: i + 1 for i, e in enumerate(sorted(A))}  # rn, 1-based
    pb = {e: i + 1 for i, e in enumerate(sorted(B))}
    pref_a = {e for e, r in pa.items() if r <= _prefix_len(na)}
    pref_b = {e for e, r in pb.items() if r <= _prefix_len(nb)}
    alpha = (4 * (na + nb) + 8) // 9  # ⌈4(na+nb)/9⌉
    return any(
        1 + min(na - pa[e], nb - pb[e]) >= alpha
        for e in pref_a & pref_b  # prefix filter: collision rows only
    )


@st.composite
def _similar_pair(draw):
    """Set pairs biased toward the τ = 4/5 decision boundary: a base
    set plus a few element swaps/drops/adds, over a small universe so
    overlaps are common."""
    universe = st.integers(0, 60)
    base = draw(st.sets(universe, min_size=5, max_size=40))
    a = set(base)
    b = set(base)
    for target in (a, b):
        for _ in range(draw(st.integers(0, 3))):
            op = draw(st.integers(0, 2))
            if op == 0 and len(target) > 1:
                target.remove(draw(st.sampled_from(sorted(target))))
            elif op == 1:
                target.add(draw(universe))
    return sorted(a), sorted(b)


@settings(max_examples=500, deadline=None)
@given(_similar_pair())
def test_ppjoin_filters_never_drop_a_qualifying_pair(pair):
    A, B = pair
    inter = len(set(A) & set(B))
    union = len(set(A) | set(B))
    qualifying = 5 * inter >= 4 * union  # Jaccard ≥ 4/5, exact
    if qualifying:
        assert _ppjoin_keeps(A, B), (
            f"false negative: J={inter}/{union} but filters dropped "
            f"A={A} B={B}"
        )


def test_ppjoin_filters_actually_prune():
    """The filters must DO something: over a seeded batch of random
    set pairs (mostly non-qualifying), a substantial fraction must be
    pruned before the exact rescore — a regression that made the
    filters vacuous (always-true predicates) would keep every pair
    and silently revert q127 to prefix-only candidate volume, which
    the zero-false-negative property test above cannot detect."""
    import random

    rng = random.Random(1234)
    kept = total = 0
    for _ in range(300):
        a = set(rng.sample(range(80), rng.randint(5, 30)))
        b = set(rng.sample(range(80), rng.randint(5, 30)))
        total += 1
        if _ppjoin_keeps(sorted(a), sorted(b)):
            kept += 1
    assert kept < total * 0.5, f"filters barely prune: {kept}/{total}"


# ---------------------------------------------------------------------------
# q134: endpoint-union sweep counts overlap pairs exactly
# ---------------------------------------------------------------------------


def _sweep_count(intervals: list[tuple[int, int]]) -> int:
    """Mirror of the q134 plan: one pass over the sorted endpoint
    union; a start at time x sees ends-at-x AFTER it (kind 0 < 1), so
    ends_before counts only t_j < x — t_j == s_i counts as overlap."""
    pts = []
    for uid, (s, t) in enumerate(intervals):
        pts.append((s, 0, uid))
        pts.append((t, 1, uid))
    starts_upto = ends_before = 0
    total = 0
    for _, kind, _ in sorted(pts):
        if kind == 0:
            starts_upto += 1
            total += starts_upto - 1 - ends_before
        else:
            ends_before += 1
    return total


@settings(max_examples=500, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 50)).map(
            lambda p: (min(p), max(p))
        ),
        min_size=0,
        max_size=25,
    )
)
def test_sweep_pair_count_matches_brute_force(intervals):
    brute = sum(
        1
        for i in range(len(intervals))
        for j in range(i + 1, len(intervals))
        if intervals[i][0] <= intervals[j][1]
        and intervals[j][0] <= intervals[i][1]
    )
    assert _sweep_count(intervals) == brute, intervals


def test_kmv_estimator_accuracy_on_large_synthetic(spark):
    """KMV's statistical contract on a 20k-distinct synthetic set:
    the estimate is deterministic (seeded hashes), so this pins a
    FIXED accuracy — |est - n| / n must sit well inside a few RSE
    (1/sqrt(K-2) ~ 6.3% at K=256). A hash-fold or estimator
    regression moves the estimate far outside this envelope."""
    from polla_spark.functions.kmv import kmv_estimate, kmv_minima

    n = 20_000
    df = spark.createDataFrame(
        [("s", f"item-{i}") for i in range(n)], "scope string, term string"
    )
    row = kmv_estimate(kmv_minima(df)).first()
    assert row["n_kept"] == 256
    rel_err = abs(row["est"] - n) / n
    assert rel_err < 0.20, (row["est"], rel_err)


def test_bpe_single_pass_merge_semantics(spark):
    """q199's merge application contract on crafted sequences: the
    relational regexp_replace pass equals a Python reference doing
    ONE left-to-right non-overlapping scan with consumed delimiters —
    a merge eats both surrounding spaces, so the IMMEDIATELY following
    pair is skipped too (' a a a a ' and ' e r e r ' each merge once
    per pass), the precise semantics the q199 docstring discloses."""
    from pyspark.sql import functions as F

    def ref_merge(repr_, a, b):
        # consumed-delimiter semantics: a match eats BOTH surrounding
        # spaces, so the pair starting at the very next token has no
        # leading delimiter left and cannot match in the same pass
        toks = repr_.strip().split(" ")
        out, i, blocked = [], 0, False
        while i < len(toks):
            if (not blocked and i + 1 < len(toks)
                    and toks[i] == a and toks[i + 1] == b):
                out.append(a + b)
                i += 2
                blocked = True
            else:
                out.append(toks[i])
                i += 1
                blocked = False
        return " " + " ".join(out) + " "

    cases = [
        (" a a a </w> ", "a", "a"),
        (" a a a a </w> ", "a", "a"),
        (" e r e r </w> ", "e", "r"),
        (" x e r y e r </w> ", "e", "r"),
        (" e r </w> ", "r", "</w>"),
        (" q </w> ", "e", "r"),
    ]
    df = spark.createDataFrame(cases, "repr string, a string, b string")
    got = df.select(
        "repr", "a", "b",
        F.regexp_replace(
            "repr",
            F.concat(F.lit(" "), F.col("a"), F.lit(" "), F.col("b"), F.lit(" ")),
            F.concat(F.lit(" "), F.col("a"), F.col("b"), F.lit(" ")),
        ).alias("merged"),
    ).collect()
    for r in got:
        assert r["merged"] == ref_merge(r["repr"], r["a"], r["b"]), r


def test_greedy_cover_matches_python_reference(spark):
    """q201's greedy trace on sf0.001, re-derived by an independent
    Python set-cover implementation over the same (doc, shingle)
    sets: picks and gains must match exactly, and greedy gains are
    non-increasing (submodularity)."""
    from pyspark.sql import functions as F

    from polla_spark.plans.llmdata import (
        _shingles_expr,
        _toks,
        q201_coverage_selection,
    )
    from polla_spark.session import read_table

    got = q201_coverage_selection(spark, "/root/testdata/sf0.001").collect()
    d = (
        read_table(spark, "/root/testdata/sf0.001", "documents")
        .withColumn("_toks", _toks())
        .withColumn("sh", F.array_distinct(F.expr(_shingles_expr())))
        .select("doc_id", "sh")
        .collect()
    )
    sets = {r["doc_id"]: set(r["sh"]) for r in d}
    covered: set = set()
    universe = set().union(*sets.values())
    want = []
    for rnd in (1, 2, 3):
        if covered >= universe:
            break  # q201 contract: an exhausted round emits no row
        best = max(
            sets.items(), key=lambda kv: (len(kv[1] - covered), -kv[0])
        )
        want.append((rnd, best[0], len(best[1] - covered)))
        covered |= best[1]
    assert [(r["round"], r["doc_id"], r["gain"]) for r in got] == want
    gains = [g for _, _, g in want]
    assert gains == sorted(gains, reverse=True)


def test_bpe_tokenize_matches_python_reference(spark):
    """q210's trained-tokenizer application pinned against a
    from-scratch Python BPE (train 3 merges on the top-100 census,
    apply single-pass merges to every word, top-20 token census) over
    an independently-derived word census — the q207/q201 discipline:
    the DuckDB oracle proves engine portability, the Python reference
    proves the algorithm."""
    import os
    from collections import Counter

    import duckdb

    from polla_spark.plans.llmdata import q210_bpe_tokenize

    sf = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    census = dict(con.execute(f"""
        SELECT w, COUNT(*) FROM (
          SELECT unnest(regexp_split_to_array(text, '\\s+')) AS w
          FROM read_parquet('{sf}/documents.parquet')
        ) WHERE regexp_matches(w, '^[a-z]+$') GROUP BY 1
    """).fetchall())

    def ref_merge(toks, a, b):
        out, i, blocked = [], 0, False
        while i < len(toks):
            if (not blocked and i + 1 < len(toks)
                    and toks[i] == a and toks[i + 1] == b):
                out.append(a + b)
                i += 2
                blocked = True
            else:
                out.append(toks[i])
                i += 1
                blocked = False
        return out

    top100 = sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    reprs = {w: list(w) + ["</w>"] for w, _ in top100}
    merges = []
    for _ in range(3):
        pairs = Counter()
        for w, c in top100:
            t = reprs[w]
            for k in range(len(t) - 1):
                pairs[(t[k], t[k + 1])] += c
        (a, b), _n = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b))
        for w in reprs:
            reprs[w] = ref_merge(reprs[w], a, b)

    # n_words = DISTINCT-WORD support (a token twice in one word
    # counts that word once) — the documented report semantics
    tok_census = Counter()
    word_support = Counter()
    for w, c in census.items():
        t = list(w) + ["</w>"]
        for a, b in merges:
            t = ref_merge(t, a, b)
        for tok in t:
            tok_census[tok] += c
        for tok in set(t):
            word_support[tok] += 1
    want = sorted(
        ((tok, n, word_support[tok]) for tok, n in tok_census.items()),
        key=lambda r: (-r[1], r[0]),
    )[:20]
    got = [(r["token"], r["total"], r["n_words"])
           for r in q210_bpe_tokenize(spark, sf).collect()]
    assert got == want, (got[:5], want[:5])
