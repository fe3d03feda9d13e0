"""q218 all-pairs cosine: the two regimes (term-major inverted-index
self-join vs AllPairs/L2AP prefix-filtered candidates) must emit the
IDENTICAL pair set — the prefix filter's zero-false-negative claim —
and the engine-portable integer sqrt must be exactly floor-sqrt."""

from __future__ import annotations

import os

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_01 = "/root/testdata/sf0.01"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_prefix_filter_regime_equals_term_major(spark):
    """Both regimes, both scale dirs the suite touches: the
    prefix-filtered candidate pipeline loses NO qualifying pair and
    invents none (the rescore is exact, so false positives cannot
    survive either)."""
    from polla_spark.plans.llmdata import allpairs_cosine

    for sf in (SF_DIR, SF_01):
        brute = _rows(allpairs_cosine(spark, sf, prefix_filter=False))
        pruned = _rows(allpairs_cosine(spark, sf, prefix_filter=True))
        assert brute == pruned, sf
        assert len(brute) > 0 or sf == SF_DIR  # sf0.01 has real pairs


def test_isqrt_sql_is_exact_floor_sqrt(spark):
    """The ±1-adjusted integer sqrt equals math.isqrt on a sweep that
    includes perfect squares, off-by-one neighbours (the FP-rounding
    hazard cases) and large values."""
    import math

    from pyspark.sql import functions as F

    from polla_spark.plans.llmdata import _isqrt_sql

    vals = []
    # k capped so k*k stays inside BIGINT
    for k in list(range(1, 40)) + [10**6, 10**9, 3 * 10**9]:
        vals += [k * k - 1, k * k, k * k + 1]
    vals = sorted({v for v in vals if v >= 1})
    df = spark.createDataFrame([(v,) for v in vals], "n2 long")
    got = {
        r["n2"]: r["s"]
        for r in df.withColumn(
            "s", F.expr(_isqrt_sql("n2")).cast("long")
        ).collect()
    }
    for v in vals:
        assert got[v] == math.isqrt(v), v


def test_isqrt_sql_matches_duckdb(spark):
    """Same expression text, same results in the oracle engine."""
    import math

    import duckdb

    from polla_spark.plans.llmdata import _isqrt_sql

    con = duckdb.connect()
    vals = [1, 2, 3, 4, 8, 9, 10**6 - 1, 10**6, 10**12, 10**15 + 7]
    for v in vals:
        (s,) = con.sql(
            f"SELECT {_isqrt_sql(str(v))}"
        ).fetchone()
        assert s == math.isqrt(v), v


def test_isqrt_sql_decimal_and_fdiv_dec_are_exact(spark):
    """The DECIMAL(38,0)-typed isqrt and the seeded exact floor-div
    (q226's wide-intermediate path) equal math.isqrt / Python ``//``
    on adversarial (k, n) up to the certified 1e13-docs-per-source
    ceiling — including the magnitudes where Spark's ``div`` operator
    silently wraps."""
    import math

    from pyspark.sql import functions as F

    from polla_spark.plans.llmdata import _fdiv_dec_sql, _isqrt_sql

    cases = []
    for n in [1, 2, 3, 7, 10**6, 3 * 10**9, 10**12, 10**13]:
        for k in {0, 1, n // 2, n - 1, n}:
            if 0 <= k <= n:
                cases.append((k, n))
    df = spark.createDataFrame(
        [(str(k), str(n)) for k, n in cases], "ks string, ns string"
    ).selectExpr(
        "CAST(ks AS DECIMAL(38,0)) AS k", "CAST(ns AS DECIMAL(38,0)) AS n"
    )
    big = "CAST(1000000000000 AS DECIMAL(38,0)) * (k * (n - k) + n)"
    got = df.select(
        "k",
        "n",
        F.expr(_fdiv_dec_sql(f"({big})", "n")).alias("a"),
        F.expr(
            _isqrt_sql(_fdiv_dec_sql(f"({big})", "n"), t="DECIMAL(38,0)")
        ).alias("s"),
    ).collect()
    for r in got:
        k, n = int(r["k"]), int(r["n"])
        truth = (10**12 * (k * (n - k) + n)) // n
        assert int(r["a"]) == truth, (k, n)
        assert int(r["s"]) == math.isqrt(truth), (k, n)


def test_q226_wilson_headroom_matches_duckdb_at_1e13(spark):
    """source_quality_leaderboard on a LITERAL census with sources up
    to the certified 10^13-doc ceiling: Spark's DECIMAL(38,0) path
    (exact floor-div + certificate) and the DuckDB oracle's HUGEINT
    path must agree row for row — the r10 ADVICE item, where the old
    ``div`` quotient silently wrapped from ~3.7e7 docs/source."""
    import duckdb

    from polla_spark.plans.llmdata import source_quality_leaderboard

    census = [
        ("tiny", 3, 3),
        ("mid", 100, 90),
        ("wrapzone", 10**8, 6 * 10**7),  # old silent-wrap territory
        ("big", 6 * 10**9, 3 * 10**9),  # old loud-product ceiling
        ("huge", 10**13, 9 * 10**12),  # the certified ceiling
    ]
    cdf = spark.createDataFrame(census, "source string, n_docs long, n_pass long")
    got = [
        (r["source"], r["n_docs"], r["n_pass"], r["pass_ppm"], r["wilson_lb_ppm"])
        for r in source_quality_leaderboard(cdf).collect()
    ]
    con = duckdb.connect()
    from polla_spark.plans.llmdata import _isqrt_sql

    root = _isqrt_sql(
        "((CAST(1000000000000 AS HUGEINT) * "
        "(CAST(n_pass AS HUGEINT) * (n_docs - n_pass) + n_docs)) "
        "// n_docs)",
        t="HUGEINT",
    )
    vals = ", ".join(f"('{s}', {n}, {k})" for s, n, k in census)
    want = con.sql(
        f"""
        SELECT source, n_docs, n_pass,
               CAST(CAST(n_pass AS HUGEINT) * 1000000 // n_docs AS BIGINT),
               CAST(((CAST(n_pass AS HUGEINT) + 2) * 1000000 - 2 * {root})
                    // (n_docs + 4) AS BIGINT)
        FROM (VALUES {vals}) AS t(source, n_docs, n_pass)
        ORDER BY 5 DESC, source
        """
    ).fetchall()
    assert got == [tuple(w) for w in want]
    # sanity: Wilson must rank 90/100 above 3/3 (the whole point)
    order = [g[0] for g in got]
    assert order.index("mid") < order.index("tiny")


def test_auto_regime_picks_term_major_on_flat_df(spark):
    """On the flat-df test corpora the census statistic (mean posting
    df ~30 at sf0.001) sits far below the switch threshold, so the
    registered auto form must build the term-major plan and return
    the identical rows."""
    from polla_spark.plans.llmdata import (
        _aps_postings,
        allpairs_cosine,
        choose_aps_regime,
    )

    _, _, stats = _aps_postings(spark, SF_DIR)
    spark.catalog.clearCache()
    assert choose_aps_regime(stats) == "term"
    auto = _rows(allpairs_cosine(spark, SF_DIR))
    assert auto == _rows(allpairs_cosine(spark, SF_DIR, prefix_filter=False))


def test_auto_regime_switches_on_zipf_head(spark, tmp_path):
    """A shared hot bigram (df = corpus size) drives mean posting df
    past the switch threshold: the auto form must pick the
    prefix-filter regime, and — the whole point of the pinned-equal
    regimes — the answer must not change."""
    from pyspark.sql import functions as F

    from polla_spark.plans.llmdata import (
        _aps_postings,
        allpairs_cosine,
        choose_aps_regime,
    )

    n = 4500  # head cutoff is df > 4096
    rows = [(i, f"hh hh hh u{i} v{i} w{i} x{i}") for i in range(n)]
    # one genuine near-dup pair so the qualifying set is non-empty
    rows += [(n, "aa bb cc dd ee ff"), (n + 1, "aa bb cc dd ee ff")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    d = str(tmp_path)

    _, _, stats = _aps_postings(spark, d)
    spark.catalog.clearCache()
    assert stats["max_df"] == n  # the Zipf head: 'hh hh' in every doc
    # head dominance: the hot bigram's df^2 dwarfs the unique tail
    assert stats["sum_df2"] - stats["sum_df2_tail"] > stats["sum_df2_tail"]
    # tail sparsity: every non-hot bigram is doc-unique (df ~ 1)
    assert stats["sum_df2_tail"] / stats["n_postings"] < 32
    assert choose_aps_regime(stats) == "prefix"

    auto = _rows(allpairs_cosine(spark, d))
    spark.catalog.clearCache()
    brute = _rows(allpairs_cosine(spark, d, prefix_filter=False))
    assert len(brute) >= 1  # the planted duplicate pair qualifies
    assert auto == brute


def test_choose_aps_regime_rule():
    """The decision tree, against the measured census shapes
    (docs/scale_allpairs_r10.json): prefix ONLY when the df head
    dominates sum(df^2) AND the tail is sparse; a head over a DENSE
    tail goes to the skew-split grid (r11) — the prefix rescore is
    the plan that died on disk at 20x on the dense corpus, and plain
    term-major ate the measured 1301 s head straggler."""
    from polla_spark.plans.llmdata import choose_aps_regime

    # the real sf0.1 flat census: no head, dense tail -> term-major
    flat = {"n_postings": 256_477, "sum_df2": 73_200_955.0,
            "sum_df2_tail": 73_200_955.0, "max_df": 338}
    assert choose_aps_regime(flat) == "term"
    # 20x constant density: all stats grow 20x -> same decision
    flat20 = {k: v * 20 for k, v in flat.items()}
    assert choose_aps_regime(flat20) == "term"
    # DENSE-tail Zipf: a 30k-df head over the flat-20x tail. Head
    # dominates, but the tail's own candidate volume is the measured
    # prefix disk-killer -> skew-split term-major: the tail keeps the
    # spill-proof self-join, the head splits into bounded chunk grids
    dense_zipf = {"n_postings": 5_369_540, "sum_df2": 7.76e9,
                  "sum_df2_tail": 1.46e9, "max_df": 30_000}
    assert choose_aps_regime(dense_zipf) == "skew"
    # SPARSE-tail Zipf: same head, doc-unique tail -> prefix
    sparse_zipf = {"n_postings": 6_200_000, "sum_df2": 6.3e9,
                   "sum_df2_tail": 1.3e7, "max_df": 30_000}
    assert choose_aps_regime(sparse_zipf) == "prefix"


def test_skew_regime_equals_both_on_split_corpus(spark, tmp_path):
    """The skew-split grid must emit the IDENTICAL pair set on a
    corpus where the split genuinely activates (a head bigram with
    df = 4502 > 4096 splits into a 2x2 chunk grid) — and the grid
    must not double- or zero-count pairs that share BOTH head and
    tail terms (every doc pair here shares the head bigram)."""
    from polla_spark.plans.llmdata import _aps_postings, allpairs_cosine

    n = 4500
    rows = [(i, f"hh hh hh u{i} v{i} w{i} x{i}") for i in range(n)]
    rows += [(n, "aa bb cc dd ee ff"), (n + 1, "aa bb cc dd ee ff")]
    # a planted near-dup pair that ALSO carries the head bigram, so
    # its dot product crosses the head/tail branch boundary
    rows += [
        (n + 2, "hh hh hh pp qq rr ss tt"),
        (n + 3, "hh hh hh pp qq rr ss tt"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    d = str(tmp_path)

    skew = _rows(allpairs_cosine(spark, d, regime="skew"))
    spark.catalog.clearCache()
    brute = _rows(allpairs_cosine(spark, d, regime="term"))
    spark.catalog.clearCache()
    pruned = _rows(allpairs_cosine(spark, d, regime="prefix"))
    spark.catalog.clearCache()
    assert len(brute) >= 2  # both planted pairs qualify
    assert skew == brute == pruned
    # and the cross-branch pair is present (dot spans head + tail):
    # _rows sorts columns by name -> (cos2_ppm, doc_a, doc_b, ...)
    pairs = {(r[1], r[2]) for r in brute}
    assert (n + 2, n + 3) in pairs

    _, _, stats = _aps_postings(spark, d)
    spark.catalog.clearCache()
    assert stats["max_df"] == n + 2  # the head term really is a head


def test_auto_regime_picks_skew_on_head_over_dense_tail(spark, tmp_path):
    """A head bigram in every doc OVER a dense shared tail (mean tail
    df ~ 45 > 32): auto must pick the skew-split grid — prefix is the
    measured disk-killer on dense tails — and the answer must match
    plain term-major row for row."""
    from polla_spark.plans.llmdata import (
        _aps_postings,
        allpairs_cosine,
        choose_aps_regime,
    )

    n = 4500
    rows = [
        (i, f"hh hh hh m{i % 50} m{(i + 1) % 50} u{i}") for i in range(n)
    ]
    rows += [(n, "aa bb cc dd ee ff"), (n + 1, "aa bb cc dd ee ff")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    d = str(tmp_path)

    _, _, stats = _aps_postings(spark, d)
    spark.catalog.clearCache()
    tail = stats["sum_df2_tail"]
    assert stats["sum_df2"] - tail > tail  # head dominates
    assert tail / stats["n_postings"] > 32  # dense tail
    assert choose_aps_regime(stats) == "skew"

    auto = _rows(allpairs_cosine(spark, d))
    spark.catalog.clearCache()
    brute = _rows(allpairs_cosine(spark, d, regime="term"))
    assert len(brute) >= 1
    assert auto == brute


def test_allpairs_empty_corpus_degrades_gracefully(spark, tmp_path):
    """An all-null-text documents table: the census sums are NULL on
    both engines — the regime rule and partition sizing must coalesce
    them to 0 and return an EMPTY result through the term-major
    branch, not TypeError (r10 ADVICE item)."""
    spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from polla_spark.plans.llmdata import allpairs_cosine

    out = allpairs_cosine(spark, str(tmp_path))
    assert out.count() == 0
    spark.catalog.clearCache()
