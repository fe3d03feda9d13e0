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
    assert choose_aps_regime(stats) is False
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
    assert choose_aps_regime(stats) is True

    auto = _rows(allpairs_cosine(spark, d))
    spark.catalog.clearCache()
    brute = _rows(allpairs_cosine(spark, d, prefix_filter=False))
    assert len(brute) >= 1  # the planted duplicate pair qualifies
    assert auto == brute


def test_choose_aps_regime_rule():
    """The two-condition rule, against the measured census shapes
    (docs/scale_allpairs_r10.json): prefix ONLY when the df head
    dominates sum(df^2) AND the tail is sparse. A head over a dense
    tail stays term-major — the prefix rescore is the plan that died
    on disk at 20x on the dense corpus, head or no head."""
    from polla_spark.plans.llmdata import choose_aps_regime

    # the real sf0.1 flat census: no head, dense tail -> term-major
    flat = {"n_postings": 256_477, "sum_df2": 73_200_955.0,
            "sum_df2_tail": 73_200_955.0, "max_df": 338}
    assert choose_aps_regime(flat) is False
    # 20x constant density: all stats grow 20x -> same decision
    flat20 = {k: v * 20 for k, v in flat.items()}
    assert choose_aps_regime(flat20) is False
    # DENSE-tail Zipf: a 30k-df head over the flat-20x tail. Head
    # dominates, but the tail's own candidate volume is the measured
    # disk-killer -> still term-major (stragglers beat disk death)
    dense_zipf = {"n_postings": 5_369_540, "sum_df2": 7.76e9,
                  "sum_df2_tail": 1.46e9, "max_df": 30_000}
    assert choose_aps_regime(dense_zipf) is False
    # SPARSE-tail Zipf: same head, doc-unique tail -> prefix
    sparse_zipf = {"n_postings": 6_200_000, "sum_df2": 6.3e9,
                   "sum_df2_tail": 1.3e7, "max_df": 30_000}
    assert choose_aps_regime(sparse_zipf) is True
