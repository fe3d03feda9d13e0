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
