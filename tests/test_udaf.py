"""The GROUPED_AGG pandas UDAF surface: the Python weighted-median
kernel must match the native histogram-rank plan bit-for-bit — the
same prototype-vs-production contract as the chunking UDTF."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_weighted_median_udaf_equals_native_plan(spark):
    from polla_spark.functions.udaf import weighted_median_udaf
    from polla_spark.plans.relational import q140_weighted_median, t

    li = t(spark, SF, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor("l_quantity").cast("long").alias("w"),
    )
    got = {
        r["l_returnflag"]: r["wm"]
        for r in li.groupBy("l_returnflag")
        .agg(weighted_median_udaf("cents", "w").alias("wm"))
        .collect()
    }
    want = {
        r["l_returnflag"]: r["wmedian_cents"]
        for r in q140_weighted_median(spark, SF).collect()
    }
    assert got == want
    assert len(want) >= 2
