"""Runtime Bloom-filter semi-join reduction (operators/runtime_filter):
the optimizer must inject a ``might_contain`` gate on the FACT side,
fed by ``bloom_filter_agg`` over the FILTERED dim keys, and the gated
plan must return exactly the plain join's answer (false positives cost
shuffle rows, never correctness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polla_spark.operators.runtime_filter import forced_runtime_bloom

SF = "/root/testdata/sf0.001"


def _join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty"),
        )
    )


def test_bloom_injected_on_fact_side_before_exchange(spark):
    with forced_runtime_bloom(spark):
        plan = _join(spark)._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan, plan
    assert "might_contain" in plan, plan
    # the gate sits on the lineitem (application) side: the fact scan's
    # Filter carries might_contain over l_orderkey, so non-joining rows
    # die before the fact exchange
    gate_lines = [
        ln for ln in plan.splitlines()
        if "might_contain" in ln and "l_orderkey" in ln
    ]
    assert gate_lines, plan
    # and the bloom is built over the FILTERED dim keys
    assert any(
        "bloom_filter_agg" in ln and "o_orderkey" in ln
        for ln in plan.splitlines()
    ), plan


def test_bloom_gated_join_matches_plain_join(spark):
    plain = {tuple(r) for r in _join(spark).collect()}
    with forced_runtime_bloom(spark):
        gated = {tuple(r) for r in _join(spark).collect()}
    assert gated == plain and plain  # exact, and non-empty


def test_forced_conf_is_restored(spark):
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with forced_runtime_bloom(spark):
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
