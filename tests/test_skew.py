"""Skew operators: salted agg and hot-key split join must be
result-identical to the naive plans (only the exchange layout moves)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polla_spark.operators.skew import hot_key_split_join, salted_sum_count
from tests.conftest import SF_SMOKE


def test_salted_agg_equals_plain_groupby(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_returnflag", "l_quantity"
    )
    salted = salted_sum_count(
        li, ["l_returnflag"], F.col("l_quantity").cast("decimal(18,4)")
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("total"),
        F.count("*").alias("n"),
    )
    a = {tuple(r) for r in salted.collect()}
    b = {tuple(r) for r in plain.collect()}
    assert a == b


def test_hot_key_split_join_equals_plain_join(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_name"
    ).withColumnRenamed("c_custkey", "o_custkey")
    hot = [r["o_custkey"] for r in
           orders.groupBy("o_custkey").count().orderBy(F.desc("count")).limit(3).collect()]
    split = hot_key_split_join(orders, cust, "o_custkey", hot)
    plain = orders.join(cust, "o_custkey")
    assert {tuple(r) for r in split.collect()} == {tuple(r) for r in plain.collect()}
    assert split.count() == plain.count()
    # the hot slice really is broadcast
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hot_key_split_join_outer_modes(spark):
    """Non-inner hows: dim is split hot/cold too, so outer modes don't
    re-emit hot dim rows as unmatched nulls from the cold branch."""
    fact = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "d")], "k int, fv string"
    )
    # dim has a hot key (1), a cold matched key (2), an unmatched key
    # (9, exercises right/full null-fact emission) and a null key
    dim = spark.createDataFrame(
        [(1, "x"), (2, "y"), (9, "z"), (None, "w")], "k int, dv string"
    )
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    for how in ("inner", "left", "right", "full", "semi", "anti"):
        split = hot_key_split_join(fact, dim, "k", [1], how=how)
        plain = fact.join(dim, "k", how)
        got = sorted((tuple(r) for r in split.collect()), key=nullsafe)
        want = sorted((tuple(r) for r in plain.collect()), key=nullsafe)
        assert got == want, f"how={how}: {got} != {want}"
