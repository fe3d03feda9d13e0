"""Scan/sink tests: schema-enforced NDJSON with corrupt-line
quarantine (reference pipeline.py:71-78), parquet layout options."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from polla_spark.sources.io import (
    CORRUPT_COL,
    read_ndjson,
    read_parquet,
    write_ndjson,
    write_parquet,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def test_ndjson_corrupt_lines_become_data_not_failures(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1, "name": "a"}\n{not json}\n{"id": 2, "name": "b"}\n')
    clean = read_ndjson(spark, str(p), SCHEMA)
    assert sorted((r["id"], r["name"]) for r in clean.collect()) == [(1, "a"), (2, "b")]
    kept = read_ndjson(spark, str(p), SCHEMA, keep_corrupt=True)
    corrupt = kept.filter(F.col(CORRUPT_COL).isNotNull()).collect()
    assert len(corrupt) == 1 and "{not json}" in corrupt[0][CORRUPT_COL]


def test_ndjson_roundtrip_preserves_values(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "ñandú")], SCHEMA)
    out = str(tmp_path / "out")
    write_ndjson(df, out, partitions=1)
    back = read_ndjson(spark, out, SCHEMA)
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [(1, "x"), (2, "ñandú")]


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from polla_spark.sources.io import write_bucketed

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "b_orders", buckets=4, key="o_orderkey")
    write_bucketed(li, "b_lineitem", buckets=4, key="o_orderkey")
    a, b = spark.table("b_orders"), spark.table("b_lineitem")
    # disable broadcast so the test exercises the bucketed path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: zero shuffle
        assert joined.count() == orders.join(
            li.withColumnRenamed("o_orderkey", "x"), orders.o_orderkey == F.col("x")
        ).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_parquet_partitioned_write_prunes_directories(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "r1"), (2, "b", "r1"), (3, "c", "r2")],
        "id long, name string, bucket string",
    )
    out = str(tmp_path / "pq")
    write_parquet(df, out, partition_by=["bucket"], sort_by=["id"])
    assert (tmp_path / "pq" / "bucket=r1").exists()
    back = read_parquet(spark, out).filter(F.col("bucket") == "r2")
    # partition pruning: only the r2 directory is in the scan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 1
    assert "bucket=r1" not in plan


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """Dynamic partition pruning: when the fact table is partitioned on
    the join key and the DIM side carries the selective filter, the
    fact scan must receive a runtime `dynamicpruning` subquery — at
    100 TB this is the difference between scanning 2 of 200 date
    partitions and scanning all of them. Static pruning can't help
    here (the filter is on the dim, not the fact)."""
    fact = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).cast("string").alias("part"),
    )
    out = str(tmp_path / "fact_pq")
    write_parquet(fact, out, partition_by=["part"])
    dim = spark.createDataFrame(
        [("3", "keep"), ("7", "keep"), ("3", "dup")], "part string, tag string"
    )
    back = read_parquet(spark, out)
    joined = back.join(dim.filter(F.col("tag") == "keep"), "part")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert joined.count() == 200
