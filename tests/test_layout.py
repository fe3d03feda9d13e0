"""Zone-map clustered layout (operators/layout.py): the same rows
written clustered vs unsorted must differ in exactly the property
that matters at 100 TB — row-group min/max disjointness — while the
query-side contract (predicate pushdown into the scan) holds on both.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polla_spark.operators.layout import (
    overlap_fraction,
    rowgroup_ranges,
    write_clustered,
)

SF = "/root/testdata/sf0.001"


def test_clustered_layout_prunes_unsorted_does_not(spark, tmp_path):
    e = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    clustered = str(tmp_path / "clustered")
    unsorted = str(tmp_path / "unsorted")
    write_clustered(e, clustered, ["event_id"])
    # same rows, same row-group size, no clustering
    (
        e.repartition(4)
        .write.option("parquet.block.size", str(64 * 1024))
        .mode("overwrite")
        .parquet(unsorted)
    )

    r_sorted = rowgroup_ranges(clustered, "event_id")
    r_unsorted = rowgroup_ranges(unsorted, "event_id")
    # enough groups for skipping to matter, same data both layouts
    assert len(r_sorted) >= 4 and len(r_unsorted) >= 4
    lo, hi = 0, e.agg(F.max("event_id")).collect()[0][0] // 20  # ~5% slice
    f_sorted = overlap_fraction(r_sorted, lo, hi)
    f_unsorted = overlap_fraction(r_unsorted, lo, hi)
    # clustered: a 5% slice touches a small fraction of the groups;
    # unsorted: every group spans the whole range -> touches ~all
    assert f_sorted <= 0.35, (f_sorted, r_sorted[:4])
    assert f_unsorted >= 0.9, (f_unsorted, r_unsorted[:4])

    # the query-side half of the contract: the range predicate reaches
    # the scan as PushedFilters on BOTH layouts (the reader consults
    # the stats above to skip groups), and results are identical
    q = lambda p: spark.read.parquet(p).filter(  # noqa: E731
        (F.col("event_id") >= lo) & (F.col("event_id") <= hi)
    )
    plan = q(clustered)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(event_id" in plan
    a = sorted(r["event_id"] for r in q(clustered).collect())
    b = sorted(r["event_id"] for r in q(unsorted).collect())
    assert a == b and a


def test_clustering_cost_is_one_exchange(spark, tmp_path):
    # the layout's one-time cost: exactly one range exchange, then a
    # per-partition sort — never a global single-partition sort
    e = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "value")
    df = e.repartitionByRange(4, "event_id").sortWithinPartitions("event_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_zorder_prunes_both_dimensions_linear_only_one(spark, tmp_path):
    """Z-order layout (write_zorder): a 5% slice on EITHER clustered
    column must overlap well under half the row groups, where the
    linear sort prunes its one leading column near-perfectly and the
    other not at all — the measured statement of why multi-dimension
    filter tables Z-ORDER instead of sorting. Same rows, same
    row-group size, footers measured directly (pyarrow)."""
    from polla_spark.operators.layout import write_zorder

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zp, lp = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zorder(li, zp, ["l_orderkey", "l_partkey"], block_bytes=32 * 1024)
    write_clustered(li, lp, ["l_orderkey"], block_bytes=32 * 1024)

    hi_ok = li.agg(F.max("l_orderkey")).collect()[0][0] // 20  # ~5% slices
    hi_pk = li.agg(F.max("l_partkey")).collect()[0][0] // 20
    frac = lambda p, c, hi: overlap_fraction(  # noqa: E731
        rowgroup_ranges(p, c), 0, hi
    )
    z_ok, z_pk = frac(zp, "l_orderkey", hi_ok), frac(zp, "l_partkey", hi_pk)
    l_ok, l_pk = frac(lp, "l_orderkey", hi_ok), frac(lp, "l_partkey", hi_pk)
    assert len(rowgroup_ranges(zp, "l_orderkey")) >= 16
    # z-curve: BOTH dimensions prune (measured 0.24 / 0.15)
    assert z_ok <= 0.45 and z_pk <= 0.45, (z_ok, z_pk)
    # linear: leading column near-perfect, the other untouched
    assert l_ok <= 0.2, l_ok
    assert l_pk >= 0.9, l_pk
    # same rows either way
    a = sorted(tuple(r) for r in spark.read.parquet(zp).collect())
    b = sorted(tuple(r) for r in li.collect())
    assert a == b


def test_zorder_cost_is_one_exchange_no_python(spark):
    # the Morton key is pure JVM integer/bit expressions inside one
    # range exchange — no Python boundary, no extra shuffle
    from pyspark.sql import functions as F2

    from polla_spark.operators.layout import zorder_key

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    df = (
        li.withColumn(
            "_z",
            zorder_key(F2.col("l_orderkey"), F2.col("l_partkey"), 0, 1499, 0, 199),
        )
        .repartitionByRange(4, "_z")
        .sortWithinPartitions("_z")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_zorder_null_values_quantize_to_bucket_zero(spark):
    # greatest/least skip NULL args, so without the explicit coalesce a
    # NULL cluster value would silently land at bucket 65535 (the max
    # corner). Pinned: NULL quantizes to the documented bucket 0 corner.
    from pyspark.sql import functions as F2

    from polla_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(None, 0), (0, 0), (100, 0)], "a int, b int"
    ).select(zorder_key(F2.col("a"), F2.col("b"), 0, 100, 0, 100).alias("z"))
    z_null, z_lo, z_hi = [r["z"] for r in df.collect()]
    assert z_null == z_lo == 0  # NULL == min corner, not max
    assert z_hi > 0


def test_write_zorder_rejects_all_null_column(spark, tmp_path):
    import pytest as _pytest

    from polla_spark.operators.layout import write_zorder

    df = spark.createDataFrame([(None, 1), (None, 2)], "a int, b int")
    with _pytest.raises(ValueError, match="empty or all-NULL"):
        write_zorder(df, str(tmp_path / "zo"), ["a", "b"])
