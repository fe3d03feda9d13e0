"""Watermark late-data semantics: an event older than the watermark
arriving after its window finalized is DROPPED from append output —
the bounded-state guarantee a 100 TB/day stream depends on."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from polla_spark.streaming.windows import tumbling_counts

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


_batch_no = [0]


def _write_batch(spark, path, rows):
    import glob
    import os

    before = set(glob.glob(f"{path}/*.parquet"))
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)
    # the file source orders batches by modification time: pin strictly
    # increasing mtimes so arrival order == write order
    _batch_no[0] += 1
    stamp = 1_700_000_000 + _batch_no[0] * 100
    for f in set(glob.glob(f"{path}/*.parquet")) - before:
        os.utime(f, (stamp, stamp))


def test_late_event_dropped_after_watermark_passes(spark, tmp_path):
    src = str(tmp_path / "stream")
    # batch 1: window [12:00, 12:05) gets 2 events
    _write_batch(spark, src, [
        (BASE + dt.timedelta(minutes=1), 1, "click", 1.0),
        (BASE + dt.timedelta(minutes=2), 1, "click", 1.0),
    ])
    # batch 2: event at 12:30 -> watermark (5 min delay) -> 12:25
    _write_batch(spark, src, [(BASE + dt.timedelta(minutes=30), 1, "click", 1.0)])
    # batch 3: processes with wm=12:25 -> the 12:00 window EMITS and
    # its state is EVICTED at the end of this batch. (Spark's guarantee
    # is eviction-based: a late row arriving in the same batch as the
    # watermark crossing may still be counted.)
    _write_batch(spark, src, [(BASE + dt.timedelta(minutes=31), 1, "click", 1.0)])
    # batch 4: LATE event for the evicted 12:00 window -> dropped
    _write_batch(spark, src, [(BASE + dt.timedelta(minutes=3), 1, "click", 9.0)])
    # batch 5: push watermark far ahead so every surviving window emits
    _write_batch(spark, src, [(BASE + dt.timedelta(hours=2), 1, "click", 1.0)])

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = tumbling_counts(stream, width="5 minutes", watermark="5 minutes")
    q = (
        out.writeStream.format("memory").queryName("late_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["window_start"]: (r["n"], r["sum_vq"]) for r in spark.table("late_test").collect()}
    # the 12:00 window counts ONLY the 2 on-time events; the late 9.0
    # event (sum_vq 900) is gone
    assert got["2024-01-01 12:00:00"] == (2, 200)
    assert got["2024-01-01 12:30:00"] == (2, 200)


def test_same_input_batch_counts_late_event(spark):
    # contrast: batch mode has no watermark — the late event counts,
    # which is exactly why streaming==batch checks use on-time data
    rows = [
        (BASE + dt.timedelta(minutes=1), 1, "click", 1.0),
        (BASE + dt.timedelta(minutes=2), 1, "click", 1.0),
        (BASE + dt.timedelta(minutes=3), 1, "click", 9.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    from pyspark.sql import functions as F

    got = (
        df.groupBy(F.window("ts", "5 minutes")).count().collect()
    )
    assert got[0]["count"] == 3
