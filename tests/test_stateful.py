"""applyInPandasWithState sessionizer: streaming == batch equivalence
(the correctness gate for non-SQL-expressible stateful ops)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polla_spark.streaming.stateful import (
    SESSION_SCHEMA,
    sessionize_batch_oracle,
    sessionize_stateful,
)

SF_DIR = "/root/testdata/sf0.001"
GAP_MIN = 120


@pytest.fixture(scope="module")
def staged_stream_dir(spark, tmp_path_factory):
    """Events split into time-ordered files (multi-microbatch arrival)
    plus two far-future sentinel files that push the watermark forward
    so every real session's event-time timeout fires before the
    stream drains."""
    from polla_spark.session import read_table

    d = tmp_path_factory.mktemp("stateful_stream")
    ev = (
        read_table(spark, SF_DIR, "events")
        .select("ts", "user_id", "event_type", "value")
        .orderBy("ts")
    )
    rows = ev.collect()
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"part{i}")
        )
    max_ts = rows[-1]["ts"]
    for i in range(2):
        sentinel = [(max_ts.replace(year=max_ts.year + 1 + i), -1, "sentinel", 0.0)]
        spark.createDataFrame(sentinel, ev.schema).coalesce(1).write.parquet(
            str(d / f"sentinel{i}")
        )
    return d, ev.schema


def test_stateful_sessionizer_equals_batch(spark, staged_stream_dir):
    d, schema = staged_stream_dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*/")
    )
    out = sessionize_stateful(stream, gap_minutes=GAP_MIN, watermark="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stateful")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        tuple(r)
        for r in spark.table("sessions_stateful")
        .filter(F.col("user_id") >= 0)
        .collect()
    }

    from polla_spark.session import read_table

    ev = read_table(spark, SF_DIR, "events").select("ts", "user_id", "event_type", "value")
    expected = {
        tuple(r)
        for r in sessionize_batch_oracle(ev, gap_minutes=GAP_MIN)
        .select(*[f.name for f in SESSION_SCHEMA])
        .collect()
    }
    assert got == expected
    assert len(got) > 20  # real sessionization happened, not a trivial pass


def test_stateful_late_events_across_batches(spark, tmp_path):
    """Late-but-within-watermark events arriving in a LATER micro-batch
    must merge into the stored session via min/max (start can move
    back, end must not), matching the batch oracle."""
    import datetime as dt

    schema = "ts timestamp, user_id long, event_type string, value double"

    def t(minute: int) -> dt.datetime:
        return dt.datetime(2025, 6, 1, 10, 0) + dt.timedelta(minutes=minute)

    batch1 = [(t(5), 1, "a", 1.0), (t(15), 1, "b", 1.0)]
    # batch2: one event inside the stored interval, one EARLIER than the
    # stored start (within gap -> extends backwards), one after a gap
    batch2 = [(t(10), 1, "c", 1.0), (t(0), 1, "z", 1.0), (t(60), 1, "d", 1.0)]
    # two sentinel batches: the first advances the watermark, the
    # second triggers the event-time timeout sweep that closes the
    # still-open last session
    sent0 = [(t(60 * 24 * 400), -1, "sentinel", 0.0)]
    sent1 = [(t(60 * 24 * 800), -1, "sentinel", 0.0)]
    for i, chunk in enumerate((batch1, batch2, sent0, sent1)):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(tmp_path / f"b{i}")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp_path}/*/")
    )
    out = sessionize_stateful(stream, gap_minutes=20, watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.table("sessions_late").filter(F.col("user_id") >= 0).collect()
    }

    ev = spark.createDataFrame(batch1 + batch2, schema)
    expected = {
        tuple(r)
        for r in sessionize_batch_oracle(ev, gap_minutes=20)
        .select(*[f.name for f in SESSION_SCHEMA])
        .collect()
    }
    assert got == expected
    # the merged session spans t(0)..t(15) with 4 events, first=z last=b
    def us(x: dt.datetime) -> int:
        return int(x.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    merged = next(r for r in got if r[3] == 4)
    assert merged[1] == us(t(0))
    assert merged[2] == us(t(15))
    assert merged[5] == "z" and merged[6] == "b"
