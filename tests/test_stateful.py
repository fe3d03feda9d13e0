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
