"""Streaming window operators over event streams.

The reference is batch-only (daily cron — SURVEY.md §2.6); these are
the engine-native streaming counterparts of plans/windows_q.py,
verified streaming == batch on finite input in tests.

Design notes for real deployments:
- every aggregation carries a watermark so state is bounded — without
  it a 100 TB/day stream grows state forever;
- tumbling/sliding use ``F.window``; session gaps use
  ``F.session_window`` (state-store backed merge of overlapping
  sessions);
- dedupe uses ``dropDuplicates`` scoped by watermark: exactly the
  reference's SHA-256 content-dedup semantics (net.py:36-38) applied
  to unbounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "30 minutes"


def vq() -> F.Column:
    return F.floor(F.col("value") * 100).cast("long")


def tumbling_counts(events: DataFrame, width: str = "5 minutes",
                    watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Per (5-min window, event_type): count + exact quantized sum."""
    return (
        events.withWatermark("ts", watermark)
        .withColumn("vq", vq())
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("vq").alias("sum_vq"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_vq",
        )
    )


def sliding_counts(events: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes",
                   watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .withColumn("vq", vq())
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"), F.sum("vq").alias("sum_vq"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "sum_vq",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Per (user, session) with a 30-minute inactivity gap.

    ``session_window`` merges overlapping/adjacent state-store
    sessions — semantically identical to the batch lag+cumsum plan
    (plans/windows_q.q72_sessionize) on finite input.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def daily_user_partials(events: DataFrame,
                        watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming form of the daily rollup (plans/windows_q.q73):
    user-grain partials.

    ``countDistinct`` is not incrementally mergeable, so the stream
    maintains one bounded state row per (day, event_type, user_id) —
    a single streaming aggregation — and the day-grain rollup
    (:func:`rollup_daily`, where ``n_users`` = count of user rows) is
    a read-time batch query over this much smaller result. The
    standard streaming-dashboard pattern: pre-aggregate at the finest
    grain the distinct needs, finish at read time.
    """
    return (
        events.withWatermark("ts", watermark)
        .withColumn("vq", vq())
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "user_id",
        )
        .agg(F.count("*").alias("n"), F.sum("vq").alias("sum_vq"))
    )


def rollup_daily(partials: DataFrame) -> DataFrame:
    """Batch finisher over :func:`daily_user_partials` output — emits
    exactly the q73 daily-rollup shape (n, n_users, sum_vq)."""
    return (
        partials.groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.count("*").alias("n_users"),
            F.sum("sum_vq").alias("sum_vq"),
        )
    )


def follow_within(lead: DataFrame, follow: DataFrame,
                  lead_type: str = "view", follow_type: str = "click",
                  horizon: str = "10 minutes",
                  watermark: str = DEFAULT_WATERMARK,
                  how: str = "inner") -> DataFrame:
    """Stream-stream interval join: for each ``lead_type`` event, the
    ``follow_type`` events by the same user strictly after it and
    within ``horizon`` (the funnel/attribution primitive).

    Both sides carry a watermark and the join predicate carries the
    time bound — together they let the state store evict lead rows
    older than ``watermark + horizon``, so state stays bounded on an
    unbounded stream. ``how='left_outer'`` additionally emits each
    unmatched lead (null follow) — but only once the watermark passes
    its join window, so the engine KNOWS no match can still arrive;
    on a finite stream that means unmatched rows surface only after a
    later batch advances the watermark (the test appends a sentinel
    batch for exactly this). The same function applied to batch
    DataFrames is the equivalence oracle (watermarks are a no-op in
    batch).
    """
    l = (
        lead.filter(F.col("event_type") == lead_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("lead_id"),
            F.col("ts").alias("l_ts"),
        )
    )
    r = (
        follow.filter(F.col("event_type") == follow_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("follow_id"),
            F.col("ts").alias("r_ts"),
        )
    )
    horizon_sql = f"INTERVAL {horizon}"
    cond = F.expr(
        f"l_user = r_user AND r_ts > l_ts AND r_ts <= l_ts + {horizon_sql}"
    )
    return l.join(r, cond, how).select(
        F.col("l_user").alias("user_id"),
        "lead_id",
        "follow_id",
        (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias("lag_seconds"),
    )


def dedupe_stream(events: DataFrame, keys: list[str],
                  watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Watermark-scoped exact dedupe (first event per key wins)."""
    return events.withWatermark("ts", watermark).dropDuplicates(keys)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Drive a finite streaming source to completion into a memory
    sink; returns the materialized result (test/smoke harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
