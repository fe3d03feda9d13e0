"""Custom stateful streaming operator: per-user sessionizer built on
``applyInPandasWithState`` (arbitrary state + event-time timeouts).

``F.session_window`` already covers gap-sessions declaratively
(streaming/windows.py); this operator exists for the semantics the
built-in cannot express — carrying arbitrary running state per key
(first/last event types, custom accumulators) and emitting exactly one
row per *closed* session. It is the template for the reference-shaped
"decide when a logical unit is complete" problems (SURVEY.md §2.6
streaming family; no reference analog — batch-only cron there).

Scale notes: state is one fixed-size row per live key (bounded by the
watermark-driven timeout, never by stream length); the shuffle is the
single ``groupBy(user_id)`` hash exchange any keyed-state operator
needs. Arrow moves each key-group's batch into pandas.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("start_us", T.LongType()),   # epoch micros (tz-proof)
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("qvalue", T.LongType()),     # sum(floor(value*100))
        T.StructField("first_type", T.StringType()),
        T.StructField("last_type", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("qvalue", T.LongType()),
        T.StructField("first_type", T.StringType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def make_session_kernel(gap_minutes: int = 120):
    """Build the sessionizer's ``applyInPandasWithState`` kernel at
    module level so it is DIRECTLY unit-testable with a fake
    GroupState (the functions/udaf ``.func`` discipline — executor-side
    kernel code is invisible to driver-process coverage tracing, so
    its edge branches need in-process exercise too)."""
    gap_us = gap_minutes * 60_000_000

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        user_id = key[0]

        def session_row(s) -> "pd.DataFrame":
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "start_us": [s[0]],
                    "end_us": [s[1]],
                    "n_events": [s[2]],
                    "qvalue": [s[3]],
                    "first_type": [s[4]],
                    "last_type": [s[5]],
                }
            )

        if state.hasTimedOut:
            yield session_row(state.get)
            state.remove()
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        qvals = [int(v) for v in (rows["value"] * 100).apply(__import__("math").floor)]
        types = rows["event_type"].tolist()

        # Gap-interval merge: treat the stored state as one interval
        # and each event as a point interval, sort by start, fold with
        # the gap rule. A late-but-within-watermark event that lands
        # inside/before the stored session merges via min/max (first/
        # last types re-derived by (ts, type) — the batch oracle's
        # struct ordering) instead of dragging the session end
        # backwards; an event > gap older than the stored start closes
        # as its own earlier session, exactly as the batch oracle
        # groups it.
        items = [list(state.get)] if state.exists else []
        items.extend([t_us, t_us, 1, qv, et, et] for t_us, qv, et in zip(ts_us, qvals, types))
        items.sort(key=lambda s: (s[0], s[4], s[1], s[5]))

        cur = None
        for it in items:
            if cur is not None and it[0] - cur[1] <= gap_us:
                if (it[0], it[4]) < (cur[0], cur[4]):
                    cur[0], cur[4] = it[0], it[4]
                if (it[1], it[5]) > (cur[1], cur[5]):
                    cur[1], cur[5] = it[1], it[5]
                cur[2] += it[2]
                cur[3] += it[3]
            else:
                if cur is not None:
                    yield session_row(cur)  # in-kernel gap split
                cur = list(it)
        state.update(tuple(cur))
        # timeout fires when the event-time watermark passes this (ms)
        state.setTimeoutTimestamp(cur[1] // 1000 + gap_minutes * 60_000)

    return fn


def sessionize_stateful(
    events: DataFrame,
    *,
    gap_minutes: int = 120,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Emit one row per closed session: a session closes when the next
    event is > gap away (split detected in-kernel) or the watermark
    passes last_event + gap (event-time timeout).

    Expects columns ``ts timestamp, user_id long, event_type string,
    value double``; events must arrive time-ordered per key up to the
    watermark delay (standard streaming contract). Kernel built by
    :func:`make_session_kernel` (unit-testable in-process).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    fn = make_session_kernel(gap_minutes)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch_oracle(events: DataFrame, *, gap_minutes: int = 120) -> DataFrame:
    """Batch ground truth for the stateful sessionizer: the identical
    session definition via ``session_window`` (gap merge), same output
    columns — used by the streaming==batch equivalence test."""
    from pyspark.sql import functions as F

    struct_first = F.min(F.struct("ts", "event_type"))
    struct_last = F.max(F.struct("ts", "event_type"))
    return (
        events.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id"
        )
        .agg(
            F.unix_micros(F.min("ts")).alias("start_us"),
            F.unix_micros(F.max("ts")).alias("end_us"),
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("qvalue"),
            struct_first.getField("event_type").alias("first_type"),
            struct_last.getField("event_type").alias("last_type"),
        )
        .drop("w")
    )
