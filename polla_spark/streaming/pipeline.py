"""Streaming form of the ingest -> consensus -> decide pipeline.

The reference runs as a daily batch (cron); the engine also exposes it
as Structured Streaming: payload micro-batches flow through the SAME
batch consensus/decision transforms inside ``foreachBatch`` — one code
path, two execution modes (the decision engine is a pure DataFrame
function, so reuse is free). This is the pattern the reference's
publish gate needs anyway: decisions must be taken on a completed
micro-batch, not mid-stream (SURVEY.md §7.4 #7).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..operators import consensus as C


def make_decision_batch_fn(
    state_df_provider: Callable[[], DataFrame],
    sink: Callable[[DataFrame, int], None],
    *,
    expected_sources: int,
    mismatch_threshold: float = 0.25,
    force_publish: bool = False,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: payloads micro-batch -> decision rows -> sink.

    ``state_df_provider`` is re-read per batch so the delta check sees
    the state written by previous batches (exactly-once-ish: the sink
    is responsible for idempotent writes keyed by run_id).
    """

    def on_batch(payloads: DataFrame, epoch_id: int) -> None:
        if payloads.isEmpty():
            return
        normalized = C.normalized_records(payloads, expected_sources=expected_sources)
        flagged = C.with_unchanged(normalized, state_df_provider())
        decided = C.decide(
            flagged,
            mismatch_threshold=mismatch_threshold,
            force_publish=force_publish,
        )
        sink(decided, epoch_id)

    return on_batch


def run_payload_stream(
    payload_stream: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
) -> None:
    """Drive a finite payload stream through foreachBatch to completion."""
    q = payload_stream.writeStream.outputMode("append").foreachBatch(batch_fn).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
