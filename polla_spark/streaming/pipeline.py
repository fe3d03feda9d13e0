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


def payloads_from_poll_batch(batch: DataFrame, epoch_id: int) -> DataFrame:
    """Shape one micro-batch from the streaming pozos source
    (``spark.readStream.format("pozos")``, sources/datasource.py
    READER_SCHEMA) into the SOURCE_PAYLOAD frame the consensus kernel
    expects: ``run_id`` is the poll's epoch, ``source_priority`` is
    the registry order (the reference's deterministic tie-break,
    SURVEY §7.4 #1), and degraded-mode error rows are dropped — the
    missing source lowers confidence through ``expected_sources``
    exactly as in batch mode."""
    from pyspark.sql import functions as F

    from ..sources.pozos import normalize_sources

    order = {name: i for i, name in enumerate(normalize_sources(["all"]))}
    prio = F.coalesce(
        *[
            F.when(F.col("source_name") == name, F.lit(i))
            for name, i in order.items()
        ],
        F.lit(len(order)),
    )
    return (
        batch.filter(F.col("error").isNull())
        .withColumn("run_id", F.lit(f"poll-{epoch_id}"))
        .withColumn("source_priority", prio.cast("int"))
        .select(
            "run_id", "source_name", "source_priority", "fuente", "fetched_at",
            "sha256", "estimado", "user_agent", "sorteo", "fecha", "montos",
        )
    )


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


def make_publish_gate_sink(
    publisher: Callable[[list], None],
    *,
    quarantiner: Callable[[list], None] | None = None,
    state_rows: list | None = None,
) -> Callable[[DataFrame, int], None]:
    """Decision sink enforcing the reference's publish gate across
    micro-batches: only ``publish``/``publish_forced`` rows reach the
    publisher; ``quarantine`` rows go to the quarantine channel; ``skip``
    rows touch nothing. Published runs append their STATE_ROW shape to
    ``state_rows`` (the caller shares that list with the
    ``state_df_provider`` fed to :func:`make_decision_batch_fn`), so a
    later micro-batch repeating the same sorteo/fecha/amounts decides
    ``skip`` — the cross-batch delta semantics of the daily cron
    (reference pipeline state file), continuous.

    The collect here is bounded: one row per run in the micro-batch,
    never data rows — and enforced with an explicit cap below
    (mirrors run_pipeline's single-collect guard, pipeline.py).
    """

    def sink(decided: DataFrame, epoch_id: int) -> None:
        # decision rows are run-count-sized; a micro-batch carrying
        # more runs than this is a mis-wired stream (data rows leaking
        # into the decision frame), not a bigger backfill
        cap = 10_000
        rows = decided.limit(cap + 1).collect()
        if len(rows) > cap:
            raise RuntimeError(
                f"publish-gate sink collected >{cap} decision rows in one "
                "micro-batch — the decision frame must be run-grained; "
                "use run_pipeline_bulk for large backfills"
            )
        published = [r for r in rows if r["publish"]]
        quarantined = [r for r in rows if r["status"] == "quarantine"]
        if published:
            publisher(published)
            if state_rows is not None:
                for r in published:
                    state_rows.append(
                        {
                            "sorteo": r["sorteo"],
                            "fecha": r["fecha"],
                            "primary_sha256": r["provenance"]["pozos"]["primary"]["sha256"],
                            "pozos_proximo": dict(r["pozos_proximo"]),
                        }
                    )
        if quarantined and quarantiner is not None:
            quarantiner(quarantined)

    return sink
