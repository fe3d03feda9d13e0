"""Mergeable frequency sketches: distributed Misra-Gries heavy hitters.

The exact heavy-hitter query (q175) is one groupBy — fine whenever the
KEY CARDINALITY fits a shuffle. At 100 TB with adversarial cardinality
(URLs, user agents, raw tokens) the exact census itself is the
bottleneck: the shuffle carries one row per DISTINCT key. The sketch
path bounds that: each partition keeps at most ``k`` counters
(Misra-Gries), and MG summaries are MERGEABLE with additive error
(Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries",
PODS 2012): summing counters keyed and subtracting the (k+1)-th
largest combined weight preserves the invariant

    true_count(x) - n/(k+1)  <=  est(x)  <=  true_count(x)

so any key with true frequency > n/(k+1) is GUARANTEED to survive
(no false negatives at the support threshold), and every estimate is
an under-count by at most n/(k+1). ``tests/test_sketch.py`` pins both
properties against the exact census.

Scale shape: the only data-sized stage is the per-partition pass
(Arrow-batched ``mapInPandas``; each batch folds in via vectorized
``value_counts`` — the batch's exact counts are themselves a zero-error
summary, so per-batch folding IS the paper's merge). What shuffles is
``num_partitions × k`` candidate rows — independent of both corpus
size and key cardinality. The final subtraction needs only the
(k+1)-th largest merged weight, read from the bounded candidate table
(the ``limit(k+1).collect()`` is k+1 rows by construction — same
bounded-collect discipline as operators/graph.py).

Reference parity: the reference engine has no sketch module; this is
part of the LLM-data-pipeline extension surface (SURVEY.md north-star
list), built on the public Misra-Gries / mergeable-summaries
literature.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MG_SCHEMA = "key string, est long"


def _fold(counters: dict[str, int], batch_counts, k: int) -> dict[str, int]:
    """Merge exact batch counts into an MG summary (PODS'12 merge:
    combine keyed, then subtract the (k+1)-th largest if over k)."""
    for key, cnt in batch_counts.items():
        counters[key] = counters.get(key, 0) + int(cnt)
    if len(counters) > k:
        sub = sorted(counters.values(), reverse=True)[k]
        counters = {key: v - sub for key, v in counters.items() if v > sub}
    return counters


def mg_partials(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most ``k`` (key, est)
    rows per input partition, each ``est`` an under-count by at most
    (partition rows)/(k+1)."""

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            counters = _fold(
                counters, pdf[key_col].astype(str).value_counts(), k
            )
        yield pd.DataFrame(
            {"key": list(counters.keys()), "est": list(counters.values())}
        )

    # null keys are EXCLUDED from the sketch (pandas astype(str) would
    # otherwise fold them into the literal string "None", colliding
    # with genuine "None" values and diverging from an exact census's
    # separate null group) — fillna upstream if nulls are meaningful
    return (
        df.select(F.col(key_col).cast("string").alias(key_col))
        .filter(F.col(key_col).isNotNull())
        .mapInPandas(summarize, MG_SCHEMA)
    )


def mg_merge(partials: DataFrame, k: int = 64) -> DataFrame:
    """Merge per-partition MG summaries into one global summary of at
    most ``k`` keys: sum by key, subtract the (k+1)-th largest merged
    weight, keep positive survivors. Runs on the candidate table
    (≤ partitions × k rows), never the data.

    The candidate table is bounded by construction, so the finisher
    collects it ONCE and completes driver-side — no persisted relation
    to leak across repeated compaction cycles in a long-lived session
    (the data-sized upstream pass still executes exactly once)."""
    spark = partials.sparkSession
    rows = partials.groupBy("key").agg(F.sum("est").alias("est")).collect()
    rows.sort(key=lambda r: (-r["est"], r["key"]))
    sub = int(rows[k]["est"]) if len(rows) > k else 0
    out = [
        (r["key"], int(r["est"]) - sub)
        for r in rows
        if int(r["est"]) - sub > 0
    ]
    return spark.createDataFrame(out, MG_SCHEMA).orderBy(
        F.desc("est"), "key"
    )


def heavy_hitter_foreach_batch(sink_path: str, key_col: str, k: int = 64):
    """``foreachBatch`` writer for the streaming heavy-hitter sketch:
    appends each micro-batch's MG partials (≤ partitions × k rows per
    trigger) to a PLAIN parquet directory with an ordinary batch
    commit. Deliberately not ``writeStream.format("parquet")`` — the
    streaming parquet sink's ``_spark_metadata`` file log would treat
    a later compaction rewrite as corruption, while a plain directory
    lets :func:`compact_heavy_hitters` rewrite it freely."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        mg_partials(batch_df, key_col, k).write.mode("append").parquet(
            sink_path
        )

    return write


def compact_heavy_hitters(spark, sink_path: str, k: int = 64) -> int:
    """Maintenance job: replace an append-mode partials sink
    (T triggers × partitions × k rows) with its own merged summary
    (≤ k rows). Re-merging merged summaries is exactly what PODS'12
    mergeability licenses: the compacted table is itself a valid MG
    summary of everything merged so far, so the n/(k+1) guarantee is
    preserved across ANY number of compaction cycles — this is the
    fix for the documented unbounded-sink growth of
    ``streaming/windows.heavy_hitter_partials``.

    Run it between triggers (availableNow maintenance windows) or
    every N batches from the foreachBatch hook; it must not race a
    concurrent append. The swap is write-tmp-then-rename on the local
    filesystem; a cluster deployment would target a transactional
    table format (Delta/Iceberg ``overwrite``) instead. Returns the
    compacted row count."""
    import os
    import shutil

    merged = mg_merge(spark.read.parquet(sink_path), k)
    # mg_merge already finished driver-side: its output is a local
    # table (≤ k rows), independent of sink_path's files
    rows = merged.collect()
    tmp = sink_path.rstrip("/") + ".compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.createDataFrame(
        [(r["key"], r["est"]) for r in rows], MG_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(sink_path)
    os.rename(tmp, sink_path)
    return len(rows)


def heavy_hitters_sketch(
    df: DataFrame, key_col: str, k: int = 64
) -> DataFrame:
    """End-to-end sketch path: per-partition MG + mergeable combine.
    Guarantees vs the exact census (n = total rows):

    - every key with true count > n/(k+1) appears;
    - every estimate satisfies true - n/(k+1) <= est <= true.
    """
    return mg_merge(mg_partials(df, key_col, k), k)
