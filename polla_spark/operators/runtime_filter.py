"""Runtime Bloom-filter semi-join reduction — configuration surface.

At 100 TB the dominant join cost is shuffling fact rows that the join
will DROP (a selective dim filter survives 1% of orders, but 100% of
lineitem still shuffles before the join throws 99% away). Catalyst's
runtime row-level filtering (Spark 3.3+, SPARK-32268) fixes this
declaratively: the optimizer builds a Bloom filter over the FILTERED
dim keys (``bloom_filter_agg``) and injects a ``might_contain``
predicate on the fact side BEFORE its exchange, so non-joining rows
die at the scan instead of crossing the network. False positives only
cost wasted shuffle rows; the join itself stays exact.

Why this module exists instead of flipping the confs globally: the
feature is gated by size thresholds (creation side ≤ 10 MB plan-size /
application side ≥ 10 GB scan by default) precisely because the bloom
build adds a subquery pass — at test-data scale it would never fire,
and forcing it on for every tiny join would tax the benchmark floor.
``RUNTIME_BLOOM_CONF`` documents the production switch; the pinning
test (tests/test_runtime_filter.py) proves the injection happens on
this engine's own join shapes and that results are unchanged.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

#: Production switch: enable injection and let the default thresholds
#: govern when it pays. The aggressive test-scale values live in
#: :func:`forced_runtime_bloom` only.
RUNTIME_BLOOM_CONF = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}

_FORCE_CONF = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # lift the size gates so the rewrite fires on test-scale data;
    # NEVER ship these two at real scale — the defaults exist so the
    # bloom build only happens when the saved shuffle dwarfs it
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # keep the join a shuffle join: a broadcast join needs no bloom
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def forced_runtime_bloom(spark: SparkSession):
    """Force the Bloom semi-join rewrite at any data size (tests /
    demos). Restores every touched conf on exit."""
    saved: dict[str, str | None] = {}
    for k, v in _FORCE_CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
