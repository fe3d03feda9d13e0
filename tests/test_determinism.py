"""Partition-count invariance: oracle hashing (and any production
rerun) requires results identical under different parallelism. These
queries carry the riskiest arithmetic (double folds, quantile cuts,
window carries), so re-plan each under two shuffle-partition settings
and require bit-identical output — the gate that catches accidental
order-dependent float accumulation before the driver's hash does."""

from __future__ import annotations

import pytest

from polla_spark.plans import registry

SF = "/root/testdata/sf0.001"

RISKY = [
    "q137_cluster_quality",
    "q141_ab_test",
    "q117_twap",
    "q136_trigram_lm",
    "q135_rfm_segments",
]


@pytest.mark.parametrize("name", RISKY)
def test_result_invariant_under_shuffle_partitions(spark, name):
    q = registry()[name]

    def snap():
        pdf = q.spark(spark, SF).toPandas()
        cols = sorted(pdf.columns)
        return sorted(map(tuple, pdf[cols].astype(str).values.tolist()))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = snap()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = snap()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
