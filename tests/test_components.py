"""Connected-components operator: local union-find endgame vs the
distributed propagation loop must agree (and match hand-computed
components)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polla_spark.operators.graph import connected_components

# chain 1-2-3-4, triangle 10-11-12, isolated 20, self-dup pair 30-31
EDGES = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (30, 31)]
NODES = [1, 2, 3, 4, 10, 11, 12, 20, 30, 31]
EXPECTED = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 30: 30, 31: 30}


def _run(spark, threshold: int) -> dict[int, int]:
    nodes = spark.createDataFrame([(n,) for n in NODES], "node long")
    # undirected graph as symmetric directed edges (the banding join
    # emits both directions too)
    sym = EDGES + [(b, a) for a, b in EDGES]
    edges = spark.createDataFrame(sym, "src long, dst long")
    out = connected_components(nodes, edges, local_threshold=threshold)
    return {r["node"]: r["label"] for r in out.collect()}


def test_local_union_find_endgame(spark):
    assert _run(spark, threshold=1_000) == EXPECTED


def test_distributed_propagation(spark):
    # threshold=0 forces the iterative min-label propagation path
    assert _run(spark, threshold=0) == EXPECTED


def test_paths_agree_on_real_banding_graph(spark):
    """Union-find endgame and distributed propagation must produce the
    identical labeling on the real MinHash-LSH candidate graph (the
    q67 front end), not just toy graphs."""
    from pyspark.sql import functions as F

    from polla_spark.plans.llmdata import _minhash_band_candidates

    sf = "/root/testdata/sf0.001"
    cands = _minhash_band_candidates(spark, sf)
    edges = cands.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        cands.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    nodes = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").alias("node")
    )
    local = {
        r["node"]: r["label"]
        for r in connected_components(nodes, edges, local_threshold=10**9).collect()
    }
    dist = {
        r["node"]: r["label"]
        for r in connected_components(nodes, edges, local_threshold=0).collect()
    }
    assert local == dist
    assert len(local) == nodes.count()


def test_no_edges(spark):
    nodes = spark.createDataFrame([(n,) for n in NODES], "node long")
    edges = spark.createDataFrame([], "src long, dst long")
    out = connected_components(nodes, edges, local_threshold=1_000)
    assert {r["node"]: r["label"] for r in out.collect()} == {n: n for n in NODES}
