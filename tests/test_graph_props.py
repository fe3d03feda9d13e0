"""Random-graph cross-check of the degree-orientation triangle kernel
(operators/graph.triangle_count): the q181 oracle proves it on the
co-purchase graph; these seeded Erdős–Rényi graphs prove the SPARK
plan against an independent O(n³) brute force on shapes the corpus
does not exhibit (hubs, near-cliques, sparse fragments)."""

from __future__ import annotations

import itertools
import random

from polla_spark.operators.graph import triangle_count


def _brute_force(edges: set[tuple[int, int]]) -> int:
    nodes = sorted({x for e in edges for x in e})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )


def test_triangle_kernel_matches_bruteforce_on_random_graphs(spark):
    cases = [
        (12, 0.2, 1),    # sparse fragments
        (12, 0.6, 2),    # dense, many triangles
        (16, 0.35, 3),   # mid density
        (10, 1.0, 4),    # complete graph: C(10,3) triangles
    ]
    for n, p, seed in cases:
        rng = random.Random(seed)
        edges = {
            (a, b)
            for a, b in itertools.combinations(range(n), 2)
            if rng.random() < p
        }
        if not edges:
            continue
        df = spark.createDataFrame(sorted(edges), "a long, b long")
        row = triangle_count(df).collect()[0]
        want = _brute_force(edges)
        assert row["n_triangles"] == want, (n, p, seed, row, want)
        assert row["n_edges"] == len(edges)
        assert row["n_nodes"] == len({x for e in edges for x in e})
    # the complete-graph case is closed-form: C(10,3) = 120
    full = {(a, b) for a, b in itertools.combinations(range(10), 2)}
    df = spark.createDataFrame(sorted(full), "a long, b long")
    assert triangle_count(df).collect()[0]["n_triangles"] == 120


def test_triangle_kernel_star_has_no_triangles(spark):
    """A pure hub (star graph) — the adversarial shape for naive wedge
    enumeration — has zero triangles and must not blow up."""
    star = [(0, i) for i in range(1, 40)]
    df = spark.createDataFrame(star, "a long, b long")
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 0 and row["n_edges"] == 39


def _py_components(nodes: set[int], edges: set[tuple[int, int]]) -> dict[int, int]:
    """Independent reference labeling: label = min reachable node."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in nodes}


def test_merge_components_matches_full_on_random_splits(spark):
    """Seeded random graphs, random history/delta edge splits, both
    merge regimes: folding the delta into the history labeling always
    equals the from-scratch labeling of the union — merge_components
    is exact on hub, dense and fragmented shapes the corpus doesn't
    exhibit (the triangle-kernel discipline applied to the fold)."""
    import itertools as it
    import random

    from polla_spark.operators.graph import connected_components, merge_components

    for n, p, seed in [(14, 0.12, 11), (12, 0.45, 12), (18, 0.08, 13)]:
        rng = random.Random(seed)
        edges = {
            (a, b)
            for a, b in it.combinations(range(n), 2)
            if rng.random() < p
        }
        nodes = set(range(n))
        hist_edges = {e for e in edges if rng.random() < 0.6}
        delta_edges = edges - hist_edges
        hist_nodes = {x for e in hist_edges for x in e}
        want = _py_components(nodes, edges)
        hist_df = spark.createDataFrame(
            [(x,) for x in sorted(hist_nodes)] or [(0,)], "node long"
        )
        he = spark.createDataFrame(
            sorted(hist_edges) or [], "src long, dst long"
        )
        labels = connected_components(hist_df, he)
        de = spark.createDataFrame(
            sorted(delta_edges) or [], "src long, dst long"
        )
        nn = spark.createDataFrame(
            [(x,) for x in sorted(nodes - hist_nodes)] or [], "node long"
        )
        for thr in (1_000, 0):
            got = {
                r["node"]: r["label"]
                for r in merge_components(
                    labels, de, nn, local_threshold=thr
                ).collect()
            }
            assert got == want, (n, p, seed, thr)
