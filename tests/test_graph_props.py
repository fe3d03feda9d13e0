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
