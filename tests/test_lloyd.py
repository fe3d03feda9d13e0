"""q212 k-means training pinned against a from-scratch Python Lloyd
(the q207/q210 discipline: the DuckDB oracle proves cross-engine
portability; an INDEPENDENT reference proves the algorithm itself).
The reference reads the parquet through DuckDB and uses hashlib for
the md5 strata — no polla_spark code on the reference path."""

from __future__ import annotations

import hashlib
import math
import os

import duckdb

K = 8
DIM = 64
ROUNDS = 2


def _quant(vec):
    return [max(-127, min(127, math.floor(float(x) * 127))) for x in vec]


def _stratum(vec_id: int) -> int:
    h = hashlib.md5(str(vec_id).encode()).hexdigest()
    return "0123456789abcdef".index(h[0]) % K


def _py_lloyd(rows):
    """rows: [(vec_id, embedding)] -> stats rows [(round, cid,
    n_members, c_sum, c_sq, l1_move)], replaying q212's documented
    conventions: md5-stratum min-vec_id seeds; argmax 2<x,c>-<c,c>
    with ties to the lowest centroid id; floor-mean update via the
    non-negative shift (s + 127*n) // n - 127; empty clusters keep
    their previous centroid."""
    coded = [(vid, _quant(v)) for vid, v in rows]
    seeds = {}
    for vid, q in coded:
        s = _stratum(vid)
        if s not in seeds or vid < seeds[s][0]:
            seeds[s] = (vid, q)
    cents = {cid: list(q) for cid, (_, q) in seeds.items()}
    stats = [
        (0, cid, 0, sum(d), sum(v * v for v in d), 0)
        for cid, d in sorted(cents.items())
    ]
    for rnd in range(1, ROUNDS + 1):
        sums = {cid: [0] * DIM for cid in cents}
        counts = {cid: 0 for cid in cents}
        for _, q in coded:
            best_cid, best_score = None, None
            for cid in sorted(cents):
                c = cents[cid]
                score = 2 * sum(x * y for x, y in zip(q, c)) - sum(
                    y * y for y in c
                )
                if best_score is None or score > best_score:
                    best_cid, best_score = cid, score
            counts[best_cid] += 1
            for p in range(DIM):
                sums[best_cid][p] += q[p]
        new = {}
        for cid in sorted(cents):
            n = counts[cid]
            if n == 0:
                new[cid] = list(cents[cid])
            else:
                new[cid] = [
                    (sums[cid][p] + 127 * n) // n - 127 for p in range(DIM)
                ]
        stats.extend(
            (
                rnd,
                cid,
                counts[cid],
                sum(new[cid]),
                sum(v * v for v in new[cid]),
                sum(abs(a - b) for a, b in zip(new[cid], cents[cid])),
            )
            for cid in sorted(cents)
        )
        cents = new
    return stats


def test_q212_matches_independent_python_lloyd(spark):
    from polla_spark.plans.llmdata import q212_kmeans_train

    sf = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    want = _py_lloyd(rows)
    got = [
        tuple(r)
        for r in q212_kmeans_train(spark, sf).collect()
    ]
    assert got == want
    # the training actually moved: at least one round-1 centroid
    # differs from its seed, and every vector is assigned each round
    n_total = len(rows)
    by_round = {}
    for rnd, _, n, *_rest in got:
        by_round[rnd] = by_round.get(rnd, 0) + n
    assert by_round[1] == n_total and by_round[2] == n_total
    assert any(r[5] > 0 for r in got if r[0] == 1)


def test_lloyd_arrow_kernel_matches_jvm_assembly(spark):
    """The r12 Arrow update kernel (``_lloyd_update_arrow``) is pinned
    row-identical to the expression-level reference it replaced
    (``_lloyd_assign`` → ``_lloyd_update_plan``) — including ties:
    centroid 2 duplicates centroid 0, so every vector scores the two
    equally and the argmax must break to the LOWEST cid on both
    paths (the unrolled CASE's first-match rule vs np.argmax-first)."""
    from polla_spark.plans.llmdata import (
        _lloyd_assign,
        _lloyd_update_arrow,
        _lloyd_update_plan,
        _quant,
    )
    from pyspark.sql import functions as F

    vecs = spark.createDataFrame(
        [(i, [((i * 7 + p * 3) % 255 - 127) / 127.0 for p in range(DIM)])
         for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    coded = vecs.select("vec_id", _quant(F.col("embedding")).alias("qe"))
    c0 = [((p * 5) % 255 - 127) for p in range(DIM)]
    cents = [(0, c0), (1, [-c for c in c0]), (2, list(c0))]
    want = sorted(
        tuple(r)
        for r in _lloyd_update_plan(_lloyd_assign(coded, cents)).collect()
    )
    got = sorted(
        tuple(r) for r in _lloyd_update_arrow(coded, cents).collect()
    )
    assert got == want
    # the tie actually exercised: duplicate centroid 2 got nothing
    assert not any(cid == 2 for cid, *_ in got)
    assert any(cid == 0 for cid, *_ in got)


def test_lloyd_empty_cluster_keeps_previous_centroid():
    """Unit pin of the documented empty-cluster convention on the
    collected-sums updater: a centroid absent from the update rows
    keeps its dims exactly and reports 0 members."""
    from polla_spark.plans.llmdata import _lloyd_new_dims

    prev = [(0, [1] * DIM), (1, [-5] * DIM)]
    upd_rows = [
        {"cid": 0, "pos": p, "s": 10, "n": 3} for p in range(DIM)
    ]
    new, members = _lloyd_new_dims(upd_rows, prev)
    assert members == {0: 3, 1: 0}
    # (10 + 127*3) // 3 - 127 = 391 // 3 - 127 = 130 - 127 = 3
    assert new[0] == (0, [3] * DIM)
    assert new[1] == (1, [-5] * DIM)


def test_lloyd_floor_mean_shift_handles_negative_sums():
    """The non-negative-shift floor mean equals Python's floor mean on
    negative sums (where naive truncating division would differ)."""
    from polla_spark.plans.llmdata import _lloyd_new_dims

    prev = [(0, [0] * DIM)]
    upd_rows = [{"cid": 0, "pos": p, "s": -7, "n": 2} for p in range(DIM)]
    new, _ = _lloyd_new_dims(upd_rows, prev)
    # floor(-7/2) = -4, NOT trunc's -3
    assert new[0][1] == [-4] * DIM
