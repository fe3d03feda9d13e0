"""q150's whole correctness rests on the identity
``clamped_t = S_t - min(0, min_{k<=t} S_k)`` — and BOTH engines use
it, so the DuckDB oracle cannot catch an identity error. Verify it
independently against the literal sequential recurrence
``b_t = max(0, b_{t-1} + d_t)`` on randomized delta streams."""

from __future__ import annotations

import random


def _recurrence(deltas):
    b = 0
    for d in deltas:
        b = max(0, b + d)
    return b


def _identity(deltas):
    s = 0
    run_min = 0
    for d in deltas:
        s += d
        run_min = min(run_min, s)
    return s - min(0, run_min)


def test_clamp_identity_matches_sequential_recurrence():
    rng = random.Random(99)
    for trial in range(500):
        n = rng.randrange(0, 40)
        deltas = [rng.randrange(-1000, 1001) for _ in range(n)]
        assert _identity(deltas) == _recurrence(deltas), deltas


def test_clamp_identity_matches_on_spark_output(spark):
    """And the Spark plan itself reproduces the recurrence on a small
    in-memory stream with an engineered floor hit."""
    import datetime as dt

    from pyspark.sql import functions as F

    from polla_spark.plans.windows_q import q150_clamped_balance

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    # user 1: signup +1000, 2 errors (-1600) -> floors at 0, then
    # purchase 3.00 -> final 300, floored=True
    seq = [("signup", 0.0), ("error", 0.0), ("error", 0.0), ("purchase", 3.0)]
    for i, (ty, v) in enumerate(seq):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, ty, v, "{}"))
    # user 2: signup only -> final 1000, never floored
    rows.append((99, t0, 2, "signup", 0.0, "{}"))
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = q150_clamped_balance(spark, d).collect()[0]
    assert out["n_users"] == 2
    assert out["n_floored"] == 1
    assert out["total_final_cents"] == 300 + 1000
    assert out["max_final_cents"] == 1000


def test_interval_union_sweep_matches_merge_reference(spark):
    """q153's clip-once sweep — both engines run the same formula, so
    the oracle can't validate the algorithm itself. Check it against a
    literal Python merge-intervals reference on the real sf0.001
    interval set."""
    from pyspark.sql import functions as F

    from polla_spark.plans.relational import q153_interval_union_time, t

    sf = "/root/testdata/sf0.001"
    iv = (
        t(spark, sf, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.min(F.unix_micros("ts")).alias("s"),
            F.max(F.unix_micros("ts")).alias("t"),
        )
        .collect()
    )
    by_user: dict[int, list[tuple[int, int]]] = {}
    for r in iv:
        by_user.setdefault(r["user_id"], []).append((r["s"], r["t"]))
    want = {}
    for u, spans in by_user.items():
        spans.sort()
        total = 0
        cur_s, cur_t = spans[0]
        for s, t_ in spans[1:]:
            if s > cur_t:
                total += cur_t - cur_s
                cur_s, cur_t = s, t_
            else:
                cur_t = max(cur_t, t_)
        total += cur_t - cur_s
        want[u] = total // 1000000
    got = {
        r["user_id"]: r["covered_sec"]
        for r in q153_interval_union_time(spark, sf).collect()
    }
    # the query returns top-25; every returned row must match the
    # reference, and the reference's top value must be present
    assert got == {
        u: want[u]
        for u in sorted(want, key=lambda u: (-want[u], u))[: len(got)]
    }
