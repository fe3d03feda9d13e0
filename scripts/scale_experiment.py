"""Constant-density 20x scale experiment for the heavy query shapes.

The r3 replication experiment inflated duplicate MASS (20 near-copies
of every doc), so the near-dup join stages grew super-linearly by
semantics — the answer itself was ~3,700x larger. This experiment
scales the corpus the way a real corpus grows: each replica lives in
a DISJOINT key/shingle space (doc tokens prefixed per replica; event
users, orders and parts offset per replica), so duplicate density,
graph degree and per-user interval counts stay constant while total
data grows 20x. A plan that holds at 100 TB must scale ~linearly
here (t20/t1 <= ~20 x parallel-efficiency slack).

Usage:
  python scripts/scale_experiment.py [--reps 2] [--factor 20] \
      [--queries q127_prefix_filter_join,...]

Writes /tmp/scale_1x and /tmp/scale_<factor>x (symlinking unscaled
tables from the base sf dir), times each query at both scales via the
noop sink, and prints one JSON line with t1/tN medians and ratios.
Run on a QUIET box — concurrent load swings timings +-40%.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

BASE = os.environ.get("SCALE_BASE_SF_DIR", "/root/testdata/sf0.1")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
DEFAULT_QUERIES = [
    "q127_prefix_filter_join",
    "q128_sorted_neighborhood",
    "q146_pagerank",
    "q153_interval_union_time",
]
# tables each scaled dir rewrites (everything else symlinks to BASE).
# orders shares lineitem's orderkey offset so fact-to-orders joins
# match within each replica (disjoint order spaces across replicas);
# part shares lineitem's partkey offset for the same reason — without
# it, part-joining queries (q168/q172) would silently match nothing
# past replica 0 and understate join work in the reported ratios.
SCALED_TABLES = {"documents", "events", "lineitem", "orders", "part",
                 "embeddings"}


def build_dir(spark, out: Path, factor: int, *, skew: bool = False) -> None:
    """Materialize a factor-x dir: replica i occupies a disjoint key
    space so per-key density is IDENTICAL to the base corpus. With
    ``skew``, :func:`skew_transform` then routes ~30% of rows to one
    hot key (same fraction at every factor — the Zipf head grows with
    the corpus)."""
    out.mkdir(parents=True, exist_ok=True)
    for name in TABLES:
        dst = out / f"{name}.parquet"
        if dst.exists() or dst.is_symlink():
            # a symlink for a now-SCALED table is a stale layout from
            # an older script version (r4 symlinked part) — rebuild it
            # instead of silently reusing base keys
            if name in SCALED_TABLES and dst.is_symlink():
                dst.unlink()
            else:
                continue
        if name not in SCALED_TABLES:
            dst.symlink_to(f"{BASE}/{name}.parquet")
            continue
        base = spark.read.parquet(f"{BASE}/{name}.parquet")
        n = {"documents": 5_000_000_000, "events": 10_000_000_000,
             "lineitem": 100_000_000_000, "orders": 100_000_000_000,
             "part": 100_000_000_000, "embeddings": 1_000_000_000}[name]
        parts = []
        for i in range(factor):
            df = base
            if name == "documents":
                # per-replica token prefix => replicas share NO shingles:
                # duplicate density stays constant instead of inflating
                df = df.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda w: F.concat(F.lit(f"r{i}x"), w),
                        ),
                        " ",
                    ),
                ).withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
            elif name == "events":
                df = (
                    df.withColumn("event_id", F.col("event_id") + F.lit(i * n))
                    .withColumn("user_id", F.col("user_id") + F.lit(i * n))
                )
            elif name == "orders":
                df = df.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(i * n)
                )
            elif name == "part":
                # same offset constant as lineitem's l_partkey so the
                # part join matches inside every replica
                df = df.withColumn(
                    "p_partkey", F.col("p_partkey") + F.lit(i * n)
                )
            elif name == "embeddings":
                # REAL replicas, not symlinks (r7 verdict: the symlink
                # made embedding-query ratios vacuous). Each replica
                # applies an ORTHOGONAL transform — cyclic dimension
                # shift by (i % 64) composed with an odd-dim sign flip
                # for i >= 64 — so intra-replica dot products (hence
                # cosines, LSH codes' relative structure, near-dup
                # answers) are EXACTLY preserved while cross-replica
                # cosines decorrelate: duplicate density stays
                # constant as the corpus grows, the same discipline as
                # the documents token prefix. The transform family has
                # PERIOD 128 (64 shifts x 2 sign patterns): replica
                # 128 would be byte-identical to replica 0 and quietly
                # reintroduce the duplicate-mass inflation — refuse
                # instead of distorting ratios (r8 review finding).
                if factor > 128:
                    raise ValueError(
                        "embeddings replica transforms repeat past "
                        f"factor 128 (got {factor}): extend the "
                        "orthogonal family before scaling further"
                    )
                s = i % 64
                flip = 1 if i >= 64 else 0
                shifted = (
                    f"concat(slice(embedding, {s + 1}, 64 - {s}), "
                    f"slice(embedding, 1, {s}))"
                )
                df = df.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * n)
                ).withColumn(
                    "embedding",
                    F.expr(
                        f"transform({shifted}, (x, j) -> "
                        f"CASE WHEN {flip} = 1 AND j % 2 = 1 "
                        f"THEN -x ELSE x END)"
                    ),
                )
            elif name == "lineitem":
                # disjoint order/part spaces => 20 disjoint co-purchase
                # graphs: constant degree, linear total work
                # l_suppkey is NOT offset: suppliers are shared across
                # replicas (their degree grows with the corpus, like a
                # real vendor base), so supplier joins stay meaningful
                df = (
                    df.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * n))
                    .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * n))
                )
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        if skew:
            u = skew_transform(name, u)
        u.write.mode("overwrite").parquet(str(dst))


HOT_FRACTION = 0.3  # the Zipf head: one key holding ~30% of rows


def skew_transform(name: str, df):
    """Route ~30% of rows to ONE hot key (deterministic row gate) —
    the Zipf-head shape the skew operators exist for. Replica offsets
    are multiples of 10, so the doc_id/hash gates hold the same 30%
    fraction at every factor: the hot key GROWS with the corpus."""
    if name == "documents":
        return df.withColumn(
            "source",
            F.when(
                F.pmod(F.col("doc_id"), F.lit(10)) < 3, F.lit("mega-hot.example")
            ).otherwise(F.col("source")),
        )
    if name == "lineitem":
        # the mega-customer: 30% of fact rows hit orderkey 1
        return df.withColumn(
            "l_orderkey",
            F.when(
                F.pmod(F.xxhash64("l_orderkey", "l_partkey", "l_linenumber"),
                       F.lit(10)) < 3,
                F.lit(1).cast("long"),
            ).otherwise(F.col("l_orderkey")),
        )
    if name == "events":
        # the mega-user: 30% of events from user 1
        return df.withColumn(
            "user_id",
            F.when(
                F.pmod(F.xxhash64("event_id"), F.lit(10)) < 3,
                F.lit(1).cast("long"),
            ).otherwise(F.col("user_id")),
        )
    return df


def _skew_variants(spark):
    """(variant -> plan) pairs measured on the SAME skewed dirs: each
    skew-safe operator next to its naive control, so the table shows
    which naive shapes Spark already rescues (map-side combine, AQE
    skew-join) and which genuinely need the rewrite (windows)."""
    from polla_spark.operators.skew import hot_key_split_join, salted_sum_count

    def _li(d):
        return spark.read.parquet(f"{d}/lineitem.parquet")

    def _ev(d):
        return spark.read.parquet(f"{d}/events.parquet")

    def salted_agg(d):
        li = _li(d).select("l_returnflag", "l_quantity")
        return salted_sum_count(
            li, ["l_returnflag"], F.col("l_quantity").cast("decimal(18,4)")
        )

    def plain_agg(d):
        return (
            _li(d)
            .groupBy("l_returnflag")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("total"),
                F.count("*").alias("n"),
            )
        )

    def _orders(d):
        return spark.read.parquet(f"{d}/orders.parquet").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
        )

    def split_join(d):
        j = hot_key_split_join(
            _li(d).select("l_orderkey", "l_quantity"), _orders(d),
            "l_orderkey", [1],
        )
        return j.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sum_qty"),
        )

    def plain_join(d):
        j = _li(d).select("l_orderkey", "l_quantity").join(
            _orders(d), "l_orderkey"
        )
        return j.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sum_qty"),
        )

    def capped_two_stage(d):
        # the salted two-stage top-15 fallback (for window shapes
        # rank pushdown can't rescue), applied at event grain (the
        # documents table is too small at sf0.1 to resolve the skew)
        from pyspark.sql import Window

        e = _ev(d).select("user_id", "value", "event_id")
        salt = F.pmod(F.xxhash64("event_id"), F.lit(16))
        w1 = Window.partitionBy("user_id", "_salt").orderBy(
            F.desc("value"), "event_id"
        )
        cand = (
            e.withColumn("_salt", salt)
            .withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= 15)
        )
        w2 = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
        return (
            cand.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= 15)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_kept"), F.sum("value").alias("kept_value"))
        )

    def capped_rank_pushdown(d):
        # the production q104 shape: the explicit rn<=15 filter
        # licenses WindowGroupLimit Partial, so each map partition
        # collapses to its local top-15 BEFORE the exchange
        from pyspark.sql import Window

        e = _ev(d).select("user_id", "value", "event_id")
        w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
        return (
            e.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 15)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_kept"), F.sum("value").alias("kept_value"))
        )

    def capped_agg_all_rows(d):
        # the shape that LOSES the pushdown: conditional aggs over
        # every ranked row — the whole table shuffles and the hot
        # key's rows all land on one window task
        from pyspark.sql import Window

        e = _ev(d).select("user_id", "value", "event_id")
        w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
        kept = F.col("rn") <= 15
        return (
            e.withColumn("rn", F.row_number().over(w))
            .groupBy("user_id")
            .agg(
                F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
                F.sum(F.when(kept, F.col("value"))).alias("kept_value"),
            )
        )

    # conf overrides per variant: the join controls must not hide the
    # shuffle behind an auto-broadcast of the 20x orders side; the
    # "_noaqe" control turns off AQE skew-splitting to show the
    # unrescued baseline
    no_bcast = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    no_skew_rescue = {**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "false"}
    return [
        ("salted_agg", salted_agg, {}),
        ("plain_agg_control", plain_agg, {}),
        ("split_join", split_join, no_bcast),
        ("plain_join_aqe_control", plain_join, no_bcast),
        ("plain_join_noaqe_control", plain_join, no_skew_rescue),
        ("capped_rank_pushdown", capped_rank_pushdown, {}),
        ("capped_two_stage", capped_two_stage, {}),
        ("capped_agg_all_rows_control", capped_agg_all_rows, {}),
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--reps", type=int, default=None,
                    help="timing reps per scale (default 2; 1 with --all)")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--all", action="store_true",
                    help="run the ENTIRE registry (reps default 1): the "
                    "full-inventory scale regression sweep — every query "
                    "measured at 1x and factor-x, ratios to stdout")
    ap.add_argument("--out", default=None,
                    help="also write the result JSON to this path")
    ap.add_argument("--skew", action="store_true",
                    help="Zipf-head mode: 30%% of rows on one hot key; "
                    "measures each skew operator against its naive "
                    "control instead of registry queries")
    args = ap.parse_args()

    from polla_spark.plans import registry
    from polla_spark.session import get_spark

    spark = get_spark("scale_experiment")
    reg = registry()
    if args.all:
        # plain string sort — stable and complete is all that matters
        # (q134 sorts before q50; ids currently span q01..q183)
        names = sorted(reg)
    else:
        names = [q for q in args.queries.split(",") if q]
    if args.reps is None:
        args.reps = 1 if args.all else 2

    tag = "scale_skew" if args.skew else "scale"
    one = Path(f"/tmp/{tag}_1x")
    big = Path(f"/tmp/{tag}_{args.factor}x")
    build_dir(spark, one, 1, skew=args.skew)
    build_dir(spark, big, args.factor, skew=args.skew)

    if args.skew:
        plans = [(n, fn, conf) for n, fn, conf in _skew_variants(spark)]
    else:
        plans = [
            (name, (lambda q: lambda d: q.spark(spark, d))(reg[name]), {})
            for name in names
        ]

    result: dict[str, dict] = {}
    for name, fn, conf in plans:
        saved = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            row: dict = {}
            for label, d in (("t1", one), (f"t{args.factor}", big)):
                reps = []
                for _ in range(args.reps):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    fn(str(d)).write.format("noop").mode("overwrite").save()
                    reps.append(time.perf_counter() - t0)
                row[label] = round(statistics.median(reps), 2)
                print(f"# {name} {label}: {row[label]}s of "
                      f"{[round(r, 2) for r in reps]}", file=sys.stderr)
            row["ratio"] = round(row[f"t{args.factor}"] / row["t1"], 1)
            result[name] = row
        except Exception as exc:  # full-sweep mode: record, keep going
            result[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"# {name} ERROR {result[name]['err']}", file=sys.stderr)
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    out: dict = {"factor": args.factor, "base": BASE, "reps": args.reps,
                 "queries": result}
    if args.skew:
        out["mode"] = "skew"
        out["hot_fraction"] = HOT_FRACTION
    line = json.dumps(out)
    if args.out:
        Path(args.out).write_text(line)
    print(line)


if __name__ == "__main__":
    main()
