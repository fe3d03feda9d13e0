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
SCALED_TABLES = {"documents", "events", "lineitem", "orders", "part"}


def build_dir(spark, out: Path, factor: int) -> None:
    """Materialize a factor-x dir: replica i occupies a disjoint key
    space so per-key density is IDENTICAL to the base corpus."""
    out.mkdir(parents=True, exist_ok=True)
    for name in TABLES:
        dst = out / f"{name}.parquet"
        if dst.exists() or dst.is_symlink():
            continue
        if name not in SCALED_TABLES:
            dst.symlink_to(f"{BASE}/{name}.parquet")
            continue
        base = spark.read.parquet(f"{BASE}/{name}.parquet")
        n = {"documents": 5_000_000_000, "events": 10_000_000_000,
             "lineitem": 100_000_000_000, "orders": 100_000_000_000,
             "part": 100_000_000_000}[name]
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
        u.write.mode("overwrite").parquet(str(dst))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()

    from polla_spark.plans import registry
    from polla_spark.session import get_spark

    spark = get_spark("scale_experiment")
    reg = registry()
    names = [q for q in args.queries.split(",") if q]

    one = Path("/tmp/scale_1x")
    big = Path(f"/tmp/scale_{args.factor}x")
    build_dir(spark, one, 1)
    build_dir(spark, big, args.factor)

    result: dict[str, dict[str, float]] = {}
    for name in names:
        q = reg[name]
        row: dict[str, float] = {}
        for label, d in (("t1", one), (f"t{args.factor}", big)):
            reps = []
            for _ in range(args.reps):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                q.spark(spark, str(d)).write.format("noop").mode(
                    "overwrite"
                ).save()
                reps.append(time.perf_counter() - t0)
            row[label] = round(statistics.median(reps), 2)
            print(f"# {name} {label}: {row[label]}s of "
                  f"{[round(r, 2) for r in reps]}", file=sys.stderr)
        row["ratio"] = round(row[f"t{args.factor}"] / row["t1"], 1)
        result[name] = row
    print(json.dumps({"factor": args.factor, "base": BASE,
                      "queries": result}))


if __name__ == "__main__":
    main()
