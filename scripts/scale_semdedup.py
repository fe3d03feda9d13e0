"""q204 SemDeDup at the PRODUCTION configuration: scale the LSH plane
count with the corpus (r9 verdict task #1).

SCALE.md's r8 caveat: with the plane count FIXED at 8, per-cell
occupancy grows linearly with the corpus and in-cell pair work grows
~quadratically — q204 measured 20.6× at 100× and the ratio is
structural, not noise. The production rule scales cells with data:

    n_planes(f) = 8 + round(log2 f)        (f = corpus scale factor)

so 2^round(log2 f) ≈ f and per-cell occupancy — hence per-cell pair
work — holds ~constant. This script measures BOTH configurations at
each factor on the same box (fixed-8 as the saturating control,
log-scaled as the production path) and records the occupancy census
that explains the timings: non-empty cells, mean/max occupancy and
the exact candidate-pair workload Σ c·(c−1)/2.

Usage:
  python scripts/scale_semdedup.py [--factors 1,20,100] [--reps 2] \
      [--out docs/scale_semdedup_r9.json]

Reuses scale_experiment's constant-density dirs (/tmp/scale_<f>x —
REAL orthogonally-transformed embedding replicas, so cross-replica
cosines decorrelate and duplicate density stays constant). Run on a
QUIET box.
"""

from __future__ import annotations

import argparse
import json
import math
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_experiment import build_dir  # noqa: E402


def planes_for(factor: int) -> int:
    return 8 + round(math.log2(factor)) if factor > 1 else 8


def occupancy(spark, sf_dir: str, n_planes: int) -> dict:
    """Non-empty-cell census for the given code width: the quantity
    the plane-scaling rule holds constant is mean occupancy (and with
    it the exact in-cell pair workload)."""
    from polla_spark.plans.llmdata import _code_spark_expr

    cells = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumn("code", F.expr(_code_spark_expr(n_planes)))
        .groupBy("code")
        .agg(F.count("*").alias("c"))
        .agg(
            F.count("*").alias("n_cells"),
            F.sum("c").alias("n_vecs"),
            F.max("c").alias("max_occ"),
            F.sum(F.expr("c * (c - 1) div 2")).alias("pair_work"),
        )
        .collect()[0]
    )
    return {
        "n_planes": n_planes,
        "n_cells_nonempty": cells["n_cells"],
        "n_vecs": cells["n_vecs"],
        "mean_occ": round(cells["n_vecs"] / cells["n_cells"], 1),
        "max_occ": cells["max_occ"],
        "pair_work": cells["pair_work"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,20,100")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from polla_spark.plans.llmdata import semantic_dedup_clusters
    from polla_spark.session import get_spark

    spark = get_spark("scale_semdedup")
    factors = [int(f) for f in args.factors.split(",")]
    result: dict = {"rule": "n_planes(f) = 8 + round(log2 f)", "reps": args.reps,
                    "factors": {}}
    for f in factors:
        d = Path(f"/tmp/scale_{f}x") if f > 1 else Path("/tmp/scale_1x")
        build_dir(spark, d, f)
        row: dict = {}
        for label, planes in (("fixed8", 8), ("scaled", planes_for(f))):
            if label == "scaled" and planes == 8:
                row["scaled"] = {"same_as": "fixed8"}
                continue
            reps = []
            for _ in range(args.reps):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                semantic_dedup_clusters(spark, str(d), planes).write.format(
                    "noop"
                ).mode("overwrite").save()
                reps.append(time.perf_counter() - t0)
            med = round(statistics.median(reps), 2)
            spark.catalog.clearCache()
            row[label] = {"sec": med, **occupancy(spark, str(d), planes)}
            print(f"# f={f} {label} planes={planes}: {med}s of "
                  f"{[round(r, 2) for r in reps]} occ={row[label]}",
                  file=sys.stderr)
        result["factors"][str(f)] = row
    # ratios vs each configuration's own 1x time
    base = result["factors"].get("1", {})
    for f, row in result["factors"].items():
        for label in ("fixed8", "scaled"):
            cfg = row.get(label, {})
            b = base.get("fixed8", {}).get("sec")
            if "sec" in cfg and b:
                cfg["ratio_vs_1x"] = round(cfg["sec"] / b, 1)
    line = json.dumps(result)
    if args.out:
        Path(args.out).write_text(line)
    print(line)


if __name__ == "__main__":
    main()
