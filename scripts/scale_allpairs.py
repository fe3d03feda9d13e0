"""q218 regime-crossover study: term-major vs AllPairs/L2AP prefix
filter on a FLAT-df corpus vs a ZIPF-HEAD corpus, at 1x/20x(/100x)
constant density — the measurement behind ``_APS_SWITCH_MEAN_DF``.

Flat dirs come from scripts/scale_experiment.py (disjoint-vocabulary
replicas: per-term df constant, postings grow linearly — mean posting
df scale-INVARIANT). The Zipf variant prepends one shared 8-token hot
phrase to 30% of documents (deterministic pmod(doc_id, 10) < 3 gate;
replica offsets are multiples of 10, so the fraction holds at every
factor): 7 bigrams whose df grows WITH the corpus — the heavy-tailed
head real web corpora have and the AllPairs/L2AP literature targets
(Bayardo WWW'07). The hot phrase cannot inflate the true answer: a
pair needs cos >= 0.8, and 7 shared hot bigrams against >= 5 own
bigrams per side caps the hot-only cosine at 7/12 < 0.8.

Cells whose projected term-major join volume exceeds
--est-above-tuples are NOT run; they are reported as ESTIMATES from
the measured ns/tuple of the largest term-major cell that did run
(logged explicitly — no silent caps).

Usage:
  python scripts/scale_allpairs.py [--factors 1,20] [--reps 2] \
      [--est-above-tuples 2e10] [--out docs/scale_allpairs_r10.json]

Run on a QUIET box — concurrent load swings timings +-40%.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
HOT_PHRASE = " ".join(f"zzhot{i}" for i in range(8))


def flat_dir(factor: int) -> Path:
    # scale_experiment.py's layout (built on demand below)
    return Path(f"/tmp/scale_{factor}x")


def zipf_dir(factor: int) -> Path:
    return Path(f"/tmp/scale_aps_zipf_{factor}x")


def ensure_flat(spark, factor: int) -> Path:
    out = flat_dir(factor)
    if not (out / "documents.parquet").exists():
        from scale_experiment import build_dir

        build_dir(spark, out, factor)
    return out


def build_zipf(spark, factor: int) -> Path:
    """documents-only transform of the flat dir (other tables
    symlink): 30% of docs get the SHARED hot phrase prepended."""
    src = ensure_flat(spark, factor)
    out = zipf_dir(factor)
    out.mkdir(parents=True, exist_ok=True)
    for name in TABLES:
        dst = out / f"{name}.parquet"
        if dst.exists() or dst.is_symlink():
            continue
        if name != "documents":
            dst.symlink_to(src / f"{name}.parquet")
            continue
        (
            spark.read.parquet(str(src / "documents.parquet"))
            .withColumn(
                "text",
                F.when(
                    F.pmod(F.col("doc_id"), F.lit(10)) < 3,
                    F.concat(F.lit(HOT_PHRASE + " "), F.col("text")),
                ).otherwise(F.col("text")),
            )
            .write.mode("overwrite")
            .parquet(str(dst))
        )
    return out


def time_cell(spark, sf_dir: str, prefix: bool, reps: int) -> tuple[float, list[float]]:
    from polla_spark.plans.llmdata import allpairs_cosine

    ts = []
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        allpairs_cosine(spark, sf_dir, prefix_filter=prefix).write.format(
            "noop"
        ).mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 2))
    return statistics.median(ts), ts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,20")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--est-above-tuples", type=float, default=2e10)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from polla_spark.plans.llmdata import _aps_postings, choose_aps_regime
    from polla_spark.session import get_spark

    spark = get_spark("scale_allpairs")
    factors = [int(f) for f in args.factors.split(",")]
    cells: list[dict] = []
    term_rates: list[tuple[float, float]] = []  # (tuples, sec)
    for corpus, mk in (("flat", ensure_flat), ("zipf", build_zipf)):
        for f in factors:
            d = str(mk(spark, f))
            _, _, stats = _aps_postings(spark, d)
            spark.catalog.clearCache()
            auto = "prefix" if choose_aps_regime(stats) else "term"
            cell = {
                "corpus": corpus,
                "factor": f,
                "n_postings": stats["n_postings"],
                "sum_df2": stats["sum_df2"],
                "max_df": stats["max_df"],
                "mean_df": round(stats["sum_df2"] / stats["n_postings"], 1),
                "auto_regime": auto,
            }
            for regime, prefix in (("term", False), ("prefix", True)):
                if regime == "term" and stats["sum_df2"] > args.est_above_tuples:
                    rate = max(term_rates, key=lambda r: r[0])
                    est = stats["sum_df2"] * rate[1] / rate[0]
                    cell["term_sec_est"] = round(est, 1)
                    cell["term_est_basis"] = (
                        f"{stats['sum_df2']:.3g} tuples at the measured "
                        f"{1e9 * rate[1] / rate[0]:.1f} ns/tuple of the "
                        f"largest term cell run ({rate[0]:.3g} tuples)"
                    )
                    print(f"# {corpus} {f}x term: NOT RUN — "
                          f"{cell['term_est_basis']} -> est {est:.0f}s",
                          file=sys.stderr)
                    continue
                med, ts = time_cell(spark, d, prefix, args.reps)
                cell[f"{regime}_sec"] = med
                cell[f"{regime}_reps"] = ts
                if regime == "term":
                    term_rates.append((stats["sum_df2"], med))
                print(f"# {corpus} {f}x {regime}: {med}s {ts} "
                      f"(mean_df {cell['mean_df']}, auto={auto})",
                      file=sys.stderr)
            cells.append(cell)
    out = {"metric": "q218_regime_crossover", "cells": cells,
           "switch_mean_df": __import__(
               "polla_spark.plans.llmdata", fromlist=["x"]
           )._APS_SWITCH_MEAN_DF}
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
