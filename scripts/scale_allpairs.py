"""q218 regime study: term-major vs AllPairs/L2AP prefix filter on a
flat-df corpus vs a SPARSE-TAIL ZIPF corpus, at 1x/20x constant
density — the measurements behind ``choose_aps_regime``'s
two-condition rule (llmdata.py).

What round 10 actually measured (and why the rule is an AND):

- FLAT corpus (scripts/scale_experiment.py replicas — dense 931-term
  base vocabulary, no head): term-major wins outright (9.5 s vs
  134 s at 1x), and the prefix regime's pair-major rescore — which
  materializes |candidates| x doc-length rows through exchanges —
  **DIED ON DISK at 20x** (java.io.IOException: No space left on
  device after >78 GB of shuffle spill; the candidate set on this
  dense vocabulary is ~50,000x the true answer). Term-major's
  quadratic is IN-TASK tuples consumed by the map-side partial agg;
  its shuffle is postings-sized, so it cannot die that way. The
  flat/20x/prefix cell is therefore recorded as a SKIP with the
  measured failure, not re-run by default (--run-disk-killer forces
  it).
- SPARSE-TAIL ZIPF corpus (pair-private token vocabularies + one
  shared 8-token hot phrase on 30% of docs): the head terms carry
  df ~ 0.3N, so term-major's biggest term is a single-task
  (0.3N)^2-tuple straggler, while the prefix bounds provably prune
  the head (rare-first order puts df-heavy terms in every suffix)
  and the doc-unique tail generates almost no candidates — the
  regime crossover the AllPairs/L2AP literature targets (Bayardo
  WWW'07), measured here.

The hot phrase cannot inflate the true answer: a pair needs
cos >= 0.8, and 7 shared hot bigrams against >= 5 private bigrams
per side caps the hot-only cosine at 7/12 < 0.8.

Usage:
  python scripts/scale_allpairs.py [--factors 1,20] [--reps 2] \
      [--est-above-tuples 2e10] [--out docs/scale_allpairs_r10.json] \
      [--run-disk-killer]

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

#: cells whose failure mode is already measured — re-running one
#: fills the disk and kills the box for ~no information; the recorded
#: note IS the measurement (r10 session, this machine: 252 GB volume)
DISK_KILLERS = {
    ("flat", 20, "prefix"):
        "ABORTED (measured r10): java.io.IOException: No space left on "
        "device after >78 GB shuffle spill in the pair-major rescore — "
        "dense-vocabulary candidates are ~50,000x the answer; this is "
        "the regime choose_aps_regime exists to avoid on dense tails",
    ("flat", 100, "prefix"):
        "NOT RUN: strictly dominates the measured 20x disk death "
        "(candidate volume grows linearly in replicas, rescore rows "
        "5x the 20x point that already exhausted the 252 GB volume)",
    ("zipf_dense", 20, "prefix"):
        "NOT RUN: the zipf_dense tail IS the flat corpus, whose 20x "
        "prefix cell is the measured disk death above — adding a head "
        "only grows the candidate set further",
    ("zipf_dense", 100, "prefix"):
        "NOT RUN: dominated by the flat 20x disk death (same tail, "
        "5x the volume, plus the head)",
}


def flat_dir(factor: int) -> Path:
    # scale_experiment.py's layout (built on demand below)
    return Path(f"/tmp/scale_{factor}x")


def ensure_flat(spark, factor: int) -> Path:
    out = flat_dir(factor)
    if not (out / "documents.parquet").exists():
        from scale_experiment import build_dir

        build_dir(spark, out, factor)
    return out


def build_zipf_sparse(spark, factor: int) -> Path:
    """documents-only transform of the flat dir (other tables
    symlink): every token gets a PAIR-PRIVATE prefix (docs 2k/2k+1
    share a vocabulary, nobody else does — the sparse tail, df <= 2),
    then 30% of docs (deterministic pmod gate; replica offsets are
    multiples of 10, so the fraction holds at every factor) get the
    SHARED hot phrase prepended — the Zipf head that grows with the
    corpus."""
    src = ensure_flat(spark, factor)
    out = Path(f"/tmp/scale_aps_zipfsparse_{factor}x")
    out.mkdir(parents=True, exist_ok=True)
    for name in TABLES:
        dst = out / f"{name}.parquet"
        if dst.exists() or dst.is_symlink():
            continue
        if name != "documents":
            dst.symlink_to(src / f"{name}.parquet")
            continue
        base = spark.read.parquet(str(src / "documents.parquet"))
        grp = F.floor(F.col("doc_id") / 2).cast("string")
        private = F.array_join(
            F.transform(
                F.split("text", " "),
                lambda w: F.concat(F.lit("g"), grp, F.lit("x"), w),
            ),
            " ",
        )
        (
            base.withColumn("text", private)
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


def build_zipf_dense(spark, factor: int) -> Path:
    """documents-only transform of the flat dir: the flat corpus's
    DENSE base vocabulary is kept verbatim (the dense tail — mean
    posting df far above the sparsity threshold, the corpus class
    where the prefix rescore died on disk), and 30% of docs get the
    SHARED hot phrase prepended (the head). This is the
    head-dominant + dense-tail cell choose_aps_regime sends to the
    r11 skew-split regime — r10's one uncovered class, where plain
    term-major ate head stragglers because prefix provably dies."""
    src = ensure_flat(spark, factor)
    out = Path(f"/tmp/scale_aps_zipfdense_{factor}x")
    out.mkdir(parents=True, exist_ok=True)
    for name in TABLES:
        dst = out / f"{name}.parquet"
        if dst.exists() or dst.is_symlink():
            continue
        if name != "documents":
            dst.symlink_to(src / f"{name}.parquet")
            continue
        base = spark.read.parquet(str(src / "documents.parquet"))
        (
            base.withColumn(
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


def time_cell(spark, sf_dir: str, regime: str, reps: int) -> tuple[float, list[float]]:
    from polla_spark.plans.llmdata import allpairs_cosine

    ts = []
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        allpairs_cosine(spark, sf_dir, regime=regime).write.format(
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
    ap.add_argument("--run-disk-killer", action="store_true")
    ap.add_argument("--corpora", default="flat,zipf_sparse")
    ap.add_argument("--regimes", default="term,prefix,skew")
    args = ap.parse_args()

    from polla_spark.plans.llmdata import _aps_postings, choose_aps_regime
    from polla_spark.session import get_spark

    spark = get_spark("scale_allpairs")
    factors = [int(f) for f in args.factors.split(",")]
    builders = {
        "flat": ensure_flat,
        "zipf_sparse": build_zipf_sparse,
        "zipf_dense": build_zipf_dense,
    }
    cells: list[dict] = []
    term_rates: list[tuple[float, float]] = []  # (tuples, sec)
    for corpus in args.corpora.split(","):
        for f in factors:
            d = str(builders[corpus](spark, f))
            _, _, stats = _aps_postings(spark, d)
            spark.catalog.clearCache()
            auto = choose_aps_regime(stats)
            cell = {
                "corpus": corpus,
                "factor": f,
                "n_postings": stats["n_postings"],
                "sum_df2": stats["sum_df2"],
                "sum_df2_tail": stats["sum_df2_tail"],
                "max_df": stats["max_df"],
                "auto_regime": auto,
            }
            for regime in args.regimes.split(","):
                skip = DISK_KILLERS.get((corpus, f, regime))
                if skip and not args.run_disk_killer:
                    cell[f"{regime}_skip"] = skip
                    print(f"# {corpus} {f}x {regime}: SKIP — {skip}",
                          file=sys.stderr)
                    continue
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
                med, ts = time_cell(spark, d, regime, args.reps)
                cell[f"{regime}_sec"] = med
                cell[f"{regime}_reps"] = ts
                if regime == "term":
                    term_rates.append((stats["sum_df2"], med))
                print(f"# {corpus} {f}x {regime}: {med}s {ts} (auto={auto})",
                      file=sys.stderr)
            cells.append(cell)
    out = {"metric": "q218_regime_crossover", "cells": cells}
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
