"""Regenerate the golden plan skeletons (tests/goldens/plans/).

Run after an INTENTIONAL plan change:

    python scripts/gen_plan_goldens.py            # all 20
    python scripts/gen_plan_goldens.py q190_containment_join ...

Goldens are pinned at the sf0.001 test dir (same dir the pytest suite
uses) so static broadcast-threshold decisions match the test run.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "goldens" / "plans"
SF = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

# The 24 heaviest / most plan-sensitive queries: the round-6 verdict's
# 5 most expensive headline plans + the 12 heavy scale shapes + the
# refactor-prone shared-kernel queries.
GOLDEN_QUERIES = [
    "q53_lsh_candidate_pairs",
    "q62_simhash_bands",
    "q67_dedup_components",
    "q76_trigram_lang_id",
    "q81_lsh_rescored_jaccard",
    "q87_bm25_topk",
    "q97_incremental_dedup",
    "q104_source_quota",
    "q112_quality_audit",
    "q127_prefix_filter_join",
    "q130_histogram_median",
    "q134_interval_overlap",
    "q146_pagerank",
    "q176_affinity_lift",
    "q181_triangle_count",
    "q188_countmin_frequency",
    "q189_duplicate_spans",
    "q190_containment_join",
    "q191_kmv_distinct",
    "q194_inclusion_profile",
    # r7 shared-kernel additions — the queries most exposed to kernel
    # refactors (functions/quantiles, kmv_set_algebra, ahash_bands)
    "q202_quantile_merge_order",
    "q203_kmv_set_algebra",
    "q204_semantic_dedup_clusters",
    "q205_phash_near_dup",
    "q209_dct_phash_near_dup",
    "q208_fs_trained_classify",
    "q211_jaro_winkler",
    # r9: the PRODUCTION SemDeDup config (log-scaled plane count —
    # the shape scripts/scale_semdedup.py measures at 20x)
    "q204_semantic_dedup_planes12",
    # r10: the four r9 plan-shape-pinned queries the r9 verdict noted
    # were asserted but not snapshot (task #5), plus BOTH q218
    # regimes — the auto-switch means either plan can be the
    # registered one, so drift in either must show up in review
    "q212_kmeans_train",
    "q213_smoothed_lm_filter",
    "q215_golden_records",
    "q218_allpairs_cosine",
    "q218_allpairs_prefix",
    # r10 session-2: the two new queries with data-sized operators
    # (q225's broadcast-scored bigram stream, q228's gram exchange)
    "q225_dsir_importance",
    "q228_repetition_profile",
    # r11: the remaining r10-new queries (verdict task #6) + the
    # third q218 regime (skew-split chunk grid) + the planted-knee
    # q222 sweep
    "q219_lsh_calibration",
    "q222_dedup_threshold_sweep",
    "q224_perceptron_quality",
    "q226_source_quality_lcb",
    "q227_incremental_lsh_pairs",
    "q229_embedding_drift",
    "q230_length_drift_chi2",
    "q218_allpairs_skew",
    # r12: the six r11-new queries (verdict task #6) + the
    # incremental-components fold (merge_components' broadcast-remap
    # shape must stay visible in review)
    "q231_perplexity_buckets",
    "q232_source_vocab_overlap",
    "q233_tfidf_keywords",
    "q234_zipf_head_profile",
    "q235_bigram_novelty",
    "q236_cluster_size_histogram",
    "q237_incremental_components",
    "q238_capped_lsh_recall",
]


def extra_plans() -> dict:
    """Golden-pinned plan VARIANTS that are not registry entries
    (name -> builder(spark, sf_dir)). Shared with
    tests/test_plan_goldens.py so the pin and the generator cannot
    disagree about what a name builds."""
    from polla_spark.plans.llmdata import (
        allpairs_cosine,
        semantic_dedup_clusters,
    )

    return {
        "q204_semantic_dedup_planes12": (
            lambda spark, sf: semantic_dedup_clusters(spark, sf, n_planes=12)
        ),
        # the non-registered q218 regimes (AllPairs/L2AP prefix
        # filter; r11 skew-split chunk grid): on flat-df corpora the
        # auto-switch picks term-major, so these plans would
        # otherwise never be snapshot
        "q218_allpairs_prefix": (
            lambda spark, sf: allpairs_cosine(spark, sf, prefix_filter=True)
        ),
        "q218_allpairs_skew": (
            lambda spark, sf: allpairs_cosine(spark, sf, regime="skew")
        ),
    }


def main() -> None:
    from polla_spark.plans import registry
    from polla_spark.plans.skeleton import plan_skeleton
    from polla_spark.session import get_spark

    names = sys.argv[1:] or GOLDEN_QUERIES
    # cpus=4 == the pytest session shape: shuffle-partition count
    # decides whether a repartition collapses into an upstream agg
    # exchange, so goldens must be cut with the test session's config
    spark = get_spark("gen_plan_goldens", cpus=4)
    reg = registry()
    extra = extra_plans()
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    for name in names:
        build = extra[name] if name in extra else reg[name].spark
        df = build(spark, SF)
        (GOLDEN_DIR / f"{name}.txt").write_text(plan_skeleton(df))
        spark.catalog.clearCache()  # eager persists must not leak across
        print(f"wrote {name}.txt")


if __name__ == "__main__":
    main()
