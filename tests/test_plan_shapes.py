"""Physical-plan regression tests: the declared queries must keep the
plan SHAPE that makes them viable at 100 TB, not just return correct
rows. Each assertion pins one scale property from the query docstring
(broadcast of dims, top-k without a global sort, window/groupBy sort
reuse) so a refactor that silently degrades the plan fails here long
before a benchmark would catch it.
"""

from __future__ import annotations

from polla_spark.plans.llmdata import (
    q76_trigram_lang_id,
    q77_quantized_knn,
    q81_lsh_rescored_jaccard,
    q82_bucket_cosine_pairs,
    q83_lsh_edit_rescore,
)
from polla_spark.plans.relational import (
    q46_small_quantity_revenue,
    q69_returned_items,
)
from polla_spark.plans.windows_q import q72_sessionize

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q69_topk_without_global_sort(spark):
    plan = _plan(q69_returned_items(spark, SF))
    # orderBy+limit must compile to TakeOrderedAndProject (per-task
    # top-20 then merge), never a full Sort of the aggregate output
    assert "TakeOrderedAndProject" in plan
    # nation is a broadcast dim: no shuffle of the fact side for it
    assert "BroadcastHashJoin" in plan


def test_q46_broadcasts_part_dim(spark):
    plan = _plan(q46_small_quantity_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    # the p_size filter reaches the part scan, not a post-scan Filter only
    assert "LessThan(p_size,25)" in plan


def test_q72_single_hash_shuffle(spark):
    plan = _plan(q72_sessionize(spark, SF))
    # lag + cumulative sum + groupBy(user_id, session_id) must all ride
    # ONE exchange on user_id: HashPartitioning(user_id) satisfies the
    # grouping's ClusteredDistribution, and both windows share the sort
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 1, plan


def test_q76_profile_join_is_broadcast(spark):
    # the ≤40-rows-per-lang profile must broadcast to the trigram side;
    # a shuffled join here would move the full exploded corpus twice
    plan = _plan(q76_trigram_lang_id(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_q77_query_side_is_broadcast(spark):
    # 3 query vectors vs the corpus: the cross join must be a broadcast
    # nested loop (stream the corpus once), never a shuffled cartesian
    plan = _plan(q77_quantized_knn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q84_two_shuffles_no_python(spark):
    # the composed selection must stay: one exchange for the sha
    # survivor window + one for the per-source report — no joins, no
    # Python boundary, no cartesian
    from polla_spark.plans.llmdata import q84_training_set_select

    plan = _plan(q84_training_set_select(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_q87_postings_filtered_before_explode_and_dims_broadcast(spark):
    # BM25: the isin(query terms) filter must run INSIDE the token
    # array before the explode (the shuffle carries postings, not the
    # corpus), and both the df table and the corpus scalars must join
    # as broadcasts — never a shuffled join against 3 rows
    from polla_spark.plans.llmdata import q87_bm25_topk

    plan = _plan(q87_bm25_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort
    assert "BroadcastHashJoin" in plan  # df(term) dim
    assert "CartesianProduct" not in plan
    # the only explode input is the pre-filtered array
    assert "filter(_toks" in plan or "ArrayFilter" in plan or "array_filter" in plan.lower(), plan


def test_q181_triangles_reuse_persisted_graph_once(spark):
    # degree-orientation triangle count: the fact scans ONCE into the
    # persisted edge table; edges feed the degree census + orientation,
    # and the persisted oriented table feeds both wedge sides and the
    # closure probe (>= 4 cache reads; FileScans re-printed INSIDE
    # InMemoryRelation blocks don't re-execute); no all-pairs operator
    from polla_spark.plans.relational import q181_triangle_count

    plan = _plan(q181_triangle_count(spark, SF))
    assert plan.count("InMemoryTableScan") >= 4, plan
    assert "CartesianProduct" not in plan, plan
    # the only BroadcastNestedLoop joins are the 1-row stat gluing
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan


def test_q179_hybrid_rrf_arms_stay_bounded(spark):
    # hybrid RRF: the lexical arm shuffles only query-term postings
    # (isin filter inside the token array before the explode, q87's
    # shape), the semantic arm broadcasts the 3-query side, and the
    # fusion joins two <=20-rows-per-query tables — no all-pairs
    # operator anywhere
    from polla_spark.plans.llmdata import q179_hybrid_retrieval_rrf

    plan = _plan(q179_hybrid_retrieval_rrf(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "filter(_toks" in plan or "array_filter" in plan.lower(), plan
    assert "BroadcastHashJoin" in plan, plan  # qterms/df dims
    # per-arm top-20: rank pushdown collapses map partitions first
    assert "WindowGroupLimit" in plan, plan
    assert "EvalPython" not in plan, plan


def test_q88_zero_shuffles_before_output_sort(spark):
    # repetition ratio is per-row array math: the ONLY exchange allowed
    # is the rangepartitioning for the final orderBy
    from polla_spark.plans.llmdata import q88_repetition_ratio

    plan = _plan(q88_repetition_ratio(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "EvalPython" not in plan


def test_q95_prefix_sum_is_hierarchical(spark):
    # the ONLY single-partition step allowed is the bucket-totals
    # window (corpus/128 rows); the chunk-level cumsum must ride a
    # hash-partitioned window, and the bucket offsets must join back
    # as a broadcast — a flat global-order window here would put the
    # whole corpus in one task
    from polla_spark.plans.llmdata import q95_pack_sequences

    plan = _plan(q95_pack_sequences(spark, SF))
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "hashpartitioning(bucket" in plan, plan
    assert "BroadcastHashJoin" in plan


def test_q96_bench_set_broadcasts_corpus_never_shuffles(spark):
    # decontamination: the eval set rides a 1-row broadcast
    # (collect_set) and the corpus scores itself within-row via
    # array_intersect — the only hash exchanges are the two tiny agg
    # exchanges (bench-gram distinct-ish agg + final per-source
    # report); the corpus text itself must never shuffle and never
    # cross a Python boundary
    from polla_spark.plans.llmdata import q96_decontamination

    plan = _plan(q96_decontamination(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "array_intersect" in plan, plan


def test_q99_scrub_is_pure_jvm(spark):
    # the PII scrub must stay in codegen'd JVM expressions: one partial
    # agg exchange on source, no Python eval anywhere
    from polla_spark.plans.llmdata import q99_pii_scrub

    plan = _plan(q99_pii_scrub(spark, SF))
    assert "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q100_shuffle_is_one_exchange_no_global_sort(spark):
    # the seeded global shuffle must hash-partition by shard and sort
    # WITHIN partitions — a global Sort (rangepartitioning over the
    # full corpus) here would serialize the permutation
    from polla_spark.plans.llmdata import q100_global_shuffle

    plan = _plan(q100_global_shuffle(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q102_single_term_shuffle(spark):
    # tf + df must come off ONE logical shuffle on the term key (Spark
    # plans count(distinct) as a two-level agg over the same key); the
    # doc total rides a broadcast; top-25 is TakeOrdered, no global sort
    from polla_spark.plans.llmdata import q102_tfidf_terms

    plan = _plan(q102_tfidf_terms(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_q108_funnel_rides_one_user_exchange(spark):
    # three funnel stages = three windows + a groupBy, ALL partitioned
    # by user_id: Catalyst must plan them on a single hash exchange —
    # a per-stage self-join funnel would shuffle the fact three times
    from polla_spark.plans.windows_q import q108_funnel

    plan = _plan(q108_funnel(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_rescore_queries_never_cartesian(spark):
    # the whole point of the candidates->rescore composition: every
    # pairing is an equi-join (band sig / bucket code / candidate id),
    # so no plan may contain an all-pairs operator
    for q in (q81_lsh_rescored_jaccard, q82_bucket_cosine_pairs,
              q83_lsh_edit_rescore):
        plan = _plan(q(spark, SF))
        assert "CartesianProduct" not in plan, q.__name__
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__


def test_q66_no_exchange_carries_payload_bytes(spark):
    # media payloads must NEVER cross a shuffle: the mapInPandas
    # kernel runs on the scan's own partitioning, and the only
    # exchanges in the plan sit ABOVE the kernel, carrying its
    # (small, fixed-width) feature output. At 100 TB of media a
    # repartition of `content` would be the most expensive single
    # data movement in the system (r2 verdict flag).
    from polla_spark.plans.llmdata import q66_multimodal_features

    import contextlib
    import io

    df = q66_multimodal_features(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    # formatted mode prints one "(n) NodeName" block per operator with
    # an "Output [k]: [cols]" line; no Exchange block may list content
    for block in plan.split("\n\n"):
        if block.strip().startswith("(") and "Exchange" in block.split("\n", 1)[0]:
            assert "content" not in block, f"payload crossed a shuffle:\n{block}"
    # and the kernel itself is still in the plan (not optimized away)
    assert "MapInPandas" in plan, plan


def test_q121_bucketed_join_has_no_join_exchange(spark):
    # with broadcast disabled, the bucketed tables must sort-merge
    # join WITHOUT shuffling either side: the only hashpartitioning
    # exchange in the plan is the groupBy above the join
    from polla_spark.plans.relational import q121_bucketed_join

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(q121_bucketed_join(spark, SF))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q116_ohlc_is_one_mergeable_agg(spark):
    # min_by/max_by are ordinary mergeable aggregates: the bars come
    # off ONE partial-agged hash exchange — never a sort or a window
    # over the series
    from polla_spark.plans.windows_q import q116_ohlc_bars

    plan = _plan(q116_ohlc_bars(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan, plan
    below = plan[plan.index("hashpartitioning"):]
    assert "partial" in below.lower(), plan


def test_q117_twap_one_window_exchange(spark):
    # the lead window on event_type is the only data-scale exchange;
    # the weighted sums partial-aggregate above it
    from polla_spark.plans.windows_q import q117_twap

    plan = _plan(q117_twap(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan, plan


def test_q118_q119_single_partial_agg(spark):
    # both profile queries are one partial-agged shuffle to a
    # constant-sized group space — no join, no window
    from polla_spark.plans.relational import (
        q118_value_histogram,
        q119_segment_correlation,
    )

    for q in (q118_value_histogram, q119_segment_correlation):
        plan = _plan(q(spark, SF))
        assert plan.count("Exchange hashpartitioning") == 1, (q.__name__, plan)
        assert "Join" not in plan, (q.__name__, plan)
        assert "Window" not in plan, (q.__name__, plan)
        below = plan[plan.index("hashpartitioning"):]
        assert "partial" in below.lower(), (q.__name__, plan)


def test_q122_growth_window_runs_on_report(spark):
    # the data-scale work is ONE partial-agg shuffle to month grain;
    # the lag window runs on the months-sized report (its
    # SinglePartition exchange carries ~tens of rows, not data)
    from polla_spark.plans.windows_q import q122_monthly_growth

    plan = _plan(q122_monthly_growth(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    below = plan[plan.index("hashpartitioning"):]
    assert "partial" in below.lower(), plan


def test_q123_share_single_agg_then_tiny_window(spark):
    from polla_spark.plans.relational import q123_share_of_total

    plan = _plan(q123_share_of_total(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_q124_stacked_leads_share_one_exchange_and_sort(spark):
    # both lead() columns use the same window spec: ONE user_id
    # exchange, ONE sort, then a partial-agged path count and a
    # TakeOrdered top-10 — never a second data-scale sort
    from polla_spark.plans.windows_q import q124_path_trigrams

    plan = _plan(q124_path_trigrams(spark, SF))
    assert plan.count("Exchange hashpartitioning") <= 2, plan  # window + agg
    assert plan.count("Window") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q125_paragraph_dedup_text_moves_once(spark):
    # segmentation + hashing are within-row (Generate under the scan);
    # the only data-scale exchanges are the md5-key window and the
    # doc-grain agg — no join, no third shuffle
    from polla_spark.plans.llmdata import q125_paragraph_dedup

    plan = _plan(q125_paragraph_dedup(spark, SF))
    assert "Generate" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Join" not in plan, plan


def test_q120_weighted_sample_no_global_sort(spark):
    # the ticket explode collapses to a per-doc min BEFORE any
    # movement (partial agg under the exchange) and the top-25 is
    # TakeOrderedAndProject, never a full Sort of the corpus
    from polla_spark.plans.llmdata import q120_ticket_weighted_sample

    plan = _plan(q120_ticket_weighted_sample(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    below = plan[plan.index("hashpartitioning"):]
    assert "partial" in below.lower() and "Generate" in below, plan


def test_q111_sweep_has_no_join(spark):
    # the sweep line replaces an O(n^2) interval self-join: the plan
    # must contain NO join operator of any kind — just the union of
    # two projections of one scan and the keyed window
    from polla_spark.plans.relational import q111_peak_concurrency

    plan = _plan(q111_peak_concurrency(spark, SF))
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q113_unpivot_expands_before_any_exchange(spark):
    # melt must be the within-row Expand operator feeding a partial
    # (map-side) aggregate — k-fold row growth is absorbed before the
    # shuffle, so the exchange carries one row per (partition, attr)
    from polla_spark.plans.relational import q113_unpivot

    plan = _plan(q113_unpivot(spark, SF))
    assert "Expand" in plan, plan
    # Anchor to the agg's hashpartitioning exchange specifically: the
    # plan string prints top-down, so the FIRST "Exchange" is the final
    # Sort's rangepartitioning — slicing there would miss the partial
    # agg that sits below it (r2 red test). The segment above (printed
    # before) the hashpartitioning exchange is the post-shuffle side;
    # the partial agg and the Expand must both sit below (after) it.
    assert "hashpartitioning" in plan, plan
    below_shuffle = plan[plan.index("hashpartitioning"):]
    assert "partial" in below_shuffle.lower(), plan
    assert "Expand" in below_shuffle, plan


def test_q115_stats_join_is_broadcast(spark):
    # segment stats are segment-count-sized: they must broadcast back
    # to the fact, never shuffle it; and no window over the 5-value
    # segment key (which would serialize each segment into one task)
    from polla_spark.plans.relational import q115_zscore_outliers

    plan = _plan(q115_zscore_outliers(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan


def test_q110_calendar_is_join_keyed_not_cartesian(spark):
    # the dense calendar joins back on (event_type, hour) — an
    # equi-join; densification must never plan as an all-pairs op
    from polla_spark.plans.windows_q import q110_gap_fill

    plan = _plan(q110_gap_fill(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q126_scd2_one_hash_exchange(spark):
    # run detection, run-start filter, and the valid_to/lead pass all
    # partition by user_id: exactly ONE hash exchange — the filter
    # between the two window groups must preserve the partitioning.
    # (The only other exchange is the report ORDER BY's range partition.)
    from polla_spark.plans.windows_q import q126_scd2_history

    plan = _plan(q126_scd2_history(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q127_prefix_join_never_cartesian(spark):
    # prefix filtering joins on the shingle KEY, rescoring joins on the
    # doc-id KEY — every join in the exact set-similarity plan must be
    # an equi-join; all-pairs comparison would defeat the algorithm
    from polla_spark.plans.llmdata import q127_prefix_filter_join

    plan = _plan(q127_prefix_filter_join(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q128_sorted_neighborhood_single_exchange_topk(spark):
    # blocked sorted-neighborhood: one exchange on the block key (lang),
    # neighbors arrive via lead over the same sort (no join at all),
    # and the top-20 is TakeOrdered — never a global sort
    from polla_spark.plans.llmdata import q128_sorted_neighborhood

    plan = _plan(q128_sorted_neighborhood(spark, SF))
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q130_median_histogram_runs_window_on_aggregate(spark):
    # the data-sized stage is the partial agg to the (segment, cents)
    # histogram; the cumulative window must run ABOVE the aggregate
    # (on histogram rows), never over raw customer rows
    from polla_spark.plans.relational import q130_histogram_median

    plan = _plan(q130_histogram_median(spark, SF))
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:], plan  # final agg above window
    # partial agg happens below (earlier stage than) the window
    assert "HashAggregate" in plan[:w] or "partial" in plan[:w].lower(), plan


def test_q131_mad_medians_broadcast_back(spark):
    # the 5-row median and MAD tables must broadcast onto the fact —
    # a shuffled join would move the customer scan twice for nothing
    from polla_spark.plans.relational import q131_mad_outliers

    plan = _plan(q131_mad_outliers(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q132_rolling_active_no_window_no_join(spark):
    # rolling 7-day distinct = distinct partial -> within-row explode
    # -> count-distinct; a window or a calendar join here would mean
    # the fact moves more than the two declared shuffles
    from polla_spark.plans.windows_q import q132_rolling_active_users

    plan = _plan(q132_rolling_active_users(spark, SF))
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert "Generate explode" in plan, plan


def test_q133_basket_pairs_no_join(spark):
    # pair expansion is within-row on the basket array — the fact must
    # never self-join; the census is plain hash aggregation
    from polla_spark.plans.relational import q133_basket_pairs

    plan = _plan(q133_basket_pairs(spark, SF))
    assert "Join" not in plan, plan
    assert "Generate explode" in plan, plan
    # top-25 with tiebreak: TakeOrdered, never a global sort
    assert "TakeOrderedAndProject" in plan, plan


def test_q134_interval_overlap_sweeps_without_joining(spark):
    # r6: the pair count comes from an endpoint-union sweep (one day
    # exchange + one sort over 2n endpoints) — NO join of any kind,
    # so work is O(n log n) regardless of how quadratic the pair
    # count gets (the r6 20x sweep measured the old self-join form at
    # 51 s vs 1.2 s for this plan, answers identical)
    from polla_spark.plans.relational import q134_interval_overlap

    plan = _plan(q134_interval_overlap(spark, SF))
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_q135_rfm_cuts_broadcast_no_single_partition_window(spark):
    # scoring joins the 1-row quartile-cut table via broadcast; the
    # classic ntile formulation would need a SinglePartition Window
    # over the whole customer grain — pinned absent
    from polla_spark.plans.relational import q135_rfm_segments

    plan = _plan(q135_rfm_segments(spark, SF))
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_q136_trigram_window_runs_on_census(spark):
    # the bigram denominator window must run over the trigram CENSUS
    # (above the aggregate), never over exploded corpus rows
    from polla_spark.plans.llmdata import q136_trigram_lm

    plan = _plan(q136_trigram_lm(spark, SF))
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:], plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q138_attribution_single_user_exchange(spark):
    # both carried-click windows and the purchase filter must ride ONE
    # hash exchange on user_id (plus the report-sized campaign agg) —
    # never an as-of join shuffling the event stream twice
    from polla_spark.plans.windows_q import q138_last_touch_attribution

    plan = _plan(q138_last_touch_attribution(spark, SF))
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_q137_no_vector_rejoin(spark):
    # scatter comes from the E||x-c||^2 identity over the census —
    # vectors must never join back to centroids; every join in the
    # plan runs on census/label-sized inputs (pos or label keys)
    from polla_spark.plans.llmdata import q137_cluster_quality

    plan = _plan(q137_cluster_quality(spark, SF))
    assert "CartesianProduct" not in plan, plan
    # the census is persisted and REUSED: every consumer reads the
    # cache (one data-sized pass), never re-explodes the vectors
    assert "InMemoryTableScan" in plan, plan


def test_q140_weighted_median_window_on_histogram(spark):
    # the cumulative-weight window must run over the (segment, cents)
    # HISTOGRAM (above the partial agg), never over raw lineitem rows
    from polla_spark.plans.relational import q140_weighted_median

    plan = _plan(q140_weighted_median(spark, SF))
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:], plan
    assert "HashAggregate" in plan[:w], plan


def test_q141_ab_one_user_exchange_then_census(spark):
    # intent-to-treat readout: one mergeable exchange to the user
    # grain; the variant census and the Welch algebra run on 2 rows
    from polla_spark.plans.relational import q141_ab_test

    plan = _plan(q141_ab_test(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_q142_null_safe_join_still_hashes(spark):
    # <=> keys still hash: the null-safe join must plan as a hash join
    # (broadcast or shuffled), never degrade to nested-loop
    from polla_spark.plans.relational import q142_null_safe_join

    plan = _plan(q142_null_safe_join(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan, plan


def test_q143_hierarchy_no_join_no_iteration(spark):
    # recursive-CTE semantics from a WITHIN-ROW ancestor enumeration:
    # no join, no iteration — one explode, one ancestor-keyed agg,
    # TakeOrdered top-25
    from polla_spark.plans.relational import q143_hierarchy_rollup

    plan = _plan(q143_hierarchy_rollup(spark, SF))
    assert "Join" not in plan, plan
    assert "Generate explode" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q144_skyline_single_partition_only_on_survivors(spark):
    # the global frontier window is SinglePartition by nature — it must
    # run ABOVE the bucket-partitioned local frontier (which prunes in
    # parallel), never over the raw table
    from polla_spark.plans.relational import q144_pareto_frontier

    plan = _plan(q144_pareto_frontier(spark, SF))
    assert plan.count("Window") == 2, plan
    first = plan.index("Window")
    # the top (printed first) window is the global one; the bucket
    # exchange + local window sit BELOW it in the plan tree
    assert "Exchange hashpartitioning(bucket" in plan[first:], plan
    assert "Join" not in plan, plan


def test_q145_temporal_join_is_equi_keyed(spark):
    # the fact-to-SCD2 lookup must plan as an equi-join on user_id with
    # the validity BETWEEN as residual condition — never a pure range
    # (nested-loop) join
    from polla_spark.plans.windows_q import q145_point_in_time_join

    plan = _plan(q145_point_in_time_join(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Join" in plan, plan


def test_q146_pagerank_reuses_persisted_edges(spark):
    # the edge table feeds BOTH unrolled iterations and the out-weight
    # census — it must be persisted and reused (InMemoryTableScan),
    # not re-derived from the fact per round; no cartesian anywhere
    from polla_spark.plans.relational import q146_pagerank

    plan = _plan(q146_pagerank(spark, SF))
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q150_clamped_balance_one_exchange_no_python(spark):
    # the clamp identity keeps the scan declarative: one user_id
    # exchange, windows + aggs share it, and NO Python boundary (the
    # naive implementation is a per-key sequential pandas scan)
    from polla_spark.plans.windows_q import q150_clamped_balance

    plan = _plan(q150_clamped_balance(spark, SF))
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan


def test_q153_interval_union_one_exchange_no_join(spark):
    # the clip-once sweep needs one user_id exchange (interval build +
    # carried-max window + final agg all share it) and no join
    from polla_spark.plans.relational import q153_interval_union_time

    plan = _plan(q153_interval_union_time(spark, SF))
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q156_pushed_filters_and_topk(spark):
    # all three predicates reach the parquet readers; the top-10 is
    # TakeOrderedAndProject, never a global Sort of the aggregate
    from polla_spark.plans.relational import q156_shipping_priority

    plan = _plan(q156_shipping_priority(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("PushedFilters: [IsNotNull") >= 3, plan
    assert "l_shipdate), GreaterThan(l_shipdate" in plan, plan
    assert "o_orderdate), LessThan(o_orderdate" in plan, plan
    assert "EqualTo(c_mktsegment,BUILDING" in plan, plan


def test_q157_broadcasts_region_nation_only(spark):
    # nation⋈region broadcast; the locality predicate is a JOIN KEY
    # (hash join on two columns), not a post-join filter
    from polla_spark.plans.relational import q157_local_supplier_volume

    plan = _plan(q157_local_supplier_volume(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "l_suppkey#" in plan and "c_nationkey#" in plan, plan


def test_q158_single_aggregation_for_share(spark):
    # CASE-share = numerator and denominator in ONE aggregate: the
    # fact chain is scanned once (one lineitem scan) and no
    # self-join of aggregate to aggregate appears
    from polla_spark.plans.relational import q158_market_share

    plan = _plan(q158_market_share(spark, SF))
    assert plan.count("lineitem.parquet") == 1, plan
    assert "EqualTo(p_type,ECONOMY)" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q159_single_fact_exchange_at_scale(spark):
    # the EXISTS/NOT-EXISTS rewrite must cost ONE exchange of the fact
    # rows. Pin the 100 TB regime (orders far above any broadcast
    # threshold): the join shuffles lineitem on orderkey ONCE, and both
    # the (orderkey, suppkey) census and the per-order window REUSE
    # that partitioning (grouping/window keys ⊇ partition key) — no
    # exchange on the composite key ever appears
    import re

    from polla_spark.plans.relational import q159_suppliers_kept_waiting

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(q159_suppliers_kept_waiting(spark, SF))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert plan.count("Exchange hashpartitioning(l_orderkey") == 1, plan
    assert re.search(
        r"Exchange hashpartitioning\(l_orderkey#\d+L, l_suppkey", plan
    ) is None, plan
    # lineitem is scanned once — the census replaces the l2/l3 re-scans
    assert plan.count("lineitem.parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan


def test_q160_exists_is_semi_join(spark):
    # the EXISTS must be a LEFT-SEMI hash join with the lateness
    # predicate as a residual — no duplicate-dedup aggregate, no
    # nested-loop
    from polla_spark.plans.relational import q160_order_priority_check

    plan = _plan(q160_order_priority_check(spark, SF))
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "GreaterThanOrEqual(o_orderdate,1997-01-01" in plan, plan


def test_q161_nation_dims_broadcast_and_pruned(spark):
    # both nation copies broadcast, each pre-filtered to the 2-nation
    # pair before the fact joins; the shipdate range reaches the scan
    from polla_spark.plans.relational import q161_nation_volume

    plan = _plan(q161_nation_volume(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "In(n_name, [NATION_1,NATION_2])" in plan, plan
    assert "l_shipdate), GreaterThanOrEqual(l_shipdate" in plan, plan


def test_q162_outer_join_keeps_zero_customers(spark):
    # the priority exclusion must live in the JOIN CONDITION: the plan
    # keeps LeftOuter (a WHERE would have turned it inner and dropped
    # the zero-order customers)
    from polla_spark.plans.relational import q162_order_count_distribution

    plan = _plan(q162_order_count_distribution(spark, SF))
    assert "LeftOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q163_single_scan_case_share(spark):
    # promo share: numerator and denominator in ONE aggregate — one
    # lineitem scan, month filter pushed
    from polla_spark.plans.relational import q163_promo_revenue

    plan = _plan(q163_promo_revenue(spark, SF))
    assert plan.count("lineitem.parquet") == 1, plan
    assert "l_shipdate), GreaterThanOrEqual(l_shipdate" in plan, plan


def test_q164_scalar_max_is_broadcast(spark):
    # the global-max scalar joins back as a 1-row broadcast against
    # the supplier-grain revenue table, never re-aggregating the fact
    from polla_spark.plans.relational import q164_top_supplier

    df = q164_top_supplier(spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    # the persisted rev table feeds both consumers: one InMemoryRelation,
    # and the fact supports only that single aggregation
    assert "InMemoryTableScan" in plan, plan
    assert "CartesianProduct" not in plan, plan
    spark.catalog.clearCache()  # release q164's internal rev persist


def test_q165_quantity_census_computed_once(spark):
    # single-pass rewrite: exactly ONE lineitem scan (the oracle's
    # IN-subquery form scans it twice)
    from polla_spark.plans.relational import q165_large_orders

    plan = _plan(q165_large_orders(spark, SF))
    assert plan.count("lineitem.parquet") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q166_disjunction_is_residual_not_join_condition(spark):
    # the OR-of-brackets must NOT degrade the join: plan stays a hash
    # (or broadcast-hash) equi-join on partkey, and the implied brand
    # IN-superset filter reaches the part scan
    from polla_spark.plans.relational import q166_bracket_predicate

    plan = _plan(q166_bracket_predicate(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "In(p_brand, [Brand#12,Brand#23,Brand#34])" in plan, plan


def test_q167_anti_join_with_pushed_recency(spark):
    # NOT EXISTS compiles to LEFT-ANTI; the recency filter reaches the
    # orders scan so the anti side is months of orders, not years
    from polla_spark.plans.relational import q167_dormant_rich_customers

    plan = _plan(q167_dormant_rich_customers(spark, SF))
    assert "LeftAnti" in plan, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q168_census_window_one_partkey_exchange(spark):
    # the correlated-MIN rewrite: census agg + per-part window must
    # both ride the explicit partkey repartition — ONE exchange
    # mentioning partkey, and never the composite (partkey, suppkey)
    import re

    from polla_spark.plans.relational import q168_cheapest_supplier

    plan = _plan(q168_cheapest_supplier(spark, SF))
    assert plan.count("Exchange hashpartitioning(l_partkey") == 1, plan
    assert re.search(
        r"Exchange hashpartitioning\(l_partkey#\d+L, l_suppkey", plan
    ) is None, plan
    assert "CartesianProduct" not in plan, plan


def test_q169_part_filter_prunes_before_fact_join(spark):
    # the disjunctive part predicate must sit on the part side (scan
    # filter), never as a post-join residual over fact rows
    from polla_spark.plans.relational import q169_product_profit

    plan = _plan(q169_product_profit(spark, SF))
    assert "StartsWith" in plan or "p_name" in plan.split("lineitem")[0] or (
        "Contains(p_name,green)" in plan or "p_brand" in plan
    ), plan
    assert "CartesianProduct" not in plan, plan


def test_q170_threshold_runs_on_census_not_fact(spark):
    # the global total is an aggregate of the persisted CENSUS (one
    # InMemoryRelation feeds both consumers) — the fact is scanned once
    from polla_spark.plans.relational import q170_important_stock

    plan = _plan(q170_important_stock(spark, SF))
    # both consumers (threshold scalar + filter probe) read the cache
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q171_exclusion_is_anti_join(spark):
    # NOT IN must compile as a LEFT-ANTI hash join (the set is
    # null-free by construction), never a null-aware nested loop
    from polla_spark.plans.relational import q171_supplier_count

    plan = _plan(q171_supplier_count(spark, SF))
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "In(p_brand, [Brand#11,Brand#22,Brand#33])" in plan, plan


def test_q172_census_window_shares_exchange(spark):
    # q168's pattern on the shipped census: one partkey exchange for
    # census + window; the promo filter reaches the part scan
    import re

    from polla_spark.plans.relational import q172_dominant_suppliers

    plan = _plan(q172_dominant_suppliers(spark, SF))
    assert plan.count("Exchange hashpartitioning(l_partkey") == 1, plan
    assert re.search(
        r"Exchange hashpartitioning\(l_partkey#\d+L, l_suppkey", plan
    ) is None, plan
    assert "EqualTo(p_type,PROMO)" in plan, plan


def test_q173_all_predicates_reach_scan(spark):
    # Q6 is the pure-scan query: zero joins, zero hash exchanges
    # (single-row partial agg), all three predicates pushed
    from polla_spark.plans.relational import q173_forecast_revenue

    plan = _plan(q173_forecast_revenue(spark, SF))
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 0, plan
    # PushedFilters truncates in toString; pin via the residual Filter
    assert "GreaterThanOrEqual(l_shipda" in plan, plan
    assert "< 24.0)" in plan, plan


def test_q174_one_join_one_census(spark):
    # both priority counts are conditional sums in ONE aggregation
    # over one join — no second scan, no union of two filtered aggs
    from polla_spark.plans.relational import q174_priority_shipping

    plan = _plan(q174_priority_shipping(spark, SF))
    assert plan.count("lineitem.parquet") == 1, plan
    assert plan.count("orders.parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan


def test_q175_threshold_is_broadcast_scalar(spark):
    # exact heavy hitters: one term-keyed census; the 0.5% threshold
    # joins back as a 1-row broadcast, never re-scanning the corpus
    from polla_spark.plans.llmdata import q175_token_heavy_hitters

    plan = _plan(q175_token_heavy_hitters(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    # the persisted census feeds both the total and the probe — the
    # corpus explode must not run twice
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_q104_domain_cap_rank_limit_pushdown(spark):
    # the mega-domain rescue: rn<=15 licenses WindowGroupLimit
    # PARTIAL before the source exchange, so every map partition
    # collapses to its local top-15 per source and the hot key's
    # shuffle input is 15 x map-partitions rows, independent of
    # domain size (measured flat at 100x Zipf data,
    # scripts/scale_experiment.py --skew). An agg-over-all-ranked-rows
    # form would lose the pushdown and shuffle the whole table.
    from polla_spark.plans.llmdata import q104_source_quota

    plan = _plan(q104_source_quota(spark, SF))
    assert "WindowGroupLimit" in plan, plan
    assert "15, Partial" in plan, plan
    assert plan.count("Window [row_number()") == 1, plan


def test_sketch_partials_run_on_natural_partitioning(spark):
    # the MG sketch's data-sized stage is ONLY the per-partition
    # Arrow pass: no exchange may precede MapInPandas (the shuffle it
    # DOES do — candidate merge — is partitions x k rows downstream,
    # and in q177 the census exchange belongs to the verification
    # harness, not the sketch)
    from polla_spark.operators.sketch import mg_partials
    from pyspark.sql import functions as F

    tok = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(F.split("text", r"\s+")).alias("term"))
    )
    plan = _plan(mg_partials(tok, "term", 16))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_q176_lift_never_self_joins_fact_and_reuses_baskets(spark):
    # lift derives pair census, item census and basket total from ONE
    # persisted basket collapse (>= 3 InMemoryTableScans); the fact
    # never self-joins on orderkey
    from polla_spark.plans.relational import q176_affinity_lift

    plan = _plan(q176_affinity_lift(spark, SF))
    assert plan.count("InMemoryTableScan") >= 3, plan
    assert "CartesianProduct" not in plan, plan


def test_q183_bloom_word_table_broadcasts_never_sort_merges(spark):
    # the ≤2048-row word table must reach the probe as a broadcast —
    # a sort-merge there would shuffle the new batch on w for a table
    # that fits in a closure; and nothing may cartesian
    from polla_spark.plans.llmdata import q183_bloom_incremental_dedup

    plan = _plan(q183_bloom_incremental_dedup(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q188_cm_sketch_partial_aggs_and_broadcasts(spark):
    # the fixed-keyspace sketch agg must partial-aggregate (map-side
    # combine collapses each partition to <=8192 cells BEFORE the
    # exchange — the whole 100 TB story), the <=8192-row sketch must
    # reach the probe as a broadcast, and nothing may cartesian
    from polla_spark.plans.llmdata import q188_countmin_frequency

    plan = _plan(q188_countmin_frequency(spark, SF))
    assert "partial_count" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q189_duplicate_spans_no_cartesian_one_window(spark):
    # the gram stream must meet the duplicated-gram keys via a keyed
    # join (never cartesian/nested-loop), the census must partial-
    # aggregate, and coverage is exactly one window sweep
    from polla_spark.plans.llmdata import q189_duplicate_spans

    plan = _plan(q189_duplicate_spans(spark, SF))
    assert "partial_count" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert plan.count("Window") >= 1, plan


def test_q190_containment_join_never_cartesian_reuses_ranked(spark):
    # the probe-prefix and full-index sides must meet in a keyed join
    # (never cartesian/nested-loop) and the persisted ranked table
    # must feed both sides from cache
    from polla_spark.plans.llmdata import q190_containment_join

    plan = _plan(q190_containment_join(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_q184_recursion_plans_as_union_loop(spark):
    # the native recursive CTE must plan as the engine's fixpoint
    # operator (UnionLoop), not an unrolled/cartesian imitation
    from polla_spark.plans.llmdata import q184_recursive_hierarchy

    plan = _plan(q184_recursive_hierarchy(spark, SF))
    assert "UnionLoop" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q185_variant_single_agg_no_join_no_python(spark):
    # parse-once variant shredding: one aggregation, no join, no
    # Python boundary — the whole query is scan → project → agg
    from polla_spark.plans.llmdata import q185_variant_shredding

    plan = _plan(q185_variant_shredding(spark, SF))
    assert "Join" not in plan, plan
    assert "Python" not in plan and "MapInPandas" not in plan, plan


def test_q191_kmv_minima_window_group_limit(spark):
    # the per-scope min-k rank carries an EXPLICIT rn <= K filter so
    # WindowGroupLimit pushes a map-side top-K below the RANK exchange
    # (the distinct's exchange before it stays per-distinct-value —
    # the honest cost model in functions/kmv.py); and nothing joins
    # except the tiny label-sized report build
    from polla_spark.plans.llmdata import q191_kmv_distinct

    plan = _plan(q191_kmv_distinct(spark, SF))
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_q194_inclusion_profile_prunes_to_single_columns(spark):
    # single-pass SINDY shape: every table scanned ONCE, pruned to
    # exactly its profiled key columns (profiling reads columns, not
    # tables), attr bits collapsed by ONE value-keyed bit_or group-by;
    # no joins anywhere, nothing may cartesian
    from polla_spark.plans.relational import q194_inclusion_profile

    plan = _plan(q194_inclusion_profile(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    # anchor the actual join operators, not the bare 'Join' substring:
    # a future plan-node name merely containing 'Join' (e.g. a
    # broadcast annotation) must not fail the zero-join shape (ADVICE
    # r12)
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert op not in plan, plan
    # one multi-column pruned scan per fact table, in schema order
    assert plan.count("struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint>") == 1, plan
    assert plan.count("struct<o_orderkey:bigint,o_custkey:bigint>") == 1, plan
    # the mask collapse is a bit_or aggregate keyed on the value
    assert "bit_or" in plan, plan


def test_q197_lateral_decorrelates_no_per_row_subquery(spark):
    # the correlated LATERAL + LIMIT must compile to a JOIN with a
    # per-key rank limit — never a cartesian/nested-loop re-execution
    # of the inner query per outer row
    from polla_spark.plans.relational import q197_lateral_topk

    plan = _plan(q197_lateral_topk(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "Join" in plan, plan
    assert ("WindowGroupLimit" in plan) or ("Window" in plan), plan


def test_q198_pipe_lowers_to_pushed_filter_and_partial_agg(spark):
    # pipe syntax is syntax, not a new executor: the WHERE stage must
    # reach the scan as a pushed filter and the AGGREGATE stage must
    # partial-aggregate like the classic statement
    from polla_spark.plans.relational import q198_pipe_syntax

    plan = _plan(q198_pipe_syntax(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan, plan
    assert "partial_count" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q212_final_round_no_join_no_window(spark):
    # the unrolled Lloyd assignment evaluates against LITERAL
    # centroids as pure column expressions — the final-round plan may
    # contain NO window and NO data-sized join; the only shuffles are
    # the K*64-row update agg (+ the tiny report union/sort), and the
    # literal-prev join must be a broadcast probe
    from polla_spark.plans.llmdata import q212_kmeans_train

    plan = _plan(q212_kmeans_train(spark, SF))
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # exactly two hash exchanges: the (cid, pos) partial agg (the
    # only one fed by corpus-scale data, map-side combined to K*64
    # rows) and the K*64 -> K report agg after the broadcast probe;
    # the report sort is report-sized
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_q213_corpus_never_shuffles(spark):
    # all five LM censuses broadcast onto the corpus trigram stream:
    # the scored side must see only BroadcastHashJoins (no
    # SortMergeJoin anywhere), and the only data-sized hash exchanges
    # are census partial aggs + the final doc-grain agg
    from polla_spark.plans.llmdata import q213_smoothed_lm_filter

    plan = _plan(q213_smoothed_lm_filter(spark, SF))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 5, plan
    # top-20 report: per-task top-k merge, never a global sort
    assert "TakeOrderedAndProject" in plan, plan


def test_q215_corpus_probed_by_broadcast_no_smj(spark):
    # the entity membership table is link-graph-sized and must
    # BROADCAST onto the documents scan (the corpus never shuffles);
    # the survivorship assembly joins (stats x rep x smode, one row
    # per entity) are explicitly broadcast too — no sort-merge join
    # anywhere in the plan
    from polla_spark.plans.llmdata import q215_golden_records

    plan = _plan(q215_golden_records(spark, SF))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q216_one_distinct_exchange_then_topk(spark):
    # phonetic census: corpus -> explode -> ONE distinct exchange on
    # the word key (map-side partial dedup), census aggs, and a
    # per-task top-k merge — no join, never a global sort of words
    from polla_spark.plans.llmdata import q216_soundex_blocking

    plan = _plan(q216_soundex_blocking(spark, SF))
    assert "Join" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # the Soundex expression is per-row string algebra, not a UDF
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    # distinct exchange + census exchange only
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_q217_rates_broadcast_back_no_smj(spark):
    # the solved rate table is sources-bounded and must BROADCAST
    # back onto the corpus for the gated pass; the census/achieved
    # reductions partial-aggregate map-side — nothing data-sized
    # shuffles and no sort-merge join appears. r12: the tokenized
    # projection is persisted, so every census/rates subtree copy
    # must read the cache — the corpus is tokenized exactly once
    from polla_spark.plans.llmdata import q217_corpus_mixer

    plan = _plan(q217_corpus_mixer(spark, SF))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert "InMemoryTableScan" in plan, plan


def test_q218_term_major_join_no_cartesian(spark):
    # the registered regime is the inverted-index SELF-JOIN: postings
    # meet postings on the term key (never doc x doc), dots partial-
    # aggregate map-side, and the persisted postings census is read
    # from cache on every consumer instead of re-deriving the corpus
    from polla_spark.plans.llmdata import q218_allpairs_cosine

    plan = _plan(q218_allpairs_cosine(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "Join" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "partial_sum" in plan, plan


def test_q224_final_epoch_narrow_scan_no_join(spark):
    # the unrolled perceptron epoch evaluates against LITERAL weights
    # as pure column expressions — no window, no data-sized join; the
    # only exchange is the 1-row global agg (map-side combined) plus
    # the literal-rows union/sort
    from polla_spark.plans.llmdata import q224_perceptron_quality

    plan = _plan(q224_perceptron_quality(spark, SF))
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_q225_weight_table_broadcast_no_smj(spark):
    # the 256-bucket weight table must BROADCAST onto the corpus
    # bigram stream (the corpus never sort-merge-joins); the doc-grain
    # agg + per-task top-k merge are the only data-sized operators
    from polla_spark.plans.llmdata import q225_dsir_importance

    plan = _plan(q225_dsir_importance(spark, SF))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q226_census_only_no_data_join(spark):
    # one corpus scan partial-aggregating to the sources-bounded
    # (n, k) census; the Wilson arithmetic and sort are census-sized;
    # no join anywhere, no Python
    from polla_spark.plans.llmdata import q226_source_quality_lcb

    plan = _plan(q226_source_quality_lcb(spark, SF))
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q227_delta_probe_no_cartesian(spark):
    # the incremental band join probes signatures on the sig key —
    # never doc x doc; the persisted signature table is read from
    # cache on both sides
    from polla_spark.plans.llmdata import q227_incremental_lsh_pairs

    plan = _plan(q227_incremental_lsh_pairs(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_q228_within_row_zero_exchange_then_topk(spark):
    # r12: EVERY signal is within-row (the top-bigram mass is the max
    # run of the sorted gram array — no gram explode, no exchange, no
    # doc-grain join); one scan finished by a per-task top-k merge
    from polla_spark.plans.llmdata import q228_repetition_profile

    plan = _plan(q228_repetition_profile(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_q229_census_only_no_join_over_data(spark):
    # one embeddings scan posexploding into the 2x64-row partial agg;
    # the old/new join runs on the 64-row census frames, so no
    # sort-merge join may appear and Python never does
    from polla_spark.plans.llmdata import q229_embedding_drift

    plan = _plan(q229_embedding_drift(spark, SF))
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "partial_sum" in plan or "partial_count" in plan, plan


def test_q230_one_bucket_exchange(spark):
    # one corpus scan to the buckets-bounded census; the totals frame
    # is a broadcast; exactly one data-sized hash exchange
    from polla_spark.plans.llmdata import q230_length_drift_chi2

    plan = _plan(q230_length_drift_chi2(spark, SF))
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q231_histogram_window_no_doc_grain_sort(spark):
    # one corpus scan to the (lang, score) histogram; the tertile
    # window and re-agg run on histogram rows — no doc-grain window,
    # no join, no Python anywhere
    from polla_spark.plans.llmdata import q231_perplexity_buckets

    plan = _plan(q231_perplexity_buckets(spark, SF))
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    # histogram agg + window repartition + final census agg + sort:
    # the doc-grain data crosses exactly ONE hash exchange (the
    # histogram partial agg); everything after is histogram-sized
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_q232_distinct_then_term_join_no_cartesian(spark):
    # the (source, term) table is DISTINCT before the self-join, and
    # the join key is term — never source x source over raw data
    from polla_spark.plans.llmdata import q232_source_vocab_overlap

    plan = _plan(q232_source_vocab_overlap(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_q233_topk_window_no_global_sort_of_terms(spark):
    # per-doc top-3 must run as a windowed rank over the doc-keyed
    # stream with the df census joined on term; the 1-row N frame is
    # a broadcast (BroadcastNestedLoopJoin on a 1-row build side is
    # the crossJoin's legal shape), never a CartesianProduct of data
    from polla_spark.plans.llmdata import q233_tfidf_keywords

    plan = _plan(q233_tfidf_keywords(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_q234_takeordered_head_then_report_window(spark):
    # the top-50 extraction must be a parallel TakeOrdered over the
    # vocab census — never a global Sort of the vocabulary; the
    # cumulative window runs on the 50-row report frame
    from polla_spark.plans.llmdata import q234_zipf_head_profile

    plan = _plan(q234_zipf_head_profile(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_q235_vocab_join_then_delta_agg(spark):
    # the history side collapses to its distinct bigram vocabulary
    # before the join (never doc x doc), and the report is a
    # TakeOrdered over the delta-grain agg
    from polla_spark.plans.llmdata import q235_bigram_novelty

    plan = _plan(q235_bigram_novelty(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_q236_histogram_over_components_no_python(spark):
    # the audit histogram adds only label-table-sized aggs on top of
    # the shared graph operator — no Python, no cartesian anywhere
    from polla_spark.plans.llmdata import q236_cluster_size_histogram

    plan = _plan(q236_cluster_size_histogram(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "partial_count" in plan, plan


def test_q237_merge_is_broadcast_remap_never_label_shuffle(spark):
    # the incremental fold's label-table work must be scan + broadcast
    # joins only: the endpoint probe and the remap both broadcast the
    # delta-sized side, so the standing label table is never hashed
    # into an exchange — and no Python anywhere
    from polla_spark.plans.llmdata import q237_incremental_components

    plan = _plan(q237_incremental_components(spark, SF))
    spark.catalog.clearCache()  # plan-lifetime signature cache
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q218_skew_regime_grid_join_and_union(spark):
    # the skew-split regime: head terms join on (term, ia, ib) — the
    # chunk-grid key — and the tail keeps the plain term self-join;
    # both branches union into ONE final (doc_a, doc_b) partial agg,
    # so pairs sharing head AND tail terms merge exactly once
    from polla_spark.plans.llmdata import allpairs_cosine

    plan = _plan(allpairs_cosine(spark, SF, regime="skew"))
    spark.catalog.clearCache()
    assert "Union" in plan, plan
    assert "ia" in plan and "ib" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
