"""Streaming window operators over event streams.

The reference is batch-only (daily cron — SURVEY.md §2.6); these are
the engine-native streaming counterparts of plans/windows_q.py,
verified streaming == batch on finite input in tests.

Design notes for real deployments:
- every aggregation carries a watermark so state is bounded — without
  it a 100 TB/day stream grows state forever;
- tumbling/sliding use ``F.window``; session gaps use
  ``F.session_window`` (state-store backed merge of overlapping
  sessions);
- dedupe uses ``dropDuplicates`` scoped by watermark: exactly the
  reference's SHA-256 content-dedup semantics (net.py:36-38) applied
  to unbounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "30 minutes"


def vq() -> F.Column:
    """Exact integer-cent quantization of ``events.value``.

    NaN policy (r5 self-review): events.value is contractually
    non-null/non-NaN typed data, and a NaN here FAILS FAST — loudly
    and identically in batch and streaming (ANSI ``CAST(NaN AS
    LONG)`` aborts the query; the Python kernels' ``int(floor(nan))``
    raises) — because silent corruption of a metric column should
    stop a pipeline, unlike scraped-text parse errors, which this
    engine turns into data columns. The ONE deliberate exception is
    the q150 balance family (``functions/events.balance_delta_*``),
    whose reference semantics define null/NaN purchases as 0 in both
    engines."""
    return F.floor(F.col("value") * 100).cast("long")


def tumbling_counts(events: DataFrame, width: str = "5 minutes",
                    watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Per (5-min window, event_type): count + exact quantized sum."""
    return (
        events.withWatermark("ts", watermark)
        .withColumn("vq", vq())
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("vq").alias("sum_vq"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_vq",
        )
    )


def sliding_counts(events: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes",
                   watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .withColumn("vq", vq())
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"), F.sum("vq").alias("sum_vq"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "sum_vq",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Per (user, session) with a 30-minute inactivity gap.

    ``session_window`` merges overlapping/adjacent state-store
    sessions — semantically identical to the batch lag+cumsum plan
    (plans/windows_q.q72_sessionize) on finite input.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def daily_user_partials(events: DataFrame,
                        watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming form of the daily rollup (plans/windows_q.q73):
    user-grain partials.

    ``countDistinct`` is not incrementally mergeable, so the stream
    maintains one bounded state row per (day, event_type, user_id) —
    a single streaming aggregation — and the day-grain rollup
    (:func:`rollup_daily`, where ``n_users`` = count of user rows) is
    a read-time batch query over this much smaller result. The
    standard streaming-dashboard pattern: pre-aggregate at the finest
    grain the distinct needs, finish at read time.
    """
    return (
        events.withWatermark("ts", watermark)
        .withColumn("vq", vq())
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "user_id",
        )
        .agg(F.count("*").alias("n"), F.sum("vq").alias("sum_vq"))
    )


def rollup_daily(partials: DataFrame) -> DataFrame:
    """Batch finisher over :func:`daily_user_partials` output — emits
    exactly the q73 daily-rollup shape (n, n_users, sum_vq)."""
    return (
        partials.groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.count("*").alias("n_users"),
            F.sum("sum_vq").alias("sum_vq"),
        )
    )


def follow_within(lead: DataFrame, follow: DataFrame,
                  lead_type: str = "view", follow_type: str = "click",
                  horizon: str = "10 minutes",
                  watermark: str = DEFAULT_WATERMARK,
                  how: str = "inner") -> DataFrame:
    """Stream-stream interval join: for each ``lead_type`` event, the
    ``follow_type`` events by the same user strictly after it and
    within ``horizon`` (the funnel/attribution primitive).

    Both sides carry a watermark and the join predicate carries the
    time bound — together they let the state store evict lead rows
    older than ``watermark + horizon``, so state stays bounded on an
    unbounded stream. ``how='left_outer'`` additionally emits each
    unmatched lead (null follow) — but only once the watermark passes
    its join window, so the engine KNOWS no match can still arrive;
    on a finite stream that means unmatched rows surface only after a
    later batch advances the watermark (the test appends a sentinel
    batch for exactly this). The same function applied to batch
    DataFrames is the equivalence oracle (watermarks are a no-op in
    batch).
    """
    l = (
        lead.filter(F.col("event_type") == lead_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("lead_id"),
            F.col("ts").alias("l_ts"),
        )
    )
    r = (
        follow.filter(F.col("event_type") == follow_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("follow_id"),
            F.col("ts").alias("r_ts"),
        )
    )
    horizon_sql = f"INTERVAL {horizon}"
    cond = F.expr(
        f"l_user = r_user AND r_ts > l_ts AND r_ts <= l_ts + {horizon_sql}"
    )
    return l.join(r, cond, how).select(
        F.col("l_user").alias("user_id"),
        "lead_id",
        "follow_id",
        (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias("lag_seconds"),
    )


def dedupe_stream(events: DataFrame, keys: list[str],
                  watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Watermark-scoped exact dedupe (first event per key wins)."""
    return events.withWatermark("ts", watermark).dropDuplicates(keys)


def dedupe_stream_within_watermark(events: DataFrame, keys: list[str],
                                   watermark: str = DEFAULT_WATERMARK
                                   ) -> DataFrame:
    """Watermark-EVICTABLE dedupe (``dropDuplicatesWithinWatermark``):
    unlike :func:`dedupe_stream` — whose state grows forever when the
    dedup keys exclude the event-time column — this evicts each key's
    state once the watermark passes its event time, guaranteeing
    bounded state on unbounded streams. Contract difference: a
    duplicate arriving AFTER its key's watermark horizon re-emits
    (at-least-once dedup within the horizon), which is the standard
    trade for bounded state; within one horizon the output equals
    batch first-seen (pinned in test_streaming)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def ohlc_bars(events: DataFrame, width: str = "1 day",
              watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming OHLC candlestick bars (twin of q116_ohlc_bars):
    ``min_by``/``max_by`` over a fixed-width sortable (ts, event_id)
    key are ordinary mergeable aggregates, so the bars stream with
    bounded per-(window, type) state and no sort — the same property
    that makes the batch plan one partial-agged exchange."""
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        events.withWatermark("ts", watermark)
        .withColumn("ord", key)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.min_by("value", "ord").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ord").alias("close"),
            F.count("*").alias("volume"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


def value_histogram(events: DataFrame) -> DataFrame:
    """Streaming twin of q118's equal-width histogram: the same
    quantize-then-bucket integer math as a streaming aggregation.

    Unlike the windowed twins, state here is bounded by the VALUE
    space (10 buckets), not by a watermark — a lifetime histogram
    needs no time column at all, so no watermark is attached and the
    query runs in complete mode. All five aggregates merge, so the
    streamed result is exact.
    """
    qv = F.floor(F.col("value") * 100).cast("long")
    bucket = F.least(F.floor(qv / 5000), F.lit(9)).cast("long")
    return (
        events.select(qv.alias("qv"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("qv").alias("sum_cents"),
            F.min("qv").alias("min_cents"),
            F.max("qv").alias("max_cents"),
        )
        .withColumn("lo", F.col("bucket") * 50)
        .select("bucket", "lo", "n", "sum_cents", "min_cents", "max_cents")
    )


def monthly_revenue_partials(orders: DataFrame) -> DataFrame:
    """Streaming twin of q122's month-grain census (19th twin): the
    same mergeable month/cent-sum partial agg as the batch plan
    (imported from ``functions/trends.py`` — one source of truth).
    State is bounded by the number of MONTHS, no watermark needed;
    run in update mode — cent sums are non-negative, so the newest
    update per month is simply the max."""
    from ..functions.trends import monthly_census

    return monthly_census(orders)


def finish_monthly_growth(updates: DataFrame) -> DataFrame:
    """Read-time finisher ≡ q122: collapse update-mode rows to the
    latest census state (sums monotone — ``max``), then the shared
    lag-based growth report over the months-sized table."""
    from ..functions.trends import growth_report

    monthly = updates.groupBy("month").agg(
        F.max("revenue_cents").alias("revenue_cents")
    )
    return growth_report(monthly)


def distinct_partials(events: DataFrame, key: str = "user_id",
                      by: str = "event_type") -> DataFrame:
    """Streaming twin of the q38 family (20th twin): per-group
    DataSketches HLL sketches as a streaming aggregation. Unlike the
    MG heavy-hitter sketch (bounded additive error on merge), HLL
    union is LOSSLESS at the sketch level — merging takes the
    register-wise max, so the streamed sketch is BIT-identical to one
    batch pass over the union of the data and the estimates match
    exactly (pinned in tests/test_streaming.py, plus a distributed
    per-partition-sketches == direct-sketch mergeability pin). State
    per group is one fixed-size sketch (lgK=12 -> 4 KB); no watermark.
    """
    return events.groupBy(by).agg(F.hll_sketch_agg(key).alias("sketch"))


def finish_distinct(updates: DataFrame, by: str = "event_type") -> DataFrame:
    """Read-time finisher: union all sketch versions per group
    (register-wise max — re-merging already-merged sketches is a
    no-op) and emit the estimate."""
    return (
        updates.groupBy(by)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .select(
            by,
            F.hll_sketch_estimate("sketch").alias("approx_distinct"),
        )
        .orderBy(by)
    )


def quality_scan_partials(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Streaming twin of q112's scan + referential-integrity metrics
    (21st twin, part 1 of 2): all 8 stream-affected metrics in ONE
    streaming GLOBAL aggregation — the 7 conditional sums/counts come
    from ``functions/quality.scan_metric_aggs`` (shared with batch
    q112, one source of truth) and the orphan count rides the same
    pass via a stream-static LEFT join against the orders key
    projection. ``o_orderkey`` is orders' primary key, so the join
    never duplicates a fact row and ``count_if(no match)`` is exactly
    the batch anti-join's count.

    State is ONE row of 8 longs (no watermark, no key). Counts are
    monotone, so update mode + a max-collapse finisher recovers the
    latest totals across micro-batch cuts."""
    from ..functions.quality import scan_metric_aggs

    ok = orders.select(F.col("o_orderkey").alias("_ok"))
    j = lineitem.join(ok, lineitem["l_orderkey"] == ok["_ok"], "left")
    aggs = [c.cast("long").alias(n) for n, c in scan_metric_aggs()]
    aggs.append(
        F.count_if(F.col("_ok").isNull()).cast("long").alias("orphan_orderkeys")
    )
    return j.agg(*aggs)


def dup_key_partials(lineitem: DataFrame) -> DataFrame:
    """Streaming twin of q112's uniqueness metric (21st twin, part 2):
    duplicate natural keys need per-key counts — q132's distinct-key-
    grain pattern — because "how many keys appear more than once" is
    not merge-closed at the metric grain, only at the KEY grain. State
    is one long per (l_orderkey, l_linenumber); the finisher counts
    keys whose latest count exceeds 1."""
    return lineitem.groupBy("l_orderkey", "l_linenumber").agg(
        F.count("*").alias("c")
    )


def finish_quality_audit(
    scan_updates: DataFrame, dup_updates: DataFrame
) -> DataFrame:
    """Read-time finisher ≡ q112: collapse update-mode rows to the
    newest state (max — every metric and per-key count is monotone),
    melt the wide scan row via the shared reshape, and append the
    uniqueness metric. Emits exactly q112's (metric, value) report."""
    from ..functions.quality import melt_metrics, scan_metric_names

    names = scan_metric_names() + ["orphan_orderkeys"]
    latest = scan_updates.agg(*[F.max(n).alias(n) for n in names])
    scan = melt_metrics(latest, names)
    dups = (
        dup_updates.groupBy("l_orderkey", "l_linenumber")
        .agg(F.max("c").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").cast("long").alias("value"))
        .select(F.lit("duplicate_line_keys").alias("metric"), "value")
    )
    return scan.unionByName(dups).orderBy("metric")


def bloom_word_partials(docs: DataFrame) -> DataFrame:
    """Streaming twin of q183's bloom build (22nd twin): the history
    stream folds into the same ≤2048-row (w, word) table via a
    streaming ``bit_or`` aggregation — ``functions/bloom.py`` is the
    one source of truth for positions and geometry. ``bit_or`` is
    associative, commutative and IDEMPOTENT, so the streamed table is
    BIT-IDENTICAL to a batch build over the union of the batches (the
    strongest streaming≡batch form in the inventory, alongside the
    HLL register-max twin). State = one long per occupied word; no
    watermark — a bloom filter only ever accumulates bits."""
    from ..functions.bloom import bloom_word_table

    return bloom_word_table(docs.select(F.md5("text").alias("hh")))


def finish_bloom_probe(word_updates: DataFrame, new_docs: DataFrame) -> DataFrame:
    """Read-time finisher ≡ q183's probe: collapse update-mode word
    versions (``bit_or`` again — re-merging old versions is a no-op
    because bits only accumulate) and run the shared broadcast probe
    over the new batch. ``maybe_dup = false`` remains PROOF of
    novelty even mid-stream: a bit the streamed filter is missing can
    only make the filter MORE conservative... it cannot — a missing
    bit yields maybe_dup = false for a doc whose duplicate arrived in
    a later batch than the probe's word snapshot, which is why the
    probe runs against the collapsed LATEST table, not a prefix."""
    from ..functions.bloom import bloom_probe

    words = word_updates.groupBy("w").agg(F.bit_or("word").alias("word"))
    return bloom_probe(
        new_docs.select("doc_id", F.md5("text").alias("hh")), words
    )


def char_census_partials(docs: DataFrame) -> DataFrame:
    """Streaming twin of q186's Simpson-diversity gate (23rd twin):
    the (doc_id, ch) character census is a plain merge-closed count —
    it accumulates correctly even if one document's TEXT is split
    across micro-batches (each fragment's chars just add). Census
    comes from ``functions/diversity.py`` (shared with batch q186);
    update mode, counts monotone, finisher max-collapses."""
    from ..functions.diversity import char_census

    return char_census(docs)


def finish_simpson_diversity(updates: DataFrame) -> DataFrame:
    """Read-time finisher ≡ q186: collapse update-mode census rows to
    the newest count (max — monotone) and run the shared exact-integer
    Simpson report over the census, which is (docs × alphabet)-sized,
    never stream-sized per key."""
    from ..functions.diversity import simpson_report

    census = updates.groupBy("doc_id", "ch").agg(F.max("c").alias("c"))
    return simpson_report(census)


def cm_sketch_partials(docs: DataFrame) -> DataFrame:
    """Streaming twin of q188's count-min build (24th twin): token
    occurrences from the document stream fold into the same fixed
    ≤``CM_D × CM_W``-row counter table via a streaming count
    aggregation — ``functions/cmsketch.py`` is the one source of
    truth for geometry and coordinates. Counters are SUMS
    (associative + commutative), so the streamed sketch over any
    micro-batch cut of the corpus is IDENTICAL to a one-shot batch
    build — and state is capped at 8192 longs at ANY corpus size or
    token cardinality, the property that makes CM the streaming
    frequency sketch. Update mode; counters monotone; no watermark."""
    from ..functions.cmsketch import cm_sketch

    return cm_sketch(
        docs.select(F.explode(F.split(F.col("text"), "\\s+")).alias("term"))
    )


def finish_cm_estimate(updates: DataFrame, probes: DataFrame) -> DataFrame:
    """Read-time finisher ≡ q188's probe: collapse update-mode
    counter versions to the newest value (max — counters are
    monotone) and point-query the probe terms through the shared
    broadcast-min estimator. ``est ≥ true`` holds mid-stream for the
    PREFIX the sketch has absorbed (counters only grow), and the
    collapsed final table gives exactly the batch estimates."""
    from ..functions.cmsketch import cm_estimate

    sketch = updates.groupBy("r", "pos").agg(
        F.max("counter").alias("counter")
    )
    return cm_estimate(probes, sketch)


def gram_census_partials(docs: DataFrame) -> DataFrame:
    """Streaming twin of q189's duplicate-span census (25th twin):
    the k-token-gram census is a plain count on the md5 gram key —
    merge-closed, so the streamed census equals a one-shot batch
    census EXACTLY **provided each document arrives whole** (grams
    span k-token windows; splitting one doc's text across batches
    would change its grams — the atomicity unit is the DOCUMENT,
    unlike q186's fragment-safe char census). State is the gram
    census itself: corpus-sized, the same tier as q97's incremental
    hash index — the honest cost of any incremental substring-dedup
    index, not a fixed-size sketch. functions/spans.py is the one
    source of truth for gram geometry."""
    from ..functions.spans import gram_census

    return gram_census(docs)


def finish_duplicate_spans(updates: DataFrame, docs: DataFrame) -> DataFrame:
    """Read-time finisher ≡ q189: collapse update-mode census rows to
    the newest count (max — counts are monotone) and run the shared
    coverage sweep over the corpus gram stream. New batches can only
    ADD duplication, so a mid-stream report is a lower bound on each
    doc's final coverage; the collapsed final census gives exactly
    the batch report."""
    from ..functions.spans import gram_stream, span_report, token_spine

    census = updates.groupBy("g").agg(F.max("n_occ").alias("n_occ"))
    return span_report(census, gram_stream(docs), token_spine(docs))


def histogram_median_partials(customers: DataFrame) -> DataFrame:
    """Streaming twin of q130's histogram-rank median (18th twin):
    the only data-sized stage is the same mergeable (segment, cents)
    census the batch plan runs — state is bounded by the VALUE DOMAIN
    per segment, not a watermark, so a lifetime median needs no time
    column (q118's ``value_histogram`` pattern). Census shape comes
    from ``functions/histogram.py``, shared with q130 — one source of
    truth, two engines. Run in update mode; counts only grow, so the
    NEWEST update per (segment, cents) is simply the max."""
    from ..functions.histogram import cents_histogram

    return cents_histogram(customers)


def finish_histogram_median(updates: DataFrame) -> DataFrame:
    """Read-time finisher ≡ q130: collapse update-mode rows to the
    latest census state (counts are monotone — ``max``), then the
    shared nearest-rank report. Order statistics are not mergeable,
    so — exactly like ``finish_time_to_convert``'s percentile pass —
    the rank pick runs at read time over the HISTOGRAM, which is
    value-domain-bounded, never stream-sized."""
    from ..functions.histogram import histogram_rank_report

    hist = updates.groupBy("c_mktsegment", "cents").agg(
        F.max("cnt").alias("cnt")
    )
    return histogram_rank_report(hist)


# ---------------------------------------------------------------------------
# Stateful funnel (streaming twin of plans/windows_q.q108_funnel)
# ---------------------------------------------------------------------------

FUNNEL_UPDATE_SCHEMA = (
    "user_id long, v_ts timestamp, c_ts timestamp, p_ts timestamp, upd_seq long"
)
_FUNNEL_STATE_SCHEMA = "v long, c long, p long, seq long"


def funnel_updates(events: DataFrame,
                   watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming ordered-funnel state: per user, first ``view`` ->
    first ``click`` strictly after it -> first ``purchase`` strictly
    after that, maintained incrementally with
    ``applyInPandasWithState``.

    State per user is three optional timestamps + a counter — FIXED
    SIZE, so an unbounded stream holds exactly one tiny row per user
    ever seen (the funnel is lifetime-scoped; nothing to evict).
    Each micro-batch emits the user's current funnel row stamped with
    ``upd_seq`` (events processed so far, strictly monotone), so a
    read-time finisher (:func:`funnel_report`) can keep the newest
    row per user without relying on sink ordering.

    Equivalence contract (pinned in tests/test_stateful.py): on
    ts-ordered arrival this reproduces the batch q108 exactly — the
    sequential first-view/first-click-after/first-purchase-after scan
    over globally ts-sorted events computes the same three minima as
    the batch window plan. Rows within a batch are ts-sorted by the
    kernel; cross-batch order is the source's arrival order, which a
    real deployment bounds with the watermark.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        v, c, p, seq = state.get if state.exists else (None, None, None, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for ts, et in zip(rows["ts"], rows["event_type"]):
            us = int(ts.value // 1_000)  # pandas ns -> micros
            if v is None:
                if et == "view":
                    v = us
            elif c is None:
                if et == "click" and us > v:
                    c = us
            elif p is None:
                if et == "purchase" and us > c:
                    p = us
        seq += len(rows)
        state.update((v, c, p, seq))

        def _t(us_val):
            return pd.Timestamp(us_val, unit="us") if us_val is not None else pd.NaT

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "v_ts": [_t(v)],
                "c_ts": [_t(c)],
                "p_ts": [_t(p)],
                "upd_seq": [seq],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            FUNNEL_UPDATE_SCHEMA,
            _FUNNEL_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def funnel_updates_tws(events: DataFrame,
                       watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """The same ordered funnel as :func:`funnel_updates`, on Spark 4's
    ``transformWithStateInPandas`` (StatefulProcessor) API — the
    forward path for custom stateful operators: typed named states
    (value/list/map), optional per-state TTL, and event-time timers,
    vs ``applyInPandasWithState``'s single untyped tuple. Output and
    equivalence contract are identical (same finisher applies), so
    tests pin both implementations against batch q108.

    Requires the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...RocksDBStateStoreProvider``) — transformWithState is built on
    its changelog; the HDFS-backed default store does not support it.
    Also requires ``google.protobuf`` (the state-server protocol is
    protobuf-encoded); environments without it must use
    :func:`funnel_updates` — same output, same finisher.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Funnel(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "funnel", "v long, c long, p long, seq long"
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            v, c, p, seq = (
                self._st.get() if self._st.exists() else (None, None, None, 0)
            )
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                us = int(ts.value // 1_000)
                if v is None:
                    if et == "view":
                        v = us
                elif c is None:
                    if et == "click" and us > v:
                        c = us
                elif p is None:
                    if et == "purchase" and us > c:
                        p = us
            seq += len(pdf)
            self._st.update((v, c, p, seq))

            def _t(us_val):
                return pd.Timestamp(us_val, unit="us") if us_val is not None else pd.NaT

            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "v_ts": [_t(v)],
                    "c_ts": [_t(c)],
                    "p_ts": [_t(p)],
                    "upd_seq": [seq],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            _Funnel(), FUNNEL_UPDATE_SCHEMA, "Update", "None"
        )
    )


def funnel_report(updates: DataFrame) -> DataFrame:
    """Batch finisher over :func:`funnel_updates` output: keep each
    user's newest state row (max ``upd_seq`` — strictly monotone, so
    the pick is deterministic), then collapse to the one-row q108
    report shape."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("upd_seq"))
    last = (
        updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return last.agg(
        F.count("*").alias("n_users"),
        F.count("v_ts").alias("n_viewed"),
        F.count("c_ts").alias("n_clicked"),
        F.count("p_ts").alias("n_purchased"),
        F.sum(
            F.when(
                F.col("p_ts").isNotNull(),
                F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts"),
            )
        ).alias("sum_convert_secs"),
    )


# ---------------------------------------------------------------------------
# Retention partials (streaming twin of plans/windows_q.q109)
# ---------------------------------------------------------------------------

def retention_partials(events: DataFrame,
                       watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming form of the retention cohort report: ONE streaming
    aggregation at (user_id, activity-day) grain.

    The cohort week needs each user's GLOBAL first-seen day — a
    second aggregation level streaming can't chain — so the stream
    keeps the finest grain the report needs (state rows = user x
    active-day, watermark-bounded per day) and
    :func:`finish_retention` derives first-seen, cohort and offset at
    read time over this much smaller table. Same
    partial-then-finish pattern as :func:`daily_user_partials`.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )


def finish_retention(partials: DataFrame) -> DataFrame:
    """Batch finisher: first-seen day per user -> cohort week ×
    week-offset countDistinct — emits exactly the q109 report shape.
    First-seen is a window over the partial table (user x day sized),
    not a self-join — one shuffle on user_id, no lineage ambiguity."""
    from pyspark.sql import Window

    first_day = F.min("day").over(Window.partitionBy("user_id"))
    cohorted = partials.withColumn("first_day", first_day).select(
        "user_id",
        F.date_format(F.date_trunc("week", "first_day"), "yyyy-MM-dd").alias(
            "cohort_week"
        ),
        F.floor(F.datediff(F.col("day"), F.col("first_day")) / 7).alias(
            "week_offset"
        ),
    )
    return (
        cohorted.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


def rolling_active_partials(events: DataFrame,
                            watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming form of the rolling 7-day actives report (q132's
    twin): ONE streaming aggregation at the distinct (user_id, day)
    grain — the identical bounded partial :func:`retention_partials`
    keeps (state rows = users x watermark-bounded days). The 7x
    fan-out and the final count-distinct — which streaming can't
    chain as a second aggregation level — run at read time over this
    much smaller table via :func:`finish_rolling_active`."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )


def finish_rolling_active(partials: DataFrame) -> DataFrame:
    """Batch finisher: each (user, active-day) partial serves the 7
    report days it belongs to (within-row explode), then one
    count-distinct — emits exactly the q132 report shape."""
    contrib = partials.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("rday"),
    )
    return (
        contrib.groupBy(F.date_format("rday", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Last-touch attribution (streaming twin of plans/windows_q.q138)
# ---------------------------------------------------------------------------

ATTRIBUTION_SCHEMA = "user_id long, campaign string, vq long"
_ATTR_STATE_SCHEMA = "click_us long, camp string"


def attribution_stream(events: DataFrame,
                       watermark: str = DEFAULT_WATERMARK,
                       recency_hours: int = 24) -> DataFrame:
    """Streaming last-touch attribution (q138's twin) — a JOIN-LIKE
    enrichment with bounded state, not an aggregation: per user the
    state is ONLY the most recent click (microsecond timestamp +
    campaign id, one fixed-size row). Each micro-batch emits one
    attributed row per purchase; the stored click stitches
    attribution across batch cuts, so a purchase in batch N+1 still
    credits its click from batch N. Equivalence contract (pinned in
    tests/test_stateful.py): on ts-ordered arrival,
    :func:`finish_attribution` over the emitted rows == batch q138.
    """
    import math

    from pyspark.sql.streaming.state import GroupStateTimeout

    recency_us = recency_hours * 3600 * 1000000

    def fn(key, pdfs, state):
        import pandas as pd

        click_us, camp = state.get if state.exists else (None, None)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        out_camp: list = []
        out_vq: list = []
        for r in rows.itertuples():
            ts_us = r.ts.value // 1000
            if r.event_type == "click":
                click_us, camp = ts_us, r.k
            elif r.event_type == "purchase":
                if click_us is not None and ts_us - click_us <= recency_us:
                    out_camp.append(camp)
                else:
                    out_camp.append("(organic)")
                out_vq.append(int(math.floor(r.value * 100)))
        if click_us is not None:
            state.update((click_us, camp))
        if out_vq:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_vq),
                    "campaign": out_camp,
                    "vq": out_vq,
                }
            )

    # campaign extraction stays JVM-side (get_json_object) so the
    # Python state fn only sees narrow typed columns
    pre = events.select(
        "ts", "event_id", "user_id", "event_type", "value",
        F.get_json_object("props", "$.k").alias("k"),
    )
    return (
        pre.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            ATTRIBUTION_SCHEMA,
            _ATTR_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def finish_attribution(attributed: DataFrame) -> DataFrame:
    """Batch finisher over :func:`attribution_stream` output: the
    campaign census — emits exactly the q138 report shape."""
    return (
        attributed.groupBy("campaign")
        .agg(F.count("*").alias("n_purchases"), F.sum("vq").alias("revenue_vq"))
        .orderBy("campaign")
    )


# ---------------------------------------------------------------------------
# Clamped-balance partials (streaming twin of plans/windows_q.q150)
# ---------------------------------------------------------------------------

BALANCE_SCHEMA = "user_id long, s_last long, floor_shift long, upd_seq long"
_BAL_STATE_SCHEMA = "s long, mn long, seq long"

def clamped_balance_partials(events: DataFrame,
                             watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming twin of q150: the floor-at-zero balance identity
    ``clamped = S - min(0, min S)`` needs only TWO numbers of per-user
    state (running sum, running min) — so the seemingly sequential
    clamp recurrence streams with fixed-size state and stitches
    exactly across micro-batch cuts. Each batch emits the user's
    updated (s_last, floor_shift) pair; :func:`finish_clamped_balance`
    keeps the latest update per user and emits the q150 report."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.events import balance_delta_py

    def fn(key, pdfs, state):
        import pandas as pd

        s, mn, seq = state.get if state.exists else (0, 0, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for r in rows.itertuples():
            # the identical mapping as batch q150's balance_delta_col —
            # one table in functions/events.py, two engines
            s += balance_delta_py(r.event_type, r.value)
            mn = min(mn, s)
        seq += 1
        state.update((s, mn, seq))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "s_last": [s],
                "floor_shift": [min(0, mn)],
                "upd_seq": [seq],
            }
        )

    pre = events.select("ts", "event_id", "user_id", "event_type", "value")
    return (
        pre.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            BALANCE_SCHEMA,
            _BAL_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def finish_clamped_balance(updates: DataFrame) -> DataFrame:
    """Batch finisher: latest update per user -> the q150 report."""
    latest = updates.groupBy("user_id").agg(
        F.max_by("s_last", "upd_seq").alias("s_last"),
        F.max_by("floor_shift", "upd_seq").alias("floor_shift"),
    )
    final = latest.select(
        (F.col("s_last") - F.col("floor_shift")).alias("final_cents"),
        (F.col("floor_shift") < 0).alias("floored"),
    )
    return final.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("floored"), 1).otherwise(0)).alias("n_floored"),
        F.sum("final_cents").alias("total_final_cents"),
        F.max("final_cents").alias("max_final_cents"),
    )


# ---------------------------------------------------------------------------
# Transition-matrix deltas (streaming twin of plans/windows_q.q114)
# ---------------------------------------------------------------------------

TRANSITION_DELTA_SCHEMA = "user_id long, prev_type string, next_type string, n long"
_TRANS_STATE_SCHEMA = "last string"


def transition_deltas(events: DataFrame,
                      watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming first-order Markov transition counts: per user the
    state is ONLY the last event_type seen (one short string —
    fixed-size, nothing to evict), so each micro-batch emits the
    DELTA transition counts it observed, including the boundary
    transition from the previous batch's last event.

    Partial-then-finish: the deltas accumulate in the sink and
    :func:`finish_transitions` sums them into exactly the batch q114
    matrix. Equivalence contract (pinned in tests/test_stateful.py):
    on ts-ordered arrival, sum-of-deltas == batch lag-window counts —
    concatenating per-batch transition censuses over a stream cut at
    any boundary reproduces the full sequence's census because the
    stored ``last`` stitches the cut.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        last = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        counts: dict[tuple[str, str], int] = {}
        for et in rows["event_type"]:
            if last is not None:
                k = (last, et)
                counts[k] = counts.get(k, 0) + 1
            last = et
        state.update((last,))
        if counts:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(counts),
                    "prev_type": [k[0] for k in counts],
                    "next_type": [k[1] for k in counts],
                    "n": list(counts.values()),
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            TRANSITION_DELTA_SCHEMA,
            _TRANS_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def finish_transitions(deltas: DataFrame) -> DataFrame:
    """Batch finisher over :func:`transition_deltas` output: sum the
    per-batch deltas to total counts, then row-normalize — emits the
    exact q114 report shape (prev_type, next_type, n_trans, p_trans)."""
    from pyspark.sql import Window

    pairs = deltas.groupBy("prev_type", "next_type").agg(
        F.sum("n").alias("n_trans")
    )
    wrow = Window.partitionBy("prev_type")
    return (
        pairs.select(
            "prev_type",
            "next_type",
            "n_trans",
            F.round(F.col("n_trans") / F.sum("n_trans").over(wrow), 6).alias(
                "p_trans"
            ),
        )
        .orderBy("prev_type", "next_type")
    )


# ---------------------------------------------------------------------------
# Behavior-mask census (streaming twin of plans/windows_q.q148)
# ---------------------------------------------------------------------------

def behavior_mask_partials(events: DataFrame) -> DataFrame:
    """Streaming form of the q148 audience-overlap census: ONE
    streaming aggregation at the user grain keeping 5 monotone flags
    (``max(case)`` per event type — bool-or partials, merge-closed, so
    every micro-batch cut stitches exactly). State is one fixed row
    per user; no watermark because the mask is lifetime-scoped (same
    contract as the funnel state). The 32-row combination census —
    a second aggregation level streaming can't chain — runs at read
    time via :func:`finish_behavior_cohorts`. Flag/mask/label
    expressions are the batch q148's own (functions/events.py)."""
    from ..functions.events import behavior_flag_aggs

    return events.groupBy("user_id").agg(*behavior_flag_aggs())


def finish_behavior_cohorts(updates: DataFrame) -> DataFrame:
    """Batch finisher: collapse update-mode rows (flags only ever
    grow, so ``max`` per user is the latest state), fold the 5 flags
    into the bit mask, census — emits the exact q148 report shape."""
    from ..functions.events import (
        BEHAVIOR_TYPES,
        behavior_labels_col,
        behavior_mask_col,
    )

    latest = updates.groupBy("user_id").agg(
        *[F.max(f"f{i}").alias(f"f{i}") for i in range(len(BEHAVIOR_TYPES))]
    )
    labels = behavior_labels_col()
    return (
        latest.select("user_id", behavior_mask_col().alias("mask"))
        .groupBy("mask")
        .agg(F.count("*").alias("n_users"))
        .withColumn("behaviors", labels)
        .select("mask", "behaviors", "n_users")
        .orderBy("mask")
    )


# ---------------------------------------------------------------------------
# Time-to-convert (streaming twin of plans/windows_q.q149)
# ---------------------------------------------------------------------------

def conversion_partials(events: DataFrame) -> DataFrame:
    """Streaming form of the q149 funnel-latency report: conditional
    first-view/first-purchase ``min`` aggregates at the user grain —
    merge-closed, one fixed state row per user, exact across any
    micro-batch cut. The percentile pass (order statistics are not
    mergeable) runs at read time over the user-grain table via
    :func:`finish_time_to_convert`."""
    from ..functions.events import first_touch_aggs

    return events.groupBy("user_id").agg(*first_touch_aggs())


def finish_time_to_convert(updates: DataFrame) -> DataFrame:
    """Batch finisher: collapse update-mode rows (conditional mins
    only ever shrink, so ``min`` per user is the latest state), then
    the exact q149 delay-percentile report."""
    from ..functions.events import conversion_report

    latest = updates.groupBy("user_id").agg(
        F.min("first_view").alias("first_view"),
        F.min("first_purchase").alias("first_purchase"),
    )
    return conversion_report(latest)


# ---------------------------------------------------------------------------
# Streaming heavy hitters (twin of operators/sketch.py + q175's scale path)
# ---------------------------------------------------------------------------

def heavy_hitter_partials(events: DataFrame, key_col: str,
                          k: int = 64) -> DataFrame:
    """Streaming form of the Misra-Gries heavy-hitter sketch: the
    per-partition MG pass is STATELESS per micro-batch (mapInPandas
    works unchanged on a streaming frame), so each batch appends at
    most partitions × k candidate rows. Because MG summaries are
    mergeable with additive error (the PODS'12 theorem the batch
    operator builds on), merging ALL batches' partials at read time
    — :func:`finish_heavy_hitters` — keeps the exact same guarantee
    as one batch pass over the union of the data: no false negatives
    above n/(k+1), bounded under-counts. State is zero (no shuffle,
    no watermark); each micro-batch appends a BOUNDED number of
    candidate rows, so the sink grows with stream lifetime (T
    triggers -> at most T × partitions × k rows) — compact it by
    periodically replacing the table with its own
    :func:`finish_heavy_hitters` output (re-merging merged summaries
    is exactly what mergeability licenses)."""
    from ..operators.sketch import mg_partials

    return mg_partials(events, key_col, k)


def finish_heavy_hitters(partials: DataFrame, k: int = 64) -> DataFrame:
    """Batch finisher: one mergeable combine over every micro-batch's
    candidate rows — emits the global ≤ k-row summary."""
    from ..operators.sketch import mg_merge

    return mg_merge(partials, k)


# ---------------------------------------------------------------------------
# Audio segmentation (streaming twin of plans/llmdata.q195)
# ---------------------------------------------------------------------------


def audio_segment_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of q195's audio segmentation (28th twin): the
    kernel is STATELESS per asset (one document in, its segments
    out — the mg_partials property: ``mapInPandas`` works unchanged
    on a streaming frame, zero streaming state, no watermark), so the
    streamed segment set over any batch cut equals the batch kernel's
    EXACTLY provided each document arrives whole — the same per-doc
    atomicity unit as the q189 gram census, and the natural unit of
    any demuxer. One source of truth: the identical
    ``operators/multimodal.segment_audio`` over the identical
    ``documents_as_assets`` modelling."""
    from ..operators.multimodal import documents_as_assets, segment_audio

    return segment_audio(documents_as_assets(docs))


def ahash_band_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of q205's perceptual-hash bands (31st twin):
    ``ahash_bands`` is a STATELESS per-asset Arrow kernel (one image
    in, its 4 bands out — the q195/audio property: ``mapInPandas``
    runs unchanged on a streaming frame, zero streaming state, no
    watermark), so the streamed band table over ANY batch cut equals
    the batch kernel's exactly, provided each asset arrives whole.
    The downstream band JOIN stays a batch/foreachBatch concern — the
    fingerprinting stage is the streaming-safe part."""
    from ..operators.multimodal import ahash_bands, documents_as_assets

    return ahash_bands(documents_as_assets(docs))


# ---------------------------------------------------------------------------
# Daily-revenue OLS census (streaming twin of plans/windows_q.q193)
# ---------------------------------------------------------------------------


def daily_revenue_partials(events: DataFrame) -> DataFrame:
    """Streaming twin of q193's day-grain census (27th twin): the
    same mergeable (event_type, day) cent-sum partial agg as the
    batch plan (imported from ``functions/trends.py`` — one source of
    truth). State is bounded by types × DAYS; update mode — cent sums
    over positive values are monotone, so the newest update per key
    is the max (the q122-twin argument)."""
    from ..functions.trends import daily_type_census

    return daily_type_census(events)


def finish_ols_trend(updates: DataFrame) -> DataFrame:
    """Read-time finisher ≡ q193: collapse update-mode rows to the
    latest census state, then the shared OLS report (rebase + five
    integer sums) over the days-sized table."""
    from ..functions.trends import ols_trend_report

    daily = updates.groupBy("event_type", "day").agg(F.max("y").alias("y"))
    return ols_trend_report(daily)


# ---------------------------------------------------------------------------
# KMV distinct-sketch minima (streaming twin of plans/llmdata.q191)
# ---------------------------------------------------------------------------

KMV_UPDATE_SCHEMA = "scope string, minima array<long>, upd_seq long"
_KMV_STATE_SCHEMA = "minima array<long>, seq long"


def make_kmv_kernel():
    """Build the KMV ``applyInPandasWithState`` kernel at module level
    so it is directly unit-testable with a fake GroupState (the
    make_session_kernel discipline — executor-side kernel code is
    invisible to driver-process coverage tracing). State per scope is
    the ≤K-long minima list + an update sequence; min-k merge-closure
    is what makes the streamed sketch equal the batch one exactly."""
    from ..functions.kmv import KMV_K

    def fn(key, pdfs, state):
        import pandas as pd

        minima, seq = state.get if state.exists else ([], 0)
        s = set(minima)
        for pdf in pdfs:
            s.update(int(h) for h in pdf["h"])
        kept = sorted(s)[:KMV_K]
        seq += 1
        state.update((kept, seq))
        yield pd.DataFrame(
            {"scope": [key[0]], "minima": [kept], "upd_seq": [seq]}
        )

    return fn


def kmv_partials(terms: DataFrame) -> DataFrame:
    """Streaming KMV / theta-sketch build: per-scope state is ONLY
    the ≤K smallest DISTINCT hash values (≤K longs — fixed-size,
    nothing to evict), because min-k is merge-closed:
    min-k(state ∪ batch) = min-k(whole prefix), so no micro-batch
    cut can lose a hash the one-shot batch sketch would have kept.
    Hashing stays JVM-side (``kmv_hash`` native column) — only the
    (scope, h) pairs cross into the stateful Python kernel. Each
    batch emits the scope's full updated minima list (array-typed,
    bounded by K); :func:`finish_kmv_estimate` keeps the latest per
    scope and runs the IDENTICAL estimator as batch q191 — one
    source of truth in functions/kmv.py."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.kmv import kmv_hash

    fn = make_kmv_kernel()
    hashed = terms.select("scope", kmv_hash(F.col("term")).alias("h"))
    return hashed.groupBy("scope").applyInPandasWithState(
        fn,
        KMV_UPDATE_SCHEMA,
        _KMV_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def finish_kmv_estimate(updates: DataFrame) -> DataFrame:
    """Batch finisher: latest minima list per scope, plus the
    lossless 'ALL' union row, through the same q191 estimator. The
    reserved-label guard is the SAME shared helper batch q191 runs
    (functions/kmv.kmv_guard_reserved) — a real scope named 'ALL'
    aborts loudly here too, instead of silently folding into the
    union sketch (round-6 advice: no batch/streaming divergence)."""
    from ..functions.kmv import kmv_estimate, kmv_guard_reserved, kmv_union

    latest = updates.groupBy("scope").agg(
        F.max_by("minima", "upd_seq").alias("minima")
    )
    minima = latest.select("scope", F.explode("minima").alias("h"))
    return kmv_estimate(
        kmv_guard_reserved(minima).unionByName(kmv_union(minima))
    )


def finish_kmv_set_algebra(updates: DataFrame) -> DataFrame:
    """Set-algebra finisher over the streamed KMV state (twin #30):
    latest minima per scope through the SAME
    ``functions/kmv.kmv_set_algebra`` kernel as batch q203. min-k is
    merge-closed, so the streamed minima — hence the pair estimates,
    which are a deterministic function of the minima — equal the
    one-shot batch sketch EXACTLY (truth census columns are q203's
    report concern, not the sketch's)."""
    from ..functions.kmv import kmv_set_algebra

    latest = updates.groupBy("scope").agg(
        F.max_by("minima", "upd_seq").alias("minima")
    )
    minima = latest.select("scope", F.explode("minima").alias("h"))
    return kmv_set_algebra(minima)


def fs_census_partials(docs: DataFrame) -> DataFrame:
    """Streaming Fellegi-Sunter agreement-pattern census (twin #32,
    batch q207's front half): the comparator SET columns (shingles +
    title bigrams) are computed by the SAME Spark exprs as batch
    (functions/shingles.py + functions/linkage.py — the kernel never
    re-tokenizes), then one ``applyInPandasWithState`` group per LANG
    BLOCK derives the sorted-neighborhood pairs and their 4 agreement
    flags and emits (pattern, count) partials.

    ATOMICITY CONTRACT (explicit, per the r7 verdict): SNM neighbors
    depend on the complete in-block sort, so each lang block must
    arrive WHOLE in one micro-batch; the kernel keeps a seen-flag in
    state and ABORTS on a split block instead of emitting a census
    over half-derived neighborhoods. Pattern counts are plain sums —
    merge-closed across blocks and batches — so the streamed census
    (and the trained EM parameters, a deterministic function of it:
    :func:`finish_fs_em_weights`) equals batch q207 EXACTLY.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.linkage import (
        FS_CENSUS_SCHEMA,
        _FS_CENSUS_STATE,
        make_fs_census_kernel,
        with_bigram_set,
    )
    from ..functions.shingles import with_shingle_sets

    proj = with_bigram_set(with_shingle_sets(docs)).select(
        "doc_id", "lang", "source", "n_chars", "sh", "bg"
    )
    return proj.groupBy("lang").applyInPandasWithState(
        make_fs_census_kernel(),
        FS_CENSUS_SCHEMA,
        _FS_CENSUS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def finish_fs_census(updates: DataFrame) -> DataFrame:
    """Batch finisher: fold the per-lang partials into the global
    (g1..g4, c) census — plain sums, the merge-closure that makes the
    twin exact."""
    return updates.groupBy("g1", "g2", "g3", "g4").agg(
        F.sum("c").alias("c")
    )


def finish_fs_em_weights(updates: DataFrame) -> DataFrame:
    """Train the FS parameters from the STREAMED census through the
    identical exact-ppm EM as batch q207 — the SAME
    ``functions/linkage.fs_em_report`` assembly (one source of truth:
    a comparator addition changes both paths together, the report
    shape cannot desynchronize)."""
    from ..functions.linkage import fs_em_report

    return fs_em_report(
        updates.sparkSession, finish_fs_census(updates), rounds=2
    )


def snm_pair_partials(docs: DataFrame, title_chars: int = 16) -> DataFrame:
    """Streaming sorted-neighborhood pair generation (twin #33,
    batch q211's blocking half): whole-LANG-BLOCK atomicity enforced
    in-kernel exactly like :func:`fs_census_partials`; emits the
    candidate pairs WITH their title fields, UNSCORED — scoring
    happens in :func:`finish_jaro_winkler` through the same
    ``with_jaro_winkler`` operator batch q211 runs, so streamed
    scores equal batch scores by construction."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.linkage import (
        SNM_PAIR_SCHEMA,
        _FS_CENSUS_STATE,
        make_snm_pair_kernel,
    )

    proj = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", "lang", "n_chars",
        F.expr(f"substring(text, 1, {title_chars})").alias("title"),
    )
    return proj.groupBy("lang").applyInPandasWithState(
        make_snm_pair_kernel(),
        SNM_PAIR_SCHEMA,
        _FS_CENSUS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def snm_pair_partials_sorted(docs: DataFrame, title_chars: int = 16) -> DataFrame:
    """Streaming sorted-neighborhood pairs with BOUNDED state (twin
    #34) — the classic streaming-SNM form of twin #33: state per lang
    is only the last w=3 rows of the sorted order, so a lang block
    may span any number of micro-batches and kernel memory is O(w)
    at any block size (the 100 TB streaming path; #32/#33/#35's
    whole-block kernels are O(block) by disclosed contract).

    CONTRACT (enforced in-kernel): rows of a lang arrive in
    block-sort order across micro-batches — each batch self-sorts,
    but a batch must not sort before the previous batch's stored
    tail; violations ABORT. Under the contract the pair stream is
    IDENTICAL to twin #33's (hence to batch q211's after the shared
    :func:`finish_jaro_winkler`) by construction."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.linkage import (
        SNM_PAIR_SCHEMA,
        SNM_SORTED_STATE,
        make_snm_sorted_kernel,
    )

    proj = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", "lang", "n_chars",
        F.expr(f"substring(text, 1, {title_chars})").alias("title"),
    )
    return proj.groupBy("lang").applyInPandasWithState(
        make_snm_sorted_kernel(),
        SNM_PAIR_SCHEMA,
        SNM_SORTED_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def fs_flagged_pair_partials(docs: DataFrame) -> DataFrame:
    """Streaming FLAGGED sorted-neighborhood pairs (twin #35's front
    half): the same projection and whole-block atomicity contract as
    :func:`fs_census_partials`, but emitting every pair with its 4
    agreement flags instead of the summed census — both kernels
    enumerate through the ONE shared
    ``functions/linkage.snm_flagged_pairs``, so the pair stream and
    the census cannot disagree about what a pair or a flag is."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.linkage import (
        FS_PAIR_SCHEMA,
        _FS_CENSUS_STATE,
        make_fs_pair_kernel,
        with_bigram_set,
    )
    from ..functions.shingles import with_shingle_sets

    proj = with_bigram_set(with_shingle_sets(docs)).select(
        "doc_id", "lang", "source", "n_chars", "sh", "bg"
    )
    return proj.groupBy("lang").applyInPandasWithState(
        make_fs_pair_kernel(),
        FS_PAIR_SCHEMA,
        _FS_CENSUS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def finish_fs_trained_classify(updates: DataFrame) -> DataFrame:
    """Classify the streamed flagged pairs through the IDENTICAL
    batch tail (``functions/linkage.fs_classify``: census → 2 EM
    rounds → posterior broadcast) — the full trained record-linkage
    loop of q208, streamed, with nothing re-implemented (twin #35).
    The census fs_classify derives is a deterministic merge-closed
    function of the pair stream, so streamed == batch exactly."""
    from ..functions.linkage import fs_classify

    return fs_classify(updates.sparkSession, updates)


def finish_er_entities(updates: DataFrame) -> DataFrame:
    """Cluster the streamed trained ``link`` verdicts into ENTITIES —
    batch q214 streamed (twin #36): :func:`finish_fs_trained_classify`
    classifies the flagged pair stream through the identical batch
    tail, then the IDENTICAL ``functions/linkage.er_entities``
    assembly batch q214 delegates to. Everything downstream of the
    pair stream is a deterministic function of it, so streamed ==
    batch exactly — nothing re-implemented."""
    from ..functions.linkage import er_entities

    return er_entities(finish_fs_trained_classify(updates))


def finish_golden_records(updates: DataFrame, docs: DataFrame) -> DataFrame:
    """MERGE the streamed entities into golden records — batch q215
    streamed (twin #37): the flagged pair stream classifies through
    the identical trained tail, clusters through the identical
    component pass, then survivorship runs through the IDENTICAL
    ``functions/linkage.er_golden_records`` assembly against the
    (static, dimension-style) ``docs`` attribute table. The entire
    trained-ER production arc — block → train → classify → cluster →
    merge — is now a deterministic function of the pair stream on
    both transports, nothing re-implemented."""
    from ..functions.linkage import er_golden_records

    return er_golden_records(
        finish_fs_trained_classify(updates),
        docs.select("doc_id", "source", "n_chars"),
    )


def bpe_census_partials(docs: DataFrame) -> DataFrame:
    """Streaming twin of the BPE family's corpus stage (twin #38):
    the (w, cnt) word census is a plain merge-closed count — ONE
    definition shared with the batch census
    (``plans/llmdata.bpe_word_census_from``), update mode, counts
    monotone, no watermark. State is vocabulary-bounded
    (Heaps-sublinear), never corpus-sized."""
    from ..plans.llmdata import bpe_word_census_from

    return bpe_word_census_from(docs)


def finish_tokenizer_fertility(updates: DataFrame) -> DataFrame:
    """Read-time finisher ≡ q223: max-collapse the update-mode census
    rows to the newest count (monotone), then run the IDENTICAL
    train→apply→evaluate tail (``plans/llmdata.bpe_fertility_report``)
    batch q223 delegates to — the trained tokenizer AND its fertility
    evaluation are deterministic functions of the merge-closed word
    census, so streamed ≡ batch exactly, nothing re-implemented."""
    from ..plans.llmdata import bpe_fertility_report

    census = updates.groupBy("w").agg(F.max("cnt").alias("cnt"))
    return bpe_fertility_report(updates.sparkSession, census)


def lloyd_seed_partials(vecs: DataFrame) -> DataFrame:
    """Streaming twin of q212's SEED pass (39th twin, stage 0): the
    per-stratum (min vec_id, its quantized code) census — min/min_by
    are merge-closed, so the update-mode rows converge to exactly the
    batch seeds. State is K rows."""
    from ..plans.llmdata import _LLOYD_K, _LLOYD_STRATUM, _quant

    coded = vecs.select("vec_id", _quant(F.col("embedding")).alias("qe"))
    return (
        coded.withColumn("stratum", F.expr(_LLOYD_STRATUM.format(k=_LLOYD_K)))
        .groupBy("stratum")
        .agg(F.min("vec_id").alias("mv"), F.min_by("qe", "vec_id").alias("qe"))
    )


def finish_lloyd_seeds(updates: DataFrame) -> list[tuple[int, list[int]]]:
    """Collapse the update-mode seed rows to the final state (mv is
    monotone DECREASING per stratum, so min_by(qe, mv) is newest) and
    return q212's centroid structure."""
    rows = (
        updates.groupBy("stratum")
        .agg(F.min("mv").alias("mv"), F.min_by("qe", "mv").alias("qe"))
        .collect()
    )
    return sorted((r["stratum"], list(r["qe"])) for r in rows)


def lloyd_census_partials(vecs: DataFrame, cents) -> DataFrame:
    """Streaming twin of ONE Lloyd training round's update census
    (39th twin): the IDENTICAL ``_lloyd_update_arrow`` kernel batch
    q212 unrolls (r12 — literal-centroid NumPy assignment, a
    stateless map legal in a stream) feeding the per-(cid, pos)
    sum/count agg. The kernel emits per-task partials reduced by the
    same commutative sum, so the merge-closure argument in
    :func:`finish_lloyd_round` is unchanged. State is K·64 rows;
    update mode. Nothing re-implemented."""
    from ..plans.llmdata import _lloyd_update_arrow, _quant

    coded = vecs.select("vec_id", _quant(F.col("embedding")).alias("qe"))
    return _lloyd_update_arrow(coded, cents)


def finish_lloyd_round(updates: DataFrame, prev):
    """Collapse the update-mode census to its final state and run the
    IDENTICAL floor-mean update (``_lloyd_new_dims``) batch q212
    runs: per (cid, pos) the member count n is STRICTLY monotone (an
    update row only exists when new rows hit the key, which raises
    n), so max(n) / max_by(s, n) is the newest state — the q122-twin
    argument extended to the non-monotone sum by pairing it with its
    monotone count. Returns (new_centroids, members) exactly as the
    batch round does."""
    from ..plans.llmdata import _lloyd_new_dims

    rows = (
        updates.groupBy("cid", "pos")
        .agg(F.max("n").alias("n"), F.max_by("s", "n").alias("s"))
        .collect()
    )
    return _lloyd_new_dims(rows, prev)


def source_quality_partials(docs: DataFrame) -> DataFrame:
    """Streaming twin of q226's source census (41st twin): the
    (source, n_docs, n_pass) counts are plain merge-closed sums —
    ONE definition shared with the batch census
    (``plans/llmdata.source_quality_census_from``). State is
    sources-bounded; update mode; counts monotone."""
    from ..plans.llmdata import source_quality_census_from

    return source_quality_census_from(docs)


def finish_source_quality(updates: DataFrame) -> DataFrame:
    """Collapse the update-mode census (both counts monotone — the
    newest row per source is the max) and run the IDENTICAL
    census-side Wilson-LCB arithmetic batch q226 runs."""
    from ..plans.llmdata import source_quality_leaderboard

    census = updates.groupBy("source").agg(
        F.max("n_docs").alias("n_docs"),
        F.max_by("n_pass", "n_docs").alias("n_pass"),
    )
    return source_quality_leaderboard(census)


def embedding_drift_partials(vecs: DataFrame) -> DataFrame:
    """Streaming twin of q229's drift census (43rd twin): the
    (is_new, pos, s127, n) sums are plain merge-closed counts over a
    fixed 2×64-key space — ONE definition shared with the batch
    census (``plans/llmdata.embedding_drift_census_from``). State is
    128 rows; update mode; n is the monotone pair of s127.
    Monitoring is the native streaming workload — this census is
    what an ingest monitor keeps hot as new embedding batches land."""
    from ..plans.llmdata import embedding_drift_census_from

    return embedding_drift_census_from(vecs)


def finish_embedding_drift(updates: DataFrame) -> DataFrame:
    """Collapse the update-mode census (n strictly monotone per key —
    an update row only exists when new vectors hit the key; s127 is
    paired to it via max_by, the twin #39 argument) and run the
    IDENTICAL census-side report batch q229 runs."""
    from ..plans.llmdata import embedding_drift_report

    census = updates.groupBy("is_new", "pos").agg(
        F.max_by("s127", "n").alias("s127"),
        F.max("n").alias("n"),
    )
    return embedding_drift_report(census)


def length_census_partials(docs: DataFrame) -> DataFrame:
    """Streaming twin of q230's length-bucket census (44th twin):
    per-bucket (ca, cb) counts over a fixed ≤20-key space — ONE
    definition shared with the batch census
    (``plans/llmdata.length_census_from``). State is ≤20 rows;
    update mode; both counts monotone."""
    from ..plans.llmdata import length_census_from

    return length_census_from(docs)


def finish_length_drift(updates: DataFrame) -> DataFrame:
    """Collapse the update-mode census — ca and cb are EACH monotone
    per bucket, so their independent maxes are both final-state
    values even if attained in different update rows — and run the
    IDENTICAL census-side exact chi-square batch q230 runs."""
    from ..plans.llmdata import length_drift_report

    per = updates.groupBy("bucket").agg(
        F.max("ca").cast("long").alias("ca"),
        F.max("cb").cast("long").alias("cb"),
    )
    return length_drift_report(per)


def dsir_census_partials(docs: DataFrame) -> DataFrame:
    """Streaming twin of q225's hashed-bigram census (45th twin):
    per-bucket (cr, ct) counts over the fixed 256-bucket space — ONE
    definition shared with the batch census
    (``plans/llmdata.dsir_census_from``). State is ≤256 rows; update
    mode; both counts monotone."""
    from ..plans.llmdata import dsir_census_from

    return dsir_census_from(docs)


def finish_dsir_importance(updates: DataFrame, docs: DataFrame) -> DataFrame:
    """Collapse the update-mode census (cr and ct each monotone per
    bucket — independent maxes are final state), then run the
    IDENTICAL weight-table + scoring tail batch q225 runs against
    the (static, dimension-style) docs table — the twin #37
    golden-records pattern: the trained/estimated table comes from
    the stream, the scoring pass is a deterministic function of it."""
    from ..plans.llmdata import dsir_report, dsir_weight_table

    census = updates.groupBy("b").agg(
        F.max("cr").cast("long").alias("cr"),
        F.max("ct").cast("long").alias("ct"),
    )
    return dsir_report(docs, dsir_weight_table(census))


def quality_hist_partials(docs: DataFrame) -> DataFrame:
    """Streaming twin of q231's quality histogram (46th twin): the
    per-(lang, score_ppm) doc/token counts are merge-closed — ONE
    definition shared with the batch histogram
    (``plans/llmdata.quality_hist_from``). State is bounded by the
    (lang × distinct ppm score) space; update mode; both counts
    monotone."""
    from ..plans.llmdata import quality_hist_from

    return quality_hist_from(docs)


def finish_quality_tertiles(updates: DataFrame) -> DataFrame:
    """Collapse the update-mode histogram (cnt and stoks each
    monotone per key — independent maxes are final state) and run the
    IDENTICAL histogram-side tertile bucketing batch q231 runs."""
    from ..plans.llmdata import quality_tertiles_report

    hist = updates.groupBy("lang", "score_ppm").agg(
        F.max("cnt").cast("long").alias("cnt"),
        F.max("stoks").cast("long").alias("stoks"),
    )
    return quality_tertiles_report(hist)


def term_census_partials(docs: DataFrame) -> DataFrame:
    """Streaming twin of q234's term census (47th twin): plain
    merge-closed counts — ONE definition shared with the batch census
    (``plans/llmdata.term_census_from``). State is
    vocabulary-bounded (Heaps-sublinear, the twin #38 disclosure
    class), never corpus-sized; update mode."""
    from ..plans.llmdata import term_census_from

    return term_census_from(docs)


def finish_zipf_head(updates: DataFrame) -> DataFrame:
    """Collapse the update-mode census (counts monotone) and run the
    IDENTICAL census-side top-K + shares batch q234 runs."""
    from ..plans.llmdata import zipf_head_report

    census = updates.groupBy("term").agg(F.max("cnt").cast("long").alias("cnt"))
    return zipf_head_report(census)


def source_vocab_partials(docs: DataFrame) -> DataFrame:
    """Streaming twin of q232's (source, term) vocabulary census
    (49th twin): merge-closed counts — ONE definition shared with the
    batch census (``plans/llmdata.source_term_census_from``); a key
    EXISTS iff its monotone cnt > 0, which is what makes the streamed
    distinct merge-closed. STATE DISCLOSURE: |sources| × vocabulary
    keys — Heaps-sublinear in the corpus (the twin-#38 word-table
    class), never doc-sized; update mode. The live form of the
    corpus-mixing diagnostic: the overlap matrix stays current as
    crawl batches land."""
    from ..plans.llmdata import source_term_census_from

    return source_term_census_from(docs)


def finish_vocab_overlap(updates: DataFrame) -> DataFrame:
    """Collapse the update-mode census to its KEY SET (existence is
    the distinct — cnt is monotone, so any update row proves the key)
    and run the IDENTICAL Jaccard-matrix report batch q232 runs.

    The localCheckpoint IS the state collapse (vocab-bounded, the
    disclosed twin-#38 class) — and it is also load-bearing: the
    report self-joins its input, and Spark 4's self-join attribute
    dedup fails with INTERNAL_ERROR conflicting-references when both
    sides reach the same memory-sink View leaf; checkpointing
    rebases the key set onto a fresh LogicalRDD first."""
    from ..plans.llmdata import vocab_overlap_report

    sv = updates.select("source", "term").distinct().localCheckpoint()
    return vocab_overlap_report(sv)


def novelty_partials(docs: DataFrame, old_vocab: DataFrame) -> DataFrame:
    """Streaming twin of q235's per-doc novelty partials (50th twin):
    the delta STREAM's row-local distinct bigrams left-join the
    STATIC history vocabulary (stream-static join — the history
    vocabulary is static by construction: q235 scores a delta against
    a frozen snapshot) and aggregate per doc — ONE definition shared
    with batch q235 (``plans/llmdata.novelty_partials_from``). State
    is delta-doc-keyed; both counts land in a single update because a
    doc's text arrives whole in one row; update mode."""
    from ..plans.llmdata import novelty_partials_from

    return novelty_partials_from(docs, old_vocab)


def finish_novelty(updates: DataFrame) -> DataFrame:
    """Collapse the update-mode partials (n_bigrams and n_novel are
    each monotone per doc — and in fact final after the doc's single
    update) and run the IDENTICAL ppm + top-K report batch q235
    runs."""
    from ..plans.llmdata import novelty_report

    per = updates.groupBy("doc_id").agg(
        F.max("n_bigrams").cast("long").alias("n_bigrams"),
        F.max("n_novel").cast("long").alias("n_novel"),
    )
    return novelty_report(per)


def perceptron_epoch_partials(docs: DataFrame, w: list[int]) -> DataFrame:
    """Streaming twin of ONE batch-perceptron epoch (40th twin): the
    IDENTICAL ``pct_features_from`` → ``_pct_epoch_agg`` assembly
    batch q224 unrolls, against LITERAL weights — a single global
    (n_miss, d0..d3) census, merge-closed sums over a fixed feature
    space. State is ONE row; update mode."""
    from ..plans.llmdata import _pct_epoch_agg, pct_features_from

    return _pct_epoch_agg(pct_features_from(docs), w)


def finish_perceptron_epoch(updates: DataFrame, w: list[int]):
    """Collapse the update-mode epoch census to its newest state and
    apply the identical weight update batch q224 applies. Why
    max(n_miss) / max_by(d_i, n_miss) is the newest state: the d-sums
    accumulate ONLY over misclassified rows (d_i += y·x_i iff
    miss=1), so any batch that changes a d-sum also increments
    n_miss; a batch of all-correctly-classified rows changes no
    column and emits no update (or an identical one — a harmless
    max_by tie). Every state-changing update therefore strictly
    raises n_miss — the twin #39 monotone-pairing argument
    specialized to this census.

    Returns (n_miss, new_weights) exactly as a batch epoch does."""
    r = updates.agg(
        F.max("n_miss").alias("n_miss"),
        *[F.max_by(f"d{i}", "n_miss").alias(f"d{i}") for i in range(4)],
    ).collect()[0]
    return r["n_miss"], [w[i] + r[f"d{i}"] for i in range(4)]


def finish_jaro_winkler(pairs: DataFrame) -> DataFrame:
    """Score the streamed SNM pairs with the IDENTICAL batch
    comparator (functions/strsim.py — one operator, two transports)."""
    from ..functions.strsim import with_jaro_winkler

    return with_jaro_winkler(pairs, "title_a", "title_b").select(
        "doc_a", "doc_b", "w_dist",
        F.col("jw_jaro_ppm").alias("jaro_ppm"), "jw_ppm",
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Drive a finite streaming source to completion into a memory
    sink; returns the materialized result (test/smoke harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
