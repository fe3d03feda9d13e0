"""Greedy coverage-driven data selection — the submodular
facility-location recipe behind "pick the k most coverage-adding
documents" training-set curation (q201's kernel, factored out so the
covered-set representation is pluggable).

Two covered-set backends, chosen by ``covered=``:

- ``"exact"`` — the covered set is a DISTINCT (sh) DataFrame,
  anti-joined against the shingle table each round. Exact gains,
  but the covered set grows with every pick: fine while it fits a
  broadcast / one modest shuffle, which is q201's regime.
- ``"bloom"`` — the covered set is the q183 relational-bloom word
  table (functions/bloom.py): ≤ ``BLOOM_BITS/32`` = 2,048 rows of
  ``bit_or``-folded masks NO MATTER how many shingles are covered.
  Each round probes the (doc_id, shingle) table against the
  broadcast word table and counts the proven-novel shingles per doc.
  Bloom error is one-sided: a covered shingle ALWAYS hits (no false
  negatives), so gains are never over-counted for covered mass; a
  false POSITIVE can hide a genuinely-novel shingle and undercount
  a gain. At q201's scale the filter is so sparse that the traces
  agree exactly (pinned in tests/test_selection.py); at 100 TB this
  is the backend that keeps round cost bounded — the covered set
  stays 2 KB of state where the exact set grows without bound.

Round structure is identical for both (and to q201's oracle): k
unrolled greedy rounds, each one corpus-pass for the gain census +
a 1-row argmax broadcast; a round with no positive gain emits no row
(coverage exhausted — same contract as q201).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bloom import bloom_probe, bloom_word_table


def _argmax_gain(gains: DataFrame, rnd: int) -> DataFrame:
    """Deterministic greedy pick: (gain desc, doc_id) tie-break."""
    return (
        gains.filter(F.col("gain") >= 1)
        .orderBy(F.desc("gain"), "doc_id")
        .limit(1)
        .select(F.lit(rnd).alias("round"), "doc_id", "gain")
    )


def coverage_selection(
    tok: DataFrame, k: int, *, covered: str = "exact"
) -> DataFrame:
    """Greedy set-cover selection over a (doc_id, sh) shingle-set
    table (one row per DISTINCT shingle per doc). Returns the greedy
    trace (round, doc_id, gain), ≤k rows, ordered by round.

    ``covered="exact"`` reproduces q201 bit-for-bit; ``"bloom"``
    swaps the covered set for the fixed-size q183 word table (see
    module docstring for the error model and why it is the 100 TB
    backend).
    """
    if covered not in ("exact", "bloom"):
        raise ValueError(f"covered must be 'exact' or 'bloom': {covered!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    spark = tok.sparkSession
    tok = tok.persist()
    # every frame this builder persists is released before returning:
    # the greedy argmax is COLLECTED each round (1 tiny row — the
    # round is a driver-side decision anyway), so the returned report
    # is a literal frame with NO lineage into the cached intermediates
    # and repeated invocations (bench reps, exact-vs-bloom tests)
    # cannot accumulate cached lineages for the session's life
    # (ADVICE r7).
    cached: list[DataFrame] = [tok]
    pick_rows: list[tuple[int, int, int]] = []
    cov_exact: DataFrame | None = None     # exact: DISTINCT sh frame
    cov_words: DataFrame | None = None     # bloom: (w, word) table
    try:
        for rnd in range(1, k + 1):
            if covered == "exact":
                cand = (
                    tok if cov_exact is None
                    else tok.join(cov_exact, "sh", "left_anti")
                )
                gains = cand.groupBy("doc_id").agg(F.count("*").alias("gain"))
            else:
                keyed = tok.select("doc_id", "sh", F.md5("sh").alias("hh"))
                if cov_words is None:
                    gains = keyed.groupBy("doc_id").agg(
                        F.count("*").alias("gain")
                    )
                else:
                    novel = bloom_probe(
                        keyed.select("doc_id", "hh"), cov_words
                    ).filter(~F.col("maybe_dup"))
                    gains = novel.groupBy("doc_id").agg(
                        F.count("*").alias("gain")
                    )
            top = _argmax_gain(gains, rnd).collect()
            if not top:
                # coverage exhausted: no positive gain this round, and
                # the covered set is unchanged, so every later round is
                # exhausted too — stop (q201's <=k-row contract)
                break
            pick_rows.append(
                (rnd, int(top[0]["doc_id"]), int(top[0]["gain"]))
            )
            if rnd == k:
                break  # the last round's covered set has no consumer
            picked_sh = tok.filter(F.col("doc_id") == pick_rows[-1][1])
            if covered == "exact":
                new_cov = picked_sh.select("sh")
                cov_exact = (
                    new_cov if cov_exact is None
                    else cov_exact.unionByName(new_cov)
                ).distinct().persist()
                cached.append(cov_exact)
            else:
                new_words = bloom_word_table(
                    picked_sh.select(F.md5("sh").alias("hh"))
                )
                cov_words = (
                    new_words if cov_words is None
                    else cov_words.unionByName(new_words)
                    .groupBy("w")
                    .agg(F.bit_or("word").alias("word"))
                ).persist()
                cached.append(cov_words)
    finally:
        for df in cached:
            df.unpersist()
    return spark.createDataFrame(
        pick_rows or [], "round int, doc_id long, gain long"
    ).orderBy("round")
