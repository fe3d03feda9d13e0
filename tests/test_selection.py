"""Greedy coverage selection (operators/selection.py) — the pluggable
covered-set backends behind q201: exact distinct-frame vs the q183
bloom word table (the fixed-size 100 TB form)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polla_spark.operators.selection import coverage_selection

SF = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def _doc_tok(spark):
    from polla_spark.plans.llmdata import _with_shingle_sets

    d = _with_shingle_sets(spark.read.parquet(f"{SF}/documents.parquet"))
    return d.select("doc_id", F.explode("sh").alias("sh"))


def test_bloom_trace_equals_exact_on_documents(spark):
    # one-sided bloom error: covered shingles always hit, so at this
    # filter load (2 KB table, corpus-sized key set) no false positive
    # lands on a gain-deciding shingle — the greedy traces are
    # IDENTICAL. This is the pinned sketch-vs-exact agreement the
    # round-6 verdict asked for (its task #2).
    tok = _doc_tok(spark)
    exact = [tuple(r) for r in coverage_selection(tok, 3).collect()]
    bloom = [
        tuple(r)
        for r in coverage_selection(tok, 3, covered="bloom").collect()
    ]
    assert len(exact) == 3
    assert bloom == exact


def test_exact_backend_is_q201(spark):
    # q201 now delegates to the shared operator — same trace
    from polla_spark.plans.llmdata import q201_coverage_selection

    got = [tuple(r) for r in q201_coverage_selection(spark, SF).collect()]
    tok = _doc_tok(spark)
    want = [tuple(r) for r in coverage_selection(tok, 3).collect()]
    assert got == want


def test_synthetic_greedy_picks_and_exhaustion(spark):
    # doc 1 covers {a,b,c}, doc 2 {c,d}, doc 3 {a}: greedy picks
    # 1 (gain 3) then 2 (gain 1: only d is new); round 3 has zero
    # uncovered shingles left -> NO row (exhausted-coverage contract)
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "c"), (2, "d"), (3, "a")]
    tok = spark.createDataFrame(rows, "doc_id long, sh string")
    for mode in ("exact", "bloom"):
        trace = [
            tuple(r) for r in coverage_selection(tok, 3, covered=mode).collect()
        ]
        assert trace == [(1, 1, 3), (2, 2, 1)], (mode, trace)


def test_bloom_covered_state_is_bounded(spark):
    # the whole point of the bloom backend: the covered set is the
    # <=2048-row word table no matter how much is covered
    from polla_spark.functions.bloom import BLOOM_BITS

    tok = _doc_tok(spark)
    picked = tok.limit(5000)
    from polla_spark.functions.bloom import bloom_word_table

    words = bloom_word_table(picked.select(F.md5("sh").alias("hh")))
    assert words.count() <= BLOOM_BITS // 32


def test_rejects_bad_args(spark):
    tok = spark.createDataFrame([(1, "a")], "doc_id long, sh string")
    with pytest.raises(ValueError, match="covered"):
        coverage_selection(tok, 2, covered="kmv")
    with pytest.raises(ValueError, match="k must be"):
        coverage_selection(tok, 0)
