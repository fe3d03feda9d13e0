"""The prefix-filter (PPJoin) claim q127 rests on: for Jaccard
threshold τ, joining only each set's (n − ⌈τn⌉ + 1) globally-rarest
shingles finds EVERY pair with J ≥ τ — zero false negatives, unlike
LSH. Pin that guarantee on a seeded random corpus with engineered
heavy overlap (the regime where a broken prefix length silently
drops qualifying pairs)."""

from __future__ import annotations

import random

import pytest


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    rng = random.Random(421)
    vocab = [f"w{i}" for i in range(40)]
    base = [rng.choice(vocab) for _ in range(60)]
    docs = []
    for i in range(40):
        toks = list(base)
        # mutate 0..14 positions: many pairs land near the 0.8 boundary
        for _ in range(rng.randrange(0, 15)):
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        docs.append((i, " ".join(toks), "en", "srcX", len(" ".join(toks))))
    d = tmp_path_factory.mktemp("ppjoin")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d), docs


def _shingles(text: str) -> set[str]:
    t = text.split()
    n = max(len(t) - 3, 0)
    return {" ".join(t[i : i + 3]) for i in range(n + 1)}


def test_prefix_filter_finds_every_qualifying_pair(spark, corpus_dir):
    from polla_spark.plans.llmdata import q127_prefix_filter_join

    d, docs = corpus_dir
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in q127_prefix_filter_join(spark, d).collect()
    }
    sh = {i: _shingles(text) for i, text, *_ in docs}
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sh[a] & sh[b])
            un = len(sh[a] | sh[b])
            if un and inter / un >= 0.8:
                want[(a, b)] = round(inter / un, 6)
    # ZERO false negatives and exact scores — the PPJoin guarantee
    assert got == want
    assert len(want) >= 5  # the fixture really exercises the boundary
