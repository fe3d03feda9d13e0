"""Pin: the cluster-scale subtree-materialization conf
(``spark.polla_spark.subtreePersist``, r13 — VERDICT r12 #8) changes
PLANS only, never results.

Each gated query (q81 candidate-prefiltered rescore, q87 postings
persist, q90 unigram-census persist, q213 t2/t3 census persists) is
computed with the conf off and on at sf0.001 and the row sets must be
identical — the conf-off form is the oracle-certified one, so
equality extends the oracle guarantee to the conf-on shapes.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

GATED = [
    "q81_lsh_rescored_jaccard",
    "q87_bm25_topk",
    "q90_bigram_pmi",
    "q213_smoothed_lm_filter",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", GATED)
def test_conf_on_equals_conf_off(spark, name):
    from polla_spark.plans import registry
    from polla_spark.plans.llmdata import SUBTREE_PERSIST_CONF

    q = registry()[name]
    spark.catalog.clearCache()
    off = _rows(q.spark(spark, SF_SMOKE))
    spark.conf.set(SUBTREE_PERSIST_CONF, "true")
    try:
        spark.catalog.clearCache()
        on_df = q.spark(spark, SF_SMOKE)
        assert _rows(on_df) == off
        assert [f.name for f in on_df.schema.fields] == [
            f.name for f in q.spark(spark, SF_SMOKE).schema.fields
        ]
    finally:
        spark.conf.set(SUBTREE_PERSIST_CONF, "false")
        spark.catalog.clearCache()
