"""Pin: the driver-side Python EM (``fs_em_params_py`` /
``fs_posterior_ppm_py``, r13) is BIT-identical to the Spark
expression form (``fs_em_round`` / ``fs_posterior_expr``) it
replaced on the q207/q208 hot path.

The expression form stays in the module as the reference
implementation: this test evaluates it through a real Spark plan
(DECIMAL(38,0) products, integer ``div``) on crafted censuses that
exercise every agreement pattern plus the actual sf0.001 corpus
census, and requires equality of every trained parameter and every
per-pattern posterior. Any drift in the Python twin (overflow,
floor-vs-truncate, term ordering) fails here before it can reach an
oracle run.
"""

from __future__ import annotations

import pytest

from polla_spark.functions import linkage as LK

# (g1..g4, c) censuses: all 16 patterns uniform; skewed counts with a
# dominant all-agree pattern; a sparse 3-pattern census; a census with
# huge counts (exercises the DECIMAL(38,0) headroom argument).
CENSUSES = [
    [(g1, g2, g3, g4, 7) for g1 in (0, 1) for g2 in (0, 1)
     for g3 in (0, 1) for g4 in (0, 1)],
    [(1, 1, 1, 1, 900), (0, 0, 0, 0, 90_000), (1, 0, 1, 0, 3),
     (0, 1, 0, 1, 41)],
    [(0, 0, 0, 0, 1), (1, 1, 1, 1, 1), (1, 0, 0, 1, 1)],
    [(1, 1, 1, 1, 10**12), (0, 0, 0, 0, 10**13), (0, 1, 1, 0, 10**9)],
]


def _spark_reference(spark, rows, rounds):
    from pyspark.sql import functions as F

    census = spark.createDataFrame(
        rows, "g1 long, g2 long, g3 long, g4 long, c long"
    )
    frames = [LK.fs_init_params(spark)]
    for _ in range(rounds):
        frames.append(LK.fs_em_round(census, frames[-1]))
    params = [f.collect()[0].asDict() for f in frames]
    post = (
        census.crossJoin(F.broadcast(frames[-1]))
        .select("g1", "g2", "g3", "g4",
                F.expr(LK.fs_posterior_expr()).alias("w_ppm"))
        .collect()
    )
    return params, {
        (r["g1"], r["g2"], r["g3"], r["g4"]): r["w_ppm"] for r in post
    }


@pytest.mark.parametrize("census", CENSUSES, ids=range(len(CENSUSES)))
def test_python_em_matches_spark_expression_form(spark, census):
    ref_params, ref_post = _spark_reference(spark, census, rounds=2)
    py_params = LK.fs_em_params_py(census, rounds=2)
    assert len(py_params) == len(ref_params)
    for ref, py in zip(ref_params, py_params):
        for col in LK.fs_param_cols():
            assert py[col] == ref[col], (col, ref, py)
    r2 = py_params[-1]
    for row in census:
        gs = tuple(row[:4])
        assert LK.fs_posterior_ppm_py(gs, r2) == ref_post[gs], gs


def test_python_em_matches_on_corpus_census(spark):
    """Same pin over the real sf0.001 SNM census (the exact input the
    FS query family feeds the kernel)."""
    from tests.conftest import SF_SMOKE
    from polla_spark.plans.llmdata import _fs_census, _fs_neighbors

    rows = [
        tuple(r) for r in _fs_census(_fs_neighbors(spark, SF_SMOKE)).collect()
    ]
    ref_params, ref_post = _spark_reference(spark, rows, rounds=2)
    py_params = LK.fs_em_params_py(rows, rounds=2)
    for ref, py in zip(ref_params, py_params):
        for col in LK.fs_param_cols():
            assert py[col] == ref[col]
    r2 = py_params[-1]
    for row in rows:
        gs = tuple(row[:4])
        assert LK.fs_posterior_ppm_py(gs, r2) == ref_post[gs]
