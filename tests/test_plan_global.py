"""Registry-WIDE physical-plan invariants — the per-query pins in
test_plan_shapes.py guard specific shapes; this sweep guards every
query, present and future, against the two unconditional scale
killers:

- ``CartesianProduct``: an all-pairs operator anywhere in a declared
  plan means the query cannot survive a 100x scale-up. (Bounded
  ``BroadcastNestedLoopJoin`` against a broadcast-tiny side is
  deliberately allowed — q58/q77/q135 pin it as the INTENDED shape.)
- ``BatchEvalPython`` / ``EvalPython`` without Arrow: a row-at-a-time
  Python UDF in a hot path is the ~10-100x slow path; every Python
  boundary in this engine must be Arrow-batched (``ArrowEvalPython``,
  ``mapInPandas``, ``FlatMapGroupsInPandas``).
"""

from __future__ import annotations

import pytest

from polla_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def all_plans(spark):
    out = {}
    for name, q in registry().items():
        out[name] = (
            q.spark(spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
    return out


def test_no_query_plans_a_cartesian_product(all_plans):
    flagged = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert flagged == [], flagged


def test_no_query_uses_row_at_a_time_python(all_plans):
    # BatchEvalPython = pickled row-at-a-time UDF; ArrowEvalPython and
    # the pandas group/map operators are the sanctioned boundaries
    flagged = [n for n, p in all_plans.items() if "BatchEvalPython" in p]
    assert flagged == [], flagged
