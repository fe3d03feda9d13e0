"""Golden plan-skeleton snapshots for the 33 heaviest / most
plan-sensitive queries (and plan variants).

The targeted pins in test_plan_shapes.py assert SPECIFIC plan
properties; these goldens catch everything else — a broadcast
silently flipping to sort-merge after a Spark upgrade, an extra
exchange appearing after a refactor — by diffing the full normalized
operator tree (polla_spark/plans/skeleton.py) against a committed
snapshot. After an INTENTIONAL plan change, regenerate with

    python scripts/gen_plan_goldens.py [query ...]

and commit the diff — the point is that plan changes become VISIBLE
in review, not that they are forbidden."""

from __future__ import annotations

import os
from pathlib import Path

import pytest

GOLDEN_DIR = Path(__file__).parent / "goldens" / "plans"
SF = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def _golden_names() -> list[str]:
    return sorted(p.stem for p in GOLDEN_DIR.glob("*.txt"))


@pytest.mark.parametrize("name", _golden_names())
def test_plan_skeleton_matches_golden(spark, name):
    from polla_spark.plans import registry
    from polla_spark.plans.skeleton import plan_skeleton
    from scripts.gen_plan_goldens import extra_plans  # type: ignore

    build = extra_plans().get(name) or registry()[name].spark
    df = build(spark, SF)
    got = plan_skeleton(df)
    spark.catalog.clearCache()  # eager persists must not leak across
    want = (GOLDEN_DIR / f"{name}.txt").read_text()
    assert got == want, (
        f"{name}: physical-plan skeleton changed. If intentional, run "
        f"`python scripts/gen_plan_goldens.py {name}` and commit the diff.\n"
        f"--- golden ---\n{want}\n--- current ---\n{got}"
    )


def test_goldens_cover_the_declared_set():
    from scripts.gen_plan_goldens import GOLDEN_QUERIES  # type: ignore

    assert sorted(GOLDEN_QUERIES) == _golden_names()
    assert len(GOLDEN_QUERIES) == 51
