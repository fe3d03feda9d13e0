"""Normalized physical-plan skeletons — golden-snapshot support.

The targeted plan pins (tests/test_plan_shapes.py) assert specific
properties (exchange counts, no-cartesian, pushed filters) per query;
a Spark upgrade or refactor that silently loses an UNASSERTED property
(a broadcast flipping to sort-merge, a new exchange) would only show
up as bench drift. The golden snapshots close that gap: the normalized
operator TREE of the ``formatted`` explain — node names + structure,
stripped of everything run-dependent (expression ids, paths, stats,
codegen stage ids) — is committed under tests/goldens/plans/ and
diffed in CI (tests/test_plan_goldens.py). Regenerate after an
intentional plan change with ``python scripts/gen_plan_goldens.py``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_skeleton(df: DataFrame) -> str:
    """The physical-plan operator tree of ``df``, normalized to be
    stable across runs: only the tree section of
    ``explain('formatted')`` (node name + tree position per line),
    with codegen-stage ids and any parenthesized operator numbers
    kept (they change only when the tree changes) but expression
    ids / paths / statistics never included (the tree section does
    not carry them)."""
    full = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[operator]
        df._jdf.queryExecution(), "formatted"
    )
    lines = []
    for line in full.splitlines():
        if line.startswith("== Physical Plan =="):
            continue
        if not line.strip():  # blank line ends the tree section
            break
        lines.append(line.rstrip())
    text = "\n".join(lines)
    # normalize the few run-dependent tokens that CAN appear in tree
    # lines: codegen stage ids, cached-plan hex ids, and the
    # Statistics(...) annotations a materialized AQE cache embeds in
    # its final-plan rendering (broadcast size estimates vary with JVM
    # memory state run to run)
    text = re.sub(r"codegen id : \d+", "codegen id : N", text)
    text = re.sub(r"\[plan_id=\d+\]", "[plan_id=N]", text)
    text = re.sub(r", Statistics\([^)]*\)", "", text)
    return text + "\n"
