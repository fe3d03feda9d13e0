"""Declared query inventory: every operator family from SURVEY.md §2.6.

Each :class:`Query` pairs a Spark DataFrame plan with the ANSI-SQL
oracle DuckDB runs over the same parquet tables. Determinism rules
(SURVEY.md §2.6 notes):

- money/double aggregates go through exact arithmetic (DECIMAL
  intermediates, or floor-quantized BIGINT for float columns) so the
  result is identical regardless of row order or engine;
- every collected list is explicitly sorted; every top-k has a unique
  tie-break key; timestamps are emitted as formatted strings/dates;
- column names are identical on both sides (the driver sorts columns
  by name and hashes values).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


# Declared inventory size. MUST be bumped in the SAME commit that adds
# queries to any family module — tests/test_registry.py pins
# len(registry()) == DECLARED_QUERY_COUNT so an addition that forgets
# the bump (or a bump without queries) fails fast instead of silently
# shipping an undeclared inventory.
# NOTE: query ids span q01–q176 with q139 intentionally unassigned
# (a numbering skip from round 3, not a dropped query) — hence 175
# registered queries over a 176-wide id range.
DECLARED_QUERY_COUNT = 175

# Rows-only queries: implemented but intentionally without a SQL
# oracle (non-SQL-expressible semantics). Everything else must pair
# with an ANSI-SQL oracle string.
ROWS_ONLY_QUERIES = frozenset({"q38_approx_count_distinct"})


@dataclass(frozen=True)
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    doc: str = ""


def _driver_certified() -> frozenset[str]:
    """Query names with a green row in any ``CORRECTNESS_r*.json`` the
    driver has written at the repo root. Used only to ORDER the
    registry (uncertified first) — correctness itself is unaffected."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and (
                row.get("hash_match") or row.get("rows_match")
            ):
                names.add(name)
    return frozenset(names)


def registry() -> dict[str, Query]:
    """All declared queries, keyed by name (assembled lazily so heavy
    modules import only when the inventory is requested).

    Ordering serves the driver's TIME-BUDGETED correctness sweep
    (~50 queries/round, run in registry order):

    1. Base order ROUND-ROBINS across the family modules (relational,
       consensus, llm-data, windows/streaming) rather than
       concatenating them, so any truncated sweep samples every
       family instead of grading one module and skipping the rest.
    2. A stable partition then moves queries WITHOUT a green row in
       any driver ``CORRECTNESS_r*.json`` to the front: each round
       the sweep certifies fresh queries first, so coverage rotates
       toward 115/115 driver-certified with zero manual upkeep.
       (Once everything is certified this is a no-op and the order
       degenerates to the plain round-robin.)
    """
    from itertools import zip_longest

    from . import consensus_q, llmdata, relational, windows_q

    out: dict[str, Query] = {}
    lists = [list(m.QUERIES) for m in (relational, consensus_q, llmdata, windows_q)]
    for group in zip_longest(*lists):
        for q in group:
            if q is None:
                continue
            if q.name in out:
                raise ValueError(f"duplicate query name: {q.name}")
            out[q.name] = q
    certified = _driver_certified()
    ordered = sorted(out.values(), key=lambda q: q.name in certified)  # stable
    return {q.name: q for q in ordered}
