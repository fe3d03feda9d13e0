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


@dataclass(frozen=True)
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    doc: str = ""


def registry() -> dict[str, Query]:
    """All declared queries, keyed by name (assembled lazily so heavy
    modules import only when the inventory is requested).

    Order ROUND-ROBINS across the family modules (relational,
    consensus, llm-data, windows/streaming) rather than concatenating
    them: the driver's correctness sweep runs in registry order under
    a time budget, so an interleaved order guarantees any truncated
    sweep still samples every family instead of grading one module
    and skipping the rest.
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
    return out
