"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship plan (the reference's consensus
kernel at table scale) on sf0.001; ``queries()``/``oracle_sql()``
expose the full declared inventory from polla_spark.plans — one entry
per operator family in SURVEY.md §2.6, each with a DuckDB oracle
unless marked rows-only.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _configure(spark: SparkSession) -> SparkSession:
    """Apply session settings the plans rely on (UTC, nanos-as-long)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # driver may run queries with its own session; read_table copes
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: majority-vote consensus + decision over sf0.001."""
    from polla_spark.plans.consensus_q import q44_consensus_decision

    return q44_consensus_decision(_configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from polla_spark.plans import registry

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in registry().items():
        def runner(spark: SparkSession, sf_dir: str, _q=q) -> DataFrame:
            return _q.spark(_configure(spark), sf_dir)

        out[name] = runner
    return out


def oracle_sql() -> dict[str, str]:
    from polla_spark.plans import registry

    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
