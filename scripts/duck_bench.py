"""DuckDB yardstick for bench.py: run the HEADLINE queries' ORACLE SQL
on the same parquet at the same scale factor and time them the same way
(median of $SPARK_GRAFT_BENCH_REPS, full materialization).

The reference publishes no comparable throughput numbers (BASELINE.md),
so the identical-SQL-identical-data DuckDB run is the only same-workload
baseline available; bench.py's total / this total = how Spark's plans
compare to a native vectorized single-node engine on the same answers.

Queries whose semantics are not SQL-expressible in one statement (none
of HEADLINE today) or whose oracle is None are skipped and listed.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/duck_bench.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, SF_DIR  # noqa: E402
from polla_spark.plans import registry  # noqa: E402

REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    reg = registry()
    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count()}")
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    times: dict[str, float] = {}
    skipped: list[str] = []
    total = 0.0
    for name in HEADLINE:
        sql = reg[name].oracle
        if sql is None:
            skipped.append(name)
            continue
        reps: list[float] = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            reps.append(time.perf_counter() - t0)
            # one rep is evidence enough past a minute (q67's recursive
            # CTE runs 10+ min at sf0.1) — medians matter for ±30% VM
            # noise, which is negligible at that magnitude
            if reps[-1] > 60:
                break
        med = statistics.median(reps)
        times[name] = round(med, 3)
        total += med
        print(f"# {name}: median {med:.2f}s of {[round(r, 2) for r in reps]}",
              file=sys.stderr)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "skipped": skipped,
                "reps": REPS,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
