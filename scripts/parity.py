"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every Query in the registry on Spark and DuckDB at sf0.01 and
compares row count, column names, and exact values (order-insensitive).

Usage: python scripts/parity.py [name_substring ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from polla_spark.plans import registry  # noqa: E402
from polla_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything for an engine-neutral exact compare
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: _norm(v))
    out = out.sort_values(list(out.columns)).reset_index(drop=True)
    return out


def _norm(v) -> str:
    if v is None or v != v:  # NaN/None
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def main() -> int:
    subs = sys.argv[1:]
    reg = registry()
    if subs == ["--uncertified"]:
        # exactly the tier the driver's budgeted sweep certifies next
        from polla_spark.plans import _driver_certified

        cert = _driver_certified()
        names = [n for n in reg if n not in cert]
    else:
        names = [n for n in reg if not subs or any(s in n for s in subs)]
    spark = get_spark("parity", cpus=8)
    con = duck_con()
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        q = reg[name]
        t0 = time.time()
        try:
            sdf = q.spark(spark, SF_DIR).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: SPARK ERROR {type(exc).__name__}: {str(exc)[:300]}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(q.oracle).df()
        except Exception as exc:
            print(f"FAIL  {name}: DUCKDB ERROR {type(exc).__name__}: {str(exc)[:300]}")
            n_fail += 1
            continue
        a, b = canon(sdf), canon(odf)
        dt = time.time() - t0
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL  {name}: value mismatch ({int(diff.sum())}/{len(a)} rows differ)")
            for i in idx:
                print(f"      spark : {a.loc[i].to_dict()}")
                print(f"      oracle: {b.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(a)} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
