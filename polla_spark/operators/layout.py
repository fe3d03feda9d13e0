"""Zone-map friendly physical layout: range-cluster a table on its
selective-scan key so parquet row-group min/max statistics prune I/O.

Parquet stores min/max per column per row group; readers (Spark's
vectorized reader, DuckDB, Trino) skip whole row groups whose range
cannot match a pushed predicate. That skipping is only effective if
the data is CLUSTERED: in an unsorted table every row group spans
nearly the full key range, so min/max never excludes anything and a
1% time-range query still reads 100% of the bytes. At 100 TB this
layout choice — not a query rewrite — decides whether a dashboard's
"last hour" filter reads gigabytes or the whole lake.

``write_clustered`` is the standard recipe (Delta/Iceberg call it
ZORDER/sort-order compaction for one key): global range partition on
the cluster key, sort within partitions, bounded row-group size so
each file holds many prunable groups. ``rowgroup_ranges`` reads the
written footers (pyarrow) so tests can PIN the physical property —
sorted layout ⇒ near-disjoint row-group ranges ⇒ a selective
predicate overlaps only ~selectivity of the groups, while the same
data written unsorted overlaps ~all of them.

The pruning itself is the file format + reader contract (PushedFilters
in the plan; row-group skipping in the parquet reader) — pinned in
tests/test_layout.py together with the range-disjointness that makes
it effective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_BLOCK_BYTES = 64 * 1024  # test-scale row groups; cluster: 128 MB


def write_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    n_files: int = 4,
    block_bytes: int = DEFAULT_BLOCK_BYTES,
) -> None:
    """Write ``df`` range-clustered on ``cols``: repartitionByRange
    (one exchange — the layout's one-time cost) + sortWithinPartitions
    so every row group covers a narrow, near-disjoint key range."""
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.option("parquet.block.size", str(block_bytes))
        .mode("overwrite")
        .parquet(path)
    )


def rowgroup_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` for every row group under ``path`` —
    read from the parquet footers, the exact statistics a pruning
    reader consults."""
    import glob

    import pyarrow.parquet as pq

    out: list[tuple] = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            out.append((st.min, st.max))
    return out


def overlap_fraction(ranges: list[tuple], lo, hi) -> float:
    """Fraction of row groups a reader must touch for ``[lo, hi]`` —
    the zone-map pruning effectiveness metric."""
    hit = sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))
    return hit / len(ranges) if ranges else 0.0
