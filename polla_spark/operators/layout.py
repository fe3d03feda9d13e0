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


def _spread16(x):
    """Spread the low 16 bits of a long column to the even bit
    positions (0, 2, 4, …, 30) — the classic Morton-encoding bit
    dilation via shift/mask rounds, all JVM-side integer ops."""
    from pyspark.sql import functions as F

    for shift, mask in (
        (8, 0x00FF00FF),
        (4, 0x0F0F0F0F),
        (2, 0x33333333),
        (1, 0x55555555),
    ):
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a, b, a_min: float, a_max: float, b_min: float, b_max: float):
    """32-bit Morton (Z-curve) key interleaving two columns, each
    rank-quantized to 16 bits against its [min, max] span. Pure
    integer/bit expressions — stays inside whole-stage codegen."""
    from pyspark.sql import functions as F

    def quant(c, mn, mx):
        span = max(mx - mn, 1e-300)
        q = F.floor((c.cast("double") - F.lit(mn)) / F.lit(span) * 65535.0)
        # greatest/least skip NULL args, so a NULL cluster value would
        # otherwise land at bucket 65535 (the max corner). Pin NULLs to
        # bucket 0 instead — a documented, deterministic NULL corner.
        q = F.coalesce(q, F.lit(0))
        return F.greatest(F.lit(0), F.least(F.lit(65535), q)).cast("long")

    return _spread16(quant(a, a_min, a_max)).bitwiseOR(
        F.shiftleft(_spread16(quant(b, b_min, b_max)), 1)
    )


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    n_files: int = 4,
    block_bytes: int = DEFAULT_BLOCK_BYTES,
) -> None:
    """Write ``df`` Z-ORDER clustered on two columns — the
    multi-dimensional generalisation of :func:`write_clustered`
    (Delta/Iceberg's ``OPTIMIZE ZORDER BY``): interleave the bits of
    both rank-quantized keys into one Morton key, then range-cluster
    on it. A linear sort gives perfect row-group disjointness on its
    ONE leading column and none on the other; the Z-curve trades a
    little of that single-column pruning for substantial min/max
    pruning on BOTH columns — the layout for tables filtered on
    either of two independent dimensions (tenant+time, user+date).

    Quantization bounds come from one driver-side min/max aggregate
    (4 scalars — bounded at any table size, the same recipe as IVF's
    sample fit). The one-time layout cost is a single range exchange,
    identical to :func:`write_clustered`.
    """
    from pyspark.sql import functions as F

    if len(cols) != 2:
        raise ValueError("write_zorder clusters exactly two columns")
    a, b = cols
    st = df.agg(
        F.min(F.col(a).cast("double")).alias("amn"),
        F.max(F.col(a).cast("double")).alias("amx"),
        F.min(F.col(b).cast("double")).alias("bmn"),
        F.max(F.col(b).cast("double")).alias("bmx"),
    ).collect()[0]
    if st["amn"] is None or st["bmn"] is None:
        raise ValueError(
            "write_zorder: cluster column(s) "
            f"{[c for c, v in ((a, st['amn']), (b, st['bmn'])) if v is None]} "
            "are empty or all-NULL — no min/max span to quantize against"
        )
    z = zorder_key(
        F.col(a), F.col(b), st["amn"], st["amx"], st["bmn"], st["bmx"]
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .select(*df.columns)
        .write.option("parquet.block.size", str(block_bytes))
        .mode("overwrite")
        .parquet(path)
    )
