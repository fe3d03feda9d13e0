"""Distributed scan/sink surface: Parquet + JSON/NDJSON with explicit
schemas (SURVEY.md §2.6 scan/sink family; reference S9-S11 semantics).

Production rules baked in:

- **never infer schemas** — every reader takes an explicit
  ``StructType`` (inference is a full extra pass over 100 TB and can
  silently flip types between runs);
- NDJSON reads are PERMISSIVE with a ``_corrupt_record`` column:
  blank/corrupt lines become data to count/quarantine, not task
  failures (reference pipeline.py:71-78 skip-with-warning semantics);
- parquet writes can bucket/partition so downstream joins co-locate
  without a shuffle (the write-side half of a shuffle-free plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-enforced NDJSON scan; corrupt lines dropped (or kept as
    a ``_corrupt_record`` column for quarantine accounting)."""
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_ndjson(df: DataFrame, path: str, *, partitions: int | None = None) -> None:
    """NDJSON sink. ``partitions`` controls output file count — at
    100 TB you want many files (one per task); for small artifact
    tables coalesce(1) gives the reference's single-file shape."""
    if partitions:
        df = df.coalesce(partitions)
    df.write.mode("overwrite").json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-enforced CSV scan (PERMISSIVE, corrupt rows dropped or
    kept for quarantine accounting — same contract as NDJSON)."""
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    df = (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_csv(
    df: DataFrame, path: str, *, header: bool = True, partitions: int | None = None
) -> None:
    """CSV sink (header on by default; doubles round-trip via Spark's
    shortest-round-trip float formatting)."""
    if partitions:
        df = df.coalesce(partitions)
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Parquet scan; optional schema assertion (parquet is
    self-describing, but pinning the schema catches silent drift
    between pipeline versions)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> None:
    """Parquet sink. ``partition_by`` = directory partitioning (enables
    partition pruning on read); ``sort_by`` = within-partition sort
    (better row-group min/max skipping for range predicates)."""
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan (the second columnar format after parquet — common in
    Hive-era warehouses a migration would read from); optional schema
    assertion against the self-described file schema."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> None:
    """ORC sink with the same layout controls as :func:`write_parquet`
    (directory partitioning + within-partition sort for stripe-level
    min/max skipping)."""
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    key: str,
    sort: bool = True,
) -> None:
    """Bucketed managed table: the write-side half of a shuffle-free
    join. Two tables bucketed on the same key with the same bucket
    count join with ZERO exchange — at 100 TB that turns the nightly
    fact-to-fact join from the dominant shuffle into a local merge.
    ``sort`` additionally orders within buckets so the join can be a
    sort-merge without the sort step."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
