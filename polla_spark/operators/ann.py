"""IVF-style physical layout for approximate-nearest-neighbor search.

``q64_ann_hyperplane_lsh`` (plans/llmdata.py) is the LOGICAL
bucketed-ANN plan — hyperplane-LSH code as the coarse quantizer, exact
cosine rescore inside the probed cell. This module is the STORAGE
half: write the corpus parquet-partitioned by its code so a probe
reads 1/2^n_planes of the data through directory pruning instead of
scanning everything. At 100 TB that is the difference between a full
scan per query batch and touching only the cells the queries land in.

Two physical details matter:

- Partition VALUES become directory names and are type-inferred on
  read: a bitstring code like "00111011" silently collapses to the
  int 111011 and collides with "0111011". The stored key is therefore
  prefixed ("c" + code) so it stays a string.
- The probe filters with a literal IN-list of the query batch's codes
  (collected driver-side — bounded by the number of queries, not the
  corpus), which gives STATIC partition pruning visible in the plan's
  ``PartitionFilters``; no join is needed to select cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.llmdata import _CODE_SPARK, _dot
from ..sources.io import write_parquet


def with_code(embeddings: DataFrame) -> DataFrame:
    """Attach the string-safe partition code to an embeddings frame
    (requires an ``embedding`` array<float/double> column)."""
    return embeddings.withColumn("code", F.concat(F.lit("c"), F.expr(_CODE_SPARK)))


def write_ivf_index(embeddings: DataFrame, path: str) -> None:
    """Materialize the corpus partitioned by LSH cell (the IVF index)."""
    write_parquet(with_code(embeddings), path, partition_by=["code"])


def hamming_neighbors(code: str, radius: int = 1) -> list[str]:
    """The stored code plus every code within Hamming distance
    ``radius`` (single-bit flips for radius 1) — the multi-probe set.
    A vector whose true nearest cell was narrowly missed by one
    hyperplane sign lands in exactly such a neighbor cell, so probing
    them recovers most of the recall an LSH quantizer loses."""
    bits = code[1:]  # strip the "c" string-safety prefix
    out = [code]
    if radius >= 1:
        for i in range(len(bits)):
            flipped = bits[:i] + ("1" if bits[i] == "0" else "0") + bits[i + 1:]
            out.append("c" + flipped)
    return out


def probe_ivf(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 3,
    *,
    probe_radius: int = 0,
) -> DataFrame:
    """Top-k cosine neighbors per query, reading only the probed cells.

    ``queries`` needs (``vec_id``, ``embedding``). Returns
    (query_id, rn, vec_id, cosine) with the same deterministic
    ordering contract as q64 (cosine DESC, vec_id ASC tiebreak).

    ``probe_radius=0`` probes each query's own cell; ``1`` adds its
    8 Hamming-1 neighbor cells (multi-probe) — higher recall for
    9/2^n_planes of the corpus read instead of 1/2^n_planes, still
    directory-pruned. The expansion is driver-side and bounded by the
    query-batch size, never the corpus; each corpus vector lives in
    exactly one cell, so no candidate pair is scored twice.
    """
    q = with_code(queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "code"
    )
    base_codes = [r["code"] for r in q.select("code").distinct().collect()]
    expansion = sorted(
        {(c, n) for c in base_codes for n in hamming_neighbors(c, probe_radius)}
    )
    probe_map = spark.createDataFrame(expansion, "code string, probe_code string")
    q = (
        q.join(F.broadcast(probe_map), "code")
        .drop("code")
        .withColumnRenamed("probe_code", "code")
    )
    codes = sorted({n for _, n in expansion})
    cells = spark.read.parquet(index_path).filter(F.col("code").isin(codes))
    cand = cells.join(F.broadcast(q), "code").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    scored = cand.select("query_id", "vec_id", F.round(cos, 4).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "rn", "vec_id", "cosine")
        .orderBy("query_id", "rn")
    )
