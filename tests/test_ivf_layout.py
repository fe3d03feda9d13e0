"""Physical IVF layout for ANN: corpus written partitioned by
hyperplane-LSH code; a query probes ONE partition (directory pruning
visible via inputFiles). This is the storage half of q64's logical
plan — at 100 TB the probe reads 1/2^n_planes of the data.

Gotcha pinned here: directory-partition VALUES are type-inferred on
read, so a bitstring code like "00111011" silently becomes the int
111011 — and distinct codes ("00111011" vs "0111011") would collide.
Partition keys must be non-numeric: prefix them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polla_spark.plans.llmdata import _CODE_SPARK
from polla_spark.sources.io import write_parquet


def test_ann_partition_pruning(spark, tmp_path):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    coded = e.withColumn("code", F.concat(F.lit("c"), F.expr(_CODE_SPARK)))
    out = str(tmp_path / "ivf")
    write_parquet(coded, out, partition_by=["code"])

    q_code = coded.filter(F.col("vec_id") == 0).first()["code"]
    assert q_code.startswith("c")
    probe = spark.read.parquet(out).filter(F.col("code") == q_code)

    n_buckets = coded.select("code").distinct().count()
    assert n_buckets > 4  # the hyperplane space really fans out

    # directory pruning: the probe's scan reads ONLY the one partition.
    # (inputFiles() lists the pre-pruning relation, so assert on the files
    # actually touched at runtime via input_file_name.)
    files = [
        r["f"]
        for r in probe.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files and all(f"code={q_code}" in f for f in files)
    full_files = spark.read.parquet(out).inputFiles()
    assert len(files) < len(full_files)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and q_code in plan

    # the probe still finds the query vector itself
    assert probe.filter(F.col("vec_id") == 0).count() == 1
