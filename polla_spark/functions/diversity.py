"""Shared Simpson-diversity semantics (batch q186 ≡ its streaming
twin — the one-source-of-truth pattern of functions/quality.py /
histogram.py / bloom.py).

The (doc_id, ch) character census is a plain count — merge-closed
across any micro-batch cut — and the report (Σc², n, ppm diversity,
least-diverse top-15) runs over the census, so streaming needs no
extra machinery: census partials in update mode, max-collapse +
report at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_census(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → per-(doc_id, ch) counts. The explode fans a
    doc into its characters within-row; the census shuffle key is
    uniform."""
    d = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.col("ch") != "")
    return d.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))


def simpson_report(census: DataFrame) -> DataFrame:
    """Census → the 15 least-diverse docs with exact integer Σc²/n²
    arithmetic (diversity in ppm, floor division — no transcendental
    math, identical in both engines and both execution modes)."""
    per_doc = census.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
    )
    div_ppm = F.expr("1000000 - (1000000 * sum_c2) div (n_chars * n_chars)")
    return (
        per_doc.withColumn("diversity_ppm", div_ppm)
        .orderBy("diversity_ppm", "doc_id")
        .limit(15)
        .select("doc_id", "n_chars", "sum_c2", "diversity_ppm")
    )
