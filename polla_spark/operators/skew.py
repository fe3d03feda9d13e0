"""Skew-handling operators: salted two-stage aggregation and hot-key
split join.

At 100 TB a handful of hot keys (one viral document source, one
mega-customer) turns a single reducer into the job's critical path.
AQE's skew-join handling covers sort-merge joins; these helpers cover
the two shapes AQE does not rewrite for you:

- **salted aggregation**: group on ``(keys, salt)`` first so the hot
  key's rows spread over ``buckets`` reducers, then merge the partial
  results — the classic two-stage rewrite, valid for algebraic
  aggregates (count/sum/min/max);
- **hot-key split join**: route the declared hot keys through a
  broadcast join (no shuffle of their fact rows at all) and the long
  tail through the regular shuffle join, then union.

Semantics-preserving by construction: results are identical to the
naive plan (q39's oracle is the plain GROUP BY), only the exchange
layout changes. Salt is ``xxhash64`` of the row's key+payload columns
— deterministic across retries, uniform across buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: Column,
    *,
    buckets: int = 16,
    value_alias: str = "total",
    count_alias: str = "n",
) -> DataFrame:
    """Two-stage skew-safe ``groupBy(keys).agg(sum(value), count(*))``.

    Stage 1 groups on ``(keys, salt)`` — each hot key fans out over
    ``buckets`` reducers; stage 2 merges ``buckets`` partial rows per
    key. Use decimal/long ``value`` for bit-identical results
    regardless of which bucket each row landed in.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(F.sum(value).alias("_psum"), F.count("*").alias("_pcnt"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").alias(value_alias), F.sum("_pcnt").alias(count_alias)
    )


def hot_key_split_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
    *,
    how: str = "inner",
) -> DataFrame:
    """Join where ``hot_keys``' fact rows never shuffle: they take a
    broadcast join against the (filtered, tiny) dim slice; the long
    tail takes the normal shuffle join. Results == plain join.

    Both sides are partitioned by hot-vs-cold key membership (null
    keys route cold), so every key lives in exactly one branch and the
    union is the plain join's row set for every ``how`` — including
    right/full outer, where an unsplit dim side would re-emit hot dim
    rows as unmatched nulls from the cold branch.

    ``hot_keys`` come from the caller (pipeline stats, a prior
    ``approx_count_distinct``/top-k pass, or domain knowledge).
    """
    hot = [F.lit(k) for k in hot_keys]
    is_hot = F.col(key).isin(*hot)
    is_cold = ~is_hot | F.col(key).isNull()
    fact_hot = fact.filter(is_hot)
    fact_cold = fact.filter(is_cold)
    dim_hot = dim.filter(is_hot)
    dim_cold = dim.filter(is_cold)
    joined_hot = fact_hot.join(F.broadcast(dim_hot), key, how)
    joined_cold = fact_cold.join(dim_cold, key, how)
    return joined_hot.unionByName(joined_cold)
