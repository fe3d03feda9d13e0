"""Grouped-aggregate pandas UDAF surface (Spark's Python UDAF form).

The reference has no UDAF surface — its extensibility point is the
``SOURCE_LOADERS`` registry (``polla_app/pipeline.py:582-588``) — so
the engine exposes Spark's native one: an Arrow-batched GROUPED_AGG
``pandas_udf``. The kernel here (exact lower weighted median) is the
prototype twin of the NATIVE histogram plan in
``plans/relational.q140_weighted_median`` — the same contract as
``functions/chunking.py``'s UDTF-vs-native pair: the UDAF is the
extensibility example, the native plan the production path (JVM-side
mergeable partials, no per-group Python sort, no Arrow transfer of
every group's values).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def weighted_median_udaf(values: pd.Series, weights: pd.Series) -> int:
    """Exact lower weighted median: the smallest value whose cumulative
    weight reaches half the total (``2*cum >= total``) — nearest-rank,
    integer-exact, matching the histogram plan bit-for-bit."""
    df = pd.DataFrame({"v": values, "w": weights}).sort_values("v")
    cum = df["w"].cumsum()
    total = int(df["w"].sum())
    return int(df.loc[2 * cum >= total, "v"].iloc[0])
