"""Shared month-grain trend algebra: ONE source of truth for the
batch plan (q122) and its streaming twin
(``streaming/windows.monthly_revenue_partials`` /
``finish_monthly_growth``) — the ``functions/events.py`` /
``functions/histogram.py`` drift-killing pattern.

The kernel: period-over-period growth where the only data-sized stage
is a mergeable partial agg to month grain; the ``lag`` window runs on
the ~months-sized report (a months-sized single partition is the
correct plan, not a smell)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def monthly_census(orders: DataFrame) -> DataFrame:
    """Month-grain revenue census in exact integer cents. Mergeable —
    identical as a batch partial agg and as a streaming update-mode
    aggregation (cent sums are non-negative, so they grow
    monotonically across micro-batches)."""
    return orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        )
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
            "revenue_cents"
        )
    )


def growth_report(monthly: DataFrame) -> DataFrame:
    """Month-over-month growth over the month-grain census — the q122
    report shape. First month has no predecessor -> NULL."""
    w = Window.orderBy("month")
    prev = F.lag("revenue_cents").over(w)
    growth = F.round(
        (F.col("revenue_cents") - prev).cast("double")
        / prev.cast("double")
        * 100.0,
        4,
    )
    return (
        monthly.withColumn("growth_pct", growth)
        .select("month", "revenue_cents", "growth_pct")
        .orderBy("month")
    )
