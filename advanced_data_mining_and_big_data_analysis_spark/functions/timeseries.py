"""Spectral / series diagnostics (SURVEY §2.5 periodogram row).

The reference calls scipy.signal.periodogram on a pandas series
(kaggle.py:145-176) — a driver-side diagnostic. The engine form is a
relational DFT: the input is a DAILY aggregate (one row per day, bounded
by the calendar at any data scale), the frequency set is small and
broadcast, and each spectral power is two partial aggregates
(sum x*cos, sum x*sin) — shuffle-on-frequency-key, no collect, no UDF.

Cost model at 100 TB: the raw fact table reduces to the daily series in
one map-side-combined aggregation; the DFT itself runs on
n_days x n_freqs rows (thousands), which is noise.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def periodogram(
    daily: DataFrame,
    value_col: str,
    order_col: str,
    num_freqs: int = 10,
) -> DataFrame:
    """Power spectrum of a (bounded) series at harmonics k = 1..num_freqs.

    ``daily`` must be one row per time step (e.g. a per-day rollup).
    Returns (k, period_steps, power_norm): power at frequency k cycles
    per full series, normalized by n * variance so the result is
    unitless and comparable across series.

    The unpartitioned row_number window is safe for the same reason as
    q74: its input is the calendar-bounded rollup, never raw data.
    """
    n_and_mean = daily.agg(
        F.count(F.lit(1)).alias("_n"), F.avg(value_col).alias("_mean"),
        F.var_pop(value_col).alias("_var"),
    )
    w = W.orderBy(order_col)
    indexed = (
        daily.withColumn("_t", F.row_number().over(w) - 1)
        .crossJoin(F.broadcast(n_and_mean))
        .withColumn("_x", F.col(value_col) - F.col("_mean"))
    )
    freqs = daily.sparkSession.range(1, num_freqs + 1).select(F.col("id").alias("k"))
    theta = 2.0 * math.pi * F.col("k") * F.col("_t") / F.col("_n")
    return (
        indexed.crossJoin(F.broadcast(freqs))
        .groupBy("k")
        .agg(
            (
                (F.pow(F.sum(F.col("_x") * F.cos(theta)), 2)
                 + F.pow(F.sum(F.col("_x") * F.sin(theta)), 2))
                / (F.first("_n") * F.first("_n") * F.first("_var"))
            ).alias("power_norm"),
            F.round(F.first("_n") / F.col("k"), 2).alias("period_steps"),
        )
        .select("k", "period_steps", F.round("power_norm", 6).alias("power_norm"))
        .orderBy("k")
    )
