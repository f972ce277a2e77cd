"""Metric aggregates as native Column expressions.

The reference computes SMAPE/MAE/RMSE with numpy on collected vectors
(kaggle/kaggle.py:109-144, 549-572); here they are distributed aggregate
expressions — partial+final combine for free, no data leaves executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def smape(y_true: Column | str, y_pred: Column | str) -> Column:
    """Symmetric MAPE in percent, 0-safe (kaggle.py:109-131):
    ``mean(|yt - yp| / ((|yt| + |yp|) / 200))`` with 0 where the
    denominator is 0."""
    yt = F.col(y_true) if isinstance(y_true, str) else y_true
    yp = F.col(y_pred) if isinstance(y_pred, str) else y_pred
    denom = (F.abs(yt) + F.abs(yp)) / 200.0
    term = F.when(denom == 0, F.lit(0.0)).otherwise(F.abs(yt - yp) / denom)
    return F.avg(term)


def mae(y_true: Column | str, y_pred: Column | str) -> Column:
    yt = F.col(y_true) if isinstance(y_true, str) else y_true
    yp = F.col(y_pred) if isinstance(y_pred, str) else y_pred
    return F.avg(F.abs(yt - yp))


def rmse(y_true: Column | str, y_pred: Column | str) -> Column:
    yt = F.col(y_true) if isinstance(y_true, str) else y_true
    yp = F.col(y_pred) if isinstance(y_pred, str) else y_pred
    return F.sqrt(F.avg((yt - yp) * (yt - yp)))


def find_min_smape(
    df: DataFrame,
    y_true: str,
    y_pred: str,
    weights_milli: tuple[int, int, int] = (970, 1020, 1),
) -> DataFrame:
    """Grid-search the scale factor minimizing SMAPE (kaggle.py:497-523).

    The reference loops ``np.arange`` on the driver; here the weight grid
    is a tiny broadcast-cross-joined dimension so all candidate scores
    aggregate in ONE distributed pass over the predictions, then argmin.
    Weights are integer millis to keep the grid exactly representable.
    Returns one row: (weight_milli, smape).
    """
    lo, hi, step = weights_milli
    grid = df.sparkSession.range(lo, hi + 1, step).select(F.col("id").alias("weight_milli"))
    scored = (
        df.select(F.col(y_true).alias("_yt"), F.col(y_pred).alias("_yp"))
        .crossJoin(F.broadcast(grid))
        .groupBy("weight_milli")
        .agg(smape(F.col("_yt"), F.col("_yp") * F.col("weight_milli") / 1000.0).alias("smape"))
    )
    return scored.orderBy("smape", "weight_milli").limit(1)
