"""Cross-validation utilities (SURVEY §2.10 K-fold / time-series CV).

The reference uses sklearn ``cross_validate`` and (commented)
``TimeSeriesSplit`` (kaggle.py:559-572, 577). Spark's CrossValidator covers
random K-fold; time-ordered data needs expanding-window splits — each fold
trains on everything before a cutoff and validates on the next window,
which is exactly the reference's date-literal slicing generalized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Estimator
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import metrics as M


@dataclass(frozen=True)
class TimeSplit:
    train_end: str  # inclusive
    valid_start: str
    valid_end: str  # inclusive


def expanding_window_splits(boundaries: list[tuple[str, str, str]]) -> list[TimeSplit]:
    return [TimeSplit(*b) for b in boundaries]


def time_series_cross_validate(
    df: DataFrame,
    estimator: Estimator,
    splits: list[TimeSplit],
    date_col: str = "date",
    label_col: str = "label",
    prediction_col: str = "prediction",
    metric: str = "smape",
) -> list[dict]:
    """Fit/evaluate the estimator per expanding-window split; returns one
    dict per split with the chosen metric. Folds are independent Spark
    jobs — on a cluster they parallelize by submitting from threads, the
    same way CrossValidator(parallelism=k) does."""
    metric_fns = {"smape": M.smape, "mae": M.mae, "rmse": M.rmse}
    fn = metric_fns[metric]
    results = []
    for s in splits:
        train = df.filter(F.col(date_col) <= F.lit(s.train_end))
        valid = df.filter(F.col(date_col).between(F.lit(s.valid_start), F.lit(s.valid_end)))
        model = estimator.copy().fit(train)
        scored = model.transform(valid)
        value = scored.agg(fn(label_col, prediction_col).alias("m")).collect()[0]["m"]
        results.append(
            {"train_end": s.train_end, "valid_start": s.valid_start, "valid_end": s.valid_end,
             metric: value}
        )
    return results
