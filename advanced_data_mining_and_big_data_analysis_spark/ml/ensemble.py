"""Ensemble builders (SURVEY §2.10).

- hybrid_grid: the reference's cartesian model grid — 4 linear × 3 boosted
  = 12 BoostedHybrid estimators (kaggle.py:769-778) — generalized.
- mean_blend / median_blend: fold-prediction combiners (kaggle.py:814,
  847-851); median via the same sorted-array expression as
  functions/scalar.better_than_median.
"""

from __future__ import annotations

from pyspark.ml import Estimator
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .boosted_hybrid import BoostedHybrid


def hybrid_grid(
    linear_stages: list[Estimator],
    boosted_stages: list[Estimator],
    label_col: str = "label",
    log_target: bool = True,
) -> list[BoostedHybrid]:
    """Cartesian grid of residual hybrids, one per (linear, boosted) pair."""
    return [
        BoostedHybrid(
            model_1=lin.copy(),
            model_2=boo.copy(),
            label_col=label_col,
            log_target=log_target,
        )
        for lin in linear_stages
        for boo in boosted_stages
    ]


def external_boosted_stages(features_col: str = "features2", seed: int = 42) -> list[Estimator]:
    """Distributed equivalents of the reference's boosted residual stages
    (kaggle.py:720-767: XGBRegressor / LGBMRegressor / CatBoostRegressor),
    wired when their Spark packages are importable.

    This container ships neither xgboost nor synapse.ml, so the hybrid
    grid substitutes GBTRegressor (documented deviation, SURVEY §7c) and
    this returns [] here; on a cluster with the libs installed the grid
    picks them up automatically and closes the parity gap. CatBoost has
    no Spark estimator — its slot stays with GBTRegressor everywhere."""
    stages: list[Estimator] = []
    try:
        from xgboost.spark import SparkXGBRegressor  # noqa: PLC0415

        stages.append(
            SparkXGBRegressor(
                features_col=features_col,
                max_depth=5,
                n_estimators=100,
                random_state=seed,
            )
        )
    except ImportError:
        pass
    try:
        from synapse.ml.lightgbm import LightGBMRegressor  # noqa: PLC0415

        stages.append(
            LightGBMRegressor(featuresCol=features_col, numIterations=100, seed=seed)
        )
    except ImportError:
        pass
    return stages


def _preds_array(pred_cols: list[str]) -> Column:
    return F.array(*[F.col(c).cast("double") for c in pred_cols])


def mean_blend(df: DataFrame, pred_cols: list[str], out_col: str = "prediction") -> DataFrame:
    """Soft-vote mean of prediction columns (kaggle.py:814)."""
    arr = _preds_array(pred_cols)
    mean = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x) / len(pred_cols)
    return df.withColumn(out_col, mean)


def median_blend(df: DataFrame, pred_cols: list[str], out_col: str = "prediction") -> DataFrame:
    """Row-wise median of prediction columns (kaggle.py:847-851)."""
    arr = F.array_sort(_preds_array(pred_cols))
    n = len(pred_cols)
    if n % 2 == 1:
        med = F.element_at(arr, n // 2 + 1)
    else:
        med = (F.element_at(arr, n // 2) + F.element_at(arr, n // 2 + 1)) / 2.0
    return df.withColumn(out_col, med)
