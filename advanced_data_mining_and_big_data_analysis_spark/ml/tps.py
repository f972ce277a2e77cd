"""End-to-end TPS-shaped pipeline (SURVEY §5 reference-domain regression).

Synthesizes a deterministic sales table with the exact shape of the Kaggle
TPS Jan-2022 train set the reference models (FIXTURES.md Group A:
date × {Finland,Norway,Sweden} × {KaggleMart,KaggleRama} ×
{Mug,Hat,Sticker}, seasonal + weekday + holiday + trend effects), runs the
reference's modeling recipe Spark-first — calendar/Fourier features →
feature pipelines → log-target BoostedHybrid — and evaluates SMAPE on a
2018 hold-out exactly like kaggle.py:701-714.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.ml.regression import GBTRegressor, LinearRegression
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import calendar as C
from ..functions import metrics as M
from .boosted_hybrid import BoostedHybrid
from .encoders import build_feature_pipeline

COUNTRIES = {"Finland": 0.9, "Norway": 1.15, "Sweden": 1.0}
STORES = {"KaggleMart": 1.0, "KaggleRama": 1.35}
PRODUCTS = {"Kaggle Mug": 300.0, "Kaggle Hat": 600.0, "Kaggle Sticker": 150.0}


def synthetic_sales(
    spark: SparkSession, start: str = "2015-01-01", end: str = "2018-12-31", seed: int = 42
) -> DataFrame:
    """Deterministic TPS-shaped table: num_sold = product base × country ×
    store × yearly seasonality × weekday lift × December spike × mild
    yearly trend × lognormal noise."""
    dates = pd.date_range(start, end, freq="D")
    rng = np.random.RandomState(seed)
    n = len(dates)
    doy = dates.dayofyear.values
    wd = dates.weekday.values
    year = dates.year.values
    season = 1.0 + 0.3 * np.sin(2 * np.pi * doy / 365.0) + 0.1 * np.cos(4 * np.pi * doy / 365.0)
    weekend = np.where(wd >= 5, 1.25, 1.0)
    december = np.where((dates.month.values == 12) & (dates.day.values >= 24), 1.6, 1.0)
    trend = 1.0 + 0.05 * (year - 2015)
    parts = []
    row_id = 0
    # columnar construction (a per-row python loop here costs more than
    # the whole model fit); rng draw order matches the original row form
    for country, cf in COUNTRIES.items():
        for store, sf_ in STORES.items():
            for product, base in PRODUCTS.items():
                noise = np.exp(rng.normal(0.0, 0.08, n))
                y = base * cf * sf_ * season * weekend * december * trend * noise
                parts.append(
                    pd.DataFrame(
                        {
                            "row_id": np.arange(row_id, row_id + n, dtype=np.int64),
                            "date": dates.date,
                            "country": country,
                            "store": store,
                            "product": product,
                            "num_sold": y.astype(np.float32).astype(np.float64),
                        }
                    )
                )
                row_id += n
    pdf = pd.concat(parts, ignore_index=True)
    return spark.createDataFrame(pdf)


def scale_out(df: DataFrame, replicas: int) -> DataFrame:
    """Scale the synthetic table by ``replicas`` DISTRIBUTED-side: cross
    join with a broadcast replica dim and perturb the target with a
    deterministic md5-derived jitter per (row, replica) — the driver
    never materializes the scaled frame, so the same code path generates
    the 100x bench input that a cluster would. row_id stays unique."""
    if replicas <= 1:
        return df
    spark = df.sparkSession
    rep = F.broadcast(spark.range(replicas).withColumnRenamed("id", "_replica"))
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("row_id").cast("string"), F.lit("#"), F.col("_replica"))),
                1,
                6,
            ),
            16,
            10,
        ).cast("double")
        / 16777216.0
    )
    return (
        df.crossJoin(rep)
        .withColumn("num_sold", F.col("num_sold") * (0.95 + 0.1 * frac))
        .withColumn("row_id", F.col("row_id") * replicas + F.col("_replica"))
        .drop("_replica")
    )


def engineer_features(df: DataFrame) -> DataFrame:
    """The reference's feature block (kaggle.py:193-331) via functions/calendar."""
    parts = C.calendar_parts("date")
    flags = C.weekday_flags("date")
    harmonics = C.fourier_doy("date", order=2)
    out = (
        df.withColumn("year", parts["year"].cast("double"))
        .withColumn("weekday", parts["weekday"].cast("double"))
        .withColumn("wd56", flags["wd56"].cast("double"))
        .withColumn("season", C.season("date"))
        .withColumn("dec_window", C.month_day_flag("date", 12, (24, 31)).cast("double"))
    )
    for name, expr in harmonics.items():
        out = out.withColumn(name, expr)
    return out


def run_tps_pipeline(
    spark: SparkSession,
    train_end: str = "2017-12-31",
    valid_start: str = "2018-01-01",
    gbt_iters: int = 20,
    replicas: int = 1,
) -> dict[str, float]:
    """Fit log-target BoostedHybrid on the time split; return metrics.
    ``replicas`` scales the training table distributed-side (bench knob)."""
    raw = scale_out(synthetic_sales(spark), replicas)
    # 26k rows: 8 partitions keep per-iteration task overhead (GBT runs
    # ~2 jobs/iteration) from dominating the fit at toy scale; at bench
    # scale, spread across the full parallelism instead
    data = engineer_features(raw)
    data = (
        data.coalesce(8)
        if replicas <= 1
        else data.repartition(spark.sparkContext.defaultParallelism)
    )

    linear_cols = ["sin1", "cos1", "sin2", "cos2", "year", "wd56", "dec_window"]
    feat1 = build_feature_pipeline(
        cat_cols=["country", "store", "product"],
        num_cols=linear_cols,
        output_col="features1",
        one_hot=True,
        scale=False,
    ).fit(data)
    feat2 = build_feature_pipeline(
        cat_cols=["country", "store", "product", "season"],
        num_cols=["weekday", "wd56", "dec_window", "year"],
        output_col="features2",
        one_hot=False,
        scale=False,
    ).fit(data)
    prepared = feat2.transform(feat1.transform(data)).cache()

    train = prepared.filter(F.col("date") <= F.lit(train_end))
    valid = prepared.filter(F.col("date") >= F.lit(valid_start))

    hybrid = BoostedHybrid(
        model_1=LinearRegression(featuresCol="features1", regParam=1e-4),
        model_2=GBTRegressor(featuresCol="features2", maxIter=gbt_iters, maxDepth=5, seed=42),
        label_col="num_sold",
        log_target=True,
    )
    model = hybrid.fit(train)
    scored = model.transform(valid)
    row = scored.agg(
        M.smape("num_sold", "prediction").alias("smape"),
        M.mae("num_sold", "prediction").alias("mae"),
        M.rmse("num_sold", "prediction").alias("rmse"),
    ).collect()[0]
    prepared.unpersist()
    return {"smape": row["smape"], "mae": row["mae"], "rmse": row["rmse"]}


def run_tps_ensemble(
    spark: SparkSession,
    train_end: str = "2017-12-31",
    valid_start: str = "2018-01-01",
    gbt_iters: int = 10,
    folds: int = 2,
    include_mlp: bool = False,
) -> dict[str, float]:
    """The reference's full E2 recipe at reduced scale: hybrid grid →
    OOF stacking with a linear meta-learner → median blend of base
    predictions as a fallback comparator. Returns SMAPE for both.

    The grid includes an FMRegressor first-stage — the fast stand-in for
    the reference's MLPRegressor(hidden=(200,100)) (kaggle.py:731-741):
    Spark ML has no built-in MLP regressor. ``include_mlp=True`` swaps in
    the REAL thing (ml/mlp.py, distributed full-batch GD, deterministic)
    on the same MinMax-scaled vector; it is opt-in because each fit costs
    maxIter Spark jobs, which matters in the OOF k-fold loop at toy
    scale (at cluster scale the per-job overhead amortizes)."""
    from pyspark.ml.regression import FMRegressor, GBTRegressor, LinearRegression

    from .ensemble import external_boosted_stages, hybrid_grid, median_blend
    from .stacking import oof_stack

    data = engineer_features(synthetic_sales(spark)).coalesce(8)
    linear_cols = ["sin1", "cos1", "sin2", "cos2", "year", "wd56", "dec_window"]
    feat1 = build_feature_pipeline(
        cat_cols=["country", "store", "product"], num_cols=linear_cols,
        output_col="features1", one_hot=True, scale=False,
    ).fit(data)
    feat1s = build_feature_pipeline(
        cat_cols=["country", "store", "product"], num_cols=linear_cols,
        output_col="features1s", one_hot=True, scale=True,
    ).fit(data)
    feat2 = build_feature_pipeline(
        cat_cols=["country", "store", "product", "season"],
        num_cols=["weekday", "wd56", "dec_window", "year"],
        output_col="features2", one_hot=False, scale=False,
    ).fit(data)
    prepared = feat2.transform(feat1s.transform(feat1.transform(data))).cache()
    train = prepared.filter(F.col("date") <= F.lit(train_end))
    valid = prepared.filter(F.col("date") >= F.lit(valid_start))

    linear_stages = [
        LinearRegression(featuresCol="features1", regParam=1e-4),
        LinearRegression(featuresCol="features1", regParam=0.1, elasticNetParam=0.5),
        FMRegressor(
            featuresCol="features1s", factorSize=4, maxIter=50, stepSize=0.05,
            regParam=1e-4, seed=42,
        ),
    ]
    if include_mlp:
        from .mlp import MLPRegressor

        linear_stages.append(
            MLPRegressor(featuresCol="features1s", hidden=(32, 16), maxIter=60, stepSize=0.1)
        )
    grid = hybrid_grid(
        linear_stages=linear_stages,
        boosted_stages=[
            GBTRegressor(featuresCol="features2", maxIter=gbt_iters, maxDepth=5, seed=42),
            # reference-parity XGB/LGBM residual stages, auto-wired where
            # their Spark packages exist (absent in this container)
            *external_boosted_stages(features_col="features2"),
        ],
        label_col="num_sold",
        log_target=True,
    )
    _, scored_valid = oof_stack(
        train, valid, grid, id_col="row_id", label_col="num_sold", k=folds
    )
    from ..functions import metrics as M

    stack_smape = scored_valid.agg(M.smape("num_sold", "prediction").alias("s")).collect()[0]["s"]
    blended = median_blend(
        scored_valid.drop("prediction"), [f"_base{i}" for i in range(len(grid))], "prediction"
    )
    blend_smape = blended.agg(M.smape("num_sold", "prediction").alias("s")).collect()[0]["s"]
    prepared.unpersist()
    return {"stack_smape": stack_smape, "median_blend_smape": blend_smape}
