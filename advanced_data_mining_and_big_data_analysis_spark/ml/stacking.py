"""Out-of-fold stacking ensemble (kaggle.py:791 StackingRegressor).

sklearn's StackingRegressor = K-fold OOF predictions per base estimator →
meta-regressor on the OOF matrix → base estimators refit on full data.
The reference's meta-regressor is RidgeCV() — ridge with its penalty
selected by *exact leave-one-out* error over sklearn's default alpha
grid — mirrored here with the same criterion via the closed-form LOO
identity (``loo_ridge_scores``), then a single L2-only LinearRegression
fit at the winning penalty.
Spark has no built-in; this is the hand-rolled fold bookkeeping SURVEY §7
budgets for. Folds are assigned by a deterministic hash of a row id —
stable across partitionings (seeded rand() is partition-sensitive; a
content hash is not).
"""

from __future__ import annotations

from pyspark.ml import Estimator
from pyspark.ml.regression import LinearRegression
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import persistence as P

# sklearn RidgeCV's default alpha grid (kaggle.py:791 stacks with
# RidgeCV() = RidgeCV(alphas=(0.1, 1.0, 10.0))).
RIDGE_ALPHAS = (0.1, 1.0, 10.0)


def loo_ridge_scores(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    alphas: tuple[float, ...] = RIDGE_ALPHAS,
) -> DataFrame:
    """Exact leave-one-out ridge error per alpha — sklearn RidgeCV's
    default selection criterion (kaggle.py:791), fully distributed.

    For ridge with an unpenalized intercept the LOO residual has a
    closed form: ``e_i / (1 - h_i)`` where ``e_i`` is the full-fit
    residual and ``h_i = 1/n + x̃_i' (G + αI)^{-1} x̃_i`` is the row's
    leverage (x̃ centered, G the centered Gram). That makes exact LOO
    two distributed passes, NOT n refits:

    1. one aggregation for n, the k feature/label means and the
       k(k+1)/2 + k centered (co)moments (``covar_pop`` — JVM-side);
       the k×k per-alpha solves happen driver-side in numpy on that
       O(k²) stat row (bounded collect: scalars, never data);
    2. one pass computing every alpha's squared LOO residual as native
       column arithmetic from broadcast literal coefficients (no UDF),
       aggregated with ``avg``.

    Returns a DataFrame ``(alpha, n, loo_mse)``, one row per alpha.

    The leverage expression is k(k+1)/2 literal multiply-add terms per
    alpha (symmetry of ``(G+αI)^{-1}`` halves the naive k²), built over
    centered columns projected ONCE — still quadratic in k, which is
    fine for a stacking meta-matrix (k = number of base models, single
    digits) but would blow up Catalyst codegen for wide feature lists;
    a guard caps k at 32 (≈ 528 terms/alpha, well inside codegen's
    64KB method limit).
    """
    import numpy as np

    k = len(feature_cols)
    assert k <= 32, (
        f"loo_ridge_scores leverage expression is O(k^2) literal terms; "
        f"k={k} exceeds the supported bound of 32 meta-features"
    )
    xy = list(feature_cols) + [label_col]
    aggs = [F.count(F.lit(1)).alias("_n")]
    aggs += [F.avg(c).alias(f"_m{i}") for i, c in enumerate(xy)]
    pairs = [(i, j) for i in range(k) for j in range(i, k)]
    aggs += [
        F.covar_pop(feature_cols[i], feature_cols[j]).alias(f"_s{i}_{j}") for i, j in pairs
    ]
    aggs += [F.covar_pop(c, label_col).alias(f"_c{i}") for i, c in enumerate(feature_cols)]
    st = df.agg(*aggs).first()

    n = float(st["_n"])
    means = np.array([st[f"_m{i}"] for i in range(k)])
    my = float(st[f"_m{k}"])
    G = np.zeros((k, k))
    for i, j in pairs:
        G[i, j] = G[j, i] = st[f"_s{i}_{j}"] * n  # covar_pop*n = centered Gram
    c = np.array([st[f"_c{i}"] for i in range(k)]) * n

    # centered columns projected once; A = (G+αI)^{-1} is symmetric, so
    # the leverage quadratic form needs only the i<=j terms (cross terms
    # doubled) — half the expression size of the naive double loop
    ctr = [(F.col(c) - F.lit(float(means[i]))).alias(f"_x{i}") for i, c in enumerate(feature_cols)]
    per_alpha = []
    for idx, alpha in enumerate(alphas):
        A = np.linalg.inv(G + alpha * np.eye(k))
        beta = A @ c
        b0 = my - float(means @ beta)
        pred = F.lit(b0)
        for i, col in enumerate(feature_cols):
            pred = pred + F.lit(float(beta[i])) * F.col(col)
        resid = F.col(label_col) - pred
        h = F.lit(1.0 / n)
        for i in range(k):
            for j in range(i, k):
                coef = float(A[i, j]) * (1.0 if i == j else 2.0)
                h = h + F.lit(coef) * F.col(f"_x{i}") * F.col(f"_x{j}")
        per_alpha.append(F.avg(F.pow(resid / (F.lit(1.0) - h), F.lit(2.0))).alias(f"_l{idx}"))

    wide = df.select("*", *ctr).agg(*per_alpha)
    rows = F.array(
        *[
            F.struct(F.lit(float(a)).alias("alpha"), F.col(f"_l{i}").alias("loo_mse"))
            for i, a in enumerate(alphas)
        ]
    )
    return wide.select(F.explode(rows).alias("_r")).select(
        F.col("_r.alpha").alias("alpha"),
        F.lit(int(n)).alias("n"),
        F.col("_r.loo_mse").alias("loo_mse"),
    )


def loo_ridge_alpha(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    alphas: tuple[float, ...] = RIDGE_ALPHAS,
) -> float:
    """argmin-alpha of ``loo_ridge_scores`` (collects len(alphas) rows)."""
    scores = loo_ridge_scores(df, feature_cols, label_col, alphas).collect()
    return float(min(scores, key=lambda r: (r["loo_mse"], r["alpha"]))["alpha"])


def fold_of(id_col: str, k: int):
    """Deterministic fold id: first 7 hex digits of md5(id) mod k."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10).cast("long") % k
    )


def oof_stack(
    train: DataFrame,
    test: DataFrame,
    base_estimators: list[Estimator],
    id_col: str,
    label_col: str = "label",
    k: int = 3,
    prediction_col: str = "prediction",
) -> tuple[DataFrame, DataFrame]:
    """Returns (oof_train, scored_test).

    oof_train: train rows + per-base OOF predictions + meta prediction.
    scored_test: test rows + meta prediction from full-data base models.
    """
    train = train.withColumn("_fold", fold_of(id_col, k))
    base_cols = [f"_base{i}" for i in range(len(base_estimators))]

    # OOF predictions: for each fold, train each base on the other folds
    oof_parts = []
    for fold in range(k):
        tr = train.filter(F.col("_fold") != fold)
        ho = train.filter(F.col("_fold") == fold)
        scored = ho
        for i, est in enumerate(base_estimators):
            model = est.copy().fit(tr)
            # contract: every base estimator predicts into "prediction"
            scored = model.transform(scored).withColumnRenamed("prediction", base_cols[i])
        oof_parts.append(scored.select(*train.columns, *base_cols))
    oof = oof_parts[0]
    for part in oof_parts[1:]:
        oof = oof.unionByName(part)

    # meta learner on the OOF matrix: ridge with its penalty selected by
    # EXACT leave-one-out error, mirroring the reference's RidgeCV()
    # meta-regressor (kaggle.py:791, sklearn default alphas 0.1/1.0/10.0,
    # default cv=None = efficient LOO) — closed-form via the hat-matrix
    # identity, see loo_ridge_scores. sklearn's ridge objective is
    # ||y-Xw||^2 + alpha*||w||^2 while Spark's is the per-row mean
    # 1/(2n)*SSE + regParam*penalty, so alpha maps to regParam = alpha/n.
    assembler = VectorAssembler(inputCols=base_cols, outputCol="_meta_features")
    assembled = assembler.transform(oof).cache()
    n_rows = assembled.count()
    best_alpha = loo_ridge_alpha(assembled, base_cols, label_col)
    meta = LinearRegression(
        featuresCol="_meta_features",
        labelCol=label_col,
        predictionCol=prediction_col,
        elasticNetParam=0.0,  # pure L2 = ridge
        regParam=best_alpha / max(n_rows, 1),
    )
    meta_model = meta.fit(assembled)
    oof_scored = meta_model.transform(assembled)

    # full-data base refits, packaged as a persistable fitted stack
    stack = StackingModel(
        [est.copy().fit(train) for est in base_estimators],
        meta_model,
        base_cols,
        prediction_col=prediction_col,
    )
    return oof_scored, stack.transform(test)


class StackingModel:
    """Fitted stacking ensemble: full-data base models + meta-regressor.

    transform(df) = base model predictions → assembled meta features →
    meta prediction (column ``prediction_col``). save/load persists every
    base model and the meta model with their native MLWriters plus a
    meta.json naming each stage's Python class (ml/persistence.py)."""

    def __init__(self, base_models, meta_model, base_cols, prediction_col: str = "prediction"):
        self.base_models = base_models
        self.meta_model = meta_model
        self.base_cols = list(base_cols)
        self.prediction_col = prediction_col

    def transform(self, df: DataFrame) -> DataFrame:
        scored = df
        for model, col in zip(self.base_models, self.base_cols):
            scored = model.transform(scored).withColumnRenamed("prediction", col)
        assembler = VectorAssembler(inputCols=self.base_cols, outputCol="_meta_features")
        return self.meta_model.transform(assembler.transform(scored))

    def save(self, path: str) -> None:
        spark = SparkSession.getActiveSession()
        for i, model in enumerate(self.base_models):
            P.save_stage(model, f"{path}/base{i}")
        P.save_stage(self.meta_model, f"{path}/meta_model")
        P.save_meta(
            spark,
            path,
            {
                "type": "StackingModel",
                "bases": [P.stage_meta(m) for m in self.base_models],
                "meta_model": P.stage_meta(self.meta_model),
                "base_cols": self.base_cols,
                "prediction_col": self.prediction_col,
            },
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "StackingModel":
        meta = P.load_meta(spark, path)
        bases = [
            P.load_stage(spark, m, f"{path}/base{i}") for i, m in enumerate(meta["bases"])
        ]
        meta_model = P.load_stage(spark, meta["meta_model"], f"{path}/meta_model")
        return cls(bases, meta_model, meta["base_cols"], meta["prediction_col"])
