"""Out-of-fold stacking ensemble (kaggle.py:791 StackingRegressor).

sklearn's StackingRegressor = K-fold OOF predictions per base estimator →
meta-regressor on the OOF matrix → base estimators refit on full data.
The reference's meta-regressor is RidgeCV() — ridge with its penalty
selected by CV over sklearn's default alpha grid — mirrored here as a
CrossValidator regParam grid over an L2-only LinearRegression.
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

    # meta learner on the OOF matrix: ridge with a CV-selected penalty,
    # mirroring the reference's RidgeCV() meta-regressor (kaggle.py:791,
    # sklearn default alphas 0.1/1.0/10.0 selected by CV). sklearn's
    # ridge objective is ||y-Xw||^2 + alpha*||w||^2 while Spark's is the
    # per-row mean 1/(2n)*SSE + regParam*penalty, so alpha maps to
    # regParam = alpha/n — the grid below selects over the SAME
    # three-candidate model family the reference does.
    assembler = VectorAssembler(inputCols=base_cols, outputCol="_meta_features")
    assembled = assembler.transform(oof).cache()
    n_rows = assembled.count()
    meta = LinearRegression(
        featuresCol="_meta_features",
        labelCol=label_col,
        predictionCol=prediction_col,
        elasticNetParam=0.0,  # pure L2 = ridge
    )
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    grid = (
        ParamGridBuilder()
        .addGrid(meta.regParam, [a / max(n_rows, 1) for a in RIDGE_ALPHAS])
        .build()
    )
    cv = CrossValidator(
        estimator=meta,
        estimatorParamMaps=grid,
        evaluator=RegressionEvaluator(
            labelCol=label_col, predictionCol=prediction_col, metricName="rmse"
        ),
        numFolds=3,
        seed=7,  # deterministic fold split; sklearn's default is LOO-GCV,
        # infeasible distributed — 3-fold CV selects on the same criterion
    )
    meta_model = cv.fit(assembled).bestModel
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
