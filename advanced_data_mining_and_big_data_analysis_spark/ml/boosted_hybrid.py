"""BoostedHybrid: the reference's core custom model (kaggle.py:592-655).

Semantics (reference BoostedHybrid.fit/predict):
    fit  : model_1 on (X1, y); model_2 on (X2, y - model_1(X1))
    pred : model_1(X1) + model_2(X2)

Re-expressed as a Spark ML Estimator/Model pair composing any two Spark ML
regressors via a residual column. The optional log-target wrapper
reproduces the reference's TransformedTargetRegressor(log1p/expm1)
(kaggle.py:794-796): fit on log1p(y), invert with expm1 at predict time.

Persistence: ``BoostedHybridModel.save(path)`` writes each fitted stage
with its native MLWriter plus a meta.json; ``load(spark, path)``
reassembles — the E2→E3 handoff the reference implies
(kaggle.py:656-697 trains, 804-859 scores).
"""

from __future__ import annotations

from pyspark.ml import Estimator, Transformer
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import persistence as P


class BoostedHybridModel(Transformer):
    """Fitted hybrid: prediction = m1(features1) + m2(features2)."""

    def __init__(
        self,
        fitted_1,
        fitted_2,
        prediction_col: str = "prediction",
        log_target: bool = False,
    ):
        super().__init__()
        self.fitted_1 = fitted_1
        self.fitted_2 = fitted_2
        self.prediction_col = prediction_col
        self.log_target = log_target

    def copy(self, extra=None):  # noqa: D102 — Params.defaultCopy can't rebuild custom ctors
        return BoostedHybridModel(self.fitted_1, self.fitted_2, self.prediction_col, self.log_target)

    @staticmethod
    def _pred_col_of(fitted) -> str:
        """Prediction column across model conventions: Spark ML built-ins
        expose camelCase ``predictionCol``; xgboost.spark models expose
        snake_case ``prediction_col`` (the fitted-model twin of
        BoostedHybrid._set_cols — a camelCase-only getOrDefault raises on
        external boosted stages, caught by the fake-estimator test)."""
        has_param = getattr(fitted, "hasParam", None)
        if callable(has_param):
            try:
                if has_param("predictionCol"):
                    return fitted.getOrDefault("predictionCol")
                if has_param("prediction_col"):
                    return fitted.getOrDefault("prediction_col")
            except Exception:
                pass
        try:
            return fitted.getOrDefault("predictionCol")
        except Exception:
            return fitted.getOrDefault("prediction_col")

    def _transform(self, df: DataFrame) -> DataFrame:
        out = self.fitted_2.transform(self.fitted_1.transform(df))
        p1 = self._pred_col_of(self.fitted_1)
        p2 = self._pred_col_of(self.fitted_2)
        raw = F.col(p1) + F.col(p2)
        pred = F.expm1(raw) if self.log_target else raw
        return out.withColumn(self.prediction_col, pred).drop(p1, p2)

    def save(self, path: str) -> None:
        """Persist both fitted stages + config under ``path`` (any
        Hadoop-FS URI)."""
        spark = SparkSession.getActiveSession()
        P.save_stage(self.fitted_1, f"{path}/stage1")
        P.save_stage(self.fitted_2, f"{path}/stage2")
        P.save_meta(
            spark,
            path,
            {
                "type": "BoostedHybridModel",
                "stage1": P.stage_meta(self.fitted_1),
                "stage2": P.stage_meta(self.fitted_2),
                "prediction_col": self.prediction_col,
                "log_target": self.log_target,
            },
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "BoostedHybridModel":
        meta = P.load_meta(spark, path)
        return cls(
            P.load_stage(spark, meta["stage1"], f"{path}/stage1"),
            P.load_stage(spark, meta["stage2"], f"{path}/stage2"),
            prediction_col=meta["prediction_col"],
            log_target=meta["log_target"],
        )


class BoostedHybrid(Estimator):
    """Estimator composing a linear stage and a residual booster stage.

    ``model_1`` / ``model_2`` are unfitted Spark ML regressors; their
    featuresCol params select X1/X2 (the reference splits features the
    same way — Fourier/trend columns to the linear stage, categorical/
    calendar to the booster, kaggle.py:701-714).
    """

    def __init__(
        self,
        model_1: Estimator,
        model_2: Estimator,
        label_col: str = "label",
        prediction_col: str = "prediction",
        log_target: bool = False,
    ):
        super().__init__()
        self.model_1 = model_1
        self.model_2 = model_2
        self.label_col = label_col
        self.prediction_col = prediction_col
        self.log_target = log_target

    def copy(self, extra=None):  # noqa: D102 — Params.defaultCopy can't rebuild custom ctors
        return BoostedHybrid(
            self.model_1.copy(),
            self.model_2.copy(),
            self.label_col,
            self.prediction_col,
            self.log_target,
        )

    @staticmethod
    def _set_cols(est, label: str, pred: str) -> None:
        """Set label/prediction columns across estimator conventions:
        Spark ML built-ins take camelCase (labelCol); xgboost.spark takes
        snake_case (label_col) — supporting both lets the hybrid grid
        accept external boosted stages (ensemble.external_boosted_stages)
        without wrappers. Convention is detected via hasParam when the
        estimator exposes it (xgboost.spark's kwargs-based setParams
        raises ValueError, not TypeError, for unknown params in some
        versions — exception-type dispatch alone is not reliable)."""
        has_param = getattr(est, "hasParam", None)
        if callable(has_param):
            try:
                if has_param("labelCol"):
                    est.setParams(labelCol=label, predictionCol=pred)
                    return
                if has_param("label_col"):
                    est.setParams(label_col=label, prediction_col=pred)
                    return
            except Exception:
                pass  # fall through to exception-dispatch below
        try:
            est.setParams(labelCol=label, predictionCol=pred)
        except (TypeError, ValueError):
            est.setParams(label_col=label, prediction_col=pred)

    def _fit(self, df: DataFrame) -> BoostedHybridModel:
        y = F.log1p(F.col(self.label_col)) if self.log_target else F.col(self.label_col)
        train = df.withColumn("_y", y)

        m1 = self.model_1.copy()
        self._set_cols(m1, "_y", "_pred1")
        fitted_1 = m1.fit(train)

        # cache the residual frame: the booster's iterations repeatedly
        # pull its input, and without this each pass re-runs the stage-1
        # transform + label arithmetic
        with_resid = (
            fitted_1.transform(train)
            .withColumn("_resid", F.col("_y") - F.col("_pred1"))
            .cache()
        )
        m2 = self.model_2.copy()
        self._set_cols(m2, "_resid", "_pred2")
        try:
            fitted_2 = m2.fit(with_resid)
        finally:
            with_resid.unpersist()

        return BoostedHybridModel(
            fitted_1, fitted_2, prediction_col=self.prediction_col, log_target=self.log_target
        )
