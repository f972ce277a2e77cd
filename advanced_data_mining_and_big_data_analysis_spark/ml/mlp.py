"""Distributed MLP regressor — closes the reference's MLPRegressor slot.

The reference trains sklearn ``MLPRegressor(hidden_layer_sizes=(200, 100))``
(kaggle.py:731-741) single-node. Spark ML ships no MLP *regressor* (only
the classifier), so rounds 1-4 substituted FMRegressor (documented). This
module implements the real thing in MLlib's own optimizer shape:

- weights live on the driver (a few KB-MB: network size, not data size)
  and are closed over / broadcast into each iteration;
- each iteration computes per-partition gradient SUMS via an
  Arrow-batched ``mapInPandas`` (numpy matmul per batch — vectorized,
  never per-row Python), then the driver reduces the tiny per-partition
  gradient rows and takes a step;
- prediction is one broadcast-weights ``pandas_udf``.

At 100 TB the per-iteration cost is one map-side pass + a
#partitions-row reduce — the same communication pattern MLlib's
LogisticRegression/GBT optimizers use; nothing data-sized ever reaches
the driver. Deterministic: seeded init, full-batch gradients, fixed
iteration count — fit twice, get bit-identical weights.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _init_weights(layer_sizes: list[int], seed: int) -> list[np.ndarray]:
    """Glorot-uniform init, seeded — [W1, b1, W2, b2, ...]."""
    rng = np.random.RandomState(seed)
    params: list[np.ndarray] = []
    for fan_in, fan_out in zip(layer_sizes[:-1], layer_sizes[1:]):
        bound = np.sqrt(6.0 / (fan_in + fan_out))
        params.append(rng.uniform(-bound, bound, (fan_in, fan_out)))
        params.append(np.zeros(fan_out))
    return params


def _forward(x: np.ndarray, params: list[np.ndarray]) -> tuple[list[np.ndarray], np.ndarray]:
    """ReLU hidden layers, linear output. Returns (activations, yhat)."""
    acts = [x]
    h = x
    n_layers = len(params) // 2
    for i in range(n_layers):
        z = h @ params[2 * i] + params[2 * i + 1]
        h = np.maximum(z, 0.0) if i < n_layers - 1 else z
        acts.append(h)
    return acts, h[:, 0]


def _gradient(
    x: np.ndarray, y: np.ndarray, params: list[np.ndarray]
) -> tuple[list[np.ndarray], float]:
    """Summed (not averaged) squared-error gradients + summed loss."""
    acts, yhat = _forward(x, params)
    n_layers = len(params) // 2
    delta = (yhat - y)[:, None]  # dL/dz_out for 0.5*(yhat-y)^2
    grads: list[np.ndarray | None] = [None] * len(params)
    for i in range(n_layers - 1, -1, -1):
        grads[2 * i] = acts[i].T @ delta
        grads[2 * i + 1] = delta.sum(axis=0)
        if i > 0:
            delta = (delta @ params[2 * i].T) * (acts[i] > 0)
    loss = float(0.5 * ((yhat - y) ** 2).sum())
    return grads, loss


def _flatten(params: list[np.ndarray]) -> np.ndarray:
    return np.concatenate([p.ravel() for p in params])


def _unflatten(flat: np.ndarray, like: list[np.ndarray]) -> list[np.ndarray]:
    out, off = [], 0
    for p in like:
        out.append(flat[off : off + p.size].reshape(p.shape))
        off += p.size
    return out


_GRAD_SCHEMA = T.StructType(
    [
        T.StructField("grad", T.ArrayType(T.DoubleType())),
        T.StructField("loss", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _as_array(df: DataFrame, col: str):
    """Column as array<double>: converts Spark ML VectorUDT transparently
    so the estimator drops into pipelines built on ml.feature outputs."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.ml.linalg import VectorUDT

    if isinstance(df.schema[col].dataType, VectorUDT):
        return vector_to_array(F.col(col)).cast("array<double>")
    return F.col(col)


class MLPRegressorModel:
    """Fitted MLP: broadcast-weights vectorized scoring."""

    def __init__(self, params: list[np.ndarray], features_col: str, prediction_col: str):
        self.params = params
        self.features_col = features_col
        self.prediction_col = prediction_col

    def getOrDefault(self, key: str):
        """Params-protocol shim (BoostedHybridModel reads predictionCol)."""
        mapping = {
            "predictionCol": self.prediction_col,
            "featuresCol": self.features_col,
        }
        if key in mapping:
            return mapping[key]
        raise KeyError(key)

    def save(self, path: str, spark=None) -> None:
        """Composite persistence convention (ml/persistence.py): weights +
        config as one JSON through the Hadoop FS API (hdfs/s3a/file alike).
        Network-sized, not data-sized — JSON is fine.

        ``spark`` mirrors ``load``'s explicit session argument; when
        omitted, the active session is used and its absence is a clear
        error instead of an AttributeError deep in the FS write."""
        import json

        from pyspark.sql import SparkSession

        from .persistence import write_text_file

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "MLPRegressorModel.save: no active SparkSession; pass one "
                "explicitly via save(path, spark)"
            )
        payload = {
            "features_col": self.features_col,
            "prediction_col": self.prediction_col,
            "weights": [p.tolist() for p in self.params],
        }
        write_text_file(spark, f"{path}/mlp.json", json.dumps(payload))

    @classmethod
    def load(cls, spark, path: str) -> "MLPRegressorModel":
        import json

        from .persistence import read_text_file

        payload = json.loads(read_text_file(spark, f"{path}/mlp.json"))
        params = [np.asarray(w) for w in payload["weights"]]
        return cls(params, payload["features_col"], payload["prediction_col"])

    def transform(self, df: DataFrame) -> DataFrame:
        params = self.params  # closure -> shipped with the task, not per-row

        @F.pandas_udf(T.DoubleType())
        def score(feats: pd.Series) -> pd.Series:
            x = np.vstack(feats.to_numpy())
            _, yhat = _forward(x, params)
            return pd.Series(yhat)

        return df.withColumn(self.prediction_col, score(_as_array(df, self.features_col)))


class MLPRegressor:
    """Estimator-shaped distributed MLP regressor (ReLU hidden, linear out).

    ``featuresCol`` must be array<double> (use ``vector_to_array`` after a
    feature pipeline, or any array column). Full-batch deterministic GD;
    lr is scaled by 1/n at the driver so the step is the mean gradient.
    """

    def __init__(
        self,
        featuresCol: str = "features",
        labelCol: str = "label",
        predictionCol: str = "prediction",
        hidden: tuple[int, ...] = (16,),
        maxIter: int = 50,
        stepSize: float = 0.05,
        seed: int = 42,
    ):
        self.features_col = featuresCol
        self.label_col = labelCol
        self.prediction_col = predictionCol
        self.hidden = tuple(hidden)
        self.max_iter = maxIter
        self.step_size = stepSize
        self.seed = seed

    def setParams(self, labelCol: str | None = None, predictionCol: str | None = None):
        """BoostedHybrid/_set_cols compatibility (camelCase convention)."""
        if labelCol is not None:
            self.label_col = labelCol
        if predictionCol is not None:
            self.prediction_col = predictionCol
        return self

    def copy(self):
        return MLPRegressor(
            featuresCol=self.features_col,
            labelCol=self.label_col,
            predictionCol=self.prediction_col,
            hidden=self.hidden,
            maxIter=self.max_iter,
            stepSize=self.step_size,
            seed=self.seed,
        )

    def fit(self, df: DataFrame) -> MLPRegressorModel:
        data = df.select(
            _as_array(df, self.features_col).alias("_x"),
            F.col(self.label_col).cast("double").alias("_y"),
        )
        first = data.first()
        if first is None:
            raise ValueError("empty training frame")
        n_features = len(first["_x"])
        layer_sizes = [n_features, *self.hidden, 1]
        params = _init_weights(layer_sizes, self.seed)
        features_col = "_x"

        # cache: every iteration re-reads the same feature frame
        data = data.cache()
        try:
            for _ in range(self.max_iter):
                cur = params  # rebind for closure capture of THIS iteration

                def grad_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                    g_acc: np.ndarray | None = None
                    loss_acc, n_acc = 0.0, 0
                    for pdf in batches:
                        if not len(pdf):
                            continue
                        x = np.vstack(pdf[features_col].to_numpy())
                        y = pdf["_y"].to_numpy()
                        g, loss = _gradient(x, y, cur)
                        flat = _flatten(g)
                        g_acc = flat if g_acc is None else g_acc + flat
                        loss_acc += loss
                        n_acc += len(pdf)
                    if g_acc is not None:
                        yield pd.DataFrame(
                            {"grad": [g_acc.tolist()], "loss": [loss_acc], "n": [n_acc]}
                        )

                # one small row per partition -> driver reduce (network-sized)
                parts = data.mapInPandas(grad_batches, schema=_GRAD_SCHEMA).collect()
                total_n = sum(r["n"] for r in parts)
                if total_n == 0:
                    raise ValueError("no rows with features during fit")
                g_sum = np.sum([np.asarray(r["grad"]) for r in parts], axis=0)
                step = self.step_size / total_n
                params = _unflatten(_flatten(params) - step * g_sum, params)
        finally:
            data.unpersist()
        return MLPRegressorModel(params, self.features_col, self.prediction_col)
