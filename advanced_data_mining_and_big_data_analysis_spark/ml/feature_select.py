"""Mutual-information feature filter (SURVEY §2.9 MI row).

The reference declares MI_THRESHOLD (kaggle.py:80) with sklearn's
mutual_info_regression in mind but never applies it; this closes the row
with the engine-native form: equal-width binned MI between numeric
features and a categorical label, computed relationally in ONE pass over
the data.

Shape at 100 TB: one global min/max aggregate (broadcast), one melt
(explode to (feature, bin, label) rows — 3x the row count for 3
features, all map-side), one groupBy count whose output is tiny
(features x bins x labels), then windows/sums over that tiny frame.
No collect, no UDF, no per-feature rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def binned_mutual_information(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    bins: int = 8,
) -> DataFrame:
    """MI (nats) between each equal-width-binned feature and the label.

    Returns (feature, mi_nats), one row per feature. Degenerate features
    (min == max) bin to 0 and score 0.0 MI.
    """
    aggs = []
    for c in feature_cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    stats = df.agg(*aggs)

    def bin_expr(c: str):
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        raw = F.floor((F.col(c) - mn) * bins / (mx - mn))
        return (
            F.when(mx == mn, F.lit(0))
            .otherwise(F.least(raw, F.lit(bins - 1)))
            .cast("int")
            .alias("bin")
        )

    pairs = F.array(
        *[F.struct(F.lit(c).alias("feature"), bin_expr(c)) for c in feature_cols]
    )
    long = (
        df.select(label_col, *feature_cols)
        .crossJoin(F.broadcast(stats))
        .select(F.col(label_col).alias("label"), F.explode(pairs).alias("fb"))
        .select("label", "fb.feature", "fb.bin")
    )
    joint = long.groupBy("feature", "bin", "label").agg(F.count(F.lit(1)).alias("c"))
    # windows run over the tiny (feature, bin, label) count frame
    n = F.sum("c").over(W.partitionBy("feature")).cast("double")
    cb = F.sum("c").over(W.partitionBy("feature", "bin")).cast("double")
    cl = F.sum("c").over(W.partitionBy("feature", "label")).cast("double")
    scored = joint.select(
        "feature",
        ((F.col("c").cast("double") / n) * F.log(F.col("c").cast("double") * n / (cb * cl))).alias("_term"),
    )
    return scored.groupBy("feature").agg(F.round(F.sum("_term"), 6).alias("mi_nats"))


def mi_select(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    threshold: float,
    bins: int = 8,
) -> list[str]:
    """The applied form of the reference's MI_THRESHOLD: names of
    features whose binned MI with the label clears the threshold."""
    rows = binned_mutual_information(df, feature_cols, label_col, bins).collect()
    keep = {r["feature"] for r in rows if r["mi_nats"] >= threshold}
    return [c for c in feature_cols if c in keep]
