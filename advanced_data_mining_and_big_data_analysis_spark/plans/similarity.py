"""Similarity-search declared queries over the ``embeddings`` table.

Spark side: operators/similarity.py (double-cast vectors, sequential-fold
dot products). Oracle side recomputes the identical IEEE operation sequence
with DuckDB list lambdas, so cosine values match bit-for-bit before the
6-decimal rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as SIM
from ..sources import load_table
from .registry import query

_DIMS = 64

_DOT_VQ = f"list_reduce(list_transform(range(1, {_DIMS + 1}), i -> v[i] * q[i]), (a, b) -> a + b)"
_NORM_V = f"sqrt(list_reduce(list_transform(range(1, {_DIMS + 1}), i -> v[i] * v[i]), (a, b) -> a + b))"
_NORM_Q = f"sqrt(list_reduce(list_transform(range(1, {_DIMS + 1}), i -> q[i] * q[i]), (a, b) -> a + b))"
_BUCKET = (
    "list_reduce(list_transform(range(0, 8), i -> CASE WHEN v[i + 1] >= 0 "
    "THEN (1::BIGINT << i) ELSE 0::BIGINT END), (a, b) -> a + b)"
)


@query(
    "q50_cosine_topk",
    oracle=f"""
    WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    qv AS (SELECT v AS q FROM x WHERE vec_id = 0),
    d AS (SELECT vec_id, {_DOT_VQ} / ({_NORM_V} * {_NORM_Q}) AS cos_sim
          FROM x CROSS JOIN qv WHERE vec_id <> 0)
    SELECT vec_id, ROUND(cos_sim, 6) + 0 AS cos_sim
    FROM d ORDER BY d.cos_sim DESC, vec_id LIMIT 10
    """,
    description="brute-force cosine top-k ANN baseline (north-star similarity search)",
)
def q50_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    topk = SIM.topk_cosine(emb, query_id=0, k=10)
    return topk.select("vec_id", (F.round("cos_sim", 6) + 0.0).alias("cos_sim"))


@query(
    "q51_sign_lsh_buckets",
    oracle=f"""
    WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT {_BUCKET} AS bucket, COUNT(*) AS n_vectors,
           ROUND(AVG({_NORM_V}), 6) AS avg_norm
    FROM x GROUP BY bucket ORDER BY bucket
    """,
    description="sign-pattern LSH bucket histogram — the ANN partitioning path",
)
def q51_sign_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = SIM.as_double("embedding")
    return (
        emb.select(SIM.sign_bucket(v, 8).alias("bucket"), SIM.norm(v).alias("nrm"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.round(F.avg("nrm"), 6).alias("avg_norm"))
        .orderBy("bucket")
    )


@query(
    "q52_ann_bucketed_topk",
    oracle=f"""
    WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    xb AS (SELECT vec_id, v, {_BUCKET} AS bucket FROM x),
    qv AS (SELECT v AS q, bucket AS q_bucket FROM xb WHERE vec_id = 0),
    d AS (SELECT vec_id, bucket, {_DOT_VQ} / ({_NORM_V} * {_NORM_Q}) AS cos_sim
          FROM xb CROSS JOIN qv WHERE vec_id <> 0 AND bucket = q_bucket)
    SELECT vec_id, bucket, ROUND(cos_sim, 6) + 0 AS cos_sim
    FROM d ORDER BY d.cos_sim DESC, vec_id LIMIT 5
    """,
    description="bucketed ANN top-k: search restricted to the query's LSH bucket (the scale path)",
)
def q52_ann_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    topk = SIM.topk_cosine_bucketed(emb, query_id=0, k=5, bits=8)
    return topk.select("vec_id", "bucket", (F.round("cos_sim", 6) + 0.0).alias("cos_sim"))


@query(
    "q53_label_centroids",
    oracle="""
    WITH x AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT label, CAST(dim AS INTEGER) AS dim, ROUND(AVG(v[dim]), 6) + 0 AS centroid
    FROM x CROSS JOIN range(1, 9) r(dim)
    GROUP BY label, dim ORDER BY label, dim
    """,
    description="per-label embedding centroids (first 8 dims) via dimension explode",
)
def q53_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = SIM.as_double("embedding")
    return (
        emb.select("label", v.alias("v"), F.explode(F.sequence(F.lit(1), F.lit(8))).alias("dim"))
        .select("label", "dim", F.element_at("v", F.col("dim")).alias("component"))
        .groupBy("label", "dim")
        .agg((F.round(F.avg("component"), 6) + 0.0).alias("centroid"))
        .orderBy("label", "dim")
    )
