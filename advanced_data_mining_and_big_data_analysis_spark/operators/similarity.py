"""Similarity search over embedding columns (BASELINE.json north star).

Embeddings are ``array<float>``; all math is done after casting to double
(both engines then execute identical IEEE ops in identical fold order, so
results are bit-reproducible). Dot products fold left with a 0.0 init —
(((0+x1)+x2)+...) — matching DuckDB's list_reduce and any sequential
accumulator.

Scale paths:
- brute-force top-k: one pass, per-partition heap (orderBy+limit) —
  O(N·d) compute, no shuffle of the corpus; fine to ~10^8 rows/executor-set.
- sign-LSH bucketing: axis-aligned random-hyperplane sketch over the first
  b dims → 2^b buckets; search only the query's bucket (recall/latency
  trade). At 100 TB you'd hang IVF centroids or a learned index on the
  same bucket-join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (engine-portable order of operations)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """Sign-pattern LSH bucket over the first ``bits`` dimensions."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i)).otherwise(0).cast("long")
    return out


def topk_cosine(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against one corpus vector (the exactness
    baseline ANN variants are judged against)."""
    v = as_double(vec_col)
    corpus = embeddings.select(F.col(id_col), v.alias("v"))
    qvec = corpus.filter(F.col(id_col) == query_id).select(F.col("v").alias("q"))
    return (
        corpus.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(qvec))
        .select(id_col, cosine(F.col("v"), F.col("q")).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def topk_cosine_bucketed(
    embeddings: DataFrame,
    query_id: int,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: restrict the scan to the query's sign-LSH bucket.
    Same output shape as ``topk_cosine`` (plus the bucket id)."""
    v = as_double(vec_col)
    corpus = embeddings.select(F.col(id_col), v.alias("v"), sign_bucket(v, bits).alias("bucket"))
    q = corpus.filter(F.col(id_col) == query_id).select(
        F.col("v").alias("q"), F.col("bucket").alias("q_bucket")
    )
    return (
        corpus.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .filter(F.col("bucket") == F.col("q_bucket"))
        .select(id_col, "bucket", cosine(F.col("v"), F.col("q")).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def quantize_int8(
    embeddings: DataFrame,
    id_cols: tuple = ("vec_id",),
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector int8 scalar quantization: (ids..., mn, scale, q) where
    q[i] = floor((v[i] - mn) / scale + 0.5) in 0..255 — 4x smaller than
    float32, the storage format big ANN indexes actually serve from.

    min/scale come from array_min/array_max (flat codegen); the
    per-element map is a transform HOF, consistent with the rest of this
    module's vector math (an index-BUILD-time op that runs once per
    vector, embarrassingly parallel — not a per-query hot path).
    q111's oracle pins the identical floor(x+0.5) half-rule."""
    v = as_double(vec_col)
    mn = F.array_min(v)
    scale = (F.array_max(v) - mn) / 255.0
    base = embeddings.select(
        *[F.col(c) for c in id_cols], v.alias("_v"), mn.alias("mn"), scale.alias("scale")
    )
    q = F.when(
        F.col("scale") == 0, F.transform(F.col("_v"), lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            F.col("_v"),
            lambda x: F.floor((x - F.col("mn")) / F.col("scale") + 0.5).cast("int"),
        )
    )
    return base.select(*[F.col(c) for c in id_cols], "mn", "scale", q.alias("q"))


def dequantize(q: Column, mn: Column, scale: Column) -> Column:
    """Reconstruct array<double> from an int8-quantized vector."""
    return F.transform(q, lambda e: mn + e.cast("double") * scale)


# ---------------------------------------------------------------------------
# Trained PQ codebooks (the production upgrade over q120's deterministic
# sample codebook): per-subspace Lloyd's k-means via Spark ML. The
# assignment/audit PLAN is identical either way — the codebook is just
# an input — which is exactly why q120 could pin the plan with a
# deterministic codebook while this trainer supplies the learned one.
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    emb: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    sub: int = 16,
    k: int = 8,
    seed: int = 42,
    max_iter: int = 10,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks: ``m`` independent KMeans fits on
    the 16-dim subvector slices. Returns m codebooks of k centroids
    each (driver-side — the codebook is k*sub floats, a broadcast-sized
    model, never data-sized). Seeded, so results are reproducible."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = F.col(vec_col).cast("array<double>")
    books: list[list[list[float]]] = []
    for j in range(m):
        sliced = emb.select(array_to_vector(F.slice(v, j * sub + 1, sub)).alias("features"))
        model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(sliced)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
    return books


def pq_reconstruction_error(
    emb: DataFrame, codebooks: list[list[list[float]]], vec_col: str = "embedding"
) -> DataFrame:
    """Mean squared reconstruction error of a PQ codebook set over the
    corpus: per subspace, distance to the NEAREST codeword, summed.
    Codebooks enter the plan as literal arrays (the broadcast-variable
    pattern) — the embedding table is scanned once, map-only, and only
    a scalar aggregate returns."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")

    def min_d2(j: int) -> Column:
        sub_v = F.slice(v, j * sub + 1, sub)
        dists = [
            F.aggregate(
                F.zip_with(
                    sub_v,
                    F.array(*[F.lit(x) for x in code]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for code in codebooks[j]
        ]
        return F.least(*dists)

    total = sum(min_d2(j) for j in range(m))
    return emb.select(total.alias("err2")).agg(
        F.avg("err2").alias("avg_err2"), F.count("*").alias("n_vecs")
    )
