"""Similarity-search declared queries over the ``embeddings`` table.

Spark side: operators/similarity.py (double-cast vectors, sequential-fold
dot products). Oracle side recomputes the identical IEEE operation sequence
with DuckDB list lambdas, so cosine values match bit-for-bit before the
6-decimal rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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
    "a052_ann_bucketed_topk",
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
def a052_ann_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    topk = SIM.topk_cosine_bucketed(emb, query_id=0, k=5, bits=8)
    return topk.select("vec_id", "bucket", (F.round("cos_sim", 6) + 0.0).alias("cos_sim"))


@query(
    "a053_label_centroids",
    oracle="""
    WITH x AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT label, CAST(dim AS INTEGER) AS dim, ROUND(AVG(v[dim]), 6) + 0 AS centroid
    FROM x CROSS JOIN range(1, 9) r(dim)
    GROUP BY label, dim ORDER BY label, dim
    """,
    description="per-label embedding centroids (first 8 dims) via dimension explode",
)
def a053_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = SIM.as_double("embedding")
    return (
        emb.select("label", v.alias("v"), F.explode(F.sequence(F.lit(1), F.lit(8))).alias("dim"))
        .select("label", "dim", F.element_at("v", F.col("dim")).alias("component"))
        .groupBy("label", "dim")
        .agg((F.round(F.avg("component"), 6) + 0.0).alias("centroid"))
        .orderBy("label", "dim")
    )


@query(
    "a054_embedding_neardup",
    oracle=f"""
    WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    xb AS (SELECT vec_id, v, {_BUCKET} AS bucket FROM x),
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_reduce(list_transform(range(1, {_DIMS + 1}), i -> a.v[i] * b.v[i]), (s, t) -> s + t)
                 / (sqrt(list_reduce(list_transform(range(1, {_DIMS + 1}), i -> a.v[i] * a.v[i]), (s, t) -> s + t))
                    * sqrt(list_reduce(list_transform(range(1, {_DIMS + 1}), i -> b.v[i] * b.v[i]), (s, t) -> s + t))) AS cos_sim
          FROM xb a JOIN xb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, ROUND(cos_sim, 6) + 0 AS cos_sim
    FROM p WHERE cos_sim >= 0.25
    ORDER BY p.cos_sim DESC, id_a, id_b LIMIT 20
    """,
    description="embedding-cosine near-duplicate pairs within sign-LSH buckets (north-star dedup: embedding near-dup; bucket restriction is the quadratic-risk bound)",
)
def a054_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = SIM.as_double("embedding")
    xb = emb.select(F.col("vec_id"), v.alias("v"), SIM.sign_bucket(v, 8).alias("bucket"))
    a, b = xb.alias("a"), xb.alias("b")
    pairs = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id"))
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        SIM.cosine(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
    )
    return (
        pairs.filter(F.col("cos_sim") >= 0.25)
        .orderBy(F.col("cos_sim").desc(), "id_a", "id_b")
        .limit(20)
        .select("id_a", "id_b", (F.round("cos_sim", 6) + 0.0).alias("cos_sim"))
    )


@query(
    "a055_ivf_assignment",
    oracle="""
    WITH x AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT label AS c_label, dim, AVG(v[dim]) AS c
             FROM x CROSS JOIN range(1, 65) r(dim) GROUP BY c_label, dim),
    dist AS (SELECT x.vec_id, x.label AS true_label, cent.c_label,
                    ROUND(SUM((v[r.dim] - c) * (v[r.dim] - c)), 9) AS d2
             FROM x CROSS JOIN range(1, 65) r(dim)
             JOIN cent ON cent.dim = r.dim
             GROUP BY x.vec_id, true_label, cent.c_label),
    best AS (SELECT vec_id, true_label, c_label,
                    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
             FROM dist)
    SELECT true_label, c_label AS assigned_label, COUNT(*) AS n
    FROM best WHERE rn = 1
    GROUP BY true_label, assigned_label ORDER BY true_label, assigned_label
    """,
    description="IVF coarse-quantizer / k-means assignment step: per-label centroids (64 dims), nearest-centroid argmin per vector, confusion counts (north-star similarity scale path)",
)
def a055_ivf_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.col("label").alias("true_label"), SIM.as_double("embedding").alias("v")
    )
    dims = x.select(
        "vec_id", "true_label", F.posexplode("v").alias("dim0", "comp")
    ).withColumn("dim", F.col("dim0") + 1)
    cent = dims.groupBy(F.col("true_label").alias("c_label"), "dim").agg(F.avg("comp").alias("c"))
    dist = (
        dims.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "true_label", "c_label")
        .agg(F.round(F.sum((F.col("comp") - F.col("c")) * (F.col("comp") - F.col("c"))), 9).alias("d2"))
    )
    w = W.partitionBy("vec_id").orderBy("d2", "c_label")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("true_label", F.col("c_label").alias("assigned_label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_label", "assigned_label")
    )


def _ivf_assign(spark: SparkSession, sf_dir: str):
    """Shared IVF plumbing over the embeddings table: see _ivf_assign_frames."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select("vec_id", SIM.as_double("embedding").alias("v"), F.col("label"))
    return _ivf_assign_frames(x)


def _pack_centroids(cent: DataFrame) -> DataFrame:
    """Fold the (c_label, dim, c) centroid frame into ONE row holding
    array<struct<c_label, carr>> sorted by c_label, each carr sorted by
    dim — k_clusters x dims doubles, broadcast-sized by construction."""
    return (
        cent.groupBy("c_label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
            ).alias("carr")
        )
        .agg(F.array_sort(F.collect_list(F.struct("c_label", "carr"))).alias("cents"))
    )


def _d2_arr(vcol, carr):
    """round(sum_dim (v[d]-c[d])^2, 9) as a row-local array expression.
    The aggregate() fold adds in dim order — the same order the explode
    path accumulated (a vector's posexploded rows stay contiguous in
    one task, so its partial sum also ran dim 1..n), keeping the 9-dp
    rounded d2 bit-identical to the former join+sum plan."""
    return F.round(
        F.aggregate(
            F.zip_with(vcol, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, e: acc + e,
        ),
        9,
    )


def _ivf_assign_frames(x: DataFrame):
    """Shared IVF plumbing: (assign, dims, cent) frames — per-vector
    nearest-centroid cluster, exploded dimensions, per-label centroids.
    ``x`` must carry (vec_id, v: array<double>, label).

    r15 reshape (guide §2.3/§2.4): nearest-centroid assignment used to
    64x-explode the corpus, join the centroid frame and argmin through a
    per-vector window — two corpus-sized aggregate exchanges plus a
    window exchange per consumer. The centroid frame is k_clusters x
    dims doubles, so it broadcasts as ONE packed row and the whole
    assignment becomes row-local array arithmetic over the corpus scan:
    zero data-sized exchanges, no explode. array_min over
    struct(d2, c_label) reproduces ROW_NUMBER() ORDER BY (d2, c_label)
    = 1 exactly (lexicographic struct compare, 9-dp pre-rounded d2 —
    see _d2_arr for the summation-order argument). q118 A/B: jobs
    13 -> 10, cold 6.6 -> 2.6 s, rows byte-identical; oracle-verified at
    3 SFs for all four consumers (q114/q118/a096/a056)."""
    dims = x.select("vec_id", F.posexplode("v").alias("dim0", "comp")).withColumn(
        "dim", F.col("dim0") + 1
    )
    cent = (
        x.select(F.col("label").alias("c_label"), F.posexplode("v").alias("dim0", "comp"))
        .withColumn("dim", F.col("dim0") + 1)
        .groupBy("c_label", "dim")
        .agg(F.avg("comp").alias("c"))
    )
    packed = _pack_centroids(cent)
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda ct: F.struct(
                _d2_arr(F.col("v"), ct["carr"]).alias("d2"),
                ct["c_label"].alias("c_label"),
            ),
        )
    )
    assign = x.crossJoin(F.broadcast(packed)).select(
        "vec_id", best["c_label"].alias("cluster"), "v"
    )
    return assign, dims, cent


@query(
    "a096_ivf_multiprobe",
    oracle=f"""
    WITH x AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT label AS c_label, dim, AVG(v[dim]) AS c
             FROM x CROSS JOIN range(1, 65) r(dim) GROUP BY c_label, dim),
    dist AS (SELECT x.vec_id, cent.c_label,
                    ROUND(SUM((v[r.dim] - c) * (v[r.dim] - c)), 9) AS d2
             FROM x CROSS JOIN range(1, 65) r(dim)
             JOIN cent ON cent.dim = r.dim
             GROUP BY x.vec_id, cent.c_label),
    best AS (SELECT vec_id, c_label AS cluster,
                    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
             FROM dist),
    assign AS (SELECT x.vec_id, x.v, best.cluster
               FROM x JOIN best ON best.vec_id = x.vec_id AND best.rn = 1),
    qv AS (SELECT v AS q FROM x WHERE vec_id = 0),
    probes AS (SELECT c_label AS cluster,
                      ROW_NUMBER() OVER (ORDER BY d2, c_label) AS probe_rank
               FROM dist WHERE vec_id = 0 QUALIFY probe_rank <= 2),
    scored AS (
      SELECT a.vec_id, a.cluster, p.probe_rank,
             {_DOT_VQ.replace("v[i]", "a.v[i]")} /
             ({_NORM_V.replace("v[i]", "a.v[i]")} * {_NORM_Q}) AS cos_sim
      FROM assign a JOIN probes p ON a.cluster = p.cluster CROSS JOIN qv
      WHERE a.vec_id <> 0)
    SELECT vec_id, CAST(cluster AS INTEGER) AS cluster,
           CAST(probe_rank AS INTEGER) AS probe_rank,
           ROUND(cos_sim, 6) + 0 AS cos_sim
    FROM scored ORDER BY scored.cos_sim DESC, vec_id LIMIT 5
    """,
    description="multi-probe IVF ANN (nprobe=2): clusters ranked by query-to-centroid distance, the 2 nearest probed, cosine top-k over the union — the recall-vs-cost knob of the coarse quantizer (q56 is nprobe=1); probe cost is bounded by nprobe/k_clusters of the corpus",
)
def a096_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    assign, dims, cent = _ivf_assign(spark, sf_dir)
    qdist = (
        dims.filter(F.col("vec_id") == 0)
        .join(F.broadcast(cent), "dim")
        .groupBy("c_label")
        .agg(F.round(F.sum((F.col("comp") - F.col("c")) * (F.col("comp") - F.col("c"))), 9).alias("d2"))
    )
    # global window over the centroid frame only — bounded by k_clusters
    probes = (
        qdist.withColumn("probe_rank", F.row_number().over(W.orderBy("d2", "c_label")))
        .filter(F.col("probe_rank") <= 2)
        .select(F.col("c_label").alias("cluster"), "probe_rank")
    )
    qv = assign.filter(F.col("vec_id") == 0).select(F.col("v").alias("q"))
    return (
        assign.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probes), "cluster")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "cluster",
            "probe_rank",
            SIM.cosine(F.col("v"), F.col("q")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(5)
        .select(
            "vec_id",
            "cluster",
            "probe_rank",
            (F.round("cos_sim", 6) + 0.0).alias("cos_sim"),
        )
    )


@query(
    "a056_ivf_topk",
    oracle=f"""
    WITH x AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT label AS c_label, dim, AVG(v[dim]) AS c
             FROM x CROSS JOIN range(1, 65) r(dim) GROUP BY c_label, dim),
    dist AS (SELECT x.vec_id, cent.c_label,
                    ROUND(SUM((v[r.dim] - c) * (v[r.dim] - c)), 9) AS d2
             FROM x CROSS JOIN range(1, 65) r(dim)
             JOIN cent ON cent.dim = r.dim
             GROUP BY x.vec_id, cent.c_label),
    best AS (SELECT vec_id, c_label AS cluster,
                    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
             FROM dist),
    assign AS (SELECT x.vec_id, x.v, best.cluster
               FROM x JOIN best ON best.vec_id = x.vec_id AND best.rn = 1),
    qv AS (SELECT v AS q, cluster AS q_cluster FROM assign WHERE vec_id = 0),
    scored AS (
      SELECT a.vec_id, a.cluster,
             {_DOT_VQ.replace("v[i]", "a.v[i]")} /
             ({_NORM_V.replace("v[i]", "a.v[i]")} * {_NORM_Q}) AS cos_sim
      FROM assign a CROSS JOIN qv
      WHERE a.vec_id <> 0 AND a.cluster = q_cluster)
    SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, ROUND(cos_sim, 6) + 0 AS cos_sim
    FROM scored ORDER BY scored.cos_sim DESC, vec_id LIMIT 5
    """,
    description="IVF ANN end-to-end: nearest-centroid assignment (q55) + cosine top-k restricted to the query vector's cluster — the coarse-quantizer search path at scale",
)
def a056_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    assign, _, _ = _ivf_assign(spark, sf_dir)
    qv = assign.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("q"), F.col("cluster").alias("q_cluster")
    )
    return (
        assign.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .filter(F.col("cluster") == F.col("q_cluster"))
        .select("vec_id", "cluster", SIM.cosine(F.col("v"), F.col("q")).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(5)
        .select("vec_id", "cluster", (F.round("cos_sim", 6) + 0.0).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# q111 — int8 scalar quantization of the embedding column with a
# reconstruction-error audit: per-vector (min, max) from array_min/max
# (no shuffle), elements exploded relationally (codegen, no HOF in the
# hot path), quantized to 0..255 levels via floor(x + 0.5) (identical
# half-rule in both engines), reconstructed, and squared error
# aggregated per label. The storage shape every large ANN index uses —
# 4x smaller vectors — with the error it introduces measured, not
# assumed.
# ---------------------------------------------------------------------------


@query(
    "q111_embedding_quantization",
    oracle="""
    WITH x AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    st AS (SELECT vec_id, label, v, list_min(v) AS mn,
                  (list_max(v) - list_min(v)) / 255.0 AS scale
           FROM x),
    e AS (SELECT vec_id, label, mn, scale, unnest(v) AS val FROM st),
    r AS (SELECT vec_id, label, val,
                 CASE WHEN scale = 0 THEN mn
                      ELSE mn + FLOOR((val - mn) / scale + 0.5) * scale END AS recon
          FROM e)
    SELECT label, COUNT(DISTINCT vec_id) AS n_vectors,
           ROUND(AVG((val - recon) * (val - recon)) * 1e6, 6) AS mse_x1e6,
           ROUND(MAX(ABS(val - recon)) * 1e3, 6) AS max_abs_err_x1e3
    FROM r GROUP BY label ORDER BY label
    """,
    description="int8 scalar quantization of embeddings + reconstruction-error audit per label: per-vector min/scale via array_min/array_max (zero shuffles), relational explode for the element math (codegen, no HOFs), floor(x+0.5) half-rule pinned identically in both engines — the 4x-compression storage path for a 100 TB ANN index with its error measured",
)
def q111_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = SIM.as_double("embedding")
    st = emb.select(
        "vec_id",
        "label",
        v.alias("v"),
        F.array_min(v).alias("mn"),
        ((F.array_max(v) - F.array_min(v)) / 255.0).alias("scale"),
    )
    e = st.select("vec_id", "label", "mn", "scale", F.explode("v").alias("val"))
    recon = F.when(F.col("scale") == 0, F.col("mn")).otherwise(
        F.col("mn") + F.floor((F.col("val") - F.col("mn")) / F.col("scale") + 0.5) * F.col("scale")
    )
    r = e.select("vec_id", "label", "val", recon.alias("recon"))
    err = F.col("val") - F.col("recon")
    return (
        r.groupBy("label")
        .agg(
            F.countDistinct("vec_id").alias("n_vectors"),
            F.round(F.avg(err * err) * 1e6, 6).alias("mse_x1e6"),
            F.round(F.max(F.abs(err)) * 1e3, 6).alias("max_abs_err_x1e3"),
        )
        .orderBy("label")
    )


_SD_PLANT = 10  # planted near-dups: vec_id < 10 rescaled by 1.01 (cos == 1)
_SD_THR = 0.999

_PAIR_COS = (
    f"list_reduce(list_transform(range(1, {_DIMS + 1}), i -> a.v[i] * b.v[i]), (s, t) -> s + t)"
    f" / (sqrt(list_reduce(list_transform(range(1, {_DIMS + 1}), i -> a.v[i] * a.v[i]), (s, t) -> s + t))"
    f" * sqrt(list_reduce(list_transform(range(1, {_DIMS + 1}), i -> b.v[i] * b.v[i]), (s, t) -> s + t)))"
)


@query(
    "q114_semdedup",
    oracle=f"""
    WITH RECURSIVE x AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, label,
             list_transform(CAST(embedding AS DOUBLE[]), e -> e * 1.01)
      FROM embeddings WHERE vec_id < {_SD_PLANT}),
    cent AS (SELECT label AS c_label, dim, AVG(v[dim]) AS c
             FROM x CROSS JOIN range(1, {_DIMS + 1}) r(dim) GROUP BY c_label, dim),
    dist AS (SELECT x.vec_id, cent.c_label,
                    ROUND(SUM((v[r.dim] - c) * (v[r.dim] - c)), 9) AS d2
             FROM x CROSS JOIN range(1, {_DIMS + 1}) r(dim)
             JOIN cent ON cent.dim = r.dim
             GROUP BY x.vec_id, cent.c_label),
    best AS (SELECT vec_id, c_label AS cluster,
                    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
             FROM dist),
    assign AS (SELECT x.vec_id, x.v, best.cluster
               FROM x JOIN best ON best.vec_id = x.vec_id AND best.rn = 1),
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM assign a JOIN assign b
            ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          WHERE ROUND({_PAIR_COS}, 9) >= {_SD_THR}),
    ed AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
    reach(id, lab) AS (
      SELECT DISTINCT a, a FROM ed
      UNION
      SELECT ed.a, reach.lab FROM ed JOIN reach ON ed.b = reach.id),
    labels AS (SELECT id, MIN(lab) AS cluster FROM reach GROUP BY id)
    SELECT id AS removed_id, cluster AS kept_id
    FROM labels WHERE id <> cluster ORDER BY removed_id
    """,
    description="SemDeDup-style embedding-space dedup (VERDICT r3 item 7): IVF/k-means cluster assignment -> WITHIN-cluster cosine pairs at an epsilon-ball threshold -> connected components -> drop all but the canonical member. Planted fixture: vec_id<10 re-appear rescaled x1.01 (cosine exactly 1) and must be removed in favor of their originals. Never all-pairs: pair generation is a CLUSTER-LOCAL blocked matmul (applyInPandas per cluster, normalized X @ X.T, emit only above-threshold id pairs) — the canonical SemDeDup execution; the r5 self-join + per-pair interpreted HOF cosine cost 64 interpreted evals per pair and was the single most expensive headline plan. Decision parity with the SQL oracle via round(cos, 9) on both engines. At 100 TB pick k_clusters ~ N/target_cluster_size so the per-cluster matrix stays memory-bounded (and the salted per-bucket cap of operators/dedup.py:172 is the drop-in guard for skewed clusters)",
)
def q114_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators import dedup as D

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", SIM.as_double("embedding").alias("v"), "label")
    planted = base.filter(F.col("vec_id") < _SD_PLANT).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("v", lambda e: e * F.lit(1.01)).alias("v"),
        "label",
    )
    assign, _, _ = _ivf_assign_frames(base.unionAll(planted))

    thr = _SD_THR

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # one dense matmul per cluster: n x 64 -> n x n cosines. Memory
        # is bounded by the cluster size the IVF step was tuned for;
        # float64 throughout so round(cos, 9) agrees with the SQL
        # oracle's double arithmetic.
        ids = pdf["vec_id"].to_numpy()
        x = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0.0] = 1.0
        cos = (x @ x.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = np.round(cos[iu, ju], 9) >= thr
        a, b = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)}
        )

    pairs = assign.groupBy("cluster").applyInPandas(cluster_pairs, "id_a long, id_b long")
    labels = D.near_dup_clusters(pairs)
    return (
        labels.filter(F.col("id") != F.col("cluster"))
        .select(F.col("id").alias("removed_id"), F.col("cluster").alias("kept_id"))
        .orderBy("removed_id")
    )


_BA_NQ = 10  # query batch size (vec_id < 10); corpus = the rest
_BA_K = 3  # neighbors per query
_BA_NPROBE = 2  # clusters probed per query


@query(
    "q118_batch_ann_join",
    oracle=f"""
    WITH x AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT * FROM x WHERE vec_id >= {_BA_NQ}),
    cent AS (SELECT label AS c_label, dim, AVG(v[dim]) AS ctr
             FROM c CROSS JOIN range(1, {_DIMS + 1}) r(dim) GROUP BY c_label, dim),
    dist AS (SELECT c.vec_id, cent.c_label,
                    ROUND(SUM((v[r.dim] - ctr) * (v[r.dim] - ctr)), 9) AS d2
             FROM c CROSS JOIN range(1, {_DIMS + 1}) r(dim)
             JOIN cent ON cent.dim = r.dim
             GROUP BY c.vec_id, cent.c_label),
    best AS (SELECT vec_id, c_label AS cluster,
                    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
             FROM dist),
    assign AS (SELECT c.vec_id, c.v, best.cluster
               FROM c JOIN best ON best.vec_id = c.vec_id AND best.rn = 1),
    qv AS (SELECT vec_id AS qid, v AS q FROM x WHERE vec_id < {_BA_NQ}),
    qdist AS (SELECT qv.qid, cent.c_label,
                     ROUND(SUM((q[r.dim] - ctr) * (q[r.dim] - ctr)), 9) AS d2
              FROM qv CROSS JOIN range(1, {_DIMS + 1}) r(dim)
              JOIN cent ON cent.dim = r.dim
              GROUP BY qv.qid, cent.c_label),
    probes AS (SELECT qid, c_label AS cluster,
                      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, c_label) AS pr
               FROM qdist QUALIFY pr <= {_BA_NPROBE}),
    scored AS (
      SELECT qv.qid, a.vec_id,
             {_DOT_VQ.replace("v[i]", "a.v[i]")} /
             ({_NORM_V.replace("v[i]", "a.v[i]")} * {_NORM_Q}) AS cos_sim
      FROM assign a JOIN probes p ON a.cluster = p.cluster
      JOIN qv ON qv.qid = p.qid),
    ranked AS (
      SELECT qid, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY ROUND(cos_sim, 9) DESC, vec_id) AS rank
      FROM scored QUALIFY rank <= {_BA_K})
    SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id,
           ROUND(cos_sim, 6) + 0 AS cos_sim
    FROM ranked ORDER BY qid, rank
    """,
    description="batched ANN retrieval JOIN: a batch of query vectors (broadcast dim) against the IVF-indexed corpus — per query, rank clusters by query-to-centroid distance, probe the nprobe=2 nearest, cosine-score only the probed clusters' members, per-query top-k via a qid-partitioned window. The retrieval-join shape an LLM-data pipeline uses for similarity decontamination / RAG indexing at corpus scale: cost is batch x nprobe/k_clusters of the corpus, never batch x corpus; the query batch and probe map ride as broadcasts so the corpus side is scanned once with zero data-sized shuffles before the bounded per-query top-k. Decision quantities (d2, cosine rank order) rounded to 9 dp on both engines",
)
def q118_batch_ann_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select("vec_id", SIM.as_double("embedding").alias("v"), "label")
    corpus = x.filter(F.col("vec_id") >= _BA_NQ)
    qv = x.filter(F.col("vec_id") < _BA_NQ).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("q")
    )
    assign, _, cent = _ivf_assign_frames(corpus)
    # per-query probe map: batch x nprobe rows, broadcast-sized. Same
    # r15 row-local reshape as the assignment: the packed-centroid row
    # (an identical subtree to the one inside assign — ReusedExchange
    # covers it at runtime) replaces the query-side explode + join +
    # aggregate + window; array_sort on struct(d2, c_label) reproduces
    # ROW_NUMBER() ORDER BY (d2, c_label) <= nprobe exactly.
    packed = _pack_centroids(cent)
    qscores = F.array_sort(
        F.transform(
            F.col("cents"),
            lambda ct: F.struct(
                _d2_arr(F.col("q"), ct["carr"]).alias("d2"),
                ct["c_label"].alias("c_label"),
            ),
        )
    )
    probes = (
        qv.crossJoin(F.broadcast(packed))
        .select("qid", F.explode(F.slice(qscores, 1, _BA_NPROBE)).alias("s"))
        .select("qid", F.col("s.c_label").alias("cluster"))
    )
    scored = (
        assign.join(F.broadcast(probes), "cluster")
        .join(F.broadcast(qv), "qid")
        .select("qid", "vec_id", SIM.cosine(F.col("v"), F.col("q")).alias("cos_sim"))
    )
    return (
        scored.withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.round("cos_sim", 9).desc(), "vec_id")
            ),
        )
        .filter(F.col("rank") <= _BA_K)
        .select("qid", "rank", "vec_id", (F.round("cos_sim", 6) + 0.0).alias("cos_sim"))
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# q161 — embedding drift monitor: per-label centroid vs the global
# centroid, reported as cosine similarity and L2 distance — the
# embedding-space observability check a training pipeline runs per
# ingest batch (a label/source whose centroid wanders signals
# distribution shift before any model metric does). Centroids are
# per-dimension averages from ONE posexplode pass (dim-keyed partial
# aggregates, map-side combined); the label-x-dim and 1-x-dim centroid
# frames are tiny, so the comparison is broadcast arithmetic. Decision
# quantities are 9-dp rounded on both engines before the 6-dp output
# round (the q114 float-tie rule).
# ---------------------------------------------------------------------------


@query(
    "a0161_embedding_drift",
    oracle=f"""
    WITH x AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    d AS (SELECT label, r.dim, v[r.dim] AS c
          FROM x CROSS JOIN range(1, {_DIMS + 1}) r(dim)),
    lc AS (SELECT label, dim, AVG(c) AS lv, COUNT(*) AS n FROM d GROUP BY label, dim),
    gc AS (SELECT dim, SUM(lv * n) / SUM(n) AS gv FROM lc GROUP BY dim),
    j AS (SELECT lc.label, lc.lv, gc.gv FROM lc JOIN gc USING (dim)),
    m AS (SELECT label,
                 SUM(lv * gv) AS dot, SUM(lv * lv) AS nl, SUM(gv * gv) AS ng,
                 SUM((lv - gv) * (lv - gv)) AS d2
          FROM j GROUP BY label)
    SELECT label,
           ROUND(ROUND(dot / (sqrt(nl) * sqrt(ng)), 9), 6) AS centroid_cos,
           ROUND(ROUND(sqrt(d2), 9), 6) AS centroid_l2
    FROM m ORDER BY label
    """,
    description="embedding drift monitor: per-label centroids vs the global centroid (cosine + L2) — the embedding-space distribution-shift probe a training pipeline runs per ingest batch; centroids from ONE posexplode pass with dim-keyed map-side-combined averages, global centroid = count-weighted merge of the label centroids (no second corpus pass), comparison is broadcast arithmetic over label-x-dim frames; 9-dp pre-round on decision quantities (q114 float-tie rule)",
)
def a0161_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select("label", SIM.as_double("embedding").alias("v"))
    d = x.select(
        "label", F.posexplode("v").alias("dim0", "c")
    ).select("label", (F.col("dim0") + 1).alias("dim"), "c")
    lc = d.groupBy("label", "dim").agg(
        F.avg("c").alias("lv"), F.count("*").alias("n")
    )
    lc = lc.localCheckpoint(eager=False)  # feeds the global merge and the compare
    gc = lc.groupBy("dim").agg(
        (F.sum(F.col("lv") * F.col("n")) / F.sum("n")).alias("gv")
    )
    j = lc.join(F.broadcast(gc), "dim")
    m = j.groupBy("label").agg(
        F.sum(F.col("lv") * F.col("gv")).alias("dot"),
        F.sum(F.col("lv") * F.col("lv")).alias("nl"),
        F.sum(F.col("gv") * F.col("gv")).alias("ng"),
        F.sum((F.col("lv") - F.col("gv")) * (F.col("lv") - F.col("gv"))).alias("d2"),
    )
    return m.select(
        "label",
        F.round(
            F.round(F.col("dot") / (F.sqrt("nl") * F.sqrt("ng")), 9), 6
        ).alias("centroid_cos"),
        F.round(F.round(F.sqrt("d2"), 9), 6).alias("centroid_l2"),
    ).orderBy("label")


# ---------------------------------------------------------------------------
# q164 — IVF-PQ ADC search end-to-end: the FAISS IVFPQ composition that
# the rest of the ANN ladder builds toward. One query: (1) IVF coarse
# quantizer — per-label centroids over the DB partition, every DB
# vector assigned to its nearest centroid; (2) PQ encode — m=4 x 16-dim
# subspaces against a deterministic k=8 codebook (the low-vec_id rows,
# q120's convention), each DB vector stored as 4 code ids; (3) search —
# per query vector, rank centroids, probe the nprobe=2 nearest
# clusters, score every candidate by ASYMMETRIC DISTANCE COMPUTATION:
# a per-query lookup table of query-subvector -> codeword distances
# (nq x k rows, broadcast) folded as l0[c0]+l1[c1]+l2[c2]+l3[c3] — the
# scan never touches candidate vectors, only their 4-byte codes. The
# exact L2^2 rides along per hit so ADC's approximation error is
# auditable in the result. All distances ROUND(...,9) before every
# argmin/rank on both engines (float-tie rule), ties by lowest id.
#
# Scale shape: centroids, codebook, probe list, and LUT are all
# broadcast-sized; the corpus-sized work is one N*k map-side-collapsed
# encode and the probed-cluster candidate scan (nprobe/k_clusters of
# the corpus per query). Nothing shuffles the embedding table at full
# width; the per-query top-k window partitions by query_id.
# ---------------------------------------------------------------------------

_ADC_M, _ADC_SUB, _ADC_K, _ADC_NPROBE, _ADC_TOPK = 4, 16, 8, 2, 5


def _l2sq9(a: Column, b: Column) -> Column:
    """9-dp-rounded squared L2 between two equal-length double arrays."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, z: acc + z,
        ),
        9,
    )


def _adc_sub(col: Column, j: int) -> Column:
    return F.slice(col, j * _ADC_SUB + 1, _ADC_SUB)


def _lut_column(j: int) -> Column:
    """Subspace-j query->codeword distance LUT, keyed BY code_id VALUE
    (map_from_entries), matching the oracle's join-by-code_id semantics.
    A positional array_sort form would silently mis-index if the
    codebook ever lacked a vec_id < _ADC_K (ADVICE r7)."""
    return F.map_from_entries(F.collect_list(F.struct("code_id", f"l{j}"))).alias(f"lut{j}")


@query(
    "a0164_ivf_pq_search",
    oracle="""
    WITH x AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    db AS (SELECT * FROM x WHERE vec_id >= 3),
    q AS (SELECT vec_id AS query_id, v AS qv FROM x WHERE vec_id IN (0, 1, 2)),
    cent AS (SELECT label AS c_label, dim, AVG(v[dim]) AS c
             FROM db CROSS JOIN range(1, 65) r(dim) GROUP BY c_label, dim),
    ivf_d AS (SELECT db.vec_id, c_label,
                     ROUND(SUM((v[r.dim] - c) * (v[r.dim] - c)), 9) AS d2
              FROM db CROSS JOIN range(1, 65) r(dim)
              JOIN cent ON cent.dim = r.dim
              GROUP BY db.vec_id, c_label),
    assign AS (SELECT vec_id, c_label AS cluster,
                      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
               FROM ivf_d QUALIFY rn = 1),
    cb AS (SELECT vec_id AS code_id, v AS cv FROM x WHERE vec_id < 8),
    enc AS (SELECT a.vec_id,
                 cb.code_id,
                 ROUND(list_reduce(list_transform(range(1, 17), i -> (a.v[i] - cb.cv[i]) * (a.v[i] - cb.cv[i])), (acc, z) -> acc + z), 9) AS d0,
                 ROUND(list_reduce(list_transform(range(17, 33), i -> (a.v[i] - cb.cv[i]) * (a.v[i] - cb.cv[i])), (acc, z) -> acc + z), 9) AS d1,
                 ROUND(list_reduce(list_transform(range(33, 49), i -> (a.v[i] - cb.cv[i]) * (a.v[i] - cb.cv[i])), (acc, z) -> acc + z), 9) AS d2,
                 ROUND(list_reduce(list_transform(range(49, 65), i -> (a.v[i] - cb.cv[i]) * (a.v[i] - cb.cv[i])), (acc, z) -> acc + z), 9) AS d3
            FROM (SELECT db.vec_id, db.v FROM db) a CROSS JOIN cb),
    cmin AS (SELECT vec_id, MIN(d0) AS m0, MIN(d1) AS m1, MIN(d2) AS m2, MIN(d3) AS m3 FROM enc GROUP BY vec_id),
    codes AS (SELECT e.vec_id,
                  MIN(CASE WHEN e.d0 = m.m0 THEN e.code_id END) AS c0,
                  MIN(CASE WHEN e.d1 = m.m1 THEN e.code_id END) AS c1,
                  MIN(CASE WHEN e.d2 = m.m2 THEN e.code_id END) AS c2,
                  MIN(CASE WHEN e.d3 = m.m3 THEN e.code_id END) AS c3
              FROM enc e JOIN cmin m ON e.vec_id = m.vec_id GROUP BY e.vec_id),
    lut AS (SELECT q.query_id, cb.code_id,
                ROUND(list_reduce(list_transform(range(1, 17), i -> (q.qv[i] - cb.cv[i]) * (q.qv[i] - cb.cv[i])), (acc, z) -> acc + z), 9) AS l0,
                ROUND(list_reduce(list_transform(range(17, 33), i -> (q.qv[i] - cb.cv[i]) * (q.qv[i] - cb.cv[i])), (acc, z) -> acc + z), 9) AS l1,
                ROUND(list_reduce(list_transform(range(33, 49), i -> (q.qv[i] - cb.cv[i]) * (q.qv[i] - cb.cv[i])), (acc, z) -> acc + z), 9) AS l2,
                ROUND(list_reduce(list_transform(range(49, 65), i -> (q.qv[i] - cb.cv[i]) * (q.qv[i] - cb.cv[i])), (acc, z) -> acc + z), 9) AS l3
            FROM q CROSS JOIN cb),
    qprobe AS (SELECT q.query_id, c_label,
                      ROUND(SUM((qv[r.dim] - c) * (qv[r.dim] - c)), 9) AS d2
               FROM q CROSS JOIN range(1, 65) r(dim)
               JOIN cent ON cent.dim = r.dim
               GROUP BY q.query_id, c_label),
    probes AS (SELECT query_id, c_label AS cluster,
                      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, c_label) AS pr
               FROM qprobe QUALIFY pr <= 2),
    cand AS (SELECT p.query_id, a.vec_id, a.cluster
             FROM assign a JOIN probes p ON a.cluster = p.cluster),
    scored AS (SELECT cand.query_id, cand.vec_id, cand.cluster,
                      ROUND(j0.l0 + j1.l1 + j2.l2 + j3.l3, 9) AS adc_d2
               FROM cand
               JOIN codes k ON k.vec_id = cand.vec_id
               JOIN lut j0 ON j0.query_id = cand.query_id AND j0.code_id = k.c0
           JOIN lut j1 ON j1.query_id = cand.query_id AND j1.code_id = k.c1
           JOIN lut j2 ON j2.query_id = cand.query_id AND j2.code_id = k.c2
           JOIN lut j3 ON j3.query_id = cand.query_id AND j3.code_id = k.c3),
    top AS (SELECT s.query_id, s.vec_id, s.cluster, s.adc_d2,
                   ROUND(list_reduce(list_transform(range(1, 65), i -> (q.qv[i] - d.v[i]) * (q.qv[i] - d.v[i])), (acc, z) -> acc + z), 9) AS true_d2,
                   ROW_NUMBER() OVER (PARTITION BY s.query_id
                                      ORDER BY s.adc_d2, s.vec_id) AS rnk
            FROM scored s
            JOIN q ON q.query_id = s.query_id
            JOIN db d ON d.vec_id = s.vec_id)
    SELECT query_id, CAST(rnk AS INTEGER) AS rnk, vec_id,
           CAST(cluster AS INTEGER) AS cluster,
           ROUND(adc_d2, 6) + 0 AS adc_d2, ROUND(true_d2, 6) + 0 AS true_d2
    FROM top WHERE rnk <= 5 ORDER BY query_id, rnk
    """,
    description="IVF-PQ search with asymmetric distance computation, end-to-end (the FAISS IVFPQ composition closing the ANN ladder): per-label IVF centroids + nearest-centroid assignment, m=4x16-dim PQ encoding against the deterministic k=8 low-vec_id codebook, then per query (vec_id 0-2): rank centroids, probe the 2 nearest clusters, and score candidates via a broadcast query->codeword lookup table folded over the 4 stored code ids — candidates are scanned as codes, never as vectors; exact L2^2 per hit audits the ADC approximation; every distance 9-dp-rounded before argmin/rank with lowest-id tie-breaks, so both engines produce the identical top-5",
)
def a0164_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    db = emb.filter(F.col("vec_id") >= 3)
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    # (1) IVF centroids (per-label means over the DB partition) as arrays
    cent_arr = (
        db.select("label", F.posexplode("v").alias("dim0", "comp"))
        .groupBy(F.col("label").alias("c_label"), "dim0")
        .agg(F.avg("comp").alias("c"))
        .groupBy("c_label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim0", "c"))), lambda s: s["c"]
            ).alias("cv_full")
        )
    )
    assign = (
        db.crossJoin(F.broadcast(cent_arr))
        .select("vec_id", "v", "c_label", _l2sq9(F.col("v"), F.col("cv_full")).alias("d2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct(F.col("d2"), F.col("c_label"))).alias("m"))
        .select("vec_id", F.col("m.c_label").alias("cluster"))
        .join(db.select("vec_id", "v"), "vec_id")
    )

    # (2) PQ encode against the deterministic codebook (q120 convention)
    cb = emb.filter(F.col("vec_id") < _ADC_K).select(
        F.col("vec_id").alias("code_id"), F.col("v").alias("cv")
    )
    enc = assign.crossJoin(F.broadcast(cb)).select(
        "vec_id",
        "cluster",
        "code_id",
        *[
            _l2sq9(_adc_sub(F.col("v"), j), _adc_sub(F.col("cv"), j)).alias(f"d{j}")
            for j in range(_ADC_M)
        ],
    )
    codes = (
        enc.groupBy("vec_id")
        .agg(
            F.min("cluster").alias("cluster"),
            *[
                F.min(F.struct(F.col(f"d{j}"), F.col("code_id"))).alias(f"m{j}")
                for j in range(_ADC_M)
            ],
        )
        .select(
            "vec_id",
            "cluster",
            *[F.col(f"m{j}.code_id").alias(f"c{j}") for j in range(_ADC_M)],
        )
    )

    # (3) search: probe list + ADC lookup tables, both broadcast-sized
    lut_arr = (
        qs.crossJoin(F.broadcast(cb))
        .select(
            "query_id",
            "code_id",
            *[
                _l2sq9(_adc_sub(F.col("qv"), j), _adc_sub(F.col("cv"), j)).alias(f"l{j}")
                for j in range(_ADC_M)
            ],
        )
        .groupBy("query_id")
        .agg(*[_lut_column(j) for j in range(_ADC_M)])
    )
    wprobe = W.partitionBy("query_id").orderBy("d2", "c_label")
    probes = (
        qs.crossJoin(F.broadcast(cent_arr))
        .select("query_id", "c_label", _l2sq9(F.col("qv"), F.col("cv_full")).alias("d2"))
        .withColumn("pr", F.row_number().over(wprobe))
        .filter(F.col("pr") <= _ADC_NPROBE)
        .select("query_id", F.col("c_label").alias("cluster"))
    )

    adc = F.round(
        sum(F.element_at(F.col(f"lut{j}"), F.col(f"c{j}")) for j in range(_ADC_M)),
        9,
    )
    scored = (
        codes.join(F.broadcast(probes), "cluster")
        .join(F.broadcast(lut_arr), "query_id")
        .select("query_id", "vec_id", "cluster", adc.alias("adc_d2"))
    )
    wtop = W.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (
        scored.join(db.select("vec_id", "v"), "vec_id")
        .join(F.broadcast(qs), "query_id")
        .withColumn("true_d2", _l2sq9(F.col("qv"), F.col("v")))
        .withColumn("rnk", F.row_number().over(wtop))
        .filter(F.col("rnk") <= _ADC_TOPK)
        .select(
            "query_id",
            F.col("rnk").cast("int").alias("rnk"),
            "vec_id",
            F.col("cluster").cast("int").alias("cluster"),
            (F.round("adc_d2", 6) + 0.0).alias("adc_d2"),
            (F.round("true_d2", 6) + 0.0).alias("true_d2"),
        )
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# q166 — k-means Lloyd iterations, hash-checked against a true two-round
# SQL unroll: the clustering primitive under SemDeDup (q114), IVF
# training (q55 assigns to LABEL means; this trains centroids from a
# seed), and mixture curation. Two full Lloyd rounds from the
# deterministic low-vec_id seed: assign -> per-dim mean -> re-assign,
# reporting per-cluster membership and inertia after round 2.
#
# Cross-engine float discipline: every distance ROUND(...,9) before
# every argmin (tie -> lowest cluster id via min(struct)); the
# round-1 centroids are ROUND(...,9) per component BEFORE the round-2
# distances, so the two engines' AVG-addition-order ulp differences
# (~1e-14) cannot flip a borderline re-assignment. Scale shape: the
# seed and the k x 64 centroid frame are broadcast; each round is one
# map-side-collapsed N*k distance pass + a (cluster, dim)-key mean —
# nothing shuffles the embedding table at full width, and rounds
# compose (a production loop localCheckpoints between rounds).
# ---------------------------------------------------------------------------

_KM_K = 5


@query(
    "a0166_kmeans_lloyd",
    oracle=f"""
    WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c0 AS (SELECT vec_id AS cl, v AS cv FROM x WHERE vec_id < {_KM_K}),
    d1 AS (SELECT x.vec_id, c0.cl,
                  ROUND(list_reduce(list_transform(range(1, 65),
                        i -> (x.v[i] - c0.cv[i]) * (x.v[i] - c0.cv[i])),
                        (acc, z) -> acc + z), 9) AS d2
           FROM x CROSS JOIN c0),
    a1 AS (SELECT vec_id, cl,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
           FROM d1 QUALIFY rn = 1),
    c1 AS (SELECT a1.cl, r.dim, ROUND(AVG(x.v[r.dim]), 9) AS c
           FROM x JOIN a1 ON a1.vec_id = x.vec_id
           CROSS JOIN range(1, 65) r(dim)
           GROUP BY a1.cl, r.dim),
    d2r AS (SELECT x.vec_id, c1.cl,
                   ROUND(SUM((x.v[r.dim] - c1.c) * (x.v[r.dim] - c1.c)), 9) AS d2
            FROM x CROSS JOIN range(1, 65) r(dim)
            JOIN c1 ON c1.dim = r.dim
            GROUP BY x.vec_id, c1.cl),
    a2 AS (SELECT vec_id, cl, d2,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
           FROM d2r QUALIFY rn = 1)
    SELECT CAST(cl AS INTEGER) AS cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(SUM(d2), 6) AS inertia
    FROM a2 GROUP BY cl ORDER BY cluster
    """,
    description="k-means Lloyd training, two full rounds from the deterministic low-vec_id seed (k=5), hash-matched against a true SQL unroll of assign -> per-dim mean -> re-assign: per-cluster membership and inertia after round 2; distances 9-dp-rounded before every argmin (lowest-cluster ties), round-1 centroids 9-dp-rounded per component so cross-engine AVG addition-order ulps cannot flip a borderline re-assignment — the clustering primitive under SemDeDup/IVF/mixture curation, with broadcast-sized centroid state and map-side-collapsed N*k distance passes",
)
def a0166_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    c0 = emb.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cl"), F.col("v").alias("cv")
    )
    a1 = (
        emb.crossJoin(F.broadcast(c0))
        .select("vec_id", "cl", _l2sq9(F.col("v"), F.col("cv")).alias("d2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct(F.col("d2"), F.col("cl"))).alias("m"))
        .select("vec_id", F.col("m.cl").alias("cl"))
    )
    dims = emb.select("vec_id", F.posexplode("v").alias("dim0", "comp")).withColumn(
        "dim", F.col("dim0") + 1
    )
    c1 = (
        dims.join(a1, "vec_id")
        .groupBy("cl", "dim")
        .agg(F.round(F.avg("comp"), 9).alias("c"))
    )
    a2 = (
        dims.join(F.broadcast(c1), "dim")
        .groupBy("vec_id", "cl")
        .agg(F.round(F.sum((F.col("comp") - F.col("c")) * (F.col("comp") - F.col("c"))), 9).alias("d2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct(F.col("d2"), F.col("cl"))).alias("m"))
        .select(F.col("m.cl").alias("cl"), F.col("m.d2").alias("d2"))
    )
    return (
        a2.groupBy("cl")
        .agg(F.count(F.lit(1)).alias("n_members"), F.round(F.sum("d2"), 6).alias("inertia"))
        .select(F.col("cl").cast("int").alias("cluster"), "n_members", "inertia")
        .orderBy("cluster")
    )
