"""Round-12 wave (a0001–a0049 name range): scale-twin and new queries.

Named in the a00NN range BELOW a0050 so they sort into the driver's
50-slot correctness window ``sorted(queries())[:50]`` ahead of the
already-driver-dated a0050–a0099 block (VERDICT r11 item 6) — every NEW
query gets driver-dated in its own round; see COVERAGE.md.

Reference parity: no counterpart in the reference notebook
(kaggle/kaggle.py) — these extend the LLM-data-pipeline axis the brief
makes first-class (SemDeDup at production k, density clustering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as SIM
from ..sources import load_table
from .registry import query
from .similarity import _DIMS, _PAIR_COS, _SD_PLANT, _SD_THR

# ---------------------------------------------------------------------------
# a0001 — SemDeDup with the PRODUCTION k rule (the q114 scale twin,
# VERDICT r11 item 2). q114 fixes k to the 10 data labels for oracle
# parity, so its per-cluster blocked matmul grows QUADRATICALLY per
# decade (sf10 measured 501 s warm — the fixed-k regime). This twin
# applies the rule q114's docstring states in prose: pick
# k = ceil(N / target_cluster_size), so cluster size stays ~constant and
# total matmul work is k * target^2 = N * target — LINEAR in N.
#
# The coarse quantizer is deterministic and SQL-replayable: seeds are
# the corpus vectors with vec_id % step == 0 (step = ceil(N/k), dense
# vec_ids), every vector assigns to its nearest seed (d2 rounded to
# 9 dp, ties to the lowest seed id — both engines replay the exact
# rule), then the within-cell epsilon-ball pairs + connected
# components proceed exactly as q114. Seeding from a fixed stride is
# the standard cheap coarse quantizer (IVF does not need trained
# centroids to bound memory — it needs BALANCED BUCKETS). The collected
# codebook is k x 64 doubles = N/target rows — at 100 TB you cap the
# codebook by sampling or go two-level (coarse IVF over codebook
# shards); the mechanism under test is the k ∝ N rule that keeps the
# per-task matrix at target^2.
#
# k ∝ N alone is NOT enough under adversarial duplication — measured,
# not theorized: the sf10 corpus is the sf0.1 corpus 100x-replicated,
# so every stride seed is a copy of one of only 10 distinct patterns,
# the 9-dp d2 ties collapse all 1000 seeds onto 10, and the "balanced"
# cells come back as 10 cells of 20k vectors whose 3.2 GB matmuls OOM
# the workers. The production guard is the same salted per-bucket cap
# the LSH family uses (operators/dedup.py salt_buckets, a083): within
# each cell, rank members by md5(cell || vec_id) and shard at
# salt = (rank-1) div cap, so per-task work is capped at cap^2 whatever
# the data multiplicity. Within an oversized cell the shards only see
# their own members' pairs — the documented recall trade of every
# capped SemDeDup (the un-capped alternative is the OOM above); the
# oracle replays the identical salting, so the driver hash pins the
# exact capped semantics.
#
# Fixture: same planted near-dups as q114 (vec_id < 10 re-appear
# rescaled x1.01 at vec_id+100000); whether a planted pair is caught
# depends on both copies landing in the same cell — the oracle replays
# the identical rule, so the driver hash pins whatever the rule yields.
# ---------------------------------------------------------------------------

_AK_TARGET = 200  # target cluster size at bench SFs (production: a few thousand)
_AK_CAP = 200  # salted per-cell cap: per-task matmul never exceeds cap^2


@query(
    "a0001_semdedup_autok",
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    nk AS (SELECT COUNT(*) AS n,
                  CAST(CEIL(COUNT(*) / {_AK_TARGET}.0) AS BIGINT) AS k
           FROM base),
    st AS (SELECT CAST(CEIL(n / (k * 1.0)) AS BIGINT) AS step FROM nk),
    x AS (
      SELECT vec_id, v FROM base
      UNION ALL
      SELECT vec_id + 100000, list_transform(v, e -> e * 1.01)
      FROM base WHERE vec_id < {_SD_PLANT}),
    seeds AS (SELECT vec_id AS sid, v AS sv FROM base, st WHERE vec_id % step = 0),
    dist AS (
      SELECT x.vec_id, s.sid,
             ROUND(SUM((x.v[r.dim] - s.sv[r.dim]) * (x.v[r.dim] - s.sv[r.dim])), 9) AS d2
      FROM x CROSS JOIN range(1, {_DIMS + 1}) r(dim) CROSS JOIN seeds s
      GROUP BY x.vec_id, s.sid),
    best AS (
      SELECT vec_id, sid AS cluster,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, sid) AS rn
      FROM dist),
    assign AS (
      SELECT x.vec_id, x.v, b.cluster
      FROM x JOIN best b ON b.vec_id = x.vec_id AND b.rn = 1),
    sal AS (
      SELECT vec_id, v, cluster,
             CAST(FLOOR((ROW_NUMBER() OVER (
               PARTITION BY cluster
               ORDER BY md5(CAST(cluster AS VARCHAR) || CAST(vec_id AS VARCHAR)),
                        vec_id) - 1) / {_AK_CAP}) AS BIGINT) AS salt
      FROM assign),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sal a JOIN sal b
        ON a.cluster = b.cluster AND a.salt = b.salt AND a.vec_id < b.vec_id
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
    description=f"SemDeDup at the PRODUCTION scaling rules (q114's scale twin): k = ceil(N/{_AK_TARGET}) stride-seeded coarse cells, broadcast-codebook nearest-seed assignment (one Arrow-batched pass, d2 rounded 9 with ties to the lowest seed id), PLUS the salted per-cell cap (rank by md5(cell||id), salt = (rank-1) div {_AK_CAP} — the a083/LSH guard, both engines replay it) so a 100x-replicated duplicate clique can never re-inflate a cell past cap^2, then q114's blocked-matmul epsilon-ball pairs + connected components — total cost LINEAR in N per decade, the measured fix for q114's fixed-k quadratic regime at sf10",
)
def a0001_semdedup_autok(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators import dedup as D

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", SIM.as_double("embedding").alias("v"))
    # two driver scalars + the k x 64 coarse codebook (k = N/target —
    # bounded for any bench SF; at extreme scale sample or go two-level)
    n = base.count()
    k = -(-n // _AK_TARGET)
    step = -(-n // k)
    seed_rows = base.filter(F.col("vec_id") % step == 0).orderBy("vec_id").collect()
    sids = np.array([r["vec_id"] for r in seed_rows], dtype=np.int64)
    cmat = np.array([r["v"] for r in seed_rows], dtype=np.float64)

    planted = base.filter(F.col("vec_id") < _SD_PLANT).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("v", lambda e: e * F.lit(1.01)).alias("v"),
    )
    x = base.unionAll(planted)

    c2 = (cmat * cmat).sum(axis=1)[None, :]

    def assign_batches(it):
        # nearest stride-seed per vector, BLAS expansion form
        # |x|^2 - 2 xC' + |c|^2 (one dgemm per Arrow batch — the dim
        # loop measured 40+ s of the sf10 wall): ROUND(d2, 9) absorbs
        # the float reassociation vs the oracle's SUM, the same round-9
        # argument the q114 cosine kernel rests on, and exact-duplicate
        # seeds produce bitwise-equal d2 so ties still break to the
        # lowest seed id (np.argmin returns the FIRST minimum; codebook
        # rows are sorted by vec_id), matching ORDER BY d2, sid
        for pdf in it:
            if len(pdf) == 0:
                continue
            xm = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            x2 = (xm * xm).sum(axis=1, keepdims=True)
            acc = x2 - 2.0 * (xm @ cmat.T) + c2
            cl = sids[np.argmin(np.round(acc, 9), axis=1)]
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "cluster": cl, "v": pdf["v"]})

    assign = x.mapInPandas(assign_batches, "vec_id long, cluster long, v array<double>")

    # salted per-cell cap (operators/dedup.py salt_buckets idiom): rank
    # members by a deterministic pseudo-random order inside each cell —
    # a PARTITIONED window, never a global sort — and shard at the cap
    from pyspark.sql import Window as W

    wc = W.partitionBy("cluster").orderBy(
        F.md5(F.concat(F.col("cluster").cast("string"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    salted = assign.withColumn(
        "salt", F.floor((F.row_number().over(wc) - 1) / _AK_CAP).cast("long")
    )

    thr = _SD_THR

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # one dense matmul per ~target-sized cell (the q114 kernel,
        # similarity.py:447): n x 64 -> n x n cosines, float64 so
        # round(cos, 9) agrees with the SQL oracle
        ids = pdf["vec_id"].to_numpy()
        xm = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(xm, axis=1)
        norms[norms == 0.0] = 1.0
        cos = (xm @ xm.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = np.round(cos[iu, ju], 9) >= thr
        a, b = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame({"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)})

    pairs = salted.groupBy("cluster", "salt").applyInPandas(
        cluster_pairs, "id_a long, id_b long"
    )
    labels = D.near_dup_clusters(pairs)
    return (
        labels.filter(F.col("id") != F.col("cluster"))
        .select(F.col("id").alias("removed_id"), F.col("cluster").alias("kept_id"))
        .orderBy("removed_id")
    )
