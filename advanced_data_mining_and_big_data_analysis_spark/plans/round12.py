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
# codebook with the two-level build a0023 implements (plans/round14.py:
# sqrt(N)-sized L1 collect + distributed per-cell refine); the
# mechanism under test HERE is the k ∝ N rule that keeps the per-task
# matrix at target^2.
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
    from ..operators import dedup as D

    salted = _ak_salted_assign(spark, sf_dir)
    thr = _SD_THR

    import numpy as np
    import pandas as pd

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


def _ak_salted_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The a0001 coarse-quantize + salted-cap frame (vec_id, cluster, v,
    salt), exposed separately so tests can pin the OOM-guard invariant —
    max per-(cluster, salt) group size <= _AK_CAP — on the REAL frame
    (planted rows included) rather than re-deriving it."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", SIM.as_double("embedding").alias("v"))
    # two driver scalars + the k x 64 coarse codebook (k = N/target —
    # bounded for any bench SF; at extreme scale swap in a0023's
    # two-level build: O(sqrt N) driver traffic, same cell semantics)
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
    return assign.withColumn(
        "salt", F.floor((F.row_number().over(wc) - 1) / _AK_CAP).cast("long")
    )


# ---------------------------------------------------------------------------
# a0002 — HDBSCAN-style density-level hierarchy over the customer
# feature grid (the VERDICT r11 item-8 stretch, next to a0070 k-means
# and a0100 grid mode-seeking). Points are customers embedded at
# (x, y) = (ln(1+total spend), ln(1+order count)), snapped to an
# h-sized grid; for each density level tau in _DLH_TAUS the level set
# is DBSCAN*-flat: dense cells (count >= tau) merge through 8-way
# adjacency into clusters (Campello/Moulavi/Sander's hierarchy read at
# fixed lambdas — the condensed-tree profile n_clusters(tau) is what
# HDBSCAN builds its stability measure on).
#
# Scale shape: the ONLY data-sized work is one groupBy(cell) count —
# the cell graph is bounded by GRID EXTENT (~(range/h)^2 cells, and the
# feature range grows logarithmically with data), NOT by N, so the
# level sets, adjacency and connected components all run on a frame
# that stays ~10^4 rows at any corpus size. Compare a0001/q114: density
# clustering that materializes point-pair neighborhoods inherits a
# quadratic cell-occupancy term; aggregating to cell counts FIRST is
# what survives 100 TB.
#
# CC on the cell graph is hook+jump min-label propagation: each round
# takes the neighbor minimum, then COMPOSES the label map with itself
# (label := label-of-label), so convergence needs O(log diameter)
# rounds instead of O(diameter); _DLH_ROUNDS = 8 covers diameter 2^8 on
# a graph whose true diameter is bounded by the grid extent, and a
# final fixpoint assertion raises rather than return partial labels
# (the near_dup_clusters discipline, dedup.py:470).
# ---------------------------------------------------------------------------

_DLH_H = 0.05  # grid cell side in feature units
_DLH_TAUS = (4, 16, 64, 256)
_DLH_ROUNDS = 8


def _dlh_feats_sql() -> str:
    return f"""
      SELECT o_custkey AS id,
             ROUND(LN(1 + CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) / 100.0), 6) AS x,
             ROUND(LN(1 + COUNT(*)), 6) AS y
      FROM orders GROUP BY 1
    """


@query(
    "a0002_density_level_hierarchy",
    oracle=f"""
    WITH RECURSIVE f AS ({_dlh_feats_sql()}),
    g AS (
      SELECT CAST(FLOOR(x / {_DLH_H}) AS BIGINT) AS cx,
             CAST(FLOOR(y / {_DLH_H}) AS BIGINT) AS cy,
             COUNT(*) AS n
      FROM f GROUP BY 1, 2),
    tot AS (SELECT COUNT(*) AS n_pts FROM f),
    lv(tau) AS (VALUES (4), (16), (64), (256)),
    dc AS (SELECT lv.tau, cx, cy, n, cx * 100000 + cy AS cid
           FROM g CROSS JOIN lv WHERE n >= lv.tau),
    ed AS (
      SELECT a.tau, a.cid AS ca, b.cid AS cb
      FROM dc a JOIN dc b
        ON a.tau = b.tau AND abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       AND a.cid <> b.cid),
    reach(tau, id, lab) AS (
      SELECT tau, cid, cid FROM dc
      UNION
      SELECT ed.tau, ed.ca, reach.lab
      FROM ed JOIN reach ON ed.tau = reach.tau AND ed.cb = reach.id),
    labels AS (SELECT tau, id, MIN(lab) AS lab FROM reach GROUP BY 1, 2),
    sizes AS (
      SELECT l.tau, l.lab, SUM(dc.n) AS pts
      FROM labels l JOIN dc ON dc.tau = l.tau AND dc.cid = l.id
      GROUP BY 1, 2),
    lvl AS (
      SELECT s.tau,
             COUNT(*) AS n_clusters,
             MAX(s.pts) AS largest_cluster_pts,
             SUM(s.pts) AS dense_pts,
             (SELECT COUNT(*) FROM dc WHERE dc.tau = s.tau) AS n_dense_cells
      FROM sizes s GROUP BY s.tau)
    SELECT lv.tau,
           CAST(COALESCE(l.n_dense_cells, 0) AS BIGINT) AS n_dense_cells,
           CAST(COALESCE(l.n_clusters, 0) AS BIGINT) AS n_clusters,
           CAST(COALESCE(l.largest_cluster_pts, 0) AS BIGINT) AS largest_cluster_pts,
           CAST(t.n_pts - COALESCE(l.dense_pts, 0) AS BIGINT) AS noise_pts
    FROM lv LEFT JOIN lvl l ON l.tau = lv.tau CROSS JOIN tot t
    ORDER BY lv.tau
    """,
    description=f"HDBSCAN-style density-level hierarchy (condensed-tree profile): customers embed at (ln spend, ln orders) on an h={_DLH_H} grid, and each density level tau in {_DLH_TAUS} reads the DBSCAN* flat clustering — dense cells (>= tau points) merged through 8-way adjacency — reporting n_dense_cells / n_clusters / largest cluster / noise per level; the only data-sized work is ONE groupBy(cell) count (the cell graph is bounded by grid extent, not N), and the CC is hook+jump min-label propagation converging in O(log diameter) rounds with a fixpoint assertion",
)
def a0002_density_level_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    feats = orders.groupBy("o_custkey").agg(
        F.round(
            F.log(
                1.0 + F.round(F.sum("o_totalprice") * 100, 0).cast("long") / 100.0
            ),
            6,
        ).alias("x"),
        F.round(F.log(1.0 + F.count("*")), 6).alias("y"),
    )
    cells = (
        feats.groupBy(
            F.floor(F.col("x") / _DLH_H).cast("long").alias("cx"),
            F.floor(F.col("y") / _DLH_H).cast("long").alias("cy"),
        )
        .agg(F.count("*").alias("n"))
        .withColumn("cid", F.col("cx") * 100000 + F.col("cy"))
        .localCheckpoint(eager=False)  # every level set reuses the counts
    )
    tot = feats.agg(F.count("*").alias("n_pts"))
    taus = F.array(*[F.lit(t) for t in _DLH_TAUS])
    dc = (
        cells.select("cx", "cy", "n", "cid", F.explode(taus).alias("tau"))
        .filter(F.col("n") >= F.col("tau"))
        .localCheckpoint(eager=False)  # edges + sizes + CC reuse it
    )
    # 8-way adjacency as an equi-join: each dense cell probes its 9-cell
    # neighborhood (cell frame is grid-extent-bounded, never data-sized)
    nine = F.array(*[F.lit(d) for d in range(-1, 2)])
    probes = dc.select(
        "tau",
        F.col("cid").alias("ca"),
        F.explode(
            F.flatten(
                F.transform(
                    nine,
                    lambda dx: F.transform(
                        nine, lambda dy: (F.col("cx") + dx) * 100000 + F.col("cy") + dy
                    ),
                )
            )
        ).alias("nk"),
    ).filter(F.col("nk") != F.col("ca"))
    dcb = dc.select(F.col("tau").alias("tb"), F.col("cid").alias("cb"))
    edges = probes.join(
        dcb, (F.col("nk") == F.col("cb")) & (F.col("tau") == F.col("tb"))
    ).select("tau", "ca", "cb")
    both = edges.unionAll(
        edges.select("tau", F.col("cb").alias("ca"), F.col("ca").alias("cb"))
    ).localCheckpoint(eager=False)
    labels = dc.select("tau", F.col("cid").alias("id"), F.col("cid").alias("lab"))
    for r in range(_DLH_ROUNDS):
        nmin = (
            both.join(labels, (both.tau == labels.tau) & (both.cb == labels.id))
            .groupBy(both.tau.alias("tau"), F.col("ca").alias("id"))
            .agg(F.min("lab").alias("nlab"))
        )
        hooked = (
            labels.join(nmin, ["tau", "id"], "left")
            .select("tau", "id", F.least("lab", "nlab").alias("lab"))
        )
        # jump: label := label-of-label (labels are themselves cell ids)
        jm = hooked.select(
            F.col("tau").alias("jtau"), F.col("id").alias("jid"), F.col("lab").alias("jlab")
        )
        labels = (
            hooked.join(
                jm, (hooked.tau == jm.jtau) & (hooked.lab == jm.jid), "left"
            )
            .select("tau", "id", F.least("lab", "jlab").alias("lab"))
            .localCheckpoint(eager=False)
        )
    # fixpoint assertion: one more hook round must change nothing
    verify = (
        both.join(labels, (both.tau == labels.tau) & (both.cb == labels.id))
        .groupBy(both.tau.alias("tau"), F.col("ca").alias("id"))
        .agg(F.min("lab").alias("nlab"))
        .join(labels, ["tau", "id"])
        .filter(F.col("nlab") < F.col("lab"))
        .count()
    )
    if verify != 0:
        raise RuntimeError(
            f"density-level CC did not converge in {_DLH_ROUNDS} hook+jump rounds"
        )
    sizes = (
        labels.join(
            dc.select("tau", F.col("cid").alias("id"), "n"), ["tau", "id"]
        )
        .groupBy("tau", "lab")
        .agg(F.sum("n").alias("pts"))
    )
    lvl = sizes.groupBy("tau").agg(
        F.count("*").alias("n_clusters"),
        F.max("pts").alias("largest_cluster_pts"),
        F.sum("pts").alias("dense_pts"),
    )
    ncells = dc.groupBy("tau").agg(F.count("*").alias("n_dense_cells"))
    lv = dc.sparkSession.createDataFrame([(t,) for t in _DLH_TAUS], "tau int")
    return (
        lv.join(F.broadcast(ncells), "tau", "left")
        .join(F.broadcast(lvl), "tau", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "tau",
            F.coalesce("n_dense_cells", F.lit(0)).cast("long").alias("n_dense_cells"),
            F.coalesce("n_clusters", F.lit(0)).cast("long").alias("n_clusters"),
            F.coalesce("largest_cluster_pts", F.lit(0))
            .cast("long")
            .alias("largest_cluster_pts"),
            (F.col("n_pts") - F.coalesce("dense_pts", F.lit(0)))
            .cast("long")
            .alias("noise_pts"),
        )
        .orderBy("tau")
    )
