"""Round-11 wave (a0070–a0089): classical data-mining and statistics
operators that deepen the engine's analytics axis — Lloyd k-means,
centroid silhouette, chi-square/Cramér's V association, Mann-Whitney U,
binary-segmentation changepoint, Benford first-digit audit, approximate
functional-dependency discovery, per-node clustering coefficient,
KMV/theta sketch set operations, RAKE keyword extraction, winnowing
fingerprints, Grubbs outlier rounds, bloom semi-join reduction, rank-1
matrix-factorization gradient step, uplift segmentation, TF-IDF keyword
ranking, Spearman/Kendall rank correlation, and Lorenz/Gini
concentration.

Named a0070–a0089 so they sort INSIDE the driver's 50-slot correctness
window (after the renamed a0050–a0069 fodder, before the already-dated
a0093 block) — see COVERAGE.md for the window mechanics.

Reference parity: no counterpart in the reference notebook
(kaggle/kaggle.py) — these extend the data-mining axis of the course
title (clustering, hypothesis testing, association analysis, keyword
extraction are textbook material) and the data-quality axis (Benford,
FD discovery) a 100 TB lakehouse audit needs.

Every query carries a full DuckDB value-hash oracle. Float discipline
per FIXTURES.md: money summed at cents, every emitted float rounded
<= 6 dp on BOTH engines, distances rounded to 9 dp BEFORE every argmin,
ties broken by an integer key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# ---------------------------------------------------------------------------
# a0070 — Lloyd k-means (k=8, 2 iterations) over the 64-dim embedding
# table, deterministic init = the 8 lowest-vec_id vectors (production
# would use k-means||; the ITERATION plan is identical, init is an
# input). Scale shape: assignment is a ROW-LOCAL argmin against a
# 1-row broadcast carrying all k centroids as array<struct> — zero
# shuffle of the corpus; the centroid update is a k-key groupBy whose
# partial aggregation reduces each task to k×64 sums before the
# exchange. Nothing full-width ever shuffles; per-iteration cost is
# one corpus scan. Centroid means are rounded to 6 dp on BOTH engines
# before the next distance pass (engine-stable across partial-agg
# orders); distances rounded to 9 dp before every argmin, ties by
# lowest cluster id.
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_DIMS = 64


def _km_d2_duck(v: str, cv: str) -> str:
    return (
        f"round(list_reduce(list_transform(range(1, {_KM_DIMS + 1}), "
        f"i -> ({v}[i] - {cv}[i]) * ({v}[i] - {cv}[i])), (x, y) -> x + y), 9)"
    )


def _km_assign_duck(src: str, cb: str) -> str:
    """CTE text: nearest-centroid assignment of e-rows in `src` to `cb`."""
    return f"""
      SELECT vec_id, v, cid, d2 FROM (
        SELECT s.vec_id, s.v, c.cid, {_km_d2_duck('s.v', 'c.cv')} AS d2,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id
                                  ORDER BY {_km_d2_duck('s.v', 'c.cv')}, c.cid) AS rn
        FROM {src} s CROSS JOIN {cb} c
      ) WHERE rn = 1
    """


_KM_CV = ", ".join(f"round(avg(v[{i}]), 6)" for i in range(1, _KM_DIMS + 1))


def _km_d2_spark(v: Column, cv: Column) -> Column:
    # unrolled static sum (q120 A/B: interpreted HOF folds lose 1.7x at
    # sf1.0; the static tree is what survives scale-up)
    terms: Column | None = None
    for i in range(1, _KM_DIMS + 1):
        t = F.element_at(v, i) - F.element_at(cv, i)
        t = t * t
        terms = t if terms is None else terms + t
    return F.round(terms, 9)


def _km_assign_spark(emb: DataFrame, cb: DataFrame) -> DataFrame:
    """Row-local argmin against a 1-row broadcast of all k centroids."""
    cb_row = cb.agg(
        F.collect_list(F.struct(F.col("cid"), F.col("cv"))).alias("cbs")
    )
    scored = emb.crossJoin(F.broadcast(cb_row)).select(
        "vec_id",
        "v",
        F.array_min(
            F.transform(
                F.col("cbs"),
                lambda c: F.struct(
                    _km_d2_spark(F.col("v"), c["cv"]).alias("d2"),
                    c["cid"].alias("cid"),
                ),
            )
        ).alias("m"),
    )
    return scored.select("vec_id", "v", F.col("m.cid").alias("cid"), F.col("m.d2").alias("d2"))


def _km_update_spark(assigned: DataFrame) -> DataFrame:
    cents = assigned.groupBy("cid").agg(
        *[
            F.round(F.avg(F.element_at("v", i)), 6).alias(f"c{i}")
            for i in range(1, _KM_DIMS + 1)
        ]
    )
    return cents.select(
        "cid", F.array(*[F.col(f"c{i}") for i in range(1, _KM_DIMS + 1)]).alias("cv")
    ).localCheckpoint(eager=True)  # 8-row frame: truncate the unrolled lineage


@query(
    "a0070_kmeans_lloyd",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cb0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {_KM_K}),
    a1 AS ({_km_assign_duck('e', 'cb0')}),
    cb1 AS (SELECT cid, [{_KM_CV}] AS cv FROM a1 GROUP BY cid),
    a2 AS ({_km_assign_duck('e', 'cb1')}),
    cb2 AS (SELECT cid, [{_KM_CV}] AS cv FROM a2 GROUP BY cid),
    a3 AS ({_km_assign_duck('e', 'cb2')})
    SELECT CAST(cid AS BIGINT) AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(SUM(d2), 4) AS inertia, ROUND(AVG(d2), 6) AS mean_d2
    FROM a3 GROUP BY cid ORDER BY cluster_id
    """,
    description=f"Lloyd k-means (k={_KM_K}, 2 update iterations + final assignment) over the {_KM_DIMS}-dim embeddings: row-local argmin against a 1-row broadcast of all centroids (ZERO corpus shuffle per assignment), k-key map-side-combined mean update, 6-dp-rounded centroids / 9-dp-rounded distances / lowest-cid ties for engine parity; per-cluster size, inertia and mean squared distance — the canonical clustering loop, one corpus scan per iteration",
)
def a0070_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cb = emb.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    for _ in range(2):
        cb = _km_update_spark(_km_assign_spark(emb, cb))
    final = _km_assign_spark(emb, cb)
    return (
        final.groupBy(F.col("cid").cast("long").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.sum("d2"), 4).alias("inertia"),
            F.round(F.avg("d2"), 6).alias("mean_d2"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# a0071 — centroid silhouette audit of the deterministic k=8 seeding
# (the cluster-quality diagnostic that decides k): per vector, a = the
# Euclidean distance to its own (nearest) centroid and b = the distance
# to the second-nearest, s = (b − a) / max(a, b) — the simplified
# (centroid-based) silhouette that stays LINEAR in the corpus where the
# classic pairwise formula is quadratic. Row-local: the per-vector
# distance list is k structs sorted in-row; no window, no shuffle until
# the per-cluster rollup. Distances rounded to 9 dp before the sort
# (ties by cid), silhouettes to 6.
# ---------------------------------------------------------------------------


@query(
    "a0071_centroid_silhouette",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cb AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {_KM_K}),
    pairs AS (
      SELECT e.vec_id, c.cid,
             round(sqrt({_km_d2_duck('e.v', 'c.cv')}), 9) AS d,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY round(sqrt({_km_d2_duck('e.v', 'c.cv')}), 9), c.cid) AS rn
      FROM e CROSS JOIN cb c
    ),
    ab AS (
      SELECT vec_id,
             MAX(CASE WHEN rn = 1 THEN cid END) AS cid,
             MAX(CASE WHEN rn = 1 THEN d END) AS a,
             MAX(CASE WHEN rn = 2 THEN d END) AS b
      FROM pairs WHERE rn <= 2 GROUP BY vec_id
    ),
    sil AS (
      SELECT cid, CASE WHEN GREATEST(a, b) = 0 THEN 0.0
                       ELSE (b - a) / GREATEST(a, b) END AS s
      FROM ab
    )
    SELECT CAST(cid AS BIGINT) AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(s), 6) AS avg_sil, ROUND(MIN(s), 6) AS min_sil,
           ROUND(MAX(s), 6) AS max_sil
    FROM sil GROUP BY cid ORDER BY cluster_id
    """,
    description=f"centroid-based silhouette audit of the deterministic k={_KM_K} seeding: per vector a = distance to nearest centroid, b = second-nearest, s = (b−a)/max(a,b) — the LINEAR cluster-quality diagnostic (classic silhouette is quadratic in the corpus); the k-struct distance list sorts in-row (no window, no corpus shuffle before the per-cluster rollup), 9-dp distances / cid ties / 6-dp silhouettes for engine parity",
)
def a0071_centroid_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cb = emb.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    cb_row = cb.agg(F.collect_list(F.struct("cid", "cv")).alias("cbs"))
    ds = emb.crossJoin(F.broadcast(cb_row)).select(
        "vec_id",
        F.array_sort(
            F.transform(
                F.col("cbs"),
                lambda c: F.struct(
                    F.round(F.sqrt(_km_d2_spark(F.col("v"), c["cv"])), 9).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        ).alias("sd"),
    )
    ab = ds.select(
        F.col("sd")[0]["cid"].alias("cid"),
        F.col("sd")[0]["d"].alias("a"),
        F.col("sd")[1]["d"].alias("b"),
    )
    s = F.when(F.greatest("a", "b") == 0, F.lit(0.0)).otherwise(
        (F.col("b") - F.col("a")) / F.greatest("a", "b")
    )
    return (
        ab.select(F.col("cid").cast("long").alias("cluster_id"), s.alias("s"))
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("s"), 6).alias("avg_sil"),
            F.round(F.min("s"), 6).alias("min_sil"),
            F.round(F.max("s"), 6).alias("max_sil"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# a0072 — chi-square test of independence + Cramér's V over categorical
# column pairs (the association screen run before any categorical
# encoding): three pairs across customer ⋈ orders. Everything after the
# first groupBy is DIMENSION-sized (cells ≤ |a|×|b|); marginals
# broadcast back onto the cell frame, so the fact table is scanned once
# per pair and never re-shuffled. Expected counts are exact integer
# ratios in doubles; chi² rounded to 4, V to 6.
# ---------------------------------------------------------------------------

_CHI_PAIRS = [
    ("c_mktsegment", "o_orderpriority"),
    ("c_mktsegment", "o_orderstatus"),
    ("o_orderpriority", "o_orderstatus"),
]


def _chi2_duck(a: str, b: str) -> str:
    return f"""
      SELECT '{a}->{b}' AS pair, n, r_levels, c_levels,
             CAST((r_levels - 1) * (c_levels - 1) AS BIGINT) AS dof,
             ROUND(chi2, 4) AS chi2,
             ROUND(sqrt(chi2 / (n * LEAST(r_levels - 1, c_levels - 1))), 6) AS cramers_v
      FROM (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT av) AS BIGINT) AS r_levels,
               CAST(COUNT(DISTINCT bv) AS BIGINT) AS c_levels,
               SUM((cnt - rt * ct / tot) * (cnt - rt * ct / tot) / (rt * ct / tot)) AS chi2
        FROM (
          SELECT av, bv, cnt,
                 SUM(cnt) OVER (PARTITION BY av) AS rt,
                 SUM(cnt) OVER (PARTITION BY bv) AS ct,
                 SUM(cnt) OVER () AS tot
          FROM (SELECT {a} AS av, {b} AS bv, COUNT(*) * 1.0 AS cnt
                FROM customer JOIN orders ON c_custkey = o_custkey
                GROUP BY 1, 2)
        )
      )
    """


@query(
    "a0072_chi2_cramers",
    oracle="\nUNION ALL\n".join(_chi2_duck(a, b) for a, b in _CHI_PAIRS)
    + "\nORDER BY pair",
    description="chi-square independence test + Cramér's V over three categorical pairs (mktsegment × orderpriority / orderstatus, priority × status on customer ⋈ orders): one fact groupBy per pair, then everything is cell-frame-sized (marginals as window sums over ≤|a|×|b| cells); chi² rounded 4, V rounded 6 — the association screen behind every categorical-encoding decision",
)
def a0072_chi2_cramers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderstatus"
    )
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_orderpriority", "o_orderstatus"
    ).localCheckpoint(eager=False)  # 3 pair scans reuse one fact join

    out = None
    for a, b in _CHI_PAIRS:
        cells = joined.groupBy(F.col(a).alias("av"), F.col(b).alias("bv")).agg(
            (F.count("*") * 1.0).alias("cnt")
        )
        wa, wb, wt = Window.partitionBy("av"), Window.partitionBy("bv"), Window.partitionBy()
        # windows over the <=|a|x|b| CELL frame, never fact rows
        m = cells.select(
            "av",
            "bv",
            "cnt",
            F.sum("cnt").over(wa).alias("rt"),
            F.sum("cnt").over(wb).alias("ct"),
            F.sum("cnt").over(wt).alias("tot"),
        )
        exp = F.col("rt") * F.col("ct") / F.col("tot")
        stat = m.agg(
            F.sum("cnt").cast("long").alias("n"),
            F.countDistinct("av").alias("r_levels"),
            F.countDistinct("bv").alias("c_levels"),
            F.sum((F.col("cnt") - exp) * (F.col("cnt") - exp) / exp).alias("chi2"),
        )
        row = stat.select(
            F.lit(f"{a}->{b}").alias("pair"),
            "n",
            "r_levels",
            "c_levels",
            ((F.col("r_levels") - 1) * (F.col("c_levels") - 1)).cast("long").alias("dof"),
            F.round("chi2", 4).alias("chi2"),
            F.round(
                F.sqrt(F.col("chi2") / (F.col("n") * F.least(F.col("r_levels") - 1, F.col("c_levels") - 1))),
                6,
            ).alias("cramers_v"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("pair")


# ---------------------------------------------------------------------------
# a0073 — Mann-Whitney U rank-sum test (returned vs non-returned line
# items' extended price): the distribution-free two-sample test. Ranks
# are MID-ranks over the distinct-value frame; the prefix sum that
# produces them is SHARDED — a per-bucket running sum (windows
# partitioned by a fixed-width value bucket) plus an exclusive
# bucket-offset cumsum over the ≤128-row bucket frame — the two-pass
# distributed prefix-sum pattern (q109's packing lesson), never a
# global window over data rows. All rank arithmetic is exact in
# doubles (0.5-granular sums far below 2^53), so U and z are
# bit-identical across engines before rounding; tie-corrected normal
# approximation, p from the shared A&S 7.1.26 polynomial.
# ---------------------------------------------------------------------------

_MW_BUCKET_W = 1000.0  # price-space bucket width; <=128 buckets at TPC-H scale
# Abramowitz & Stegun 7.1.26 constants (shared with a0059)
_AS_T = 0.2316419
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)


def _phi_upper_sql(x: str) -> str:
    t = f"(1.0 / (1.0 + {_AS_T} * {x}))"
    poly = " + ".join(f"{b} * power({t}, {i})" for i, b in enumerate(_AS_B, start=1))
    return f"(exp(-({x}) * ({x}) / 2.0) / sqrt(2.0 * pi()) * ({poly}))"


def _phi_upper_spark(x: Column) -> Column:
    t = 1.0 / (1.0 + _AS_T * x)
    poly = None
    for i, b in enumerate(_AS_B, start=1):
        term = F.lit(b) * F.pow(t, F.lit(float(i)))
        poly = term if poly is None else poly + term
    return F.exp(-x * x / 2.0) / F.sqrt(F.lit(2.0) * F.lit(3.141592653589793)) * poly


@query(
    "a0073_mannwhitney_u",
    oracle=f"""
    WITH rows_in AS (
      SELECT l_extendedprice AS val,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_r
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    vals AS (
      SELECT val, COUNT(*) * 1.0 AS cnt, SUM(is_r) * 1.0 AS cnt_r
      FROM rows_in GROUP BY val
    ),
    ranked AS (
      SELECT val, cnt, cnt_r,
             COALESCE(SUM(cnt) OVER (ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (cnt + 1) / 2.0 AS midrank
      FROM vals
    ),
    s AS (
      SELECT SUM(cnt_r) AS n1, SUM(cnt - cnt_r) AS n2, SUM(cnt) AS n,
             SUM(cnt_r * midrank) AS r1,
             SUM(CASE WHEN cnt > 1 THEN cnt * cnt * cnt - cnt ELSE 0 END) AS tie3,
             CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS tied_values
      FROM ranked
    ),
    u AS (
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, tied_values,
             r1 - n1 * (n1 + 1) / 2.0 AS u1,
             n1 * n2 / 2.0 AS mu,
             sqrt(n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))) AS sd
      FROM s
    )
    SELECT n1, n2, tied_values, ROUND(u1, 1) AS u_stat, ROUND(mu, 1) AS u_mean,
           ROUND((u1 - mu) / sd, 4) AS z_stat,
           ROUND(2.0 * {_phi_upper_sql('abs((u1 - mu) / sd)')}, 6) AS p_value
    FROM u
    """,
    description="Mann-Whitney U rank-sum test of returned ('R') vs non-returned ('N') extended prices: mid-ranks over the distinct-value frame via a SHARDED two-pass prefix sum (per-bucket running window + exclusive offset cumsum over the ≤128-row bucket frame — never a global window over data rows), exact 0.5-granular rank arithmetic (bit-identical cross-engine), tie-corrected normal approximation, two-sided p from the shared A&S 7.1.26 polynomial",
)
def a0073_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice", "l_returnflag")
    rows_in = li.filter(F.col("l_returnflag").isin("R", "N")).select(
        F.col("l_extendedprice").alias("val"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_r"),
    )
    vals = rows_in.groupBy("val").agg(
        (F.count("*") * 1.0).alias("cnt"), (F.sum("is_r") * 1.0).alias("cnt_r")
    )
    # two-pass distributed prefix sum over the distinct-value frame:
    # in-bucket running sums shard by a fixed-width price bucket; bucket
    # offsets are an exclusive cumsum over the bounded bucket frame.
    b = vals.withColumn("bkt", F.floor(F.col("val") / _MW_BUCKET_W).cast("long"))
    win_in = (
        Window.partitionBy("bkt").orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    )
    within = b.withColumn("run_in", F.coalesce(F.sum("cnt").over(win_in), F.lit(0.0)))
    btot = b.groupBy("bkt").agg(F.sum("cnt").alias("btot"))
    # exclusive prefix over the <=128-row bucket frame
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select("bkt", F.coalesce(F.sum("btot").over(wb), F.lit(0.0)).alias("off"))
    ranked = within.join(F.broadcast(boff), "bkt").select(
        "val",
        "cnt",
        "cnt_r",
        (F.col("off") + F.col("run_in") + (F.col("cnt") + 1) / 2.0).alias("midrank"),
    )
    s = ranked.agg(
        F.sum("cnt_r").alias("n1"),
        F.sum(F.col("cnt") - F.col("cnt_r")).alias("n2"),
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt_r") * F.col("midrank")).alias("r1"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).otherwise(0.0)
        ).alias("tie3"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).cast("long").alias("tied_values"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    mu = F.col("n1") * F.col("n2") / 2.0
    sd = F.sqrt(
        F.col("n1") * F.col("n2") / 12.0
        * ((F.col("n") + 1) - F.col("tie3") / (F.col("n") * (F.col("n") - 1)))
    )
    z = (u1 - mu) / sd
    return s.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        "tied_values",
        F.round(u1, 1).alias("u_stat"),
        F.round(mu, 1).alias("u_mean"),
        F.round(z, 4).alias("z_stat"),
        F.round(2.0 * _phi_upper_spark(F.abs(z)), 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# a0074 — binary-segmentation changepoint detection on the daily
# revenue series: for every candidate split t, the variance-reduction
# gain n_l(μ_l−μ)² + n_r(μ_r−μ)² from prefix sums over the
# calendar-bounded daily rollup; top-5 candidates. One pass builds the
# prefix frame; gains are exact (cents prefix sums stay integer-valued
# in doubles) so the ranking is engine-stable; gain rounded to 4.
# This is the first split of the PELT/binseg family — each recursion
# level is the same bounded-frame scan.
# ---------------------------------------------------------------------------

_BS_MIN_SEG = 3
_BS_TOP = 5


@query(
    "a0074_binseg_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS yc
      FROM orders GROUP BY 1
    ),
    pre AS (
      SELECT day,
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             CAST(SUM(yc) OVER (ORDER BY day) AS DOUBLE) AS cs
      FROM daily
    ),
    tot AS (SELECT COUNT(*) * 1.0 AS n, CAST(SUM(yc) AS DOUBLE) AS s FROM daily),
    gains AS (
      SELECT day, rn, n,
             (rn * (cs / rn - s / n) * (cs / rn - s / n)
              + (n - rn) * ((s - cs) / (n - rn) - s / n) * ((s - cs) / (n - rn) - s / n))
             / 10000.0 AS gain,
             cs / rn / 100.0 AS mean_left, (s - cs) / (n - rn) / 100.0 AS mean_right
      FROM pre CROSS JOIN tot
      WHERE rn >= {_BS_MIN_SEG} AND rn <= n - {_BS_MIN_SEG}
    )
    SELECT day, CAST(rn AS BIGINT) AS t_index,
           CAST(rn AS BIGINT) AS n_left, CAST(n - rn AS BIGINT) AS n_right,
           ROUND(mean_left, 2) AS mean_left, ROUND(mean_right, 2) AS mean_right,
           ROUND(gain, 4) AS gain
    FROM gains
    ORDER BY ROUND(gain, 4) DESC, day
    LIMIT {_BS_TOP}
    """,
    description=f"binary-segmentation changepoint detection on daily revenue: variance-reduction gain n_l(μ_l−μ)²+n_r(μ_r−μ)² for every candidate split from ONE prefix-sum pass over the calendar-bounded daily rollup (cents prefix sums are exact in doubles → engine-stable ranking), min segment {_BS_MIN_SEG}, top-{_BS_TOP} by (gain desc, day) — the first split of the binseg/PELT family, each recursion level the same bounded-frame scan",
)
def a0074_binseg_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    # exact integer CENTS: prefix sums of BIGINTs are association-order-
    # free, so cs/s are bit-identical cross-engine (a float cumsum is
    # not — DuckDB's segment-tree window association differs from
    # Spark's sequential frame; that ulps drift survives ROUND(…,4) at
    # gain magnitudes ~1e8).
    daily = od.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice") * 100, 0).cast("long").alias("yc")
    )
    w = Window.orderBy("day")  # daily rollup spine, calendar-bounded
    pre = daily.select(
        "day",
        F.row_number().over(w).alias("rn"),
        F.sum("yc").over(w).cast("double").alias("cs"),
    )
    tot = daily.agg(
        (F.count("*") * 1.0).alias("n"), F.sum("yc").cast("double").alias("s")
    )
    g = pre.crossJoin(F.broadcast(tot)).filter(
        (F.col("rn") >= _BS_MIN_SEG) & (F.col("rn") <= F.col("n") - _BS_MIN_SEG)
    )
    mean_l = F.col("cs") / F.col("rn")
    mean_r = (F.col("s") - F.col("cs")) / (F.col("n") - F.col("rn"))
    mu = F.col("s") / F.col("n")
    gain = (
        F.col("rn") * (mean_l - mu) * (mean_l - mu)
        + (F.col("n") - F.col("rn")) * (mean_r - mu) * (mean_r - mu)
    ) / 10000.0
    return (
        g.select(
            "day",
            F.col("rn").cast("long").alias("t_index"),
            F.col("rn").cast("long").alias("n_left"),
            (F.col("n") - F.col("rn")).cast("long").alias("n_right"),
            F.round(mean_l / 100.0, 2).alias("mean_left"),
            F.round(mean_r / 100.0, 2).alias("mean_right"),
            F.round(gain, 4).alias("gain"),
        )
        .orderBy(F.desc("gain"), "day")
        .limit(_BS_TOP)
    )


# ---------------------------------------------------------------------------
# a0075 — Benford first-digit audit of the two money columns (the
# fraud/data-quality screen): observed first-significant-digit shares
# vs log10(1 + 1/d), per-digit chi-square contributions. The first
# digit comes from the CENTS INTEGER's decimal string — never from
# float log10, whose 1-ulp engine differences flip FLOOR at powers of
# ten. Group-by-digit is 9 keys per column; one scan per fact table.
# ---------------------------------------------------------------------------


def _benford_duck(table: str, col: str) -> str:
    return f"""
      SELECT '{col}' AS col_name,
             CAST(substr(CAST(CAST(ROUND({col} * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             COUNT(*) AS n
      FROM {table} GROUP BY 1, 2
    """


@query(
    "a0075_benford_audit",
    oracle=f"""
    WITH d AS ({_benford_duck('orders', 'o_totalprice')}
               UNION ALL {_benford_duck('lineitem', 'l_extendedprice')}),
    t AS (SELECT col_name, SUM(n) * 1.0 AS tot FROM d GROUP BY 1)
    SELECT d.col_name, d.digit, CAST(d.n AS BIGINT) AS n,
           ROUND(d.n / t.tot, 6) AS obs_share,
           ROUND(ln(1.0 + 1.0 / d.digit) / ln(10.0), 6) AS exp_share,
           ROUND((d.n - t.tot * ln(1.0 + 1.0 / d.digit) / ln(10.0))
                 * (d.n - t.tot * ln(1.0 + 1.0 / d.digit) / ln(10.0))
                 / (t.tot * ln(1.0 + 1.0 / d.digit) / ln(10.0)), 4) AS chi2_term
    FROM d JOIN t USING (col_name)
    ORDER BY col_name, digit
    """,
    description="Benford's-law first-digit audit of o_totalprice and l_extendedprice: first significant digit extracted from the CENTS INTEGER's decimal string (never float log10 — 1-ulp engine differences flip FLOOR at powers of ten), observed share vs log10(1+1/d), per-digit chi-square contributions; 9-key group-by per column, one scan per fact table — the classic fraud/data-quality screen",
)
def a0075_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def digits(table: str, col: str) -> DataFrame:
        t = load_table(spark, sf_dir, table).select(col)
        d = F.substring(
            F.round(F.col(col) * 100).cast("long").cast("string"), 1, 1
        ).cast("long")
        return t.groupBy(F.lit(col).alias("col_name"), d.alias("digit")).agg(
            F.count("*").alias("n")
        )

    d = digits("orders", "o_totalprice").unionByName(
        digits("lineitem", "l_extendedprice")
    )
    t = d.groupBy("col_name").agg((F.sum("n") * 1.0).alias("tot"))
    exp_share = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    exp_n = F.col("tot") * exp_share
    return (
        d.join(F.broadcast(t), "col_name")
        .select(
            "col_name",
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("tot"), 6).alias("obs_share"),
            F.round(exp_share, 6).alias("exp_share"),
            F.round((F.col("n") - exp_n) * (F.col("n") - exp_n) / exp_n, 4).alias("chi2_term"),
        )
        .orderBy("col_name", "digit")
    )


# ---------------------------------------------------------------------------
# a0076 — approximate functional-dependency discovery (the profiling
# pass schema-inference and normalization tooling runs): for each
# candidate FD lhs→rhs, the g3 error = minimum fraction of rows to
# delete for the FD to hold exactly = 1 − Σ_groups max_rhs_count / n.
# Per candidate: one (lhs, rhs) count, one lhs-keyed max — both
# map-side combined; the union of candidates is dimension-sized.
# ---------------------------------------------------------------------------

_FD_CANDIDATES = [
    ("part", "p_brand", "p_type"),
    ("part", "p_name", "p_brand"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("customer", "c_name", "c_mktsegment"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("lineitem", "l_orderkey", "l_returnflag"),
]


def _fd_duck(table: str, lhs: str, rhs: str) -> str:
    return f"""
      SELECT '{lhs}->{rhs}' AS fd,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(mx) AS BIGINT) AS n_keep,
             ROUND(1.0 - SUM(mx) * 1.0 / SUM(cnt), 6) AS g3_error,
             CAST(CASE WHEN SUM(mx) = SUM(cnt) THEN 1 ELSE 0 END AS BIGINT) AS holds
      FROM (
        SELECT lhs, SUM(c) AS cnt, MAX(c) AS mx
        FROM (SELECT {lhs} AS lhs, {rhs} AS rhs, COUNT(*) AS c
              FROM {table} GROUP BY 1, 2)
        GROUP BY lhs
      )
    """


@query(
    "a0076_fd_discovery",
    oracle="\nUNION ALL\n".join(_fd_duck(t, l, r) for t, l, r in _FD_CANDIDATES)
    + "\nORDER BY fd",
    description="approximate functional-dependency discovery over 6 candidate FDs (part/orders/customer/lineitem): g3 error = minimum row fraction to delete for lhs→rhs to hold = 1 − Σ max_rhs_count/n, via one (lhs,rhs) count + one lhs-keyed max per candidate (both map-side combined, union dimension-sized) — the schema-profiling pass normalization and key-inference tooling runs",
)
def a0076_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for table, lhs, rhs in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, table).select(lhs, rhs)
        pair = t.groupBy(F.col(lhs).alias("lhs"), F.col(rhs).alias("rhs")).agg(
            F.count("*").alias("c")
        )
        grp = pair.groupBy("lhs").agg(F.sum("c").alias("cnt"), F.max("c").alias("mx"))
        row = grp.agg(
            F.lit(f"{lhs}->{rhs}").alias("fd"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_groups"),
            F.sum("mx").cast("long").alias("n_keep"),
            F.round(1.0 - F.sum("mx") * 1.0 / F.sum("cnt"), 6).alias("g3_error"),
            F.when(F.sum("mx") == F.sum("cnt"), 1).otherwise(0).cast("long").alias("holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fd")
