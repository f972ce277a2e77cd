"""Round-10 final wave (a0093–a0105): classical data-mining and
pipeline-engineering operators that round out the engine —
market-basket association rules, weighted reservoir sampling, PSI
drift, rolling OLS, STL-lite seasonal decomposition, a distributed
parquet row-group audit, rendezvous (HRW) sharding, grid-density
clustering, heavy-change detection, funnel conversion, Adamic-Adar
link prediction, SAX motif mining, and range-partition planning.

Named a0093–a0105 so the whole wave sorts INSIDE the round-10 driver
window (before the a0144+ r9-green backfill block): 37 never-dated +
13 new = exactly the 50-slot window. Every query carries a full
DuckDB value-hash oracle.

Reference parity: the reference notebook (kaggle/kaggle.py) has no
counterpart for these — they extend the engine along the data-mining
axis its course title promises (association rules, SAX, density
clustering are textbook Big-Data-Analysis material) and the
training-pipeline axis the north star demands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# ---------------------------------------------------------------------------
# a0093 — market-basket association rules over orders: baskets are the
# distinct part BRANDS in one order (lineitem ⋈ broadcast part),
# candidate pairs come from a basket self-join keyed on the order (pair
# count bounded by basket size, never all-pairs over items), and the
# classic support / confidence / lift table is produced for both rule
# directions. Scale shape: one shuffle on l_orderkey for the pair
# explode, one 625-row-max aggregate, broadcast item counts — at 100 TB
# the pair stage stays proportional to Σ basket² with basket ≤ ~13.
# ---------------------------------------------------------------------------

_AR_MIN_SUPPORT = 0.01
_AR_TOP = 15


@query(
    "a0093_association_rules",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    tot AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM baskets),
    items AS (SELECT brand, COUNT(*) AS n_item FROM baskets GROUP BY brand),
    pairs AS (
      SELECT a.brand AS b1, b.brand AS b2, COUNT(*) AS n_pair
      FROM baskets a JOIN baskets b ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    ),
    rules AS (
      SELECT b1 AS antecedent, b2 AS consequent, n_pair FROM pairs
      UNION ALL
      SELECT b2, b1, n_pair FROM pairs
    )
    SELECT r.antecedent, r.consequent,
           CAST(r.n_pair AS BIGINT) AS n_both,
           ROUND(r.n_pair * 1.0 / t.n_orders, 6) AS support,
           ROUND(r.n_pair * 1.0 / ia.n_item, 6) AS confidence,
           ROUND(r.n_pair * 1.0 * t.n_orders / (ia.n_item * ic.n_item), 6) AS lift
    FROM rules r
    JOIN items ia ON r.antecedent = ia.brand
    JOIN items ic ON r.consequent = ic.brand
    CROSS JOIN tot t
    WHERE r.n_pair * 1.0 / t.n_orders >= {_AR_MIN_SUPPORT}
    ORDER BY lift DESC, antecedent, consequent
    LIMIT {_AR_TOP}
    """,
    description=f"market-basket association rules (the data-mining classic): baskets = distinct part brands per order, candidate pairs from an order-keyed basket self-join (bounded by basket size, never item all-pairs), support/confidence/lift for both rule directions, min-support {_AR_MIN_SUPPORT}, top-{_AR_TOP} by lift with full tiebreak; item counts broadcast, single orderkey shuffle — Σ basket² work at any scale",
)
def a0093_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    tot = baskets.select(F.countDistinct("okey").alias("n_orders"))
    items = baskets.groupBy("brand").agg(F.count("*").alias("n_item"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.brand") < F.col("b.brand")))
        .groupBy(F.col("a.brand").alias("b1"), F.col("b.brand").alias("b2"))
        .agg(F.count("*").alias("n_pair"))
    )
    rules = pairs.select(
        F.col("b1").alias("antecedent"), F.col("b2").alias("consequent"), "n_pair"
    ).unionAll(
        pairs.select(F.col("b2").alias("antecedent"), F.col("b1").alias("consequent"), "n_pair")
    )
    ia = items.select(F.col("brand").alias("antecedent"), F.col("n_item").alias("n_a"))
    ic = items.select(F.col("brand").alias("consequent"), F.col("n_item").alias("n_c"))
    return (
        rules.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_pair") * 1.0 / F.col("n_orders") >= _AR_MIN_SUPPORT)
        .select(
            "antecedent",
            "consequent",
            F.col("n_pair").cast("long").alias("n_both"),
            F.round(F.col("n_pair") * 1.0 / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_pair") * 1.0 / F.col("n_a"), 6).alias("confidence"),
            F.round(F.col("n_pair") * 1.0 * F.col("n_orders") / (F.col("n_a") * F.col("n_c")), 6).alias(
                "lift"
            ),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(_AR_TOP)
    )


# ---------------------------------------------------------------------------
# a0094 — weighted reservoir sampling without replacement (Efraimidis &
# Spirakis A-Res, Inf. Process. Lett. 2006): each document draws a
# deterministic hash-uniform u ∈ (0,1) and competes with key u^(1/w);
# the k largest keys are the sample. Ranking by ln(u)/w is monotone-
# equivalent and numerically robust. One pass, no shuffle before the
# global top-k (TakeOrderedAndProject) — the distributed-sampling
# primitive a mixture builder needs when weights are token counts.
# ---------------------------------------------------------------------------

_WRS_K = 25


@query(
    "a0094_weighted_reservoir",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, n_chars,
             (CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
               / 4294967296.0 AS u
      FROM documents WHERE n_chars > 0
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(n_chars AS BIGINT) AS weight,
           ROUND(ln(u) / n_chars * 1e6, 6) AS neg_key_ppm
    FROM d
    ORDER BY ln(u) / n_chars DESC, doc_id
    LIMIT {_WRS_K}
    """,
    description=f"weighted reservoir sampling without replacement (Efraimidis-Spirakis A-Res): deterministic md5-uniform u per doc, sample = top-{_WRS_K} by key u^(1/weight) ranked via the monotone-equivalent ln(u)/w — one pass, no shuffle, global top-k via TakeOrderedAndProject; the distributed weighted-sampling primitive for building training mixtures where weight = document length",
)
def a0094_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    key = F.log(u) / F.col("n_chars")
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "source",
            F.col("n_chars").cast("long").alias("weight"),
            (key * 1e6).alias("_k"),
        )
        .orderBy(F.desc("_k"), "doc_id")
        .limit(_WRS_K)
        .select("doc_id", "source", "weight", F.round("_k", 6).alias("neg_key_ppm"))
    )


# ---------------------------------------------------------------------------
# a0095 — Population Stability Index drift report between two source
# cohorts (the standard model-monitoring metric): document lengths are
# binned into 10 equal-width bins over the global range, per-cohort
# bin shares are Laplace-smoothed (+0.5), and PSI = Σ (pa−pb)·ln(pa/pb)
# is emitted per bin plus as a TOTAL row. Everything is two scans and
# one 10-row aggregate; the global min/max is a broadcast 1-row frame.
# ---------------------------------------------------------------------------

_PSI_BINS = 10


@query(
    "a0095_psi_drift",
    oracle=f"""
    WITH d AS (
      SELECT n_chars,
             CASE WHEN CAST(substr(source, 4) AS BIGINT) < 10 THEN 'a' ELSE 'b' END AS cohort
      FROM documents
    ),
    rng AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM d),
    binned AS (
      SELECT LEAST({_PSI_BINS - 1},
                   CAST(FLOOR((d.n_chars - r.mn) * {_PSI_BINS}.0 / (r.mx - r.mn + 1)) AS BIGINT))
               AS bin,
             cohort
      FROM d CROSS JOIN rng r
    ),
    shell AS (SELECT CAST(i AS BIGINT) AS bin FROM range({_PSI_BINS}) t(i)),
    counts AS (
      SELECT s.bin,
             COALESCE(SUM(CASE WHEN b.cohort = 'a' THEN 1 ELSE 0 END), 0) AS n_a,
             COALESCE(SUM(CASE WHEN b.cohort = 'b' THEN 1 ELSE 0 END), 0) AS n_b
      FROM shell s LEFT JOIN binned b ON s.bin = b.bin
      GROUP BY s.bin
    ),
    tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM counts),
    contrib AS (
      SELECT c.bin, c.n_a, c.n_b,
             ((c.n_a + 0.5) / (t.ta + {_PSI_BINS} * 0.5)
              - (c.n_b + 0.5) / (t.tb + {_PSI_BINS} * 0.5))
             * ln(((c.n_a + 0.5) / (t.ta + {_PSI_BINS} * 0.5))
                  / ((c.n_b + 0.5) / (t.tb + {_PSI_BINS} * 0.5))) AS psi
      FROM counts c CROSS JOIN tot t
    )
    SELECT CAST(bin AS BIGINT) AS bin, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b, ROUND(psi, 6) AS psi_contrib
    FROM contrib
    UNION ALL
    SELECT -1, CAST(SUM(n_a) AS BIGINT), CAST(SUM(n_b) AS BIGINT), ROUND(SUM(psi), 6)
    FROM contrib
    ORDER BY bin
    """,
    description="Population Stability Index drift report (standard model-monitoring metric) between two source cohorts: equal-width 10-bin layout over the global length range (broadcast 1-row min/max), Laplace-smoothed (+0.5) bin shares, per-bin PSI contribution plus a TOTAL(-1) row; a bin shell LEFT JOIN keeps empty bins so the smoothing semantics are exact — two scans, one 10-row aggregate",
)
def a0095_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "n_chars",
        F.when(F.substring("source", 4, 10).cast("long") < 10, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("cohort"),
    )
    rng = d.select(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    binned = d.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.lit(_PSI_BINS - 1),
            F.floor((F.col("n_chars") - F.col("mn")) * float(_PSI_BINS) / (F.col("mx") - F.col("mn") + 1)),
        )
        .cast("long")
        .alias("bin"),
        "cohort",
    )
    shell = spark.range(_PSI_BINS).select(F.col("id").cast("long").alias("bin"))
    counts = (
        shell.join(binned, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(F.sum(F.when(F.col("cohort") == "a", 1).otherwise(0)), F.lit(0)).alias("n_a"),
            F.coalesce(F.sum(F.when(F.col("cohort") == "b", 1).otherwise(0)), F.lit(0)).alias("n_b"),
        )
        .localCheckpoint(eager=False)
    )
    tot = counts.select(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    sm = float(_PSI_BINS) * 0.5
    pa = (F.col("n_a") + 0.5) / (F.col("ta") + sm)
    pb = (F.col("n_b") + 0.5) / (F.col("tb") + sm)
    contrib = counts.crossJoin(F.broadcast(tot)).select(
        "bin", "n_a", "n_b", ((pa - pb) * F.log(pa / pb)).alias("psi")
    ).localCheckpoint(eager=False)
    bins = contrib.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("psi", 6).alias("psi_contrib"),
    )
    total = contrib.agg(
        F.sum("n_a").cast("long").alias("n_a"),
        F.sum("n_b").cast("long").alias("n_b"),
        F.round(F.sum("psi"), 6).alias("psi_contrib"),
    ).select(F.lit(-1).cast("long").alias("bin"), "n_a", "n_b", "psi_contrib")
    return bins.unionByName(total).orderBy("bin")


# ---------------------------------------------------------------------------
# a0096 — rolling ordinary-least-squares trend per customer segment: daily
# revenue series (orders ⋈ broadcast customer), then a 28-day ROWS
# window computes the closed-form OLS slope
#   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
# from five window sums — regression as pure window algebra, no UDF,
# no iteration. Snapshot rows are the first-of-month days with a full
# window. Scale shape: one segment-keyed shuffle, windows partitioned
# by segment (guard-test compliant), day spine bounded by calendar.
# ---------------------------------------------------------------------------

_OLS_W = 28


@query(
    "a0096_rolling_ols",
    oracle=f"""
    WITH daily AS (
      SELECT c.c_mktsegment AS segment, CAST(o.o_orderdate AS DATE) AS day,
             date_diff('day', DATE '1995-01-01', CAST(o.o_orderdate AS DATE)) AS x,
             SUM(o.o_totalprice) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3
    ),
    win AS (
      SELECT segment, day,
             COUNT(*) OVER w AS n,
             SUM(x * 1.0) OVER w AS sx,
             SUM(y) OVER w AS sy,
             SUM(x * 1.0 * x) OVER w AS sxx,
             SUM(x * y) OVER w AS sxy
      FROM daily
      WINDOW w AS (PARTITION BY segment ORDER BY day
                   ROWS BETWEEN {_OLS_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT segment, day,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 2) AS intercept_at_mean
    FROM win
    WHERE n = {_OLS_W} AND EXTRACT(day FROM day) = 1
    ORDER BY segment, day
    """,
    description=f"rolling OLS trend per customer segment: daily revenue series, {_OLS_W}-row trailing window, closed-form slope (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) from five window sums — regression as pure window algebra (no UDF, no iteration); first-of-month full-window snapshots; one segment shuffle, partitioned windows only",
)
def a0096_rolling_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    daily = (
        od.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("y"))
        .withColumn("x", F.datediff(F.col("day"), F.lit("1995-01-01")))
    )
    w = Window.partitionBy("segment").orderBy("day").rowsBetween(-(_OLS_W - 1), 0)
    win = daily.select(
        "segment",
        "day",
        F.count("*").over(w).alias("n"),
        F.sum(F.col("x") * 1.0).over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * 1.0 * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        win.filter((F.col("n") == _OLS_W) & (F.dayofmonth("day") == 1))
        .select(
            "segment",
            "day",
            F.round(slope, 4).alias("slope"),
            F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 2).alias("intercept_at_mean"),
        )
        .orderBy("segment", "day")
    )
