"""Third relational batch: full-outer join and the applyInPandas
(grouped-map) UDF surface — the last SURVEY §2 rows without declared
queries."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


@query(
    "a069_full_outer_join",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY nk),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY nk)
    SELECT COALESCE(c.nk, s.nk) AS nk,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    ORDER BY nk
    """,
    description="full outer join with null-fill on both sides (SURVEY §2.3)",
)
def a069_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.join(supp, cust.nk_c == supp.nk_s, "full_outer")
        .select(
            F.coalesce("nk_c", "nk_s").alias("nk"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nk")
    )


@query(
    "a071_group_apply",
    oracle="""
    WITH g AS (SELECT l_returnflag, l_linestatus,
                      MIN(l_quantity) AS mn, MAX(l_quantity) AS mx
               FROM lineitem GROUP BY l_returnflag, l_linestatus)
    SELECT l.l_returnflag, l.l_linestatus, COUNT(*) AS n,
           ROUND(SUM((l_quantity - mn) / (mx - mn)), 4) AS norm_sum
    FROM lineitem l JOIN g USING (l_returnflag, l_linestatus)
    GROUP BY l.l_returnflag, l.l_linestatus
    ORDER BY l.l_returnflag, l.l_linestatus
    """,
    description="applyInPandas grouped-map (the reference's groupby().apply shape, kaggle.py:424; SURVEY §2.12): per-group min-max normalize + reduce, Arrow-batched",
)
def a071_group_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    def normalize_group(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["l_quantity"]
        span = q.max() - q.min()
        norm = (q - q.min()) / span if span > 0 else q * 0.0
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "l_linestatus": [pdf["l_linestatus"].iloc[0]],
                "n": [len(pdf)],
                "norm_sum": [round(float(norm.sum()), 4)],
            }
        )

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .applyInPandas(
            normalize_group,
            schema="l_returnflag string, l_linestatus string, n long, norm_sum double",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "a072_correlated_subquery",
    oracle="""
    WITH nation_avg AS (SELECT c_nationkey AS nk, AVG(c_acctbal) AS navg
                        FROM customer GROUP BY c_nationkey)
    SELECT c_mktsegment, COUNT(*) AS n_above_avg,
           ROUND(AVG(c_acctbal), 6) AS avg_bal_above
    FROM customer JOIN nation_avg ON c_nationkey = nk
    WHERE c_acctbal > navg
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    description="correlated scalar subquery (customers above their nation's average balance) — expressed as its decorrelated join form, the plan Catalyst rewrites to (SURVEY §2.3/§4)",
)
def a072_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation_avg = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(F.avg("c_acctbal").alias("navg"))
    return (
        cust.join(nation_avg, cust.c_nationkey == nation_avg.nk)
        .filter(F.col("c_acctbal") > F.col("navg"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_above_avg"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_bal_above"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "a073_exists_late_lineitem",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="TPC-H Q4 shape: EXISTS with a cross-table date condition -> left-semi join on a non-trivial predicate (SURVEY §2.3)",
)
def a073_exists_late_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "a074_trailing_range_window",
    oracle="""
    WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                          epoch(CAST(o_orderdate AS DATE)) AS sec,
                          SUM(o_totalprice) AS rev
                   FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01'
                   GROUP BY d, sec)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           ROUND(rev, 2) AS day_revenue,
           ROUND(SUM(rev) OVER (ORDER BY sec
                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2) AS trailing_7d
    FROM daily ORDER BY day
    """,
    description="RANGE-frame window: 7-day trailing revenue over a value-based frame (rangeBetween), vs the row-based frames of q11 (SURVEY §2.5 frames row). The unpartitioned window runs AFTER the per-day aggregate, so its input is bounded by the calendar (one row per day), never the data",
)
def a074_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp")
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    ).withColumn("sec", F.unix_timestamp(F.col("d").cast("timestamp")))
    # unpartitioned window is safe here: input is the DAILY rollup
    # (bounded by the calendar — a few thousand rows at any SF); the
    # scale path for row-level trailing sums is a range self-join
    w = W.orderBy("sec").rangeBetween(-604800, 0)
    return (
        daily.withColumn("trailing_7d", F.round(F.sum("rev").over(w), 2))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round("rev", 2).alias("day_revenue"),
            "trailing_7d",
        )
        .orderBy("day")
    )


@query(
    "a075_disjunctive_predicates",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 15)
       OR (p_type = 'ECONOMY' AND l_discount >= 0.05)
    """,
    description="TPC-H Q19 shape: disjunction of conjunctive bands across the join — Catalyst pushes the common parts and keeps the OR as a join filter (SURVEY §2.2)",
)
def a075_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 15))
        | ((F.col("p_type") == "ECONOMY") & (F.col("l_discount") >= 0.05))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "a076_shipping_priority",
    oracle="""
    SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15'
      AND l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l_orderkey, order_date, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    description="TPC-H Q3 shape: segment filter + date window on both fact sides, grouped revenue top-k (SURVEY §2.3/§2.6)",
)
def a076_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "a077_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT))
                 AS BIGINT) / 10000.0, 2) AS revenue,
           n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    description="TPC-H Q10 shape: returned-item revenue per customer, broadcast nation dim, top-k (SURVEY §2.3)",
)
def a077_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        # integer-scaled money sum: the per-line product is ONE IEEE op
        # (bit-identical across engines), its rounding to integer 1/100-cents
        # is therefore identical, and integer sums are exact — immune to the
        # summation-order cent-boundary flips a raw double SUM can hit
        .agg(
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0).cast("long")
                )
                / 10000.0,
                2,
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "a078_order_gaps",
    oracle="""
    WITH g AS (
      SELECT c_mktsegment,
             DATEDIFF('day', o_orderdate,
                      LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey)) AS gap_days
      FROM orders JOIN customer ON o_custkey = c_custkey)
    SELECT c_mktsegment, COUNT(gap_days) AS n_gaps,
           ROUND(AVG(gap_days), 6) AS avg_gap_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
    FROM g GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    description="lead() window: inter-order gap distribution per segment (SURVEY §2.5 lag/lead row)",
)
def a078_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("gap_days", F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate")))
    )
    return (
        gaps.groupBy("c_mktsegment")
        .agg(
            F.count("gap_days").alias("n_gaps"),
            F.round(F.avg("gap_days"), 6).alias("avg_gap_days"),
            F.max("gap_days").cast("long").alias("max_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "a080_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    ORDER BY returnflag, linestatus
    """,
    description="explicit GROUPING SETS (neither rollup nor cube) via the SQL entry point (SURVEY §2.4)",
)
def a080_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY returnflag, linestatus
        """
    )


@query(
    "a081_cume_dist",
    oracle="""
    WITH r AS (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS cd,
             PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS pr
      FROM customer)
    SELECT c_mktsegment,
           COUNT(*) AS n_top_decile,
           ROUND(MIN(c_acctbal), 2) AS decile_floor,
           ROUND(AVG(pr), 6) AS avg_pct_rank
    FROM r WHERE cd >= 0.9
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    description="cume_dist / percent_rank analytic windows (SURVEY §2.5 ranking row)",
)
def a081_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return (
        cust.withColumn("cd", F.cume_dist().over(w))
        .withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("cd") >= 0.9)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_top_decile"),
            F.round(F.min("c_acctbal"), 2).alias("decile_floor"),
            F.round(F.avg("pr"), 6).alias("avg_pct_rank"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "a082_approx_aggregates",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS parts_within_rel_err,
           TRUE AS p50_within_rel_err
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    description="approximate aggregates — approx_count_distinct (HLL, rsd=0.02) and percentile_approx (quantile sketch, accuracy=1000): the 100 TB substitutes for q15/q65's exact operators. Hash-checkable via error-bound booleans (VERDICT r3 item 2): Spark computes approx AND exact side by side and emits approx-within-documented-bound flags; the oracle pins the exact columns and expects TRUE. HLL bound = 2.5x rsd (5%); sketch bound = 1% relative value error (rank error n/1000 on a smooth price distribution)",
)
def a082_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    approx_parts = F.approx_count_distinct("l_partkey", rsd=0.02)
    exact_parts = F.countDistinct("l_partkey")
    approx_p50 = F.percentile_approx("l_extendedprice", 0.5, 1000)
    exact_p50 = F.expr("percentile(l_extendedprice, 0.5)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            exact_parts.alias("exact_parts"),
            (F.abs(approx_parts - exact_parts) / exact_parts <= F.lit(0.05)).alias(
                "parts_within_rel_err"
            ),
            (F.abs(approx_p50 - exact_p50) / exact_p50 <= F.lit(0.01)).alias(
                "p50_within_rel_err"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "a084_csv_source_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price,
           strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_order,
           strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_order
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="CSV source in the oracle gate (SURVEY §2.1): orders mirrored to CSV, read back through the schema'd reader with explicit timestampFormat (the reference's primary source is schema'd CSV, kaggle.py:344-353), aggregated identically to its parquet twin — the oracle runs on the parquet view, so the hash also proves the CSV round-trip is lossless",
)
def a084_csv_source_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirrors orders to a CSV copy (tempdir, keyed by SF name) and runs
    the aggregation over the CSV scan. Explicit schema + timestampFormat,
    never inferSchema — inference would cost an extra full pass at scale."""
    import os
    import tempfile

    from ..sources.catalog import SCHEMAS
    from ..sources.readers import read_csv

    ts_fmt = "yyyy-MM-dd HH:mm:ss"
    mirror = os.path.join(
        tempfile.gettempdir(), "spark_graft_csv_mirror", os.path.basename(sf_dir.rstrip("/")), "orders"
    )
    (
        load_table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", ts_fmt)
        .option("timestampNTZFormat", ts_fmt)
        .csv(mirror)
    )
    orders = read_csv(spark, mirror, SCHEMAS["orders"], timestamp_format=ts_fmt)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("first_order"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("last_order"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "a089_trailing_range_join",
    oracle="""
    WITH daily AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
                          SUM(o_totalprice) AS rev
                   FROM orders GROUP BY ck, d),
    t AS (SELECT a.ck, a.d, ROUND(SUM(b.rev), 2) AS trailing_7d
          FROM daily a JOIN daily b ON a.ck = b.ck AND b.d BETWEEN a.d - 6 AND a.d
          GROUP BY a.ck, a.d)
    SELECT strftime(date_trunc('month', d), '%Y-%m-%d') AS month,
           COUNT(*) AS n_rows,
           ROUND(MAX(trailing_7d), 2) AS max_trailing,
           ROUND(SUM(trailing_7d), 2) AS sum_trailing
    FROM t GROUP BY month ORDER BY month
    """,
    description="row-level 7-day trailing sum as a RANGE SELF-JOIN — the scale path q74's docstring names: equi-join on the entity key (shuffle partitioned by customer, no global window anywhere) + bounded date-range predicate; per-customer daily revenue rolled up monthly (SURVEY §2.5 frames at scale)",
)
def a089_trailing_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_custkey").alias("ck"), F.to_date("o_orderdate").alias("d")
    ).agg(F.sum("o_totalprice").alias("rev"))
    a, b = daily.alias("a"), daily.alias("b")
    trailing = (
        a.join(
            b,
            (F.col("a.ck") == F.col("b.ck"))
            & (F.col("b.d") >= F.date_sub(F.col("a.d"), 6))
            & (F.col("b.d") <= F.col("a.d")),
        )
        .groupBy(F.col("a.ck").alias("ck"), F.col("a.d").alias("d"))
        .agg(F.round(F.sum("b.rev"), 2).alias("trailing_7d"))
    )
    return (
        trailing.groupBy(F.date_format(F.trunc("d", "month"), "yyyy-MM-dd").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.max("trailing_7d"), 2).alias("max_trailing"),
            F.round(F.sum("trailing_7d"), 2).alias("sum_trailing"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# q148 — blocked fuzzy record linkage (entity resolution): a "dirty"
# customer feed with deterministic typos is matched back to the clean
# dimension via BLOCKING (last-4-digit key, robust to the prefix
# perturbations) + Levenshtein verification inside each block + best-
# match selection. The scale contract of every real ER pipeline: the
# expensive edit-distance runs only on block-collision candidates
# (O(n * block_width)), never all-pairs; the clean side joins broadcast.
# Typo classes (key % 3): 0 = drop one char, 1 = transpose two chars,
# 2 = unchanged — all expressible as identical substring surgery in
# both engines, so the oracle reproduces the dirty feed exactly.
# ---------------------------------------------------------------------------


@query(
    "a0148_fuzzy_join",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey AS d_key,
             CASE CAST(c_custkey % 3 AS INTEGER)
               WHEN 0 THEN substr(c_name, 1, 5) || substr(c_name, 7)
               WHEN 1 THEN substr(c_name, 1, 3) || substr(c_name, 5, 1)
                         || substr(c_name, 4, 1) || substr(c_name, 6)
               ELSE c_name END AS d_name,
             CAST(c_custkey % 3 AS INTEGER) AS typo_class
      FROM customer),
    cand AS (
      SELECT d.d_key, d.d_name, d.typo_class, c.c_custkey, c.c_name,
             levenshtein(d.d_name, c.c_name) AS lev
      FROM dirty d JOIN customer c
        ON right(d.d_name, 4) = right(c.c_name, 4)
      WHERE levenshtein(d.d_name, c.c_name) <= 2),
    best AS (
      SELECT d_key, typo_class, c_custkey, lev,
             ROW_NUMBER() OVER (PARTITION BY d_key ORDER BY lev, c_custkey) AS rn
      FROM cand),
    m AS (SELECT * FROM best WHERE rn = 1)
    SELECT typo_class,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN c_custkey = d_key THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           ROUND(AVG(lev), 6) AS avg_lev
    FROM m GROUP BY typo_class ORDER BY typo_class
    """,
    description="blocked fuzzy record linkage (entity resolution): a dirty feed with deterministic typo classes (char drop / transposition / clean) matched to the customer dimension by last-4-digit BLOCKING + Levenshtein <= 2 verification inside blocks + lowest-(distance, key) best-match selection — edit distance runs only on block-collision candidates (O(n x block width), never all-pairs), the clean dimension is broadcast, and per-class match/accuracy stats quantify the linkage; typos are identical substring surgery in both engines so the oracle rebuilds the same dirty feed",
)
def a0148_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cust = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    dirty = cust.select(
        F.col("c_custkey").alias("d_key"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.substring(name, 1, 5), F.expr("substr(c_name, 7)")),
        )
        .when(
            F.col("c_custkey") % 3 == 1,
            F.concat(
                F.substring(name, 1, 3),
                F.substring(name, 5, 1),
                F.substring(name, 4, 1),
                F.expr("substr(c_name, 6)"),
            ),
        )
        .otherwise(name)
        .alias("d_name"),
        (F.col("c_custkey") % 3).cast("int").alias("typo_class"),
    )
    clean = cust.select("c_custkey", "c_name", F.expr("right(c_name, 4)").alias("blk"))
    cand = (
        dirty.withColumn("blk", F.expr("right(d_name, 4)"))
        .join(F.broadcast(clean), "blk")
        .withColumn("lev", F.levenshtein("d_name", "c_name"))
        .filter(F.col("lev") <= 2)
    )
    best = cand.withColumn(
        "rn", F.row_number().over(W.partitionBy("d_key").orderBy("lev", "c_custkey"))
    ).filter(F.col("rn") == 1)
    return (
        best.groupBy("typo_class")
        .agg(
            F.count("*").alias("n_matched"),
            F.sum((F.col("c_custkey") == F.col("d_key")).cast("long")).alias("n_correct"),
            F.round(F.avg("lev"), 6).alias("avg_lev"),
        )
        .orderBy("typo_class")
    )


# ---------------------------------------------------------------------------
# q153 — hierarchical rollup (the recursive-CTE workload): a synthetic
# customer hierarchy (parent = k // 10, a forest over the real customer
# keys whose depth is digits(max custkey) - 1) is traversed to find
# every node's ROOT and DEPTH, then order spend rolls up per root
# subtree. Spark has no recursive CTE — the traversal is a fixed-depth
# iterative broadcast self-join over the edge dimension (the standard
# Spark hierarchy pattern), with the unroll depth derived from max(k)
# at plan time so the plan stays exact at any SF. The DuckDB oracle
# uses a real WITH RECURSIVE, so the hash proves the unrolled iteration
# reproduces true recursive semantics.
# ---------------------------------------------------------------------------

@query(
    "a0153_hierarchy_rollup",
    oracle="""
    WITH RECURSIVE nodes AS (SELECT DISTINCT c_custkey AS k FROM customer),
    edges AS (SELECT k, k // 10 AS parent FROM nodes WHERE k >= 10),
    roots AS (SELECT k FROM nodes WHERE k < 10),
    walk AS (
      SELECT k, k AS root, 0 AS depth FROM roots
      UNION ALL
      SELECT e.k, w.root, w.depth + 1
      FROM edges e JOIN walk w ON e.parent = w.k),
    spend AS (SELECT o_custkey AS k, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
              FROM orders GROUP BY o_custkey),
    rolled AS (
      SELECT w.root, COUNT(*) AS n_nodes, MAX(w.depth) AS max_depth,
             ROUND(SUM(COALESCE(sp, 0)), 2) AS subtree_spend
      FROM walk w LEFT JOIN spend s ON s.k = w.k
      GROUP BY w.root)
    SELECT CAST(root AS BIGINT) AS root, CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(max_depth AS BIGINT) AS max_depth, subtree_spend
    FROM rolled ORDER BY root
    """,
    description="hierarchical rollup — the recursive-CTE workload on an engine without recursive CTEs: a synthetic customer forest (parent = key div 10 over the real keys) traversed by fixed-depth iterative broadcast self-joins over the dimension-sized edge frame (the standard Spark hierarchy unroll; the unroll depth is derived from max custkey at plan time so the plan stays exact at any SF), then per-root subtree spend in exact DECIMAL; the DuckDB oracle runs a true WITH RECURSIVE, so the hash match proves the unrolled iteration reproduces genuine recursive semantics",
)
def a0153_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nodes = cust.select(F.col("c_custkey").alias("k")).distinct()
    # the edge frame is customer-dimension-sized; checkpoint once for the
    # unrolled iterations instead of re-deriving per level
    edges = (
        nodes.filter(F.col("k") >= 10)
        .select("k", (F.col("k") / 10).cast("long").alias("parent"))
        .localCheckpoint(eager=False)
    )
    # Unroll depth DERIVED from the data, not hard-coded: parent = k // 10,
    # so a node's depth is digits(k) - 1 and the forest depth is
    # digits(max k) - 1.  One scalar agg over the dimension (cheap at any
    # SF) keeps the unroll exact when custkey grows a decade — a fixed
    # constant here would silently drop deeper nodes at sf >= 1.
    max_k = nodes.agg(F.max("k")).first()[0] or 1
    hier_depth = max(1, len(str(max_k)) - 1)
    walk = nodes.filter(F.col("k") < 10).select(
        "k", F.col("k").alias("root"), F.lit(0).alias("depth")
    )
    frontier = walk
    for _ in range(hier_depth):
        frontier = (
            edges.join(
                F.broadcast(frontier.select(F.col("k").alias("parent"), "root", "depth")),
                "parent",
            )
            .select("k", "root", (F.col("depth") + 1).alias("depth"))
        )
        walk = walk.unionByName(frontier)
    spend = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sp")
    )
    return (
        walk.join(spend, "k", "left")
        .groupBy("root")
        .agg(
            F.count("*").alias("n_nodes"),
            F.max("depth").cast("long").alias("max_depth"),
            F.round(F.sum(F.coalesce(F.col("sp"), F.lit(0).cast("decimal(18,2)"))), 2).alias(
                "subtree_spend"
            ),
        )
        .select(F.col("root").cast("long").alias("root"), "n_nodes", "max_depth", "subtree_spend")
        .orderBy("root")
    )


# ---------------------------------------------------------------------------
# q162 — grouped-aggregate pandas UDF (the last cell of the §2.12 UDF
# matrix: scalar pandas_udf = q68, grouped-map applyInPandas = q71,
# mapInPandas = q70, UDTF = chunk_text; this is PandasUDFType.
# GROUPED_AGG): a 10% two-sided trimmed mean of order value per
# priority — the robust location statistic with no native Spark
# aggregate. The UDF receives each group's values as ONE pandas Series
# via Arrow (no row-at-a-time Python), sorts, drops floor(n/10) from
# each tail, and means the rest; the trim rule is exact integer
# arithmetic so both engines trim identical row sets.
# ---------------------------------------------------------------------------


@query(
    "a0162_trimmed_mean_udaf",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders)
    SELECT o_orderpriority, CAST(ANY_VALUE(n) AS BIGINT) AS n_orders,
           ROUND(AVG(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                          THEN o_totalprice END), 6) AS trimmed_mean
    FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="grouped-aggregate pandas UDF (PandasUDFType.GROUPED_AGG — completes the §2.12 UDF matrix alongside scalar q68, grouped-map q71, mapInPandas q70, and the chunk UDTF): 10% two-sided trimmed mean of order value per priority, each group's values arriving as ONE Arrow-backed pandas Series (never row-at-a-time); floor(n/10) trimmed per tail by exact integer arithmetic so both engines drop identical row sets; the robust location aggregate Spark lacks natively",
)
def a0162_trimmed_mean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        s = v.sort_values(kind="mergesort").reset_index(drop=True)
        k = len(s) // 10
        kept = s.iloc[k : len(s) - k] if len(s) > 2 * k else s
        return float(kept.mean())

    orders = load_table(spark, sf_dir, "orders")
    # Spark disallows mixing a GROUPED_AGG pandas UDF with built-in
    # aggregates in one agg() — the plain count runs as its own tiny
    # aggregate and joins back on the #priorities-row key.
    tm = orders.groupBy("o_orderpriority").agg(
        F.round(trimmed_mean("o_totalprice"), 6).alias("trimmed_mean")
    )
    n = orders.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))
    return (
        n.join(F.broadcast(tm), "o_orderpriority")
        .select("o_orderpriority", "n_orders", "trimmed_mean")
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# a0172 — VARIANT semi-structured ops (Spark 4 open variant encoding):
# the modern replacement for string-walking JSON with get_json_object.
# parse_json materializes the props column ONCE into the binary variant
# form; every subsequent variant_get is a typed offset lookup, not a
# re-parse — the shape that makes wide semi-structured scans at 100 TB
# cheap (and what Delta/Iceberg shred into columns). Exercises typed
# extraction, try_variant_get's NULL-on-miss contract, schema_of_variant
# introspection, and a construct -> extract round-trip.
# ---------------------------------------------------------------------------


@query(
    "a0172_variant_json_ops",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n_missing_null,
           'OBJECT<k: BIGINT>' AS vschema,
           CAST(COUNT(*) AS BIGINT) AS n_roundtrip
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="Spark 4 VARIANT ops over the events props JSON: parse_json into the binary variant encoding once, typed variant_get extraction (no per-access string re-parse), try_variant_get NULL-on-miss pinned for every row, schema_of_variant introspection pinned to its literal, and a construct->extract round-trip (to_json(named_struct) -> parse_json -> variant_get) proving the codec is lossless; the DuckDB oracle recomputes the same aggregates with native JSON functions, so a wrong extraction path, type mapping, or null contract fails the hash",
)
def a0172_variant_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    t = ev.select("event_type", v.alias("v"))
    v2 = F.parse_json(
        F.to_json(
            F.named_struct(
                F.lit("t"), F.col("event_type"),
                F.lit("k"), F.expr("variant_get(v, '$.k', 'bigint')"),
            )
        )
    )
    return (
        t.withColumn("v2", v2)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("variant_get(v, '$.k', 'bigint')")).alias("sum_k"),
            F.sum(
                F.expr("try_variant_get(v, '$.missing', 'int')").isNull().cast("long")
            ).alias("n_missing_null"),
            F.max(F.expr("schema_of_variant(v)")).alias("vschema"),
            F.sum(
                (F.expr("variant_get(v2, '$.t', 'string')") == F.col("event_type")).cast("long")
            ).alias("n_roundtrip"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# a0173 — NATIVE recursive CTE (Spark 4.1 WITH RECURSIVE): the true
# recursive form of a0153's iterative unroll, run by Spark's own
# recursion operator instead of hand-unrolled joins — the engine
# feature a0153 documents as historically missing. Same synthetic
# customer forest (parent = key div 10), but the walk also builds the
# materialized path string, and the result is a per-depth census with
# min/max paths — so the hash pins recursion termination, per-level
# fan-out, AND the exact concatenation order against DuckDB's native
# WITH RECURSIVE.
# ---------------------------------------------------------------------------


@query(
    "a0173_recursive_cte_paths",
    oracle="""
    WITH RECURSIVE nodes AS (SELECT DISTINCT c_custkey AS k FROM customer),
    edges AS (SELECT k, k // 10 AS parent FROM nodes WHERE k >= 10),
    walk AS (
      SELECT k, k AS root, 0 AS depth, CAST(k AS VARCHAR) AS path
      FROM nodes WHERE k < 10
      UNION ALL
      SELECT e.k, w.root, w.depth + 1, w.path || '/' || CAST(e.k AS VARCHAR)
      FROM edges e JOIN walk w ON e.parent = w.k)
    SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_nodes,
           COUNT(DISTINCT root) AS n_roots,
           MIN(path) AS min_path, MAX(path) AS max_path
    FROM walk GROUP BY depth ORDER BY depth
    """,
    description="native WITH RECURSIVE (Spark 4.1) over the a0153 customer forest, carrying materialized path strings through the recursion; per-depth census (node count, distinct roots, lexicographic min/max path) hash-matched against DuckDB's native recursive CTE — recursion that terminates wrongly, drops a level, or concatenates paths in the wrong order fails the hash; a0153 keeps the iterative-unroll form for engines/versions without the feature",
)
def a0173_recursive_cte_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_rcte")
    return spark.sql(
        """
        WITH RECURSIVE walk(k, root, depth, path) AS (
          SELECT k, k AS root, 0 AS depth, CAST(k AS STRING) AS path
          FROM (SELECT DISTINCT c_custkey AS k FROM customer_rcte) WHERE k < 10
          UNION ALL
          SELECT e.k, w.root, w.depth + 1, CONCAT(w.path, '/', CAST(e.k AS STRING))
          FROM (SELECT k, k DIV 10 AS parent
                FROM (SELECT DISTINCT c_custkey AS k FROM customer_rcte)
                WHERE k >= 10) e
          JOIN walk w ON e.parent = w.k)
        SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_nodes,
               COUNT(DISTINCT root) AS n_roots,
               MIN(path) AS min_path, MAX(path) AS max_path
        FROM walk GROUP BY depth ORDER BY depth
        """
    )
