"""Relational operator surface — declared, DuckDB-oracle-checked queries.

The reference's relational surface is pandas projection/filter/join/groupby
(SURVEY.md §2.2-§2.7); the oracle gate additionally needs the classic
TPC-H-style operators over the driver star schema. Each query here is the
Spark-first expression of one operator family; the oracle SQL lives next to
it so column names/rounding stay in lockstep.

Scale notes on the recurring shapes:
- fact⋈dim joins broadcast the dim side explicitly (nation/region are
  size-invariant; customer at 100 TB still ~GBs → AQE decides);
- fact⋈fact joins (lineitem⋈orders) shuffle on the join key — at 100 TB
  both sides would be bucketed by orderkey to make this shuffle-free;
- top-k is orderBy+limit, which Spark executes as TakeOrderedAndProject
  (per-partition heap + driver merge — no global sort);
- every aggregate is partial+final (map-side combine) for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 6)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 6)                                   AS avg_price,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 shape: scan→filter→groupBy→multi-agg→sort (SURVEY §7.2)",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= _ts("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q02_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    description="global top-k: TakeOrderedAndProject, no full sort (SURVEY §2.6)",
)
def q02_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q03_discount_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6 shape: tight conjunctive filter fully pushed to parquet scan (SURVEY §2.2)",
)
def q03_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@query(
    "q04_top_customers",
    oracle="""
    SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="fact⋈dim equi-join + agg + top-k (SURVEY §2.3/§2.4)",
)
def q04_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q05_regional_revenue",
    oracle="""
    SELECT r_name, n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
    description="TPC-H Q5 shape: multi-way join, small dims broadcast (SURVEY §2.3)",
)
def q05_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("r_name", "n_name")
    )


@query(
    "q06_nations_per_region",
    oracle="""
    SELECT r_name, COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    description="broadcast dim⋈dim join (SURVEY §2.3)",
)
def q06_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
        .orderBy("r_name")
    )


@query(
    "q07_semi_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    description="left-semi join (EXISTS) (SURVEY §2.3)",
)
def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "q08_anti_join",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT'
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n_name ORDER BY n_name
    """,
    description="left-anti join (NOT EXISTS with filtered subquery) + broadcast dim (SURVEY §2.3)",
)
def q08_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    # filtered anti-join side: an unfiltered one matches every customer at
    # sf>=0.01 (10 orders per customer), which would make the check vacuous
    recent_urgent = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderdate") >= _ts("2000-01-01"))
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(recent_urgent, cust.c_custkey == recent_urgent.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_name")
    )


@query(
    "q09_order_count_histogram",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY n_orders ORDER BY n_orders
    """,
    description="left outer join preserving zero-order customers, two-level agg (SURVEY §2.3/§2.4)",
)
def q09_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # aggregate-below-join: collapse orders to (custkey, count) BEFORE
    # touching customers, so the join carries one row per ordering
    # customer instead of one per order (at 100 TB: the orders shuffle
    # is map-side-combined to customer cardinality, and the fact table
    # never rides through the join). COUNT over a LEFT join of the raw
    # rows is the same number with the null group counted as 0.
    per_cust = (
        cust.join(
            orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("_cnt")),
            cust.c_custkey == F.col("o_custkey"),
            "left",
        )
        .select(F.coalesce(F.col("_cnt"), F.lit(0)).alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers")).orderBy("n_orders")


@query(
    "q10_topk_per_group",
    oracle="""
    SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders WHERE o_custkey <= 100)
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    description="per-group top-k via ranking window — replaces the reference's groupby.apply(sample) shape (kaggle.py:424; SURVEY §2.6)",
)
def q10_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    )


@query(
    "q11_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           CAST(DATEDIFF('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders WHERE o_custkey <= 50
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    description="analytic windows: running sum + lag (SURVEY §2.5 'absent in reference' row)",
)
def q11_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn(
            "running_spend",
            F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2),
        )
        .withColumn(
            "days_since_prev",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("long"),
        )
        .withColumn("order_date", F.date_format("o_orderdate", "yyyy-MM-dd"))
        .select("o_custkey", "o_orderkey", "order_date", "running_spend", "days_since_prev")
        .orderBy("o_custkey", "order_date", "o_orderkey")
    )


@query(
    "q12_rollup_customers",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name, COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY region_name, nation_name
    """,
    description="ROLLUP hierarchical aggregate (SURVEY §2.4 'absent in reference' row)",
)
def q12_rollup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
        .orderBy("region_name", "nation_name")
    )


@query(
    "q13_cube_lineitem",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    description="CUBE aggregate over all grouping-set combinations (SURVEY §2.4)",
)
def q13_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n_items"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_items",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "q14_set_operations",
    oracle="""
    WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
    SELECT 'both' AS tag, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
    UNION ALL
    SELECT 'cust_only' AS tag, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
    UNION ALL
    SELECT 'supp_only' AS tag, nk FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
    ORDER BY tag, nk
    """,
    description="INTERSECT / EXCEPT / UNION ALL set operators (SURVEY §2.7)",
)
def q14_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    sn = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    both = cn.intersect(sn).select(F.lit("both").alias("tag"), "nk")
    cust_only = cn.subtract(sn).select(F.lit("cust_only").alias("tag"), "nk")
    supp_only = sn.subtract(cn).select(F.lit("supp_only").alias("tag"), "nk")
    return both.unionByName(cust_only).unionByName(supp_only).orderBy("tag", "nk")


@query(
    "q15_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    description="exact distinct aggregation (SURVEY §2.4; approx_count_distinct is the scale path)",
)
def q15_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q16_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS total_f,
           ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS total_o,
           ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS total_p
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="pivot / conditional aggregation (np.where shape, kaggle.py:218-225; SURVEY §2.2)",
)
def q16_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return pivoted.select(
        "o_orderpriority",
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("total_f"),
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("total_o"),
        F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("total_p"),
    ).orderBy("o_orderpriority")


@query(
    "q17_brand_having",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts, ROUND(AVG(p_retailprice), 6) AS avg_price
    FROM part GROUP BY p_brand HAVING COUNT(*) > 5 ORDER BY p_brand
    """,
    description="groupBy + HAVING post-aggregate filter (SURVEY §2.4)",
)
def q17_brand_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"), F.round(F.avg("p_retailprice"), 6).alias("avg_price"))
        .filter(F.col("n_parts") > 5)
        .orderBy("p_brand")
    )


@query(
    "q18_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice), 2) AS total_small_qty_price, COUNT(*) AS n_lines
    FROM lineitem l
    JOIN (SELECT l_partkey AS pk, AVG(l_quantity) AS avg_qty FROM lineitem GROUP BY l_partkey) a
      ON l.l_partkey = a.pk
    WHERE l.l_quantity < 0.5 * a.avg_qty
    """,
    description="TPC-H Q17 shape: aggregate subquery joined back to the fact (SURVEY §2.3)",
)
def q18_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # avg over integral quantities: integer-exact double sums → bit-identical
    # across engines, so the 0.5*avg comparison can't flip rows.
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_small_qty_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q19_monthly_priority_orders",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
           COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY order_year, order_month
    ORDER BY order_year, order_month
    """,
    description="IN-list predicate + calendar-part grouping (dt.year/dt.month shape, kaggle.py:203-214)",
)
def q19_monthly_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("order_year", "order_month")
    )


@query(
    "q20_json_props",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           ROUND(AVG(CAST(props->>'$.k' AS DOUBLE)), 6) AS avg_k,
           CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="JSON extraction from string props (SURVEY §2.8 array/json row; events table)",
)
def q20_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(k.cast("double")), 6).alias("avg_k"),
            F.sum(k.cast("int")).alias("sum_k"),
        )
        .orderBy("event_type")
    )


@query(
    "q21_hourly_events",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM events GROUP BY window_start ORDER BY window_start
    """,
    description="tumbling event-time window, batch parity of the streaming op (SURVEY §2.11)",
)
def q21_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .orderBy("window_start")
    )


@query(
    "q22_string_functions",
    oracle="""
    SELECT p_type, COUNT(*) AS n_parts,
           MIN(UPPER(p_name)) AS first_name,
           CAST(MAX(LENGTH(p_name)) AS BIGINT) AS max_name_len
    FROM part WHERE p_name LIKE '%a%'
    GROUP BY p_type ORDER BY p_type
    """,
    description="string scalar functions + LIKE predicate (SURVEY §2.8)",
)
def q22_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").like("%a%"))
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min(F.upper("p_name")).alias("first_name"),
            F.max(F.length("p_name")).cast("long").alias("max_name_len"),
        )
        .orderBy("p_type")
    )


@query(
    "q23_union_years",
    oracle="""
    SELECT src, yr, n FROM (
      SELECT 'lineitem' AS src, CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS yr, COUNT(*) AS n
      FROM lineitem GROUP BY yr
      UNION ALL
      SELECT 'orders' AS src, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr, COUNT(*) AS n
      FROM orders GROUP BY yr
    ) ORDER BY src, yr
    """,
    description="union-all of heterogeneous aggregates (pd.concat axis=0 shape, kaggle.py:415-416; SURVEY §2.7)",
)
def q23_union_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.year("l_shipdate").alias("yr"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("lineitem").alias("src"), "yr", "n")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("orders").alias("src"), "yr", "n")
    )
    return li.unionByName(orders).orderBy("src", "yr")


@query(
    "q24_price_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders GROUP BY bucket ORDER BY bucket
    """,
    description="histogram binning via floor-div (plt.hist shape, kaggle.py:862-870; SURVEY §2.4)",
)
def q24_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.floor(F.col("o_totalprice") / 50000).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("bucket")
    )
