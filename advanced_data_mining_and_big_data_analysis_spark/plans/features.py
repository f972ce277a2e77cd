"""Feature-engineering + metric queries — the reference notebook's core
semantics (SURVEY §2.5, §2.4, §2.8, §2.9) declared over the star schema.

Every feature is a pure Column expression from ``functions/``; the DuckDB
oracle recomputes the same arithmetic so the driver's hash check pins the
semantics (not just the row counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import calendar as C
from ..functions import metrics as M
from ..functions import scalar as S
from ..sources import load_table
from .registry import query

# Seasons as the reference maps them (kaggle.py:203)
_SEASON_SQL = """
    CASE CAST(FLOOR((CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) % 12 + 3) / 3) AS INTEGER)
         WHEN 1 THEN 'DJF' WHEN 2 THEN 'MAM' WHEN 3 THEN 'JJA' ELSE 'SON' END
"""


@query(
    "q25_calendar_features",
    oracle=f"""
    SELECT {_SEASON_SQL} AS season,
           (EXTRACT(isodow FROM o_orderdate) - 1 = 4) AS wd4,
           (EXTRACT(isodow FROM o_orderdate) - 1 >= 5) AS wd56,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY season, wd4, wd56
    ORDER BY season, wd4, wd56
    """,
    description="season bucket + weekday flags (kaggle.py:203-209; SURVEY §2.5)",
)
def q25_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    flags = C.weekday_flags("o_orderdate")
    return (
        orders.withColumn("season", C.season("o_orderdate"))
        .withColumn("wd4", flags["wd4"])
        .withColumn("wd56", flags["wd56"])
        .groupBy("season", "wd4", "wd56")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("season", "wd4", "wd56")
    )


@query(
    "q26_fourier_harmonics",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           ROUND(AVG(sin(dayofyear(o_orderdate) / 365.0 * 2 * pi() * 1)), 6) + 0 AS avg_sin1,
           ROUND(AVG(cos(dayofyear(o_orderdate) / 365.0 * 2 * pi() * 1)), 6) + 0 AS avg_cos1,
           ROUND(AVG(sin(dayofyear(o_orderdate) / 365.0 * 2 * pi() * 2)), 6) + 0 AS avg_sin2,
           ROUND(AVG(cos(dayofyear(o_orderdate) / 365.0 * 2 * pi() * 2)), 6) + 0 AS avg_cos2
    FROM orders GROUP BY order_year ORDER BY order_year
    """,
    description="day-of-year Fourier harmonics, order 2 (kaggle.py:214-234; SURVEY §2.5)",
)
def q26_fourier_harmonics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    h = C.fourier_doy("o_orderdate", order=2)
    return (
        orders.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (F.round(F.avg(h["sin1"]), 6) + 0.0).alias("avg_sin1"),
            (F.round(F.avg(h["cos1"]), 6) + 0.0).alias("avg_cos1"),
            (F.round(F.avg(h["sin2"]), 6) + 0.0).alias("avg_sin2"),
            (F.round(F.avg(h["cos2"]), 6) + 0.0).alias("avg_cos2"),
        )
        .orderBy("order_year")
    )


@query(
    "q27_holiday_windows",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(SUM(CASE WHEN EXTRACT(month FROM o_orderdate) = 12
                          AND EXTRACT(day FROM o_orderdate) BETWEEN 24 AND 31
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dec_window,
           CAST(SUM(CASE WHEN EXTRACT(month FROM o_orderdate) = 1
                          AND EXTRACT(day FROM o_orderdate) BETWEEN 1 AND 13
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_jan_window,
           CAST(SUM(CASE WHEN EXTRACT(month FROM o_orderdate) = 5
                          AND EXTRACT(day FROM o_orderdate) BETWEEN 1 AND 9
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_may_window
    FROM orders GROUP BY order_year ORDER BY order_year
    """,
    description="fixed-calendar holiday indicator families (kaggle.py:248-283; SURVEY §2.5)",
)
def q27_holiday_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(C.month_day_flag("o_orderdate", 12, (24, 31)).cast("long")).alias("n_dec_window"),
            F.sum(C.month_day_flag("o_orderdate", 1, (1, 13)).cast("long")).alias("n_jan_window"),
            F.sum(C.month_day_flag("o_orderdate", 5, (1, 9)).cast("long")).alias("n_may_window"),
        )
        .orderBy("order_year")
    )


_EASTER_YEARS = list(range(1995, 2002))
_EASTER_VALUES = ", ".join(
    f"({y}, DATE '{C.easter_date(y).isoformat()}')" for y in _EASTER_YEARS
)


@query(
    "q28_easter_windows",
    oracle=f"""
    WITH easter(year, easter) AS (VALUES {_EASTER_VALUES})
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(SUM(CASE WHEN DATEDIFF('day', easter, CAST(o_orderdate AS DATE)) BETWEEN -2 AND 10
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_easter_win,
           CAST(SUM(CASE WHEN DATEDIFF('day', easter, CAST(o_orderdate AS DATE)) BETWEEN 40 AND 47
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ascension_win,
           CAST(SUM(CASE WHEN DATEDIFF('day', easter, CAST(o_orderdate AS DATE)) BETWEEN 50 AND 58
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pentecost_win
    FROM orders JOIN easter ON easter.year = CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)
    GROUP BY order_year ORDER BY order_year
    """,
    description="anchor-relative Easter windows via per-year dim broadcast join (kaggle.py:326-329; SURVEY §2.3/§2.5)",
)
def q28_easter_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    joined = C.with_easter_anchor(orders, "o_orderdate", spark, _EASTER_YEARS)
    return (
        joined.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(C.anchor_window_flag("o_orderdate", F.col("easter"), (-2, 10)).cast("long")).alias("n_easter_win"),
            F.sum(C.anchor_window_flag("o_orderdate", F.col("easter"), (40, 47)).cast("long")).alias("n_ascension_win"),
            F.sum(C.anchor_window_flag("o_orderdate", F.col("easter"), (50, 58)).cast("long")).alias("n_pentecost_win"),
        )
        .orderBy("order_year")
    )


@query(
    "q29_unpivot_status",
    oracle="""
    WITH p AS (
      SELECT o_orderpriority,
             ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS f,
             ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS o,
             ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS p
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, status, total FROM (
      SELECT o_orderpriority, 'F' AS status, f AS total FROM p
      UNION ALL SELECT o_orderpriority, 'O', o FROM p
      UNION ALL SELECT o_orderpriority, 'P', p FROM p
    ) ORDER BY o_orderpriority, status
    """,
    description="wide→long unpivot via stack() — the GDP-table reshape (kaggle.py:195-202; SURVEY §2.3)",
)
def q29_unpivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
        .select(
            "o_orderpriority",
            F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("f"),
            F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("o"),
            F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("p"),
        )
    )
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'F', f, 'O', o, 'P', p) AS (status, total)",
    ).orderBy("o_orderpriority", "status")


@query(
    "q30_scoring_grid",
    oracle="""
    SELECT strftime(CAST(d AS DATE), '%Y-%m-%d') AS date, r_name,
           CAST(dayofyear(d) AS INTEGER) AS doy
    FROM generate_series(DATE '2019-01-01', DATE '2019-01-31', INTERVAL 1 DAY) t(d)
    CROSS JOIN region
    ORDER BY date, r_name
    """,
    description="synthetic scoring frame: date spine (sequence+explode) × dim cross join (kaggle.py:468-479; SURVEY §3 E3)",
)
def q30_scoring_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_name")
    spine = C.date_range_df(spark, "2019-01-01", "2019-01-31")
    return (
        spine.crossJoin(F.broadcast(region))
        .select(
            F.date_format("date", "yyyy-MM-dd").alias("date"),
            "r_name",
            F.dayofyear("date").alias("doy"),
        )
        .orderBy("date", "r_name")
    )


@query(
    "q31_smape_metric",
    oracle="""
    SELECT l_returnflag,
           ROUND(AVG(CASE WHEN (ABS(l_extendedprice) + ABS(l_extendedprice * (1 - l_discount))) / 200 = 0
                          THEN 0
                          ELSE ABS(l_extendedprice - l_extendedprice * (1 - l_discount))
                               / ((ABS(l_extendedprice) + ABS(l_extendedprice * (1 - l_discount))) / 200)
                     END), 6) AS smape_pct,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    description="SMAPE as a native aggregate expression, 0-safe (kaggle.py:109-131; SURVEY §2.4)",
)
def q31_smape_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pred = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(M.smape(F.col("l_extendedprice"), pred), 6).alias("smape_pct"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q32_best_weight",
    oracle="""
    WITH grid AS (SELECT CAST(w AS BIGINT) AS weight_milli FROM generate_series(970, 1020, 1) t(w)),
    scored AS (
      SELECT weight_milli,
             AVG(CASE WHEN (ABS(l_extendedprice) + ABS(l_extendedprice * (1 - l_discount) * weight_milli / 1000.0)) / 200 = 0
                      THEN 0
                      ELSE ABS(l_extendedprice - l_extendedprice * (1 - l_discount) * weight_milli / 1000.0)
                           / ((ABS(l_extendedprice) + ABS(l_extendedprice * (1 - l_discount) * weight_milli / 1000.0)) / 200)
                 END) AS s
      FROM lineitem CROSS JOIN grid GROUP BY weight_milli)
    SELECT weight_milli, ROUND(s, 6) AS smape
    FROM scored ORDER BY s, weight_milli LIMIT 1
    """,
    description="grid-searched scale factor minimizing SMAPE — one distributed pass over a broadcast weight grid (kaggle.py:497-523; SURVEY §2.4)",
)
def q32_best_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("yt"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("yp"),
    )
    best = M.find_min_smape(li, "yt", "yp", (970, 1020, 1))
    return best.select("weight_milli", F.round("smape", 6).alias("smape"))


@query(
    "q33_geometric_round",
    oracle="""
    SELECT CASE WHEN o_totalprice / 1000.0 < sqrt(FLOOR(o_totalprice / 1000.0) * CEIL(o_totalprice / 1000.0))
                THEN CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT)
                ELSE CAST(CEIL(o_totalprice / 1000.0) AS BIGINT) END AS price_k,
           COUNT(*) AS n_orders
    FROM orders GROUP BY price_k ORDER BY price_k
    """,
    description="geometric rounding (kaggle.py:837-842,858; SURVEY §2.8)",
)
def q33_geometric_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(S.geometric_round(F.col("o_totalprice") / 1000.0).alias("price_k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("price_k")
    )


@query(
    "q34_fold_ensemble",
    oracle="""
    WITH t AS (
      SELECT l_returnflag,
             l_extendedprice * (1 - l_discount) AS p1,
             l_extendedprice AS p2,
             l_extendedprice * (1 + l_tax) AS p3
      FROM lineitem),
    u AS (
      SELECT l_returnflag,
             CASE WHEN GREATEST(p1, p2, p3) - LEAST(p1, p2, p3) < 5000.0
                  THEN ((0.0 + p1) + p2 + p3) / 3
                  ELSE GREATEST(LEAST(p1, p2), LEAST(GREATEST(p1, p2), p3))
             END AS combined
      FROM t)
    SELECT l_returnflag, ROUND(AVG(combined), 4) AS avg_combined, COUNT(*) AS n
    FROM u GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    description="row-wise mean-or-median fold ensemble over an array column (kaggle.py:132-144; SURVEY §2.4)",
)
def q34_fold_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    preds = F.array(
        F.col("l_extendedprice") * (1 - F.col("l_discount")),
        F.col("l_extendedprice"),
        F.col("l_extendedprice") * (1 + F.col("l_tax")),
    )
    combined = S.better_than_median(preds, threshold=5000.0)
    return (
        li.withColumn("combined", combined)
        .groupBy("l_returnflag")
        .agg(F.round(F.avg("combined"), 4).alias("avg_combined"), F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
    )


@query(
    "q35_group_sample",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(rn AS INTEGER) AS rn, l_orderkey, l_linenumber
    FROM (SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                                    ORDER BY md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)),
                                             l_orderkey, l_linenumber) AS rn
          FROM lineitem)
    WHERE rn <= 5
    ORDER BY l_returnflag, l_linestatus, rn
    """,
    description="deterministic per-group sampling via hash-order top-k — the distributed form of groupby.apply(sample) (kaggle.py:424; SURVEY §2.4)",
)
def q35_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    order_hash = F.md5(F.concat(F.col("l_orderkey").cast("string"), F.lit("-"), F.col("l_linenumber").cast("string")))
    w = W.partitionBy("l_returnflag", "l_linestatus").orderBy(order_hash, "l_orderkey", "l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("l_returnflag", "l_linestatus", "rn", "l_orderkey", "l_linenumber")
        .orderBy("l_returnflag", "l_linestatus", "rn")
    )


@query(
    "q36_impute_nulls",
    oracle="""
    WITH d AS (
      SELECT CASE WHEN c_nationkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS seg,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer),
    f AS (SELECT COALESCE(seg, 'None') AS seg, COALESCE(bal, 0.0) AS bal,
                 (seg IS NULL) AS seg_was_null, (bal IS NULL) AS bal_was_null
          FROM d)
    SELECT seg, COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN bal_was_null THEN 1 ELSE 0 END) AS BIGINT) AS n_bal_imputed,
           ROUND(AVG(bal), 6) AS avg_bal
    FROM f GROUP BY seg ORDER BY seg
    """,
    description="null counting + imputation fill 0/'None' (kaggle.py:177-182,422-423; SURVEY §2.8/§2.9)",
)
def q36_impute_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.select(
        F.when(F.col("c_nationkey") % 5 == 0, F.lit(None)).otherwise(F.col("c_mktsegment")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias("bal"),
    ).withColumn("bal_was_null", F.col("bal").isNull())
    filled = S.impute_defaults(dirty)
    return (
        filled.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("bal_was_null").cast("long")).alias("n_bal_imputed"),
            F.round(F.avg("bal"), 6).alias("avg_bal"),
        )
        .orderBy("seg")
    )


@query(
    "q37_label_encode",
    oracle="""
    SELECT c.c_mktsegment, d.c_mktsegment_code, COUNT(*) AS n
    FROM customer c
    JOIN (SELECT c_mktsegment,
                 CAST(ROW_NUMBER() OVER (ORDER BY c_mktsegment) - 1 AS INTEGER) AS c_mktsegment_code
          FROM (SELECT DISTINCT c_mktsegment FROM customer)) d USING (c_mktsegment)
    GROUP BY c.c_mktsegment, d.c_mktsegment_code
    ORDER BY d.c_mktsegment_code
    """,
    description="alphabetical label encoding, sklearn LabelEncoder semantics (kaggle.py:372-395; SURVEY §2.9)",
)
def q37_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    encoded = S.label_encode(cust, "c_mktsegment")
    return (
        encoded.groupBy("c_mktsegment", "c_mktsegment_code")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment_code")
    )


@query(
    "q38_positional_fourier",
    oracle="""
    SELECT o_custkey,
           ROUND(AVG(sin(2 * pi() * (rn - 1) * 1 / 14.0)), 6) + 0 AS avg_psin1,
           ROUND(AVG(cos(2 * pi() * (rn - 1) * 1 / 14.0)), 6) + 0 AS avg_pcos1
    FROM (SELECT o_custkey,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders WHERE o_custkey <= 20)
    GROUP BY o_custkey ORDER BY o_custkey
    """,
    description="positional-index Fourier features over an ordered series (kaggle.py:183-192; SURVEY §2.5)",
)
def q38_positional_fourier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t = (F.row_number().over(w) - 1).cast("double")
    h = C.fourier_positional(t, freq=14.0, order=1)
    return (
        orders.withColumn("psin1", h["psin1"])
        .withColumn("pcos1", h["pcos1"])
        .groupBy("o_custkey")
        .agg(
            (F.round(F.avg("psin1"), 6) + 0.0).alias("avg_psin1"),
            (F.round(F.avg("pcos1"), 6) + 0.0).alias("avg_pcos1"),
        )
        .orderBy("o_custkey")
    )


_HOLIDAY_VALUES = ", ".join(
    f"('{c}', DATE '{d.isoformat()}', '{h}')" for c, d, h in C.holiday_rows(_EASTER_YEARS)
)


@query(
    "q39_holiday_dim_join",
    oracle=f"""
    WITH hd(country, hdate, holiday) AS (VALUES {_HOLIDAY_VALUES})
    SELECT country, holiday, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders JOIN hd ON CAST(o_orderdate AS DATE) = hdate
    GROUP BY country, holiday ORDER BY country, holiday
    """,
    description="holiday calendar dim (fixed + Easter-relative rules) broadcast-joined to the fact — the holidays-package materialization (kaggle.py:332-333,800-803; SURVEY §2.5)",
)
def q39_holiday_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    dim = C.holiday_dim(spark, _EASTER_YEARS)
    return (
        orders.join(F.broadcast(dim), F.to_date("o_orderdate") == dim.date)
        .groupBy("country", "holiday")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("country", "holiday")
    )


_FIXED_VALUES = ", ".join(
    f"('{c}', DATE '{d.isoformat()}', '{h}')" for c, d, h in C.fixed_holiday_rows(_EASTER_YEARS)
)
_MOVEABLE_VALUES = ", ".join(
    f"('{c}', DATE '{d.isoformat()}', '{h}')" for c, d, h in C.moveable_holiday_rows(_EASTER_YEARS)
)


@query(
    "a085_holiday_observed_shift",
    oracle=f"""
    WITH fixed(country, hdate, holiday) AS (VALUES {_FIXED_VALUES}),
    moveable(country, hdate, holiday) AS (VALUES {_MOVEABLE_VALUES}),
    observed AS (
      SELECT country,
             CASE WHEN dayofweek(hdate) = 6 THEN hdate + 2 ELSE hdate + 1 END AS hdate,
             holiday || ' (observed)' AS holiday
      FROM fixed WHERE dayofweek(hdate) IN (0, 6)),
    hd AS (SELECT * FROM fixed UNION ALL SELECT * FROM moveable
           UNION ALL SELECT * FROM observed)
    SELECT country, holiday, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders JOIN hd ON CAST(o_orderdate AS DATE) = hdate
    GROUP BY country, holiday ORDER BY country, holiday
    """,
    description="observed-day holiday shifting (holidays-package observed=True parity, kaggle.py:332-333): weekend fixed-date holidays gain a Monday '(observed)' entry; the ORACLE re-derives the shift rule in SQL from the raw fixed dates, so the hash pins the rule itself, not just the dim contents (SURVEY §2.5 holiday source)",
)
def a085_holiday_observed_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    dim = C.holiday_dim(spark, _EASTER_YEARS, observed=True)
    return (
        orders.join(F.broadcast(dim), F.to_date("o_orderdate") == dim.date)
        .groupBy("country", "holiday")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("country", "holiday")
    )


@query(
    "a086_periodogram",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY d),
    stats AS (SELECT COUNT(*) AS n, AVG(rev) AS mean, var_pop(rev) AS v FROM daily),
    idx AS (SELECT rev - mean AS x, ROW_NUMBER() OVER (ORDER BY d) - 1 AS t, n, v
            FROM daily CROSS JOIN stats),
    dft AS (
      SELECT k,
             SUM(x * cos(2 * pi() * k * t / n)) AS c,
             SUM(x * sin(2 * pi() * k * t / n)) AS s,
             FIRST(n) AS n, FIRST(v) AS v
      FROM idx CROSS JOIN range(1, 11) r(k) GROUP BY k)
    SELECT k, ROUND(n * 1.0 / k, 2) AS period_steps,
           ROUND((c * c + s * s) / (n * n * v), 6) AS power_norm
    FROM dft ORDER BY k
    """,
    description="periodogram (SURVEY §2.5): normalized spectral power of the daily revenue series at harmonics 1..10 — the reference's scipy.signal.periodogram diagnostic (kaggle.py:145-176) as a relational DFT: daily rollup (calendar-bounded) x broadcast frequency set, two partial aggregates per frequency, no collect/UDF",
)
def a086_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timeseries import periodogram

    daily = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    return periodogram(daily, "rev", "d", num_freqs=10)


def _mi_oracle_block(col: str, bins: int = 8) -> str:
    """DuckDB MI for one lineitem column vs l_returnflag — the same
    equal-width binning + joint/marginal decomposition as
    ml/feature_select.binned_mutual_information."""
    return f"""
    SELECT '{col}' AS feature, ROUND(SUM(term), 6) AS mi_nats FROM (
      SELECT (c * 1.0 / n) * ln((c * 1.0 * n) / (cb * 1.0 * cl)) AS term FROM (
        SELECT bin, label, c,
               SUM(c) OVER () AS n,
               SUM(c) OVER (PARTITION BY bin) AS cb,
               SUM(c) OVER (PARTITION BY label) AS cl
        FROM (
          SELECT LEAST(CAST(FLOOR(({col} - mn) * {bins} / (mx - mn)) AS INTEGER), {bins - 1}) AS bin,
                 l_returnflag AS label, COUNT(*) AS c
          FROM lineitem CROSS JOIN (SELECT MIN({col}) AS mn, MAX({col}) AS mx FROM lineitem)
          GROUP BY bin, label)))
    """


_MI_COLS = ["l_discount", "l_extendedprice", "l_quantity"]


@query(
    "a087_mi_feature_filter",
    oracle=" UNION ALL ".join(_mi_oracle_block(c) for c in _MI_COLS)
    + " ORDER BY feature",
    description="mutual-information feature filter (SURVEY §2.9, reference MI_THRESHOLD kaggle.py:80): equal-width binned MI between lineitem numerics and l_returnflag — one melt pass, joint counts, windowed marginals over the tiny count frame; ml/feature_select.mi_select applies the threshold",
)
def a087_mi_feature_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.feature_select import binned_mutual_information

    li = load_table(spark, sf_dir, "lineitem")
    return binned_mutual_information(li, _MI_COLS, "l_returnflag", bins=8).orderBy("feature")
