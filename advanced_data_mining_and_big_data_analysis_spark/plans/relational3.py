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
    "q69_full_outer_join",
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
def q69_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "q71_group_apply",
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
def q71_group_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
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
