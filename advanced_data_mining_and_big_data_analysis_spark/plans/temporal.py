"""Temporal / mutation declared queries: CDC upsert apply and as-of join.

Two operator families every warehouse-shaped pipeline needs and the
DataFrame API lacks as primitives: MERGE-style incremental maintenance
(q97, ``operators/cdc.py``) and the temporal as-of join (q98,
``operators/joins.py:asof_join``). The DuckDB oracles use a recursive
latest-wins window and the native ASOF JOIN respectively, so the hash
pins the exact merge/as-of semantics, not a lookalike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import apply_cdc
from ..operators.joins import asof_join
from ..sources import load_table
from .registry import query

_INS_OFFSET = 10_000_000_000


@query(
    "a097_cdc_upsert",
    oracle=f"""
    WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS tp
                  FROM orders),
    ch AS (
      SELECT k, 'U' AS op, 1 AS seq, st, tp * 1.1 AS tp FROM base WHERE k % 10 = 0
      UNION ALL SELECT k, 'U', 2, st, tp * 1.2 FROM base WHERE k % 30 = 0
      UNION ALL SELECT k, 'D', 3, NULL, NULL FROM base WHERE k % 17 = 3
      UNION ALL SELECT k + {_INS_OFFSET}, 'I', 1, 'N', 999.99 FROM base WHERE k % 23 = 5),
    latest AS (SELECT * FROM ch
               QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) = 1),
    applied AS (
      SELECT b.k, b.st, b.tp FROM base b LEFT JOIN latest l ON b.k = l.k
      WHERE l.k IS NULL
      UNION ALL
      SELECT k, st, tp FROM latest WHERE op <> 'D')
    SELECT st AS o_orderstatus, COUNT(*) AS n_rows,
           ROUND(SUM(tp), 2) AS sum_totalprice
    FROM applied GROUP BY st ORDER BY st
    """,
    description="CDC upsert apply (Delta-MERGE semantics on plain DataFrames): a synthesized I/U/D change feed with conflicting per-key sequences — latest-wins ranking over the feed, anti-join drop, union upserts; exercises update-then-delete and double-update conflicts (operators/cdc.py)",
)
def a097_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").alias("tp"),
    )
    k = F.col("k")
    changes = (
        base.filter(k % 10 == 0)
        .select("k", F.lit("U").alias("op"), F.lit(1).alias("seq"), "st", (F.col("tp") * 1.1).alias("tp"))
        .unionByName(
            base.filter(k % 30 == 0).select(
                "k", F.lit("U").alias("op"), F.lit(2).alias("seq"), "st", (F.col("tp") * 1.2).alias("tp")
            )
        )
        .unionByName(
            base.filter(k % 17 == 3).select(
                "k",
                F.lit("D").alias("op"),
                F.lit(3).alias("seq"),
                F.lit(None).cast("string").alias("st"),
                F.lit(None).cast("double").alias("tp"),
            )
        )
        .unionByName(
            base.filter(k % 23 == 5).select(
                (k + _INS_OFFSET).alias("k"),
                F.lit("I").alias("op"),
                F.lit(1).alias("seq"),
                F.lit("N").alias("st"),
                F.lit(999.99).alias("tp"),
            )
        )
    )
    applied = apply_cdc(base, changes, key="k", op_col="op", seq_col="seq")
    return (
        applied.groupBy(F.col("st").alias("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("tp"), 2).alias("sum_totalprice"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "a098_asof_join",
    oracle="""
    WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
    views AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
    SELECT c.user_id % 10 AS cohort, COUNT(*) AS n_clicks,
           COUNT(v.value) AS n_matched,
           ROUND(SUM(COALESCE(v.value, 0)), 2) AS sum_asof_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    GROUP BY cohort ORDER BY cohort
    """,
    description="as-of join (temporal join primitive Spark lacks; DuckDB native ASOF JOIN as the oracle): every click joined to the user's most recent view at-or-before it — implemented as union + one last-non-null window per key (single shuffle, linear scan; deliberately NOT the quadratic range-join form), per-cohort rollup",
)
def a098_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    joined = asof_join(clicks, views, on="user_id")
    return (
        joined.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.count("value").alias("n_matched"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("sum_asof_value"),
        )
        .orderBy("cohort")
    )


# ---------------------------------------------------------------------------
# q152 — SCD Type-2 history build from the q97 change feed: where q97
# APPLIES changes (latest-wins current state), q152 MATERIALIZES the
# full validity history — every non-delete version gets
# [eff_from, eff_to) bounds via LEAD over the per-key change sequence,
# a version is CURRENT iff nothing (update or tombstone) supersedes it.
# One window over (key, seq) — the warehouse dimension-history pattern
# (Kimball SCD2) on plain DataFrames. The report pins version counts,
# current/closed splits, and the exact-decimal sum of current prices
# per status, so a wrong LEAD frame, a tombstone that fails to close
# history, or an insert misversioned as an update all flip the hash.
# ---------------------------------------------------------------------------


@query(
    "a0152_scd2_history",
    oracle=f"""
    WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS tp
                  FROM orders),
    ch AS (
      SELECT k, 'I' AS op, 0 AS seq, st, tp FROM base
      UNION ALL SELECT k, 'U', 1, st, tp * 1.1 FROM base WHERE k % 10 = 0
      UNION ALL SELECT k, 'U', 2, st, tp * 1.2 FROM base WHERE k % 30 = 0
      UNION ALL SELECT k, 'D', 3, NULL, NULL FROM base WHERE k % 17 = 3
      UNION ALL SELECT k + {_INS_OFFSET}, 'I', 1, 'N', 999.99 FROM base WHERE k % 23 = 5),
    v AS (
      SELECT k, op, seq, st, tp,
             LEAD(seq) OVER (PARTITION BY k ORDER BY seq) AS eff_to
      FROM ch),
    hist AS (SELECT * FROM v WHERE op <> 'D')
    SELECT st AS o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(SUM(CASE WHEN eff_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
           CAST(SUM(CASE WHEN eff_to IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_closed,
           ROUND(SUM(CASE WHEN eff_to IS NULL
                          THEN CAST(tp AS DECIMAL(18,4)) ELSE 0 END), 2) AS current_price_sum
    FROM hist GROUP BY st ORDER BY o_orderstatus
    """,
    description="SCD Type-2 dimension history build (Kimball pattern) from a conflicting I/U/D change feed: every non-delete version gets [eff_from, eff_to) validity via LEAD over the per-key sequence, tombstones close history without creating versions, current = unsuperseded; per-status version/current/closed counts plus the exact-DECIMAL sum of current prices — the materialized-history complement to q97's latest-wins apply; one key-partitioned window, shuffle only on the key",
)
def a0152_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").alias("tp"),
    )
    k = F.col("k")
    ch = (
        base.select("k", F.lit("I").alias("op"), F.lit(0).alias("seq"), "st", "tp")
        .unionByName(
            base.filter(k % 10 == 0).select(
                "k", F.lit("U").alias("op"), F.lit(1).alias("seq"), "st",
                (F.col("tp") * 1.1).alias("tp"),
            )
        )
        .unionByName(
            base.filter(k % 30 == 0).select(
                "k", F.lit("U").alias("op"), F.lit(2).alias("seq"), "st",
                (F.col("tp") * 1.2).alias("tp"),
            )
        )
        .unionByName(
            base.filter(k % 17 == 3).select(
                "k", F.lit("D").alias("op"), F.lit(3).alias("seq"),
                F.lit(None).cast("string").alias("st"),
                F.lit(None).cast("double").alias("tp"),
            )
        )
        .unionByName(
            base.filter(k % 23 == 5).select(
                (k + _INS_OFFSET).alias("k"), F.lit("I").alias("op"),
                F.lit(1).alias("seq"), F.lit("N").alias("st"),
                F.lit(999.99).alias("tp"),
            )
        )
    )
    v = ch.withColumn("eff_to", F.lead("seq").over(W.partitionBy("k").orderBy("seq")))
    hist = v.filter(F.col("op") != "D")
    return (
        hist.groupBy(F.col("st").alias("o_orderstatus"))
        .agg(
            F.count("*").alias("n_versions"),
            F.sum(F.col("eff_to").isNull().cast("long")).alias("n_current"),
            F.sum(F.col("eff_to").isNotNull().cast("long")).alias("n_closed"),
            F.round(
                F.sum(
                    F.when(
                        F.col("eff_to").isNull(), F.col("tp").cast("decimal(18,4)")
                    ).otherwise(F.lit(0).cast("decimal(18,4)"))
                ),
                2,
            ).alias("current_price_sum"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# a0174 — cogrouped-pandas as-of join: the COGROUP flavor of the UDF
# surface (SURVEY §2.12) that a098's native window formulation renders
# unnecessary — kept as a first-class operator because it is the shape
# teams port pandas merge_asof code into first, and the driver hash
# proves it agrees with DuckDB's native ASOF JOIN (and therefore with
# a098). Each user's click/view partitions ship to ONE python worker as
# two Arrow batches; pandas merge_asof runs per key. Scale: state is
# bounded per key, the shuffle is the same single exchange a
# groupBy(user_id) pays; a098's window form stays the hot path.
# ---------------------------------------------------------------------------


@query(
    "a0174_cogroup_asof_join",
    oracle="""
    WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
    views AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
    SELECT c.user_id % 10 AS cohort, COUNT(*) AS n_clicks,
           COUNT(v.value) AS n_matched,
           ROUND(SUM(COALESCE(v.value, 0)), 2) AS sum_asof_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    GROUP BY cohort ORDER BY cohort
    """,
    description="cogrouped applyInPandas as-of join (the §2.12 cogroup UDF shape): clicks and views cogrouped per user ship as two Arrow batches to one pandas merge_asof call per key (backward, exact matches allowed, NaN->NULL restored for Spark count/sum semantics); per-cohort rollup hash-matched against DuckDB's native ASOF JOIN — the same oracle a098's native union+window formulation passes, so the two implementations are pinned equal",
)
def a0174_cogroup_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    # Both cogroup children derive from the SAME scan, and Catalyst
    # conflates the shared ts attribute across them — the right Arrow
    # batch then arrives WITHOUT its ts column (observed: right columns
    # ['user_id', 'value']). Renaming the right side's shared columns
    # breaks the attribute sharing so both frames ship whole.
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"), "value"
    )

    def asof_pd(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "value": pd.Series(dtype="float64")})
        if right.empty:
            # a key with clicks but no views: cogroup hands over an
            # empty (possibly column-less) frame — every click unmatched
            return pd.DataFrame({"user_id": left["user_id"],
                                 "value": [None] * len(left)})
        # sort by (ts, payload) so the backward match among equal-ts
        # view rows picks the max payload tuple — asof_join's tie rule
        left = left.sort_values(["ts", "event_id"], kind="mergesort")
        right = right.sort_values(["v_ts", "value"], kind="mergesort")
        out = pd.merge_asof(left, right.drop(columns=["v_user"]),
                            left_on="ts", right_on="v_ts",
                            direction="backward", allow_exact_matches=True)
        # merge_asof emits NaN for no-match; restore NULL so Spark's
        # count/sum(null) semantics (and the oracle's) apply
        out["value"] = out["value"].astype(object).where(out["value"].notna(), None)
        return out[["user_id", "value"]]

    joined = (
        clicks.groupBy("user_id")
        .cogroup(views.groupBy("v_user"))
        .applyInPandas(asof_pd, "user_id long, value double")
    )
    return (
        joined.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.count("value").alias("n_matched"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("sum_asof_value"),
        )
        .orderBy("cohort")
    )
