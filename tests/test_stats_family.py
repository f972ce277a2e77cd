"""Property + plan-shape tests for the statistical-analytics family
(plans/stats.py, q136-q149). Cross-engine value parity is pinned by the
DuckDB oracles; these tests pin the semantics and the plan shapes."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

QUERIES = all_queries()

_STATS_QUERIES = [
    "q136_acf_daily_revenue",
    "q137_cusum_changepoints",
    "a138_welch_ttest",
    "a139_ols_trend",
    "a140_chi_square",
    "a141_corr_matrix",
    "a142_bootstrap_ci",
    "a143_benford_digits",
    "a0146_ohlc_bars",
    "a0147_sliding_distinct_users",
    "a0148_fuzzy_join",
    "a0149_key_skew_report",
]


def test_stats_family_plans_have_no_cartesian(spark, sf_dir):
    """Dimension crossJoins in this family must plan as broadcast
    nested loops over scalar/tiny frames, never CartesianProduct."""
    for name in _STATS_QUERIES:
        plan = QUERIES[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name


def test_q149_topk_is_bounded_not_global_sort(spark, sf_dir):
    """The top-10 share must come from TakeOrdered (bounded per-partition
    heaps), never a full global sort of the key-count frame."""
    plan = (
        QUERIES["a0149_key_skew_report"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_cusum_prefix_identity_matches_direct_fold(spark):
    """The window rewrite S_t = P_t - min(0, running-min P) must equal the
    direct recursion S_t = max(0, S_(t-1) + c_t) on an arbitrary series."""
    cs = [1.5, -2.0, 3.0, 0.5, -4.0, 2.5, 2.5, -1.0, 0.0, 5.0]
    # direct recursion
    s, direct = 0.0, []
    for c in cs:
        s = max(0.0, s + c)
        direct.append(s)
    # prefix-sum identity
    # the running min must INCLUDE the current prefix (and the empty
    # prefix 0), exactly like the CURRENT ROW window frame in q137
    p, pmin, ident = 0.0, math.inf, []
    for c in cs:
        p += c
        pmin = min(pmin, p)
        ident.append(p - min(pmin, 0.0))
    assert all(abs(a - b) < 1e-12 for a, b in zip(direct, ident))

    # and the Spark window expression agrees with the python identity
    from pyspark.sql import Window as W

    df = spark.createDataFrame([(i, c) for i, c in enumerate(cs)], "i int, ci double")
    w = W.orderBy("i").rowsBetween(W.unboundedPreceding, 0)
    got = (
        df.select("i", F.sum("ci").over(w).alias("pt"))
        .withColumn("mn", F.min("pt").over(w))
        .select("i", (F.col("pt") - F.least(F.col("mn"), F.lit(0.0))).alias("s"))
        .orderBy("i")
        .collect()
    )
    assert all(abs(r["s"] - direct[r["i"]]) < 1e-12 for r in got)


def test_bootstrap_se_is_sane(spark, sf_dir):
    """Bootstrap SE must be positive and within a loose factor of the
    analytic SE of the mean (weights have variance 1/2, so the expected
    replicate variance is about half the analytic squared SE)."""
    row = QUERIES["a142_bootstrap_ci"].fn(spark, sf_dir).collect()[0]
    assert row["boot_se"] > 0
    from advanced_data_mining_and_big_data_analysis_spark.sources import load_table

    st = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.stddev_samp("o_totalprice").alias("sd"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    analytic_se = st["sd"] / math.sqrt(st["n"])
    assert 0.1 * analytic_se < row["boot_se"] < 3.0 * analytic_se
    assert row["ci_lo"] < row["mean"] < row["ci_hi"]


def test_fuzzy_join_recovers_identity(spark, sf_dir):
    """Every typo class must link back to the original key: within a
    last-4-digit block the true source is the unique lowest-distance
    candidate for the deterministic perturbations used."""
    rows = QUERIES["a0148_fuzzy_join"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_matched"] > 0
        assert r["n_correct"] == r["n_matched"], r
    # class 2 is unperturbed: distance must be exactly 0
    assert next(r for r in rows if r["typo_class"] == 2)["avg_lev"] == 0.0


def test_sliding_distinct_wau_bounds(spark, sf_dir):
    """WAU7 must be >= DAU on every day and <= the 7-day sum of DAUs —
    the sandwich every correct sliding-distinct satisfies."""
    out = QUERIES["a0147_sliding_distinct_users"].fn(spark, sf_dir)
    bad = out.filter(F.col("wau7") < F.col("dau")).count()
    assert bad == 0


def test_ohlc_invariants(spark, sf_dir):
    """low <= open/close <= high on every bar."""
    out = QUERIES["a0146_ohlc_bars"].fn(spark, sf_dir)
    bad = out.filter(
        (F.col("low") > F.col("open"))
        | (F.col("low") > F.col("close"))
        | (F.col("high") < F.col("open"))
        | (F.col("high") < F.col("close"))
    ).count()
    assert bad == 0


def test_benford_fractions_sum_to_one(spark, sf_dir):
    rows = QUERIES["a143_benford_digits"].fn(spark, sf_dir).collect()
    assert abs(sum(r["obs_frac"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["benford_frac"] for r in rows) - 1.0) < 1e-3


def test_corr_matrix_values_in_range(spark, sf_dir):
    rows = QUERIES["a141_corr_matrix"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    assert all(-1.0 <= r["pearson_r"] <= 1.0 for r in rows)
