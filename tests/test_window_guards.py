"""Registry-wide WindowExec guard (VERDICT r3 item 6).

An unpartitioned window moves ALL rows to one task — the classic
100-TB killer. Most declared queries must never plan one over data
rows; the few that do run them over provably bounded frames
(aggregated boundaries, distinct dims, calendar spines) and are
allowlisted HERE with the justification, so a future edit can't
silently globalize a window without failing this test.
"""

from __future__ import annotations

import re

import pytest

from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

QUERIES = all_queries()

# name -> why an unpartitioned window over its input is bounded & safe.
# Every entry must name the bounded frame it runs over.
ALLOWED_UNPARTITIONED: dict[str, str] = {
    "q37_label_encode": "dense_rank over the DISTINCT label side only (|labels| rows, ~5)",
    "a063_late_events": "carry-in prefix max over per-chunk boundary aggregates (#events/8192 rows)",
    "a065_exact_percentiles": "interpolated percentile over per-flag aggregates (bounded group count)",
    "a066_ntile_quartiles": "ntile over one-row-per-customer spend aggregates of a bounded cohort",
    "a074_trailing_range_window": "trailing mean over the monthly rollup spine (<= #months rows)",
    "a081_cume_dist": "cume_dist over per-priority aggregates (9 rows)",
    "a086_periodogram": "DFT rank spine over the daily rollup (calendar-bounded, <= #days rows)",
    "a089_trailing_range_join": "trailing window over the daily revenue rollup (calendar-bounded)",
    "a096_ivf_multiprobe": "probe ranking over the query-to-centroid distance frame (k_clusters rows)",
    "q102_pagerank_transitions": "rank over the 5-node page dim (graph dim, not events)",
    "q103_weighted_sample": "A-ES top-k rank over the k-row candidate frame after TakeOrdered",
    "a0013_hits_scores": "rank + max-normalizer over the 20-row top-authority frame already truncated by TakeOrdered limit (the global MAX(s) is the rank-1 row's s, so it rides the k-row frame)",
    "a0014_lof_outliers": "rank over the 20-row top-LOF frame already truncated by TakeOrdered limit",
    "q107_winsorize": "percentile interpolation over per-source aggregates (#sources rows)",
    "q110_token_budget": "weight-sum window over the per-source frame (one row per source)",
    "q112_cohort_retention": "retention matrix over cohort-month aggregates (calendar-bounded)",
    "q126_quantile_sketch": "cumulative count over the merged histogram (<= 512 bin rows)",
    "q135_anomaly_flags": "trailing 7-day stats over the daily revenue rollup (calendar-bounded)",
    "a0136_ks_drift_test": "CDF cumulative sum over the merged histogram (<= 1024 bin rows)",
    "a0097_stl_decompose": "centered 7-day MA over the daily revenue rollup (calendar-bounded)",
    "a0102_funnel_conversion": "conversion-rate lag over the 4-row stage-count frame, never events",
    "a0104_sax_motifs": "8-day leads over the daily revenue rollup spine (calendar-bounded)",
    "a0105_range_partition_plan": "cumsum over the <=256-bucket histogram + lag over the 16-row plan frame, never data rows",
    "a0050_acf_ljung_box": "14 lags over the daily revenue rollup (calendar-bounded)",
    "a0052_haar_energy": "row_number index over the daily revenue rollup (calendar-bounded, truncated to 256)",
    "a0058_cart_split": "cumulative sufficient statistics over the <=64-bucket histogram frame, never data rows",
    "a0059_bh_fdr": "BH step-up rank over the 64-row hypothesis frame, never events",
    "a0067_roc_auc": "tie-rank cumulative counts over the DISTINCT-score frame (bounded by the integer score range; bucket first for continuous scores)",
    "a0068_lift_gains": "cumulative gains over the 10-row decile frame, never documents",
    "a0122_compaction_plan": "next-fit cumsum over the FILE INVENTORY frame (one row per partition file, never data rows)",
    "a0129_inbatch_negatives": "deterministic batching row_number — the oracle-parity twin of the scale path (batch = md5 mod n_batches, no sort; documented in-code)",
    "a0072_chi2_cramers": "marginal window sums over the <=|a|x|b| contingency CELL frame (tens of rows), never fact rows",
    "a0073_mannwhitney_u": "r13: offsets now cumulate DRIVER-side from a bounded collect; in-data prefix windows are bucket-PARTITIONED (entry kept for the bounded-frame record)",
    "a0074_binseg_changepoint": "prefix sums over the daily revenue rollup (calendar-bounded)",
    "a0086_spearman_corr": "exclusive offset cumsum over the bounded value-bucket frame (in-data prefix is bucket-PARTITIONED, a0073 pattern)",
    "a0088_lorenz_gini": "exclusive offset cumsum over the bounded spend-bucket frame + cumulative share over the 10-row decile frame",
    "a0089_mrl_quantile_summary": "cumulative weights over the merged MRL summary (CONSTANT-bounded <= shards*k = 2048 rows; per-shard ranks are shard-PARTITIONED)",
    "a0092_burst_detection": "min-plus doubling scans (lag/lead) over the calendar-bounded daily spine — log2(T) rounds, never data rows",
    "a0131_curriculum_shards": "curriculum ntile over the score order — the oracle-parity twin of repartitionByRange(score) (sampled boundaries are not engine-reproducible)",
    "a0005_zipf_fit": "spectrum rank over the (token,count) VOCABULARY frame (corpus-vocabulary-bounded, never token rows)",
    "a0006_heaps_law": "cumulative tokens/vocab over the 10-row decile spine",
    "a0024_rrf_fusion": "rank over the two depth-50 retrieval lists already truncated by TakeOrdered limit (a0013 discipline)",
    "a0046_ewma_anomalies": "trailing 60-day weighted window over the daily revenue rollup (calendar-bounded)",
    "a0044_isotonic_calibration": "prefix sums over the 20-bin calibration frame, never document rows",
    "a0048_holt_linear_scan": "affine-map LAG-doubling rounds over the daily revenue spine (calendar-bounded, the a0092 discipline)",
}


def _window_specs(plan: str) -> list[str]:
    """Paren-balanced windowspecdefinition argument lists from a plan."""
    specs = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        depth, start = 1, m.end()
        i = start
        while i < len(plan) and depth:
            if plan[i] == "(":
                depth += 1
            elif plan[i] == ")":
                depth -= 1
            i += 1
        specs.append(plan[start : i - 1])
    return specs


def _is_unpartitioned(spec: str) -> bool:
    """A spec's args are: partition cols..., order cols (ASC/DESC), frame.
    No partition cols => the first top-level arg is already an order col
    (carries ASC/DESC) or the frame itself."""
    depth = 0
    for i, ch in enumerate(spec):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            first = spec[:i]
            return " ASC" in first or " DESC" in first or "specifiedwindowframe" in first
    return " ASC" in spec or " DESC" in spec or "specifiedwindowframe" in spec


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unpartitioned_window_over_data(name, spark, sf_dir):
    df = QUERIES[name].fn(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(jmode)
    unpart = [s for s in _window_specs(plan) if _is_unpartitioned(s)]
    if not unpart:
        return
    assert name in ALLOWED_UNPARTITIONED, (
        f"{name} plans {len(unpart)} unpartitioned window(s) and is not "
        f"allowlisted; first spec: {unpart[0][:200]}"
    )


def test_allowlist_has_no_stale_entries(spark, sf_dir):
    """Every allowlisted query must still exist and still plan an
    unpartitioned window — otherwise the entry is stale and the guard
    is weaker than it looks."""
    for name in ALLOWED_UNPARTITIONED:
        assert name in QUERIES, f"allowlist entry {name} no longer registered"
