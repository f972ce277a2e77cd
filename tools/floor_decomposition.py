"""Floor decomposition for the vs-DuckDB 'weak' queries (VERDICT r3 item 5).

For each query flagged >2x DuckDB, measure warm wall time (median of 3
fresh-plan runs) at sf0.001, sf0.01, and sf0.1 — 100x data across the
ladder. A data-proportional query scales ~linearly; a floor-bound query
is flat. Report per query:

    floor_sec          wall time at sf0.001 (data cost ~0 there)
    slope_sec_per_sf   (t(0.1) - t(0.01)) / 0.09 — marginal cost of data
    data_fraction_01   share of the sf0.1 wall that is data-proportional:
                       (t(0.1) - floor) / t(0.1)

A query with data_fraction under ~0.5 spends most of its wall on Spark's
fixed stage/scheduling overhead — the part that amortizes to nothing at
100 TB while DuckDB's advantage on 5k-row inputs does not.

Round 9 adds the denominator that makes the floor story checkable in one
number: ``duckdb_01`` (same-run DuckDB warm median on the same sf0.1
parquet) and

    data_ratio_01 = (t(0.1) - floor) / duckdb_01

the MARGINAL cost of data in Spark vs DuckDB's total. That is the ratio
that survives scale-up: the floor is per-query session overhead
(amortized at 100 TB), while the marginal cost is what multiplies.

Writes BENCH_FLOOR.json at the repo root; run after bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

WEAK = [
    "q45_quality_scores",
    "a083_neardup_skew_capped",
    "a092_repetition_signals",
    "a094_chunk_stats",
    "a095_unigram_logprob",
    "q105_decontaminate",
    "q102_pagerank_transitions",
    # high-ratio tiny-absolute queries, included for the record
    "a086_periodogram",
    "q109_sequence_packing",
    "q26_fourier_harmonics",
    # round-5 headline additions (VERDICT r5 item 3: every headline
    # query gets the same floor/slope evidence)
    "q113_multimodal_decode",
    "q114_semdedup",
    "q115_decontaminate_bloom",
    "q116_duplicated_passages",
    "q117_mergeable_sketches",
    "q118_batch_ann_join",
    # round-6 headline additions (same convention)
    "q119_cms_heavy_hitters",
    "q120_product_quantization",
    "q121_bpe_pair_counts",
    "q122_classifier_scoring",
    "q123_zorder_layout",
    "q124_jpeg_decode",
    "q128_triangle_count",
    "q130_prefix_filter_simjoin",
    # round-9: the current >2x data-proportional list (BENCH_DETAIL)
    "q40_exact_dedup_stats",
    # round-9: every remaining headline entry >2x same-run DuckDB at
    # sf0.1 — the floor/data_ratio evidence now covers the full >2x
    # tail, so "ratio > 2" can be read against "data_ratio <= 2" per
    # query instead of guessed at.
    "q01_pricing_summary",
    "q03_discount_revenue",
    "q05_regional_revenue",
    "q09_order_count_histogram",
    "q10_topk_per_group",
    "q18_small_quantity_revenue",
    "q21_hourly_events",
    "q50_cosine_topk",
    "a060_sessionization",
    "a087_mi_feature_filter",
    "a098_asof_join",
    "q47_char_ngram_vocab",
    "q108_incremental_dedup",
    "q41_minhash_neardup",
    # round-10: the new headline member gets the same evidence
    "a0142_flagship_pipeline",
    # round-11 (VERDICT r10 item 4): the r10d/r10e mining waves get the
    # same floor/slope/data_ratio evidence — every registry family now
    # has either a headline row or a floor row.
    "a0050_acf_ljung_box",
    "a0051_zonemap_pruning",
    "a0052_haar_energy",
    "a0053_apriori_triples",
    "a0054_itemitem_cf",
    "a0055_theil_sen",
    "a0056_mdlp_split",
    "a0057_rfm_segments",
    "a0058_cart_split",
    "a0059_bh_fdr",
    "a0060_em_gmm_step",
    "a0061_pca_power",
    "a0062_distance_outliers",
    "a0063_naive_bayes_langid",
    "a0064_markov_stationary",
    "a0065_sequence_patterns",
    "a0066_logistic_newton",
    "a0067_roc_auc",
    "a0068_lift_gains",
    "a0069_skipgram_pairs",
    "a0093_association_rules",
    "a0094_weighted_reservoir",
    "a0095_psi_drift",
    "a0096_rolling_ols",
    "a0097_stl_decompose",
    "a0098_rowgroup_audit",
    "a0099_rendezvous_sharding",
    "a0100_grid_density_clusters",
    "a0101_heavy_change",
    "a0102_funnel_conversion",
    "a0103_adamic_adar",
    "a0104_sax_motifs",
    "a0105_range_partition_plan",
    # round-12 (VERDICT r11 item 4): the round-11 mining/stats wave gets
    # the same 3-SF ladder + data_ratio_01 evidence, plus the new
    # SemDeDup scale twin. a0092's duckdb_01 is the O(n^2) recursive-CTE
    # oracle replay, not a comparative number — see _notes.
    "a0070_kmeans_lloyd",
    "a0071_centroid_silhouette",
    "a0072_chi2_cramers",
    "a0073_mannwhitney_u",
    "a0074_binseg_changepoint",
    "a0075_benford_audit",
    "a0076_fd_discovery",
    "a0077_clustering_coeff",
    "a0078_kmv_theta_setops",
    "a0079_rake_keywords",
    "a0080_winnow_fingerprints",
    "a0081_grubbs_outliers",
    "a0082_bloom_semijoin",
    "a0083_mf_gradient_step",
    "a0084_uplift_segments",
    "a0085_tfidf_keywords",
    "a0086_spearman_corr",
    "a0087_kendall_tau_daily",
    "a0088_lorenz_gini",
    "a0089_mrl_quantile_summary",
    "a0090_jpeg_lossless_decode",
    "a0091_jpeg_lossless12_decode",
    "a0092_burst_detection",
    "a0001_semdedup_autok",
    # round-13: the density-level stretch gets the standard ladder too
    "a0002_density_level_hierarchy",
    # round-13 wave — every new query ships with the 3-SF ladder
    "a0003_semdedup_incremental",
    "a0004_knn_classify",
    "a0005_zipf_fit",
    "a0006_heaps_law",
    "a0007_stylometry_delta",
    "a0008_kcore_peeling",
    "a0009_pmi_collocations",
    "a0010_hill_tail_index",
    "a0011_ngram_novelty_decay",
    # round-13 wave 4 — same convention
    "a0012_label_propagation",
    "a0013_hits_scores",
    "a0014_lof_outliers",
    "a0015_js_divergence",
    "a0016_readability",
    "a0017_adaboost_stumps",
    "a0018_jl_projection_audit",
    "a0019_ngram_self_overlap",
    "a0020_ams_f2_sketch",
    "a0021_jpeg_arith_decode",
    "a0022_bfs_layers",
    # round-14 wave
    "a0023_semdedup_twolevel_codebook",
    # round-14 waves 2-4: every new query gets the 3-SF ladder (the
    # standing convention — bounded-frame members show data_fraction ~0,
    # data-growing members show the marginal-vs-DuckDB ratio)
    "a0024_rrf_fusion",
    "a0025_matryoshka_recall",
    "a0026_repeated_substring_spans",
    "a0027_modularity_communities",
    "a0028_closeness_centrality",
    "a0029_textrank_keywords",
    "a0030_mann_kendall_trend",
    "a0031_conformal_intervals",
    "a0032_markov_attribution",
    "a0033_mattr_lexical",
    "a0034_term_dispersion_dp",
    "a0035_lsh_recall_audit",
    "a0036_ktruss_edges",
    "a0037_personalized_pagerank",
    "a0038_brier_decomposition",
    "a0039_mmr_rerank",
    "a0040_shapley_attribution",
    "a0041_good_turing",
    "a0042_ks_two_sample",
    "a0043_boruvka_msf",
    "a0044_isotonic_calibration",
    "a0045_edit_distance_join",
    "a0046_ewma_anomalies",
    "a0047_ndcg_eval",
    "a0048_holt_linear_scan",
    "a0049_wasserstein_drift",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def warm_median(qd, spark, sf_dir: str, reps: int = 3) -> float:
    qd.fn(spark, sf_dir).collect()
    times = []
    for _ in range(reps):
        t0 = time.time()
        qd.fn(spark, sf_dir).collect()
        times.append(time.time() - t0)
    return sorted(times)[reps // 2]


def duck_median(oracle: str, sf_dir: str, reps: int = 3) -> float | None:
    """Same-run DuckDB warm median for the query's own oracle SQL."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    con.execute(oracle).fetchall()
    times = []
    for _ in range(reps):
        t0 = time.time()
        con.execute(oracle).fetchall()
        times.append(time.time() - t0)
    con.close()
    return sorted(times)[reps // 2]


def main() -> None:
    # optional argv names: re-measure just those entries and merge into
    # the existing BENCH_FLOOR.json (after reshaping one query, the
    # whole 40-entry ladder need not re-run)
    only = set(sys.argv[1:])
    spark = get_spark("floor")
    qs = all_queries()
    out = {}
    if only:
        import json as _json

        try:
            with open(os.path.join(ROOT, "BENCH_FLOOR.json")) as f:
                out = _json.load(f)
        except FileNotFoundError:
            pass
    for name in [n for n in WEAK if not only or n in only]:
        if name not in qs:
            continue
        t = {sf.rsplit("sf", 1)[-1]: round(warm_median(qs[name], spark, sf), 3) for sf in SFS}
        floor = t["0.001"]
        slope = (t["0.1"] - t["0.01"]) / 0.09
        data_fraction = max(0.0, (t["0.1"] - floor) / t["0.1"]) if t["0.1"] > 0 else 0.0
        out[name] = {
            "warm_by_sf": t,
            "floor_sec": floor,
            "slope_sec_per_sf": round(slope, 3),
            "data_fraction_01": round(data_fraction, 3),
        }
        if qs[name].oracle:
            duck = duck_median(qs[name].oracle, SFS[-1])
            out[name]["duckdb_01"] = round(duck, 3)
            out[name]["data_ratio_01"] = (
                round(max(0.0, t["0.1"] - floor) / duck, 2) if duck > 0 else None
            )
        print(name, out[name], flush=True)
    with open(os.path.join(ROOT, "BENCH_FLOOR.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_FLOOR.json")


if __name__ == "__main__":
    main()
