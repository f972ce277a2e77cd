"""sf1.0 scale benchmark of the mining/stats waves (BENCH_SF1_MINING).

Promoted from a handmade file to a tool in round 12 (VERDICT r11 item
4): runs the pinned query list at /tmp/spark_graft_sf1.0 (10x sf0.1
replica, ~6M lineitem rows) — Spark cold + warm median-of-3 fresh-plan
re-runs in one session, DuckDB single run of the registered oracle SQL
under an alarm cap. argv names re-measure just those and merge into the
existing file (DuckDB cap-DNF entries carry forward unless re-named).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

SF_DIR = "/tmp/spark_graft_sf1.0"
DUCK_CAP_S = 120
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    # r10/r11 mining wave (carried from the handmade r11 file)
    "a0093_association_rules",
    "a0053_apriori_triples",
    "a0103_adamic_adar",
    "a0054_itemitem_cf",
    "a0062_distance_outliers",
    "a0101_heavy_change",
    "a0105_range_partition_plan",
    "a0051_zonemap_pruning",
    "a0066_logistic_newton",
    "a0060_em_gmm_step",
    "a0100_grid_density_clusters",
    # round-12 additions: the r11-wave heavies (VERDICT r11 item 4)
    "a0070_kmeans_lloyd",
    "a0078_kmv_theta_setops",
    "a0089_mrl_quantile_summary",
    "a0092_burst_detection",
    "a0086_spearman_corr",
    "a0083_mf_gradient_step",
    "a0076_fd_discovery",
    "a0085_tfidf_keywords",
    "a0073_mannwhitney_u",
    "a0001_semdedup_autok",
    # round-13 (VERDICT r12 item 4): a0002 gets an sf1.0 timing row
    "a0002_density_level_hierarchy",
    # round-13 wave heavies
    "a0003_semdedup_incremental",
    "a0004_knn_classify",
    "a0008_kcore_peeling",
    # round-13 wave-4 heavies (the graph/LOF/boosting members; the
    # bounded-output text stats get their scale evidence from the
    # 3-SF floor ladder)
    "a0012_label_propagation",
    "a0013_hits_scores",
    "a0014_lof_outliers",
    "a0017_adaboost_stumps",
    "a0019_ngram_self_overlap",
    "a0022_bfs_layers",
    # round-14 wave
    "a0023_semdedup_twolevel_codebook",
    # round-14 waves 2-4 data-growing members (bounded-frame members
    # — a0029/a0030/a0031/a0032/a0033/a0034/a0038/a0039/a0040/a0041/
    # a0044/a0046/a0047/a0048 — get their scale evidence from the 3-SF
    # floor ladder; see BENCH_SF1_MINING _notes)
    "a0024_rrf_fusion",
    "a0025_matryoshka_recall",
    "a0026_repeated_substring_spans",
    "a0027_modularity_communities",
    "a0028_closeness_centrality",
    "a0035_lsh_recall_audit",
    "a0036_ktruss_edges",
    "a0037_personalized_pagerank",
    "a0042_ks_two_sample",
    "a0043_boruvka_msf",
    "a0045_edit_distance_join",
    "a0049_wasserstein_drift",
]


class _Alarm(Exception):
    pass


def duck_time(sql: str) -> float | str:
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    def _raise(signum, frame):
        raise _Alarm

    signal.signal(signal.SIGALRM, _raise)
    signal.alarm(DUCK_CAP_S)
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        dt = round(time.time() - t0, 1)
    except _Alarm:
        dt = f">{DUCK_CAP_S} (did not finish)"
    except Exception as e:  # noqa: BLE001
        if time.time() - t0 >= DUCK_CAP_S - 5:
            dt = f">{DUCK_CAP_S} (did not finish)"
        else:
            dt = f"error: {type(e).__name__}"
    finally:
        signal.alarm(0)
        try:
            con.interrupt()
        except Exception:
            pass
        try:
            con.close()
        except Exception:
            pass
    return dt


def main() -> None:
    only = set(sys.argv[1:])
    prior = {}
    try:
        with open(os.path.join(ROOT, "BENCH_SF1_MINING.json")) as f:
            prior = json.load(f)
    except FileNotFoundError:
        pass
    out = prior or {}
    out["note"] = (
        "mining/stats-wave scale benchmark at sf1.0 (/tmp/spark_graft_sf1.0, "
        "10x sf0.1 replica, ~6M lineitem rows; tools/bench_sf1_mining.py). "
        "Spark: cold + warm MEDIAN-OF-3 fresh-plan re-runs in one session. "
        f"DuckDB: registered oracle SQL, single run, {DUCK_CAP_S}s alarm cap; "
        "recorded cap-DNFs carry forward unless the query is re-named on argv. "
        "a0092's DuckDB wall is the O(n^2) recursive-CTE oracle replay of a "
        "linear Viterbi — an oracle artifact, not a comparative number."
    )
    for k in ("spark_cold_sec", "spark_warm_sec", "duckdb_sec", "errors"):
        out.setdefault(k, {})
    spark = get_spark("bench_sf1_mining")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in [n for n in QUERIES if not only or n in only]:
        try:
            t0 = time.time()
            qs[name].fn(spark, SF_DIR).count()
            cold = round(time.time() - t0, 1)
            reps = []
            for _ in range(3):
                t0 = time.time()
                qs[name].fn(spark, SF_DIR).count()
                reps.append(round(time.time() - t0, 1))
            out["spark_cold_sec"][name] = cold
            out["spark_warm_sec"][name] = sorted(reps)[1]
            out["errors"].pop(name, None)
            print(f"{name}: cold {cold}s warm_med {sorted(reps)[1]}s reps {reps}", flush=True)
        except Exception as e:  # noqa: BLE001
            out["errors"][name] = f"{type(e).__name__}: {e}"[:300]
            print(f"{name}: ERROR {e}", flush=True)
    spark.stop()
    for name in [n for n in QUERIES if not only or n in only]:
        if name in out["errors"]:
            continue
        have = out["duckdb_sec"].get(name)
        if have is not None and name not in only:
            continue
        out["duckdb_sec"][name] = duck_time(qs[name].oracle)
        print(f"{name}: duckdb {out['duckdb_sec'][name]}", flush=True)
    out["n_errors"] = len(out["errors"])
    with open(os.path.join(ROOT, "BENCH_SF1_MINING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_SF1_MINING.json", flush=True)


if __name__ == "__main__":
    main()
