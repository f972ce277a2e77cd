"""Round-13 wave-4 invariants beyond the oracle hash gate.

The declared-queries sweep hash-matches a0012–a0020 against DuckDB;
these pin the STRUCTURAL claims the designs rest on — the properties a
future edit could break while a small-SF hash stays green.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries
from advanced_data_mining_and_big_data_analysis_spark.sources import load_table

QUERIES = all_queries()


def test_a0012_partition_covers_graph(spark, sf_dir):
    """Community sizes must partition the node set exactly: the
    size-weighted community count equals the number of distinct nodes
    in the capped co-occurrence graph (nobody is dropped or
    double-labeled by the 4 synchronous rounds)."""
    rows = QUERIES["a0012_label_propagation"].fn(spark, sf_dir).collect()
    assert rows and all(r["size_nodes"] >= 1 and r["n_communities"] >= 1 for r in rows)
    n_labeled = sum(r["size_nodes"] * r["n_communities"] for r in rows)

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("b")
    ).distinct()
    bs = ev.groupBy("event_type", "b").agg(
        F.countDistinct("user_id").alias("n")
    )
    kept = bs.filter((F.col("n") <= 20) & (F.col("n") >= 2))
    n_nodes = (
        ev.join(kept.select("event_type", "b"), ["event_type", "b"])
        .select("user_id")
        .distinct()
        .count()
    )
    assert n_labeled == n_nodes


def test_a0013_integer_path_counts(spark, sf_dir):
    """The un-normalized HITS iteration claims exact integer path
    counts: ranks contiguous, counts positive and non-increasing, and
    the rank-1 score is exactly 1.0 (max-normalized)."""
    rows = QUERIES["a0013_hits_scores"].fn(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0]["auth_score"] == 1.0
    for a, b in zip(rows, rows[1:]):
        assert a["auth_paths"] >= b["auth_paths"] > 0
    # replay iteration 1 exactly: auth_1(p) = distinct customer degree
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("c")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    )
    e = o.join(li, "ok").select("c", "p").distinct()
    deg = dict(
        e.groupBy("p").agg(F.count("*").alias("d")).collect()
    )
    assert all(r["partkey"] in deg for r in rows)


def test_a0014_lof_scores_positive_and_ranked(spark, sf_dir):
    rows = QUERIES["a0014_lof_outliers"].fn(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 20
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert (a["lof"], -a["custkey"]) >= (b["lof"], -b["custkey"])
    for r in rows:
        assert r["lof"] > 0
        assert 1 <= r["n_neighbors"] <= 5
    # top outliers in a mixed-density plane should exceed the LOF ~1
    # inlier band
    assert rows[0]["lof"] > 1.0


def test_a0015_jsd_symmetric_bounded(spark, sf_dir):
    rows = QUERIES["a0015_js_divergence"].fn(spark, sf_dir).collect()
    srcs = {r["src_a"] for r in rows} | {r["src_b"] for r in rows}
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        assert r["src_a"] < r["src_b"]  # canonical pair orientation
        assert 0.0 <= r["jsd_bits"] <= 1.0  # JSD in bits is bounded
        assert r["n_union_terms"] > 0


def test_a0016_formulas_consistent(spark, sf_dir):
    """The published ratios and the Flesch/FK outputs must agree —
    catches a drive-by edit to one formula but not the other."""
    rows = QUERIES["a0016_readability"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        wps, spw = r["words_per_sentence"], r["syllables_per_word"]
        assert spw >= 1.0  # every word has at least one syllable
        assert wps >= 1.0
        assert abs(r["flesch_ease"] - (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-3
        assert abs(r["fk_grade"] - (0.39 * wps + 11.8 * spw - 15.59)) < 1e-3


def test_a0017_boosting_invariants(spark, sf_dir):
    """Both stumps must beat random (err < 0.5 => alpha > 0), and the
    weighted error and alpha must satisfy the AdaBoost identity."""
    rows = QUERIES["a0017_adaboost_stumps"].fn(spark, sf_dir).collect()
    assert [r["round"] for r in rows] == [1, 2]
    for r in rows:
        assert 0.0 < r["weighted_err"] < 0.5
        assert r["alpha"] > 0
        ident = 0.5 * math.log((1 - r["weighted_err"]) / r["weighted_err"])
        assert abs(r["alpha"] - ident) < 1e-4
        assert 0.0 <= r["ensemble_train_acc"] <= 1.0
    assert rows[0]["ensemble_train_acc"] == rows[1]["ensemble_train_acc"]


def test_a0018_buckets_cover_all_vectors(spark, sf_dir):
    rows = QUERIES["a0018_jl_projection_audit"].fn(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n_total  # no zero-norm drops here
    for r in rows:
        lo, hi = r["bucket"] / 10.0, r["bucket"] / 10.0 + 0.1
        assert lo - 1e-9 <= r["avg_ratio"] <= hi + 1e-9
    # JL concentration: the bulk of mass must sit in ratio [0.5, 1.5)
    bulk = sum(r["n_vecs"] for r in rows if 5 <= r["bucket"] <= 14)
    assert bulk >= 0.9 * n_total


def test_a0019_overlap_bounded(spark, sf_dir):
    rows = QUERIES["a0019_ngram_self_overlap"].fn(spark, sf_dir).collect()
    assert rows
    n_docs_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) <= n_docs_total
    for r in rows:
        assert 0.0 <= r["avg_overlap"] <= 1.0
        assert r["n_doc_grams"] >= r["n_docs"]  # >=1 gram per counted doc


def test_a0020_f2_estimate_quality(spark, sf_dir):
    """F2 lower bound (sum c^2 >= sum c = token count) and the
    median-of-5 CountSketch estimator within its theoretical band
    (eps ~ sqrt(2/64) per estimator; 50% is a generous median bound)."""
    row = QUERIES["a0020_ams_f2_sketch"].fn(spark, sf_dir).collect()[0]
    assert row["f2_est"] > 0 and row["f2_exact"] > 0
    assert row["rel_err_pct"] >= 0.0
    assert row["rel_err_pct"] < 50.0
    assert row["n_estimators"] == 5 and row["n_buckets"] == 64


def test_a0021_jpeg_arith_media_partition(spark, sf_dir):
    rows = QUERIES["a0021_jpeg_arith_decode"].fn(spark, sf_dir).collect()
    assert len(rows) == 16
    kinds = {r["kind"] for r in rows}
    assert kinds == {"jpeg_arith", "jpeg_arith_color"}
    for r in rows:
        assert r["n_units"] == 256
        if r["kind"] == "jpeg_arith":
            assert 0.0 <= r["f1"] <= 255.0 and r["f3"] == 0.0 and r["f4"] == 0.0


def test_a0022_layers_partition_node_set(spark, sf_dir):
    """BFS layers plus the -1 bucket must partition the node set, layer
    0 holds exactly the seed, and layer sizes are positive."""
    rows = QUERIES["a0022_bfs_layers"].fn(spark, sf_dir).collect()
    by_layer = {r["layer"]: r["n_nodes"] for r in rows}
    assert by_layer.get(0) == 1  # the seed
    assert all(n >= 1 for n in by_layer.values())
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("b")
    ).distinct()
    bs = ev.groupBy("event_type", "b").agg(F.countDistinct("user_id").alias("n"))
    kept = bs.filter((F.col("n") <= 20) & (F.col("n") >= 2))
    n_nodes = (
        ev.join(kept.select("event_type", "b"), ["event_type", "b"])
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(by_layer.values()) == n_nodes
