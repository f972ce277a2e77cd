"""Round-13 invariants beyond the oracle hash gate.

The declared-queries sweep hash-matches a0003–a0009 against DuckDB;
these pin the STRUCTURAL claims the designs rest on — the properties a
future edit could break while a small-SF hash stays green.
"""

from __future__ import annotations

from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries
from advanced_data_mining_and_big_data_analysis_spark.sources import load_table

QUERIES = all_queries()


def test_a0003_only_new_vectors_removed(spark, sf_dir):
    """Incremental dedup may only remove GROWTH-batch vectors (old keeps
    are stable), every kept id must out-prioritize its removed id
    ((is_new, vec_id) lexicographic), and the planted copies must be
    caught with their base (old or new) counterpart kept."""
    rows = QUERIES["a0003_semdedup_incremental"].fn(spark, sf_dir).collect()
    assert rows, "planted near-dups must produce removals"

    def is_new(vid: int) -> bool:
        return vid >= 100000 or vid % 5 == 3

    for r in rows:
        assert is_new(r["removed_id"]), "an old-corpus vector was removed"
        assert r["kept_is_old"] == (0 if is_new(r["kept_id"]) else 1)
        # priority: old (0) beats new (1); ties by vec_id
        ka = (1 if is_new(r["kept_id"]) else 0, r["kept_id"])
        ra = (1, r["removed_id"])
        assert ka < ra, (r["kept_id"], r["removed_id"])
    planted = [r for r in rows if r["removed_id"] >= 100000]
    assert planted, "at least one planted copy must be deduped"


def test_a0004_confusion_matrix_partitions_test_split(spark, sf_dir):
    """Confusion counts must sum to the number of test customers with
    orders, and every predicted label is a real segment or '(none)'."""
    from pyspark.sql import functions as F

    rows = QUERIES["a0004_knn_classify"].fn(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    n_test = (
        orders.select(F.col("o_custkey").alias("id"))
        .distinct()
        .filter(F.col("id") % 4 == 0)
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_test
    segs = {
        r["c_mktsegment"]
        for r in load_table(spark, sf_dir, "customer")
        .select("c_mktsegment")
        .distinct()
        .collect()
    }
    for r in rows:
        assert r["true_seg"] in segs
        assert r["pred_seg"] in segs | {"(none)"}


def test_a0005_zipf_slope_negative_and_bounded(spark, sf_dir):
    row = QUERIES["a0005_zipf_fit"].fn(spark, sf_dir).collect()[0]
    assert row["zipf_slope"] < 0, "frequency must decay with rank"
    assert 0.0 <= row["r2"] <= 1.0
    assert row["n_fit"] <= 1000 and row["n_fit"] <= row["vocab_size"]


def test_a0006_heaps_prefixes_monotone(spark, sf_dir):
    rows = QUERIES["a0006_heaps_law"].fn(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(10))
    for a, b in zip(rows, rows[1:]):
        assert b["tokens_prefix"] >= a["tokens_prefix"]
        assert b["vocab_prefix"] >= a["vocab_prefix"]
    for r in rows:
        assert r["vocab_prefix"] <= r["tokens_prefix"]
        assert r["heaps_beta"] == rows[0]["heaps_beta"]  # one fit, all rows


def test_a0007_delta_pairs_complete_and_nonnegative(spark, sf_dir):
    rows = QUERIES["a0007_stylometry_delta"].fn(spark, sf_dir).collect()
    langs = {
        r["lang"]
        for r in load_table(spark, sf_dir, "documents").select("lang").distinct().collect()
    }
    n = len(langs)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert r["lang_a"] < r["lang_b"]
        assert r["delta"] >= 0.0


def test_a0008_core_satisfies_degree_bound(spark, sf_dir):
    """Every k-core node has degree >= k, so 2*edges >= k*nodes; the
    query itself asserts the fixpoint (converged column is load-bearing)."""
    row = QUERIES["a0008_kcore_peeling"].fn(spark, sf_dir).collect()[0]
    assert row["converged"] == 1
    assert 2 * row["n_core_edges"] >= row["k"] * row["n_core_nodes"]
    if row["n_core_nodes"]:
        assert row["max_core_degree"] >= row["k"]


def test_a0009_pmi_rows_respect_min_count(spark, sf_dir):
    import math

    rows = QUERIES["a0009_pmi_collocations"].fn(spark, sf_dir).collect()
    assert rows and len(rows) <= 20
    for r in rows:
        assert r["pair_count"] >= 5
        assert math.isfinite(r["pmi"])
    # ranked by (pmi desc, w1, w2)
    keys = [(-r["pmi"], r["w1"], r["w2"]) for r in rows]
    assert keys == sorted(keys)


def test_a0010_hill_alpha_positive(spark, sf_dir):
    row = QUERIES["a0010_hill_tail_index"].fn(spark, sf_dir).collect()[0]
    assert row["tail_points"] <= 100
    assert row["hill_alpha"] > 0
    assert abs(row["pareto_exponent"] - (1.0 + row["hill_alpha"])) < 2e-6
    assert row["x_min"] > 0


def test_a0011_novelty_decays_from_one(spark, sf_dir):
    """Decile 0 contains doc 0, whose grams are all first occurrences of
    themselves or earlier docs in the SAME decile, so novelty is highest
    at the start; every decile's novel count is bounded by its gram
    count; totals are consistent."""
    rows = QUERIES["a0011_ngram_novelty_decay"].fn(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(10))
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["n_novel"] <= r["n_grams"]
    assert rows[0]["novelty"] == max(r["novelty"] for r in rows)
