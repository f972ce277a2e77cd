"""Semantic invariants of the round-10d/e operators that the DuckDB
value-hash oracles do NOT already imply — each one is a mathematical
property of the operator itself, so a same-bug-both-sides oracle match
can't fake it."""

from __future__ import annotations

import math

from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

QS = all_queries()


def test_haar_parseval(spark, sf_dir):
    """Σ energy shares (8 detail levels + approximation) must equal 1:
    the Haar basis is orthonormal, so Parseval fixes the total — a sign
    error, a wrong normalization, or a dropped block breaks this even
    if both engines agree."""
    rows = QS["a0052_haar_energy"].fn(spark, sf_dir).collect()
    assert math.isclose(sum(r["share"] for r in rows), 1.0, abs_tol=5e-6)
    # detail coefficient counts: level ell has N / 2^ell complete blocks
    by_part = {r["part"]: r for r in rows}
    n = 2 * by_part["level_1"]["n_coeffs"]
    for lvl in range(1, 9):
        assert by_part[f"level_{lvl}"]["n_coeffs"] == n // 2**lvl


def test_hrw_minimal_movement(spark, sf_dir):
    """Rendezvous hashing's defining guarantee: adding a shard moves
    docs ONLY to the new shard (n_moved_other ≡ 0), and total movement
    is ≈ 1/(S+1) of the corpus (binomial tolerance)."""
    rows = QS["a0099_rendezvous_sharding"].fn(spark, sf_dir).collect()
    assert all(r["n_moved_other"] == 0 for r in rows)
    n_docs = sum(r["n_docs"] for r in rows)
    n_moved = sum(r["n_moved_to_new"] for r in rows)
    p = n_moved / n_docs
    # expect 1/9; 5-sigma binomial band around it
    sigma = math.sqrt((1 / 9) * (8 / 9) / n_docs)
    assert abs(p - 1 / 9) < 5 * sigma, (p, n_docs)


def test_grid_density_mass_preserved(spark, sf_dir, duck):
    """Every embedding lands in exactly one cluster or the noise row:
    Σ n_points over the output equals COUNT(*) of the table, and each
    cluster's peak density is at least the minpts threshold."""
    rows = QS["a0100_grid_density_clusters"].fn(spark, sf_dir).collect()
    total = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    assert sum(r["n_points"] for r in rows) == total
    for r in rows:
        if r["cluster_cell"] != -1:
            assert r["peak_density"] >= 3
            assert r["n_points"] >= r["n_cells"] * 3


def test_apriori_downward_closure(spark, sf_dir, duck):
    """Every reported frequent triple's three sub-pairs must individually
    clear the same support threshold (the monotonicity that makes the
    L2 prune result-invariant — asserted against DuckDB pair supports)."""
    rows = QS["a0053_apriori_triples"].fn(spark, sf_dir).collect()
    if not rows:
        return
    pairs = dict(
        ((b1, b2), n)
        for b1, b2, n in duck.execute(
            """
            WITH baskets AS (
              SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            )
            SELECT a.brand, b.brand, COUNT(*)
            FROM baskets a JOIN baskets b ON a.okey = b.okey AND a.brand < b.brand
            GROUP BY 1, 2
            """
        ).fetchall()
    )
    n_orders = duck.execute(
        """
        SELECT COUNT(DISTINCT l_orderkey) FROM (
          SELECT l.l_orderkey FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        """
    ).fetchone()[0]
    thr = n_orders * 0.003
    for r in rows:
        for x, y in ((r["b1"], r["b2"]), (r["b1"], r["b3"]), (r["b2"], r["b3"])):
            assert pairs[(x, y)] >= r["n_triple"], (x, y)
            assert pairs[(x, y)] >= thr


def test_zonemap_partition_plan_consistency(spark, sf_dir):
    """a0105's planned partitions must tile the data exactly: planned
    rows sum to COUNT(*), boundaries are monotone, and the final upper
    bucket is the last one."""
    rows = QS["a0105_range_partition_plan"].fn(spark, sf_dir).collect()
    assert [r["part_id"] for r in rows] == list(range(1, 17))
    ubs = [r["ub_bucket"] for r in rows]
    assert ubs == sorted(ubs)
    n = sum(r["planned_rows"] for r in rows)
    li = QS["a0105_range_partition_plan"]  # count via spark to avoid extra fixture
    from advanced_data_mining_and_big_data_analysis_spark.sources import load_table

    assert n == load_table(spark, sf_dir, "lineitem").count()
    # skew ratios average to ~1 by construction
    avg_skew = sum(r["skew_vs_ideal"] for r in rows) / len(rows)
    assert abs(avg_skew - 1.0) < 0.01


def test_pca_eigen_residual(spark, sf_dir):
    """The power-iteration output must satisfy the eigen equation: the
    loadings are unit-norm and Cv ≈ λv (residual small relative to λ) —
    checked against a numpy covariance of the same four coordinates."""
    import numpy as np

    rows = QS["a0061_pca_power"].fn(spark, sf_dir).collect()
    v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    lam = rows[0]["eigenvalue"]
    assert abs(float(np.dot(v, v)) - 1.0) < 1e-4
    from advanced_data_mining_and_big_data_analysis_spark.sources import load_table

    emb = np.array(
        load_table(spark, sf_dir, "embeddings")
        .select("embedding")
        .toPandas()["embedding"]
        .map(lambda a: list(a[:4]))
        .tolist()
    )
    C = np.cov(emb.T, bias=True)
    resid = np.linalg.norm(C @ v - lam * v)
    assert resid < 1e-3 * max(lam, 1e-9), (resid, lam)


def test_markov_stationary_sums_to_one(spark, sf_dir):
    rows = QS["a0064_markov_stationary"].fn(spark, sf_dir).collect()
    assert abs(sum(r["stationary_prob"] for r in rows) - 1.0) < 1e-4
    assert all(r["stationary_prob"] > 0 for r in rows)


def test_nb_confusion_mass(spark, sf_dir, duck):
    """Confusion-matrix mass equals the md5 test split size — no doc is
    dropped or double-counted through the explode/score/argmax chain."""
    rows = QS["a0063_naive_bayes_langid"].fn(spark, sf_dir).collect()
    n_test = duck.execute(
        "SELECT COUNT(*) FROM documents WHERE substr(md5(CAST(doc_id AS VARCHAR)),1,1) >= '8'"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_test


def test_em_mixture_valid(spark, sf_dir):
    rows = QS["a0060_em_gmm_step"].fn(spark, sf_dir).collect()
    pis = {r["component"]: r["pi"] for r in rows}
    assert abs(pis[1] + pis[2] - 1.0) < 1e-6
    for r in rows:
        assert 0 < r["pi"] < 1
        assert r["sigma2"] > 0
