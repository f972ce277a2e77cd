"""Round-14 invariants beyond the oracle hash gate.

The declared-queries sweep hash-matches a0023 against DuckDB; these pin
the STRUCTURAL claims of the two-level codebook build — the properties
a future edit could break while a small-SF hash stays green.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries
from advanced_data_mining_and_big_data_analysis_spark.plans.round14 import _CB2_T2
from advanced_data_mining_and_big_data_analysis_spark.sources import load_table

QUERIES = all_queries()


def test_a0023_two_level_codebook_partitions_corpus(spark, sf_dir):
    """The fine cells PARTITION the corpus (every vector lands in
    exactly one (l1, l2) cell); every L1 seed owns its own cell (a
    stride seed is at distance 0 from itself); every L2 seed id is an
    actual member of its L1 cell (the refine level samples members, it
    never invents centroids); distances are non-negative."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    rows = QUERIES["a0023_semdedup_twolevel_codebook"].fn(spark, sf_dir).collect()
    assert rows
    assert sum(r["n_members"] for r in rows) == n  # partition, no loss
    assert all(r["avg_d2"] >= 0.0 for r in rows)

    # the L1 seed set is the declared stride rule — and every seed must
    # own a cell (it is its own nearest seed at d2 = 0)
    k1 = math.ceil(math.sqrt(n / float(_CB2_T2)))
    step1 = -(-n // k1)
    expected_l1 = {
        r["vec_id"]
        for r in emb.select("vec_id").filter(F.col("vec_id") % step1 == 0).collect()
    }
    got_l1 = {r["l1_seed"] for r in rows}
    assert got_l1 == expected_l1

    # an L2 seed belongs to the L1 cell it refines: a seed assigns to
    # itself (d2 = 0), so each (l1, l2=seed) cell must contain it —
    # i.e. every distinct l2 appears under exactly one l1
    l2_to_l1: dict[int, int] = {}
    for r in rows:
        assert l2_to_l1.setdefault(r["l2_seed"], r["l1_seed"]) == r["l1_seed"]

    # driver-traffic claim: the ONLY collect is the L1 seed set,
    # O(sqrt(N/T2)) — at this SF that is a handful of rows
    assert len(expected_l1) <= k1 + 1
