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


# ---------------------------------------------------------------- wave 2


def test_a0025_full_width_recall_is_one(spark, sf_dir):
    """The p=64 'truncation' IS the ground truth, so its recall must be
    exactly 1.0 — and narrower prefixes can only be audited, never
    exceed it."""
    rows = {r["prefix_dims"]: r for r in QUERIES["a0025_matryoshka_recall"].fn(spark, sf_dir).collect()}
    assert rows[64]["avg_recall10"] == 1.0
    assert all(0.0 <= r["avg_recall10"] <= 1.0 for r in rows.values())


def test_a0026_span_merge_invariants(spark, sf_dir):
    """Spans cover at least one shingle length each, and the duplicated
    fraction is a true fraction of the per-source character mass."""
    from advanced_data_mining_and_big_data_analysis_spark.plans.round14b import _SPAN_L

    rows = QUERIES["a0026_repeated_substring_spans"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_docs_flagged"] <= r["n_docs"]
        assert 0.0 <= r["dup_char_frac"] <= 1.0
        if r["n_spans"]:
            assert r["dup_chars"] >= r["n_spans"] * _SPAN_L


def test_a0028_multisource_bfs_matches_single_source(spark, sf_dir):
    """The (seed,node)-keyed multi-source BFS must agree with an
    independent per-seed BFS run over the collected edge list (numpy-
    free python replica) — distances, reach and the exact-rational
    harmonic sum."""
    from advanced_data_mining_and_big_data_analysis_spark.plans.round14b import (
        _CC_LCM,
        _CC_ROUNDS,
        _CC_SEEDS,
        a0028_closeness_centrality,
    )
    from advanced_data_mining_and_big_data_analysis_spark.plans.round13b import (
        a0022_bfs_layers,  # noqa: F401  (same graph family; import proves co-location)
    )

    got = {r["seed"]: r for r in a0028_closeness_centrality(spark, sf_dir).collect()}

    # rebuild the same capped graph via the a0022 construction
    from advanced_data_mining_and_big_data_analysis_spark.sources import load_table as lt

    ev = lt(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("b")
    )
    grp = ev.groupBy("event_type", "b").agg(F.collect_set("user_id").alias("us")).collect()
    adj: dict[int, set[int]] = {}
    for row in grp:
        us = sorted(row["us"])
        if len(us) < 2 or len(us) > 20:
            continue
        for i, u in enumerate(us):
            for v in us[i + 1 :]:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
    seeds = sorted(adj)[:_CC_SEEDS]
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, _CC_ROUNDS + 1):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        reached = [d for d in dist.values() if d > 0]
        assert got[s]["n_reached"] == len(reached)
        assert got[s]["sum_dist"] == sum(reached)
        h60 = sum(_CC_LCM // d for d in reached)
        assert abs(got[s]["harmonic_closeness"] - round(h60 / _CC_LCM, 6)) < 1e-9


def test_a0029_textrank_mass_and_float_agreement(spark, sf_dir):
    """The fixed-point iteration must track a float-space reference
    PageRank on the same collected graph to ~1e-5 of score (floor
    error is < 1 scale unit per state per round), and scores stay
    inside the damping bounds (>= 0.15)."""
    from advanced_data_mining_and_big_data_analysis_spark.plans.round14b import (
        _TR_ITERS,
        _TR_MIN,
        _TR_SCALE,
        a0029_textrank_keywords,
    )
    from advanced_data_mining_and_big_data_analysis_spark.operators import text as X
    from advanced_data_mining_and_big_data_analysis_spark.sources import load_table as lt

    got = a0029_textrank_keywords(spark, sf_dir).collect()
    assert got and all(r["textrank"] >= 0.15 for r in got)

    base = lt(spark, sf_dir, "documents").select(X.tokens("text").alias("toks")).collect()
    from collections import Counter

    cnt: Counter = Counter()
    for r in base:
        cnt.update(r["toks"])
    vocab = {w for w, c in cnt.items() if c >= _TR_MIN}
    ec: Counter = Counter()
    for r in base:
        t = r["toks"]
        for a, b in zip(t, t[1:]):
            if a != b and a in vocab and b in vocab:
                ec[(min(a, b), max(a, b))] += 1
    adj: dict[str, dict[str, int]] = {}
    for (a, b), wgt in ec.items():
        adj.setdefault(a, {})[b] = wgt
        adj.setdefault(b, {})[a] = wgt
    wu = {u: sum(vs.values()) for u, vs in adj.items()}
    s = {u: 1.0 for u in adj}
    for _ in range(_TR_ITERS):
        s = {
            v: 0.15 + 0.85 * sum(s[u] * w / wu[u] for u, w in adj[v].items())
            for v in adj
        }
    for r in got:
        assert abs(r["textrank"] - s[r["token"]]) < 1e-4, r["token"]
    # sanity on the fixed-point resolution claim
    assert _TR_SCALE >= 10**6


def test_a0031_conformal_coverage_near_nominal(spark, sf_dir):
    """Split-conformal guarantees coverage >= 1 - alpha in expectation;
    on the synthetic data the empirical test coverage must sit in a
    loose band around 0.9 and q_hat must be a positive residual."""
    rows = QUERIES["a0031_conformal_intervals"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["q_hat"] > 0
        assert 0.8 <= r["coverage"] <= 1.0


def test_a0032_attribution_shares_sum_to_one(spark, sf_dir):
    """Removal effects are ratios of integer differences; shares
    normalize them, so they must sum to 1 within rounding and the
    journey rule must credit only the four non-purchase channels."""
    rows = QUERIES["a0032_markov_attribution"].fn(spark, sf_dir).collect()
    assert sorted(r["channel"] for r in rows) == ["click", "error", "signup", "view"]
    assert abs(sum(r["attribution_share"] for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert 0.0 <= r["removal_effect"] <= 1.0


def test_a0035_audit_counts_consistent(spark, sf_dir):
    """Hits are a subset of truth per bin, and the high-similarity
    decile (the dedup operating regime) must show recall tracking the
    near-1 theoretical collision probability."""
    rows = QUERIES["a0035_lsh_recall_audit"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hit"] <= r["n_truth"]
    hi = [r for r in rows if r["jaccard_lo"] >= 0.9]
    assert hi and all(r["recall"] >= 0.9 for r in hi)
