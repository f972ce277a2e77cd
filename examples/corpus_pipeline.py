"""End-to-end LLM training-corpus pipeline: the north-star operators
composed the way a data-curation run actually chains them.

    python examples/corpus_pipeline.py [sf_dir] [output_dir]

stage 1  quality gate      — drop low-quality docs (length/punct/word-len)
stage 2  repetition gate   — drop docs with top-bigram fraction > 0.06
stage 3  near-dup dedup    — MinHash+LSH pairs -> connected components ->
                             keep each cluster's canonical member
stage 4  decontamination   — drop docs overlapping the benchmark set
                             (broadcast benchmark gram set, >= 20% rule)
stage 5  PII scrub         — redact emails/URLs/phones in survivors
stage 6  mixture sample    — deterministic per-source hash sampling
stage 7  chunking          — 32-token windows, stride 24
stage 8  partitioned parquet sink (by lang) + one-line run report

Every stage is a pure DataFrame transform from the operator library, so
the whole pipeline is ONE lazy plan per action and scales with the
cluster — nothing here collects to the driver except the final counters.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark.operators import dedup as D
from advanced_data_mining_and_big_data_analysis_spark.operators import text as X
from advanced_data_mining_and_big_data_analysis_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_out_")
    spark = get_spark("corpus-pipeline")
    t0 = time.monotonic()

    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. quality gate (staged projections: each regex evaluated once)
    feats = X.quality_features_staged(docs, "text", keep=("doc_id",))
    passing = feats.filter(
        X.quality_score_from(
            F.col("n_tokens"), F.col("punct_ratio"), F.col("avg_token_len")
        )
        >= 2.0 / 3.0
    ).select("doc_id")
    quality = docs.join(passing, "doc_id", "left_semi")

    # 2. repetition gate — drop only docs the scorer POSITIVELY flagged.
    # repetition_features emits no row for docs with < n tokens, so a
    # semi-join on passing ids would silently delete un-scoreable docs;
    # the anti-join on flagged ids lets them pass through instead.
    rep = X.repetition_features(quality, n=2)
    flagged_ids = rep.filter(F.col("top_ngram_frac") > 0.06).select("doc_id")
    clean = quality.join(flagged_ids, "doc_id", "left_anti")

    # 3. near-dup dedup (pairs -> clusters -> canonical survivors)
    pairs = D.near_dup_pairs(clean, num_hashes=16, bands=4, shingle_n=3, jaccard_threshold=0.5)
    survivors = D.dedup_survivors(clean, pairs)

    # 4. benchmark decontamination via the Bloom path (q115 shape): the
    # benchmark (src0 here) collapses to its broadcastable bit set; only
    # Bloom maybe-members get the exact verify join, so the rule is
    # exactly the broadcast-gram rule (no false negatives) at any
    # benchmark size. Drop docs sharing >= 20% of their distinct 3-gram
    # shingles with the benchmark.
    ev_grams = (
        D.shingle_rows(survivors.filter(F.col("source") == "src0"), shingle_n=3)
        .select("shingle")
        .distinct()
    )
    bitset = D.bloom_bitset(ev_grams, "shingle", m_bits=16384, k=3)
    tr = survivors.filter(F.col("source") != "src0")
    tr_grams = D.shingle_rows(tr, shingle_n=3)
    cand_hits = (
        D.bloom_candidates(tr_grams, bitset, "shingle", 16384, 3)
        .join(F.broadcast(ev_grams.withColumn("_hit", F.lit(1))), "shingle", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("_hits"))
    )
    totals = tr_grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_total"))
    contaminated = (
        totals.join(cand_hits, "doc_id", "left")
        .filter(F.coalesce(F.col("_hits"), F.lit(0)) / F.col("_total") >= 0.2)
        .select("doc_id")
    )
    decontaminated = tr.join(contaminated, "doc_id", "left_anti")

    # 5. PII scrub
    scrubbed = decontaminated.withColumn("text", X.scrub_pii("text"))

    # 6. deterministic mixture sample (keep ~80% of every source)
    frac_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6)
    sampled = scrubbed.filter(frac_hex < F.lit("cccccc"))

    # 7. chunking
    chunks = X.chunk_rows(sampled, width=32, stride=24, extra_cols=("lang", "source"))

    # 8. sink, partitioned for downstream pruning
    chunks.write.mode("overwrite").partitionBy("lang").parquet(f"{out_dir}/chunks")

    report = {
        "sf_dir": sf_dir,
        "n_raw_docs": n_raw,
        "n_after_quality": clean.count(),
        "n_after_dedup": survivors.count(),
        "n_after_decontam": decontaminated.count(),
        "n_after_sample": sampled.count(),
        "n_chunks": spark.read.parquet(f"{out_dir}/chunks").count(),
        "out": f"{out_dir}/chunks",
        "wall_sec": round(time.monotonic() - t0, 2),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
