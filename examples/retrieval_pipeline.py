"""Hybrid retrieval stack: the search-side operators composed the way a
RAG / retrieval service actually layers them.

    python examples/retrieval_pipeline.py [sf_dir]

stage 1  lexical candidate generation — multi-query BM25 over posting
         lists (one corpus pass for the whole query batch)
stage 2  exact phrase filter — positional-postings phrase match for
         queries that carry a quoted phrase
stage 3  dense retrieval — IVF-indexed batched ANN join (per-query
         cluster probing, never batch x corpus)
stage 4  hybrid fusion — reciprocal-rank fusion of the lexical and
         dense candidate lists per query
stage 5  one-line run report

(The synthetic corpus draws text and embeddings independently, so the
lexical and dense lists rarely agree on a document — multi_list_hits
counts those agreements and is expected to be ~0 here; on correlated
real data it is the number RRF exists to reward.)

Every stage is a pure DataFrame transform over the registry operators,
so the whole stack is lazy plans end-to-end; the only driver-side data
are the per-query top-k results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("retrieval-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    t0 = time.time()

    # 1. lexical: per-query BM25 top-k (a0168's plan)
    lex = qs["a0168_bm25_multiquery"].fn(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rnk").alias("lex_rank")
    )

    # 2. phrase filter: exact positional matches (a0170's plan)
    phrase = qs["a0170_phrase_search"].fn(spark, sf_dir).select(
        F.col("query_id").alias("p_query"), "doc_id", F.col("rnk").alias("phrase_rank")
    )

    # 3. dense: batched ANN join over the IVF index (q118's plan)
    # In a hybrid service each query carries both a term set and an
    # embedding; here the first three ANN batch queries stand in for the
    # three BM25 queries' embeddings (the dense index covers a superset
    # of the lexical corpus id space, the usual deployment shape).
    qid_map = F.create_map(
        F.lit(0), F.lit("nav01"), F.lit(1), F.lit("nav02"), F.lit(2), F.lit("nav03")
    )
    dense = qs["q118_batch_ann_join"].fn(spark, sf_dir).select(
        F.coalesce(
            F.element_at(qid_map, F.col("qid")),
            F.concat(F.lit("vec"), F.col("qid").cast("string")),
        ).alias("query_id"),
        F.col("vec_id").alias("doc_id"),
        F.col("rank").alias("dense_rank"),
    )

    # 4. reciprocal-rank fusion (k=60, the standard constant): candidates
    # from either retriever, score = sum over lists of 1/(k + rank).
    cand = (
        lex.select("query_id", "doc_id", F.col("lex_rank").alias("rnk"), F.lit("lex").alias("src"))
        .unionByName(
            dense.select("query_id", "doc_id", F.col("dense_rank").alias("rnk"), F.lit("dense").alias("src"))
        )
    )
    fused = (
        cand.groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum(1.0 / (60 + F.col("rnk"))), 9).alias("rrf"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("rrf"), "doc_id")
            ),
        )
        .filter(F.col("rank") <= 5)
    )

    fused_rows = fused.collect()
    phrase_rows = phrase.collect()
    report = {
        "sf_dir": sf_dir,
        "queries_fused": len({r.query_id for r in fused_rows}),
        "fused_results": len(fused_rows),
        "multi_list_hits": sum(1 for r in fused_rows if r.n_lists > 1),
        "phrase_matches": len(phrase_rows),
        "wall_sec": round(time.time() - t0, 2),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
