"""Streaming curated-corpus ingest: crawl increments land as parquet
files, each micro-batch is deduped internally AND against the corpus
accumulated so far, and only verified-novel docs are appended.

    python examples/streaming_ingest.py [sf_dir] [work_dir]

Demonstrates streaming.write_dedup_ingest — the continuous form of the
q108 incremental-dedup shape: per-batch cost is O(batch) minhash
signatures plus bucket-local joins against the corpus, never a global
re-dedup. Here the sf documents table is split into three "crawl
increments" (with overlapping planted text so the dedup visibly fires)
and replayed through a file-source stream.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark import streaming as ST
from advanced_data_mining_and_big_data_analysis_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="ingest_")
    spark = get_spark("streaming-ingest")
    t0 = time.monotonic()

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    # three increments; increment 2 re-submits copies of increment 0 docs
    # (new ids, same text) so the cross-increment dedup visibly fires
    inc0 = docs.filter(F.col("doc_id") % 3 == 0)
    inc1 = docs.filter(F.col("doc_id") % 3 == 1)
    resubmit = inc0.limit(20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "source"
    )
    inc2 = docs.filter(F.col("doc_id") % 3 == 2).unionByName(resubmit)
    for i, inc in enumerate((inc0, inc1, inc2)):
        inc.coalesce(1).write.mode("overwrite").parquet(f"{work}/feed/b={i}")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    feed = ST.stream_from_directory(spark, f"{work}/feed/b=*", schema, max_files_per_trigger=1)
    q = ST.write_dedup_ingest(feed, f"{work}/corpus", f"{work}/ckpt")
    q.awaitTermination(600)

    corpus = spark.read.parquet(f"{work}/corpus")
    print(
        json.dumps(
            {
                "submitted": docs.count() + 20,
                "ingested": corpus.count(),
                "resubmitted_survivors": corpus.filter(F.col("doc_id") >= 1_000_000).count(),
                "corpus": f"{work}/corpus",
                "wall_sec": round(time.monotonic() - t0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
