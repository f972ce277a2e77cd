"""Benchmark runner — the driver's per-round feedback loop.

Runs the headline declared queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via a count-shaped collect (the driver's
pattern), timed wall-clock. A warmup query amortizes JVM/codegen startup so
the numbers reflect plan execution, not session boot.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

HEADLINE = [
    # relational core
    "q01_pricing_summary",
    "q03_discount_revenue",
    "q05_regional_revenue",
    "q09_order_count_histogram",
    "q10_topk_per_group",
    "q18_small_quantity_revenue",
    # feature/metric engine
    "q26_fourier_harmonics",
    "q32_best_weight",
    # events / sessionization
    "q21_hourly_events",
    "q60_sessionization",
    # LLM-pipeline operators
    "q40_exact_dedup_stats",
    "q41_minhash_neardup",
    "q45_quality_scores",
    "q47_char_ngram_vocab",
    "q50_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]

    # warmup: run the first query once to pay session/codegen startup
    qs[names[0]].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.time()
        qs[name].fn(spark, sf_dir).collect()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "declared_query_wall_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
