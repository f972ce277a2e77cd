"""Floor decomposition for the vs-DuckDB 'weak' queries (VERDICT r3 item 5).

For each query flagged >2x DuckDB, measure warm wall time (median of 3
fresh-plan runs) at sf0.001, sf0.01, and sf0.1 — 100x data across the
ladder. A data-proportional query scales ~linearly; a floor-bound query
is flat. Report per query:

    floor_sec          wall time at sf0.001 (data cost ~0 there)
    slope_sec_per_sf   (t(0.1) - t(0.01)) / 0.09 — marginal cost of data
    data_fraction_01   share of the sf0.1 wall that is data-proportional:
                       (t(0.1) - floor) / t(0.1)

A query with data_fraction under ~0.5 spends most of its wall on Spark's
fixed stage/scheduling overhead — the part that amortizes to nothing at
100 TB while DuckDB's advantage on 5k-row inputs does not.

Writes BENCH_FLOOR.json at the repo root; run after bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

WEAK = [
    "q45_quality_scores",
    "a083_neardup_skew_capped",
    "a092_repetition_signals",
    "a094_chunk_stats",
    "a095_unigram_logprob",
    "q105_decontaminate",
    "q102_pagerank_transitions",
    # high-ratio tiny-absolute queries, included for the record
    "a086_periodogram",
    "q109_sequence_packing",
    "q26_fourier_harmonics",
    # round-5 headline additions (VERDICT r5 item 3: every headline
    # query gets the same floor/slope evidence)
    "q113_multimodal_decode",
    "q114_semdedup",
    "q115_decontaminate_bloom",
    "q116_duplicated_passages",
    "q117_mergeable_sketches",
    "q118_batch_ann_join",
    # round-6 headline additions (same convention)
    "q119_cms_heavy_hitters",
    "q120_product_quantization",
    "q121_bpe_pair_counts",
    "q122_classifier_scoring",
    "q123_zorder_layout",
    "q124_jpeg_decode",
    "q128_triangle_count",
    "q130_prefix_filter_simjoin",
    # round-9: the current >2x data-proportional list (BENCH_DETAIL)
    "q40_exact_dedup_stats",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def warm_median(qd, spark, sf_dir: str, reps: int = 3) -> float:
    qd.fn(spark, sf_dir).collect()
    times = []
    for _ in range(reps):
        t0 = time.time()
        qd.fn(spark, sf_dir).collect()
        times.append(time.time() - t0)
    return sorted(times)[reps // 2]


def main() -> None:
    spark = get_spark("floor")
    qs = all_queries()
    out = {}
    for name in WEAK:
        if name not in qs:
            continue
        t = {sf.rsplit("sf", 1)[-1]: round(warm_median(qs[name], spark, sf), 3) for sf in SFS}
        floor = t["0.001"]
        slope = (t["0.1"] - t["0.01"]) / 0.09
        data_fraction = max(0.0, (t["0.1"] - floor) / t["0.1"]) if t["0.1"] > 0 else 0.0
        out[name] = {
            "warm_by_sf": t,
            "floor_sec": floor,
            "slope_sec_per_sf": round(slope, 3),
            "data_fraction_01": round(data_fraction, 3),
        }
        print(name, out[name], flush=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_FLOOR.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_FLOOR.json")


if __name__ == "__main__":
    main()
