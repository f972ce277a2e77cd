"""End-to-end revenue-monitoring run: the statistical-analytics family
composed the way a metrics/observability stack actually chains it.

    python examples/revenue_monitoring.py [sf_dir]

stage 1  data firewall     — q151 validation expectations gate the input
stage 2  seasonality scan  — q136 ACF says WHICH lags structure the series
stage 3  drift detection   — q137 CUSUM flags sustained level shifts
stage 4  point anomalies   — q135 trailing-window sigma flags spikes
stage 5  bar rollup        — q146 OHLC bars summarize each (type, day)
stage 6  key-skew probe    — q149 decides salt/broadcast before any join
stage 7  one-line JSON run report

Every stage is a declared query from the registry, so each is
hash-verified against its DuckDB oracle independently of this script;
the script shows they compose into one coherent monitoring pass."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("revenue-monitoring")
    qs = all_queries()
    t0 = time.monotonic()

    # 1. data firewall: refuse to compute on rows that fail the contract
    validation = qs["a0151_validation_report"].fn(spark, sf_dir).collect()
    failures = [r["rule"] for r in validation if not r["pass"]]
    if failures:
        print(json.dumps({"aborted": True, "failed_rules": failures}))
        return

    # 2. which lags carry structure (weekly seasonality shows at lag 7)
    acf = {r["lag"]: r["acf"] for r in qs["q136_acf_daily_revenue"].fn(spark, sf_dir).collect()}

    # 3. sustained drift per event_type
    cusum = qs["q137_cusum_changepoints"].fn(spark, sf_dir).collect()
    drifted = [r["event_type"] for r in cusum if r["n_flagged"] > 0]

    # 4. point anomalies on the daily revenue series
    anomalies = qs["q135_anomaly_flags"].fn(spark, sf_dir).count()

    # 5. OHLC bars (the rollup a dashboard reads)
    n_bars = qs["a0146_ohlc_bars"].fn(spark, sf_dir).count()

    # 6. skew probe before any downstream per-customer join
    skew = qs["a0149_key_skew_report"].fn(spark, sf_dir).collect()[0]
    join_strategy = "salt" if skew["max_share"] > 0.01 else "plain-hash"

    print(
        json.dumps(
            {
                "validation_rules_passed": len(validation),
                "acf_lag7": acf.get(7),
                "drifted_event_types": drifted,
                "n_anomalous_days": anomalies,
                "n_ohlc_bars": n_bars,
                "key_max_share": skew["max_share"],
                "suggested_join_strategy": join_strategy,
                "wall_s": round(time.monotonic() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
