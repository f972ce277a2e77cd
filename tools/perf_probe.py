"""Quick warm-timing probe for a subset of queries at a given SF.

Usage: python tools/perf_probe.py a092_repetition_signals q121_bpe_pair_counts
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Prints per query: cold, warm median-of-3, DuckDB oracle time, ratio.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries
from advanced_data_mining_and_big_data_analysis_spark.sources import TABLES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    qs = all_queries()
    spark = get_spark("perf_probe")
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # warm the session on the first query
    qs[names[0]].fn(spark, sf_dir).collect()
    for name in names:
        t0 = time.time()
        qs[name].fn(spark, sf_dir).collect()
        cold = time.time() - t0
        reps = []
        for _ in range(3):
            t0 = time.time()
            qs[name].fn(spark, sf_dir).collect()
            reps.append(time.time() - t0)
        warm = sorted(reps)[1]
        dt = float("nan")
        if qs[name].oracle:
            t0 = time.time()
            con.execute(qs[name].oracle).fetchall()
            dt = time.time() - t0
        print(
            f"{name}: cold={cold:.3f} warm={warm:.3f} duck={dt:.3f} "
            f"ratio={warm / dt if dt == dt and dt > 0 else float('nan'):.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
