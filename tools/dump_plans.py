"""Dump .explain('formatted') for named queries to plans/r14/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]
Default query list: bench HEADLINE. Env: SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = sys.argv[1]
    qs = all_queries()
    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in qs]
    spark = get_spark("dump_plans")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars", flush=True)


if __name__ == "__main__":
    main()
