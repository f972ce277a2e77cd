"""CLI: run declared queries by name.

    python -m advanced_data_mining_and_big_data_analysis_spark list
    python -m advanced_data_mining_and_big_data_analysis_spark q01_pricing_summary
    python -m advanced_data_mining_and_big_data_analysis_spark q41_minhash_neardup --sf /root/testdata/sf0.1 --limit 50
"""

from __future__ import annotations

import argparse
import sys
import time

from . import get_spark
from .plans import all_queries


def main() -> int:
    ap = argparse.ArgumentParser(prog="advanced_data_mining_and_big_data_analysis_spark")
    ap.add_argument("name", help="declared query name, or 'list'")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--explain", action="store_true", help="print the physical plan instead")
    args = ap.parse_args()

    qs = all_queries()
    if args.name == "list":
        for name, qd in qs.items():
            tag = "oracle" if qd.oracle else "rows-only"
            print(f"{name:28s} [{tag}] {qd.description}")
        return 0
    if args.name not in qs:
        print(f"unknown query {args.name!r}; run 'list'", file=sys.stderr)
        return 2

    spark = get_spark("cli")
    df = qs[args.name].fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
        return 0
    t0 = time.time()
    df.show(args.limit, truncate=False)
    print(f"[{args.name} @ {args.sf}: {time.time() - t0:.2f}s]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
