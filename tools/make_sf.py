"""Scale a testdata SF directory by integer replication with
referential-integrity-preserving key shifts — for scale benchmarks only
(BENCH_SF1.json); correctness always runs on the driver-generated SFs.

Each replica r in 0..N-1 shifts every primary/foreign key by
r * stride(table), where stride = the source key-domain size, so joins
fan out exactly as at a true larger SF: lineitem->orders/part/supplier,
orders->customer, events.user_id all stay consistent per replica and
never collide across replicas. Dimension tables region/nation are fixed
(25 nations / 5 regions at every TPC-H SF). Payload columns (text,
embeddings, prices, timestamps) are replicated verbatim: group sizes in
dedup/grouping operators grow by N — the intended stress — while every
salted-cap / bucketed operator must stay bounded.

Usage: python tools/make_sf.py [N] [src_dir] [out_dir]
Defaults: N=10, src=/root/testdata/sf0.1, out=/tmp/spark_graft_sf1.0
"""

from __future__ import annotations

import os
import sys

import duckdb

SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
FIXED = ["region", "nation"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_sf1.0"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    for t, shifts in SHIFTS.items():
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + r.r * {shifts[c]} AS {c}" if c in shifts else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet' CROSS JOIN "
            f"(SELECT unnest(range({n})) AS r) r ORDER BY r.r) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        rows = con.execute(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, rows)


if __name__ == "__main__":
    main()
