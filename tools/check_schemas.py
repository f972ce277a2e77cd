"""Round-start schema probe (VERDICT r5 item 7).

The driver regenerates /root/testdata between rounds and its parquet
schemas have drifted before: round 4's regeneration switched events.ts
from TIMESTAMP(NANOS) to plain timestamp[us] (Spark >= 3.4 infers
TIMESTAMP_NTZ), `unix_micros` threw, and the whole bench aborted with
rc=1 before a single number was recorded. The *symptom* was fixed by
rewriting ts arithmetic as interval comparisons; THIS tool fixes the
*detection*: probe every table's arrow schema, diff it against the
recorded expectation, and print a loud warning on drift — so the first
artifact of a drifted round is a diagnosis, not a zero.

Usage:
    python tools/check_schemas.py [sf_dir]     # standalone probe
    check(sf_dir)                              # from bench.py startup

Never raises: drift is a warning (queries may still pass — the interval
rewrite survives both ts types), absence of a table IS worth failing
loudly over but still shouldn't kill the bench before it starts.
"""

from __future__ import annotations

import os
import sys

# Expected arrow-level schemas, recorded 2026-08 (rounds 4-6 generation).
# Types are pyarrow's str() rendering. When the driver legitimately
# changes a type, update this map in the same commit that adapts the
# queries — the probe is a tripwire, not a contract.
EXPECTED: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64",
        "ts": "timestamp[us]",  # NTZ in Spark >= 3.4; round-4 drift site
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


def check(sf_dir: str, out=sys.stderr) -> list[str]:
    """Diff every table's parquet schema against EXPECTED; returns (and
    prints) human-readable drift lines. Empty list == no drift."""
    import pyarrow.parquet as pq

    problems: list[str] = []
    for table, want in EXPECTED.items():
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            problems.append(f"{table}: MISSING at {path}")
            continue
        try:
            schema = pq.read_schema(path)
        except Exception as e:  # noqa: BLE001 — a corrupt file is drift too
            problems.append(f"{table}: unreadable ({type(e).__name__}: {e})")
            continue
        got = {f.name: str(f.type) for f in schema}
        for col, typ in want.items():
            if col not in got:
                problems.append(f"{table}.{col}: column missing (have: {sorted(got)})")
            elif got[col] != typ:
                problems.append(f"{table}.{col}: type drift {typ} -> {got[col]}")
        for col in got:
            if col not in want:
                problems.append(f"{table}.{col}: NEW column ({got[col]})")
    if problems:
        print("=" * 72, file=out)
        print(f"SCHEMA DRIFT DETECTED in {sf_dir} (testdata regenerated?):", file=out)
        for p in problems:
            print(f"  !! {p}", file=out)
        print("  (queries may still pass; see tools/check_schemas.py)", file=out)
        print("=" * 72, file=out)
    return problems


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    drift = check(sf, out=sys.stdout)
    print(f"{sf}: {'OK — schemas match' if not drift else f'{len(drift)} drift line(s)'}")
