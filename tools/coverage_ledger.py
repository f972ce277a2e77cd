"""Compute the driver-evidence ledger: which registry queries have a
green driver-dated row in any CORRECTNESS_r*.json, and which still need
one (COVERAGE.md "Driver-evidence ledger" section).

A renamed query (a0NN_*) counts as covered if EITHER its current name
or its pre-rename canonical name (qNN_*) has a green row — the rename
is a window-steering mechanism, not a semantic change.

Usage: python tools/coverage_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def green_names() -> set[str]:
    """Union of query names with rows+schema+hash all true across every
    driver CORRECTNESS_r*.json (builder-local files excluded)."""
    out: set[str] = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                out.add(name)
    return out


def aliases(name: str) -> set[str]:
    """All names a registry query may have carried in past rounds."""
    out = {name}
    m = re.match(r"a(\d{3,4})_(.+)", name)
    if m:  # registry-level rename (r8: a0NN_x was qNN_x; r9: a0NNN_x was qNNN_x)
        out.add(f"q{int(m.group(1))}_{m.group(2)}")
    m = re.match(r"q(\d+)_(.+)", name)
    if m:  # entry-level rotation (round 7): qNN_x was exposed as a0NN_x
        out.add(f"a{int(m.group(1)):03d}_{m.group(2)}")
    return out


def local_green_hashes() -> dict[str, str | None]:
    """name -> oracle_md5 merged across ALL CORRECTNESS_LOCAL_r*.json
    files, newest round winning per query (written by check_oracle
    --json). Merging — rather than taking only the newest file — means
    a partial re-verify run (check_oracle with an explicit query
    subset) written as the newest file refreshes just those queries
    instead of silently flagging every other covered query as
    stale_credit_risk (ADVICE r9). Empty if no local ledger records
    hashes yet."""
    paths = sorted(
        glob.glob(os.path.join(ROOT, "CORRECTNESS_LOCAL_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    merged: dict[str, str | None] = {}
    for path in paths:  # oldest -> newest so newer rounds overwrite
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and "oracle_md5" in row
                and (row.get("hash_match") or row.get("rows_only"))
            ):
                merged[name] = row.get("oracle_md5")
    return merged


def main() -> None:
    import hashlib

    from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

    qs = all_queries()
    registry = list(qs)
    green = green_names()
    covered = sorted(n for n in registry if aliases(n) & green)
    uncovered = sorted(n for n in registry if not (aliases(n) & green))
    # Stale-credit guard (ADVICE r8): a driver-dated green row proves
    # driver contact under SOME past oracle; it only counts as CURRENT
    # coverage if the latest local sweep re-verified the query under an
    # oracle whose md5 matches the one registered right now.
    local = local_green_hashes()
    stale = []
    for n in covered:
        o = qs[n].oracle
        cur = hashlib.md5(o.encode()).hexdigest() if o else None
        if n not in local or local[n] != cur:
            stale.append(n)
    print(json.dumps({
        "registry_total": len(registry),
        "covered": len(covered),
        "uncovered": len(uncovered),
        "uncovered_names": uncovered,
        "local_reverify_round": bool(local),
        "stale_credit_risk": sorted(stale),
        "stale_note": "driver-green but not re-verified under the CURRENT "
        "oracle text by the newest CORRECTNESS_LOCAL sweep — rerun "
        "tools/check_oracle.py --json CORRECTNESS_LOCAL_r<N>.json to clear",
    }, indent=2))


if __name__ == "__main__":
    main()
