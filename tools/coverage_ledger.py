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


def main() -> None:
    from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

    registry = list(all_queries())
    green = green_names()
    covered = sorted(n for n in registry if aliases(n) & green)
    uncovered = sorted(n for n in registry if not (aliases(n) & green))
    print(json.dumps({
        "registry_total": len(registry),
        "covered": len(covered),
        "uncovered": len(uncovered),
        "uncovered_names": uncovered,
    }, indent=2))


if __name__ == "__main__":
    main()
