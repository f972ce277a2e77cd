"""Shared oracle-comparison helpers (used by tools/check_oracle.py and tests).

Mirrors the driver's t2 gate: row count + column names + order-insensitive
value hash after canonicalization (FIXTURES.md rules: sort columns by name,
round floats to 6 decimals, sort rows, stringify).
"""

from __future__ import annotations

import hashlib

import pandas as pd


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            # + 0.0 normalizes IEEE -0.0 to +0.0 so a ~1e-14 summation-order
            # residue that rounds to "negative zero" on one engine cannot
            # hash-diverge from "+0.0" on the other (astype(str) below would
            # render them "-0.0" vs "0.0").
            df[c] = df[c].round(6) + 0.0
        elif df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    body = df.astype(str).to_csv(index=False)
    return hashlib.sha256(body.encode()).hexdigest()[:16]


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    s, o = canonical(spark_pdf), canonical(oracle_pdf)
    problems: list[str] = []
    if len(s) != len(o):
        problems.append(f"row count {len(s)} vs {len(o)}")
    if list(s.columns) != list(o.columns):
        problems.append(f"columns {list(s.columns)} vs {list(o.columns)}")
    elif len(s) == len(o) and value_hash(s) != value_hash(o):
        problems.append("value-hash mismatch")
    return problems
