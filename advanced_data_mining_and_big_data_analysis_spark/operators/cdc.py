"""Change-data-capture apply: Delta-MERGE semantics on plain DataFrames.

``apply_cdc`` applies a changes feed (insert/update/delete rows with a
monotonic sequence column) to a base snapshot — the standard incremental
table-maintenance op (reference has no mutation story at all; Spark-first
this is two shuffles on the key):

1. latest-wins per key: one ranking window partitioned by the key over
   the CHANGES feed only (bounded by churn, not table size);
2. base rows whose key appears in the feed are dropped via left-anti
   join; surviving latest changes that are not deletes are unioned in.

At 100 TB the base-side anti join is the cost; it broadcasts when the
churn set is small and degrades to a shuffled hash join otherwise —
exactly the two physical strategies a MERGE would pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a CDC feed to ``base``. ``changes`` carries the base columns
    plus ``op_col`` in {'I','U','D'} and ``seq_col`` (larger = later);
    the latest change per key wins, 'D' removes the row."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    untouched = base.join(latest.select(key), key, "left_anti")
    upserts = latest.filter(F.col(op_col) != "D").select(*base.columns)
    return untouched.unionByName(upserts)
