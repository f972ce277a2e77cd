"""Skew-mitigation join operators (SURVEY §4, 100 TB notes).

AQE's skew-join splitting handles most skew at runtime; explicit salting
remains the tool when one key dominates so heavily that even split
partitions overwhelm a task, or when AQE is unavailable (streaming joins).

``salted_join`` replicates the small side ``salt`` times and scatters the
big side's hot keys uniformly: big.key joins small.(key, salt_id) on
(key, salt), where big rows pick a salt from a deterministic hash of
their row identity — for the supported join types results are identical
to the unsalted join, and the hot key's rows spread over ``salt``
reducers. Join types that emit unmatched SMALL-side rows (right/full
outer) are rejected: the replicated small side would emit each unmatched
row ``salt`` times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALTED_HOWS = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Join ``big`` (skewed) with ``small`` on ``key`` using ``salt``-way
    key scattering.

    ``salt_source``: column whose md5 picks the salt deterministically;
    defaults to the key itself combined with all of big's columns is not
    possible generically, so pass a unique-ish column (e.g. a row id) for
    an even spread — falling back to spark_partition_id which is uneven
    but correct.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALTED_HOWS}:
        raise ValueError(
            f"salted_join supports {{inner, left/left_outer, left_semi, left_anti}}; "
            f"got {how!r} (right/full outer would duplicate unmatched small-side rows "
            f"{salt}x across the replicas)"
        )
    if salt_source:
        salt_col = (
            F.conv(F.substring(F.md5(F.col(salt_source).cast("string")), 1, 7), 16, 10)
            .cast("long") % salt
        ).cast("int")
    else:
        salt_col = (F.spark_partition_id() % salt).cast("int")
    big_salted = big.withColumn("_salt", salt_col)
    small_salted = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = big_salted.join(small_salted, [key, "_salt"], how)
    return out.drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """As-of join (left): for every left row, attach the payload of the
    most recent right row with ``right_ts <= left_ts`` for the same key;
    nulls where no right row precedes. The temporal-join primitive Spark
    SQL lacks (DuckDB/kdb ASOF JOIN, pandas merge_asof).

    Shape: union the two sides (right rows sort BEFORE left rows on ts
    ties, so an equal-timestamp right row is visible) and run one
    last-non-null window per key — a single shuffle on the key, linear
    scan per partition. This deliberately avoids the range-join form
    (left x right ON key AND rt <= lt + max-per-left), which explodes
    quadratically per key before its aggregate; the window form's cost
    is sort + scan regardless of how many right rows precede each left
    row. Skewed keys shard like any window (salt the key upstream if one
    entity dominates).

    Right payload columns must not collide with left column names
    (select/rename the right side first).

    Tie rule: when multiple right rows share the same (key, ts), the one
    with the greatest payload tuple (vcols compared left-to-right, nulls
    first) wins — the window orderBy includes the payload columns as a
    final tie-breaker, so the fill is deterministic regardless of
    partitioning (pandas merge_asof picks the last row in input order;
    input order is not a distributed concept, so the payload tuple is
    the engine-independent analogue).
    """
    from pyspark.sql import Window as W

    vcols = [c for c in right.columns if c not in (on, right_ts)]
    clash = set(vcols) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}")
    l2 = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    r2 = (
        right.withColumn("_t", F.col(right_ts))
        .drop(right_ts)
        .withColumn("_side", F.lit(0))
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        W.partitionBy(on)
        .orderBy("_t", "_side", *vcols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Fill ONE struct of the entire right row (non-null exactly when the
    # row is a right row), not per-column last-non-null: per-column fills
    # could stitch values from different right rows when payloads contain
    # nulls, whereas the matched row's own nulls must pass through (the
    # merge_asof/ASOF JOIN contract — attach the whole row).
    payload = F.when(F.col("_side") == 0, F.struct(*[F.col(c) for c in vcols]))
    filled = u.select("*", F.last(payload, ignorenulls=True).over(w).alias("_asof"))
    out = filled.filter(F.col("_side") == 1).drop("_side", "_t", *vcols)
    for c in vcols:
        out = out.withColumn(c, F.col(f"_asof.{c}"))
    return out.drop("_asof")
