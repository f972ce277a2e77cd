"""Table catalog for the driver's synthetic star schema (TESTDATA.md).

Schemas are declared explicitly (FIXTURES.md Group B). The reference's
precedent for explicit-on-read schemas is ``load_data``'s ``dtype=``/
``parse_dates=`` arguments (reference kaggle/kaggle.py:344-352) — we never
rely on runtime inference in production paths.

Parquet is self-describing, so ``load_table`` reads without forcing the
schema (forcing would defeat nothing but costs a reconciliation step);
the declared StructTypes are used for CSV ingestion, for validation in
tests, and as documentation of the catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLES = tuple(SCHEMAS)

# Dimension tables small enough to always broadcast (region: 5 rows,
# nation: 25 rows at every SF — size-invariant dims of the star schema).
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table from a scale-factor directory.

    ``events.parquet`` stores ``ts`` as INT64 TIMESTAMP(NANOS), which the
    vectorized Spark reader rejects; read it as raw nanos and truncate to
    microseconds (Spark's native timestamp precision).

    The analyzed reader handle is memoized per (session, sf_dir, table):
    ``spark.read.parquet`` re-lists the directory and re-reads footers
    for schema on EVERY call (~60-90 ms even warm), which at one to
    three tables per declared query is pure catalog overhead — the
    local-mode equivalent of what a metastore/table-format layer
    (Hive catalog, Delta log snapshot cache) provides on a cluster.
    DataFrames are immutable logical plans, so handing back the same
    handle is semantically inert; the cache lives ON the session object
    so its lifetime — and any cross-session plan mixing — is bounded by
    the session itself. Catalog test data is write-once per scale
    factor (TESTDATA.md), which is what makes the listing cacheable.
    An in-session REWRITE of a table at the same path is still safe:
    the cache key carries the path's mtime_ns, so a rewrite (new mtime)
    misses and re-lists — the cached plan can never serve stale
    part-file listings.  ``invalidate_cache(spark)`` force-clears.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; catalog has {sorted(SCHEMAS)}")
    # Pin the session to UTC regardless of who built it: every declared
    # query's timestamp->date/year arithmetic must match the timezone-naive
    # DuckDB oracle, and this is a runtime conf (safe to set per call).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cache: dict[tuple, DataFrame] | None = getattr(spark, "_adm_df_cache", None)
    if cache is None:
        cache = {}
        spark._adm_df_cache = cache
    try:
        mtime = os.stat(f"{sf_dir}/{name}.parquet").st_mtime_ns
    except OSError:
        mtime = -1  # non-local URI (hdfs://, s3a://) or missing: let the reader decide
    key = (sf_dir, name, mtime)
    hit = cache.get(key)
    if hit is not None:
        return hit
    cache[key] = df = _read_table(spark, sf_dir, name)
    return df


def invalidate_cache(spark: SparkSession) -> None:
    """Drop every memoized reader handle on this session.

    Call after any code path that rewrites catalog data in place; the
    mtime in the cache key already catches local-filesystem rewrites,
    this is the explicit hook for remote URIs where stat() is not
    available driver-side.
    """
    if hasattr(spark, "_adm_df_cache"):
        spark._adm_df_cache.clear()


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # Scope the legacy flag to this one read: left set session-wide it
        # would silently surface OTHER parquets' TIMESTAMP(NANOS) columns
        # as bigint instead of failing loudly.
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
            # force analysis/scan planning while the flag is on
            dtypes = dict(df.dtypes)
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        if dtypes.get("ts") == "bigint":
            # integer division — float division of epoch-nanos (~1.7e18)
            # exceeds double's 2^53 mantissa and lands ~1us off
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every catalog table as a temp view (SQL entry point)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
