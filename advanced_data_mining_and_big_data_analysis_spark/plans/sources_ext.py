"""Extended source-format declared queries (SURVEY §2.1 widening): JSONL
source, ORC round-trip, and corrupt-record tolerance.

Pattern follows q84 (CSV): the query mirrors a parquet table into the
target format in a tempdir, reads it back through the schema'd reader,
and aggregates; the oracle runs on the parquet view — so the hash match
proves the round-trip through the format is LOSSLESS, including string
escaping (JSON), decimal/date fidelity (ORC), and that corrupt-line
isolation drops exactly the planted lines and nothing else.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..sources.catalog import SCHEMAS
from ..sources.readers import read_jsonl
from .registry import query


def _mirror_dir(sf_dir: str, fmt: str, table: str) -> str:
    # pid-keyed scratch: two concurrent harnesses (bench + check_oracle on
    # the same SF) each overwrite-then-read the mirror; a shared path let
    # one delete part-files the other was mid-scan on (ADVICE r9)
    return os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_{fmt}_mirror_{os.getpid()}",
        os.path.basename(sf_dir.rstrip("/")),
        table,
    )


@query(
    "a099_jsonl_source_documents",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT md5(text)) AS n_unique_texts
    FROM documents GROUP BY lang ORDER BY lang
    """,
    description="JSONL source (SURVEY §2.1): documents mirrored to JSON-lines, read back through the schema'd reader (no inference), aggregated with an md5-of-text distinct — the hash match against the parquet-view oracle proves JSON string escaping round-trips every document byte-identically",
)
def a099_jsonl_source_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    mirror = _mirror_dir(sf_dir, "jsonl", "documents")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").json(mirror)
    jd = read_jsonl(spark, mirror, SCHEMAS["documents"])
    return (
        jd.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        )
        .orderBy("lang")
    )


@query(
    "q100_orc_roundtrip_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           strftime(MAX(l_shipdate), '%Y-%m-%d') AS last_ship
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="ORC source/sink (SURVEY §2.1): lineitem round-tripped through ORC (Spark-native columnar alternative to parquet) and aggregated Q1-style; hash match vs the parquet-view oracle proves numeric/date fidelity through the second columnar format",
)
def q100_orc_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    mirror = _mirror_dir(sf_dir, "orc", "lineitem")
    li = load_table(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").orc(mirror)
    # ORC files are self-describing (footer schema, incl. NTZ-vs-LTZ
    # timestamp flavor) — no inference pass, so no explicit schema needed
    od = spark.read.orc(mirror)
    return (
        od.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q101_corrupt_jsonl_isolation",
    oracle="""
    SELECT lang,
           CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
           CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt
    FROM documents GROUP BY lang ORDER BY lang
    """,
    description="corrupt-record isolation (production JSONL posture): every 7th document's JSON line is deliberately truncated before writing; the PERMISSIVE schema'd reader must route exactly those lines to the corrupt column and parse every other line intact — one broken line must never kill a 100 TB scan",
)
def q101_corrupt_jsonl_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    mirror = _mirror_dir(sf_dir, "jsonl_corrupt", "documents")
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select(
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("{BROKEN "), F.to_json(F.struct(*docs.columns))),
        )
        .otherwise(F.to_json(F.struct(*docs.columns)))
        .alias("value")
    )
    lines.write.mode("overwrite").text(mirror)
    jd = read_jsonl(spark, mirror, SCHEMAS["documents"], corrupt_col="_corrupt").cache()
    return (
        jd.withColumn(
            "lang_key",
            F.coalesce(
                "lang", F.get_json_object(F.regexp_replace("_corrupt", "^\\{BROKEN ", ""), "$.lang")
            ),
        )
        .groupBy(F.col("lang_key").alias("lang"))
        .agg(
            F.sum(F.col("_corrupt").isNull().cast("long")).alias("n_good"),
            F.sum(F.col("_corrupt").isNotNull().cast("long")).alias("n_corrupt"),
        )
        .orderBy("lang")
    )


@query(
    "a0169_file_audit_inputs",
    oracle="""
    WITH audit AS (
        SELECT 'region.parquet' AS file_group, COUNT(*) AS n_rows FROM region
        UNION ALL SELECT 'nation.parquet', COUNT(*) FROM nation
        UNION ALL SELECT 'customer.parquet', COUNT(*) FROM customer
        UNION ALL SELECT 'supplier.parquet', COUNT(*) FROM supplier
        UNION ALL SELECT 'part.parquet', COUNT(*) FROM part
        UNION ALL SELECT 'orders.parquet', COUNT(*) FROM orders
        UNION ALL SELECT 'lineitem.parquet', COUNT(*) FROM lineitem
        UNION ALL SELECT 'events.parquet', COUNT(*) FROM events
        UNION ALL SELECT 'documents.parquet', COUNT(*) FROM documents
        UNION ALL SELECT 'embeddings.parquet', COUNT(*) FROM embeddings
        UNION ALL
        SELECT 'mirror/l_returnflag=' || l_returnflag, COUNT(*)
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT file_group, CAST(1 AS BIGINT) AS n_files,
           CAST(n_rows AS BIGINT) AS n_rows
    FROM audit ORDER BY file_group
    """,
    description="directory-listing / input-file audit (SURVEY §2.1, reference kaggle.py:51-53 os.walk print loop as a query): every catalog input listed by its input_file_name() basename with per-file row counts, plus a partitioned multi-file parquet mirror audited per partition directory from the file path — countDistinct(input_file_name())==1 per group proves the single-file testdata layout AND that the repartition-by-key write emits exactly one file per partition",
)
def a0169_file_audit_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import TABLES

    # Part 1: audit the scale-factor directory itself.  input_file_name()
    # is evaluated at the scan (before any exchange), so the basename is
    # the physical file each row actually came from — a wrong path, a
    # stray extra file, or a miscounted table fails the hash.
    parts = []
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        parts.append(
            # input_file_name() must be PROJECTED before any aggregate
            # (Spark rejects non-deterministic expressions inside agg
            # arguments) — evaluated at the scan, so the basename is the
            # physical file each row actually came from.
            df.select(
                F.input_file_name().alias("path"),
                F.regexp_extract(F.input_file_name(), "([^/]+)$", 1).alias("file_group"),
            )
            .groupBy("file_group")
            .agg(
                F.countDistinct("path").alias("n_files"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )

    # Part 2: multi-file layout.  Hash-repartition by the partition key so
    # each key lands in exactly one task -> exactly one file per partition
    # directory; the audit extracts the partition dir from the path.
    mirror = _mirror_dir(sf_dir, "file_audit", "lineitem")
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition("l_returnflag").write.mode("overwrite").partitionBy(
        "l_returnflag"
    ).parquet(mirror)
    audited = (
        spark.read.parquet(mirror)
        .select(
            F.concat(
                F.lit("mirror/"),
                F.regexp_extract(F.input_file_name(), "(l_returnflag=[^/]+)", 1),
            ).alias("file_group"),
            F.input_file_name().alias("path"),
        )
        .groupBy("file_group")
        .agg(
            F.countDistinct("path").alias("n_files"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    parts.append(audited)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("file_group")
