"""Round-10 third wave (a0192+): Spark-4 SQL/API surface — Python
UDTFs, correlated LATERAL joins — plus lakehouse compaction planning
and a G.711 mu-law codec audit.

Window fodder for future rounds (sorts after a0191); locally
oracle-verified now.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .dedup_text import _TOKS
from .registry import query

# ---------------------------------------------------------------------------
# a0192 — Python UDTF (Spark 4's pyspark.sql.functions.udtf), driven
# through its hardest shape: a LATERAL-correlated table function call
# in SQL, one invocation per input row. The UDTF emits a context-window
# chunk plan per document; eval() is a generator, so rows stream out
# Arrow-batched. The oracle reproduces the identical plan with
# generate_series — the hash pins the UDTF's row semantics, not just
# its schema.
# ---------------------------------------------------------------------------

_UDTF_CHUNK = 32


@query(
    "a0192_python_udtf_chunks",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, len({_TOKS}) AS n_tok FROM documents),
    pl AS (SELECT source, doc_id, n_tok,
                  CAST(s AS BIGINT) // {_UDTF_CHUNK} + 1 AS chunk_idx,
                  LEAST({_UDTF_CHUNK}, n_tok - CAST(s AS BIGINT)) AS width
           FROM d, unnest(range(0, GREATEST(n_tok, 0), {_UDTF_CHUNK})) t(s)
           WHERE n_tok > 0)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(width) AS BIGINT) AS total_width,
           CAST(SUM(CASE WHEN width < {_UDTF_CHUNK} THEN 1 ELSE 0 END) AS BIGINT) AS n_ragged,
           CAST(MAX(chunk_idx) AS BIGINT) AS max_chunks_per_doc
    FROM pl GROUP BY source ORDER BY source
    """,
    description="Python UDTF (Spark 4 pyspark.sql.functions.udtf) in its hardest shape — a LATERAL-correlated table-function call in SQL, invoked once per document row: the UDTF's generator eval() streams a 32-token context-window chunk plan (chunk_idx, start, width) per doc; per-source chunk totals, ragged-tail counts and max depth are hash-pinned against a generate_series oracle, so the UDTF's row SEMANTICS (not just schema) are under the hash",
)
def a0192_python_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx bigint, start bigint, width bigint")
    class ChunkPlan:
        def eval(self, n_tokens, chunk):
            if n_tokens is None or n_tokens <= 0:
                return
            idx, start = 1, 0
            while start < n_tokens:
                yield (idx, start, min(chunk, n_tokens - start))
                idx += 1
                start += chunk

    spark.udtf.register("adm_chunk_plan", ChunkPlan)
    docs = load_table(spark, sf_dir, "documents")
    from ..operators import text as X

    docs.select("doc_id", "source", F.size(X.tokens("text")).alias("n_tok")).createOrReplaceTempView(
        "adm_udtf_docs"
    )
    return spark.sql(
        f"""
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(SUM(c.width) AS BIGINT) AS total_width,
               CAST(SUM(CASE WHEN c.width < {_UDTF_CHUNK} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ragged,
               CAST(MAX(c.chunk_idx) AS BIGINT) AS max_chunks_per_doc
        FROM adm_udtf_docs d, LATERAL adm_chunk_plan(d.n_tok, {_UDTF_CHUNK}) c
        GROUP BY source ORDER BY source
        """
    )


# ---------------------------------------------------------------------------
# a0193 — correlated LATERAL subquery with ORDER BY + LIMIT (Spark 4
# SQL): the per-row top-k dependent join, the SQL-standard form of
# "top 2 orders for every customer". Catalyst decorrelates it into a
# ranked window join, so the plan shards by the correlation key — the
# query pins both the SQL surface and the decorrelation semantics.
# ---------------------------------------------------------------------------


@query(
    "a0193_lateral_topk_join",
    oracle="""
    WITH t AS (
      SELECT c.c_mktsegment, x.o_totalprice
      FROM customer c,
      LATERAL (SELECT o_totalprice FROM orders o WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) x)
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_top_orders,
           ROUND(SUM(o_totalprice), 2) AS top2_revenue,
           ROUND(ROUND(SUM(o_totalprice), 2) / COUNT(*), 6) AS avg_top_order,
           ROUND(MAX(o_totalprice), 2) AS best_order
    FROM t GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    description="correlated LATERAL subquery with ORDER BY + LIMIT (Spark 4 SQL surface): per-customer top-2 orders as a dependent join — Catalyst decorrelates the lateral into a ranked window join sharded on the correlation key (never a per-row re-execution); per-segment rollup of the top-2 revenue pinned against DuckDB's native LATERAL",
)
def a0193_lateral_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("adm_lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("adm_lat_orders")
    return spark.sql(
        """
        WITH t AS (
          SELECT c.c_mktsegment, x.o_totalprice
          FROM adm_lat_customer c,
          LATERAL (SELECT o_totalprice FROM adm_lat_orders o
                   WHERE o.o_custkey = c.c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) x)
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_top_orders,
               ROUND(SUM(o_totalprice), 2) AS top2_revenue,
               -- avg from the ROUNDED sum: a raw AVG of 2-decimal money can
               -- land on the .xx5 rounding knife-edge, where partial-agg
               -- accumulation order flips the last digit run-to-run
               ROUND(ROUND(SUM(o_totalprice), 2) / COUNT(*), 6) AS avg_top_order,
               ROUND(MAX(o_totalprice), 2) AS best_order
        FROM t GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )


# ---------------------------------------------------------------------------
# a0195 — compaction planning (the OPTIMIZE small-file problem): given
# a file inventory (here: per-(returnflag, linestatus, shipmonth)
# lineitem partitions with their estimated byte sizes), pack files
# into merge bins of a target size by the size-descending next-fit
# rule — sort by size desc, running cumulative sum, bin =
# floor(prev_cumsum / target). Deterministic, one bounded window over
# the FILE INVENTORY (never the data), and the audit reports per-bin
# fill — exactly what an OPTIMIZE planner submits as merge tasks.
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 512 * 1024  # bytes per merge bin


@query(
    "a0195_compaction_plan",
    oracle=f"""
    WITH files AS (SELECT l_returnflag, l_linestatus,
                          CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR) AS m,
                          COUNT(*) * 96 AS bytes
                   FROM lineitem GROUP BY 1, 2, 3),
    o AS (SELECT bytes,
                 COALESCE(SUM(bytes) OVER (ORDER BY bytes DESC, l_returnflag, l_linestatus, m
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS prev_sum
          FROM files),
    b AS (SELECT bytes, CAST(prev_sum // {_COMPACT_TARGET} AS BIGINT) AS bin FROM o)
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           ROUND(SUM(bytes) * 1.0 / {_COMPACT_TARGET}, 6) AS fill_frac
    FROM b GROUP BY bin ORDER BY bin
    """,
    description="compaction planning (the OPTIMIZE small-file problem): a file inventory (per-(returnflag, linestatus, shipmonth) partition byte estimates) packed into target-size merge bins by the deterministic size-descending next-fit rule — running cumulative sum over ONE bounded window on the inventory frame (never the data), bin = prev_cumsum div target; per-bin file counts and fill fractions are the merge-task manifest an OPTIMIZE planner submits",
)
def a0195_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        "l_returnflag", "l_linestatus", F.date_format("l_shipdate", "yyyy-MM").alias("m")
    ).agg((F.count("*") * 96).alias("bytes"))
    w = Window.orderBy(
        F.col("bytes").desc(), "l_returnflag", "l_linestatus", "m"
    ).rowsBetween(Window.unboundedPreceding, -1)
    o = files.select("bytes", F.coalesce(F.sum("bytes").over(w), F.lit(0)).alias("prev_sum"))
    b = o.select("bytes", (F.col("prev_sum") / _COMPACT_TARGET).cast("long").alias("bin"))
    return (
        b.groupBy("bin")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("bytes").cast("long").alias("total_bytes"),
            F.round(F.sum("bytes") / F.lit(float(_COMPACT_TARGET)), 6).alias("fill_frac"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# a0196 — G.711 mu-law companding audit: the telephony/speech-corpus
# 8-bit codec, implemented bit-exactly as native integer expressions
# (segment = position of the highest set bit of |s|+bias, mantissa =
# the next 4 bits — no log(), no UDF, engine-identical). A synthetic
# s16 sine corpus is encoded, decoded, and the audit reports SNR and
# code-space usage per frequency — the quality check a speech pipeline
# runs before committing to 8-bit storage.
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def _ulaw_sql(s: str) -> str:
    """DuckDB expression: mu-law byte of int16 expression `s`."""
    mag = f"LEAST(ABS({s}), {_ULAW_CLIP}) + {_ULAW_BIAS}"
    seg = (
        f"(CASE WHEN {mag} >= 16384 THEN 7 WHEN {mag} >= 8192 THEN 6 "
        f"WHEN {mag} >= 4096 THEN 5 WHEN {mag} >= 2048 THEN 4 "
        f"WHEN {mag} >= 1024 THEN 3 WHEN {mag} >= 512 THEN 2 "
        f"WHEN {mag} >= 256 THEN 1 ELSE 0 END)"
    )
    mant = f"(({mag} >> ({seg} + 3)) & 15)"
    sign = f"(CASE WHEN {s} < 0 THEN 128 ELSE 0 END)"
    return f"(255 - ({sign} + {seg} * 16 + {mant}))"


def _ulaw_decode_sql(b: str) -> str:
    """DuckDB expression: int16 sample from mu-law byte expression."""
    u = f"(255 - {b})"
    seg = f"(({u} >> 4) & 7)"
    mant = f"({u} & 15)"
    mag = f"(((2 * {mant} + 33) << {seg}) - {_ULAW_BIAS})"
    return f"(CASE WHEN {u} >= 128 THEN -({mag}) ELSE {mag} END)"


def ulaw_encode(s):
    """mu-law byte of an int16 column — native integer expressions."""
    mag = F.least(F.abs(s), F.lit(_ULAW_CLIP)) + _ULAW_BIAS
    seg = (
        F.when(mag >= 16384, 7)
        .when(mag >= 8192, 6)
        .when(mag >= 4096, 5)
        .when(mag >= 2048, 4)
        .when(mag >= 1024, 3)
        .when(mag >= 512, 2)
        .when(mag >= 256, 1)
        .otherwise(0)
    )
    # dynamic right-shift via truncating division (shiftright needs a
    # literal count); values are small positives, so floor == shift
    mant = (mag.cast("long") / F.pow(F.lit(2), seg + 3).cast("long")).cast("long") % 16
    sign = F.when(s < 0, 128).otherwise(0)
    return 255 - (sign + seg * 16 + mant)


def ulaw_decode(b):
    """int16 sample from a mu-law byte column."""
    u = 255 - b
    seg = (u / 16).cast("long") % 8
    mant = u % 16
    mag = (2 * mant + 33) * F.pow(F.lit(2), seg).cast("long") - _ULAW_BIAS
    return F.when(u >= 128, -mag).otherwise(mag)


@query(
    "a0196_mulaw_codec_audit",
    oracle=f"""
    WITH g AS (SELECT f, k,
                      CAST(ROUND(24000 * sin(2 * pi() * f * k / 64.0)) AS BIGINT) AS s
               FROM (SELECT unnest([1, 3, 7]) AS f), (SELECT unnest(range(0, 256)) AS k)),
    e AS (SELECT f, k, s, {_ulaw_sql("s")} AS code FROM g),
    d AS (SELECT f, s, code, {_ulaw_decode_sql("code")} AS r FROM e)
    SELECT CAST(f AS BIGINT) AS freq, CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(COUNT(DISTINCT code) AS BIGINT) AS codes_used,
           ROUND(10 * log10(SUM(CAST(s AS DOUBLE) * s) /
                            NULLIF(SUM(CAST(s - r AS DOUBLE) * (s - r)), 0)), 6) AS snr_db,
           CAST(MAX(ABS(s - r)) AS BIGINT) AS max_abs_err
    FROM d GROUP BY f ORDER BY f
    """,
    description="G.711 mu-law companding audit (the telephony/speech-corpus 8-bit codec): bit-exact encode (bias, clip, segment = highest-set-bit bucket, 4-bit mantissa) and decode as NATIVE integer expressions — no log(), no UDF, engine-identical arithmetic; a synthetic s16 sine corpus per frequency is companded and the SNR, code-space usage, and worst-case reconstruction error are pinned — the storage-quality check a speech pipeline runs before committing to 8-bit audio",
)
def a0196_mulaw_codec_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    freqs = spark.range(1).select(F.explode(F.array(F.lit(1), F.lit(3), F.lit(7))).alias("f"))
    ks = spark.range(0, 256).select(F.col("id").alias("k"))
    g = freqs.crossJoin(ks).select(
        "f",
        "k",
        F.round(24000 * F.sin(2 * F.lit(3.141592653589793) * F.col("f") * F.col("k") / 64.0))
        .cast("long")
        .alias("s"),
    )
    e = g.select("f", "k", "s", ulaw_encode(F.col("s")).alias("code"))
    d = e.select("f", "s", "code", ulaw_decode(F.col("code")).alias("r"))
    err = (F.col("s") - F.col("r")).cast("double")
    return (
        d.groupBy("f")
        .agg(
            F.count("*").alias("n_samples"),
            F.countDistinct("code").alias("codes_used"),
            F.round(
                10
                * F.log10(
                    F.sum(F.col("s").cast("double") * F.col("s"))
                    / F.nullif(F.sum(err * err), F.lit(0.0))
                ),
                6,
            ).alias("snr_db"),
            F.max(F.abs(F.col("s") - F.col("r"))).cast("long").alias("max_abs_err"),
        )
        .select(
            F.col("f").cast("long").alias("freq"),
            "n_samples",
            F.col("codes_used").cast("long").alias("codes_used"),
            "snr_db",
            "max_abs_err",
        )
        .orderBy("freq")
    )
