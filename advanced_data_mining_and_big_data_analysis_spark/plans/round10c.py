"""Round-10 third+ waves (a0119-a0131, renamed from a0192+ at round
end for the window): Spark-4 SQL/API surface — Python
UDTFs, correlated LATERAL joins — plus lakehouse compaction planning
and a G.711 mu-law codec audit.

Renamed below a0133 at round end so the whole wave sits inside the
round-10 driver window; locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .dedup_text import _TOKS
from .registry import query

# ---------------------------------------------------------------------------
# a0119 (ex-a0192) — Python UDTF (Spark 4's pyspark.sql.functions.udtf), driven
# through its hardest shape: a LATERAL-correlated table function call
# in SQL, one invocation per input row. The UDTF emits a context-window
# chunk plan per document; eval() is a generator, so rows stream out
# Arrow-batched. The oracle reproduces the identical plan with
# generate_series — the hash pins the UDTF's row semantics, not just
# its schema.
# ---------------------------------------------------------------------------

_UDTF_CHUNK = 32


@query(
    "a0119_python_udtf_chunks",
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
def a0119_python_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
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
# a0120 (ex-a0193) — correlated LATERAL subquery with ORDER BY + LIMIT (Spark 4
# SQL): the per-row top-k dependent join, the SQL-standard form of
# "top 2 orders for every customer". Catalyst decorrelates it into a
# ranked window join, so the plan shards by the correlation key — the
# query pins both the SQL surface and the decorrelation semantics.
# ---------------------------------------------------------------------------


@query(
    "a0120_lateral_topk_join",
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
def a0120_lateral_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
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
# a0122 (ex-a0195) — compaction planning (the OPTIMIZE small-file problem): given
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
    "a0122_compaction_plan",
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
def a0122_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
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
# a0123 (ex-a0196) — G.711 mu-law companding audit: the telephony/speech-corpus
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
    "a0123_mulaw_codec_audit",
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
def a0123_mulaw_codec_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
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


# ---------------------------------------------------------------------------
# a0121 (ex-a0194) — GIF87a decode (operators/gif.py): real from-scratch LZW —
# variable-width codes, LSB-first packing, dictionary growth to 12 bits
# with CLEAR-reset, the cScSc decode case — plus container parsing
# (screen descriptor, global color table, sub-block framing). Closed-
# form palette-indexed fixtures are ENCODED with the same module's
# LZW compressor (genuine growing-dictionary streams, not the
# emit-clear-per-symbol shortcut) and decoded Arrow-batched in
# mapInPandas; the oracle recomputes per-image palette-average features
# straight from the generating formulas, so a wrong bit order, a broken
# dictionary reset, or a mis-parsed sub-block fails the hash.
# ---------------------------------------------------------------------------

_N_GIF = 10


@query(
    "a0121_gif_lzw_decode",
    oracle=f"""
    WITH g AS (SELECT m, 8 + m % 5 AS w, 6 + m % 4 AS h FROM range(0, {_N_GIF}) t(m)),
    px AS (SELECT g.m, g.w, g.h, (g.m + x.i + 2 * y.i) % 4 AS idx
           FROM g, range(0, 13) x(i), range(0, 10) y(i)
           WHERE x.i < g.w AND y.i < g.h),
    c AS (SELECT m, w, h,
                 (m * 29 + idx * 61) % 256 AS r,
                 (m * 31 + idx * 67) % 256 AS gg,
                 (m * 37 + idx * 71) % 256 AS b,
                 idx
          FROM px)
    SELECT CAST(m AS BIGINT) AS media_id, CAST(MAX(w) AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           ROUND(AVG(r), 6) AS avg_r, ROUND(AVG(gg), 6) AS avg_g,
           ROUND(AVG(b), 6) AS avg_b,
           CAST(MAX(CASE WHEN idx IS NOT NULL THEN 0 END) + (m % 4) AS BIGINT) AS topleft_idx
    FROM c GROUP BY m ORDER BY media_id
    """,
    description="GIF87a decode via a real from-scratch LZW codec (operators/gif.py: variable-width codes, LSB-first bit packing, dictionary growth to 12 bits with CLEAR-reset, the cScSc not-yet-in-table case, 255-byte sub-block framing) — fixtures are ENCODED by the same module's growing-dictionary compressor and decoded Arrow-batched in mapInPandas; the oracle recomputes per-image palette-average features from the generating formulas, so bit order, dictionary resets, and container parsing are all under the hash",
)
def a0121_gif_lzw_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from ..operators import gif as G

    # ship the codec module by value inside the pickled closure: the
    # decode runs in Python workers that may not have the repo on their
    # import path when the driver runs from a foreign cwd (same fix as
    # sources/warclite.py; gif.py is stdlib-only so by-value is safe)
    try:
        import sys as _sys

        from pyspark import cloudpickle as _cp

        _cp.register_pickle_by_value(_sys.modules[G.__name__])
    except Exception:
        pass

    rows = []
    for m in range(_N_GIF):
        w, h = 8 + m % 5, 6 + m % 4
        pal = [
            ((m * 29 + j * 61) % 256, (m * 31 + j * 67) % 256, (m * 37 + j * 71) % 256)
            for j in range(4)
        ]
        blob = G.make_gif(w, h, pal, lambda x, y, m=m: (m + x + 2 * y) % 4)
        rows.append((m, bytearray(blob)))
    media = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    ).repartition(4)

    def per_batch(batches):
        import pandas as pd

        for pdf in batches:
            feats = [G.decode_gif(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [int(f[0]) for f in feats],
                    "height": [int(f[1]) for f in feats],
                    "avg_r": [f[2] for f in feats],
                    "avg_g": [f[3] for f in feats],
                    "avg_b": [f[4] for f in feats],
                    "topleft_idx": [int(f[5]) for f in feats],
                }
            )

    out = media.mapInPandas(
        per_batch,
        schema=(
            "media_id long, width long, height long, "
            "avg_r double, avg_g double, avg_b double, topleft_idx long"
        ),
    )
    return out.select(
        "media_id",
        "width",
        "height",
        F.round("avg_r", 6).alias("avg_r"),
        F.round("avg_g", 6).alias("avg_g"),
        F.round("avg_b", 6).alias("avg_b"),
        "topleft_idx",
    ).orderBy("media_id")


# ---------------------------------------------------------------------------
# a0124 (ex-a0197) — Kaplan-Meier survival estimator: the right-censored
# time-to-event curve (user "lifetime" = first->last event span;
# censored if the user was still active in the observation window's
# final day). S(t) = prod over death times t_i <= t of (1 - d_i/n_i),
# computed relationally as exp(cumsum(ln(1 - d/n))) over the per-cohort
# death-time frame — windows PARTITIONED by cohort and bounded by the
# number of distinct durations. Durations are hour-boundary counts
# spelled out as (days*24 + hour-part delta) so both engines do the
# identical integer arithmetic (date_diff('hour') and timestampdiff
# disagree on sub-hour offsets).
# ---------------------------------------------------------------------------


@query(
    "a0124_kaplan_meier",
    oracle="""
    WITH w AS (SELECT MAX(ts) AS obs_end FROM events),
    u AS (SELECT user_id % 2 = 0 AS cohort_a, MIN(ts) AS t0, MAX(ts) AS t1
          FROM events GROUP BY user_id),
    d AS (SELECT cohort_a,
                 (CAST(t1 AS DATE) - CAST(t0 AS DATE)) * 24
                 + (EXTRACT(hour FROM t1) - EXTRACT(hour FROM t0)) AS dur_h,
                 CASE WHEN t1 >= obs_end - INTERVAL 24 HOURS THEN 0 ELSE 1 END AS observed
          FROM u CROSS JOIN w),
    ev AS (SELECT cohort_a, dur_h, COUNT(*) AS d_i
           FROM d WHERE observed = 1 GROUP BY cohort_a, dur_h),
    risk AS (SELECT ev.cohort_a, ev.dur_h, ev.d_i,
                    (SELECT COUNT(*) FROM d WHERE d.cohort_a = ev.cohort_a
                     AND d.dur_h >= ev.dur_h) AS n_i
             FROM ev),
    km AS (SELECT cohort_a, dur_h, d_i, n_i,
                  exp(SUM(ln(1 - d_i * 1.0 / n_i))
                      OVER (PARTITION BY cohort_a ORDER BY dur_h
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
           FROM risk),
    top AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cohort_a ORDER BY dur_h) AS rk FROM km)
    SELECT cohort_a, CAST(dur_h AS BIGINT) AS dur_h, CAST(n_i AS BIGINT) AS n_risk,
           CAST(d_i AS BIGINT) AS n_events, ROUND(s, 6) AS survival
    FROM top WHERE rk <= 12 ORDER BY cohort_a, dur_h
    """,
    description="Kaplan-Meier survival estimator with right censoring (user lifetime = first-to-last event span in hour-boundary counts; censored if still active in the window's last day): S(t) = prod (1 - d_i/n_i) computed as exp(cumsum(ln)) over the per-cohort death-time frame, at-risk counts via a duration-keyed correlated count — windows PARTITIONED by cohort, bounded by distinct durations; first 12 curve points per user_id-parity cohort pinned",
)
def a0124_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = ev.agg(F.max("ts").alias("obs_end"))
    u = ev.groupBy("user_id").agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    d = u.crossJoin(F.broadcast(w)).select(
        (F.col("user_id") % 2 == 0).alias("cohort_a"),
        (
            F.datediff(F.to_date("t1"), F.to_date("t0")) * 24
            + (F.hour("t1") - F.hour("t0"))
        ).alias("dur_h"),
        F.when(F.col("t1") >= F.col("obs_end") - F.expr("INTERVAL 24 HOURS"), 0)
        .otherwise(1)
        .alias("observed"),
    )
    d = d.localCheckpoint(eager=False)  # death-time agg + at-risk probe
    evt = d.filter(F.col("observed") == 1).groupBy("cohort_a", "dur_h").agg(
        F.count("*").alias("d_i")
    )
    # at-risk via a cohort-local suffix count: total minus count(dur < t)
    # — computed with one cumulative window over the DISTINCT duration
    # frame instead of a correlated per-row subquery
    all_durs = d.groupBy("cohort_a", "dur_h").agg(F.count("*").alias("c"))
    tot = d.groupBy("cohort_a").agg(F.count("*").alias("n_tot"))
    wcum = (
        Window.partitionBy("cohort_a")
        .orderBy("dur_h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk_frame = all_durs.select(
        "cohort_a",
        "dur_h",
        F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("n_before"),
    ).join(tot, "cohort_a")
    risk = evt.join(risk_frame, ["cohort_a", "dur_h"]).select(
        "cohort_a", "dur_h", "d_i", (F.col("n_tot") - F.col("n_before")).alias("n_i")
    )
    wkm = (
        Window.partitionBy("cohort_a").orderBy("dur_h").rowsBetween(Window.unboundedPreceding, 0)
    )
    km = risk.withColumn(
        "s", F.exp(F.sum(F.log(1 - F.col("d_i") / F.col("n_i"))).over(wkm))
    )
    top = km.withColumn(
        "rk", F.row_number().over(Window.partitionBy("cohort_a").orderBy("dur_h"))
    ).filter(F.col("rk") <= 12)
    return top.select(
        "cohort_a",
        F.col("dur_h").cast("long").alias("dur_h"),
        F.col("n_i").cast("long").alias("n_risk"),
        F.col("d_i").cast("long").alias("n_events"),
        F.round("s", 6).alias("survival"),
    ).orderBy("cohort_a", "dur_h")


# ---------------------------------------------------------------------------
# a0125 (ex-a0198) — marketing attribution (first-touch vs last-touch): every
# purchase is credited to the user's first / most recent preceding
# non-purchase touchpoint, both via one IGNORE-NULLS window frame
# PARTITIONED by user (rows unbounded-preceding..1-preceding) — the
# conversion-credit models a growth team reads side by side. Purchases
# with no preceding touch fall into the '(none)' channel.
# ---------------------------------------------------------------------------


@query(
    "a0125_touch_attribution",
    oracle="""
    WITH s AS (SELECT user_id, ts, event_id, event_type,
                      CASE WHEN event_type <> 'purchase' THEN event_type END AS touch
               FROM events),
    p AS (SELECT user_id, ts, event_id, event_type,
                 LAST_VALUE(touch IGNORE NULLS) OVER wf AS last_touch,
                 FIRST_VALUE(touch IGNORE NULLS) OVER wf AS first_touch
          FROM s
          WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    conv AS (SELECT COALESCE(last_touch, '(none)') AS last_touch,
                    COALESCE(first_touch, '(none)') AS first_touch
             FROM p WHERE event_type = 'purchase'),
    lt AS (SELECT last_touch AS channel, COUNT(*) AS n_last FROM conv GROUP BY last_touch),
    ft AS (SELECT first_touch AS channel, COUNT(*) AS n_first FROM conv GROUP BY first_touch)
    SELECT COALESCE(lt.channel, ft.channel) AS channel,
           CAST(COALESCE(n_last, 0) AS BIGINT) AS n_last_touch,
           CAST(COALESCE(n_first, 0) AS BIGINT) AS n_first_touch
    FROM lt FULL OUTER JOIN ft ON lt.channel = ft.channel
    ORDER BY channel
    """,
    description="marketing attribution (first-touch vs last-touch conversion credit): every purchase credited to the user's first and most recent preceding non-purchase touchpoint via ONE ignore-nulls window frame PARTITIONED by user (unbounded..1-preceding); per-channel credit counts under both models side by side, '(none)' for touchless purchases — full outer join of the two credit rollups",
)
def a0125_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") != "purchase", F.col("event_type")).alias("touch"),
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = s.select(
        "event_type",
        F.last("touch", ignorenulls=True).over(wf).alias("last_touch"),
        F.first("touch", ignorenulls=True).over(wf).alias("first_touch"),
    )
    conv = p.filter(F.col("event_type") == "purchase").select(
        F.coalesce("last_touch", F.lit("(none)")).alias("last_touch"),
        F.coalesce("first_touch", F.lit("(none)")).alias("first_touch"),
    )
    conv = conv.localCheckpoint(eager=False)
    lt = conv.groupBy(F.col("last_touch").alias("channel")).agg(F.count("*").alias("n_last"))
    ft = conv.groupBy(F.col("first_touch").alias("channel")).agg(F.count("*").alias("n_first"))
    return (
        lt.join(ft, "channel", "full")
        .select(
            "channel",
            F.coalesce("n_last", F.lit(0)).cast("long").alias("n_last_touch"),
            F.coalesce("n_first", F.lit(0)).cast("long").alias("n_first_touch"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# a0126 (ex-a0199) — isotonic calibration (pool-adjacent-violators): Spark ML's
# distributed IsotonicRegression (parallel PAV on sorted partitions +
# driver merge of boundary violations) fit on a deterministic score →
# outcome fixture with real violations to pool. Output is the fitted
# step function (boundary, prediction) — the calibration map a scoring
# service ships. The pooling RECURSION has no bounded SQL unrolling,
# but the isotonic FIT has a closed-form minimax characterization
#   fit[i] = max_{s<=i} min_{t>=i} mean(y[s..t])
# (Robertson/Wright/Dykstra, "Order Restricted Statistical Inference"),
# which IS SQL-expressible via prefix sums + an O(n^3) segment CTE —
# trivial for DuckDB at the fixture's n=200 — so this carries a full
# value-hash oracle; the step function is recovered by grouping runs
# of equal fitted values and emitting each block's min/max score.
# Exact values are additionally pinned by tests/test_round10_ops.py
# against a from-scratch reference PAV (1e-9 agreement).
# ---------------------------------------------------------------------------

_ISO_N = 200

_ISO_ORACLE = f"""
WITH pts AS (
  SELECT i, i / {_ISO_N - 1}.0 AS x,
         0.6 * (i / {_ISO_N - 1}.0) + 0.4 * (((i * 2654435761) % 97) / 96.0) AS y
  FROM range({_ISO_N}) t(i)
),
pref AS (SELECT i, x, y, SUM(y) OVER (ORDER BY i) AS p FROM pts),
seg AS (
  SELECT a.i AS s, b.i AS t, (b.p - a.p + a.y) / (b.i - a.i + 1) AS avg_y
  FROM pref a JOIN pref b ON a.i <= b.i
),
inner_min AS (
  SELECT seg.s, pts.i, MIN(seg.avg_y) AS mn
  FROM seg JOIN pts ON seg.s <= pts.i AND pts.i <= seg.t
  GROUP BY seg.s, pts.i
),
fit AS (SELECT i, MAX(mn) AS fit_y FROM inner_min GROUP BY i),
pf AS (SELECT f.i, p.x, f.fit_y FROM fit f JOIN pts p USING(i)),
lagged AS (
  SELECT i, x, fit_y,
         CASE WHEN ABS(fit_y - LAG(fit_y) OVER (ORDER BY i)) < 1e-12
              THEN 0 ELSE 1 END AS is_new
  FROM pf
),
blk AS (SELECT i, x, fit_y, SUM(is_new) OVER (ORDER BY i) AS block_id FROM lagged),
bounds AS (
  SELECT block_id, MIN(x) AS xa, MAX(x) AS xb, MIN(fit_y) AS fy
  FROM blk GROUP BY block_id
),
steps AS (
  SELECT xa AS boundary, fy AS prediction FROM bounds
  UNION ALL
  SELECT xb, fy FROM bounds WHERE xb <> xa
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY boundary) - 1 AS BIGINT) AS step_idx,
       ROUND(boundary, 6) AS boundary, ROUND(prediction, 6) AS prediction
FROM steps ORDER BY step_idx
"""


def _iso_fixture_rows():
    """Deterministic (score, outcome) points with genuine violations:
    a monotone trend plus a hash-derived non-monotone residue."""
    rows = []
    for i in range(_ISO_N):
        x = i / (_ISO_N - 1)
        noise = ((i * 2654435761) % 97) / 96.0
        y = 0.6 * x + 0.4 * noise
        rows.append((float(x), float(y)))
    return rows


@query(
    "a0126_isotonic_calibration",
    oracle=_ISO_ORACLE,
    description="isotonic calibration via distributed pool-adjacent-violators (pyspark.ml IsotonicRegression: parallel PAV over sorted partitions, driver merge of boundary violations) on a deterministic score->outcome fixture with genuine violations; returns the fitted monotone step function (boundary, prediction) — the calibration map a scoring service ships; full value-hash oracle via the minimax identity fit[i]=max_{s<=i} min_{t>=i} mean(y[s..t]) (prefix sums + O(n^3) segment CTE at n=200), plus a from-scratch reference PAV pin in pytest (1e-9 agreement)",
)
def a0126_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    df = spark.createDataFrame(_iso_fixture_rows(), ["score", "label"])
    va = VectorAssembler(inputCols=["score"], outputCol="features")
    model = IsotonicRegression(featuresCol="features", labelCol="label").fit(va.transform(df))
    # boundaries/predictions are the model's bounded step-function
    # parameters (<= n distinct pooled levels), not data
    bounds = [float(b) for b in model.boundaries]
    preds = [float(p) for p in model.predictions]
    out = spark.createDataFrame(
        list(zip(range(len(bounds)), bounds, preds)), ["step_idx", "boundary", "prediction"]
    )
    return out.select(
        F.col("step_idx").cast("long").alias("step_idx"),
        F.round("boundary", 6).alias("boundary"),
        F.round("prediction", 6).alias("prediction"),
    ).orderBy("step_idx")


# ---------------------------------------------------------------------------
# a0127 (ex-a0200) — tokenizer vocabulary coverage audit: given a fixed top-K
# vocabulary (the deployment artifact), measure per source what a real
# tokenizer eval measures — OOV token rate, OOV type rate, covered
# corpus mass, and chars-per-token. The vocab frame is top-K by
# (count desc, token) — deterministic — and broadcasts; the audit is
# one token-keyed left join + per-source aggregate.
# ---------------------------------------------------------------------------

_VOCAB_K = 24


@query(
    "a0127_vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT source, unnest({_TOKS}) AS tok FROM documents),
    vc AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    vocab AS (SELECT tok FROM vc ORDER BY cnt DESC, tok LIMIT {_VOCAB_K}),
    j AS (SELECT t.source, t.tok, v.tok IS NOT NULL AS in_vocab
          FROM tok t LEFT JOIN vocab v ON t.tok = v.tok)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
           ROUND(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) * 1.0 / COUNT(*), 6) AS oov_rate,
           CAST(COUNT(DISTINCT CASE WHEN NOT in_vocab THEN tok END) AS BIGINT) AS n_oov_types,
           ROUND(SUM(CASE WHEN in_vocab THEN LENGTH(tok) ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN in_vocab THEN 1 ELSE 0 END), 0), 6) AS chars_per_covered_token
    FROM j GROUP BY source ORDER BY source
    """,
    description="tokenizer vocabulary coverage audit against a fixed deterministic top-K vocab (the deployment artifact): per-source OOV token rate, OOV type count, and chars-per-covered-token — what a tokenizer eval reports before shipping a vocab; top-K frame broadcasts, audit is one token-keyed left join + per-source aggregate",
)
def a0127_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(X.tokens("text")).alias("tok")).localCheckpoint(
        eager=False
    )
    vocab = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(_VOCAB_K)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    j = tok.join(F.broadcast(vocab), "tok", "left").select(
        "source", "tok", F.coalesce("in_vocab", F.lit(False)).alias("in_vocab")
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum((~F.col("in_vocab")).cast("long")).alias("n_oov"),
            F.round(F.sum((~F.col("in_vocab")).cast("long")) / F.count("*"), 6).alias("oov_rate"),
            F.countDistinct(F.when(~F.col("in_vocab"), F.col("tok"))).alias("n_oov_types"),
            F.round(
                F.sum(F.when(F.col("in_vocab"), F.length("tok")).otherwise(0))
                / F.nullif(F.sum(F.col("in_vocab").cast("long")), F.lit(0)),
                6,
            ).alias("chars_per_covered_token"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# a0129 (ex-a0202) — in-batch negative audit (contrastive training prep): docs are
# hash-assigned to batches of ~8; within a batch every ordered pair is
# an (anchor, negative) candidate, and pairs sharing a source are FALSE
# negatives — the collision rate this audit measures is exactly the
# quantity in-batch-negative training quietly degrades on. Pair
# generation is batch-local (8 rows -> 56 pairs), never corpus-
# quadratic; batch ids are md5-derived so the plan is epoch- and
# partitioning-stable.
# ---------------------------------------------------------------------------

_NEG_BATCH = 8


@query(
    "a0129_inbatch_negatives",
    oracle=f"""
    WITH d AS (SELECT doc_id, source,
                      CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                          % {_NEG_BATCH} AS slot,
                      CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 9, 8)) AS BIGINT)
                          AS ord
               FROM documents),
    b AS (SELECT doc_id, source,
                 CAST(ROW_NUMBER() OVER (ORDER BY slot, ord, doc_id) - 1 AS BIGINT)
                     // {_NEG_BATCH} AS batch
          FROM d),
    p AS (SELECT a.batch, a.source AS src_a, bb.source AS src_b,
                 a.source = bb.source AS collision
          FROM b a JOIN b bb ON a.batch = bb.batch AND a.doc_id <> bb.doc_id)
    SELECT CAST(COUNT(DISTINCT batch) AS BIGINT) AS n_batches,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN collision THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negatives,
           ROUND(SUM(CASE WHEN collision THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
               AS false_negative_rate
    FROM p
    """,
    description="in-batch negative sampling audit (contrastive training prep): docs hash-assigned to batches of 8 (md5-derived slot+order, epoch- and partitioning-stable), every ordered in-batch pair an (anchor, negative) candidate; pairs sharing a source are FALSE negatives and the audit pins the batch count, pair count, and false-negative collision rate — pair generation is batch-local (56 pairs per batch), never corpus-quadratic",
)
def a0129_inbatch_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
            % _NEG_BATCH
        ).alias("slot"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 9, 8), 16, 10)
        .cast("long")
        .alias("ord"),
    )
    # NOTE: the global row_number is the oracle-parity formulation at
    # test scale; at cluster scale batches come straight from the hash
    # (batch = md5 mod n_batches) with no global sort — the audit's
    # statistics are identical in distribution.
    b = d.select(
        "doc_id",
        "source",
        ((F.row_number().over(Window.orderBy("slot", "ord", "doc_id")) - 1) / _NEG_BATCH)
        .cast("long")
        .alias("batch"),
    )
    p = (
        b.alias("a")
        .join(
            b.alias("bb"),
            (F.col("a.batch") == F.col("bb.batch")) & (F.col("a.doc_id") != F.col("bb.doc_id")),
        )
        .select(
            F.col("a.batch").alias("batch"),
            (F.col("a.source") == F.col("bb.source")).alias("collision"),
        )
    )
    return p.agg(
        F.countDistinct("batch").alias("n_batches"),
        F.count("*").alias("n_pairs"),
        F.sum(F.col("collision").cast("long")).alias("n_false_negatives"),
        F.round(F.sum(F.col("collision").cast("long")) / F.count("*"), 6).alias(
            "false_negative_rate"
        ),
    )


# ---------------------------------------------------------------------------
# a0131 (ex-a0204) — curriculum sharding: order the corpus by a quality score and
# cut it into k curriculum shards (easy -> hard), verifying the
# property curriculum training needs — monotone mean quality across
# shards — plus per-shard source mixture entropy (a curriculum that
# accidentally sorts by source would collapse the mixture). Ranking
# via ntile over the score ordering; everything else is per-shard
# aggregates.
# ---------------------------------------------------------------------------

_CURR_SHARDS = 5


@query(
    "a0131_curriculum_shards",
    oracle=f"""
    WITH s AS (SELECT doc_id, source, n_chars,
                      (CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
                       % 1000) / 1000.0 + n_chars / 1000.0 AS quality,
                      NTILE({_CURR_SHARDS}) OVER (ORDER BY
                        (CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
                         % 1000) / 1000.0 + n_chars / 1000.0, doc_id) AS shard
               FROM documents),
    m AS (SELECT shard, source, COUNT(*) AS c FROM s GROUP BY shard, source),
    tot AS (SELECT shard, CAST(SUM(c) AS DOUBLE) AS n FROM m GROUP BY shard),
    ent AS (SELECT m.shard, -SUM((c / n) * ln(c / n)) AS h
            FROM m JOIN tot ON m.shard = tot.shard GROUP BY m.shard)
    SELECT CAST(s.shard AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(quality), 6) AS mean_quality,
           ROUND(MIN(quality), 6) AS min_quality,
           ROUND(MAX(quality), 6) AS max_quality,
           ROUND(MAX(ent.h), 6) AS source_entropy
    FROM s JOIN ent ON s.shard = ent.shard
    GROUP BY s.shard ORDER BY s.shard
    """,
    description="curriculum sharding (easy->hard training-order prep): corpus ranked by a deterministic quality score (hash jitter + length term) and cut into 5 ntile shards; per-shard mean/min/max quality pins the monotone-difficulty property curriculum training needs, and per-shard source-mixture entropy pins that the curriculum does not collapse the source mix; one ntile window over the score ordering, per-shard aggregates otherwise",
)
def a0131_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    quality = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast("long")
        % 1000
    ) / 1000.0 + F.col("n_chars") / 1000.0
    s = docs.select(
        "doc_id",
        "source",
        quality.alias("quality"),
        F.ntile(_CURR_SHARDS).over(Window.orderBy(quality, "doc_id")).alias("shard"),
    ).localCheckpoint(eager=False)
    m = s.groupBy("shard", "source").agg(F.count("*").alias("c"))
    tot = m.groupBy("shard").agg(F.sum("c").cast("double").alias("n"))
    pr = F.col("c") / F.col("n")
    ent = (
        m.join(tot, "shard")
        .select("shard", (-pr * F.log(pr)).alias("plp"))
        .groupBy("shard")
        .agg(F.sum("plp").alias("h"))
    )
    return (
        s.join(ent, "shard")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality"), 6).alias("mean_quality"),
            F.round(F.min("quality"), 6).alias("min_quality"),
            F.round(F.max("quality"), 6).alias("max_quality"),
            F.round(F.max("h"), 6).alias("source_entropy"),
        )
        .select(
            F.col("shard").cast("long").alias("shard"),
            "n_docs",
            "mean_quality",
            "min_quality",
            "max_quality",
            "source_entropy",
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# a0128 (ex-a0201) — span-corruption masking plan (T5/UL2 denoising prep): for
# every document, a deterministic plan of non-overlapping mask spans at
# 15% corruption rate with mean span 3 — the doc is cut into n_spans
# strata, each stratum hosts one span whose offset comes from
# md5(doc_id, span_idx), so the plan is epoch- and engine-stable and
# spans can never overlap by construction. One bounded explode per doc
# (n_spans rows), per-source rollup pinned.
# ---------------------------------------------------------------------------

_SC_RATE_NUM, _SC_RATE_DEN = 15, 100  # 15% corruption
_SC_MEAN_SPAN = 3


@query(
    "a0128_span_corruption_plan",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, len({_TOKS}) AS n_tok FROM documents),
    p AS (SELECT doc_id, source, n_tok,
                 (n_tok * {_SC_RATE_NUM}) // {_SC_RATE_DEN} AS n_corrupt
          FROM d WHERE n_tok >= 8),
    q AS (SELECT *, CAST(CEIL(n_corrupt * 1.0 / {_SC_MEAN_SPAN}) AS BIGINT) AS n_spans
          FROM p WHERE n_corrupt > 0),
    sp AS (SELECT doc_id, source, n_tok, n_corrupt, n_spans, CAST(i AS BIGINT) AS i,
                  (i * n_tok) // n_spans AS st,
                  ((i + 1) * n_tok) // n_spans AS en,
                  n_corrupt // n_spans
                  + CASE WHEN i < n_corrupt % n_spans THEN 1 ELSE 0 END AS want_len
           FROM q, unnest(range(0, 100)) t(i) WHERE i < n_spans),
    s2 AS (SELECT doc_id, source, i, st, en,
                  LEAST(want_len, en - st) AS span_len,
                  st + CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#'
                                                   || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT)
                       % GREATEST(1, en - st - LEAST(want_len, en - st) + 1) AS span_start
           FROM sp),
    agg AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_spans,
                   CAST(SUM(span_len) AS BIGINT) AS total_masked
            FROM s2 GROUP BY source),
    tok AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
            FROM p GROUP BY source)
    SELECT agg.source, CAST(n_docs AS BIGINT) AS n_docs, CAST(agg.n_spans AS BIGINT) AS n_spans,
           total_masked, ROUND(total_masked * 1.0 / total_tokens, 6) AS mask_rate,
           ROUND(total_masked * 1.0 / agg.n_spans, 6) AS avg_span_len
    FROM agg JOIN tok ON agg.source = tok.source ORDER BY agg.source
    """,
    description="span-corruption masking plan (T5/UL2 denoising prep): deterministic non-overlapping mask spans at 15% corruption / mean span 3 — each doc cut into n_spans strata, one span per stratum with an md5(doc_id, span_idx)-derived offset, so the plan is epoch- and engine-stable and overlap is impossible by construction; one bounded per-doc explode, per-source span/mask-rate rollup pinned",
)
def a0128_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "source", F.size(X.tokens("text")).alias("n_tok"))
    p = d.filter(F.col("n_tok") >= 8).select(
        "doc_id",
        "source",
        "n_tok",
        ((F.col("n_tok") * _SC_RATE_NUM) / _SC_RATE_DEN).cast("long").alias("n_corrupt"),
    )
    p = p.localCheckpoint(eager=False)  # span plan + token totals
    q = p.filter(F.col("n_corrupt") > 0).withColumn(
        "n_spans", F.ceil(F.col("n_corrupt") / _SC_MEAN_SPAN).cast("long")
    )
    sp = q.select(
        "doc_id",
        "source",
        "n_tok",
        "n_corrupt",
        "n_spans",
        F.explode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("i"),
    ).select(
        "doc_id",
        "source",
        "i",
        ((F.col("i") * F.col("n_tok")) / F.col("n_spans")).cast("long").alias("st"),
        (((F.col("i") + 1) * F.col("n_tok")) / F.col("n_spans")).cast("long").alias("en"),
        (
            (F.col("n_corrupt") / F.col("n_spans")).cast("long")
            + F.when(F.col("i") < F.col("n_corrupt") % F.col("n_spans"), 1).otherwise(0)
        ).alias("want_len"),
    )
    span_len = F.least(F.col("want_len"), F.col("en") - F.col("st"))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#"), F.col("i").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    s2 = sp.select(
        "doc_id",
        "source",
        span_len.alias("span_len"),
        (
            F.col("st")
            + h % F.greatest(F.lit(1), F.col("en") - F.col("st") - span_len + 1)
        ).alias("span_start"),
    )
    agg = s2.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_spans"),
        F.sum("span_len").cast("long").alias("total_masked"),
    )
    tok = p.groupBy("source").agg(F.sum("n_tok").cast("long").alias("total_tokens"))
    return (
        agg.join(tok, "source")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_spans").cast("long").alias("n_spans"),
            "total_masked",
            F.round(F.col("total_masked") / F.col("total_tokens"), 6).alias("mask_rate"),
            F.round(F.col("total_masked") / F.col("n_spans"), 6).alias("avg_span_len"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# a0130 (ex-a0203) — Fellegi-Sunter record-linkage scoring: a deterministically
# dirtied copy of the customer table (name truncated / acctbal nudged /
# segment swapped on modular subsets) is linked back to the clean table
# within nation blocks. Field agreement vectors -> m/u probabilities
# (P(agree | match) / P(agree | non-match), estimated from the
# ground-truth custkey labels; production uses EM, the scoring algebra
# is identical) -> per-pair log2 match weight, with the match/non-match
# separation at threshold 0 pinned. Pairs are block-local (nationkey),
# never a global cross product.
# ---------------------------------------------------------------------------


@query(
    "a0130_fellegi_sunter",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey AS d_key, c_nationkey AS d_nat,
             CASE WHEN c_custkey % 7 = 0 THEN substr(c_name, 1, LENGTH(c_name) - 1)
                  ELSE c_name END AS d_name,
             CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 77.0 ELSE c_acctbal END AS d_bal,
             CASE WHEN c_custkey % 11 = 0 THEN 'SWAPPED' ELSE c_mktsegment END AS d_seg
      FROM customer),
    pairs AS (
      SELECT c.c_custkey = d.d_key AS is_match,
             (c.c_name = d.d_name) AS a_name,
             (FLOOR(c.c_acctbal / 100) = FLOOR(d.d_bal / 100)) AS a_bal,
             (c.c_mktsegment = d.d_seg) AS a_seg
      FROM customer c JOIN dirty d ON c.c_nationkey = d.d_nat),
    mu AS (
      SELECT AVG(CASE WHEN is_match AND a_name THEN 1.0 WHEN is_match THEN 0.0 END) AS m_name,
             AVG(CASE WHEN NOT is_match AND a_name THEN 1.0 WHEN NOT is_match THEN 0.0 END) AS u_name,
             AVG(CASE WHEN is_match AND a_bal THEN 1.0 WHEN is_match THEN 0.0 END) AS m_bal,
             AVG(CASE WHEN NOT is_match AND a_bal THEN 1.0 WHEN NOT is_match THEN 0.0 END) AS u_bal,
             AVG(CASE WHEN is_match AND a_seg THEN 1.0 WHEN is_match THEN 0.0 END) AS m_seg,
             AVG(CASE WHEN NOT is_match AND a_seg THEN 1.0 WHEN NOT is_match THEN 0.0 END) AS u_seg
      FROM pairs),
    eps AS (SELECT 1e-6 AS e FROM (VALUES (1)) v(x)),
    w AS (
      SELECT is_match,
             (CASE WHEN a_name THEN ln(GREATEST(m_name, e) / GREATEST(u_name, e))
                   ELSE ln(GREATEST(1 - m_name, e) / GREATEST(1 - u_name, e)) END
              + CASE WHEN a_bal THEN ln(GREATEST(m_bal, e) / GREATEST(u_bal, e))
                     ELSE ln(GREATEST(1 - m_bal, e) / GREATEST(1 - u_bal, e)) END
              + CASE WHEN a_seg THEN ln(GREATEST(m_seg, e) / GREATEST(u_seg, e))
                     ELSE ln(GREATEST(1 - m_seg, e) / GREATEST(1 - u_seg, e)) END) / ln(2)
                 AS weight
      FROM pairs CROSS JOIN mu CROSS JOIN eps)
    SELECT is_match, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN weight > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_above_zero,
           ROUND(AVG(weight), 6) AS avg_weight,
           ROUND(MIN(weight), 6) AS min_weight,
           ROUND(MAX(weight), 6) AS max_weight
    FROM w GROUP BY is_match ORDER BY is_match
    """,
    description="Fellegi-Sunter record-linkage scoring: a deterministically dirtied customer copy (name truncation / acctbal nudge / segment swap on modular subsets) linked within nation blocks; per-field agreement vectors -> m/u probabilities (from ground-truth labels; EM in production, identical scoring algebra) -> per-pair log2 match weights, epsilon-floored; match vs non-match weight separation at threshold 0 pinned; candidate pairs are BLOCK-local (nationkey), never a global cross product",
)
def a0130_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    dirty = c.select(
        F.col("c_custkey").alias("d_key"),
        F.col("c_nationkey").alias("d_nat"),
        F.when(
            F.col("c_custkey") % 7 == 0,
            F.expr("substr(c_name, 1, length(c_name) - 1)"),
        )
        .otherwise(F.col("c_name"))
        .alias("d_name"),
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 77.0)
        .otherwise(F.col("c_acctbal"))
        .alias("d_bal"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit("SWAPPED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("d_seg"),
    )
    pairs = c.join(dirty, c["c_nationkey"] == dirty["d_nat"]).select(
        (F.col("c_custkey") == F.col("d_key")).alias("is_match"),
        (F.col("c_name") == F.col("d_name")).alias("a_name"),
        (F.floor(F.col("c_acctbal") / 100) == F.floor(F.col("d_bal") / 100)).alias("a_bal"),
        (F.col("c_mktsegment") == F.col("d_seg")).alias("a_seg"),
    )
    pairs = pairs.localCheckpoint(eager=False)  # m/u estimation + scoring

    def m_u(f: str):
        m = F.avg(
            F.when(F.col("is_match") & F.col(f), 1.0).when(F.col("is_match"), 0.0)
        ).alias(f"m_{f}")
        u = F.avg(
            F.when(~F.col("is_match") & F.col(f), 1.0).when(~F.col("is_match"), 0.0)
        ).alias(f"u_{f}")
        return m, u

    aggs = [x for f in ("a_name", "a_bal", "a_seg") for x in m_u(f)]
    mu = pairs.agg(*aggs)
    e = F.lit(1e-6)

    def w_field(f: str):
        m, u = F.col(f"m_{f}"), F.col(f"u_{f}")
        return F.when(
            F.col(f), F.log(F.greatest(m, e) / F.greatest(u, e))
        ).otherwise(F.log(F.greatest(1 - m, e) / F.greatest(1 - u, e)))

    weight = (w_field("a_name") + w_field("a_bal") + w_field("a_seg")) / F.log(F.lit(2.0))
    w = pairs.crossJoin(F.broadcast(mu)).select("is_match", weight.alias("weight"))
    return (
        w.groupBy("is_match")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum((F.col("weight") > 0).cast("long")).alias("n_above_zero"),
            F.round(F.avg("weight"), 6).alias("avg_weight"),
            F.round(F.min("weight"), 6).alias("min_weight"),
            F.round(F.max("weight"), 6).alias("max_weight"),
        )
        .orderBy("is_match")
    )
