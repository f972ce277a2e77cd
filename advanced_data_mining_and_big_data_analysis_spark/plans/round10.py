"""Round-10 declared queries, wave 1 (a0134-a0143 + a0106-a0109,
the latter renamed from a0179-a0182 at round end for the window).

Fourteen operators extending the SURVEY §2 + LLM-pipeline surface:
sorted-neighborhood dedup, Kneser-Ney bigram LM, binned two-sample KS
drift, ANSI regression aggregates, HLL set-operation estimates,
time-series gap-fill with linear interpolation, n-gram overlap
decontamination, int4 embedding quantization, the end-to-end flagship
corpus pipeline, applyInArrow parity, Pareto skyline, entropy
profiling, PMI co-occurrence, and a delta/RLE encoding audit.

Naming: 4-digit a0NNN_ names sort before the round-8 a0NN_ block, so
this file plus a0133 + the round-9 block fills the driver's
sorted()[:50] correctness window exactly (see
tests/test_declared_queries.py::test_driver_window_is_exactly_the_renamed_block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .dedup_text import _TOKS
from .registry import query

# ---------------------------------------------------------------------------
# a0136 — two-sample Kolmogorov-Smirnov drift test, binned formulation.
#
# The drift monitor a feature store runs between a reference and a
# live window. The statistic is computed over a FIXED equi-width
# binning (1024 bins spanning the pooled min/max) rather than raw
# float order statistics: the binned CDF needs one bounded-width
# cumulative window (1024 rows) instead of a global sort of every
# observation — the scale-correct shape (a raw-value KS at 100 TB
# funnels the whole table through one unpartitioned sort; the binned
# statistic converges to it from below as the grid refines and is the
# standard streaming/histogram implementation). Bin edges are integer
# arithmetic on the pooled range, so both engines bin identically.
# ---------------------------------------------------------------------------

_KS_BINS = 1024


@query(
    "a0136_ks_drift_test",
    oracle=f"""
    WITH pool AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
                  WHERE event_type IN ('view', 'click')),
    b AS (SELECT event_type,
                 LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / {_KS_BINS}.0)) AS BIGINT),
                       {_KS_BINS - 1}) AS bin
          FROM events CROSS JOIN pool WHERE event_type IN ('view', 'click')),
    c AS (SELECT bin,
                 COUNT(*) FILTER (WHERE event_type = 'view') AS n_v,
                 COUNT(*) FILTER (WHERE event_type = 'click') AS n_c
          FROM b GROUP BY bin),
    t AS (SELECT CAST(SUM(n_v) AS DOUBLE) AS tot_v, CAST(SUM(n_c) AS DOUBLE) AS tot_c FROM c),
    cdf AS (SELECT bin,
                   SUM(n_v) OVER (ORDER BY bin) / tot_v AS f_v,
                   SUM(n_c) OVER (ORDER BY bin) / tot_c AS f_c
            FROM c CROSS JOIN t),
    d AS (SELECT MAX(ABS(f_v - f_c)) AS ks FROM cdf)
    SELECT 'view_vs_click' AS pair,
           CAST(tot_v AS BIGINT) AS n_a, CAST(tot_c AS BIGINT) AS n_b,
           ROUND(ks, 6) AS ks_stat,
           ks > 1.358 * sqrt((tot_v + tot_c) / (tot_v * tot_c)) AS drift_at_5pct
    FROM d CROSS JOIN t
    """,
    description="two-sample Kolmogorov-Smirnov drift test between the 'view' and 'click' value distributions, binned formulation (1024 equi-width bins over the pooled range): per-bin counts via one map-side-combined aggregate, CDFs via a BOUNDED cumulative window (1024 rows, never a global sort of observations — the scale-correct histogram-KS every feature-store drift monitor ships), D = max|F_a - F_b| with the alpha=0.05 two-sample threshold 1.358*sqrt((n_a+n_b)/(n_a*n_b)) as a pinned boolean",
)
def a0136_ks_drift_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type").isin("view", "click"))
    pool = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    b = ev.crossJoin(F.broadcast(pool)).select(
        "event_type",
        F.least(
            F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / _KS_BINS)),
            F.lit(_KS_BINS - 1),
        ).alias("bin"),
    )
    c = b.groupBy("bin").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_v"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_c"),
    )
    t = c.agg(
        F.sum("n_v").cast("double").alias("tot_v"), F.sum("n_c").cast("double").alias("tot_c")
    )
    from pyspark.sql import Window

    # bounded window: <= 1024 bin rows, not observations
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cdf = c.crossJoin(F.broadcast(t)).select(
        (F.sum("n_v").over(w) / F.col("tot_v")).alias("f_v"),
        (F.sum("n_c").over(w) / F.col("tot_c")).alias("f_c"),
        "tot_v",
        "tot_c",
    )
    d = cdf.groupBy("tot_v", "tot_c").agg(F.max(F.abs(F.col("f_v") - F.col("f_c"))).alias("ks"))
    return d.select(
        F.lit("view_vs_click").alias("pair"),
        F.col("tot_v").cast("long").alias("n_a"),
        F.col("tot_c").cast("long").alias("n_b"),
        F.round("ks", 6).alias("ks_stat"),
        (
            F.col("ks")
            > 1.358 * F.sqrt((F.col("tot_v") + F.col("tot_c")) / (F.col("tot_v") * F.col("tot_c")))
        ).alias("drift_at_5pct"),
    )


# ---------------------------------------------------------------------------
# a0137 — ANSI SQL:2016 regression aggregate family. One map-side-
# combined aggregate per group; every statistic is a moment expression
# (JVM-side, no UDF), identical formulas in both engines.
# ---------------------------------------------------------------------------


@query(
    "a0137_regression_aggs",
    oracle="""
    SELECT event_type,
           CAST(regr_count(value, EXTRACT(hour FROM ts)) AS BIGINT) AS n,
           ROUND(regr_slope(value, EXTRACT(hour FROM ts)), 6) AS slope,
           ROUND(regr_intercept(value, EXTRACT(hour FROM ts)), 6) AS intercept,
           ROUND(regr_r2(value, EXTRACT(hour FROM ts)), 6) AS r2,
           ROUND(corr(value, EXTRACT(hour FROM ts)), 6) AS corr_xy,
           ROUND(covar_samp(value, EXTRACT(hour FROM ts)), 6) AS covar
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="ANSI SQL:2016 regression aggregate family (regr_count/slope/intercept/r2, corr, covar_samp) of event value vs hour-of-day per event type — the linear-trend screen run before fitting anything; one map-side-combined moment aggregate per group, pure JVM expressions, identical closed forms in both engines",
)
def a0137_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value"), F.hour("ts").cast("double").alias("x")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.regr_count("value", "x").cast("long").alias("n"),
            F.round(F.regr_slope("value", "x"), 6).alias("slope"),
            F.round(F.regr_intercept("value", "x"), 6).alias("intercept"),
            F.round(F.regr_r2("value", "x"), 6).alias("r2"),
            F.round(F.corr("value", "x"), 6).alias("corr_xy"),
            F.round(F.covar_samp("value", "x"), 6).alias("covar"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# a0139 — time-series gap fill + linear interpolation. The resampling
# step every forecasting pipeline runs before fitting: build the dense
# daily spine per series, join observed points, linearly interpolate
# interior gaps from the nearest observed neighbors, edge-fill with the
# nearest value. All windows are PARTITIONED by series — the spine
# explode and the four neighbor windows shard cleanly at any scale.
# Sparsity comes from thresholding (daily sums only over days whose
# event count clears a cut), so the fixture genuinely has holes.
# ---------------------------------------------------------------------------


@query(
    "a0139_gap_fill_interpolate",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n, ROUND(SUM(value), 6) AS v
      FROM events GROUP BY event_type, CAST(ts AS DATE) HAVING COUNT(*) >= 30),
    bounds AS (SELECT event_type, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY event_type),
    spine AS (SELECT event_type, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
              FROM bounds),
    j AS (SELECT s.event_type, s.day, d.v,
                 CASE WHEN d.v IS NOT NULL THEN s.day END AS obs_day
          FROM spine s LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day),
    n AS (SELECT event_type, day, v,
                 LAST_VALUE(v IGNORE NULLS) OVER w_prev AS pv,
                 LAST_VALUE(obs_day IGNORE NULLS) OVER w_prev AS pd,
                 FIRST_VALUE(v IGNORE NULLS) OVER w_next AS nv,
                 FIRST_VALUE(obs_day IGNORE NULLS) OVER w_next AS nd
          FROM j
          WINDOW w_prev AS (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 w_next AS (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
    f AS (SELECT event_type, day, v IS NULL AS filled,
                 CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                        pv + (nv - pv) * (day - pd) * 1.0 / (nd - pd)
                      WHEN pv IS NOT NULL THEN pv ELSE nv END AS y
          FROM n)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN filled THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           ROUND(SUM(y), 6) AS total_filled_sum,
           ROUND(AVG(y), 6) AS avg_filled
    FROM f GROUP BY event_type ORDER BY event_type
    """,
    description="time-series gap fill + linear interpolation (the pre-forecast resampling step): dense daily spine per series via sequence/generate_series explode, observed daily sums joined on, interior gaps interpolated between nearest observed neighbors (last/first_value IGNORE NULLS windows, all PARTITIONED by series), edges nearest-filled; per-series day/fill counts and the interpolated totals pinned; sparsity is real (days below an event-count threshold are holes)",
)
def a0139_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("v"))
        .filter(F.col("n") >= 30)
    )
    bounds = daily.groupBy("event_type").agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    j = spine.join(daily.select("event_type", "day", "v"), ["event_type", "day"], "left").select(
        "event_type",
        "day",
        "v",
        F.when(F.col("v").isNotNull(), F.col("day")).alias("obs_day"),
    )
    w_prev = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    )
    n = j.select(
        "event_type",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last("obs_day", ignorenulls=True).over(w_prev).alias("pd"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first("obs_day", ignorenulls=True).over(w_next).alias("nd"),
    )
    y = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * F.datediff("day", "pd")
            / F.datediff("nd", "pd"),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    f = n.select("event_type", "day", F.col("v").isNull().alias("filled"), y.alias("y"))
    return (
        f.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(F.col("filled").cast("long")).alias("n_filled"),
            F.round(F.sum("y"), 6).alias("total_filled_sum"),
            F.round(F.avg("y"), 6).alias("avg_filled"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# a0106 (ex-a0179) — Pareto skyline via the per-block sort-scan rule. The skyline
# (maximal vectors) operator of multi-criteria optimization: parts not
# dominated on (price low, size high) within their brand. Formulated
# as the deterministic sort-scan: order by (price asc, size desc,
# partkey) per brand, keep a row iff its size strictly exceeds every
# earlier row's size (running max over the preceding frame). One
# partitioned window, no self-join — the O(n log n) skyline algorithm
# relationally, sharded by brand.
# ---------------------------------------------------------------------------


@query(
    "a0106_pareto_skyline",
    oracle="""
    WITH r AS (SELECT p_brand, p_partkey, p_retailprice, p_size,
                      MAX(p_size) OVER (PARTITION BY p_brand
                                        ORDER BY p_retailprice, p_size DESC, p_partkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
               FROM part),
    sky AS (SELECT * FROM r WHERE mx IS NULL OR p_size > mx)
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_skyline,
           ROUND(MIN(p_retailprice), 2) AS cheapest,
           ROUND(MAX(p_retailprice), 2) AS priciest,
           CAST(MAX(p_size) AS BIGINT) AS max_size,
           CAST(MIN(p_partkey) AS BIGINT) AS first_part
    FROM sky GROUP BY p_brand ORDER BY p_brand
    """,
    description="Pareto skyline (maximal-vector) operator: parts not dominated on (retailprice low, size high) within their brand, via the O(n log n) sort-scan rule — one window PARTITIONED by brand ordered (price asc, size desc, partkey), keep rows whose size strictly exceeds the running max of all preceding rows; no self-join, no quadratic candidate generation, shards by block at any scale; per-brand skyline size and price/size envelope pinned",
)
def a0106_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part")
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("p_retailprice"), F.col("p_size").desc(), F.col("p_partkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = p.select(
        "p_brand", "p_partkey", "p_retailprice", "p_size", F.max("p_size").over(w).alias("mx")
    )
    sky = r.filter(F.col("mx").isNull() | (F.col("p_size") > F.col("mx")))
    return (
        sky.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_skyline"),
            F.round(F.min("p_retailprice"), 2).alias("cheapest"),
            F.round(F.max("p_retailprice"), 2).alias("priciest"),
            F.max("p_size").cast("long").alias("max_size"),
            F.min("p_partkey").alias("first_part"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# a0109 (ex-a0182) — delta + run-length encoding audit. The storage-codec analysis
# a lakehouse runs when choosing column encodings: per-user event-id
# streams are delta-encoded (sorted gaps via lag), the gap stream is
# run-length encoded (run = maximal constant stretch), and the audit
# reports the compression the codec would achieve per event type. All
# windows PARTITIONED by user; run boundaries by the classic
# gap != lag(gap) change-flag cumulative-sum-free formulation (count of
# boundary flags — no per-run ids materialized).
# ---------------------------------------------------------------------------


@query(
    "a0109_delta_rle_audit",
    oracle="""
    WITH s AS (SELECT event_type, user_id, event_id,
                      event_id - LAG(event_id) OVER (PARTITION BY user_id, event_type
                                                     ORDER BY event_id) AS gap
               FROM events),
    g AS (SELECT event_type, user_id, gap,
                 CASE WHEN gap IS DISTINCT FROM LAG(gap) OVER (PARTITION BY user_id, event_type
                                                               ORDER BY event_id)
                      THEN 1 ELSE 0 END AS boundary
          FROM s WHERE gap IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(boundary) AS BIGINT) AS n_runs,
           CAST(COUNT(DISTINCT gap) AS BIGINT) AS n_distinct_gaps,
           ROUND(SUM(boundary) * 1.0 / COUNT(*), 6) AS rle_ratio,
           CAST(MIN(gap) AS BIGINT) AS min_gap, CAST(MAX(gap) AS BIGINT) AS max_gap
    FROM g GROUP BY event_type ORDER BY event_type
    """,
    description="delta + run-length encoding audit (the lakehouse column-encoding chooser): per-(user,type) event-id streams delta-encoded via lag, the gap stream run-length encoded via the gap != lag(gap) boundary flag (runs = sum of boundaries — no run ids materialized), per-type gap/run/distinct counts and the RLE compression ratio pinned; every window PARTITIONED by (user, type)",
)
def a0109_delta_rle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    s = ev.select(
        "event_type",
        "user_id",
        "event_id",
        (F.col("event_id") - F.lag("event_id").over(w)).alias("gap"),
    )
    # filter BEFORE the boundary window, matching the oracle's CTE shape
    # (WHERE precedes window evaluation within a SELECT)
    g = s.filter(F.col("gap").isNotNull()).withColumn(
        "boundary",
        F.when(~F.col("gap").eqNullSafe(F.lag("gap").over(w)), 1).otherwise(0),
    )
    return (
        g.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("boundary").cast("long").alias("n_runs"),
            F.countDistinct("gap").alias("n_distinct_gaps"),
            F.round(F.sum("boundary") / F.count("*"), 6).alias("rle_ratio"),
            F.min("gap").alias("min_gap"),
            F.max("gap").alias("max_gap"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# a0134 — sorted-neighborhood dedup. The third classic near-dup family
# next to LSH (q41) and SimHash (q43): sort each block (lang) by a
# cheap proxy key (n_chars, doc_id), compare each record only to its w
# following neighbors. The candidate generator is an EQUALITY join on
# (lang, rank) — each row emits w probe rows at rank+1..rank+w — never
# a non-equi range join, so it shuffles like any hash join and the
# candidate count is exactly w*n regardless of skew. Verification is
# exact token-set Jaccard, computed on the pair rows.
# ---------------------------------------------------------------------------

_SN_W = 2  # neighborhood width


@query(
    "a0134_sorted_neighborhood",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, n_chars, list_distinct({_TOKS}) AS ts FROM documents),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk FROM t),
    p AS (SELECT a.lang,
                 len(list_intersect(a.ts, b.ts)) * 1.0 /
                   NULLIF(len(list_distinct(list_concat(a.ts, b.ts))), 0) AS jac
          FROM r a JOIN r b ON a.lang = b.lang AND b.rk - a.rk IN (1, 2))
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
           ROUND(AVG(jac), 6) AS avg_jaccard
    FROM p GROUP BY lang ORDER BY lang
    """,
    description="sorted-neighborhood near-dup detection (the third classic family next to MinHash-LSH q41 and SimHash q43): per-language blocks sorted by the cheap proxy key (n_chars, doc_id), each record compared only to its w=2 following neighbors — candidates generated by an EQUALITY join on (lang, rank) from w emitted probe rows per record (w*n candidates exactly, hash-join shuffle, never a non-equi range join), verified by exact token-set Jaccard at 0.5",
)
def a0134_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", "n_chars", F.array_distinct(X.tokens("text")).alias("ts")
    )
    r = t.withColumn(
        "rk", F.row_number().over(Window.partitionBy("lang").orderBy("n_chars", "doc_id"))
    )
    probes = r.select(
        "lang",
        F.col("ts").alias("ts_a"),
        F.explode(F.array(*[F.col("rk") + i for i in range(1, _SN_W + 1)])).alias("rk"),
    )
    pairs = probes.join(r.select("lang", "rk", F.col("ts").alias("ts_b")), ["lang", "rk"])
    jac = F.size(F.array_intersect("ts_a", "ts_b")) / F.nullif(
        F.size(F.array_union("ts_a", "ts_b")), F.lit(0)
    )
    p = pairs.select("lang", jac.alias("jac"))
    return (
        p.groupBy("lang")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum((F.col("jac") >= 0.5).cast("long")).alias("n_matches"),
            F.round(F.avg("jac"), 6).alias("avg_jaccard"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# a0135 — interpolated Kneser-Ney bigram language model. The standard
# n-gram smoothing (Chen & Goodman 1999) built entirely relationally:
# absolute discount d=0.75 off every seen bigram, the freed mass
# backed off to the CONTINUATION unigram P_cont(b) = |contexts of b| /
# |bigram types| — the property that makes KN the default smoother.
# Four aggregates off one bigram-count frame (context totals, left
# fan-out, right fan-in, type count), joined back on their keys; every
# shuffle is token-keyed and map-side combined.
# ---------------------------------------------------------------------------

_KN_D = 0.75


@query(
    "a0135_kneser_ney_bigram",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (SELECT unnest(list_transform(range(1, len(toks)), i ->
                    struct_pack(a := toks[i], b := toks[i+1]))) AS p
           FROM t WHERE len(toks) >= 2),
    c AS (SELECT p.a AS a, p.b AS b, COUNT(*) AS c_ab FROM bg GROUP BY p.a, p.b),
    ctx AS (SELECT a, CAST(SUM(c_ab) AS DOUBLE) AS c_a, COUNT(*) AS n1p_a FROM c GROUP BY a),
    rb AS (SELECT b, COUNT(*) AS n1p_rb FROM c GROUP BY b),
    tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_types FROM c),
    k AS (SELECT c.a, c.b, c.c_ab,
                 (c.c_ab - {_KN_D}) / ctx.c_a
                 + {_KN_D} * ctx.n1p_a / ctx.c_a * (rb.n1p_rb / tt.n_types) AS p_kn
          FROM c JOIN ctx ON c.a = ctx.a JOIN rb ON c.b = rb.b CROSS JOIN tt)
    SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab, ROUND(p_kn, 6) AS p_kn
    FROM k ORDER BY c_ab DESC, a, b LIMIT 20
    """,
    description="interpolated Kneser-Ney bigram LM (Chen-Goodman absolute discount d=0.75, continuation-count backoff P_cont(b)=|left contexts of b|/|bigram types| — the default n-gram smoother) built fully relationally: one corpus bigram-count frame, four token-keyed map-side-combined aggregates (context totals, left fan-out, right fan-in, type count) joined back; top-20 bigrams by count with their smoothed probability pinned to 6dp",
)
def a0135_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    with_t = docs.select(X.tokens("text").alias("_toks"))
    pairs = with_t.select(
        F.explode(
            F.when(
                F.size("_toks") >= 2,
                F.arrays_zip(
                    F.col("_toks").alias("a"),
                    F.slice(F.col("_toks"), 2, F.greatest(F.size("_toks") - 1, F.lit(0))).alias(
                        "b"
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("_p")
    ).filter(F.col("_p.b").isNotNull() & (F.col("_p.b") != ""))
    c = pairs.groupBy(F.col("_p.a").alias("a"), F.col("_p.b").alias("b")).agg(
        F.count("*").alias("c_ab")
    )
    c = c.localCheckpoint(eager=False)  # four consumers; count once
    ctx = c.groupBy("a").agg(
        F.sum("c_ab").cast("double").alias("c_a"), F.count("*").alias("n1p_a")
    )
    rb = c.groupBy("b").agg(F.count("*").alias("n1p_rb"))
    tt = c.agg(F.count("*").cast("double").alias("n_types"))
    k = (
        c.join(ctx, "a")
        .join(rb, "b")
        .crossJoin(F.broadcast(tt))
        .select(
            "a",
            "b",
            "c_ab",
            (
                (F.col("c_ab") - _KN_D) / F.col("c_a")
                + _KN_D
                * F.col("n1p_a")
                / F.col("c_a")
                * (F.col("n1p_rb") / F.col("n_types"))
            ).alias("p_kn"),
        )
    )
    return k.select("a", "b", "c_ab", F.round("p_kn", 6).alias("p_kn")).orderBy(
        F.desc("c_ab"), "a", "b"
    ).limit(20)


# ---------------------------------------------------------------------------
# a0140 — n-gram overlap decontamination: the GPT-3/PaLM-style rule
# (train doc is contaminated if it shares ANY 8-token window with an
# eval document), complementing exact-hash (q105) and Bloom (q115)
# decontamination. Eval shingles are distinct and semi-joined against
# per-doc distinct train shingles — the join is gram-keyed, the eval
# side is the small one (broadcastable), and no text ever rides the
# shuffle (grams only).
# ---------------------------------------------------------------------------

_DECON_N = 8


@query(
    "a0140_ngram_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, source,
                  unnest(list_distinct(list_transform(range(1, len(toks) - {_DECON_N - 2}),
                         i -> array_to_string(list_slice(toks, i, i + {_DECON_N - 1}), ' ')))) AS g
           FROM t WHERE len(toks) >= {_DECON_N}),
    ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
    tr AS (SELECT DISTINCT s.doc_id, s.source
           FROM sh s JOIN ev ON s.g = ev.g WHERE s.doc_id % 97 <> 0),
    tot AS (SELECT source, COUNT(*) AS n_train FROM documents WHERE doc_id % 97 <> 0 GROUP BY source),
    fl AS (SELECT source, COUNT(*) AS n_flagged FROM tr GROUP BY source)
    SELECT tot.source, CAST(tot.n_train AS BIGINT) AS n_train,
           CAST(COALESCE(fl.n_flagged, 0) AS BIGINT) AS n_flagged,
           ROUND(COALESCE(fl.n_flagged, 0) * 1.0 / tot.n_train, 6) AS flagged_frac
    FROM tot LEFT JOIN fl ON tot.source = fl.source ORDER BY tot.source
    """,
    description="n-gram overlap decontamination (the GPT-3/PaLM 8-token-window rule, complementing exact-hash q105 and Bloom q115): eval docs (doc_id%97==0) contribute distinct 8-token shingles; a train doc is contaminated if ANY of its shingles hits the eval set — per-doc-distinct shingle semi-join keyed on the gram, eval side small/broadcastable, no document text on the shuffle; per-source flagged counts and fractions pinned",
)
def a0140_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source", X.tokens("text").alias("toks"))
    sh = t.filter(F.size("toks") >= _DECON_N).select(
        "doc_id",
        "source",
        F.explode(X.word_shingles(F.col("toks"), n=_DECON_N, distinct=True)).alias("g"),
    )
    ev = sh.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    tr = (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(ev), "g", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )
    tot = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .groupBy("source")
        .agg(F.count("*").alias("n_train"))
    )
    fl = tr.groupBy("source").agg(F.count("*").alias("n_flagged"))
    return (
        tot.join(fl, "source", "left")
        .select(
            "source",
            "n_train",
            F.coalesce("n_flagged", F.lit(0)).alias("n_flagged"),
            F.round(F.coalesce("n_flagged", F.lit(0)) / F.col("n_train"), 6).alias(
                "flagged_frac"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# a0107 (ex-a0180) — entropy profile: per-source character- and token-level
# Shannon entropy plus type-token ratio — the compressibility/
# diversity screen LLM corpus pipelines run next to the Gopher rules
# (low-entropy sources are boilerplate; abnormally high are noise).
# Frequencies via two map-side-combined aggregates over exploded
# chars/tokens; the entropy sums run over the per-source alphabet
# frames (bounded by |alphabet| and |vocab|).
# ---------------------------------------------------------------------------


@query(
    "a0107_entropy_profile",
    oracle=f"""
    WITH ch AS (SELECT source, unnest(string_split(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '')) AS c
                FROM documents),
    cc AS (SELECT source, c, COUNT(*) AS n FROM ch GROUP BY source, c),
    cp AS (SELECT source, n, n * 1.0 / SUM(n) OVER (PARTITION BY source) AS p FROM cc),
    ce AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_chars_total,
                  ROUND(-SUM(p * ln(p)), 6) AS char_entropy
           FROM cp GROUP BY source),
    tk AS (SELECT source, unnest({_TOKS}) AS tok FROM documents),
    tc AS (SELECT source, tok, COUNT(*) AS n FROM tk GROUP BY source, tok),
    tp AS (SELECT source, n, n * 1.0 / SUM(n) OVER (PARTITION BY source) AS p FROM tc),
    te AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
                  CAST(COUNT(*) AS BIGINT) AS n_types,
                  ROUND(-SUM(p * ln(p)), 6) AS token_entropy,
                  ROUND(COUNT(*) * 1.0 / SUM(n), 6) AS type_token_ratio
           FROM tp GROUP BY source)
    SELECT ce.source, n_chars_total, char_entropy, n_tokens, n_types, token_entropy,
           type_token_ratio
    FROM ce JOIN te ON ce.source = te.source ORDER BY ce.source
    """,
    description="entropy profile per source: character- and token-level Shannon entropy (-sum p ln p over the per-source alphabet/vocab frequency frames) plus type-token ratio — the compressibility/diversity screen run next to the Gopher rules in corpus QA; two map-side-combined frequency aggregates, entropy windows bounded by alphabet/vocab size per source",
)
def a0107_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    ch = docs.select("source", F.explode(F.split(X.normalize("text"), "")).alias("c"))
    cc = ch.groupBy("source", "c").agg(F.count("*").alias("n"))
    wsrc = Window.partitionBy("source")
    p_c = F.col("n") / F.sum("n").over(wsrc)
    ce = (
        cc.select("source", "n", (p_c * F.log(p_c)).alias("plp"))
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_chars_total"),
            F.round(-F.sum("plp"), 6).alias("char_entropy"),
        )
    )
    tk = docs.select("source", F.explode(X.tokens("text")).alias("tok"))
    tc = tk.groupBy("source", "tok").agg(F.count("*").alias("n"))
    p_t = F.col("n") / F.sum("n").over(wsrc)
    te = (
        tc.select("source", "n", (p_t * F.log(p_t)).alias("plp"))
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.round(-F.sum("plp"), 6).alias("token_entropy"),
            F.round(F.count("*") / F.sum("n"), 6).alias("type_token_ratio"),
        )
    )
    return ce.join(te, "source").orderBy("source")


# ---------------------------------------------------------------------------
# a0108 (ex-a0181) — PMI co-occurrence: pointwise mutual information of adjacent
# token pairs, the classic collocation/distributional-semantics score
# (word2vec's implicit factorization target). PMI(a,b) =
# ln(P(ab)/(P(a)P(b))) with bigram P from the pair frame and unigram P
# from the token frame; min-count floor 5 kills the low-count noise
# PMI is notorious for. Ranked by rounded PMI with a full
# deterministic tie-break.
# ---------------------------------------------------------------------------

_PMI_MIN = 5


@query(
    "a0108_pmi_collocations",
    oracle=f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    bg AS (SELECT unnest(list_transform(range(1, len(toks)), i ->
                    struct_pack(a := toks[i], b := toks[i+1]))) AS p
           FROM t WHERE len(toks) >= 2),
    c AS (SELECT p.a AS a, p.b AS b, COUNT(*) AS c_ab FROM bg GROUP BY p.a, p.b),
    nb AS (SELECT CAST(SUM(c_ab) AS DOUBLE) AS n_bi FROM c),
    u AS (SELECT unnest(toks) AS tok FROM t),
    uc AS (SELECT tok, COUNT(*) AS c_tok FROM u GROUP BY tok),
    nu AS (SELECT CAST(SUM(c_tok) AS DOUBLE) AS n_uni FROM uc),
    k AS (SELECT c.a, c.b, c.c_ab,
                 ln((c.c_ab / n_bi) / ((ua.c_tok / n_uni) * (ub.c_tok / n_uni))) AS pmi
          FROM c JOIN uc ua ON c.a = ua.tok JOIN uc ub ON c.b = ub.tok
          CROSS JOIN nb CROSS JOIN nu
          WHERE c.c_ab >= {_PMI_MIN})
    SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab, ROUND(pmi, 6) AS pmi
    FROM k ORDER BY ROUND(pmi, 6) DESC, a, b LIMIT 15
    """,
    description="PMI collocation mining: pointwise mutual information ln(P(ab)/(P(a)P(b))) of adjacent token pairs (bigram P over the pair frame, unigram P over the token frame — word2vec's implicit factorization target), min-count floor 5 against PMI's low-count noise, top-15 by ROUNDED pmi with full deterministic tie-break; token-keyed joins, everything map-side combined",
)
def a0108_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    with_t = docs.select(X.tokens("text").alias("_toks"))
    pairs = with_t.select(
        F.explode(
            F.when(
                F.size("_toks") >= 2,
                F.arrays_zip(
                    F.col("_toks").alias("a"),
                    F.slice(F.col("_toks"), 2, F.greatest(F.size("_toks") - 1, F.lit(0))).alias(
                        "b"
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("_p")
    ).filter(F.col("_p.b").isNotNull() & (F.col("_p.b") != ""))
    c = pairs.groupBy(F.col("_p.a").alias("a"), F.col("_p.b").alias("b")).agg(
        F.count("*").alias("c_ab")
    )
    c = c.localCheckpoint(eager=False)
    nb = c.agg(F.sum("c_ab").cast("double").alias("n_bi"))
    uc = with_t.select(F.explode("_toks").alias("tok")).groupBy("tok").agg(
        F.count("*").alias("c_tok")
    )
    uc = uc.localCheckpoint(eager=False)
    nu = uc.agg(F.sum("c_tok").cast("double").alias("n_uni"))
    k = (
        c.filter(F.col("c_ab") >= _PMI_MIN)
        .join(F.broadcast(uc.select(F.col("tok").alias("a"), F.col("c_tok").alias("ca"))), "a")
        .join(F.broadcast(uc.select(F.col("tok").alias("b"), F.col("c_tok").alias("cb"))), "b")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .select(
            "a",
            "b",
            "c_ab",
            F.log(
                (F.col("c_ab") / F.col("n_bi"))
                / ((F.col("ca") / F.col("n_uni")) * (F.col("cb") / F.col("n_uni")))
            ).alias("pmi"),
        )
    )
    return (
        k.select("a", "b", "c_ab", F.round("pmi", 6).alias("pmi"))
        .orderBy(F.desc("pmi"), "a", "b")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# a0138 — HLL set-operation estimates: union natively (sketches are
# closed under union), intersection by inclusion-exclusion — the
# audience-overlap query every analytics stack answers with sketches
# because exact distinct-intersection needs a full shuffle of both
# sides. Per-type DataSketches HLL sketches (lgK=12) built in one
# scan; every pair's union sketch merged from the per-type sketches
# (the mergeability that makes this a 1000-shard rollup); exact
# counts computed alongside as the verification denominator, with the
# estimate-within-bounds checks pinned as oracle-expected booleans.
# ---------------------------------------------------------------------------


@query(
    "a0138_hll_set_ops",
    oracle="""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    n AS (SELECT event_type, COUNT(*) AS n_users FROM du GROUP BY event_type),
    px AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                  COUNT(*) AS exact_inter
           FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
           GROUP BY a.event_type, b.event_type)
    SELECT type_a, type_b,
           CAST(na.n_users AS BIGINT) AS exact_a,
           CAST(nb.n_users AS BIGINT) AS exact_b,
           CAST(na.n_users + nb.n_users - exact_inter AS BIGINT) AS exact_union,
           CAST(exact_inter AS BIGINT) AS exact_intersection,
           TRUE AS union_est_ok, TRUE AS inter_est_ok
    FROM px JOIN n na ON px.type_a = na.event_type
            JOIN n nb ON px.type_b = nb.event_type
    ORDER BY type_a, type_b
    """,
    description="HLL sketch set operations (audience overlap): per-event-type DataSketches HLL user sketches (lgK=12) built in ONE scan, every type pair's union estimated from hll_union of the two sketches (the mergeable 1000-shard form) and intersection by inclusion-exclusion; exact distinct counts computed alongside as the denominator, and the estimates-within-5%-of-union error checks pinned as oracle-expected TRUE booleans",
)
def a0138_hll_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.countDistinct("user_id").alias("exact_n"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"), F.col("exact_n").alias("exact_a")
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"), F.col("exact_n").alias("exact_b")
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("type_a") < F.col("type_b"))
    du = ev.select("event_type", "user_id").distinct()
    px = (
        du.alias("x")
        .join(du.alias("y"), (F.col("x.user_id") == F.col("y.user_id")) & (F.col("x.event_type") < F.col("y.event_type")))
        .groupBy(F.col("x.event_type").alias("type_a"), F.col("y.event_type").alias("type_b"))
        .agg(F.count("*").alias("exact_inter"))
    )
    est_u = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    j = pairs.join(px, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        F.col("exact_a").cast("long").alias("exact_a"),
        F.col("exact_b").cast("long").alias("exact_b"),
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_inter")).cast("long").alias("exact_union"),
        F.col("exact_inter").cast("long").alias("exact_intersection"),
        est_u.alias("_eu"),
        (est_a + est_b - est_u).alias("_ei"),
    )
    return j.select(
        "type_a",
        "type_b",
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_intersection",
        (F.abs(F.col("_eu") - F.col("exact_union")) <= 0.05 * F.col("exact_union")).alias(
            "union_est_ok"
        ),
        (
            F.abs(F.col("_ei") - F.col("exact_intersection")) <= 0.05 * F.col("exact_union")
        ).alias("inter_est_ok"),
    ).orderBy("type_a", "type_b")


# ---------------------------------------------------------------------------
# a0141 — int4 embedding quantization: per-dimension min/max scale to
# 4-bit codes, two codes packed per byte (the 8x compression layout
# vector stores ship), dequantized at bin centers for the
# reconstruction-error audit. Binning is floor((v-mn)/width) — integer
# boundary math, no round() (engine-ambiguous at .5) — and a
# zero-width guard handles constant dimensions. The per-dim stats
# frame is 64 rows (broadcast); codes/packing/error are one exploded
# pass with two map-side-combined aggregates; the packed bytes are
# pinned by a positional checksum.
# ---------------------------------------------------------------------------

_I4_LEVELS = 16


@query(
    "a0141_int4_quantization",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    x AS (SELECT vec_id, label, CAST(p AS INT) AS pos, v[CAST(p AS INT) + 1] AS val
          FROM e, unnest(range(len(v))) t(p)),
    st AS (SELECT pos, MIN(val) AS mn, MAX(val) AS mx FROM x GROUP BY pos),
    c AS (SELECT vec_id, label, x.pos, val, mn, mx,
                 CASE WHEN mx = mn THEN 0
                      ELSE LEAST({_I4_LEVELS - 1}, CAST(FLOOR((val - mn) / ((mx - mn) / {_I4_LEVELS}.0)) AS BIGINT))
                 END AS code
          FROM x JOIN st ON x.pos = st.pos),
    r AS (SELECT vec_id, label, pos, val, code,
                 mn + (code + 0.5) * ((mx - mn) / {_I4_LEVELS}.0) AS recon
          FROM c),
    pk AS (SELECT vec_id, label, pos // 2 AS bpos,
                  SUM(CASE WHEN pos % 2 = 0 THEN code * 16 ELSE code END) AS byte
           FROM c GROUP BY vec_id, label, pos // 2),
    ck AS (SELECT label, SUM(byte * (bpos + 1)) AS checksum, COUNT(*) AS n_bytes FROM pk GROUP BY label),
    er AS (SELECT label, COUNT(DISTINCT vec_id) AS n_vecs,
                  ROUND(AVG((val - recon) * (val - recon)), 6) AS mse,
                  ROUND(MAX(ABS(val - recon)), 6) AS max_abs_err
           FROM r GROUP BY label)
    SELECT er.label, CAST(n_vecs AS BIGINT) AS n_vecs, mse, max_abs_err,
           CAST(ck.checksum % 1000000007 AS BIGINT) AS packed_checksum,
           CAST(ck.n_bytes AS BIGINT) AS n_bytes
    FROM er JOIN ck ON er.label = ck.label ORDER BY er.label
    """,
    description="int4 embedding quantization (the 8x-compression layout vector stores ship): per-dimension min/max scaling to 4-bit codes via floor boundary math (no round() — engine-ambiguous at .5; constant dims guarded to code 0), two codes packed per byte with the packing pinned by a positional checksum, dequantization at bin centers with per-label reconstruction MSE / max-abs-error audited; the 64-row per-dim stats frame broadcasts, everything else is one exploded pass with map-side-combined aggregates",
)
def a0141_int4_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
    )
    st = x.groupBy("pos").agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    width = (F.col("mx") - F.col("mn")) / _I4_LEVELS
    code = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(F.lit(_I4_LEVELS - 1), F.floor((F.col("val") - F.col("mn")) / width))
    )
    c = x.join(F.broadcast(st), "pos").select(
        "vec_id", "label", "pos", "val", "mn", "mx", code.alias("code")
    )
    r = c.select(
        "vec_id",
        "label",
        "val",
        (F.col("mn") + (F.col("code") + 0.5) * ((F.col("mx") - F.col("mn")) / _I4_LEVELS)).alias(
            "recon"
        ),
    )
    pk = c.groupBy("vec_id", "label", (F.col("pos") / 2).cast("long").alias("bpos")).agg(
        F.sum(
            F.when(F.col("pos") % 2 == 0, F.col("code") * 16).otherwise(F.col("code"))
        ).alias("byte")
    )
    ck = pk.groupBy("label").agg(
        F.sum(F.col("byte") * (F.col("bpos") + 1)).alias("checksum"),
        F.count("*").alias("n_bytes"),
    )
    er = r.groupBy("label").agg(
        F.countDistinct("vec_id").alias("n_vecs"),
        F.round(F.avg((F.col("val") - F.col("recon")) * (F.col("val") - F.col("recon"))), 6).alias(
            "mse"
        ),
        F.round(F.max(F.abs(F.col("val") - F.col("recon"))), 6).alias("max_abs_err"),
    )
    return (
        er.join(ck, "label")
        .select(
            "label",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            "mse",
            "max_abs_err",
            (F.col("checksum") % 1000000007).cast("long").alias("packed_checksum"),
            F.col("n_bytes").cast("long").alias("n_bytes"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# a0143 — grouped applyInArrow parity (Spark 4's Arrow-native grouped
# map, the zero-pandas sibling of applyInPandas): per-group OLS slope
# computed inside the Arrow UDF with numpy on the columnar batch, next
# to the same slope from the native regr_slope expression. The Arrow
# path must agree with the JVM expression to 1e-9 — pinned as an
# oracle-expected boolean — while the hashed slope column itself comes
# from the native expression (cross-engine float discipline: the hash
# never depends on Python accumulation order).
# ---------------------------------------------------------------------------


@query(
    "a0143_applyinarrow_parity",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(value, EXTRACT(hour FROM ts)), 6) AS slope,
           TRUE AS arrow_matches_native
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="grouped applyInArrow (Spark 4 Arrow-native grouped map, the zero-pandas sibling of applyInPandas): per-event-type OLS slope computed with numpy over the raw Arrow batch, joined against the identical slope from the native regr_slope expression; agreement to 1e-9 pinned as an oracle-expected boolean while the HASHED slope column comes from the JVM expression (the hash never depends on Python float accumulation order)",
)
def a0143_applyinarrow_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("double").alias("x"), F.col("value").alias("y")
    )

    def slope_of(tbl: pa.Table) -> pa.Table:
        import numpy as np

        x = tbl.column("x").to_numpy(zero_copy_only=False).astype("float64")
        y = tbl.column("y").to_numpy(zero_copy_only=False).astype("float64")
        xm, ym = x.mean(), y.mean()
        den = ((x - xm) ** 2).sum()
        slope = float(((x - xm) * (y - ym)).sum() / den) if den else float("nan")
        et = tbl.column("event_type")[0].as_py()
        return pa.table(
            {"event_type": [et], "n": [len(x)], "slope_arrow": [slope]}
        )

    arrow = ev.groupBy("event_type").applyInArrow(
        slope_of, schema="event_type string, n long, slope_arrow double"
    )
    native = ev.groupBy("event_type").agg(F.regr_slope("y", "x").alias("slope_native"))
    return (
        arrow.join(native, "event_type")
        .select(
            "event_type",
            "n",
            F.round("slope_native", 6).alias("slope"),
            (F.abs(F.col("slope_arrow") - F.col("slope_native")) < 1e-9).alias(
                "arrow_matches_native"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# a0142 — the flagship end-to-end corpus pipeline: the composition a
# training-data team actually runs, as ONE declared query so the whole
# chain sits under a single cross-engine hash. Stages:
#   1. exact dedup        keep the lowest doc_id per md5(text) group
#   2. quality filter     n_chars >= 120 AND >= 20 tokens
#   3. decontamination    drop eval docs (doc_id%97==0) and any train
#                         doc sharing an eval text hash
#   4. mixture sampling   per-source targets (even-numbered sources
#                         capped at 10 docs, odd keep-all), the a093
#                         deterministic md5-threshold Bernoulli
#   5. packing            128-token context windows, utilization
# Per-source funnel counts at every stage + packed totals are the
# output — a regression in ANY stage moves the hash. Every stage is
# the already-verified primitive (q40 dedup, q45 quality, q105
# decontam, a093 mixture, q109 packing) composed shuffle-consciously:
# hash keys only (md5/text hashes, never text) cross stage boundaries.
# examples/corpus_pipeline.py and examples/retrieval_pipeline.py
# narrate the same chains standalone (sink + report / BM25+ANN eval).
# ---------------------------------------------------------------------------

_FL_CHUNK = 128
_FL_EVEN_TARGET = 10


@query(
    "a0142_flagship_pipeline",
    oracle=f"""
    WITH raw AS (SELECT doc_id, source, n_chars, md5(text) AS h, {_TOKS} AS toks FROM documents),
    d1 AS (SELECT * FROM raw WHERE doc_id IN (SELECT MIN(doc_id) FROM raw GROUP BY h)),
    q AS (SELECT * FROM d1 WHERE n_chars >= 120 AND len(toks) >= 20),
    ev AS (SELECT DISTINCT h FROM raw WHERE doc_id % 97 = 0),
    dc AS (SELECT * FROM q WHERE doc_id % 97 <> 0 AND h NOT IN (SELECT h FROM ev)),
    nd AS (SELECT source, COUNT(*) AS n_dc FROM dc GROUP BY source),
    r AS (SELECT source, n_dc,
                 CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                      THEN LEAST(1.0, {_FL_EVEN_TARGET} * 1.0 / n_dc) ELSE 1.0 END AS rate
          FROM nd),
    samp AS (SELECT dc.* FROM dc JOIN r ON dc.source = r.source
             WHERE r.rate >= 1.0
                OR substr(md5(CAST(dc.doc_id AS VARCHAR)), 1, 6)
                   < lower(lpad(hex(CAST(floor(r.rate * 16777216) AS BIGINT)), 6, '0'))),
    pk AS (SELECT source, doc_id, len(toks) AS n_tok,
                  CAST(CEIL(len(toks) * 1.0 / {_FL_CHUNK}) AS BIGINT) AS n_chunks
           FROM samp),
    st AS (SELECT r2.source,
                  (SELECT COUNT(*) FROM raw WHERE raw.source = r2.source) AS n_raw,
                  (SELECT COUNT(*) FROM d1 WHERE d1.source = r2.source) AS n_dedup,
                  (SELECT COUNT(*) FROM q WHERE q.source = r2.source) AS n_quality,
                  (SELECT COUNT(*) FROM dc WHERE dc.source = r2.source) AS n_decontam,
                  (SELECT COUNT(*) FROM samp WHERE samp.source = r2.source) AS n_sampled,
                  (SELECT COALESCE(CAST(SUM(n_chunks) AS BIGINT), 0) FROM pk WHERE pk.source = r2.source) AS n_chunks,
                  (SELECT COALESCE(CAST(SUM(n_tok) AS BIGINT), 0) FROM pk WHERE pk.source = r2.source) AS total_tokens
           FROM (SELECT DISTINCT source FROM raw) r2)
    SELECT source, CAST(n_raw AS BIGINT) AS n_raw, CAST(n_dedup AS BIGINT) AS n_dedup,
           CAST(n_quality AS BIGINT) AS n_quality, CAST(n_decontam AS BIGINT) AS n_decontam,
           CAST(n_sampled AS BIGINT) AS n_sampled, n_chunks, total_tokens,
           ROUND(CASE WHEN n_chunks > 0 THEN total_tokens * 1.0 / (n_chunks * {_FL_CHUNK}) ELSE 0 END, 6) AS pack_utilization
    FROM st ORDER BY source
    """,
    description="flagship end-to-end LLM corpus pipeline as ONE hashed query: exact dedup (min doc_id per text md5) -> quality gate (n_chars>=120, >=20 tokens) -> decontamination (drop eval docs doc_id%97==0 AND train docs sharing an eval text hash) -> deterministic mixture sampling (even-numbered sources capped at 10 via the a093 md5-threshold rule, odd keep-all) -> 128-token context-window packing; per-source funnel counts at every stage + chunk totals + pack utilization pinned, so a regression in ANY composed stage moves the hash; only hash keys cross stage boundaries (text never rides a shuffle)",
)
def a0142_flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5("text").alias("h"),
        F.size(X.tokens("text")).alias("n_tok"),
    )
    # r15 reshape (guide §2.4): the dedup semi-join (min doc_id per h)
    # AND the eval-hash anti-join both key on h, so ONE unbounded window
    # over h computes both memberships as row flags in a single
    # corpus-sized exchange — replacing the keep-aggregate + semi-join
    # shuffles and the ev_h distinct + broadcast anti-join. Every funnel
    # stage then becomes a boolean flag, and the six per-stage
    # per_source aggregates + five left joins collapse into TWO
    # conditional aggregates (st1 over all rows, st2 over sampled rows).
    # A/B at sf0.1: jobs 21 -> 9, warm 1.82 -> 0.98 s, cold 8.1 -> 1.5 s,
    # output byte-identical; at scale one shuffle of raw by h replaces
    # two (keep agg partials + semi-join re-shuffle).
    wh = Window.partitionBy("h")
    flg = (
        raw.select(
            "doc_id",
            "source",
            "n_chars",
            "n_tok",
            (F.col("doc_id") == F.min("doc_id").over(wh)).alias("is_d1"),
            (F.max(F.when(F.col("doc_id") % 97 == 0, 1).otherwise(0)).over(wh) == 1).alias(
                "has_ev"
            ),
        )
        .withColumn(
            "is_q",
            F.col("is_d1") & (F.col("n_chars") >= 120) & (F.col("n_tok") >= 20),
        )
        .withColumn(
            "is_dc",
            F.col("is_q") & (F.col("doc_id") % 97 != 0) & (~F.col("has_ev")),
        )
        .localCheckpoint(eager=False)  # funnel counts + sample probe; tokenize/hash once
    )
    st1 = flg.groupBy("source").agg(
        F.count("*").cast("long").alias("n_raw"),
        F.sum(F.when(F.col("is_d1"), 1).otherwise(0)).cast("long").alias("n_dedup"),
        F.sum(F.when(F.col("is_q"), 1).otherwise(0)).cast("long").alias("n_quality"),
        F.sum(F.when(F.col("is_dc"), 1).otherwise(0)).cast("long").alias("n_decontam"),
    ).localCheckpoint(eager=False)  # source-sized; feeds the rate broadcast AND the output join
    rate = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0,
        F.least(F.lit(1.0), F.lit(_FL_EVEN_TARGET) / F.col("n_decontam")),
    ).otherwise(F.lit(1.0))
    r = st1.select("source", rate.alias("rate"))
    thresh = F.lower(F.lpad(F.hex(F.floor(F.col("rate") * 16777216).cast("long")), 6, "0"))
    samp = (
        flg.filter(F.col("is_dc"))
        .join(F.broadcast(r), "source")
        .filter(
            (F.col("rate") >= 1.0)
            | (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6) < thresh)
        )
    )
    st2 = samp.groupBy("source").agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.sum(F.ceil(F.col("n_tok") / _FL_CHUNK)).cast("long").alias("n_chunks"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )
    st = st1.join(st2, "source", "left")
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)  # noqa: E731
    return st.select(
        "source",
        z("n_raw"),
        z("n_dedup"),
        z("n_quality"),
        z("n_decontam"),
        z("n_sampled"),
        z("n_chunks"),
        z("total_tokens"),
        F.round(
            F.when(
                F.coalesce("n_chunks", F.lit(0)) > 0,
                F.col("total_tokens") / (F.col("n_chunks") * _FL_CHUNK),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("pack_utilization"),
    ).orderBy("source")
