"""Statistical-analytics declared queries: autocorrelation, CUSUM
changepoint detection, Welch's t-test, and per-group OLS trend fits.

The reference pipeline leans on statistical screening before modeling
(seasonality inspection, feature/target correlation, trend fitting —
kaggle.py's EDA and deterministic-trend cells); this module provides
that family as distributed one-scan aggregates:

- q136: autocorrelation function of the daily revenue series at lags
  1..7 — the relational twin of q86's periodogram (time-domain vs
  frequency-domain seasonality evidence).
- q137: CUSUM changepoint detection per event_type. The recursion
  S_t = max(0, S_{t-1} + c_t) is rewritten with the prefix-sum
  identity S_t = P_t - min(0, min_{j<=t} P_j), so the whole stateful
  scan becomes TWO window functions over the daily rollup — no fold,
  no UDF, optimizer-visible end to end.
- q138: Welch's unequal-variance t-test between two part brands —
  closed-form from per-group (n, sum, sum-of-squares) in exact
  DECIMAL, so both engines derive the statistic from identical sums.
- q139: per-event-type OLS trend (slope/intercept/R^2) of daily counts
  vs day index — the distributed closed-form regression every
  monitoring stack runs; all moments are integer sums (exact on both
  engines), divisions happen once at the end.

Scale notes (100 TB): every query aggregates the fact table to a
calendar-sized frame FIRST (one map-side-combined shuffle); the
statistics run over that bounded series. Numeric determinism: revenue
accumulates in DECIMAL (exact, order-independent) and integer moments
stay integral; the only double arithmetic is on identical per-row
values or sequential window sums, which both engines evaluate in the
same day order — so 6-dp rounding is safe for the driver hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

_ACF_MAX_LAG = 7


@query(
    "q136_acf_daily_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY day),
    lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS lag),
    pairs AS (
      SELECT l.lag, a.rev AS x, b.rev AS y
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day - CAST(l.lag AS INT)),
    m AS (SELECT lag, COUNT(*) AS n,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
          FROM pairs GROUP BY lag)
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS acf
    FROM m ORDER BY lag
    """,
    description="autocorrelation function of the daily order-revenue series at lags 1..7: fact table rolls up to a calendar-sized daily frame (exact DECIMAL sums, order-independent), a 7-row lag dim joins the series to its own date-shifted copy (gap-aware: pairs exist only where both days do), Pearson r from exact decimal moments with doubles entering only in the final closed form — the time-domain seasonality evidence twin of q86's periodogram",
)
def q136_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
        # calendar-sized (one row per day) no matter the fact-table size;
        # materialized once for the 7-way lag self-join instead of
        # re-running the orders scan per branch of the join
        .localCheckpoint(eager=False)
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag"))
    b = daily.select(F.col("day").alias("bday"), F.col("rev").alias("y"))
    pairs = (
        daily.crossJoin(F.broadcast(lags))
        .join(b, F.date_sub(F.col("day"), F.col("lag")) == F.col("bday"))
        .select("lag", F.col("rev").alias("x"), "y")
    )
    m = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    return (
        m.select(
            F.col("lag").cast("long").alias("lag"),
            F.col("n").alias("n_pairs"),
            F.round(
                (nd * sxy - sx * sy)
                / F.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)),
                6,
            ).alias("acf"),
        )
        .orderBy("lag")
    )


# CUSUM parameters: slack k = 0.5 sigma, decision threshold h = 4 sigma
# (the textbook defaults for detecting ~1-sigma mean shifts).
_CUSUM_K_SIGMA = 0.5
_CUSUM_H_SIGMA = 4.0


@query(
    "q137_cusum_changepoints",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
      FROM events GROUP BY event_type, day),
    st AS (
      SELECT event_type, AVG(CAST(x AS DOUBLE)) AS mu,
             stddev_samp(CAST(x AS DOUBLE)) AS sigma
      FROM daily GROUP BY event_type),
    c AS (
      SELECT d.event_type, d.day,
             CAST(d.x AS DOUBLE) - st.mu - {_CUSUM_K_SIGMA} * st.sigma AS ci,
             {_CUSUM_H_SIGMA} * st.sigma AS h
      FROM daily d JOIN st USING (event_type)),
    p0 AS (
      SELECT event_type, day, h,
             SUM(ci) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt
      FROM c),
    p AS (
      SELECT event_type, day, h, pt,
             MIN(pt) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
      FROM p0),
    s AS (SELECT event_type, day, h, pt - LEAST(mn, 0) AS s FROM p)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN s > h THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           ROUND(MAX(s), 6) AS max_cusum,
           CAST(MIN(CASE WHEN s > h THEN day END) AS VARCHAR) AS first_flag_day
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    description="CUSUM changepoint detection per event_type over daily event counts: the stateful recursion S_t = max(0, S_(t-1) + x_t - mu - k*sigma) rewritten via the prefix-sum identity S_t = P_t - min(0, running-min of P) — TWO window functions over the calendar-sized daily rollup, no fold/UDF, fully optimizer-visible; flags days where S exceeds h = 4*sigma (k = 0.5*sigma, the textbook 1-sigma-shift defaults); counts are integers so mu/sigma and the sequential window sums are bit-identical across engines",
)
def q137_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    st = daily.groupBy("event_type").agg(
        F.avg(F.col("x").cast("double")).alias("mu"),
        F.stddev_samp(F.col("x").cast("double")).alias("sigma"),
    )
    c = daily.join(F.broadcast(st), "event_type").select(
        "event_type",
        "day",
        (F.col("x").cast("double") - F.col("mu") - _CUSUM_K_SIGMA * F.col("sigma")).alias("ci"),
        (_CUSUM_H_SIGMA * F.col("sigma")).alias("h"),
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    p = c.select(
        "event_type",
        "day",
        "h",
        F.sum("ci").over(w).alias("pt"),
    ).withColumn("mn", F.min("pt").over(w))
    s = p.select(
        "event_type", "day", "h", (F.col("pt") - F.least(F.col("mn"), F.lit(0.0))).alias("s")
    )
    return (
        s.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum((F.col("s") > F.col("h")).cast("long")).alias("n_flagged"),
            F.round(F.max("s"), 6).alias("max_cusum"),
            F.min(F.when(F.col("s") > F.col("h"), F.col("day")))
            .cast("string")
            .alias("first_flag_day"),
        )
        .orderBy("event_type")
    )


_TT_BRAND_A = "Brand#1"
_TT_BRAND_B = "Brand#2"


@query(
    "a138_welch_ttest",
    oracle=f"""
    WITH g AS (
      SELECT p_brand, COUNT(*) AS n,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS s,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS ss
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand IN ('{_TT_BRAND_A}', '{_TT_BRAND_B}')
      GROUP BY p_brand),
    m AS (
      SELECT p_brand, n, CAST(s AS DOUBLE) / n AS mean,
             (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1) AS var
      FROM g),
    ab AS (
      SELECT a.n AS na, a.mean AS ma, a.var AS va, b.n AS nb, b.mean AS mb, b.var AS vb
      FROM m a, m b WHERE a.p_brand = '{_TT_BRAND_A}' AND b.p_brand = '{_TT_BRAND_B}')
    SELECT '{_TT_BRAND_A}' AS brand_a, '{_TT_BRAND_B}' AS brand_b,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
           ROUND((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat,
           ROUND((va / na + vb / nb) * (va / na + vb / nb)
                 / ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1)),
                 6) AS welch_df
    FROM ab
    """,
    description="Welch's unequal-variance t-test between two part brands on line-item price: one broadcast-dim join + per-group (n, sum, sum-of-squares) in exact DECIMAL (order-independent across engines), closed-form t statistic and Welch-Satterthwaite degrees of freedom derived from those sums with doubles only in the final expressions — the distributed two-sample significance test a data-quality stack runs on segment metrics",
)
def a138_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(_TT_BRAND_A, _TT_BRAND_B)
    )
    x = F.col("l_extendedprice").cast("decimal(18,2)")
    g = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.sum(x).alias("s"), F.sum(x * x).alias("ss"))
    )
    n, s, ss = F.col("n"), F.col("s").cast("double"), F.col("ss").cast("double")
    m = g.select(
        "p_brand",
        "n",
        (s / n).alias("mean"),
        ((ss - s * s / n) / (n - 1)).alias("var"),
    )
    a = m.filter(F.col("p_brand") == _TT_BRAND_A).select(
        F.col("n").alias("na"), F.col("mean").alias("ma"), F.col("var").alias("va")
    )
    b = m.filter(F.col("p_brand") == _TT_BRAND_B).select(
        F.col("n").alias("nb"), F.col("mean").alias("mb"), F.col("var").alias("vb")
    )
    se2a, se2b = F.col("va") / F.col("na"), F.col("vb") / F.col("nb")
    return a.crossJoin(b).select(
        F.lit(_TT_BRAND_A).alias("brand_a"),
        F.lit(_TT_BRAND_B).alias("brand_b"),
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round("ma", 6).alias("mean_a"),
        F.round("mb", 6).alias("mean_b"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2a + se2b), 6).alias("t_stat"),
        F.round(
            (se2a + se2b) * (se2a + se2b)
            / (se2a * se2a / (F.col("na") - 1) + se2b * se2b / (F.col("nb") - 1)),
            6,
        ).alias("welch_df"),
    )


@query(
    "a139_ols_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY event_type, day),
    idx AS (
      SELECT event_type, y,
             date_diff('day', MIN(day) OVER (PARTITION BY event_type), day) AS x
      FROM daily),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
      FROM idx GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           ROUND((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept,
           ROUND(((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 6) AS r2
    FROM m ORDER BY event_type
    """,
    description="per-event-type OLS trend fit of daily activity vs day index: slope / intercept / R^2 in closed form from integer moment sums (n, sum x, sum y, sum xy, sum x2, sum y2) — every moment is an exact integer on both engines, division to double happens once per statistic; the fact table collapses to a calendar-sized frame in one map-side-combined shuffle, so the regression costs one scan at any corpus size (the distributed monitoring-trend primitive, and the closed-form sibling of the ml/ linear stages)",
)
def a139_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("y")
    )
    idx = daily.select(
        "event_type",
        "y",
        F.datediff(
            F.col("day"), F.min("day").over(W.partitionBy("event_type"))
        ).alias("x"),
    )
    m = idx.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = num * F.lit(1.0) / den
    return (
        m.select(
            "event_type",
            F.col("n").alias("n_days"),
            F.round(slope, 6).alias("slope"),
            F.round((sy - slope * sx) / n, 6).alias("intercept"),
            F.round((num * F.lit(1.0) * num) / (den * F.lit(1.0) * (n * syy - sy * sy)), 6).alias(
                "r2"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q140 — chi-square test of independence between two categorical
# columns (lang x source over documents): the contingency table is a
# dimension-sized groupBy; margins come from two further tiny
# aggregates broadcast back (never an unpartitioned window); the
# statistic, degrees of freedom, and Cramer's V derive from integer
# counts with doubles entering only in the final closed form.
# ---------------------------------------------------------------------------


@query(
    "a140_chi_square",
    oracle="""
    WITH ct AS (SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source),
    rl AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rtot FROM ct GROUP BY lang),
    rs AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ctot FROM ct GROUP BY source),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM ct),
    cells AS (
      SELECT ct.lang, ct.source, ct.o,
             rl.rtot * 1.0 * rs.ctot / n.n AS e
      FROM ct JOIN rl USING (lang) JOIN rs USING (source) CROSS JOIN n),
    stat AS (SELECT SUM((o - e) * (o - e) / e) AS chi2 FROM cells),
    dims AS (SELECT (SELECT COUNT(*) FROM rl) AS r, (SELECT COUNT(*) FROM rs) AS c)
    SELECT ROUND((SELECT chi2 FROM stat), 6) AS chi2,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           ROUND(sqrt((SELECT chi2 FROM stat)
                      / ((SELECT n FROM n) * (LEAST(r, c) - 1))), 6) AS cramers_v
    FROM dims
    """,
    description="chi-square test of independence between lang and source: fact table collapses to a dimension-sized contingency table in one map-side-combined shuffle; margins are two further tiny aggregates broadcast back (no unpartitioned window anywhere); chi2, dof, and Cramer's V in closed form from exact integer counts — the categorical-association audit a corpus-composition dashboard runs",
)
def a140_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ct = docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    rl = ct.groupBy("lang").agg(F.sum("o").cast("long").alias("rtot"))
    rs = ct.groupBy("source").agg(F.sum("o").cast("long").alias("ctot"))
    n = ct.agg(F.sum("o").cast("long").alias("n"))
    cells = (
        ct.join(F.broadcast(rl), "lang")
        .join(F.broadcast(rs), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "o",
            (F.col("rtot") * F.lit(1.0) * F.col("ctot") / F.col("n")).alias("e"),
            "n",
        )
    )
    stat = cells.agg(
        F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")).alias("chi2"),
        F.any_value("n").alias("n"),
    )
    dims = (
        rl.agg(F.count("*").alias("r"))
        .crossJoin(rs.agg(F.count("*").alias("c")))
    )
    return stat.crossJoin(F.broadcast(dims)).select(
        F.round("chi2", 6).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * (F.least("r", "c") - 1))), 6
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# q141 — pairwise Pearson correlation matrix over three lineitem
# measures in ONE scan: a single aggregate produces every first/second
# moment (sum, sum-of-squares, all cross products) in exact DECIMAL,
# then the three correlations are pure arithmetic over that one row.
# The one-scan-all-moments shape is how a 100 TB profiler computes a
# correlation matrix — never one pass per pair.
# ---------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _corr_pairs_sql() -> str:
    outs = []
    for i in range(len(_CORR_COLS)):
        for j in range(i + 1, len(_CORR_COLS)):
            a, b = _CORR_COLS[i], _CORR_COLS[j]
            outs.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"ROUND((n * CAST(s_{a}_{b} AS DOUBLE) - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE)) "
                f"/ sqrt((n * CAST(s_{a}_{a} AS DOUBLE) - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE)) "
                f"* (n * CAST(s_{b}_{b} AS DOUBLE) - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 6) AS pearson_r "
                f"FROM m"
            )
    return " UNION ALL ".join(outs)


@query(
    "a141_corr_matrix",
    oracle=f"""
    WITH m AS (
      SELECT COUNT(*) AS n,
             {", ".join(f"SUM(CAST({c} AS DECIMAL(18,2))) AS s_{c}" for c in _CORR_COLS)},
             {", ".join(f"SUM(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2))) AS s_{a}_{b}" for ai, a in enumerate(_CORR_COLS) for b in _CORR_COLS[ai:])}
      FROM lineitem)
    SELECT col_a, col_b, pearson_r FROM ({_corr_pairs_sql()}) ORDER BY col_a, col_b
    """,
    description="pairwise Pearson correlation matrix over three lineitem measures in ONE scan: a single aggregate emits every first and second moment (sums, squares, cross products) in exact DECIMAL — order-independent across engines — and the correlations are closed-form arithmetic over that one row; the one-scan-all-moments profiler shape (never one pass per pair)",
)
def a141_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = {c: F.col(c).cast("decimal(18,2)") for c in _CORR_COLS}
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(dec[c]).alias(f"s_{c}") for c in _CORR_COLS]
    aggs += [
        F.sum(dec[a] * dec[b]).alias(f"s_{a}_{b}")
        for ai, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[ai:]
    ]
    m = li.agg(*aggs)

    def pair_row(a: str, b: str) -> DataFrame:
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        sab = F.col(f"s_{a}_{b}").cast("double")
        saa, sbb = F.col(f"s_{a}_{a}").cast("double"), F.col(f"s_{b}_{b}").cast("double")
        return m.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.round(
                (n * sab - sa * sb)
                / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
                6,
            ).alias("pearson_r"),
        )

    out = None
    for i in range(len(_CORR_COLS)):
        for j in range(i + 1, len(_CORR_COLS)):
            row = pair_row(_CORR_COLS[i], _CORR_COLS[j])
            out = row if out is None else out.unionAll(row)
    return out.orderBy("col_a", "col_b")


# ---------------------------------------------------------------------------
# q142 — deterministic multiplier bootstrap for the mean: 16 bootstrap
# replicates of mean(o_totalprice), each row's per-replicate weight in
# {0,1,1,2} (mean 1) derived from ONE md5 of the stable order key — two
# hex chars per replicate — so resampling is reproducible across
# engines, partitionings, and re-runs, and all 16 replicates ride a
# single scan as conditional aggregates (no 16x row explosion).
# ---------------------------------------------------------------------------

_BOOT_B = 16
_BOOT_W = [0, 1, 1, 2]  # weight by (hex-slice % 4): mean 1, variance 1/2


def _boot_w_sql(b: int) -> str:
    sl = f"CAST(CONCAT('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), {2 * b + 1}, 2)) AS BIGINT) % 4"
    return f"list_extract([{', '.join(str(w) for w in _BOOT_W)}], ({sl}) + 1)"


@query(
    "a142_bootstrap_ci",
    oracle=f"""
    WITH w AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS x,
             {", ".join(f"{_boot_w_sql(b)} AS w{b}" for b in range(_BOOT_B))}
      FROM orders),
    agg AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx,
             {", ".join(f"CAST(SUM(w{b} * x) AS DOUBLE) / SUM(w{b}) AS m{b}" for b in range(_BOOT_B))}
      FROM w),
    boots AS (SELECT unnest([{", ".join(f"m{b}" for b in range(_BOOT_B))}]) AS m FROM agg),
    sd AS (SELECT AVG(m) AS mb, stddev_samp(m) AS se FROM boots)
    SELECT CAST((SELECT n FROM agg) AS BIGINT) AS n_rows,
           ROUND(CAST((SELECT sx FROM agg) AS DOUBLE) / (SELECT n FROM agg), 6) AS mean,
           ROUND((SELECT se FROM sd), 6) AS boot_se,
           ROUND(CAST((SELECT sx FROM agg) AS DOUBLE) / (SELECT n FROM agg)
                 - 1.96 * (SELECT se FROM sd), 6) AS ci_lo,
           ROUND(CAST((SELECT sx FROM agg) AS DOUBLE) / (SELECT n FROM agg)
                 + 1.96 * (SELECT se FROM sd), 6) AS ci_hi
    """,
    description="deterministic multiplier bootstrap for mean order value: 16 replicate means in ONE scan as conditional aggregates (weights in {0,1,1,2}, mean 1, two md5 hex chars of the stable order key per replicate — reproducible across engines, partitionings, and re-runs; no 16x row explosion), normal-approximation 95% CI from the replicate standard error; weighted sums accumulate in exact DECIMAL so replicate means are bit-identical across engines",
)
def a142_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(18,2)")
    md5k = F.md5(F.col("o_orderkey").cast("string"))

    def w(b: int):
        sl = F.conv(F.substring(md5k, 2 * b + 1, 2), 16, 10).cast("long") % 4
        arr = F.array(*[F.lit(v) for v in _BOOT_W])
        return F.element_at(arr, (sl + 1).cast("int"))

    agg = orders.agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        *[
            (F.sum(w(b) * x).cast("double") / F.sum(w(b))).alias(f"m{b}")
            for b in range(_BOOT_B)
        ],
    )
    boots = agg.select(
        "n", "sx", F.explode(F.array(*[F.col(f"m{b}") for b in range(_BOOT_B)])).alias("m")
    )
    sd = boots.groupBy("n", "sx").agg(F.stddev_samp("m").alias("se"))
    mean = F.col("sx").cast("double") / F.col("n")
    return sd.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round(mean, 6).alias("mean"),
        F.round("se", 6).alias("boot_se"),
        F.round(mean - 1.96 * F.col("se"), 6).alias("ci_lo"),
        F.round(mean + 1.96 * F.col("se"), 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# q143 — Benford first-digit audit over order totals: the fraud/quality
# screen for any monetary column. First significant digit via
# floor(x / 10^floor(log10(x))); expected Benford mass log10(1 + 1/d);
# per-digit observed vs expected plus each digit's chi-square
# contribution. Counts are integers; log10/pow run on identical doubles.
# ---------------------------------------------------------------------------


@query(
    "a143_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(floor(o_totalprice / pow(10, floor(log10(o_totalprice)))) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT digit, CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / total, 6) AS obs_frac,
           ROUND(log10(1 + 1.0 / digit), 6) AS benford_frac,
           ROUND((n * 1.0 / total - log10(1 + 1.0 / digit)) * (n * 1.0 / total - log10(1 + 1.0 / digit))
                 / log10(1 + 1.0 / digit) * total, 6) AS chi2_part
    FROM c CROSS JOIN t ORDER BY digit
    """,
    description="Benford's-law first-digit audit of order totals (the monetary-column fraud/quality screen): first significant digit via floor(x / 10^floor(log10 x)), digit histogram in one map-side-combined aggregate, observed fraction vs the Benford expectation log10(1+1/d), per-digit chi-square contribution — integer counts exact on both engines, log/pow on identical doubles",
)
def a143_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("long")
    c = orders.select(digit.alias("digit")).groupBy("digit").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").cast("long").alias("total"))
    obs = F.col("n") * F.lit(1.0) / F.col("total")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(obs, 6).alias("obs_frac"),
            F.round(exp, 6).alias("benford_frac"),
            F.round((obs - exp) * (obs - exp) / exp * F.col("total"), 6).alias("chi2_part"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# q146 — OHLC bars (open/high/low/close + volume-weighted mean) per
# (event_type, day): the ordered-extremes aggregate every market-data /
# metrics store runs. open/close use min_by/max_by on the full event
# timestamp with event_id as the deterministic tie-break (two events in
# the same microsecond cannot flip the bar between engines) — the
# argmin/argmax-by-ordering aggregate surface, one map-side-combined
# shuffle, no window function at all.
# ---------------------------------------------------------------------------


@query(
    "a0146_ohlc_bars",
    oracle="""
    WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id, value
               FROM events),
    r AS (SELECT event_type, day, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type, day
                                    ORDER BY ts, event_id) AS rn_a,
                 ROW_NUMBER() OVER (PARTITION BY event_type, day
                                    ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM e)
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           ROUND(MIN(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MIN(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM r
    GROUP BY event_type, day
    HAVING COUNT(*) >= 5
    ORDER BY event_type, day
    """,
    description="OHLC bars per (event_type, day): open/close via min_by/max_by on struct(ts, event_id) — the argmin/argmax-by-ordering aggregate with a deterministic tie-break so same-timestamp events cannot flip the bar between engines — plus high/low/count, in ONE map-side-combined shuffle with no window function; bars with < 5 events dropped (HAVING). The market-data / metrics-rollup primitive at fact-table scale",
)
def a0146_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.struct("ts", "event_id").alias("ord"),
        "value",
    )
    return (
        ev.groupBy("event_type", "day")
        .agg(
            F.round(F.min_by("value", "ord"), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", "ord"), 6).alias("close"),
            F.count("*").alias("n_events"),
        )
        .filter(F.col("n_events") >= 5)
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# q147 — sliding-window distinct users (trailing 7 days) per event_type.
# Distinct-over-sliding-window is the op a naive plan gets wrong at
# scale (collect_set over a range window buffers every member per row).
# The scale-correct rewrite: dedupe to (event_type, user, day) ONCE,
# explode each active day into the <=7 window-end days it contributes
# to, dedupe (event_type, user, window_end) — a user active twice in a
# window counts once — then a plain count per window. Work is bounded
# by active-pairs x window_len, every step a map-side-combined shuffle,
# no per-row state accumulation anywhere.
# ---------------------------------------------------------------------------

_SD_WIN = 7


@query(
    "a0147_sliding_distinct_users",
    oracle=f"""
    WITH ad AS (SELECT DISTINCT event_type, user_id, CAST(ts AS DATE) AS day FROM events),
    days AS (SELECT DISTINCT event_type, day FROM ad),
    contrib AS (
      SELECT DISTINCT ad.event_type, ad.user_id, ad.day + CAST(o.i AS INTEGER) AS wend
      FROM ad, range(0, {_SD_WIN}) o(i)),
    wins AS (
      SELECT c.event_type, c.wend, COUNT(DISTINCT c.user_id) AS u7
      FROM contrib c JOIN days d ON d.event_type = c.event_type AND d.day = c.wend
      GROUP BY c.event_type, c.wend),
    daily AS (SELECT event_type, day, COUNT(*) AS u1 FROM ad GROUP BY event_type, day)
    SELECT d.event_type, CAST(d.day AS VARCHAR) AS day,
           CAST(d.u1 AS BIGINT) AS dau,
           CAST(w.u7 AS BIGINT) AS wau7
    FROM daily d JOIN wins w ON w.event_type = d.event_type AND w.wend = d.day
    ORDER BY d.event_type, d.day
    """,
    description="trailing-7-day distinct users per event_type (DAU/WAU): the scale-correct rewrite of distinct-over-sliding-window — dedupe to (type, user, day) once, explode each active day into the <= 7 window-ends it contributes to, dedupe (type, user, window_end), then a plain count per window; work bounded by active-pairs x window_len with map-side combine everywhere, versus collect_set-over-range-window which buffers every member per output row; windows reported only on days with activity",
)
def a0147_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ad = ev.select("event_type", "user_id", F.to_date("ts").alias("day")).distinct()
    days = ad.select("event_type", "day").distinct()
    offsets = spark.range(_SD_WIN).select(F.col("id").cast("int").alias("i"))
    contrib = (
        ad.crossJoin(F.broadcast(offsets))
        .select("event_type", "user_id", F.date_add("day", F.col("i")).alias("wend"))
        .distinct()
    )
    wins = (
        contrib.join(
            days.select("event_type", F.col("day").alias("wend")), ["event_type", "wend"]
        )
        .groupBy("event_type", "wend")
        .agg(F.count("*").alias("u7"))
    )
    daily = ad.groupBy("event_type", "day").agg(F.count("*").alias("u1"))
    return (
        daily.join(
            wins.withColumnRenamed("wend", "day"), ["event_type", "day"]
        )
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.col("u1").alias("dau"),
            F.col("u7").alias("wau7"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# q149 — key-skew diagnostic report: the observability query a shuffle
# planner (or an engineer sizing one) runs before joining/aggregating on
# a key. All metrics are WINDOW-FREE so the diagnosis never itself
# suffers the skew it measures: coefficient of variation and normalized
# entropy come from moment sums over the per-key count frame
# (H = ln T - sum(x ln x)/T, normalized by ln n_keys), max share from a
# plain max, top-10 share from a bounded TakeOrdered. Entropy ~ 1 and
# cv ~ 0 mean uniform keys (safe to shuffle); a viral key drives
# max_share up and entropy down — the signal to salt or broadcast.
# ---------------------------------------------------------------------------


@query(
    "a0149_key_skew_report",
    oracle="""
    WITH c AS (SELECT o_custkey AS k, COUNT(*) AS x FROM orders GROUP BY k),
    m AS (SELECT COUNT(*) AS nk, CAST(SUM(x) AS BIGINT) AS t,
                 CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(MAX(x) AS BIGINT) AS mx,
                 SUM(x * ln(x)) AS sxlx
          FROM c),
    top AS (SELECT CAST(SUM(x) AS BIGINT) AS t10
            FROM (SELECT x FROM c ORDER BY x DESC, k LIMIT 10))
    SELECT CAST(nk AS BIGINT) AS n_keys, t AS total_rows,
           ROUND(mx * 1.0 / t, 6) AS max_share,
           ROUND((SELECT t10 FROM top) * 1.0 / t, 6) AS top10_share,
           ROUND(sqrt(sxx * 1.0 / nk - (t * 1.0 / nk) * (t * 1.0 / nk))
                 / (t * 1.0 / nk), 6) AS cv,
           ROUND((ln(t) - sxlx / t) / ln(nk), 6) AS norm_entropy
    FROM m
    """,
    description="key-skew diagnostic for the orders-by-customer key: n_keys, max key share, top-10 share, coefficient of variation, and normalized key entropy (H = ln T - sum(x ln x)/T over ln n_keys) — every metric WINDOW-FREE from moment sums over the per-key count frame plus one bounded TakeOrdered, so the diagnosis never itself suffers the skew it measures; the pre-shuffle observability probe that decides salt vs broadcast vs plain hash join",
)
def a0149_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy(F.col("o_custkey").alias("k")).agg(F.count("*").alias("x"))
    c = c.localCheckpoint(eager=False)  # customer-dimension-sized; two consumers
    m = c.agg(
        F.count("*").alias("nk"),
        F.sum("x").cast("long").alias("t"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.max("x").cast("long").alias("mx"),
        F.sum(F.col("x") * F.log("x")).alias("sxlx"),
    )
    top = (
        c.orderBy(F.desc("x"), "k")
        .limit(10)
        .agg(F.sum("x").cast("long").alias("t10"))
    )
    mean = F.col("t") * F.lit(1.0) / F.col("nk")
    return m.crossJoin(F.broadcast(top)).select(
        F.col("nk").cast("long").alias("n_keys"),
        F.col("t").alias("total_rows"),
        F.round(F.col("mx") * F.lit(1.0) / F.col("t"), 6).alias("max_share"),
        F.round(F.col("t10") * F.lit(1.0) / F.col("t"), 6).alias("top10_share"),
        F.round(
            F.sqrt(F.col("sxx") * F.lit(1.0) / F.col("nk") - mean * mean) / mean, 6
        ).alias("cv"),
        F.round(
            (F.log(F.col("t").cast("double")) - F.col("sxlx") / F.col("t"))
            / F.log(F.col("nk").cast("double")),
            6,
        ).alias("norm_entropy"),
    )


# ---------------------------------------------------------------------------
# q150 — sliding-window distinct via HLL sketch MERGE: the sketch-based
# scale path for q147's exact WAU. Per-(event_type, day) HLL sketches
# of the user set are built in ONE scan of the fact table; every
# trailing-7-day estimate is then a UNION of 7 tiny per-day sketches —
# per-day state is O(2^lgK) bytes regardless of corpus size, and no
# window ever re-scans the data (the q117 merge principle applied to
# sliding windows). Exact WAU rides along (q147's rewrite) to pin the
# documented HLL error bound as an oracle-expected TRUE boolean.
# ---------------------------------------------------------------------------


@query(
    "a0150_sliding_hll_wau",
    oracle=f"""
    WITH ad AS (SELECT DISTINCT event_type, user_id, CAST(ts AS DATE) AS day FROM events),
    days AS (SELECT DISTINCT event_type, day FROM ad),
    contrib AS (
      SELECT DISTINCT ad.event_type, ad.user_id, ad.day + CAST(o.i AS INTEGER) AS wend
      FROM ad, range(0, {_SD_WIN}) o(i)),
    wins AS (
      SELECT c.event_type, c.wend, COUNT(DISTINCT c.user_id) AS wau_exact
      FROM contrib c JOIN days d ON d.event_type = c.event_type AND d.day = c.wend
      GROUP BY c.event_type, c.wend)
    SELECT event_type, CAST(wend AS VARCHAR) AS day,
           CAST(wau_exact AS BIGINT) AS wau_exact,
           TRUE AS within_rel_err
    FROM wins ORDER BY event_type, day
    """,
    description="sliding-window distinct users via HLL sketch MERGE — the sketch-based scale path for q147: per-(event_type, day) DataSketches HLL sketches of the user set built in ONE fact scan, each trailing-7-day WAU = hll_union_agg of 7 per-day sketches (per-day state is KB-sized regardless of corpus size; no window re-scans the data — the q117 merge principle applied to sliding windows); exact WAU rides along via the q147 rewrite and the 5% (~3 sigma at lgK=12) HLL error bound is pinned as an oracle-expected TRUE boolean",
)
def a0150_sliding_hll_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ad = ev.select("event_type", "user_id", F.to_date("ts").alias("day")).distinct()
    ad = ad.localCheckpoint(eager=False)  # feeds sketches, exact path, and days
    days = ad.select("event_type", "day").distinct()
    offsets = spark.range(_SD_WIN).select(F.col("id").cast("int").alias("i"))

    # per-day sketches: ONE scan; the frame below is calendar-sized
    daily_sk = ad.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    # trailing window = union of <= 7 per-day sketches (explode the tiny
    # sketch frame into the window-ends each day contributes to)
    est = (
        daily_sk.crossJoin(F.broadcast(offsets))
        .select("event_type", F.date_add("day", F.col("i")).alias("wend"), "sk")
        .join(days.select("event_type", F.col("day").alias("wend")), ["event_type", "wend"])
        .groupBy("event_type", "wend")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_est"))
    )
    # exact side (q147's explode-dedupe-count rewrite) for the bound check
    exact = (
        ad.crossJoin(F.broadcast(offsets))
        .select("event_type", "user_id", F.date_add("day", F.col("i")).alias("wend"))
        .distinct()
        .join(days.select("event_type", F.col("day").alias("wend")), ["event_type", "wend"])
        .groupBy("event_type", "wend")
        .agg(F.count("*").alias("wau_exact"))
    )
    return (
        exact.join(est, ["event_type", "wend"])
        .select(
            "event_type",
            F.col("wend").cast("string").alias("day"),
            "wau_exact",
            (
                F.abs(F.col("wau_est") - F.col("wau_exact")) / F.col("wau_exact")
                <= F.lit(0.05)
            ).alias("within_rel_err"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# q151 — declarative data-validation pass (expectations report): the
# Great-Expectations-shaped audit every ingest runs, as ONE aggregate
# scan. Row-level rules (not-null, range, set-membership, regex shape)
# become conditional counts in a single groupBy-free aggregate;
# the table-level uniqueness rule is COUNT - COUNT(DISTINCT) on its
# key. Output is the (rule, n_violations, pass) contract table a data
# firewall gates on — violations are COUNTED, never silently dropped.
# ---------------------------------------------------------------------------

_VAL_STATUSES = ["F", "O", "P"]


@query(
    "a0151_validation_report",
    oracle=f"""
    WITH m AS (
      SELECT COUNT(*) AS n_rows,
             SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS v_key_null,
             COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS v_key_dup,
             SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_price,
             SUM(CASE WHEN o_orderstatus NOT IN ({", ".join(f"'{s}'" for s in _VAL_STATUSES)})
                      THEN 1 ELSE 0 END) AS v_status,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
                       OR o_orderdate >= TIMESTAMP '2002-01-01' THEN 1 ELSE 0 END) AS v_date,
             SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
                      THEN 1 ELSE 0 END) AS v_prio
      FROM orders)
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS pass
    FROM (
      SELECT 'orderdate_in_range' AS rule, v_date AS n_violations FROM m
      UNION ALL SELECT 'orderkey_not_null', v_key_null FROM m
      UNION ALL SELECT 'orderkey_unique', v_key_dup FROM m
      UNION ALL SELECT 'priority_shape', v_prio FROM m
      UNION ALL SELECT 'status_in_set', v_status FROM m
      UNION ALL SELECT 'totalprice_positive', v_price FROM m)
    ORDER BY rule
    """,
    description="declarative data-validation pass (expectations report): six ingest-gate rules — not-null key, key uniqueness (COUNT - COUNT DISTINCT), positive price, status set-membership, date range, priority regex shape — evaluated as conditional counts in ONE aggregate scan plus the key-distinct aggregate, unpivoted to the (rule, n_violations, pass) contract table a data firewall gates on; violations are counted, never silently dropped",
)
def a0151_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.agg(
        F.sum(F.col("o_orderkey").isNull().cast("long")).alias("v_key_null"),
        (F.count("o_orderkey") - F.countDistinct("o_orderkey")).alias("v_key_dup"),
        F.sum(
            (F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)).cast("long")
        ).alias("v_price"),
        F.sum((~F.col("o_orderstatus").isin(*_VAL_STATUSES)).cast("long")).alias("v_status"),
        F.sum(
            (
                (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit("2002-01-01").cast("timestamp"))
            ).cast("long")
        ).alias("v_date"),
        F.sum(
            (~F.col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$")).cast("long")
        ).alias("v_prio"),
    )
    rules = [
        ("orderdate_in_range", "v_date"),
        ("orderkey_not_null", "v_key_null"),
        ("orderkey_unique", "v_key_dup"),
        ("priority_shape", "v_prio"),
        ("status_in_set", "v_status"),
        ("totalprice_positive", "v_price"),
    ]
    unpivoted = m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("rule"), F.col(c).cast("long").alias("n_violations")
                    )
                    for r, c in rules
                ]
            )
        ).alias("kv")
    ).select("kv.rule", "kv.n_violations", (F.col("kv.n_violations") == 0).alias("pass"))
    return unpivoted.orderBy("rule")


# ---------------------------------------------------------------------------
# q154 — interval overlap via sweep line: each event opens a 30-minute
# activity interval [ts, ts+30min); per event_type, the maximum number
# of concurrently-open intervals and the time it first occurs. The
# sweep is the classic +1/-1 rewrite: explode each interval into a
# (+1 at start, -1 at end) delta stream, running-sum it ordered by
# (time, delta, event_id) — ends sort BEFORE starts at the same instant
# (delta -1 < +1), the half-open convention, and event_id makes the
# order total so both engines walk an identical sequence. One window
# per event_type over 2N rows; no interval self-join (which would be
# quadratic in the overlap degree).
# ---------------------------------------------------------------------------


@query(
    "a0154_max_concurrency",
    oracle="""
    WITH iv AS (SELECT event_type, event_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
                FROM events),
    deltas AS (
      SELECT event_type, s AS t, 1 AS delta, event_id FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS delta, event_id FROM iv),
    sweep AS (
      SELECT event_type, t, delta,
             SUM(delta) OVER (PARTITION BY event_type
                              ORDER BY t, delta, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
      FROM deltas),
    mx AS (SELECT event_type, MAX(open) AS max_open FROM sweep GROUP BY event_type),
    at AS (SELECT s.event_type, MIN(s.t) AS first_peak
           FROM sweep s JOIN mx ON mx.event_type = s.event_type AND s.open = mx.max_open
           GROUP BY s.event_type)
    SELECT mx.event_type, CAST(mx.max_open AS BIGINT) AS max_concurrent,
           CAST(at.first_peak AS VARCHAR) AS first_peak_ts
    FROM mx JOIN at ON at.event_type = mx.event_type
    ORDER BY mx.event_type
    """,
    description="maximum interval overlap via the sweep line: each event's 30-minute activity interval becomes (+1 at start, -1 at end) deltas, a running sum ordered by (time, delta, event_id) walks both engines through an identical total order (ends before starts at the same instant = half-open semantics), max concurrent + first time it occurs per event_type — one partitioned window over 2N delta rows, never an interval self-join (quadratic in overlap degree)",
)
def a0154_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_type", "event_id", F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    deltas = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionByName(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("delta"), "event_id")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sweep = deltas.withColumn("open", F.sum("delta").over(w))
    sweep = sweep.localCheckpoint(eager=False)  # consumed by max + argmin branches
    mx = sweep.groupBy("event_type").agg(F.max("open").alias("max_open"))
    at = (
        sweep.join(F.broadcast(mx), "event_type")
        .filter(F.col("open") == F.col("max_open"))
        .groupBy("event_type")
        .agg(F.min("t").alias("first_peak"))
    )
    return (
        mx.join(at, "event_type")
        .select(
            "event_type",
            F.col("max_open").cast("long").alias("max_concurrent"),
            F.col("first_peak").cast("string").alias("first_peak_ts"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q158 — equal-frequency (quantile) binning: the complement of q24's
# equal-width histogram and the binning rule feature pipelines actually
# prefer (each bin carries equal mass, so downstream models see a
# uniform code distribution). Scale-correct form: decile EDGES from one
# exact-percentile aggregate (interpolation parity with DuckDB's
# quantile_cont is pinned by q65), broadcast back, membership = count
# of edges <= x — NEVER ntile over the whole fact table, which would
# funnel every row through one unpartitioned window.
# ---------------------------------------------------------------------------

_QB_QS = [i / 10 for i in range(1, 10)]


@query(
    "a0158_equal_freq_bins",
    oracle=f"""
    WITH q AS (SELECT quantile_cont(o_totalprice, [{", ".join(str(q) for q in _QB_QS)}]) AS qs
               FROM orders),
    b AS (SELECT o_totalprice AS x,
                 len(list_filter((SELECT qs FROM q), e -> e <= o_totalprice)) AS bin
          FROM orders)
    SELECT CAST(bin AS INTEGER) AS bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(x), 2) AS bin_min, ROUND(MAX(x), 2) AS bin_max
    FROM b GROUP BY bin ORDER BY bin
    """,
    description="equal-frequency (decile) binning of order totals: exact interpolated decile edges from ONE percentile aggregate (cross-engine interpolation parity pinned since q65), broadcast back to the fact, bin = count of edges <= x — the scale-correct rule (never ntile over the whole fact table, which funnels every row through one unpartitioned window); per-bin count and value range exposed for the feature-pipeline code map",
)
def a0158_equal_freq_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    edges = orders.agg(
        F.expr(
            f"percentile(o_totalprice, array({', '.join(str(q) for q in _QB_QS)}))"
        ).alias("qs")
    )
    binned = orders.crossJoin(F.broadcast(edges)).select(
        F.col("o_totalprice").alias("x"),
        F.size(F.filter(F.col("qs"), lambda e: e <= F.col("o_totalprice"))).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("x"), 2).alias("bin_min"),
            F.round(F.max("x"), 2).alias("bin_max"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q159 — grouped seasonal-naive backtest: the distributed forecasting
# evaluation loop (the reference notebook's SMAPE validation, kaggle.py
# 497-523, as a pure query over every series at once). Forecast for
# (event_type, day) = actual at day-7 (the seasonal-naive baseline
# every forecasting benchmark starts from); SMAPE per series over the
# evaluation tail. One calendar-sized rollup, one self-join on the
# date shift, one aggregate — backtesting N series costs the same
# single pass whether N is five or five million.
# ---------------------------------------------------------------------------

_SN_LAG_DAYS = 7


@query(
    "a0159_seasonal_naive_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
      FROM events GROUP BY event_type, day),
    j AS (
      SELECT a.event_type, a.day, a.v AS actual, b.v AS forecast
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day = a.day - {_SN_LAG_DAYS}),
    s AS (
      SELECT event_type,
             CASE WHEN ABS(CAST(actual AS DOUBLE)) + ABS(CAST(forecast AS DOUBLE)) = 0 THEN 0.0
                  ELSE ABS(CAST(actual AS DOUBLE) - CAST(forecast AS DOUBLE))
                       / ((ABS(CAST(actual AS DOUBLE)) + ABS(CAST(forecast AS DOUBLE))) / 200.0)
             END AS sm
      FROM j)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(sm), 6) AS smape
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    description="grouped seasonal-naive backtest — the reference's SMAPE validation loop (kaggle.py:497-523) as one distributed query over every series at once: forecast(day) = actual(day-7), 0-safe SMAPE per event_type; one calendar-sized DECIMAL rollup + one date-shift self-join + one aggregate, so backtesting five or five million series is the same single pass; the baseline every forecasting benchmark measures models against",
)
def a0159_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("v")
        )
        .localCheckpoint(eager=False)  # both sides of the date-shift join
    )
    b = daily.select(
        F.col("event_type").alias("bt"), F.col("day").alias("bday"), F.col("v").alias("f")
    )
    j = daily.join(
        b,
        (F.col("event_type") == F.col("bt"))
        & (F.col("bday") == F.date_sub(F.col("day"), _SN_LAG_DAYS)),
    ).select("event_type", F.col("v").cast("double").alias("a"), F.col("f").cast("double").alias("f"))
    denom = (F.abs(F.col("a")) + F.abs(F.col("f"))) / 200.0
    sm = F.when(F.abs(F.col("a")) + F.abs(F.col("f")) == 0, F.lit(0.0)).otherwise(
        F.abs(F.col("a") - F.col("f")) / denom
    )
    return (
        j.select("event_type", sm.alias("sm"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_days"), F.round(F.avg("sm"), 6).alias("smape"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q160 — grouped robust outliers via MAD (median absolute deviation):
# the robust twin of q135's mean/stddev anomaly rule — median and MAD
# shrug off the very outliers they hunt. Two exact grouped percentile
# passes over the calendar-sized daily frame (median of x, then median
# of |x - median|), flag |x - med| > 3 * 1.4826 * MAD (the normal-
# consistent scale). Exact percentile interpolation parity with
# quantile_cont is pinned since q65.
# ---------------------------------------------------------------------------

_MAD_K = 3 * 1.4826


@query(
    "a0160_mad_outliers",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
      FROM events GROUP BY event_type, day),
    med AS (SELECT event_type, quantile_cont(CAST(x AS DOUBLE), 0.5) AS med
            FROM daily GROUP BY event_type),
    dev AS (SELECT d.event_type, d.day, CAST(d.x AS DOUBLE) AS x, m.med,
                   ABS(CAST(d.x AS DOUBLE) - m.med) AS ad
            FROM daily d JOIN med m USING (event_type)),
    mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY event_type)
    SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(ANY_VALUE(d.med), 6) AS median_count,
           ROUND(ANY_VALUE(m.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.ad > {_MAD_K} * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
    """,
    description="grouped robust outlier detection via MAD: per-event-type exact median of daily counts, then exact median of absolute deviations (two grouped percentile passes over the calendar-sized frame; interpolation parity pinned since q65), flag days beyond 3 x 1.4826 x MAD — the robust twin of q135's mean/sigma rule, immune to the outliers it hunts because median and MAD have 50% breakdown points",
)
def a0160_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("x"))
        .localCheckpoint(eager=False)  # median pass + deviation pass
    )
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(CAST(x AS DOUBLE), 0.5)").alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").select(
        "event_type",
        "day",
        F.col("x").cast("double").alias("x"),
        "med",
        F.abs(F.col("x").cast("double") - F.col("med")).alias("ad"),
    )
    dev = dev.localCheckpoint(eager=False)  # mad pass + flag pass
    mad = dev.groupBy("event_type").agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.any_value("med"), 6).alias("median_count"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.sum((F.col("ad") > _MAD_K * F.col("mad")).cast("long")).alias("n_outliers"),
        )
        .orderBy("event_type")
    )
