"""Post-window round-10 wave (a0050+): time-series diagnostics and
classical data-mining operators that deepen the engine beyond the 50
driver slots already filled this round — autocorrelation + Ljung-Box,
zone-map pruning audit, Haar wavelet energy spectrum, Apriori triple
itemsets, item-item collaborative filtering, Theil-Sen robust slope,
MDLP entropy split selection, RFM segmentation, CART variance-reduction
split finding, and Benjamini-Hochberg FDR control.

Originally named a0210+ (post-r10-window fodder); renamed a0050–a0069
at the registry level in round 11 so they lead ``sorted(queries())[:50]``
and the driver's correctness gate dates them (the proven window-rename
mechanism — see COVERAGE.md). Every query carries a full DuckDB
value-hash oracle.

Reference parity: no counterpart in the reference notebook
(kaggle/kaggle.py) — these extend the data-mining axis of the course
title (ACF diagnostics, Apriori, discretization, RFM are textbook
material) and the lakehouse-engineering axis (zone maps) the 100 TB
north star demands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# ---------------------------------------------------------------------------
# a0050 — autocorrelation function + Ljung-Box portmanteau test of the
# daily revenue series: r_k for k = 1..14 computed from one pass of 14
# window lags over the calendar-bounded daily rollup, and the cumulative
# Ljung-Box statistic Q(K) = n(n+2) Σ_{k≤K} r_k²/(n−k) — the standard
# "is this series white noise?" diagnostic that motivates every seasonal
# feature the engine builds (q26 Fourier, a086 periodogram, a0097 STL).
# Daily totals are cents-rounded first so the moment sums are engine-
# stable; r rounded to 6, Q to 4.
# ---------------------------------------------------------------------------

_ACF_LAGS = 14


def _acf_oracle() -> str:
    lag_cols = ",\n             ".join(
        f"lag(d, {k}) OVER (ORDER BY day) AS d{k}" for k in range(1, _ACF_LAGS + 1)
    )
    sums = ",\n             ".join(
        f"SUM(d * d{k}) AS s{k}" for k in range(1, _ACF_LAGS + 1)
    )
    rows = "\n    UNION ALL ".join(
        f"SELECT {k} AS lag_k, n, s{k} / s0 AS r, "
        f"n * (n + 2.0) * ({' + '.join(f'(s{j} / s0) * (s{j} / s0) / (n - {j})' for j in range(1, k + 1))}) AS q "
        f"FROM s"
        for k in range(1, _ACF_LAGS + 1)
    )
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, ROUND(SUM(o_totalprice), 2) AS y
      FROM orders GROUP BY 1
    ),
    mu AS (SELECT AVG(y) AS m FROM daily),
    dd AS (SELECT day, y - m AS d FROM daily CROSS JOIN mu),
    led AS (
      SELECT d,
             {lag_cols}
      FROM dd
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(d * d) AS s0,
             {sums}
      FROM led
    )
    SELECT CAST(lag_k AS BIGINT) AS lag_k, CAST(n AS BIGINT) AS n,
           ROUND(r, 6) AS acf, ROUND(q, 4) AS ljung_box_q
    FROM ({rows})
    ORDER BY lag_k
    """


@query(
    "a0050_acf_ljung_box",
    oracle=_acf_oracle(),
    description=f"autocorrelation function r_1..r_{_ACF_LAGS} of daily revenue plus the cumulative Ljung-Box portmanteau statistic Q(K) = n(n+2)Σr_k²/(n−k) — the standard white-noise diagnostic behind every seasonal feature; {_ACF_LAGS} window lags over the calendar-bounded daily rollup in ONE pass, one moment aggregate, cents-rounded inputs for engine-stable sums",
)
def a0050_acf_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = od.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    mu = daily.agg(F.avg("y").alias("m"))
    dd = daily.crossJoin(F.broadcast(mu)).select("day", (F.col("y") - F.col("m")).alias("d"))
    w = Window.orderBy("day")  # daily rollup spine, calendar-bounded
    led = dd.select(
        "d", *[F.lag("d", k).over(w).alias(f"d{k}") for k in range(1, _ACF_LAGS + 1)]
    )
    s = led.agg(
        F.count("*").alias("n"),
        F.sum(F.col("d") * F.col("d")).alias("s0"),
        *[
            F.sum(F.col("d") * F.col(f"d{k}")).alias(f"s{k}")
            for k in range(1, _ACF_LAGS + 1)
        ],
    )
    # ONE explode over an array of 14 per-lag structs instead of a
    # 14-branch unionByName of 1-row selects (r14): under AQE every
    # union branch was its own query stage — 14 jobs against a 1-row
    # frame; the exploded form is a single stage with the identical
    # per-lag expressions (so the checkpoint the branches shared is
    # no longer needed either).
    rows = []
    for k in range(1, _ACF_LAGS + 1):
        q_expr = None
        for j in range(1, k + 1):
            term = (F.col(f"s{j}") / F.col("s0")) * (F.col(f"s{j}") / F.col("s0")) / (
                F.col("n") - j
            )
            q_expr = term if q_expr is None else q_expr + term
        rows.append(
            F.struct(
                F.lit(k).cast("long").alias("lag_k"),
                F.col("n").cast("long").alias("n"),
                F.round(F.col(f"s{k}") / F.col("s0"), 6).alias("acf"),
                F.round(F.col("n") * (F.col("n") + 2.0) * q_expr, 4).alias("ljung_box_q"),
            )
        )
    return (
        s.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.lag_k", "r.n", "r.acf", "r.ljung_box_q")
        .orderBy("lag_k")
    )


# ---------------------------------------------------------------------------
# a0051 — zone-map pruning audit over a sort-clustered layout: write a
# lineitem mirror globally sorted by l_orderkey and split at
# maxRecordsPerFile=8192 (so each file's [min,max] key range is a
# disjoint slice of the sorted key multiset), read the REAL zone maps
# back (per-file min/max/count via input_file_name), and evaluate 8
# evenly-spaced 1/16-width range predicates against them — files
# touched, rows in touched files, pruned fraction. The oracle rebuilds
# the zones from rank arithmetic (key at rank i·8192… — deterministic
# even under duplicate-key tie reordering, because boundaries cut the
# SORTED MULTISET at fixed positions). This is the data-skipping story
# sort clustering buys at 100 TB: 1/16-range scans should touch ≈ 1/16
# of files, and the hash fails if the layout or the zone read lies.
# ---------------------------------------------------------------------------

_ZM_RECORDS = 8192
_ZM_PREDS = 8


@query(
    "a0051_zonemap_pruning",
    oracle=f"""
    WITH ranked AS (
      SELECT l_orderkey AS k, ROW_NUMBER() OVER (ORDER BY l_orderkey) AS rn
      FROM lineitem
    ),
    zones AS (
      SELECT CAST(FLOOR((rn - 1) / {_ZM_RECORDS}) AS BIGINT) AS f,
             MIN(k) AS zmin, MAX(k) AS zmax, COUNT(*) AS cnt
      FROM ranked GROUP BY 1
    ),
    nf AS (SELECT COUNT(*) AS n_files FROM zones),
    rng AS (SELECT MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx FROM lineitem),
    preds AS (
      SELECT CAST(p AS BIGINT) AS pred_id,
             mn + CAST(FLOOR((p - 1) * (mx - mn + 1) / {_ZM_PREDS}) AS BIGINT) AS lo,
             mn + CAST(FLOOR((p - 1) * (mx - mn + 1) / {_ZM_PREDS}) AS BIGINT)
                + CAST(FLOOR((mx - mn + 1) / {2 * _ZM_PREDS}) AS BIGINT) AS hi
      FROM (SELECT unnest(generate_series(1, {_ZM_PREDS})) AS p) CROSS JOIN rng
    )
    SELECT p.pred_id, CAST(p.lo AS BIGINT) AS lo, CAST(p.hi AS BIGINT) AS hi,
           (SELECT n_files FROM nf) AS n_files,
           CAST(COUNT(z.f) AS BIGINT) AS n_touched,
           CAST(COALESCE(SUM(z.cnt), 0) AS BIGINT) AS rows_touched,
           ROUND(1.0 - COUNT(z.f) * 1.0 / (SELECT n_files FROM nf), 6) AS pruned_frac
    FROM preds p LEFT JOIN zones z ON z.zmin <= p.hi AND z.zmax >= p.lo
    GROUP BY p.pred_id, p.lo, p.hi
    ORDER BY pred_id
    """,
    description=f"zone-map pruning audit over a sort-clustered mirror: lineitem globally sorted by l_orderkey, split at maxRecordsPerFile={_ZM_RECORDS}, REAL per-file min/max/count zone maps read back via input_file_name, and {_ZM_PREDS} evenly-spaced 1/{2 * _ZM_PREDS}-width range predicates evaluated against them (files touched, rows in touched files, pruned fraction); the oracle rebuilds zones from sorted-rank arithmetic — duplicate-key tie order can't change them because file boundaries cut the sorted multiset at fixed positions — proving sort clustering's data-skipping payoff end to end",
)
def a0051_zonemap_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources_ext import _mirror_dir

    mirror = _mirror_dir(sf_dir, "zonemap", "lineitem")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    # Single-stream sorted write: file boundaries must cut the sorted
    # multiset at exact global ranks i*8192 for the oracle's rank
    # arithmetic to reproduce the zones (a distributed orderBy samples
    # range boundaries non-deterministically, so DuckDB could not).
    # This write IS the query's cost at sf1.0 — 11.1 s of the 12.3 s
    # total; the zone read + 8-predicate audit is ~1.2 s. At 100 TB the
    # sort-cluster write is a parallel repartitionByRange job whose
    # zones any engine reads the same way; the single stream here is
    # an oracle-determinism harness choice, not the scale design.
    (
        li.repartition(1)
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", _ZM_RECORDS)
        .parquet(mirror)
    )
    zones = (
        spark.read.parquet(mirror)
        .select(F.input_file_name().alias("path"), "l_orderkey")
        .groupBy("path")
        .agg(
            F.min("l_orderkey").alias("zmin"),
            F.max("l_orderkey").alias("zmax"),
            F.count("*").alias("cnt"),
        )
        .localCheckpoint(eager=False)
    )
    nf = zones.agg(F.count("*").alias("n_files"))
    rng = li.agg(F.min("l_orderkey").alias("mn"), F.max("l_orderkey").alias("mx"))
    span = F.col("mx") - F.col("mn") + 1
    preds = (
        spark.range(1, _ZM_PREDS + 1)
        .select(F.col("id").cast("long").alias("pred_id"))
        .crossJoin(F.broadcast(rng))
        .select(
            "pred_id",
            (F.col("mn") + ((F.col("pred_id") - 1) * span / _ZM_PREDS).cast("long")).alias("lo"),
            (
                F.col("mn")
                + ((F.col("pred_id") - 1) * span / _ZM_PREDS).cast("long")
                + (span / (2 * _ZM_PREDS)).cast("long")
            ).alias("hi"),
        )
        .crossJoin(F.broadcast(nf))
    )
    return (
        preds.join(
            zones,
            (F.col("zmin") <= F.col("hi")) & (F.col("zmax") >= F.col("lo")),
            "left",
        )
        .groupBy("pred_id", "lo", "hi", "n_files")
        .agg(
            F.count("path").cast("long").alias("n_touched"),
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("rows_touched"),
            F.round(1.0 - F.count("path") / F.col("n_files"), 6).alias("pruned_frac"),
        )
        .select(
            "pred_id",
            F.col("lo").cast("long").alias("lo"),
            F.col("hi").cast("long").alias("hi"),
            F.col("n_files").cast("long").alias("n_files"),
            "n_touched",
            "rows_touched",
            "pruned_frac",
        )
        .orderBy("pred_id")
    )


# ---------------------------------------------------------------------------
# a0052 — Haar wavelet energy spectrum of the daily revenue series: take
# the first N days (N = largest power of two ≤ min(#days, 256)), and for
# each level ℓ = 1..8 compute the total energy of the Haar detail
# coefficients — Σ_blocks (first-half sum − second-half sum)² / 2^ℓ over
# complete 2^ℓ-day blocks — plus the level-N scaling (approximation)
# energy. By Parseval the shares against Σy² sum to 1, so the hash
# checks the whole multiresolution decomposition at once. Each level is
# one bounded groupBy over the indexed spine; no UDF, no iteration.
# ---------------------------------------------------------------------------

_HAAR_MAXN = 256
_HAAR_LEVELS = 8


def _haar_oracle() -> str:
    level_rows = "\n    UNION ALL ".join(
        f"""SELECT 'level_{lvl}' AS part, CAST(COUNT(*) AS BIGINT) AS n_coeffs,
           ROUND(SUM(ssum * ssum) / {2 ** lvl} / (SELECT te FROM tot), 6) AS share
    FROM (
      SELECT CAST(FLOOR(idx / {2 ** lvl}) AS BIGINT) AS blk,
             SUM(y * (1 - 2 * (CAST(FLOOR(idx / {2 ** (lvl - 1)}) AS BIGINT) % 2))) AS ssum,
             COUNT(*) AS bn
      FROM indexed GROUP BY 1
    ) WHERE bn = {2 ** lvl}"""
        for lvl in range(1, _HAAR_LEVELS + 1)
    )
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, ROUND(SUM(o_totalprice), 2) AS y
      FROM orders GROUP BY 1
    ),
    nn AS (
      SELECT CAST(power(2, FLOOR(log2(LEAST(COUNT(*), {_HAAR_MAXN})))) AS BIGINT) AS n
      FROM daily
    ),
    indexed AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS idx, y
      FROM daily CROSS JOIN nn
      QUALIFY idx < n
    ),
    tot AS (SELECT SUM(y * y) AS te, SUM(y) AS sy, COUNT(*) AS n FROM indexed)
    SELECT part, n_coeffs, share FROM (
    {level_rows}
    UNION ALL SELECT 'approx', CAST(1 AS BIGINT), ROUND(sy * sy / n / te, 6) FROM tot
    ) ORDER BY part
    """


@query(
    "a0052_haar_energy",
    oracle=_haar_oracle(),
    description=f"Haar wavelet energy spectrum of daily revenue: first N days (N = largest power of two ≤ min(#days, {_HAAR_MAXN})), per-level detail energy Σ(first-half − second-half block sums)²/2^ℓ for ℓ=1..{_HAAR_LEVELS} over complete blocks plus the scaling-coefficient energy, all as shares of Σy² (Parseval: shares sum to 1, so one hash checks the whole multiresolution decomposition); each level is one bounded groupBy over the indexed daily spine — no UDF, no iteration",
)
def a0052_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = od.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    nn = daily.agg(
        F.pow(F.lit(2.0), F.floor(F.log2(F.least(F.count("*"), F.lit(_HAAR_MAXN)))))
        .cast("long")
        .alias("n")
    )
    w = Window.orderBy("day")  # daily rollup spine, calendar-bounded
    indexed = (
        daily.crossJoin(F.broadcast(nn))
        .select((F.row_number().over(w) - 1).alias("idx"), "y", "n")
        .filter(F.col("idx") < F.col("n"))
        .select("idx", "y")
        .localCheckpoint(eager=False)
    )
    tot = indexed.agg(
        F.sum(F.col("y") * F.col("y")).alias("te"),
        F.sum("y").alias("sy"),
        F.count("*").alias("n"),
    ).localCheckpoint(eager=False)
    out = None
    for lvl in range(1, _HAAR_LEVELS + 1):
        size = 2**lvl
        sign = 1 - 2 * ((F.col("idx") / (size // 2)).cast("long") % 2)
        blocks = (
            indexed.groupBy((F.col("idx") / size).cast("long").alias("blk"))
            .agg(F.sum(F.col("y") * sign).alias("ssum"), F.count("*").alias("bn"))
            .filter(F.col("bn") == size)
        )
        row = (
            blocks.agg(
                F.count("*").cast("long").alias("n_coeffs"),
                F.sum(F.col("ssum") * F.col("ssum")).alias("e"),
            )
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(f"level_{lvl}").alias("part"),
                "n_coeffs",
                F.round(F.col("e") / size / F.col("te"), 6).alias("share"),
            )
        )
        out = row if out is None else out.unionByName(row)
    approx = tot.select(
        F.lit("approx").alias("part"),
        F.lit(1).cast("long").alias("n_coeffs"),
        F.round(F.col("sy") * F.col("sy") / F.col("n") / F.col("te"), 6).alias("share"),
    )
    return out.unionByName(approx).orderBy("part")


# ---------------------------------------------------------------------------
# a0053 — Apriori frequent TRIPLE itemsets with level-2 candidate
# pruning (the step a0093 stops short of, and the part of Apriori that
# actually embodies its insight): L2 = brand pairs with support ≥ s,
# triple candidates are generated within baskets ONLY where all three
# constituent pairs are in L2 (downward-closure prune via three
# broadcast semi-joins), then counted and thresholded at the same s.
# Pair/triple generation stays order-keyed (Σ basket³ with basket ≤
# ~13, never item all-pairs), and the L2 prune is what keeps the
# candidate space collapsed at 100 TB.
# ---------------------------------------------------------------------------

_AP3_SUPPORT = 0.003
_AP3_TOP = 15


@query(
    "a0053_apriori_triples",
    # Oracle note: the L2 prune is RESULT-INVARIANT (downward closure —
    # support(triple) <= support(any sub-pair), and both levels use the
    # same threshold), so the oracle counts triples directly and
    # thresholds; the Spark side keeps the explicit L2 candidate prune,
    # which is the operator being demonstrated (it changes the work, not
    # the answer). DuckDB's planner also chokes on the 3-way l2 join
    # form, so the equivalent direct form doubles as the stable oracle.
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    tot AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM baskets),
    triples AS (
      SELECT a.brand AS b1, b.brand AS b2, c.brand AS b3, COUNT(*) AS n_triple
      FROM baskets a
      JOIN baskets b ON a.okey = b.okey AND a.brand < b.brand
      JOIN baskets c ON a.okey = c.okey AND b.brand < c.brand
      GROUP BY 1, 2, 3
      HAVING COUNT(*) >= (SELECT n_orders FROM tot) * {_AP3_SUPPORT}
    )
    SELECT b1, b2, b3, CAST(n_triple AS BIGINT) AS n_triple,
           ROUND(n_triple * 1.0 / t.n_orders, 6) AS support
    FROM triples CROSS JOIN tot t
    ORDER BY n_triple DESC, b1, b2, b3
    LIMIT {_AP3_TOP}
    """,
    description=f"Apriori frequent triple itemsets with downward-closure pruning: L2 = brand pairs at support ≥ {_AP3_SUPPORT}, triples generated order-keyed within baskets and kept ONLY when all three constituent pairs are in L2 (three broadcast semi-join prunes — the candidate-space collapse that IS Apriori), same-threshold triple support, top-{_AP3_TOP} with tie-free order; Σ basket³ work bounded by basket size, never item all-pairs",
)
def a0053_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # ONE shuffle: sorted distinct-brand array per order; pair AND triple
    # generation are ROW-LOCAL tail-slice explodes over the array (the
    # q128/a0093 co-occurrence layout) — no basket self-joins at all
    baskets = (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .groupBy("okey")
        .agg(F.array_sort(F.collect_set("brand")).alias("bs"))
        .localCheckpoint(eager=False)
    )
    tot = baskets.select(F.count("*").alias("n_orders"))
    l2 = (
        baskets.select(F.posexplode("bs").alias("i", "b1"), "bs")
        .select("b1", F.explode(F.slice("bs", F.col("i") + 2, F.size("bs"))).alias("b2"))
        .groupBy("b1", "b2")
        .agg(F.count("*").alias("n_pair"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_pair") >= F.col("n_orders") * _AP3_SUPPORT)
        .select("b1", "b2")
        .localCheckpoint(eager=False)
    )
    cand = (
        baskets.select(F.posexplode("bs").alias("i", "t1"), "bs")
        .select("t1", F.posexplode(F.slice("bs", F.col("i") + 2, F.size("bs"))).alias("j", "t2"), F.col("i"), "bs")
        .select(
            "t1",
            "t2",
            F.explode(F.slice("bs", F.col("i") + F.col("j") + 3, F.size("bs"))).alias("t3"),
        )
    )
    for x, y in (("t1", "t2"), ("t1", "t3"), ("t2", "t3")):
        l2r = l2.select(F.col("b1").alias(f"_{x}"), F.col("b2").alias(f"_{y}"))
        cand = cand.join(
            F.broadcast(l2r), (F.col(x) == F.col(f"_{x}")) & (F.col(y) == F.col(f"_{y}")), "left_semi"
        )
    return (
        cand.groupBy(
            F.col("t1").alias("b1"), F.col("t2").alias("b2"), F.col("t3").alias("b3")
        )
        .agg(F.count("*").alias("n_triple"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_triple") >= F.col("n_orders") * _AP3_SUPPORT)
        .select(
            "b1",
            "b2",
            "b3",
            F.col("n_triple").cast("long").alias("n_triple"),
            F.round(F.col("n_triple") * 1.0 / F.col("n_orders"), 6).alias("support"),
        )
        .orderBy(F.desc("n_triple"), "b1", "b2", "b3")
        .limit(_AP3_TOP)
    )


# ---------------------------------------------------------------------------
# a0054 — item-item collaborative filtering (the classic neighborhood
# recommender): each brand's profile is its per-customer purchase-count
# vector; brand-brand cosine = Σ_c cnt(c,b1)·cnt(c,b2) / (‖b1‖‖b2‖).
# The dot products come from the shard-by-user basket layout, round-12
# packed-long edition: brands are int-encoded through the broadcast part
# join BEFORE the orderkey shuffle (payload shrinks from strings to
# ints), ONE groupBy(cust) collects the raw sorted index list, and the
# (brand, cnt) run-length encoding happens ROW-LOCALLY as packed longs
# (idx << 40 | cnt — primitive long arrays through sort/slice/explode,
# no struct boxing). Co-rated pairs then explode via the q128/a0093
# tail-slice idiom (bounded by Σ_c brands_c², brands_c ≤ 25,
# map-side-combined into ~300 brand-pair groups, no self-join shuffle);
# norms re-derive from the same checkpointed baskets; index→brand
# mapping returns at the 300-row tail as a literal-array element_at.
# Integer dot products and IEEE sqrt keep the cosine engine-exact at 6
# decimals. Interleaved A/B at sf1.0 (warm median): packed 2.6 s vs
# struct-RLE 3.1 s vs r11 two-shuffle struct layout 3.2 s vs pivoted
# 625-expression Gram aggregate 12.8 s (falls out of codegen). Floor:
# the 3-way join ALONE (od⋈li⋈pt, count) is 1.0 s at sf1.0 — equal to
# DuckDB's entire query wall — so the residual ratio is exchange cost on
# the data-grown fact join, not plan shape; see BENCH_FLOOR.
# ---------------------------------------------------------------------------

_CF_TOP = 15


@query(
    "a0054_itemitem_cf",
    oracle=f"""
    WITH cb AS (
      SELECT o.o_custkey AS cust, p.p_brand AS brand, COUNT(*) AS cnt
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    norms AS (SELECT brand, sqrt(SUM(cnt * cnt)) AS nrm FROM cb GROUP BY brand),
    pairs AS (
      SELECT a.brand AS b1, b.brand AS b2,
             SUM(a.cnt * b.cnt) AS dot, COUNT(*) AS n_users
      FROM cb a JOIN cb b ON a.cust = b.cust AND a.brand < b.brand
      GROUP BY 1, 2
    )
    SELECT p.b1, p.b2, CAST(p.n_users AS BIGINT) AS n_users,
           CAST(p.dot AS BIGINT) AS dot,
           ROUND(p.dot / (n1.nrm * n2.nrm), 6) AS cosine
    FROM pairs p JOIN norms n1 ON p.b1 = n1.brand JOIN norms n2 ON p.b2 = n2.brand
    ORDER BY p.dot / (n1.nrm * n2.nrm) DESC, p.b1, p.b2
    LIMIT {_CF_TOP}
    """,
    description=f"item-item collaborative filtering: brand-brand cosine over per-customer purchase-count vectors — brands int-encoded below the fact join (shuffle payload ints, not strings), ONE groupBy(cust) collects the sorted index list, (brand,cnt) run-length encodes row-locally as packed longs (idx<<40|cnt, primitive arrays through the tail-slice pair explode — bounded by Σ per-customer brand-set², never item all-pairs, no self-join shuffle), norms re-derived from the same checkpointed baskets, top-{_CF_TOP} most similar brand pairs with tie-free order; integer dots + IEEE sqrt keep the cosine engine-exact",
)
def a0054_itemitem_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # bounded catalog collect (~25 brands by spec): the index map keeps
    # every shuffle payload primitive; strings return only at the tail
    brands = sorted(r[0] for r in pt.select("p_brand").distinct().collect())
    bmap = F.create_map(*[x for i, b in enumerate(brands) for x in (F.lit(b), F.lit(i))])
    barr = F.array(*[F.lit(b) for b in brands])
    libi = li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey")).select(
        "l_orderkey", bmap[F.col("p_brand")].cast("long").alias("bi")
    )
    rows = od.join(libi, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.col("o_custkey").alias("cust"), "bi"
    )
    raw = rows.groupBy("cust").agg(F.sort_array(F.collect_list("bi")).alias("raw"))
    # row-local RLE into packed longs: cnt < 2^40 by construction (a
    # customer's purchase count), idx < 25 — sort order == brand order
    _PK = F.lit(1 << 40)
    baskets = raw.select(
        F.transform(
            F.array_distinct("raw"),
            lambda b: b * _PK + F.size(F.filter(F.col("raw"), lambda y: y == b)).cast("long"),
        ).alias("bs")
    ).localCheckpoint(eager=False)
    _CM = F.lit((1 << 40) - 1)
    norms = (
        baskets.select(F.explode("bs").alias("s"))
        .groupBy(F.shiftright("s", 40).alias("bi"))
        # integer square + BIGINT sum (exact, order-free), sqrt once
        .agg(
            F.sqrt(
                F.sum(F.col("s").bitwiseAND(_CM) * F.col("s").bitwiseAND(_CM))
            ).alias("nrm")
        )
        .select(F.element_at(barr, (F.col("bi") + 1).cast("int")).alias("brand"), "nrm")
    )
    pairs = (
        baskets.select(F.posexplode("bs").alias("i", "s1"), "bs")
        .select("s1", F.explode(F.slice("bs", F.col("i") + 2, F.size("bs"))).alias("s2"))
        .groupBy(F.shiftright("s1", 40).alias("i1"), F.shiftright("s2", 40).alias("i2"))
        .agg(
            F.sum(F.col("s1").bitwiseAND(_CM) * F.col("s2").bitwiseAND(_CM)).alias("dot"),
            F.count("*").alias("n_users"),
        )
        .select(
            F.element_at(barr, (F.col("i1") + 1).cast("int")).alias("b1"),
            F.element_at(barr, (F.col("i2") + 1).cast("int")).alias("b2"),
            "dot",
            "n_users",
        )
    )
    n1 = norms.select(F.col("brand").alias("b1"), F.col("nrm").alias("nrm1"))
    n2 = norms.select(F.col("brand").alias("b2"), F.col("nrm").alias("nrm2"))
    cos = F.col("dot") / (F.col("nrm1") * F.col("nrm2"))
    return (
        pairs.join(F.broadcast(n1), "b1")
        .join(F.broadcast(n2), "b2")
        .orderBy(cos.desc(), "b1", "b2")
        .limit(_CF_TOP)
        .select(
            "b1",
            "b2",
            F.col("n_users").cast("long").alias("n_users"),
            F.col("dot").cast("long").alias("dot"),
            F.round(cos, 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# a0055 — Theil-Sen robust trend over the trailing 90 days of daily
# revenue: the slope estimate is the MEDIAN of all C(90,2) ≈ 4.0k
# pairwise slopes (yj−yi)/(xj−xi) — a 29%-breakdown-point estimator the
# OLS slope (also reported, same window) cannot match when days spike.
# The pair frame is a self-join of the bounded 90-row window, the
# medians/quartiles are exact interpolated percentiles (cross-engine
# parity pinned since q65), and the intercept is the median residual.
# ---------------------------------------------------------------------------

_TS_DAYS = 90


@query(
    "a0055_theil_sen",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, ROUND(SUM(o_totalprice), 2) AS y
      FROM orders GROUP BY 1
    ),
    cut AS (SELECT MAX(day) AS mxd FROM daily),
    w AS (
      SELECT date_diff('day', DATE '1995-01-01', day) AS x, y
      FROM daily CROSS JOIN cut WHERE day >= mxd - {_TS_DAYS - 1}
    ),
    slopes AS (
      SELECT (b.y - a.y) / (b.x - a.x) AS s
      FROM w a JOIN w b ON a.x < b.x
    ),
    med AS (
      SELECT COUNT(*) AS n_pairs,
             quantile_cont(s, 0.25) AS p25,
             quantile_cont(s, 0.5) AS p50,
             quantile_cont(s, 0.75) AS p75
      FROM slopes
    ),
    ols AS (
      SELECT COUNT(*) AS n_days,
             (COUNT(*) * SUM(x * y) - SUM(x * 1.0) * SUM(y))
               / (COUNT(*) * SUM(x * 1.0 * x) - SUM(x * 1.0) * SUM(x)) AS b1
      FROM w
    ),
    icpt AS (
      SELECT quantile_cont(w.y - m.p50 * w.x, 0.5) AS b0
      FROM w CROSS JOIN med m
    )
    SELECT CAST(o.n_days AS BIGINT) AS n_days, CAST(m.n_pairs AS BIGINT) AS n_pairs,
           ROUND(m.p25, 6) AS slope_p25, ROUND(m.p50, 6) AS ts_slope,
           ROUND(m.p75, 6) AS slope_p75, ROUND(i.b0, 4) AS ts_intercept,
           ROUND(o.b1, 6) AS ols_slope
    FROM med m CROSS JOIN ols o CROSS JOIN icpt i
    """,
    description=f"Theil-Sen robust trend over the trailing {_TS_DAYS} days of daily revenue: slope = exact interpolated MEDIAN of all pairwise slopes from a self-join of the bounded {_TS_DAYS}-row window (with the quartiles of the slope distribution), intercept = median residual, OLS slope reported alongside for the robustness contrast — the 29%-breakdown estimator as pure relational algebra",
)
def a0055_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = od.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("y")
    )
    cut = daily.agg(F.max("day").alias("mxd"))
    w = (
        daily.crossJoin(F.broadcast(cut))
        .filter(F.col("day") >= F.date_sub(F.col("mxd"), _TS_DAYS - 1))
        .select(F.datediff("day", F.lit("1995-01-01")).alias("x"), "y")
        .localCheckpoint(eager=False)
    )
    a, b = w.alias("a"), w.alias("b")
    slopes = a.join(b, F.col("a.x") < F.col("b.x")).select(
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))).alias("s")
    )
    med = slopes.agg(
        F.count("*").alias("n_pairs"),
        F.expr("percentile(s, 0.25)").alias("p25"),
        F.expr("percentile(s, 0.5)").alias("p50"),
        F.expr("percentile(s, 0.75)").alias("p75"),
    ).localCheckpoint(eager=False)
    ols = w.agg(
        F.count("*").alias("n_days"),
        (
            (F.count("*") * F.sum(F.col("x") * F.col("y")) - F.sum(F.col("x") * 1.0) * F.sum("y"))
            / (
                F.count("*") * F.sum(F.col("x") * 1.0 * F.col("x"))
                - F.sum(F.col("x") * 1.0) * F.sum(F.col("x") * 1.0)
            )
        ).alias("b1"),
    )
    icpt = (
        w.crossJoin(F.broadcast(med))
        .agg(F.expr("percentile(y - p50 * x, 0.5)").alias("b0"))
    )
    return (
        med.crossJoin(F.broadcast(ols))
        .crossJoin(F.broadcast(icpt))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round("p25", 6).alias("slope_p25"),
            F.round("p50", 6).alias("ts_slope"),
            F.round("p75", 6).alias("slope_p75"),
            F.round("b0", 4).alias("ts_intercept"),
            F.round("b1", 6).alias("ols_slope"),
        )
    )


# ---------------------------------------------------------------------------
# a0056 — MDLP supervised split selection (Fayyad & Irani 1993, the
# criterion behind entropy-based discretization in every classic DM
# toolkit): candidate cuts are the 63 boundaries of a 64-bucket
# equi-width histogram of document length, the class is the document
# language, and for each cut the information gain and the MDL
# acceptance threshold (log2(n−1) + log2(3^k−2) − kH + k_l H_l + k_r
# H_r)/n are computed from per-(bucket,lang) cumulative counts — a
# 64×|langs| bounded frame, so the whole search is one contingency
# aggregate plus window algebra over it. Top-5 cuts by gain.
# ---------------------------------------------------------------------------

_MDLP_BUCKETS = 64
_MDLP_TOP = 5


@query(
    "a0056_mdlp_split",
    oracle=f"""
    WITH rng AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents),
    cont AS (
      SELECT LEAST({_MDLP_BUCKETS - 1},
                   CAST(FLOOR((n_chars - mn) * {_MDLP_BUCKETS}.0 / (mx - mn + 1)) AS BIGINT))
               AS bucket,
             lang, COUNT(*) AS cnt
      FROM documents CROSS JOIN rng GROUP BY 1, 2
    ),
    langs AS (SELECT lang, SUM(cnt) AS n_lang FROM cont GROUP BY lang),
    shell AS (
      SELECT CAST(b AS BIGINT) AS bucket, lang, n_lang
      FROM (SELECT unnest(generate_series(0, {_MDLP_BUCKETS - 1})) AS b) CROSS JOIN langs
    ),
    cum AS (
      SELECT s.bucket, s.lang, s.n_lang,
             SUM(COALESCE(c.cnt, 0)) OVER (PARTITION BY s.lang ORDER BY s.bucket) AS cl
      FROM shell s LEFT JOIN cont c ON s.bucket = c.bucket AND s.lang = c.lang
    ),
    tot AS (
      SELECT SUM(n_lang) AS n,
             -SUM((n_lang * 1.0 / (SELECT SUM(n_lang) FROM langs))
                  * log2(n_lang * 1.0 / (SELECT SUM(n_lang) FROM langs))) AS h_all,
             COUNT(*) AS k
      FROM langs
    ),
    pre AS (
      SELECT bucket, cl, n_lang - cl AS crr,
             SUM(cl) OVER (PARTITION BY bucket) AS snl,
             SUM(n_lang - cl) OVER (PARTITION BY bucket) AS snr
      FROM cum WHERE bucket < {_MDLP_BUCKETS - 1}
    ),
    per_t AS (
      SELECT bucket AS t, MAX(snl) AS nl, MAX(snr) AS nr,
             SUM(CASE WHEN cl > 0 THEN 1 ELSE 0 END) AS kl,
             SUM(CASE WHEN crr > 0 THEN 1 ELSE 0 END) AS kr,
             -SUM(CASE WHEN cl > 0 THEN (cl * 1.0 / snl) * log2(cl * 1.0 / snl)
                       ELSE 0 END) AS hl,
             -SUM(CASE WHEN crr > 0 THEN (crr * 1.0 / snr) * log2(crr * 1.0 / snr)
                       ELSE 0 END) AS hr
      FROM pre GROUP BY bucket
    ),
    scored AS (
      SELECT p.t, p.nl, p.nr,
             t2.h_all - (p.nl * 1.0 / t2.n) * p.hl - (p.nr * 1.0 / t2.n) * p.hr AS gain,
             (log2(t2.n - 1.0)
              + log2(power(3.0, t2.k) - 2.0)
              - (t2.k * t2.h_all - p.kl * p.hl - p.kr * p.hr)) / t2.n AS mdl_thr
      FROM per_t p CROSS JOIN tot t2
      WHERE p.nl > 0 AND p.nr > 0
    )
    SELECT CAST(t AS BIGINT) AS t, CAST(nl AS BIGINT) AS n_left,
           CAST(nr AS BIGINT) AS n_right, ROUND(gain, 6) AS gain,
           ROUND(mdl_thr, 6) AS mdl_threshold,
           CAST(CASE WHEN gain > mdl_thr THEN 1 ELSE 0 END AS BIGINT) AS accepted
    FROM scored
    ORDER BY gain DESC, t
    LIMIT {_MDLP_TOP}
    """,
    description=f"MDLP supervised split selection (Fayyad-Irani): {_MDLP_BUCKETS}-bucket equi-width histogram of document length vs language class, per-cut information gain and the MDL acceptance threshold (log2(n−1)+log2(3^k−2)−kH+k_lH_l+k_rH_r)/n from per-(bucket,lang) cumulative counts — the entire split search is one contingency aggregate plus window algebra over the bounded {_MDLP_BUCKETS}×|langs| frame; top-{_MDLP_TOP} cuts by gain with the accept/reject verdict",
)
def a0056_mdlp_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("n_chars", "lang")
    rng = docs.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    cont = (
        docs.crossJoin(F.broadcast(rng))
        .groupBy(
            F.least(
                F.lit(_MDLP_BUCKETS - 1),
                F.floor(
                    (F.col("n_chars") - F.col("mn"))
                    * float(_MDLP_BUCKETS)
                    / (F.col("mx") - F.col("mn") + 1)
                ),
            )
            .cast("long")
            .alias("bucket"),
            "lang",
        )
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    langs = cont.groupBy("lang").agg(F.sum("cnt").alias("n_lang"))
    shell = (
        spark.range(_MDLP_BUCKETS)
        .select(F.col("id").cast("long").alias("bucket"))
        .crossJoin(F.broadcast(langs))
    )
    wcum = Window.partitionBy("lang").orderBy("bucket")
    cum = (
        shell.join(cont, ["bucket", "lang"], "left")
        .select("bucket", "lang", "n_lang", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .withColumn("cl", F.sum("cnt").over(wcum))
        .localCheckpoint(eager=False)
    )
    n_total = F.sum("n_lang")
    tot = langs.agg(
        n_total.alias("n"), F.count("*").alias("k"), F.collect_list("n_lang").alias("_nl")
    ).select(
        "n",
        "k",
        (
            -F.aggregate(
                F.col("_nl"),
                F.lit(0.0),
                lambda acc, c: acc + (c / F.col("n")) * F.log2(c / F.col("n")),
            )
        ).alias("h_all"),
    )
    # per-candidate-cut entropies over the bounded (bucket x lang) frame
    wt = Window.partitionBy("bucket")
    cr = F.col("n_lang") - F.col("cl")
    per_t = (
        cum.filter(F.col("bucket") < _MDLP_BUCKETS - 1)
        .withColumn("snl", F.sum("cl").over(wt))
        .withColumn("snr", F.sum(cr).over(wt))
        .groupBy(F.col("bucket").alias("t"))
        .agg(
            F.first("snl").alias("nl"),
            F.first("snr").alias("nr"),
            F.sum(F.when(F.col("cl") > 0, 1).otherwise(0)).alias("kl"),
            F.sum(F.when(cr > 0, 1).otherwise(0)).alias("kr"),
            (
                -F.sum(
                    F.when(
                        F.col("cl") > 0,
                        (F.col("cl") / F.col("snl")) * F.log2(F.col("cl") / F.col("snl")),
                    ).otherwise(0.0)
                )
            ).alias("hl"),
            (
                -F.sum(
                    F.when(cr > 0, (cr / F.col("snr")) * F.log2(cr / F.col("snr"))).otherwise(0.0)
                )
            ).alias("hr"),
        )
    )
    gain = F.col("h_all") - (F.col("nl") / F.col("n")) * F.col("hl") - (
        F.col("nr") / F.col("n")
    ) * F.col("hr")
    mdl_thr = (
        F.log2(F.col("n") - 1.0)
        + F.log2(F.pow(F.lit(3.0), F.col("k")) - 2.0)
        - (F.col("k") * F.col("h_all") - F.col("kl") * F.col("hl") - F.col("kr") * F.col("hr"))
    ) / F.col("n")
    return (
        per_t.crossJoin(F.broadcast(tot))
        .filter((F.col("nl") > 0) & (F.col("nr") > 0))
        .select(
            F.col("t").cast("long").alias("t"),
            F.col("nl").cast("long").alias("n_left"),
            F.col("nr").cast("long").alias("n_right"),
            F.round(gain, 6).alias("gain"),
            F.round(mdl_thr, 6).alias("mdl_threshold"),
            F.when(gain > mdl_thr, 1).otherwise(0).cast("long").alias("accepted"),
        )
        .orderBy(F.desc("gain"), "t")
        .limit(_MDLP_TOP)
    )


# ---------------------------------------------------------------------------
# a0057 — RFM customer segmentation (the marketing-analytics classic):
# per-customer Recency (days since last order), Frequency (#orders),
# Monetary (cents-rounded spend), each scored 1–5 against exact
# interpolated quintile edges computed in ONE percentile aggregate
# (recency reversed — recent = 5), segment = the 3-digit RFM code.
# Edge membership is "count of edges ≤ x" (the a0158 rule — never an
# ntile over the customer table). Top-20 segments by size with the
# dust-free average spend (ROUND(SUM,2)/n, rounded at 6).
# ---------------------------------------------------------------------------

_RFM_TOP = 20
_RFM_QS = [0.2, 0.4, 0.6, 0.8]


@query(
    "a0057_rfm_segments",
    oracle=f"""
    WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mxd FROM orders),
    cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)), (SELECT mxd FROM mx)) AS r,
             COUNT(*) AS f,
             ROUND(SUM(o_totalprice), 2) AS m
      FROM orders GROUP BY o_custkey
    ),
    edges AS (
      SELECT quantile_cont(r, {_RFM_QS}) AS re,
             quantile_cont(f, {_RFM_QS}) AS fe,
             quantile_cont(m, {_RFM_QS}) AS me
      FROM cust
    ),
    scored AS (
      SELECT 5 - len(list_filter(re, e -> e <= r)) AS rs,
             1 + len(list_filter(fe, e -> e <= f)) AS fs,
             1 + len(list_filter(me, e -> e <= m)) AS ms,
             m
      FROM cust CROSS JOIN edges
    )
    SELECT CAST(rs AS VARCHAR) || CAST(fs AS VARCHAR) || CAST(ms AS VARCHAR) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(ROUND(SUM(m), 2) / COUNT(*), 6) AS avg_monetary
    FROM scored
    GROUP BY 1
    ORDER BY n_customers DESC, segment
    LIMIT {_RFM_TOP}
    """,
    description=f"RFM customer segmentation: per-customer recency/frequency/monetary scored 1-5 against exact interpolated quintile edges from ONE percentile aggregate (recency reversed), segment = 3-digit RFM code, membership = count-of-edges≤x (the a0158 scale rule — never ntile over the customer table), top-{_RFM_TOP} segments by size with dust-free average spend",
)
def a0057_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    mx = od.agg(F.max(F.col("o_orderdate").cast("date")).alias("mxd"))
    cust = (
        od.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("mxd"), F.max(F.col("o_orderdate").cast("date"))).alias("r"),
            F.count("*").alias("f"),
            F.round(F.sum("o_totalprice"), 2).alias("m"),
        )
        .localCheckpoint(eager=False)
    )
    qs = ", ".join(str(q) for q in _RFM_QS)
    edges = cust.agg(
        F.expr(f"percentile(r, array({qs}))").alias("re"),
        F.expr(f"percentile(f, array({qs}))").alias("fe"),
        F.expr(f"percentile(m, array({qs}))").alias("me"),
    )
    scored = cust.crossJoin(F.broadcast(edges)).select(
        (5 - F.size(F.filter(F.col("re"), lambda e: e <= F.col("r")))).alias("rs"),
        (1 + F.size(F.filter(F.col("fe"), lambda e: e <= F.col("f")))).alias("fs"),
        (1 + F.size(F.filter(F.col("me"), lambda e: e <= F.col("m")))).alias("ms"),
        "m",
    )
    return (
        scored.groupBy(
            F.concat(
                F.col("rs").cast("string"), F.col("fs").cast("string"), F.col("ms").cast("string")
            ).alias("segment")
        )
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.round(F.round(F.sum("m"), 2) / F.count("*"), 6).alias("avg_monetary"),
        )
        .orderBy(F.desc("n_customers"), "segment")
        .limit(_RFM_TOP)
    )


# ---------------------------------------------------------------------------
# a0058 — CART variance-reduction split finding (the regression twin of
# a0056's MDLP, and the inner loop of every gradient-boosted tree): for
# a 64-bucket equi-width histogram of l_quantity, accumulate the
# sufficient statistics (n, Σy, Σy²) of l_extendedprice per bucket,
# cumulative-sum them over the BUCKET frame, and score every candidate
# cut by SSE reduction gain(t) = SSE_tot − SSE_left(t) − SSE_right(t),
# each SSE from the closed form Σy² − (Σy)²/n. One data-level
# aggregate; the split search is window algebra over ≤64 rows — exactly
# how distributed GBT implementations (including Spark ML's) find
# splits from histogram bins rather than sorted data.
# ---------------------------------------------------------------------------

_CART_BUCKETS = 64
_CART_TOP = 5


@query(
    "a0058_cart_split",
    oracle=f"""
    WITH rng AS (SELECT MIN(l_quantity) AS mn, MAX(l_quantity) AS mx FROM lineitem),
    hist AS (
      SELECT LEAST({_CART_BUCKETS - 1},
                   CAST(FLOOR((l_quantity - mn) * {_CART_BUCKETS}.0 / (mx - mn + 1)) AS BIGINT))
               AS bucket,
             COUNT(*) AS n, SUM(l_extendedprice) AS sy,
             SUM(l_extendedprice * l_extendedprice) AS sy2
      FROM lineitem CROSS JOIN rng GROUP BY 1
    ),
    tot AS (
      SELECT SUM(n) AS nt, SUM(sy) AS syt, SUM(sy2) AS sy2t,
             SUM(sy2) - SUM(sy) * SUM(sy) / SUM(n) AS sse_tot
      FROM hist
    ),
    cum AS (
      SELECT bucket,
             SUM(n) OVER w AS nl, SUM(sy) OVER w AS syl, SUM(sy2) OVER w AS sy2l
      FROM hist
      WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
    ),
    scored AS (
      SELECT c.bucket AS t, c.nl, t2.nt - c.nl AS nr,
             t2.sse_tot
               - (c.sy2l - c.syl * c.syl / c.nl)
               - ((t2.sy2t - c.sy2l) - (t2.syt - c.syl) * (t2.syt - c.syl) / (t2.nt - c.nl))
               AS gain
      FROM cum c CROSS JOIN tot t2
      WHERE c.nl > 0 AND t2.nt - c.nl > 0
    )
    SELECT CAST(t AS BIGINT) AS t, CAST(nl AS BIGINT) AS n_left,
           CAST(nr AS BIGINT) AS n_right,
           ROUND(gain / (SELECT sse_tot FROM tot), 6) AS gain_share
    FROM scored
    ORDER BY gain DESC, t
    LIMIT {_CART_TOP}
    """,
    description=f"CART variance-reduction split finding (the inner loop of distributed GBTs): {_CART_BUCKETS}-bucket histogram of l_quantity carrying (n, Σy, Σy²) of l_extendedprice, cumulative sufficient statistics over the bounded bucket frame, every cut scored by SSE reduction via the closed form Σy²−(Σy)²/n, top-{_CART_TOP} splits by gain share — split search as window algebra over histogram bins, never over sorted data",
)
def a0058_cart_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    rng = li.agg(F.min("l_quantity").alias("mn"), F.max("l_quantity").alias("mx"))
    hist = (
        li.crossJoin(F.broadcast(rng))
        .groupBy(
            F.least(
                F.lit(_CART_BUCKETS - 1),
                F.floor(
                    (F.col("l_quantity") - F.col("mn"))
                    * float(_CART_BUCKETS)
                    / (F.col("mx") - F.col("mn") + 1)
                ),
            )
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("l_extendedprice").alias("sy"),
            F.sum(F.col("l_extendedprice") * F.col("l_extendedprice")).alias("sy2"),
        )
        .localCheckpoint(eager=False)
    )
    tot = hist.agg(
        F.sum("n").alias("nt"),
        F.sum("sy").alias("syt"),
        F.sum("sy2").alias("sy2t"),
        (F.sum("sy2") - F.sum("sy") * F.sum("sy") / F.sum("n")).alias("sse_tot"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bucket",
        F.sum("n").over(w).alias("nl"),
        F.sum("sy").over(w).alias("syl"),
        F.sum("sy2").over(w).alias("sy2l"),
    )
    nr = F.col("nt") - F.col("nl")
    gain = (
        F.col("sse_tot")
        - (F.col("sy2l") - F.col("syl") * F.col("syl") / F.col("nl"))
        - (
            (F.col("sy2t") - F.col("sy2l"))
            - (F.col("syt") - F.col("syl")) * (F.col("syt") - F.col("syl")) / nr
        )
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter((F.col("nl") > 0) & (nr > 0))
        .select(
            F.col("bucket").cast("long").alias("t"),
            F.col("nl").cast("long").alias("n_left"),
            nr.cast("long").alias("n_right"),
            F.round(gain / F.col("sse_tot"), 6).alias("gain_share"),
        )
        .orderBy(F.desc(gain), "t")
        .limit(_CART_TOP)
    )


# ---------------------------------------------------------------------------
# a0059 — Benjamini-Hochberg FDR control over a family of two-proportion
# tests: 64 deterministic user cohorts (md5 buckets), each testing
# whether its purchase share changed between the two half-months;
# two-sided p-values from the Abramowitz-Stegun 7.1.26 polynomial
# normal CDF (identical literal constants on both engines — no erf
# needed), then the BH step-up: reject the k smallest p-values where
# k = max{{i : p_(i) ≤ i·α/m}}. The step-up scan is window algebra over
# the bounded 64-row hypothesis frame — the multiple-testing guard any
# platform running thousands of concurrent experiments needs.
# ---------------------------------------------------------------------------

_BH_BUCKETS = 64
_BH_ALPHA = 0.10
_BH_SPLIT = "2024-01-16"
_BH_TOP = 15
# Abramowitz & Stegun 7.1.26 constants for Phi(x), x >= 0
_AS_T = 0.2316419
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)


def _phi_sql(x: str) -> str:
    """1 - Phi(x) for x >= 0 via A&S 7.1.26 (SQL text, engine-shared)."""
    t = f"(1.0 / (1.0 + {_AS_T} * {x}))"
    poly = " + ".join(f"{b} * power({t}, {i})" for i, b in enumerate(_AS_B, start=1))
    return f"(exp(-({x}) * ({x}) / 2.0) / sqrt(2.0 * pi()) * ({poly}))"


@query(
    "a0059_bh_fdr",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS BIGINT)
               % {_BH_BUCKETS} AS bucket,
             CASE WHEN ts < TIMESTAMP '{_BH_SPLIT} 00:00:00' THEN 'a' ELSE 'b' END AS half,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    agg AS (
      SELECT bucket,
             SUM(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN half = 'a' THEN hit ELSE 0 END) AS ka,
             SUM(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS nb,
             SUM(CASE WHEN half = 'b' THEN hit ELSE 0 END) AS kb
      FROM ev GROUP BY bucket
    ),
    z AS (
      SELECT bucket, na, ka, nb, kb,
             CASE WHEN na = 0 OR nb = 0 OR ka + kb = 0 OR ka + kb = na + nb THEN 0.0
                  ELSE (ka * 1.0 / na - kb * 1.0 / nb)
                       / sqrt(((ka + kb) * 1.0 / (na + nb))
                              * (1.0 - (ka + kb) * 1.0 / (na + nb))
                              * (1.0 / na + 1.0 / nb))
             END AS zs
      FROM agg
    ),
    pv AS (SELECT bucket, zs, 2.0 * {_phi_sql("abs(zs)")} AS p FROM z),
    ranked AS (
      SELECT bucket, zs, p,
             ROW_NUMBER() OVER (ORDER BY p, bucket) AS rk
      FROM pv
    ),
    kstar AS (
      SELECT COALESCE(MAX(CASE WHEN p <= rk * {_BH_ALPHA} / {_BH_BUCKETS}
                               THEN rk END), 0) AS k
      FROM ranked
    )
    SELECT CAST(r.bucket AS BIGINT) AS bucket, ROUND(r.zs, 4) AS z_stat,
           ROUND(r.p, 6) AS p_value, CAST(r.rk AS BIGINT) AS p_rank,
           ROUND(r.rk * {_BH_ALPHA} / {_BH_BUCKETS}, 6) AS bh_crit,
           CAST(CASE WHEN r.rk <= (SELECT k FROM kstar) THEN 1 ELSE 0 END AS BIGINT)
             AS rejected
    FROM ranked r
    ORDER BY r.rk
    LIMIT {_BH_TOP}
    """,
    description=f"Benjamini-Hochberg FDR control over {_BH_BUCKETS} two-proportion tests (purchase-share change between half-months per md5 user cohort): two-sided p-values from the Abramowitz-Stegun 7.1.26 polynomial normal CDF (identical literals both engines, degenerate pools guarded), BH step-up reject k = max{{i : p_(i) ≤ iα/m}} at α={_BH_ALPHA} as window algebra over the bounded {_BH_BUCKETS}-row hypothesis frame; top-{_BH_TOP} by p — the multiple-testing guard for platforms running many concurrent experiments",
)
def a0059_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    split = F.lit(_BH_SPLIT).cast("timestamp_ntz")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10).cast("long")
        % _BH_BUCKETS
    )
    hit = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    in_a = F.col("ts") < split
    agg = ev.groupBy(bucket.alias("bucket")).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).alias("na"),
        F.sum(F.when(in_a, hit).otherwise(0)).alias("ka"),
        F.sum(F.when(~in_a, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(~in_a, hit).otherwise(0)).alias("kb"),
    )
    pool = (F.col("ka") + F.col("kb")) * 1.0 / (F.col("na") + F.col("nb"))
    zs = F.when(
        (F.col("na") == 0)
        | (F.col("nb") == 0)
        | (F.col("ka") + F.col("kb") == 0)
        | (F.col("ka") + F.col("kb") == F.col("na") + F.col("nb")),
        F.lit(0.0),
    ).otherwise(
        (F.col("ka") * 1.0 / F.col("na") - F.col("kb") * 1.0 / F.col("nb"))
        / F.sqrt(pool * (1.0 - pool) * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    )
    z = agg.select("bucket", "na", "ka", "nb", "kb", zs.alias("zs"))
    t = 1.0 / (1.0 + _AS_T * F.abs(F.col("zs")))
    poly = None
    for i, b in enumerate(_AS_B, start=1):
        term = F.lit(b) * F.pow(t, F.lit(float(i)))
        poly = term if poly is None else poly + term
    upper_tail = (
        F.exp(-F.abs(F.col("zs")) * F.abs(F.col("zs")) / 2.0)
        / F.sqrt(F.lit(2.0) * F.lit(3.141592653589793))
        * poly
    )
    pv = z.select("bucket", "zs", (2.0 * upper_tail).alias("p"))
    wr = Window.orderBy("p", "bucket")  # 64-row hypothesis frame
    ranked = pv.withColumn("rk", F.row_number().over(wr)).localCheckpoint(eager=False)
    kstar = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("p") <= F.col("rk") * _BH_ALPHA / _BH_BUCKETS, F.col("rk"))),
            F.lit(0),
        ).alias("k")
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.round("zs", 4).alias("z_stat"),
            F.round("p", 6).alias("p_value"),
            F.col("rk").cast("long").alias("p_rank"),
            F.round(F.col("rk") * _BH_ALPHA / _BH_BUCKETS, 6).alias("bh_crit"),
            F.when(F.col("rk") <= F.col("k"), 1).otherwise(0).cast("long").alias("rejected"),
        )
        .orderBy("p_rank")
        .limit(_BH_TOP)
    )


# ---------------------------------------------------------------------------
# a0060 — three unrolled EM iterations for a 1-D two-component Gaussian
# mixture over document lengths: deterministic init (μ = exact 25th/75th
# percentiles, σ² = var_pop, π = ½), then per round one E-step
# projection (responsibilities from the component densities) and one
# M-step aggregate (closed-form π, μ, σ² from Σr, Σrx, Σrx²) — the
# canonical "EM at scale" shape: model state is a broadcast 1-row frame,
# each iteration is ONE pass, nothing is collected. Log-likelihood
# reported per component row to expose the fit.
# ---------------------------------------------------------------------------

_EM_ROUNDS = 3


def _em_oracle() -> str:
    prev = "init"
    rounds = []
    for r in range(1, _EM_ROUNDS + 1):
        rounds.append(f"""
    e{r} AS (
      SELECT x,
             (pi2 * exp(-(x - mu2) * (x - mu2) / (2 * s2b)) / sqrt(2 * pi() * s2b))
             / ((1 - pi2) * exp(-(x - mu1) * (x - mu1) / (2 * s2a)) / sqrt(2 * pi() * s2a)
                + pi2 * exp(-(x - mu2) * (x - mu2) / (2 * s2b)) / sqrt(2 * pi() * s2b)) AS r2,
             (1 - pi2) * exp(-(x - mu1) * (x - mu1) / (2 * s2a)) / sqrt(2 * pi() * s2a)
                + pi2 * exp(-(x - mu2) * (x - mu2) / (2 * s2b)) / sqrt(2 * pi() * s2b) AS lik
      FROM d CROSS JOIN {prev}
    ),
    m{r} AS (
      SELECT SUM(r2) / COUNT(*) AS pi2,
             SUM((1 - r2) * x) / SUM(1 - r2) AS mu1,
             SUM(r2 * x) / SUM(r2) AS mu2,
             SUM((1 - r2) * x * x) / SUM(1 - r2)
               - (SUM((1 - r2) * x) / SUM(1 - r2)) * (SUM((1 - r2) * x) / SUM(1 - r2)) AS s2a,
             SUM(r2 * x * x) / SUM(r2)
               - (SUM(r2 * x) / SUM(r2)) * (SUM(r2 * x) / SUM(r2)) AS s2b,
             SUM(ln(lik)) AS loglik
      FROM e{r}
    )""")
        prev = f"m{r}"
    return f"""
    WITH d AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents),
    init AS (
      SELECT 0.5 AS pi2, quantile_cont(x, 0.25) AS mu1, quantile_cont(x, 0.75) AS mu2,
             var_pop(x) AS s2a, var_pop(x) AS s2b, 0.0 AS loglik
      FROM d
    ),{",".join(rounds)}
    SELECT CAST(1 AS BIGINT) AS component, ROUND(1 - pi2, 6) AS pi,
           ROUND(mu1, 4) AS mu, ROUND(s2a, 2) AS sigma2, ROUND(loglik, 4) AS loglik
    FROM m{_EM_ROUNDS}
    UNION ALL
    SELECT CAST(2 AS BIGINT), ROUND(pi2, 6), ROUND(mu2, 4), ROUND(s2b, 2), ROUND(loglik, 4)
    FROM m{_EM_ROUNDS}
    ORDER BY component
    """


# Scale rule (100 TB): component count is a domain constant (model
# order): responsibilities are one broadcast-parameter pass (N x k work),
# the M-step a k-bounded aggregate — same shape rule as a0070.
@query(
    "a0060_em_gmm_step",
    oracle=_em_oracle(),
    description=f"{_EM_ROUNDS} unrolled EM iterations for a 1-D two-component Gaussian mixture over document lengths (deterministic init: μ from exact quartiles, σ²=var_pop, π=½): each round is one E-step projection against the broadcast 1-row parameter frame plus one closed-form M-step aggregate (π, μ, σ² from Σr, Σrx, Σrx²) — the canonical distributed-EM shape (state broadcast, one pass per iteration, no collect); final parameters + log-likelihood per component",
)
def a0060_em_gmm_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("n_chars").cast("double").alias("x"))
        .localCheckpoint(eager=False)
    )
    params = d.agg(
        F.lit(0.5).alias("pi2"),
        F.expr("percentile(x, 0.25)").alias("mu1"),
        F.expr("percentile(x, 0.75)").alias("mu2"),
        F.var_pop("x").alias("s2a"),
        F.var_pop("x").alias("s2b"),
        F.lit(0.0).alias("loglik"),
    ).localCheckpoint(eager=False)
    two_pi = 2.0 * 3.141592653589793
    for _ in range(_EM_ROUNDS):
        n1 = (
            (1 - F.col("pi2"))
            * F.exp(-(F.col("x") - F.col("mu1")) * (F.col("x") - F.col("mu1")) / (2 * F.col("s2a")))
            / F.sqrt(two_pi * F.col("s2a"))
        )
        n2 = (
            F.col("pi2")
            * F.exp(-(F.col("x") - F.col("mu2")) * (F.col("x") - F.col("mu2")) / (2 * F.col("s2b")))
            / F.sqrt(two_pi * F.col("s2b"))
        )
        e = d.crossJoin(F.broadcast(params)).select(
            "x", (n2 / (n1 + n2)).alias("r2"), (n1 + n2).alias("lik")
        )
        r1 = 1 - F.col("r2")
        params = e.agg(
            (F.sum("r2") / F.count("*")).alias("pi2"),
            (F.sum(r1 * F.col("x")) / F.sum(r1)).alias("mu1"),
            (F.sum(F.col("r2") * F.col("x")) / F.sum("r2")).alias("mu2"),
            (
                F.sum(r1 * F.col("x") * F.col("x")) / F.sum(r1)
                - (F.sum(r1 * F.col("x")) / F.sum(r1)) * (F.sum(r1 * F.col("x")) / F.sum(r1))
            ).alias("s2a"),
            (
                F.sum(F.col("r2") * F.col("x") * F.col("x")) / F.sum("r2")
                - (F.sum(F.col("r2") * F.col("x")) / F.sum("r2"))
                * (F.sum(F.col("r2") * F.col("x")) / F.sum("r2"))
            ).alias("s2b"),
            F.sum(F.log("lik")).alias("loglik"),
        ).localCheckpoint(eager=False)
    one = params.select(
        F.lit(1).cast("long").alias("component"),
        F.round(1 - F.col("pi2"), 6).alias("pi"),
        F.round("mu1", 4).alias("mu"),
        F.round("s2a", 2).alias("sigma2"),
        F.round("loglik", 4).alias("loglik"),
    )
    two = params.select(
        F.lit(2).cast("long").alias("component"),
        F.round("pi2", 6).alias("pi"),
        F.round("mu2", 4).alias("mu"),
        F.round("s2b", 2).alias("sigma2"),
        F.round("loglik", 4).alias("loglik"),
    )
    return one.unionByName(two).orderBy("component")


# ---------------------------------------------------------------------------
# a0061 — PCA via one covariance pass + MATRIX SQUARING: the 4×4
# covariance matrix of the first four embedding coordinates comes from
# ONE covar_pop aggregate (the only data pass); the dominant eigenvector
# is then extracted by squaring the (trace-normalized) matrix 8 times —
# C^256 — and applying it to a generic start vector. Squaring doubles
# the power per round (vs +1 for vanilla power iteration), so even the
# near-isotropic spectrum of random embeddings converges to machine
# precision in 8 rounds of bounded 1-row matrix algebra; the per-round
# trace normalization stops λ^2^k underflow. Output: first PC loadings
# (sign-fixed), eigenvalue v'Cv, and explained-variance share.
# ---------------------------------------------------------------------------

_PCA_DIMS = 4
_PCA_SQUARINGS = 8  # C^(2^8): (lambda2/lambda1)^256 kills even tiny eigengaps


def _pca_oracle() -> str:
    D = _PCA_DIMS
    covs = ",\n             ".join(
        f"covar_pop(e{i}, e{j}) AS c{i}{j}" for i in range(D) for j in range(D) if i <= j
    )

    def m(pfx, i, j):
        return f"{pfx}{min(i, j)}{max(i, j)}"

    trace0 = " + ".join(f"c{i}{i}" for i in range(D))
    init = ", ".join(
        f"c{i}{j} / ({trace0}) AS m{i}{j}" for i in range(D) for j in range(D) if i <= j
    )
    rounds = []
    for r in range(1, _PCA_SQUARINGS + 1):
        prods = ", ".join(
            " + ".join(f"{m('m', i, k)} * {m('m', k, j)}" for k in range(D)) + f" AS q{i}{j}"
            for i in range(D)
            for j in range(D)
            if i <= j
        )
        tq = " + ".join(f"q{i}{i}" for i in range(D))
        norm = ", ".join(
            f"q{i}{j} / ({tq}) AS m{i}{j}" for i in range(D) for j in range(D) if i <= j
        )
        rounds.append(
            f"""
    q{r} AS (SELECT *, {prods} FROM sq{r - 1}),
    sq{r} AS (SELECT {", ".join(f"c{i}{j}" for i in range(D) for j in range(D) if i <= j)}, {norm} FROM q{r})"""
        )
    uraw = ", ".join(
        " + ".join(f"{m('m', i, j)} * 0.5" for j in range(D)) + f" AS u{i}" for i in range(D)
    )
    unrm = " + ".join(f"u{i} * u{i}" for i in range(D))
    vs = ", ".join(f"u{i} / sqrt({unrm}) AS v{i}" for i in range(D))
    lam = " + ".join(
        f"v{i} * ({' + '.join(f'{m(chr(99), i, j)} * v{j}' for j in range(D))})" for i in range(D)
    )
    dims_rows = "\n    UNION ALL ".join(
        f"SELECT {i} AS dim, sgn * v{i} AS loading, lam, shr FROM fin" for i in range(D)
    )
    return f"""
    WITH mom AS (
      SELECT {covs}
      FROM (SELECT embedding[1] AS e0, embedding[2] AS e1,
                   embedding[3] AS e2, embedding[4] AS e3 FROM embeddings)
    ),
    sq0 AS (SELECT *, {init} FROM mom),{",".join(rounds)},
    uv AS (SELECT *, {uraw} FROM sq{_PCA_SQUARINGS}),
    vv AS (SELECT *, {vs} FROM uv),
    fin AS (
      SELECT v0, v1, v2, v3,
             CASE WHEN v0 < 0 THEN -1.0 ELSE 1.0 END AS sgn,
             {lam} AS lam,
             ({lam}) / ({trace0}) AS shr
      FROM vv
    )
    SELECT CAST(dim AS BIGINT) AS dim, ROUND(loading, 6) AS loading,
           ROUND(lam, 6) AS eigenvalue, ROUND(shr, 6) AS explained_share
    FROM ({dims_rows})
    ORDER BY dim
    """


# Scale rule (100 TB): rounds are log-bounded by construction (trace-
# normalized matrix SQUARING: 8 squarings = C^256) and the only data-
# sized stage is the one covariance aggregate; d x d frames are
# dimension-bounded.
@query(
    "a0061_pca_power",
    oracle=_pca_oracle(),
    description=f"PCA via one covariance pass + matrix squaring: {_PCA_DIMS}×{_PCA_DIMS} covar_pop matrix from ONE aggregate (the only data pass), dominant eigenvector from C^(2^{_PCA_SQUARINGS}) built by {_PCA_SQUARINGS} trace-normalized squarings over the 1-row moment frame (squaring doubles the power per round, so near-isotropic spectra still converge to machine precision; normalization stops underflow); first PC loadings sign-fixed at v0 ≥ 0, eigenvalue v'Cv, explained share of trace — iteration touches bounded state, never data",
)
def a0061_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    D = _PCA_DIMS
    emb = load_table(spark, sf_dir, "embeddings").select(
        *[F.col("embedding")[i].alias(f"e{i}") for i in range(D)]
    )
    # ONE data pass: the d x d covariance aggregate. Everything after it
    # is arithmetic over 10 scalars, so it runs DRIVER-SIDE (r14): the
    # former in-plan squaring chain re-selected the 1-row frame 16 times,
    # needed two eager localCheckpoint jobs just to cap Catalyst analysis
    # cost, and fanned the output through a 4-branch union — 3+ jobs and
    # ~3 s of floor for what is 4x4 matrix math on bounded state (the
    # guide's "driver does no DATA work" rule cuts the other way here:
    # this is not data work). Python floats are IEEE doubles and every
    # sum below keeps the exact left-to-right operand order of the old
    # column expressions AND the DuckDB oracle, so the values are
    # bit-identical; the 6-dp rounding still happens in Spark (HALF_UP,
    # matching DuckDB ROUND — Python round() is banker's and never used).
    row = emb.agg(
        *[
            F.covar_pop(f"e{i}", f"e{j}").alias(f"c{i}{j}")
            for i in range(D)
            for j in range(D)
            if i <= j
        ]
    ).collect()[0]
    c = {}
    for i in range(D):
        for j in range(D):
            if i <= j:
                c[(i, j)] = float(row[f"c{i}{j}"])

    def cc(i, j):
        return c[(min(i, j), max(i, j))]

    trace0 = sum((cc(i, i) for i in range(1, D)), cc(0, 0))
    m = {
        (i, j): cc(i, j) / trace0 for i in range(D) for j in range(D) if i <= j
    }

    def mm(i, j):
        return m[(min(i, j), max(i, j))]

    for _ in range(_PCA_SQUARINGS):
        q = {
            (i, j): sum((mm(i, k) * mm(k, j) for k in range(1, D)), mm(i, 0) * mm(0, j))
            for i in range(D)
            for j in range(D)
            if i <= j
        }
        tq = sum((q[(i, i)] for i in range(1, D)), q[(0, 0)])
        m = {k: v / tq for k, v in q.items()}
    u = [
        sum((mm(i, j) * 0.5 for j in range(1, D)), mm(i, 0) * 0.5) for i in range(D)
    ]
    import math

    unrm = math.sqrt(sum((u[i] * u[i] for i in range(1, D)), u[0] * u[0]))
    v = [u[i] / unrm for i in range(D)]
    lam = sum(
        (
            v[i] * sum((cc(i, j) * v[j] for j in range(1, D)), cc(i, 0) * v[0])
            for i in range(1, D)
        ),
        v[0] * sum((cc(0, j) * v[j] for j in range(1, D)), cc(0, 0) * v[0]),
    )
    sgn = -1.0 if v[0] < 0 else 1.0
    shr = lam / trace0
    out = spark.createDataFrame(
        [(i, sgn * v[i], lam, shr) for i in range(D)],
        "dim long, loading double, eigenvalue double, explained_share double",
    )
    return out.select(
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round("eigenvalue", 6).alias("eigenvalue"),
        F.round("explained_share", 6).alias("explained_share"),
    ).orderBy("dim")


# ---------------------------------------------------------------------------
# a0062 — distance-based outlier detection (Knorr-Ng DB(ε, minpts)
# outliers), grid-blocked and EXACT: points on the first two embedding
# coordinates, a 16×16 equal-width grid, ε = min(cell width, cell
# height) — so every ε-neighbor provably lies in the 3×3 cell
# neighborhood and the blocked pair join loses nothing. A point is an
# outlier when fewer than 3 other points sit within ε. The pair stage
# is the same bounded block join the dedup/ANN family uses — never
# all-pairs — and the weakest-neighborhood points are reported.
# ---------------------------------------------------------------------------

_DO_GRID = 16
_DO_MINPTS = 3
_DO_TOP = 20


# Scale rule (100 TB): the grid width bounds each point's candidate
# neighborhood (27 cells) — the knob is cell width ~ eps, and the per-
# cell count cap is the skew guard; never all-pairs.
@query(
    "a0062_distance_outliers",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id, embedding[1] AS e0, embedding[2] AS e1 FROM embeddings
    ),
    rng AS (
      SELECT MIN(e0) AS mn0, MAX(e0) AS mx0, MIN(e1) AS mn1, MAX(e1) AS mx1,
             LEAST((MAX(e0) - MIN(e0)) / {_DO_GRID},
                   (MAX(e1) - MIN(e1)) / {_DO_GRID}) AS eps
      FROM pts
    ),
    cells AS (
      SELECT vec_id, e0, e1, eps,
             LEAST({_DO_GRID - 1},
                   CAST(FLOOR((e0 - mn0) / ((mx0 - mn0) / {_DO_GRID})) AS BIGINT)) AS gx,
             LEAST({_DO_GRID - 1},
                   CAST(FLOOR((e1 - mn1) / ((mx1 - mn1) / {_DO_GRID})) AS BIGINT)) AS gy
      FROM pts CROSS JOIN rng
    ),
    nbr AS (
      SELECT a.vec_id, COUNT(b.vec_id) AS n_neighbors
      FROM cells a LEFT JOIN cells b
        ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
       AND a.vec_id <> b.vec_id
       AND (a.e0 - b.e0) * (a.e0 - b.e0) + (a.e1 - b.e1) * (a.e1 - b.e1)
           <= a.eps * a.eps
      GROUP BY a.vec_id
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(n_neighbors AS BIGINT) AS n_neighbors,
           CAST(CASE WHEN n_neighbors < {_DO_MINPTS} THEN 1 ELSE 0 END AS BIGINT)
             AS is_outlier
    FROM nbr
    ORDER BY n_neighbors, vec_id
    LIMIT {_DO_TOP}
    """,
    description=f"distance-based outlier detection (Knorr-Ng DB(ε,{_DO_MINPTS})), grid-blocked and EXACT: {_DO_GRID}×{_DO_GRID} grid over the first two embedding coordinates with ε = min cell dimension, so every ε-neighbor provably lies in the 3×3 neighborhood and the blocked pair join is lossless; outlier = fewer than {_DO_MINPTS} points within ε, top-{_DO_TOP} weakest neighborhoods — the same bounded block-join shape as the dedup/ANN family, never all-pairs",
)
def a0062_distance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding")[0].alias("e0"), F.col("embedding")[1].alias("e1")
    )
    g = float(_DO_GRID)
    rng = pts.agg(
        F.min("e0").alias("mn0"),
        F.max("e0").alias("mx0"),
        F.min("e1").alias("mn1"),
        F.max("e1").alias("mx1"),
        F.least(
            (F.max("e0") - F.min("e0")) / g, (F.max("e1") - F.min("e1")) / g
        ).alias("eps"),
    )
    cells = (
        pts.crossJoin(F.broadcast(rng))
        .select(
            "vec_id",
            "e0",
            "e1",
            "eps",
            F.least(
                F.lit(_DO_GRID - 1),
                F.floor((F.col("e0") - F.col("mn0")) / ((F.col("mx0") - F.col("mn0")) / g)),
            ).cast("long").alias("gx"),
            F.least(
                F.lit(_DO_GRID - 1),
                F.floor((F.col("e1") - F.col("mn1")) / ((F.col("mx1") - F.col("mn1")) / g)),
            ).cast("long").alias("gy"),
        )
        .localCheckpoint(eager=False)
    )
    a, b = cells.alias("a"), cells.alias("b")
    d2 = (F.col("a.e0") - F.col("b.e0")) * (F.col("a.e0") - F.col("b.e0")) + (
        F.col("a.e1") - F.col("b.e1")
    ) * (F.col("a.e1") - F.col("b.e1"))
    nbr = (
        a.join(
            b,
            (F.abs(F.col("a.gx") - F.col("b.gx")) <= 1)
            & (F.abs(F.col("a.gy") - F.col("b.gy")) <= 1)
            & (F.col("a.vec_id") != F.col("b.vec_id"))
            & (d2 <= F.col("a.eps") * F.col("a.eps")),
            "left",
        )
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(F.count(F.col("b.vec_id")).alias("n_neighbors"))
    )
    return (
        nbr.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("n_neighbors").cast("long").alias("n_neighbors"),
            F.when(F.col("n_neighbors") < _DO_MINPTS, 1).otherwise(0).cast("long").alias("is_outlier"),
        )
        .orderBy("n_neighbors", "vec_id")
        .limit(_DO_TOP)
    )


# ---------------------------------------------------------------------------
# a0063 — multinomial naive Bayes language classifier, trained AND
# scored distributed: deterministic md5 train/test split, training =
# ONE (lang, token) count aggregate + Laplace smoothing over the train
# vocabulary, scoring = explode test tokens (with multiplicity) against
# the broadcast class frame, left-join the count table for
# ln((c+1)/(tot+V)), sum per (doc, class), argmax with tie-break. The
# confusion matrix is the output — and on THIS corpus it honestly shows
# the lang labels are not text-derivable (shared vocabulary), which is
# exactly what a label-leakage audit should surface. Same tokenizer as
# the rest of the text stack (operators/text.py tokens()).
# ---------------------------------------------------------------------------


@query(
    "a0063_naive_bayes_langid",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS is_train,
             unnest(list_filter(string_split_regex(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +'), x -> x <> '')) AS tok
      FROM documents
    ),
    counts AS (
      SELECT lang, tok, COUNT(*) AS c FROM toks WHERE is_train GROUP BY lang, tok
    ),
    cls AS (
      SELECT lang, SUM(c) AS tot FROM counts GROUP BY lang
    ),
    vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM counts),
    priors AS (
      SELECT lang, COUNT(DISTINCT doc_id) AS n_docs,
             ln(COUNT(DISTINCT doc_id) * 1.0
                / (SELECT COUNT(DISTINCT doc_id) FROM toks WHERE is_train)) AS lp
      FROM toks WHERE is_train GROUP BY lang
    ),
    test_docs AS (SELECT DISTINCT doc_id, lang AS true_lang FROM toks WHERE NOT is_train),
    tok_scores AS (
      SELECT t.doc_id, cl.lang,
             SUM(ln((COALESCE(c.c, 0) + 1.0) / (cl.tot + v.v))) AS ts
      FROM toks t
      CROSS JOIN cls cl
      CROSS JOIN vocab v
      LEFT JOIN counts c ON c.lang = cl.lang AND c.tok = t.tok
      WHERE NOT t.is_train
      GROUP BY t.doc_id, cl.lang
    ),
    scored AS (
      SELECT d.doc_id, d.true_lang, p.lang AS pred,
             p.lp + COALESCE(s.ts, 0.0) AS score
      FROM test_docs d
      CROSS JOIN priors p
      LEFT JOIN tok_scores s ON s.doc_id = d.doc_id AND s.lang = p.lang
    ),
    best AS (
      SELECT doc_id, true_lang, pred FROM (
        SELECT doc_id, true_lang, pred,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, pred DESC) AS rk
        FROM scored
      ) WHERE rk = 1
    )
    SELECT true_lang, pred AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM best GROUP BY true_lang, pred
    ORDER BY true_lang, pred_lang
    """,
    description="multinomial naive Bayes language classifier trained and scored distributed: deterministic md5 train/test split, training = one (lang, token) count aggregate with Laplace smoothing over the train vocabulary, scoring = test-token explode against the broadcast class frame + left-join log-likelihoods + per-(doc,class) sum + tie-broken argmax; output = test confusion matrix — which on this shared-vocabulary corpus honestly exposes that lang labels are NOT text-derivable (a label-leakage audit); same tokenizer as the whole text stack",
)
def a0063_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8").alias("is_train"),
        F.explode(X.tokens("text")).alias("tok"),
    ).localCheckpoint(eager=False)
    train = docs.filter(F.col("is_train"))
    counts = train.groupBy("lang", "tok").agg(F.count("*").alias("c")).localCheckpoint(eager=False)
    cls = counts.groupBy("lang").agg(F.sum("c").alias("tot"))
    vocab = counts.agg(F.countDistinct("tok").alias("v"))
    n_train_docs = train.select("doc_id").distinct().count()  # 1 scalar, driver-safe
    priors = (
        train.groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .select("lang", F.log(F.col("n_docs") * 1.0 / n_train_docs).alias("lp"))
    )
    test = docs.filter(~F.col("is_train"))
    test_docs = test.select("doc_id", F.col("lang").alias("true_lang")).distinct()
    clsx = cls.crossJoin(F.broadcast(vocab)).select(
        F.col("lang").alias("c_lang"), "tot", "v"
    )
    cnt = counts.select(F.col("lang").alias("k_lang"), F.col("tok").alias("k_tok"), "c")
    tok_scores = (
        test.crossJoin(F.broadcast(clsx))
        .join(
            F.broadcast(cnt),
            (F.col("c_lang") == F.col("k_lang")) & (F.col("tok") == F.col("k_tok")),
            "left",
        )
        .groupBy("doc_id", "c_lang")
        .agg(
            F.sum(F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("tot") + F.col("v"))))
            .alias("ts")
        )
        # rename: tok_scores derives from the same docs scan as test_docs,
        # so keep no shared attribute names across the upcoming join
        .select(F.col("doc_id").alias("s_did"), F.col("c_lang").alias("s_lang"), "ts")
    )
    pr = priors.select(F.col("lang").alias("pred"), "lp")
    scored = (
        test_docs.crossJoin(F.broadcast(pr))
        .join(
            tok_scores,
            (F.col("doc_id") == F.col("s_did")) & (F.col("pred") == F.col("s_lang")),
            "left",
        )
        .select(
            F.col("doc_id").alias("did"),
            "true_lang",
            "pred",
            (F.col("lp") + F.coalesce(F.col("ts"), F.lit(0.0))).alias("score"),
        )
    )
    best = (
        scored.groupBy("did", "true_lang")
        .agg(F.max(F.struct(F.col("score"), F.col("pred")))["pred"].alias("pred_lang"))
    )
    return (
        best.groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# a0064 — stationary distribution of the session Markov chain by matrix
# SQUARING: the row-stochastic event-type transition matrix (the exact
# a0116 construction — 30-minute gap sessions, one lead window
# partitioned by user×session) is raised to the 32nd power via five
# squarings T→T² on the ≤|types|² bounded transition frame, and π =
# uniform·T³² — the long-run next-action mix. Squaring doubles the
# horizon per join (like a0100's pointer doubling), so convergence
# costs log₂ rounds of bounded-frame joins, never passes over events.
# ---------------------------------------------------------------------------

_MK_SQUARINGS = 5


def _mk_oracle() -> str:
    prev = "t1"
    sq = []
    for r in range(_MK_SQUARINGS):
        cur = f"t{2 ** (r + 1)}"
        sq.append(
            f"""
    {cur} AS (
      SELECT a.i, b.j, SUM(a.p * b.p) AS p
      FROM {prev} a JOIN {prev} b ON a.j = b.i
      GROUP BY a.i, b.j
    )"""
        )
        prev = cur
    return f"""
    WITH o AS (SELECT user_id, ts, event_type,
                      CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                > INTERVAL 30 MINUTES
                           OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                           THEN 1 ELSE 0 END AS new_s,
                      event_id
               FROM events),
    s AS (SELECT user_id, ts, event_id, event_type,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
          FROM o),
    tr AS (SELECT event_type AS cur,
                  LEAD(event_type) OVER (PARTITION BY user_id, sess ORDER BY ts, event_id) AS nxt
           FROM s),
    c AS (SELECT cur, nxt, COUNT(*) AS n FROM tr WHERE nxt IS NOT NULL GROUP BY cur, nxt),
    t1 AS (
      SELECT c.cur AS i, c.nxt AS j, c.n * 1.0 / t.n_out AS p
      FROM c JOIN (SELECT cur, SUM(n) AS n_out FROM c GROUP BY cur) t ON c.cur = t.cur
    ),{",".join(sq)},
    states AS (SELECT i FROM t1 GROUP BY i),
    pi AS (
      SELECT t.j AS state, SUM(t.p) / (SELECT COUNT(*) FROM states) AS prob
      FROM {prev} t GROUP BY t.j
    )
    SELECT state, ROUND(prob, 6) AS stationary_prob
    FROM pi ORDER BY state
    """


# Scale rule (100 TB): T^32 via 5 doublings is state-count-bounded
# (transition matrix is |states|^2, a catalog frame); the only data-sized
# stage is the transition-count aggregate.
@query(
    "a0064_markov_stationary",
    oracle=_mk_oracle(),
    description=f"stationary distribution of the session Markov chain via matrix squaring: the a0116 row-stochastic transition matrix (30-min gap sessions, lead window partitioned by user×session) raised to 2^{_MK_SQUARINGS} with {_MK_SQUARINGS} T→T² joins on the bounded |types|² frame, π = uniform·T³² — the long-run next-action mix; horizon doubles per join, so convergence costs log₂ rounds over bounded state, never extra passes over events",
)
def a0064_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(wo).isNull()
            | (F.col("ts") - F.lag("ts").over(wo) > F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    s = o.withColumn("sess", F.sum("new_s").over(wo.rowsBetween(Window.unboundedPreceding, 0)))
    tr = s.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id", "sess").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    c = (
        tr.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    tot = c.groupBy("cur").agg(F.sum("n").alias("n_out"))
    t = (
        c.join(tot, "cur")
        .select(
            F.col("cur").alias("i"), F.col("nxt").alias("j"), (F.col("n") / F.col("n_out")).alias("p")
        )
        .localCheckpoint(eager=False)
    )
    n_states = t.select("i").distinct().count()  # bounded |event types|
    for _ in range(_MK_SQUARINGS):
        a, b = t.alias("a"), t.alias("b")
        t = (
            a.join(b, F.col("a.j") == F.col("b.i"))
            .groupBy(F.col("a.i").alias("i"), F.col("b.j").alias("j"))
            .agg(F.sum(F.col("a.p") * F.col("b.p")).alias("p"))
            .localCheckpoint(eager=False)
        )
    return (
        t.groupBy(F.col("j").alias("state"))
        .agg(F.round(F.sum("p") / n_states, 6).alias("stationary_prob"))
        .orderBy("state")
    )


# ---------------------------------------------------------------------------
# a0065 — frequent 2-sequences (GSP/PrefixSpan level 2): within each
# 30-minute gap-session, pattern "a … then later b" counts ONCE per
# session if ANY ordered occurrence exists (subsequence semantics — NOT
# a0116's adjacent transitions), support = containing sessions / total
# sessions. The ordered-pair generation is a session-keyed self-join
# (bounded by session length², the sequential-mining analog of the
# basket joins), deduplicated per session before counting.
# ---------------------------------------------------------------------------

_SP_TOP = 15


@query(
    "a0065_sequence_patterns",
    oracle="""
    WITH o AS (SELECT user_id, ts, event_type,
                      CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                > INTERVAL 30 MINUTES
                           OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                           THEN 1 ELSE 0 END AS new_s,
                      event_id
               FROM events),
    s AS (SELECT user_id, ts, event_id, event_type,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
          FROM o),
    tot AS (SELECT COUNT(*) AS n_sessions FROM (SELECT DISTINCT user_id, sess FROM s)),
    pat AS (
      SELECT DISTINCT a.user_id, a.sess, a.event_type AS t1, b.event_type AS t2
      FROM s a JOIN s b
        ON a.user_id = b.user_id AND a.sess = b.sess
       AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
    ),
    cnt AS (SELECT t1, t2, COUNT(*) AS n_sessions_with FROM pat GROUP BY t1, t2)
    SELECT t1, t2, CAST(n_sessions_with AS BIGINT) AS n_sessions_with,
           ROUND(n_sessions_with * 1.0 / t.n_sessions, 6) AS support
    FROM cnt CROSS JOIN tot t
    ORDER BY n_sessions_with DESC, t1, t2
    LIMIT 15
    """,
    description="frequent 2-sequences (GSP/PrefixSpan level 2) over 30-minute gap-sessions: pattern 'a … then later b' counts once per session when ANY ordered occurrence exists (subsequence semantics, not a0116's adjacent transitions), support = containing sessions / total sessions; ordered pairs from a session-keyed self-join bounded by session length², deduplicated per session — top-15 patterns with tie-free order",
)
def a0065_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(wo).isNull()
            | (F.col("ts") - F.lag("ts").over(wo) > F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    s = o.withColumn(
        "sess", F.sum("new_s").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    ).localCheckpoint(eager=False)
    tot = s.select("user_id", "sess").distinct().agg(F.count("*").alias("n_sessions"))
    a, b = s.alias("a"), s.alias("b")
    pat = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.sess") == F.col("b.sess"))
            & (
                (F.col("a.ts") < F.col("b.ts"))
                | ((F.col("a.ts") == F.col("b.ts")) & (F.col("a.event_id") < F.col("b.event_id")))
            ),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.sess").alias("sess"),
            F.col("a.event_type").alias("t1"),
            F.col("b.event_type").alias("t2"),
        )
        .distinct()
    )
    return (
        pat.groupBy("t1", "t2")
        .agg(F.count("*").alias("n_sessions_with"))
        .crossJoin(F.broadcast(tot))
        .orderBy(F.desc("n_sessions_with"), "t1", "t2")
        .limit(_SP_TOP)
        .select(
            "t1",
            "t2",
            F.col("n_sessions_with").cast("long").alias("n_sessions_with"),
            F.round(F.col("n_sessions_with") * 1.0 / F.col("n_sessions"), 6).alias("support"),
        )
    )


# ---------------------------------------------------------------------------
# a0066 — logistic regression by unrolled Newton-Raphson (IRLS), the
# GLM counterpart of a0060's EM: y = (lang = 'en') on the z-scored
# document length, 6 Newton steps, each ONE pass computing the exact
# gradient (Σ(y−p), Σ(y−p)x) and Hessian (Σw, Σwx, Σwx², w = p(1−p))
# against the broadcast 2-parameter frame, with the closed-form 2×2
# solve inline. Output: MLE coefficients, log-likelihood, and
# McFadden's pseudo-R² against the base-rate null — distributed IRLS
# with bounded state and zero collects.
# ---------------------------------------------------------------------------

_LOGIT_STEPS = 6


def _logit_oracle() -> str:
    prev = "p0"
    rounds = []
    for r in range(1, _LOGIT_STEPS + 1):
        rounds.append(f"""
    e{r} AS (
      SELECT y, x, 1.0 / (1.0 + exp(-(b0 + b1 * x))) AS p
      FROM d CROSS JOIN {prev}
    ),
    s{r} AS (
      SELECT SUM(y - p) AS g0, SUM((y - p) * x) AS g1,
             SUM(p * (1 - p)) AS h00, SUM(p * (1 - p) * x) AS h01,
             SUM(p * (1 - p) * x * x) AS h11,
             SUM(CASE WHEN y = 1 THEN ln(p) ELSE ln(1 - p) END) AS ll
      FROM e{r}
    ),
    p{r} AS (
      SELECT pp.b0 + (s.h11 * s.g0 - s.h01 * s.g1) / (s.h00 * s.h11 - s.h01 * s.h01) AS b0,
             pp.b1 + (s.h00 * s.g1 - s.h01 * s.g0) / (s.h00 * s.h11 - s.h01 * s.h01) AS b1,
             s.ll AS ll
      FROM s{r} s CROSS JOIN {prev} pp
    )""")
        prev = f"p{r}"
    return f"""
    WITH raw AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, CAST(n_chars AS DOUBLE) AS v
      FROM documents
    ),
    st AS (SELECT AVG(v) AS mu, stddev_pop(v) AS sd FROM raw),
    d AS (SELECT y, (v - mu) / sd AS x FROM raw CROSS JOIN st),
    p0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS ll),{",".join(rounds)},
    base AS (
      SELECT SUM(y) * ln(SUM(y) * 1.0 / COUNT(*))
             + (COUNT(*) - SUM(y)) * ln(1 - SUM(y) * 1.0 / COUNT(*)) AS ll0,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos
      FROM d
    )
    SELECT b.n, b.n_pos, ROUND(p.b0, 6) AS b0, ROUND(p.b1, 6) AS b1,
           ROUND(p.ll, 4) AS loglik, ROUND(1 - p.ll / b.ll0, 6) AS mcfadden_r2
    FROM p{_LOGIT_STEPS} p CROSS JOIN base b
    """


# Scale rule (100 TB): Newton steps are fixed by quadratic convergence (3
# suffice at any N since the Hessian is 3x3 — feature-bounded); each step
# is ONE pass computing gradient+Hessian moments.
@query(
    "a0066_logistic_newton",
    oracle=_logit_oracle(),
    description=f"logistic regression by {_LOGIT_STEPS} unrolled Newton-Raphson (IRLS) steps — y=(lang='en') on z-scored document length: each step is ONE pass computing the exact gradient and Hessian sums against the broadcast 2-parameter frame with the closed-form 2×2 solve inline; MLE coefficients, log-likelihood, and McFadden pseudo-R² vs the base-rate null — the distributed-GLM shape (bounded state, zero collects), and a0060's EM sibling",
)
def a0066_logistic_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.col("n_chars").cast("double").alias("v"),
    )
    st = raw.agg(F.avg("v").alias("mu"), F.stddev_pop("v").alias("sd"))
    d = (
        raw.crossJoin(F.broadcast(st))
        .select("y", ((F.col("v") - F.col("mu")) / F.col("sd")).alias("x"))
        .localCheckpoint(eager=False)
    )
    params = d.sparkSession.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"), F.lit(0.0).alias("ll")
    )
    for _ in range(_LOGIT_STEPS):
        p = 1.0 / (1.0 + F.exp(-(F.col("b0") + F.col("b1") * F.col("x"))))
        e = d.crossJoin(F.broadcast(params)).select(
            "y", "x", p.alias("p"), "b0", "b1"
        )
        w = F.col("p") * (1 - F.col("p"))
        s = e.agg(
            F.first("b0").alias("b0"),
            F.first("b1").alias("b1"),
            F.sum(F.col("y") - F.col("p")).alias("g0"),
            F.sum((F.col("y") - F.col("p")) * F.col("x")).alias("g1"),
            F.sum(w).alias("h00"),
            F.sum(w * F.col("x")).alias("h01"),
            F.sum(w * F.col("x") * F.col("x")).alias("h11"),
            F.sum(
                F.when(F.col("y") == 1, F.log("p")).otherwise(F.log(1 - F.col("p")))
            ).alias("ll"),
        )
        det = F.col("h00") * F.col("h11") - F.col("h01") * F.col("h01")
        params = s.select(
            (F.col("b0") + (F.col("h11") * F.col("g0") - F.col("h01") * F.col("g1")) / det).alias("b0"),
            (F.col("b1") + (F.col("h00") * F.col("g1") - F.col("h01") * F.col("g0")) / det).alias("b1"),
            F.col("ll").alias("ll"),
        ).localCheckpoint(eager=False)
    base = d.agg(
        (
            F.sum("y") * F.log(F.sum("y") * 1.0 / F.count("*"))
            + (F.count("*") - F.sum("y")) * F.log(1 - F.sum("y") * 1.0 / F.count("*"))
        ).alias("ll0"),
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    return params.crossJoin(F.broadcast(base)).select(
        "n",
        "n_pos",
        F.round("b0", 6).alias("b0"),
        F.round("b1", 6).alias("b1"),
        F.round("ll", 4).alias("loglik"),
        F.round(1 - F.col("ll") / F.col("ll0"), 6).alias("mcfadden_r2"),
    )


# ---------------------------------------------------------------------------
# a0067 — exact tie-corrected ROC-AUC via the Mann-Whitney U statistic:
# AUC = (Σ_pos avg-rank − n⁺(n⁺+1)/2) / (n⁺n⁻), with average ranks over
# ties taken from the cumulative counts of the DISTINCT-SCORE frame —
# the scale-correct form (one groupBy on the score, window algebra over
# the bounded distinct-value frame; for continuous scores you bucket
# first, for integer scores like document length it is EXACT). Scorer:
# document length predicting lang='en'; Gini = 2·AUC−1 alongside.
# ---------------------------------------------------------------------------


@query(
    "a0067_roc_auc",
    oracle="""
    WITH d AS (
      SELECT n_chars AS s, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents
    ),
    g AS (SELECT s, COUNT(*) AS cnt, SUM(y) AS pos FROM d GROUP BY s),
    c AS (
      SELECT s, cnt, pos,
             COALESCE(SUM(cnt) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM g
    ),
    u AS (
      SELECT SUM(pos * (cum_before + (cnt + 1) / 2.0)) AS rank_pos_sum,
             SUM(pos) AS np, SUM(cnt - pos) AS nn
      FROM c
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           ROUND((rank_pos_sum - np * (np + 1) / 2.0) / (np * nn), 6) AS auc,
           ROUND(2 * (rank_pos_sum - np * (np + 1) / 2.0) / (np * nn) - 1, 6) AS gini
    FROM u
    """,
    description="exact tie-corrected ROC-AUC via the Mann-Whitney U statistic (document length scoring lang='en'): average ranks over ties from cumulative counts of the DISTINCT-SCORE frame — one score-keyed groupBy plus window algebra over the bounded distinct-value frame (the scale-correct AUC: bucket first for continuous scores, exact for integer scores); Gini coefficient alongside",
)
def a0067_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    g = d.groupBy("s").agg(F.count("*").alias("cnt"), F.sum("y").alias("pos"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    c = g.select(
        "s", "cnt", "pos", F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before")
    )
    u = c.agg(
        F.sum(F.col("pos") * (F.col("cum_before") + (F.col("cnt") + 1) / 2.0)).alias(
            "rank_pos_sum"
        ),
        F.sum("pos").alias("np"),
        F.sum(F.col("cnt") - F.col("pos")).alias("nn"),
    )
    auc = (F.col("rank_pos_sum") - F.col("np") * (F.col("np") + 1) / 2.0) / (
        F.col("np") * F.col("nn")
    )
    return u.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(2 * auc - 1, 6).alias("gini"),
    )


# ---------------------------------------------------------------------------
# a0068 — cumulative gains and lift chart by score decile (the campaign-
# targeting readout): documents ranked by length-score into exact
# interpolated deciles (the a0158 count-of-edges rule — never ntile over
# the table), positives = lang='en'; per decile from best down:
# response rate, lift vs base rate, cumulative gains. The decile frame
# is 10 rows, so the cumulative window never touches data.
# ---------------------------------------------------------------------------

_LIFT_QS = [i / 10 for i in range(1, 10)]


@query(
    "a0068_lift_gains",
    oracle=f"""
    WITH d AS (
      SELECT CAST(n_chars AS DOUBLE) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    q AS (SELECT quantile_cont(s, [{", ".join(str(q) for q in _LIFT_QS)}]) AS qs FROM d),
    b AS (
      SELECT y, len(list_filter((SELECT qs FROM q), e -> e <= s)) AS bin FROM d
    ),
    agg AS (
      SELECT bin, COUNT(*) AS n, SUM(y) AS pos FROM b GROUP BY bin
    ),
    tot AS (SELECT SUM(n) AS nt, SUM(pos) AS pt FROM agg),
    cum AS (
      SELECT bin, n, pos,
             SUM(n) OVER w AS cum_n, SUM(pos) OVER w AS cum_pos
      FROM agg
      WINDOW w AS (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING)
    )
    SELECT CAST(9 - bin AS BIGINT) AS decile_rank, CAST(n AS BIGINT) AS n_docs,
           CAST(pos AS BIGINT) AS n_pos,
           ROUND(pos * 1.0 / n / (t.pt * 1.0 / t.nt), 6) AS lift,
           ROUND(cum_pos * 1.0 / t.pt, 6) AS cum_gains,
           ROUND(cum_n * 1.0 / t.nt, 6) AS cum_share
    FROM cum CROSS JOIN tot t
    ORDER BY decile_rank
    """,
    description="cumulative gains and lift chart by score decile (campaign-targeting readout): document-length score cut at exact interpolated deciles via the count-of-edges rule (never ntile over the table), positives = lang='en'; per decile from best down the response lift vs base rate plus cumulative gains/share — the cumulative window runs over the 10-row decile frame only",
)
def a0068_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("double").alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    edges = d.agg(
        F.expr(f"percentile(s, array({', '.join(str(q) for q in _LIFT_QS)}))").alias("qs")
    )
    b = d.crossJoin(F.broadcast(edges)).select(
        "y", F.size(F.filter(F.col("qs"), lambda e: e <= F.col("s"))).alias("bin")
    )
    agg = b.groupBy("bin").agg(F.count("*").alias("n"), F.sum("y").alias("pos")).localCheckpoint(
        eager=False
    )
    tot = agg.agg(F.sum("n").alias("nt"), F.sum("pos").alias("pt"))
    w = Window.orderBy(F.desc("bin")).rowsBetween(Window.unboundedPreceding, 0)
    cum = agg.select(
        "bin", "n", "pos", F.sum("n").over(w).alias("cum_n"), F.sum("pos").over(w).alias("cum_pos")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            (9 - F.col("bin")).cast("long").alias("decile_rank"),
            F.col("n").cast("long").alias("n_docs"),
            F.col("pos").cast("long").alias("n_pos"),
            F.round(
                F.col("pos") * 1.0 / F.col("n") / (F.col("pt") * 1.0 / F.col("nt")), 6
            ).alias("lift"),
            F.round(F.col("cum_pos") * 1.0 / F.col("pt"), 6).alias("cum_gains"),
            F.round(F.col("cum_n") * 1.0 / F.col("nt"), 6).alias("cum_share"),
        )
        .orderBy("decile_rank")
    )


# ---------------------------------------------------------------------------
# a0069 — skip-gram context-pair extraction (the word2vec / embedding
# training-data prep): every token pairs with the next W tokens of its
# document (forward window, so each unordered co-occurrence is emitted
# once) weighted 1/distance — the classic distance-damped co-occurrence
# statistic embedding trainers consume. Pair generation is ROW-LOCAL
# (posexplode + tail slice over the token array, the a0093/a0053
# layout): ONE scan, one pair-level aggregate, no self-join; top pairs
# by damped weight with tie-free order. Same tokenizer as the text
# stack.
# ---------------------------------------------------------------------------

_SG_WINDOW = 3
_SG_TOP = 20


@query(
    "a0069_skipgram_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +'), x -> x <> '') AS tk
      FROM documents
    ),
    centers AS (
      SELECT doc_id, tk, i, tk[i] AS center
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i)
    ),
    pairs AS (
      SELECT center, tk[i + j] AS context, j AS dist
      FROM centers, LATERAL (SELECT unnest(generate_series(1, {_SG_WINDOW})) AS j)
      WHERE i + j <= len(tk)
    ),
    agg AS (
      SELECT center, context, COUNT(*) AS n_pairs,
             SUM(1.0 / dist) AS w
      FROM pairs WHERE center <> context
      GROUP BY center, context
    )
    SELECT center, context, CAST(n_pairs AS BIGINT) AS n_pairs,
           ROUND(w, 6) AS damped_weight
    FROM agg
    -- order on the ROUNDED weight: raw float sums differ across engines
    -- at ~1e-12, which flips name-tiebreaks at the LIMIT boundary
    ORDER BY ROUND(w, 6) DESC, center, context
    LIMIT {_SG_TOP}
    """,
    description=f"skip-gram context-pair extraction (word2vec training-data prep): each token pairs with the next {_SG_WINDOW} tokens of its document, weighted 1/distance (forward window — each unordered co-occurrence emitted once); pair generation is row-local posexplode + tail slice over the token array (one scan, one aggregate, no self-join), top-{_SG_TOP} pairs by damped weight — the distance-damped co-occurrence statistic embedding trainers consume, on the shared text-stack tokenizer",
)
def a0069_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    toks = load_table(spark, sf_dir, "documents").select(X.tokens("text").alias("tk"))
    pairs = (
        toks.select(F.posexplode("tk").alias("i", "center"), "tk")
        .select(
            "center",
            F.posexplode(F.slice("tk", F.col("i") + 2, _SG_WINDOW)).alias("j", "context"),
        )
        .filter(F.col("center") != F.col("context"))
        .select("center", "context", (F.col("j") + 1).alias("dist"))
    )
    return (
        pairs.groupBy("center", "context")
        .agg(F.count("*").alias("n_pairs"), F.sum(1.0 / F.col("dist")).alias("w"))
        .orderBy(F.desc(F.round("w", 6)), "center", "context")
        .limit(_SG_TOP)
        .select(
            "center",
            "context",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round("w", 6).alias("damped_weight"),
        )
    )
