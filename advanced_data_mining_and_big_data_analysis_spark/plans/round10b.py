"""Round-10 second wave (a0110-a0118, renamed from a0183+ at round
end for the window): ranking-eval metrics, comparative
text statistics, layout clustering, and experiment analytics.

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
# a0111 (ex-a0184) — rank-biased overlap (RBO) between two rankings. The standard
# top-weighted ranking-similarity metric (Webber et al. 2010): how much
# do "parts by price" and "parts by size" agree per brand? RBO@k with
# persistence p: sum_d p^(d-1) (1-p) |A_d ∩ B_d| / d. The prefix
# intersection |A_d ∩ B_d| = #items whose max(rank_a, rank_b) <= d, so
# the whole metric is one join on the item key + a bounded depth-spine
# explode (k rows per item at most) — no per-depth set materialization.
# ---------------------------------------------------------------------------

_RBO_K = 20
_RBO_P = 0.9


@query(
    "a0111_rank_biased_overlap",
    oracle=f"""
    WITH ra AS (SELECT p_brand, p_partkey,
                       ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS r_a
                FROM part),
    rb AS (SELECT p_brand, p_partkey,
                  ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) AS r_b
           FROM part),
    j AS (SELECT ra.p_brand, GREATEST(ra.r_a, rb.r_b) AS mx
          FROM ra JOIN rb ON ra.p_brand = rb.p_brand AND ra.p_partkey = rb.p_partkey
          WHERE ra.r_a <= {_RBO_K} AND rb.r_b <= {_RBO_K}),
    c AS (SELECT p_brand, CAST(d AS BIGINT) AS d, COUNT(*) AS inter
          FROM j CROSS JOIN (SELECT unnest(range(1, {_RBO_K + 1})) AS d)
          WHERE mx <= d GROUP BY p_brand, d),
    r AS (SELECT p_brand,
                 SUM(POW({_RBO_P}, d - 1) * (1 - {_RBO_P}) * inter * 1.0 / d) AS rbo
          FROM c GROUP BY p_brand)
    SELECT p_brand, ROUND(rbo, 6) AS rbo_at_20
    FROM r ORDER BY p_brand
    """,
    description="rank-biased overlap (Webber et al. 2010), the top-weighted ranking-agreement metric, between the by-price and by-size part rankings per brand: RBO@20 with p=0.9 via the prefix-intersection identity |A_d ∩ B_d| = #{items: max(rank_a, rank_b) <= d} — one equality join on the item key plus a bounded 20-row depth spine, never a per-depth set materialization; both rankings fully tie-broken for cross-engine determinism",
)
def a0111_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part")
    ra = p.select(
        "p_brand",
        "p_partkey",
        F.row_number()
        .over(Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey"))
        .alias("r_a"),
    )
    rb = p.select(
        "p_brand",
        "p_partkey",
        F.row_number()
        .over(Window.partitionBy("p_brand").orderBy(F.col("p_size").desc(), "p_partkey"))
        .alias("r_b"),
    )
    j = (
        ra.join(rb, ["p_brand", "p_partkey"])
        .filter((F.col("r_a") <= _RBO_K) & (F.col("r_b") <= _RBO_K))
        .select("p_brand", F.greatest("r_a", "r_b").alias("mx"))
    )
    depths = spark.range(1, _RBO_K + 1).select(F.col("id").alias("d"))
    c = (
        j.crossJoin(F.broadcast(depths))
        .filter(F.col("mx") <= F.col("d"))
        .groupBy("p_brand", "d")
        .agg(F.count("*").alias("inter"))
    )
    r = c.groupBy("p_brand").agg(
        F.sum(
            F.pow(F.lit(_RBO_P), F.col("d") - 1) * (1 - _RBO_P) * F.col("inter") / F.col("d")
        ).alias("rbo")
    )
    return r.select("p_brand", F.round("rbo", 6).alias("rbo_at_20")).orderBy("p_brand")


# ---------------------------------------------------------------------------
# a0112 (ex-a0185) — nDCG@10 ranking evaluation. The retrieval-eval metric: scores
# rank documents per source; graded relevance is planted
# deterministically (md5(doc_id) prefix mod 4 — hash-based so it is NOT
# correlated with the source assignment, which is itself doc_id-modular), so the ideal ordering
# genuinely differs from the score ordering. DCG via the windowed rank,
# IDCG via the same machinery on the relevance ordering, both
# PARTITIONED by source.
# ---------------------------------------------------------------------------

_NDCG_K = 10


@query(
    "a0112_ndcg_eval",
    oracle=f"""
    WITH d AS (SELECT source, doc_id, n_chars % 1000 AS score,
                      CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 4 AS rel
               FROM documents),
    rk AS (SELECT source, rel,
                  ROW_NUMBER() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS r
           FROM d),
    ik AS (SELECT source, rel,
                  ROW_NUMBER() OVER (PARTITION BY source ORDER BY rel DESC, doc_id) AS r
           FROM d),
    dcg AS (SELECT source, SUM((POW(2, rel) - 1) / (ln(r + 1) / ln(2))) AS dcg
            FROM rk WHERE r <= {_NDCG_K} GROUP BY source),
    idcg AS (SELECT source, SUM((POW(2, rel) - 1) / (ln(r + 1) / ln(2))) AS idcg
             FROM ik WHERE r <= {_NDCG_K} GROUP BY source)
    SELECT dcg.source, ROUND(dcg.dcg, 6) AS dcg_at_10,
           ROUND(idcg.idcg, 6) AS idcg_at_10,
           ROUND(dcg.dcg / idcg.idcg, 6) AS ndcg_at_10
    FROM dcg JOIN idcg ON dcg.source = idcg.source ORDER BY dcg.source
    """,
    description="nDCG@10 ranking evaluation (the retrieval-eval metric): per-source document ranking by a score column vs deterministically planted graded relevance (md5(doc_id) prefix mod 4 - hash-based so it decorrelates from the modular source assignment and the ideal order genuinely differs), DCG = sum (2^rel - 1)/log2(rank+1) over the top 10 via source-partitioned row_number windows, IDCG from the relevance-sorted twin, ratio pinned to 6dp",
)
def a0112_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "doc_id",
        (F.col("n_chars") % 1000).alias("score"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("long")
            % 4
        ).alias("rel"),
    )
    rk = d.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("source").orderBy(F.col("score").desc(), "doc_id")
        ),
    )
    ik = d.withColumn(
        "r",
        F.row_number().over(Window.partitionBy("source").orderBy(F.col("rel").desc(), "doc_id")),
    )
    gain = (F.pow(F.lit(2), F.col("rel")) - 1) / (F.log(F.col("r") + 1) / F.log(F.lit(2.0)))
    dcg = rk.filter(F.col("r") <= _NDCG_K).groupBy("source").agg(F.sum(gain).alias("dcg"))
    idcg = ik.filter(F.col("r") <= _NDCG_K).groupBy("source").agg(F.sum(gain).alias("idcg"))
    return (
        dcg.join(idcg, "source")
        .select(
            "source",
            F.round("dcg", 6).alias("dcg_at_10"),
            F.round("idcg", 6).alias("idcg_at_10"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# a0114 (ex-a0187) — token burstiness: Fano factor (variance-to-mean ratio of
# per-document counts, including zeros) and document proportion for the
# highest-frequency tokens. Bursty tokens (Fano >> 1) concentrate in
# few documents — content words; Fano ~ 1 is Poisson-like — function
# words. The zero-document mass enters through the closed form
# var = E[x^2] - mean^2 with moments over ALL docs (sum over docs with
# the token + total doc count), so no dense (doc x token) frame is
# ever built.
# ---------------------------------------------------------------------------


@query(
    "a0114_token_burstiness",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    dt AS (SELECT tok, doc_id, COUNT(*) AS c FROM tok GROUP BY tok, doc_id),
    m AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS total, COUNT(*) AS n_docs_with,
                 SUM(c * c) AS sum_sq
          FROM dt GROUP BY tok),
    f AS (SELECT tok, total, n_docs_with,
                 (sum_sq / n_docs) - (total / n_docs) * (total / n_docs) AS var,
                 total / n_docs AS mean
          FROM m CROSS JOIN nd)
    SELECT tok, total, CAST(n_docs_with AS BIGINT) AS n_docs_with,
           ROUND(var / mean, 6) AS fano,
           ROUND(n_docs_with / (SELECT n_docs FROM nd), 6) AS doc_proportion
    FROM f ORDER BY total DESC, tok LIMIT 15
    """,
    description="token burstiness profile: Fano factor (variance-to-mean of per-document counts INCLUDING zero-docs, via the moment closed form E[x^2]-mean^2 so the dense doc-x-token frame never exists) and document proportion for the top-15 corpus tokens — the content-vs-function-word dispersion screen of lexical statistics; two token-keyed map-side-combined aggregates",
)
def a0114_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    nd = docs.agg(F.count("*").cast("double").alias("n_docs"))
    tok = docs.select("doc_id", F.explode(X.tokens("text")).alias("tok"))
    dt = tok.groupBy("tok", "doc_id").agg(F.count("*").alias("c"))
    m = dt.groupBy("tok").agg(
        F.sum("c").alias("total"),
        F.count("*").alias("n_docs_with"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
    )
    f = m.crossJoin(F.broadcast(nd)).select(
        "tok",
        "total",
        "n_docs_with",
        (
            (F.col("sum_sq") / F.col("n_docs"))
            - (F.col("total") / F.col("n_docs")) * (F.col("total") / F.col("n_docs"))
        ).alias("var"),
        (F.col("total") / F.col("n_docs")).alias("mean"),
        "n_docs",
    )
    return (
        f.select(
            "tok",
            F.col("total").cast("long").alias("total"),
            F.col("n_docs_with").cast("long").alias("n_docs_with"),
            F.round(F.col("var") / F.col("mean"), 6).alias("fano"),
            F.round(F.col("n_docs_with") / F.col("n_docs"), 6).alias("doc_proportion"),
        )
        .orderBy(F.desc("total"), "tok")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# a0115 (ex-a0188) — Monroe et al. weighted log-odds with an informative Dirichlet
# prior: the comparative "what words distinguish corpus A from B"
# statistic that fixes naive log-odds' low-count explosions. Cohorts =
# even- vs odd-numbered sources; prior alpha proportional to the pooled
# corpus frequencies. delta = log-odds difference with smoothed counts,
# z = delta / sqrt(1/(y_a+a) + 1/(y_b+a)).
# ---------------------------------------------------------------------------


@query(
    "a0115_weighted_log_odds",
    oracle=f"""
    WITH t AS (SELECT CAST(substr(source, 4) AS INT) % 2 = 0 AS grp_a, {_TOKS} AS toks
               FROM documents),
    tok AS (SELECT grp_a, unnest(toks) AS tok FROM t),
    c AS (SELECT tok,
                 CAST(SUM(CASE WHEN grp_a THEN 1 ELSE 0 END) AS DOUBLE) AS y_a,
                 CAST(SUM(CASE WHEN grp_a THEN 0 ELSE 1 END) AS DOUBLE) AS y_b
          FROM tok GROUP BY tok),
    n AS (SELECT SUM(y_a) AS n_a, SUM(y_b) AS n_b, SUM(y_a + y_b) AS n_all FROM c),
    z AS (SELECT tok, y_a, y_b,
                 ln((y_a + 0.01 * (y_a + y_b)) / (n_a + 0.01 * n_all - y_a - 0.01 * (y_a + y_b)))
                 - ln((y_b + 0.01 * (y_a + y_b)) / (n_b + 0.01 * n_all - y_b - 0.01 * (y_a + y_b)))
                 AS delta,
                 sqrt(1.0 / (y_a + 0.01 * (y_a + y_b)) + 1.0 / (y_b + 0.01 * (y_a + y_b))) AS sd
          FROM c CROSS JOIN n)
    SELECT tok, CAST(y_a AS BIGINT) AS count_a, CAST(y_b AS BIGINT) AS count_b,
           ROUND(delta / sd, 6) AS z_score
    FROM z ORDER BY ROUND(delta / sd, 6) DESC, tok LIMIT 15
    """,
    description="Monroe et al. weighted log-odds with informative Dirichlet prior (alpha = 0.01 x pooled frequency): the comparative-corpus statistic that fixes naive log-odds' low-count explosion, between even- and odd-numbered source cohorts; z = smoothed delta log-odds / sqrt(1/(y_a+a) + 1/(y_b+a)), top-15 by ROUNDED z with deterministic tie-break — one token-keyed aggregate plus a broadcast totals row",
)
def a0115_weighted_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        (F.substring("source", 4, 10).cast("int") % 2 == 0).alias("grp_a"),
        F.explode(X.tokens("text")).alias("tok"),
    )
    c = t.groupBy("tok").agg(
        F.sum(F.when(F.col("grp_a"), 1).otherwise(0)).cast("double").alias("y_a"),
        F.sum(F.when(F.col("grp_a"), 0).otherwise(1)).cast("double").alias("y_b"),
    )
    n = c.agg(
        F.sum("y_a").alias("n_a"),
        F.sum("y_b").alias("n_b"),
        F.sum(F.col("y_a") + F.col("y_b")).alias("n_all"),
    )
    a_w = 0.01 * (F.col("y_a") + F.col("y_b"))
    delta = F.log(
        (F.col("y_a") + a_w) / (F.col("n_a") + 0.01 * F.col("n_all") - F.col("y_a") - a_w)
    ) - F.log((F.col("y_b") + a_w) / (F.col("n_b") + 0.01 * F.col("n_all") - F.col("y_b") - a_w))
    sd = F.sqrt(1.0 / (F.col("y_a") + a_w) + 1.0 / (F.col("y_b") + a_w))
    z = c.crossJoin(F.broadcast(n)).select(
        "tok",
        F.col("y_a").cast("long").alias("count_a"),
        F.col("y_b").cast("long").alias("count_b"),
        F.round(delta / sd, 6).alias("z_score"),
    )
    return z.orderBy(F.desc("z_score"), "tok").limit(15)


# ---------------------------------------------------------------------------
# a0116 (ex-a0189) — session Markov transition matrix: first-order event-type
# transition probabilities within gap-sessions, plus per-state outgoing
# entropy. The clickstream model behind next-action prediction and
# behavioral anomaly scoring. Transitions via one lag window
# PARTITIONED by (user, session); probabilities and entropy via
# grouped aggregates over the (cur, nxt) count frame (|types|^2 rows).
# ---------------------------------------------------------------------------


@query(
    "a0116_markov_transitions",
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
    tr AS (SELECT event_type AS cur,
                  LEAD(event_type) OVER (PARTITION BY user_id, sess ORDER BY ts, event_id) AS nxt
           FROM s),
    c AS (SELECT cur, nxt, COUNT(*) AS n FROM tr WHERE nxt IS NOT NULL GROUP BY cur, nxt),
    tot AS (SELECT cur, SUM(n) AS n_out FROM c GROUP BY cur),
    e AS (SELECT c.cur, SUM(-(n * 1.0 / n_out) * ln(n * 1.0 / n_out)) AS h
          FROM c JOIN tot ON c.cur = tot.cur GROUP BY c.cur)
    SELECT c.cur, c.nxt, CAST(c.n AS BIGINT) AS n_transitions,
           ROUND(c.n * 1.0 / tot.n_out, 6) AS prob,
           ROUND(e.h, 6) AS cur_out_entropy
    FROM c JOIN tot ON c.cur = tot.cur JOIN e ON c.cur = e.cur
    ORDER BY c.cur, c.nxt
    """,
    description="session Markov chain: first-order event-type transition counts/probabilities within 30-minute gap-sessions (the q60 rule) plus per-state outgoing entropy — the clickstream model behind next-action prediction; transitions from ONE lead window PARTITIONED by (user, session), probabilities and entropy from grouped aggregates over the |types|^2 transition frame",
)
def a0116_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

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
    c = tr.filter(F.col("nxt").isNotNull()).groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    c = c.localCheckpoint(eager=False)
    tot = c.groupBy("cur").agg(F.sum("n").alias("n_out"))
    p = F.col("n") / F.col("n_out")
    e = (
        c.join(tot, "cur")
        .select("cur", (-p * F.log(p)).alias("plp"))
        .groupBy("cur")
        .agg(F.sum("plp").alias("h"))
    )
    return (
        c.join(tot, "cur")
        .join(e, "cur")
        .select(
            "cur",
            "nxt",
            F.col("n").cast("long").alias("n_transitions"),
            F.round(F.col("n") / F.col("n_out"), 6).alias("prob"),
            F.round("h", 6).alias("cur_out_entropy"),
        )
        .orderBy("cur", "nxt")
    )


# ---------------------------------------------------------------------------
# a0117 (ex-a0190) — two-proportion z-test (A/B experiment readout): purchase-
# conversion difference between the user_id-parity cohorts, with the
# pooled-variance z statistic and the |z| > 1.96 significance call
# pinned. One conditional aggregate per cohort; the statistic is a
# closed-form scalar — the entire experiment readout is a 1-row frame.
# ---------------------------------------------------------------------------


@query(
    "a0117_ab_proportion_ztest",
    oracle="""
    WITH u AS (SELECT user_id, user_id % 2 = 0 AS grp_a,
                      MAX(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END)
                          AS converted
               FROM events GROUP BY user_id),
    s AS (SELECT CAST(SUM(CASE WHEN grp_a THEN 1 ELSE 0 END) AS DOUBLE) AS n_a,
                 CAST(SUM(CASE WHEN grp_a THEN converted ELSE 0 END) AS DOUBLE) AS x_a,
                 CAST(SUM(CASE WHEN grp_a THEN 0 ELSE 1 END) AS DOUBLE) AS n_b,
                 CAST(SUM(CASE WHEN grp_a THEN 0 ELSE converted END) AS DOUBLE) AS x_b
          FROM u),
    z AS (SELECT n_a, x_a, n_b, x_b,
                 CASE WHEN x_a + x_b > 0 AND x_a + x_b < n_a + n_b THEN
                   (x_a / n_a - x_b / n_b) /
                   sqrt(((x_a + x_b) / (n_a + n_b)) * (1 - (x_a + x_b) / (n_a + n_b))
                        * (1 / n_a + 1 / n_b))
                 ELSE 0.0 END AS z_stat
          FROM s)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS conversions_a,
           ROUND(x_a / n_a, 6) AS rate_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS conversions_b,
           ROUND(x_b / n_b, 6) AS rate_b,
           ROUND(z_stat, 6) AS z_stat,
           ABS(z_stat) > 1.96 AS significant_at_5pct
    FROM z
    """,
    description="two-proportion z-test A/B readout: per-user purchase conversion for the user_id-parity cohorts (conversion = any purchase with value > 150, via one grouped conditional aggregate; degenerate all-or-none pools pin z to 0), pooled-variance z statistic and the |z|>1.96 two-sided significance call pinned as closed-form scalars on a 1-row frame",
)
def a0117_ab_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150), 1).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2 == 0).alias("grp_a"), "converted")
    s = u.agg(
        F.sum(F.when(F.col("grp_a"), 1).otherwise(0)).cast("double").alias("n_a"),
        F.sum(F.when(F.col("grp_a"), F.col("converted")).otherwise(0)).cast("double").alias("x_a"),
        F.sum(F.when(F.col("grp_a"), 0).otherwise(1)).cast("double").alias("n_b"),
        F.sum(F.when(F.col("grp_a"), 0).otherwise(F.col("converted"))).cast("double").alias("x_b"),
    )
    pool = (F.col("x_a") + F.col("x_b")) / (F.col("n_a") + F.col("n_b"))
    # degenerate-pool guard (everyone or no one converts): the pooled
    # variance is 0 and the statistic undefined -- pin z to 0.0 so both
    # engines agree at every scale factor
    zs = F.when(
        (F.col("x_a") + F.col("x_b") > 0)
        & (F.col("x_a") + F.col("x_b") < F.col("n_a") + F.col("n_b")),
        (F.col("x_a") / F.col("n_a") - F.col("x_b") / F.col("n_b"))
        / F.sqrt(pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b"))),
    ).otherwise(F.lit(0.0))
    return s.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("x_a").cast("long").alias("conversions_a"),
        F.round(F.col("x_a") / F.col("n_a"), 6).alias("rate_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("x_b").cast("long").alias("conversions_b"),
        F.round(F.col("x_b") / F.col("n_b"), 6).alias("rate_b"),
        F.round(zs, 6).alias("z_stat"),
        (F.abs(zs) > 1.96).alias("significant_at_5pct"),
    )


# ---------------------------------------------------------------------------
# a0118 (ex-a0191) — inequality + diversity profile: Gini coefficient of document
# length per source (via the sorted-rank closed form G = 2*sum(i*x_i)/
# (n*sum(x)) - (n+1)/n, one rank window PARTITIONED by source) and
# Simpson diversity of the token distribution (1 - sum p^2, a moment —
# no sort at all). The corpus-balance audit run before mixture
# weighting.
# ---------------------------------------------------------------------------


@query(
    "a0118_gini_diversity",
    oracle=f"""
    WITH r AS (SELECT source, n_chars,
                      ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS i,
                      COUNT(*) OVER (PARTITION BY source) AS n
               FROM documents),
    g AS (SELECT source, ROUND(2.0 * SUM(i * CAST(n_chars AS DOUBLE)) /
                               (MAX(n) * SUM(CAST(n_chars AS DOUBLE)))
                               - (MAX(n) + 1.0) / MAX(n), 6) AS gini_len,
                 CAST(MAX(n) AS BIGINT) AS n_docs
          FROM r GROUP BY source),
    tok AS (SELECT source, unnest({_TOKS}) AS tok FROM documents),
    tc AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok),
    tot AS (SELECT source, CAST(SUM(c) AS DOUBLE) AS n_tok FROM tc GROUP BY source),
    simp AS (SELECT tc.source, ROUND(1.0 - SUM((c / n_tok) * (c / n_tok)), 6) AS simpson
             FROM tc JOIN tot ON tc.source = tot.source GROUP BY tc.source)
    SELECT g.source, n_docs, gini_len, simpson
    FROM g JOIN simp ON g.source = simp.source ORDER BY g.source
    """,
    description="corpus-balance audit per source: Gini coefficient of document length via the sorted-rank closed form 2*sum(i*x_i)/(n*sum x) - (n+1)/n (one rank window PARTITIONED by source) and Simpson diversity 1 - sum p^2 of the token distribution (a pure moment, no sort) — the inequality/diversity screen run before choosing mixture weights",
)
def a0118_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    wsrc = Window.partitionBy("source")
    r = docs.select(
        "source",
        F.col("n_chars").cast("double").alias("x"),
        F.row_number().over(wsrc.orderBy("n_chars", "doc_id")).alias("i"),
        F.count("*").over(wsrc).alias("n"),
    )
    g = r.groupBy("source").agg(
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (F.max("n") * F.sum("x"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini_len"),
        F.max("n").cast("long").alias("n_docs"),
    )
    tc = (
        docs.select("source", F.explode(X.tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    tot = tc.groupBy("source").agg(F.sum("c").cast("double").alias("n_tok"))
    simp = (
        tc.join(tot, "source")
        .groupBy("source")
        .agg(
            F.round(
                1.0 - F.sum((F.col("c") / F.col("n_tok")) * (F.col("c") / F.col("n_tok"))), 6
            ).alias("simpson")
        )
    )
    return g.join(simp, "source").select("source", "n_docs", "gini_len", "simpson").orderBy(
        "source"
    )


# ---------------------------------------------------------------------------
# a0110 (ex-a0183) — Hilbert-curve layout vs Z-order: the other space-filling
# curve lakehouses cluster by (Hilbert preserves locality strictly
# better than Morton — no "seam jumps" — which is why Delta chose it
# for liquid clustering). Both keys are computed on the SAME min-max
# normalized 8-bit (x, y) domain; rows bucket into 64 equal-width
# curve ranges ("files") per layout and the audit reports each
# layout's mean per-file key-span footprint — the statistic a scan
# planner prunes on; smaller mean span = better multi-column skipping.
#
# The Hilbert transform is the classic xy2d bit loop (Wikipedia
# formulation: per level s, quadrant digit (3*rx) XOR ry, then the
# flip n-1-coordinate + swap rotation). Each of the 8 levels is
# materialized as its OWN projection stage: the rotation references
# x/y several times, and chaining selects keeps the expression tree
# linear in levels instead of exponential (Catalyst will not collapse
# projections that would duplicate non-cheap expressions).
# pytest pins the unit-distance adjacency property (consecutive d →
# grid neighbors), i.e. that the implementation IS a Hilbert curve.
# ---------------------------------------------------------------------------

_H_BITS = 8  # 8 bits per axis -> 16-bit curve index, n = 256
_H_N = 1 << _H_BITS
_H_FILES = 100  # deliberately NOT a power of 4: at 4^k files both curves degenerate to identical aligned quadrant blocks; misaligned ranges expose the locality difference


def hilbert_stages(df: DataFrame, x: str = "x", y: str = "y", out: str = "hval") -> DataFrame:
    """Append the Hilbert index of (df[x], df[y]) — both in [0, 2^8) —
    as one chained projection per bit level."""
    cur = df.withColumn(out, F.lit(0).cast("long"))
    for i in range(_H_BITS - 1, -1, -1):
        s = 1 << i
        rx = (F.col(x) / s).cast("long") % 2
        ry = (F.col(y) / s).cast("long") % 2
        digit = (
            F.when((rx == 0) & (ry == 0), 0)
            .when(rx == 0, 1)
            .when(ry == 0, 3)
            .otherwise(2)
        )
        nx = F.when(ry == 1, F.col(x)).otherwise(
            F.when(rx == 1, F.lit(_H_N - 1) - F.col(y)).otherwise(F.col(y))
        )
        ny = F.when(ry == 1, F.col(y)).otherwise(
            F.when(rx == 1, F.lit(_H_N - 1) - F.col(x)).otherwise(F.col(x))
        )
        cur = cur.select(
            *[c for c in cur.columns if c not in (x, y, out)],
            (F.col(out) + F.lit(s * s) * digit).alias(out),
            nx.alias(x),
            ny.alias(y),
        )
    return cur


def _hilbert_sql_ctes(src: str) -> str:
    """DuckDB CTE chain mirroring hilbert_stages bit-for-bit; `src`
    must expose (x, y, px, py) with px/py the preserved originals."""
    ctes = []
    prev = src
    for lvl, i in enumerate(range(_H_BITS - 1, -1, -1)):
        s = 1 << i
        d_prev = "0" if lvl == 0 else "hval"
        ctes.append(
            f"""h{lvl} AS (
      SELECT px, py,
             {d_prev} + {s * s} * (CASE WHEN (x // {s}) % 2 = 0 AND (y // {s}) % 2 = 0 THEN 0
                                        WHEN (x // {s}) % 2 = 0 THEN 1
                                        WHEN (y // {s}) % 2 = 0 THEN 3
                                        ELSE 2 END) AS hval,
             CASE WHEN (y // {s}) % 2 = 1 THEN x
                  WHEN (x // {s}) % 2 = 1 THEN {_H_N - 1} - y ELSE y END AS x,
             CASE WHEN (y // {s}) % 2 = 1 THEN y
                  WHEN (x // {s}) % 2 = 1 THEN {_H_N - 1} - x ELSE x END AS y
      FROM {prev})"""
        )
        prev = f"h{lvl}"
    return ",\n    ".join(ctes)


@query(
    "a0110_hilbert_layout",
    oracle=f"""
    WITH li AS (SELECT l_partkey AS xr, l_suppkey AS yr FROM lineitem),
    b AS (SELECT MIN(xr) AS xmn, MAX(xr) AS xmx, MIN(yr) AS ymn, MAX(yr) AS ymx FROM li),
    n AS (SELECT CASE WHEN xmx = xmn THEN 0
                      ELSE CAST(FLOOR(1.0 * (xr - xmn) * {_H_N - 1} / (xmx - xmn)) AS BIGINT) END AS x,
                 CASE WHEN ymx = ymn THEN 0
                      ELSE CAST(FLOOR(1.0 * (yr - ymn) * {_H_N - 1} / (ymx - ymn)) AS BIGINT) END AS y
          FROM li CROSS JOIN b),
    src AS (SELECT x, y, x AS px, y AS py FROM n),
    {{HCTES}},
    hf AS (SELECT 'hilbert' AS layout, hval // {(_H_N * _H_N) // _H_FILES} AS file_id, px, py
           FROM h{_H_BITS - 1}),
    zf AS (SELECT 'zorder' AS layout, ({{ZTERMS}}) // {(_H_N * _H_N) // _H_FILES} AS file_id, px, py
           FROM src),
    u AS (SELECT * FROM hf UNION ALL SELECT * FROM zf),
    fs AS (SELECT layout, file_id, COUNT(*) AS n_rows,
                  (MAX(px) - MIN(px)) + (MAX(py) - MIN(py)) AS span
           FROM u GROUP BY layout, file_id)
    SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           ROUND(AVG(span * 1.0 / (2 * {_H_N - 1})), 6) AS avg_span_frac,
           ROUND(MAX(span * 1.0 / (2 * {_H_N - 1})), 6) AS max_span_frac
    FROM fs GROUP BY layout ORDER BY layout
    """,
    description="Hilbert-curve layout clustering vs Z-order on the SAME normalized 8-bit (partkey, suppkey) domain (the space-filling-curve choice behind Delta liquid clustering vs OPTIMIZE ZORDER): classic xy2d bit-level transform — quadrant digit (3rx XOR ry), flip+swap rotation — materialized one projection per level so the expression tree stays linear; 64 equal-width curve-range 'files' per layout, per-file two-column key-span footprints aggregated to the mean/max span fraction a scan planner prunes on; Hilbert's strictly-better locality shows as a lower avg span; the unit-step adjacency property is pytest-pinned",
)
def a0110_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline_ops3 import zorder_value

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("long").alias("xr"), F.col("l_suppkey").cast("long").alias("yr")
    )
    b = li.agg(
        F.min("xr").alias("xmn"),
        F.max("xr").alias("xmx"),
        F.min("yr").alias("ymn"),
        F.max("yr").alias("ymx"),
    )

    def norm(raw: str, mn: str, mx: str):
        return (
            F.when(F.col(mx) == F.col(mn), F.lit(0))
            .otherwise(
                F.floor(1.0 * (F.col(raw) - F.col(mn)) * (_H_N - 1) / (F.col(mx) - F.col(mn)))
            )
            .cast("long")
        )

    src = li.crossJoin(F.broadcast(b)).select(
        norm("xr", "xmn", "xmx").alias("x"),
        norm("yr", "ymn", "ymx").alias("y"),
        norm("xr", "xmn", "xmx").alias("px"),
        norm("yr", "ymn", "ymx").alias("py"),
    )
    per_file = (_H_N * _H_N) // _H_FILES
    hf = hilbert_stages(src).select(
        F.lit("hilbert").alias("layout"),
        (F.col("hval") / per_file).cast("long").alias("file_id"),
        "px",
        "py",
    )
    zf = src.select(
        F.lit("zorder").alias("layout"),
        (zorder_value(F.col("px"), F.col("py"), bits=_H_BITS) / per_file)
        .cast("long")
        .alias("file_id"),
        "px",
        "py",
    )
    u = hf.unionByName(zf)
    fs = u.groupBy("layout", "file_id").agg(
        F.count("*").alias("n_rows"),
        ((F.max("px") - F.min("px")) + (F.max("py") - F.min("py"))).alias("span"),
    )
    return (
        fs.groupBy("layout")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.round(F.avg(F.col("span") / (2.0 * (_H_N - 1))), 6).alias("avg_span_frac"),
            F.round(F.max(F.col("span") / (2.0 * (_H_N - 1))), 6).alias("max_span_frac"),
        )
        .orderBy("layout")
    )


# Splice the generated CTE chains into the oracle (f-string nesting
# would be unreadable; the placeholders keep the SQL template legible).
from .registry import REGISTRY as _REG  # noqa: E402

_q = _REG["a0110_hilbert_layout"]
_zterms = " + ".join(
    f"(((px // {1 << i}) % 2) * {1 << (2 * i)}) + (((py // {1 << i}) % 2) * {1 << (2 * i + 1)})"
    for i in range(_H_BITS)
)
object.__setattr__(
    _q,
    "oracle",
    _q.oracle.replace("{HCTES}", _hilbert_sql_ctes("src")).replace("{ZTERMS}", _zterms),
)


# ---------------------------------------------------------------------------
# a0113 (ex-a0186) — containment search (snippet-in-document): the ASYMMETRIC
# similarity |Q ∩ D| / |Q| that quote/passage detection needs where
# Jaccard fails (a 12-token snippet inside a 500-token doc has tiny
# Jaccard but containment ~1). Eval snippets (first 12 tokens of each
# doc_id%97==0 doc) are matched against train docs through a
# gram-keyed equality join — only (snippet, doc) pairs sharing at
# least one 3-gram ever materialize, never the quadratic candidate
# square — and the per-snippet best hit is an argmax via max_by/min
# struct with a full tie-break.
# ---------------------------------------------------------------------------

_CONT_SNIP = 12
_CONT_N = 3


@query(
    "a0113_containment_search",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    snip AS (SELECT doc_id AS snip_id,
                    list_distinct(list_transform(range(1, {_CONT_SNIP - _CONT_N + 2}),
                      i -> array_to_string(list_slice(toks, i, i + {_CONT_N - 1}), ' '))) AS gs
             FROM t WHERE doc_id % 97 = 0 AND len(toks) >= {_CONT_SNIP}),
    sg AS (SELECT snip_id, len(gs) AS n_q, unnest(gs) AS g FROM snip),
    dg AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(1, len(toks) - {_CONT_N - 2}),
                    i -> array_to_string(list_slice(toks, i, i + {_CONT_N - 1}), ' ')))) AS g
           FROM t WHERE doc_id % 97 <> 0 AND len(toks) >= {_CONT_N}),
    m AS (SELECT sg.snip_id, dg.doc_id, MAX(sg.n_q) AS n_q, COUNT(*) AS hits
          FROM sg JOIN dg ON sg.g = dg.g GROUP BY sg.snip_id, dg.doc_id),
    r AS (SELECT snip_id, doc_id, n_q, hits,
                 ROW_NUMBER() OVER (PARTITION BY snip_id ORDER BY hits DESC, doc_id) AS rk,
                 COUNT(*) OVER (PARTITION BY snip_id) AS n_candidates
          FROM m),
    best AS (SELECT snip_id, CAST(doc_id AS BIGINT) AS best_doc,
                    hits * 1.0 / n_q AS best_containment, n_candidates
             FROM r WHERE rk = 1)
    SELECT CAST(snip_id AS BIGINT) AS snip_id, best_doc,
           ROUND(best_containment, 6) AS containment,
           CAST(n_candidates AS BIGINT) AS n_candidates
    FROM best ORDER BY snip_id LIMIT 15
    """,
    description="containment search (snippet-in-document): the ASYMMETRIC overlap |Q∩D|/|Q| that quote/passage detection needs where Jaccard fails on short-in-long; 12-token eval snippets' distinct 3-grams matched to train-doc gram sets through a gram-keyed equality join (only pairs sharing a gram materialize — never the quadratic candidate square), per-snippet best hit via argmax with (hits desc, doc_id) tie-break",
)
def a0113_containment_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", X.tokens("text").alias("toks"))
    snip = t.filter((F.col("doc_id") % 97 == 0) & (F.size("toks") >= _CONT_SNIP)).select(
        F.col("doc_id").alias("snip_id"),
        X.word_shingles(F.slice("toks", 1, _CONT_SNIP), n=_CONT_N, distinct=True).alias("gs"),
    )
    sg = snip.select("snip_id", F.size("gs").alias("n_q"), F.explode("gs").alias("g"))
    dg = t.filter((F.col("doc_id") % 97 != 0) & (F.size("toks") >= _CONT_N)).select(
        "doc_id", F.explode(X.word_shingles(F.col("toks"), n=_CONT_N, distinct=True)).alias("g")
    )
    m = (
        sg.join(dg, "g")
        .groupBy("snip_id", "doc_id")
        .agg(F.max("n_q").alias("n_q"), F.count("*").alias("hits"))
    )
    best = m.groupBy("snip_id").agg(
        F.min_by("doc_id", F.struct((-F.col("hits")).alias("a"), F.col("doc_id").alias("b")))
        .cast("long")
        .alias("best_doc"),
        F.max(F.col("hits") / F.col("n_q")).alias("best_containment"),
        F.count("*").alias("n_candidates"),
    )
    return (
        best.select(
            F.col("snip_id").cast("long").alias("snip_id"),
            "best_doc",
            F.round("best_containment", 6).alias("containment"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
        )
        .orderBy("snip_id")
        .limit(15)
    )
