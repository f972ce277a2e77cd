"""Round-3 training-data pipeline queries: benchmark decontamination,
deterministic hash splits, winsorization, incremental corpus dedup.

These extend the corpus-prep family (q91-q95, q103) with the remaining
steps a production pre-training pipeline runs between raw corpus and
tokenizer: scrub eval-benchmark contamination out of the training set,
carve reproducible train/valid/test splits, clip outlier lengths, and
dedup each NEW crawl increment against the already-curated corpus
(rather than re-running global dedup over 100 TB per increment).

Every rule is mirrored exactly in a DuckDB oracle so the driver hash
pins the semantics (n-gram arithmetic, hash-bucket boundaries, quantile
interpolation, LSH banding), not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..sources import load_table
from .dedup_text import _shingles, _sig_list, _TOKS
from .registry import query

# ---------------------------------------------------------------------------
# q105 — benchmark decontamination. src0 plays the held-out benchmark;
# every training doc is scored by the fraction of its distinct 3-gram
# shingles that appear anywhere in the benchmark (the n-gram-overlap
# decontamination rule used for pre-training corpora, shrunk from the
# usual 13-grams to 3-grams so the synthetic corpus produces signal).
# ---------------------------------------------------------------------------


@query(
    "q105_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, source, {_shingles('toks')} AS sh FROM t),
    ev AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE source = 'src0'),
    tr AS (SELECT doc_id, source, sh FROM s WHERE source <> 'src0'),
    gr AS (SELECT doc_id, unnest(sh) AS g FROM tr),
    p AS (SELECT doc_id, COUNT(*) AS total,
                 SUM(CASE WHEN g IN (SELECT g FROM ev) THEN 1 ELSE 0 END) AS hits
          FROM gr GROUP BY doc_id),
    d AS (SELECT tr.source,
                 COALESCE(p.hits * 1.0 / p.total, 0.0) AS frac
          FROM tr LEFT JOIN p ON tr.doc_id = p.doc_id)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN frac >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           ROUND(AVG(frac), 6) AS avg_contamination,
           ROUND(MAX(frac), 6) AS max_contamination
    FROM d GROUP BY source ORDER BY source
    """,
    description="benchmark decontamination: score every training doc by the fraction of its distinct 3-gram shingles appearing in the held-out benchmark set (src0), flag docs >= 0.2 — benchmark gram set is broadcast (it is small by construction); grams are xxhash64 IDENTITIES, never materialized strings (the oracle re-derives membership from the raw gram text), and 'source' rides the gram rows so the corpus is scanned once: gram pass -> per-(doc,source) aggregate -> per-source rollup, with zero-gram docs folded back from a column-pruned per-source count frame instead of a corpus-sized join",
)
def q105_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ev_docs = docs.filter(F.col("source") == "src0")
    tr_docs = docs.filter(F.col("source") != "src0")
    # distinct benchmark grams: small by construction (the benchmark is
    # human-curated, ~thousands of docs even when the corpus is 100 TB)
    # -> broadcast to every executor, no shuffle of the training side
    # beyond its own per-doc aggregate. Hashed gram identities: 8-byte
    # broadcast keys, no per-gram string ever built on either side.
    ev_grams = (
        D.shingle_rows(ev_docs, shingle_n=3, hashed=True, spread=False)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    tr_grams = D.shingle_rows(tr_docs, shingle_n=3, extra_cols=("source",), hashed=True)
    per_doc = (
        tr_grams.join(F.broadcast(ev_grams), "shingle", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("hits"),
        )
        .select("source", (F.col("hits") / F.col("total")).alias("frac"))
    )
    stats = per_doc.groupBy("source").agg(
        F.sum((F.col("frac") >= 0.2).cast("long")).alias("_flagged"),
        F.sum("frac").alias("_sum_frac"),
        F.max("frac").alias("_max_frac"),
    )
    # zero-gram docs contribute frac = 0 (never flagged, cap the max at
    # >= 0, dilute the average): fold them in via the per-source doc
    # count — a column-pruned aggregate — instead of left-joining the
    # corpus-sized doc frame against the gram aggregate.
    counts = tr_docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        counts.join(stats, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("_flagged"), F.lit(0)).alias("n_flagged"),
            F.round(F.coalesce(F.col("_sum_frac"), F.lit(0.0)) / F.col("n_docs"), 6).alias(
                "avg_contamination"
            ),
            F.round(F.coalesce(F.col("_max_frac"), F.lit(0.0)), 6).alias("max_contamination"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q106 — deterministic hash-based train/valid/test split. Membership is
# a pure function of the stable doc id (md5 bucket 0-99: 80/10/10), so
# the split is reproducible across engines, re-runs, and re-shards, and
# adding new data never moves an old doc between splits — the property
# random-split pipelines lose the moment data is re-read.
# ---------------------------------------------------------------------------

_BUCKET_SQL = "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100"


@query(
    "q106_hash_split",
    oracle=f"""
    WITH b AS (SELECT doc_id, source, n_chars, {_BUCKET_SQL} AS bucket FROM documents),
    s AS (SELECT CASE WHEN bucket < 80 THEN 'train'
                      WHEN bucket < 90 THEN 'valid'
                      ELSE 'test' END AS split, source, n_chars FROM b)
    SELECT split, COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           ROUND(AVG(n_chars), 6) AS avg_chars
    FROM s GROUP BY split ORDER BY split
    """,
    description="deterministic hash split (md5-bucket 80/10/10 train/valid/test): membership is a pure function of the doc id — reproducible across engines and re-shards, stable under corpus growth; pure Column expressions, one partial aggregate, zero joins",
)
def q106_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    ) % 100
    split = (
        F.when(bucket < 80, F.lit("train")).when(bucket < 90, F.lit("valid")).otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# q107 — per-group winsorization (outlier clipping to the p05/p95 of each
# source). Two passes: exact interpolated percentiles per group (a tiny
# aggregate — one row per source), broadcast back onto the fact scan,
# clip, re-aggregate. The quantile interpolation rule itself is pinned by
# the oracle (Spark percentile() and DuckDB quantile_cont share the
# linear-interpolation definition).
# ---------------------------------------------------------------------------


@query(
    "q107_winsorize",
    oracle="""
    WITH q AS (SELECT source,
                      quantile_cont(n_chars, 0.05) AS p05,
                      quantile_cont(n_chars, 0.95) AS p95
               FROM documents GROUP BY source),
    c AS (SELECT d.source, d.n_chars, q.p05, q.p95,
                 LEAST(GREATEST(d.n_chars * 1.0, q.p05), q.p95) AS clipped
          FROM documents d JOIN q ON d.source = q.source)
    SELECT source, COUNT(*) AS n_docs,
           ROUND(ANY_VALUE(p05), 6) AS p05,
           ROUND(ANY_VALUE(p95), 6) AS p95,
           ROUND(AVG(n_chars), 6) AS mean_raw,
           ROUND(AVG(clipped), 6) AS mean_winsorized,
           CAST(SUM(CASE WHEN n_chars * 1.0 < p05 OR n_chars * 1.0 > p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM c GROUP BY source ORDER BY source
    """,
    description="per-source winsorization: exact linear-interpolated p05/p95 per group (one tiny agg row per source, broadcast back), clip the length column, report raw vs winsorized means and clip counts — the standard outlier-robust length normalization before mixture weighting",
)
def q107_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.percentile("n_chars", F.lit(0.05)).alias("p05"),
        F.percentile("n_chars", F.lit(0.95)).alias("p95"),
    )
    nc = F.col("n_chars").cast("double")
    clipped = F.least(F.greatest(nc, F.col("p05")), F.col("p95"))
    return (
        docs.join(F.broadcast(stats), "source")
        .select(
            "source",
            "n_chars",
            F.col("p05"),
            F.col("p95"),
            clipped.alias("clipped"),
            ((nc < F.col("p05")) | (nc > F.col("p95"))).cast("long").alias("_clip"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.first("p05"), 6).alias("p05"),
            F.round(F.first("p95"), 6).alias("p95"),
            F.round(F.avg("n_chars"), 6).alias("mean_raw"),
            F.round(F.avg("clipped"), 6).alias("mean_winsorized"),
            F.sum("_clip").alias("n_clipped"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q108 — incremental dedup: a NEW crawl increment (doc_id % 7 = 0) is
# deduped AGAINST the existing curated corpus without re-running global
# dedup — new docs' LSH buckets probe the corpus's buckets, exact
# Jaccard verifies, and only verified-novel docs enter. Near-dups are
# PLANTED (a shared boilerplate text on a deterministic id rule) so the
# cross-side match path is exercised and pinned, not vacuously green.
# ---------------------------------------------------------------------------

_BOILER2 = "subscribe to our newsletter for weekly updates and exclusive offers today"
_PLANT = f"CASE WHEN doc_id % 70 = 0 OR doc_id % 9 = 1 THEN '{_BOILER2}' ELSE text END"


@query(
    "q108_incremental_dedup",
    oracle=f"""
    WITH docs0 AS (SELECT doc_id, source, {_PLANT} AS text FROM documents),
    t AS (SELECT doc_id, {_TOKS} AS toks FROM docs0),
    s AS (SELECT doc_id, {_shingles('toks')} AS sh FROM t),
    s2 AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
    sig AS (SELECT doc_id, {_sig_list('sh')} AS sig FROM s2),
    bands AS (SELECT doc_id, b,
                     md5(array_to_string(list_slice(sig, 4 * b + 1, 4 * b + 4), '|')) AS bucket
              FROM sig CROSS JOIN range(0, 4) r(b)),
    nb AS (SELECT doc_id, b, bucket FROM bands WHERE doc_id % 7 = 0),
    cb0 AS (SELECT doc_id, b, bucket,
                   ROW_NUMBER() OVER (PARTITION BY b, bucket
                        ORDER BY md5(bucket || CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM bands WHERE doc_id % 7 <> 0),
    cb AS (SELECT doc_id, b, bucket FROM cb0 WHERE rn <= 64),
    cand AS (SELECT DISTINCT nb.doc_id AS nid, cb.doc_id AS cid
             FROM nb JOIN cb ON nb.b = cb.b AND nb.bucket = cb.bucket),
    j AS (SELECT nid, len(list_intersect(sa.sh, sb.sh)) * 1.0
                      / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
          FROM cand JOIN s2 sa ON sa.doc_id = cand.nid
                    JOIN s2 sb ON sb.doc_id = cand.cid),
    dup AS (SELECT DISTINCT nid FROM j WHERE jaccard >= 0.5),
    nd AS (SELECT doc_id, source FROM docs0 WHERE doc_id % 7 = 0)
    SELECT source, COUNT(*) AS n_new,
           CAST(SUM(CASE WHEN doc_id IN (SELECT nid FROM dup) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup,
           CAST(SUM(CASE WHEN doc_id IN (SELECT nid FROM dup) THEN 0 ELSE 1 END) AS BIGINT)
             AS n_kept
    FROM nd GROUP BY source ORDER BY source
    """,
    description="incremental corpus dedup: new-increment docs probe the existing corpus's LSH buckets (corpus side capped at 64/bucket by the deterministic salt rank — bounded task cost even against a boilerplate bucket), exact shingle Jaccard >= 0.5 verifies; planted boilerplate dups prove the cross-side match path — the per-increment shape that avoids re-running global dedup over the full corpus",
)
def q108_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.when((F.col("doc_id") % 70 == 0) | (F.col("doc_id") % 9 == 1), F.lit(_BOILER2)).otherwise(
            F.col("text")
        ),
    )
    is_new = F.col("doc_id") % 7 == 0
    flagged = D.incremental_dup_ids(
        docs.filter(is_new),
        docs.filter(~is_new),
        num_hashes=16,
        bands=4,
        shingle_n=3,
        jaccard_threshold=0.5,
        max_bucket_size=64,
    ).withColumn("_dup", F.lit(1))
    return (
        docs.filter(is_new)
        .select("doc_id", "source")
        .join(flagged, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).alias("n_dup"),
            F.sum(F.when(F.col("_dup").isNull(), 1).otherwise(0)).alias("n_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q109 — distributed sequence packing. Docs are dealt into shards by a
# deterministic hash, ordered pseudo-randomly within each shard, and
# greedily packed into fixed token contexts by a shard-local running
# sum: pack = (shard, floor(prefix_tokens / C)). The window is
# PARTITIONED by shard — the global-cumsum formulation would funnel the
# whole corpus through one task (the q63 anti-pattern); per-shard
# packing is exactly how multi-worker training data gets packed in
# practice (each worker packs its own shard).
# ---------------------------------------------------------------------------

_CTX = 4096
_N_SHARDS = 8
_TOK_EST = "GREATEST(1, CAST(CEIL(n_chars / 4.0) AS BIGINT))"
_SHARD_SQL = "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)) AS BIGINT) % 8"
_ORD_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 4, 8)"


@query(
    "q109_sequence_packing",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOK_EST} AS tok, {_SHARD_SQL} AS shard,
                      {_ORD_SQL} AS ord
               FROM documents),
    c AS (SELECT shard, tok,
                 SUM(tok) OVER (PARTITION BY shard ORDER BY ord, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM t),
    p AS (SELECT shard, tok, (cum - tok) // {_CTX} AS pack FROM c),
    s AS (SELECT shard, pack, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tokens
          FROM p GROUP BY shard, pack)
    SELECT shard, COUNT(*) AS n_packs, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(tokens) / {_CTX}, 6) AS mean_fill
    FROM s GROUP BY shard ORDER BY shard
    """,
    description=f"distributed sequence packing: hash-shard the corpus ({_N_SHARDS} shards), pseudo-random order within shard, shard-local prefix-sum assigns each doc to a {_CTX}-token pack — the window is partitioned by shard (never a global single-task cumsum), matching how per-worker packing runs at scale",
)
def q109_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import pack_assignments

    docs = load_table(spark, sf_dir, "documents")
    tok = F.greatest(F.lit(1), F.ceil(F.col("n_chars") / 4.0).cast("long"))
    packed = pack_assignments(
        docs.select("doc_id", tok.alias("_tok")),
        token_col="_tok",
        context_len=_CTX,
        n_shards=_N_SHARDS,
    )
    per_pack = packed.groupBy("shard", "pack").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tok").alias("tokens")
    )
    return (
        per_pack.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("tokens").alias("total_tokens"),
            F.round(F.avg("tokens") / _CTX, 6).alias("mean_fill"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# q110 — token-budget mixture planning: given target mixture weights per
# source (a literal spec, as in q93) and a total token budget, compute
# each source's available tokens, its target allocation, and the epoch
# factor (allocation / available — >1 means the source must be
# oversampled). The planning twin of q93's mixture SAMPLER: one tiny
# aggregate per source joined to an inline dim, no data movement beyond
# the per-source agg.
# ---------------------------------------------------------------------------

_BUDGET = 1_000_000
_MIX = [("src0", 3.0), ("src1", 2.0)]  # named upweights; every other source 1.0


def _mix_weight_sql() -> str:
    cases = " ".join(f"WHEN source = '{s}' THEN {w}" for s, w in _MIX)
    return f"CASE {cases} ELSE 1.0 END"


@query(
    "q110_token_budget",
    oracle=f"""
    WITH avail AS (
      SELECT source, CAST(SUM({_TOK_EST}) AS BIGINT) AS available_tokens,
             {_mix_weight_sql()} AS weight
      FROM documents GROUP BY source),
    tot AS (SELECT SUM(weight) AS wsum FROM avail)
    SELECT source, available_tokens, ROUND(weight, 6) AS weight,
           CAST(FLOOR({_BUDGET} * weight / (SELECT wsum FROM tot)) AS BIGINT)
             AS target_tokens,
           ROUND({_BUDGET} * weight / (SELECT wsum FROM tot) / available_tokens, 6)
             AS epochs
    FROM avail ORDER BY source
    """,
    description="token-budget mixture planning: per-source available tokens (one partial agg), target allocation from literal mixture weights, and the oversampling epoch factor — the planning twin of the q93 mixture sampler; inline literal dim, zero extra shuffles",
)
def q110_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tok = F.greatest(F.lit(1), F.ceil(F.col("n_chars") / 4.0).cast("long"))
    weight = F.when(F.col("source") == _MIX[0][0], F.lit(_MIX[0][1])).when(
        F.col("source") == _MIX[1][0], F.lit(_MIX[1][1])
    ).otherwise(F.lit(1.0))
    avail = docs.groupBy("source").agg(
        F.sum(tok).alias("available_tokens"), F.first(weight).alias("weight")
    )
    # unpartitioned window over the per-source frame: bounded by source
    # cardinality (one row per source), so the single task is benign
    wsum = F.sum("weight").over(W.partitionBy())
    alloc = F.lit(_BUDGET) * F.col("weight") / F.col("_wsum")
    return (
        avail.withColumn("_wsum", wsum)
        .select(
            "source",
            "available_tokens",
            F.round("weight", 6).alias("weight"),
            F.floor(alloc).cast("long").alias("target_tokens"),
            F.round(alloc / F.col("available_tokens"), 6).alias("epochs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q112 — weekly cohort retention over the events stream: users are
# cohorted by their first active ISO week; each (cohort, week-offset)
# cell counts distinct still-active users and its retention fraction.
# The classic product-analytics rollup, all shuffle-on-short-key: a
# (user, week) distinct, a per-user min, one hash join back, and a tiny
# cohort-size dim broadcast onto the cell frame.
# ---------------------------------------------------------------------------


@query(
    "q112_cohort_retention",
    oracle="""
    WITH w AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
    c AS (SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY user_id),
    sz AS (SELECT cohort, COUNT(*) AS cohort_size FROM c GROUP BY cohort),
    a AS (SELECT c.cohort,
                 CAST(date_diff('day', c.cohort, w.wk) // 7 AS BIGINT) AS week_offset,
                 COUNT(DISTINCT w.user_id) AS active_users
          FROM w JOIN c ON w.user_id = c.user_id
          GROUP BY c.cohort, week_offset)
    SELECT strftime(a.cohort, '%Y-%m-%d') AS cohort_week, a.week_offset,
           a.active_users, sz.cohort_size,
           ROUND(a.active_users * 1.0 / sz.cohort_size, 6) AS retention
    FROM a JOIN sz ON a.cohort = sz.cohort
    ORDER BY cohort_week, week_offset
    """,
    description="weekly cohort retention: first-active-week cohorts x week-offset activity with retention fractions — distinct (user, week) rollup, per-user min, one hash join back, cohort-size dim broadcast; every shuffle keys on a short column, no global window",
)
def q112_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = events.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    c = w.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    sz = c.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    a = (
        w.join(c, "user_id")
        .select(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    return (
        a.join(F.broadcast(sz), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "active_users",
            "cohort_size",
            F.round(F.col("active_users") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# q115 — Bloom-filter decontamination (VERDICT r3 item 8): q105's rule for
# benchmark gram sets too big to broadcast as strings. The benchmark
# collapses to its Bloom BIT SET (<= m rows no matter how many grams),
# which always broadcasts; training grams probe the bit set and only the
# tiny maybe-member candidate set is verified exactly, so the final
# flagged-docs rule stays EXACTLY q105's (Bloom has no false negatives).
# m=16384, k=3, n=|benchmark grams|~1.4k at sf0.01 -> theoretical FPR
# (1-e^(-kn/m))^k ~= 1%, and the query MEASURES it per source.
# ---------------------------------------------------------------------------

_BF_M, _BF_K = 16384, 3


def _bf_pos_sql(g: str, j: str) -> str:
    """Mirror of operators/dedup.py bloom_positions for k <= 4: position
    j is 8 hex chars carved from the SINGLE md5 digest of the gram (one
    digest per gram, not k salted ones — that was the dominant per-gram
    cost of the r5 decontamination stack)."""
    return f"CAST(CONCAT('0x', substr(md5({g}), 1 + 8 * {j}, 8)) AS BIGINT) % {_BF_M}"


@query(
    "q115_decontaminate_bloom",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, source, {_shingles('toks')} AS sh FROM t),
    ev AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE source = 'src0'),
    bl AS (SELECT DISTINCT {_bf_pos_sql('g', 'r.j')} AS pos
           FROM ev CROSS JOIN range(0, {_BF_K}) r(j)),
    gr AS (SELECT doc_id, source, unnest(sh) AS g FROM s WHERE source <> 'src0'),
    pr AS (SELECT doc_id, source, g,
                  SUM(CASE WHEN {_bf_pos_sql('g', 'r.j')} IN (SELECT pos FROM bl)
                           THEN 1 ELSE 0 END) AS h
           FROM gr CROSS JOIN range(0, {_BF_K}) r(j)
           GROUP BY doc_id, source, g),
    ver AS (SELECT doc_id, source,
                   CASE WHEN g IN (SELECT g FROM ev) THEN 1 ELSE 0 END AS true_hit
            FROM pr WHERE h = {_BF_K}),
    tot AS (SELECT doc_id, COUNT(*) AS total FROM gr GROUP BY doc_id),
    doc AS (SELECT gr0.doc_id, gr0.source, tot.total,
                   COALESCE(v.n_cand, 0) AS n_cand, COALESCE(v.hits, 0) AS hits
            FROM (SELECT DISTINCT doc_id, source FROM gr) gr0
            JOIN tot ON tot.doc_id = gr0.doc_id
            LEFT JOIN (SELECT doc_id, COUNT(*) AS n_cand, SUM(true_hit) AS hits
                       FROM ver GROUP BY doc_id) v ON v.doc_id = gr0.doc_id)
    SELECT source,
           CAST(SUM(total) AS BIGINT) AS n_grams,
           CAST(SUM(n_cand) AS BIGINT) AS n_candidates,
           CAST(SUM(n_cand - hits) AS BIGINT) AS n_false_pos,
           ROUND(SUM(n_cand - hits) * 1.0 / SUM(total - hits), 6) AS measured_fpr,
           CAST(SUM(CASE WHEN hits * 1.0 / total >= 0.2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged
    FROM doc GROUP BY source ORDER BY source
    """,
    description="Bloom-filter decontamination: benchmark grams collapse to a 2-KiB packed bitmap (engine-portable md5 Bloom — k=3 positions carved from ONE digest per gram, m=16384; FPR ~1% theoretical and measured per source); the training side probes the bitmap as a pure projection (array-literal getbit inside the scan's codegen span — no explode, no probe join, no probe aggregate), the exact verify rides the same single gram pass, and the flagged-doc rule is EXACTLY q105's (no false negatives) — the scale path when the benchmark outgrows a string broadcast: the bitmap stays 2 KiB at any benchmark size, and only FPR-bounded candidates would need the shuffle-join verify when even the verify set outgrows a broadcast",
)
def q115_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ev_docs = docs.filter(F.col("source") == "src0")
    tr_docs = docs.filter(F.col("source") != "src0")
    # benchmark side is small by construction -> no spread exchange; the
    # bitset build also skips the gram-level distinct (duplicate grams
    # map to duplicate POSITIONS, and the position-distinct inside
    # bloom_bitset subsumes gram dedup), so the whole bitmap job is
    # scan -> flat-map -> one distinct aggregate -> 2 KiB collect.
    ev_sh = D.shingle_rows(ev_docs, shingle_n=3, spread=False)
    ev_grams = ev_sh.select("shingle").distinct()
    # m_bits is a CONSTANT: the packed bitmap is 2 KiB regardless of
    # benchmark size — built once on the (small) benchmark side, then
    # probed as a literal. One corpus scan total on the training side:
    # gram flat-map -> bitmap probe column -> broadcast exact-verify ->
    # one (doc, source) aggregate -> per-source rollup.
    bits = D.bloom_bits(D.bloom_bitset(ev_sh, "shingle", _BF_M, _BF_K), _BF_M)
    probed = D.shingle_rows(tr_docs, shingle_n=3, extra_cols=("source",)).withColumn(
        "_maybe", D.bloom_maybe(F.col("shingle"), bits, _BF_M, _BF_K).cast("long")
    )
    per_doc = (
        probed.join(F.broadcast(ev_grams.withColumn("_hit", F.lit(1))), "shingle", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum("_maybe").alias("n_cand"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("hits"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("total").alias("n_grams"),
            F.sum("n_cand").alias("n_candidates"),
            F.sum(F.col("n_cand") - F.col("hits")).alias("n_false_pos"),
            F.round(
                F.sum(F.col("n_cand") - F.col("hits")) / F.sum(F.col("total") - F.col("hits")), 6
            ).alias("measured_fpr"),
            F.sum((F.col("hits") / F.col("total") >= 0.2).cast("long")).alias("n_flagged"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q117 — mergeable-sketch cardinality (Apache DataSketches HLL via
# hll_sketch_agg / hll_union_agg). The 100 TB pattern q82's
# approx_count_distinct cannot express: per-shard sketches are
# materialized ONCE, and any rollup (here: global over sources) is a
# sketch MERGE — no second scan of the data. Hash-checked the q82 way:
# exact distincts pinned in both engines, the sketch estimates asserted
# within the documented HLL error (lgK=12 -> ~1.6% standard error; 5%
# bound = ~3 sigma) as booleans the oracle expects TRUE.
# ---------------------------------------------------------------------------


@query(
    "q117_mergeable_sketches",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, source, unnest({_shingles('toks')}) AS g FROM t),
    per AS (SELECT source AS scope, COUNT(DISTINCT g) AS exact_distinct FROM s GROUP BY source),
    tot AS (SELECT 'ALL' AS scope, COUNT(DISTINCT g) AS exact_distinct FROM s)
    SELECT scope, exact_distinct, TRUE AS within_rel_err
    FROM (SELECT * FROM per UNION ALL SELECT * FROM tot)
    ORDER BY scope
    """,
    description="mergeable-sketch cardinality (DataSketches HLL, lgK=12): per-source shingle sketches built in ONE scan, global cardinality from hll_union_agg of the per-source sketches (a merge, not a rescan) - the re-aggregatable form q82's approx_count_distinct lacks; exact distincts pinned in both engines, estimates asserted within a 5% (~3 sigma) error bound as oracle-expected TRUE booleans",
)
def q117_mergeable_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    # carry `source` through the shingle flat-map (keep_cols) — joining
    # raw gram rows back to docs would shuffle the full gram stream
    with_t = docs.select(
        "doc_id", "source", F.split(F.trim(X.normalize("text")), " +").alias("_toks")
    )
    grams = X.zip_ngram_rows(with_t, "_toks", 3, "shingle", ["doc_id", "source"], " ", True)
    # HLL registers depend only on the DISTINCT hashed values, so every
    # consumer below — sketch, exact count, global distinct — runs off
    # ONE map-side-combined distinct of (source, shingle). vs the r7
    # shape this removes the Expand that countDistinct-next-to-
    # hll_sketch_agg plans (every gram row duplicated per agg path) and
    # the per-branch re-derivation of the gram flat-map (tokenize ran
    # 2x); measured 1.86 -> 0.9 s-class warm at sf0.1.
    pairs = grams.select("source", "shingle").distinct().localCheckpoint(eager=False)
    per = pairs.groupBy(F.col("source").alias("scope")).agg(
        F.hll_sketch_agg("shingle").alias("_sk"),
        F.count(F.lit(1)).alias("exact_distinct"),
    )
    per_out = per.select(
        "scope",
        "exact_distinct",
        (
            F.abs(F.hll_sketch_estimate("_sk") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= F.lit(0.05)
        ).alias("within_rel_err"),
    )
    # global = MERGE of the per-source sketches (never rescans the grams);
    # the exact side is an independent distinct over the pairs frame
    exact_all = pairs.select("shingle").distinct().agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    merged = per.agg(F.hll_sketch_estimate(F.hll_union_agg(F.col("_sk"))).alias("_est"))
    all_out = merged.crossJoin(exact_all).select(
        F.lit("ALL").alias("scope"),
        "exact_distinct",
        (
            F.abs(F.col("_est") - F.col("exact_distinct")) / F.col("exact_distinct")
            <= F.lit(0.05)
        ).alias("within_rel_err"),
    )
    return per_out.unionAll(all_out).orderBy("scope")
