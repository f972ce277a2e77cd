"""Round-14 wave 2 (a0024+ name range, inside the driver's 50-slot
correctness window): retrieval fusion, embedding-truncation and LSH
quality audits, exact-substring span profiling, graph quality metrics,
trend/coverage statistics, and journey attribution.

Reference parity: no counterparts in the reference notebook
(kaggle/kaggle.py) — these extend the LLM-data-pipeline and
mining/stats axes with public-literature operators (citations at each
query)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..sources import load_table
from .registry import query

# Shared token macro (identical to operators.text.tokens on the Spark
# side; see round13._TOKS_SQL).
_TOKS_SQL = (
    "list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +'), x -> x <> '')"
)

# ---------------------------------------------------------------------------
# a0024 — reciprocal-rank fusion of lexical (BM25) and dense (cosine)
# retrieval (Cormack, Clarke & Buettcher, SIGIR 2009): the standard
# hybrid-search combiner, score(d) = sum over lists of 1/(K + rank_d).
# The lexical list is a0165's Okapi BM25 ranking (k1=1.2, b=0.75,
# Lucene idf) for the same fixed 3-term query; the dense list is
# corpus-wide cosine to a fixed query document's embedding (the
# embeddings table is doc-aligned: vec_id == doc_id). Both lists are
# truncated to depth L before fusion — RRF is rank-only, so the two
# scores never need calibrating against each other (that robustness is
# the paper's point).
#
# Scale shape: BM25 side is posting-list shaped (explode filtered to 3
# terms immediately); dense side is one corpus scan against a single
# broadcast query vector; each list's rank is a TOP-L TakeOrdered
# (never a global sort), and the fusion is an L-bounded full outer
# join. Determinism: ranks are assigned over 6-dp (lexical) / 9-dp
# (dense) rounded scores with doc_id ties, so both engines replay the
# identical permutation.
# Scale rule (100 TB): depth L and the query workload are resolution
# constants; the corpus-proportional stages are one token scan and one
# embedding scan. The batched-workload form is a0168 (lexical) x q118
# (dense) feeding the same fusion join.
# ---------------------------------------------------------------------------

_RRF_TERMS = ["hash", "join", "vector"]
_RRF_K1, _RRF_B = 1.2, 0.75
_RRF_QVEC = 42  # query document (vec_id == doc_id in the synthetic corpus)
_RRF_K = 60  # the paper's constant
_RRF_DEPTH = 50
_RRF_TOP = 15

_DIMS = 64
_RRF_DOT = (
    f"list_reduce(list_transform(range(1, {_DIMS + 1}), i -> v[i] * q[i]), (a, b) -> a + b)"
)
_RRF_NV = (
    f"sqrt(list_reduce(list_transform(range(1, {_DIMS + 1}), i -> v[i] * v[i]), (a, b) -> a + b))"
)
_RRF_NQ = (
    f"sqrt(list_reduce(list_transform(range(1, {_DIMS + 1}), i -> q[i] * q[i]), (a, b) -> a + b))"
)


@query(
    "a0024_rrf_fusion",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM base),
    dl AS (SELECT doc_id, len(toks) AS dl FROM base),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS term FROM base)
           WHERE term IN ({", ".join(f"'{t}'" for t in _RRF_TERMS)})
           GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    lex AS (SELECT tf.doc_id, ROUND(SUM(
              ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
              * (tf.tf * ({_RRF_K1} + 1))
              / (tf.tf + {_RRF_K1} * (1 - {_RRF_B} + {_RRF_B} * dl.dl / stats.avgdl))), 6) AS bm25
            FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats
            GROUP BY tf.doc_id),
    lexrk AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
              FROM lex),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings
           WHERE vec_id = {_RRF_QVEC}),
    dense AS (SELECT e.vec_id AS doc_id,
                     ROUND({_RRF_DOT} / ({_RRF_NV} * {_RRF_NQ}), 9) AS cos
              FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings WHERE vec_id <> {_RRF_QVEC}) e
              CROSS JOIN qv),
    denrk AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS r
              FROM dense),
    l AS (SELECT doc_id, r FROM lexrk WHERE r <= {_RRF_DEPTH}),
    d AS (SELECT doc_id, r FROM denrk WHERE r <= {_RRF_DEPTH}),
    fused AS (
      SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
             COALESCE(l.r, 0) AS lex_rank, COALESCE(d.r, 0) AS dense_rank,
             ROUND(COALESCE(1.0 / ({_RRF_K} + l.r), 0)
                   + COALESCE(1.0 / ({_RRF_K} + d.r), 0), 9) AS rrf
      FROM l FULL OUTER JOIN d ON d.doc_id = l.doc_id)
    SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
           CAST(dense_rank AS BIGINT) AS dense_rank,
           ROUND(rrf, 6) AS rrf_score
    FROM fused ORDER BY rrf DESC, doc_id LIMIT {_RRF_TOP}
    """,
    description=f"reciprocal-rank fusion of BM25 lexical and cosine dense retrieval (Cormack-Clarke-Buettcher SIGIR 2009, K={_RRF_K}): a0165's Okapi BM25 ranking for a fixed 3-term query fused with corpus-wide cosine to a fixed query document's embedding (vec_id==doc_id alignment), both lists truncated to depth {_RRF_DEPTH}, score = sum 1/(K+rank) over an L-bounded full outer join — rank-only fusion never calibrates the two score scales (the paper's robustness claim); posting-list lexical side + one-broadcast-vector dense scan + TakeOrdered ranks keep every stage scale-safe; ranks assigned over rounded scores with doc_id ties so both engines replay the identical permutation",
)
def a0024_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as SIM
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", X.tokens("text").alias("toks"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    dl = base.select("doc_id", F.size("toks").alias("dl"))
    tf = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(_RRF_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    denom = F.col("tf") + _RRF_K1 * (1 - _RRF_B + _RRF_B * F.col("dl") / F.col("avgdl"))
    lex = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * (F.col("tf") * (_RRF_K1 + 1)) / denom).alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("c"), 6).alias("bm25"))
    )
    lexrk = lex.select(
        "doc_id", F.row_number().over(Window.orderBy(F.desc("bm25"), "doc_id")).alias("r")
    ).filter(F.col("r") <= _RRF_DEPTH)

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", SIM.as_double("embedding").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == _RRF_QVEC).select(F.col("v").alias("q"))
    dense = (
        emb.filter(F.col("vec_id") != _RRF_QVEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(SIM.cosine(F.col("v"), F.col("q")), 9).alias("cos"),
        )
    )
    denrk = dense.select(
        "doc_id", F.row_number().over(Window.orderBy(F.desc("cos"), "doc_id")).alias("r")
    ).filter(F.col("r") <= _RRF_DEPTH)

    fused = (
        lexrk.withColumnRenamed("r", "lr")
        .join(denrk.withColumnRenamed("r", "dr"), "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lr", F.lit(0)).alias("lex_rank"),
            F.coalesce("dr", F.lit(0)).alias("dense_rank"),
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("lr")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("dr")), F.lit(0.0)),
                9,
            ).alias("rrf"),
        )
    )
    return (
        fused.orderBy(F.desc("rrf"), "doc_id")
        .limit(_RRF_TOP)
        .select(
            "doc_id",
            F.col("lex_rank").cast("long").alias("lex_rank"),
            F.col("dense_rank").cast("long").alias("dense_rank"),
            F.round("rrf", 6).alias("rrf_score"),
        )
    )


# ---------------------------------------------------------------------------
# a0025 — Matryoshka-truncation recall audit (Kusupati et al., NeurIPS
# 2022): how much ANN quality survives when the 64-d embedding is
# truncated to its first p dims (the MRL trick that cuts index size and
# distance FLOPs by 64/p at serving time). For a deterministic bounded
# query set, top-10 by squared L2 over the p-dim prefix is compared to
# the full-width top-10; recall@10 per prefix width is the shipping
# decision number.
#
# Scale shape: the query workload is bounded (vec_id % 73 == 0) and
# broadcast; each (query, prefix) candidate list is a per-partition
# TopK over ONE corpus scan (the prefix widths ride the same scan via a
# posexploded constant array — no re-read per width). Distances are
# 9-dp-rounded before ranking with vec_id ties, so both engines pick
# identical neighbor sets. Production path at 100 TB: the p-dim prefix
# feeds the IVF ladder (q96/a0164) — this audit prices that switch.
# ---------------------------------------------------------------------------

_MRL_PREFIXES = [8, 16, 32, 64]
_MRL_QMOD = 73
_MRL_TOPK = 10


def _mrl_d2_sql(p: int) -> str:
    return (
        f"ROUND(list_reduce(list_transform(range(1, {p + 1}),"
        " i -> (v[i] - q[i]) * (v[i] - q[i])), (a, b) -> a + b), 9)"
    )


@query(
    "a0025_matryoshka_recall",
    oracle=f"""
    WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    qs AS (SELECT vec_id AS qid, v AS q FROM x WHERE vec_id % {_MRL_QMOD} = 0),
    pd AS (SELECT qs.qid, x.vec_id, p.p,
                  CASE {" ".join(f"WHEN p.p = {p} THEN {_mrl_d2_sql(p)}" for p in _MRL_PREFIXES)}
                  END AS d2
           FROM x JOIN qs ON x.vec_id <> qs.qid
           CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in _MRL_PREFIXES)}]) AS p) p),
    rk AS (SELECT qid, vec_id, p,
                  ROW_NUMBER() OVER (PARTITION BY qid, p ORDER BY d2, vec_id) AS r
           FROM pd),
    top AS (SELECT qid, vec_id, p FROM rk WHERE r <= {_MRL_TOPK}),
    truth AS (SELECT qid, vec_id FROM top WHERE p = {_DIMS}),
    hits AS (SELECT t.p, t.qid, COUNT(*) AS h
             FROM top t JOIN truth USING (qid, vec_id)
             GROUP BY t.p, t.qid)
    SELECT CAST(p AS BIGINT) AS prefix_dims,
           ROUND(AVG(h * 1.0 / {_MRL_TOPK}), 6) AS avg_recall10,
           CAST(COUNT(*) AS BIGINT) AS n_queries
    FROM hits GROUP BY p ORDER BY prefix_dims
    """,
    description=f"Matryoshka-truncation recall audit (Kusupati et al. NeurIPS 2022): top-{_MRL_TOPK} by squared L2 over the first p of {_DIMS} embedding dims (p in {_MRL_PREFIXES}) vs the full-width ground truth, recall@{_MRL_TOPK} averaged over a bounded deterministic query set (vec_id % {_MRL_QMOD} = 0) — the number that prices truncating an index to 1/8 the FLOPs; one corpus scan carries all prefix widths via a posexploded constant array, queries broadcast, 9-dp-rounded distances with vec_id ties make both engines pick identical neighbor sets",
)
def a0025_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as SIM

    x = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", SIM.as_double("embedding").alias("v")
    )
    qs = x.filter(F.col("vec_id") % _MRL_QMOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("q")
    )
    pref = F.array([F.lit(p) for p in _MRL_PREFIXES])

    def d2_prefix(p: int):
        return F.round(
            F.aggregate(
                F.zip_with(
                    F.slice("v", 1, p), F.slice("q", 1, p), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, z: acc + z,
            ),
            9,
        )

    d2 = F.lit(None).cast("double")
    for p in _MRL_PREFIXES:
        d2 = F.when(F.col("p") == p, d2_prefix(p)).otherwise(d2)
    pd_ = (
        x.join(F.broadcast(qs), F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.explode(pref).alias("p"), "v", "q")
        .select("qid", "vec_id", "p", d2.alias("d2"))
    )
    w = Window.partitionBy("qid", "p").orderBy("d2", "vec_id")
    top = pd_.select("qid", "vec_id", "p", F.row_number().over(w).alias("r")).filter(
        F.col("r") <= _MRL_TOPK
    )
    truth = top.filter(F.col("p") == _DIMS).select("qid", "vec_id")
    hits = top.join(truth, ["qid", "vec_id"]).groupBy("p", "qid").agg(
        F.count(F.lit(1)).alias("h")
    )
    return (
        hits.groupBy(F.col("p").cast("long").alias("prefix_dims"))
        .agg(
            F.round(F.avg(F.col("h") * 1.0 / _MRL_TOPK), 6).alias("avg_recall10"),
            F.count(F.lit(1)).cast("long").alias("n_queries"),
        )
        .orderBy("prefix_dims")
    )


# ---------------------------------------------------------------------------
# a0026 — exact-substring duplicate SPAN profile (Lee et al., ACL 2022
# "Deduplicating Training Data Makes Language Models Better"): the
# sub-document twin of whole-doc dedup — find L-char substrings shared
# across >= 2 distinct documents and merge adjacent duplicated
# positions into maximal spans per document (the islands-and-gaps
# window), reporting per-source how many characters of the corpus are
# inside cross-document duplicated spans. q116 hashes NON-overlapping
# 8-token chunks; this operator samples OVERLAPPING stride-S char
# shingles, so span boundaries land within S chars of the true
# duplicated region instead of at chunk granularity.
#
# Honesty note: stride sampling detects copies whose offsets agree
# mod S (the synthetic corpus duplicates whole texts, offset 0, so the
# guarantee holds); the alignment-robust selection for adversarial
# offsets is winnowing (a0080), which feeds this same span-merge.
# Scale shape: one shingle frame of ~corpus_chars/S rows (S is the
# cost knob), one hash-count aggregate, one semi join back, and a
# per-doc window over duplicated positions only.
# ---------------------------------------------------------------------------

_SPAN_L = 32
_SPAN_S = 8


@query(
    "a0026_repeated_substring_spans",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, text, length(text) AS n FROM documents),
    pos AS (SELECT doc_id, p, md5(substring(text, CAST(p AS INTEGER), {_SPAN_L})) AS h
            FROM d, unnest(generate_series(1, n - {_SPAN_L - 1}, {_SPAN_S})) AS t(p)
            WHERE n >= {_SPAN_L}),
    dup AS (SELECT h FROM pos GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    dp AS (SELECT pos.doc_id, pos.p FROM pos SEMI JOIN dup USING (h)),
    flag AS (SELECT doc_id, p,
                    CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p)
                              <= {_SPAN_L} THEN 0 ELSE 1 END AS new_span
             FROM dp),
    isl AS (SELECT doc_id, p,
                   SUM(new_span) OVER (PARTITION BY doc_id ORDER BY p) AS span_id
            FROM flag),
    spans AS (SELECT doc_id, span_id,
                     MAX(p) + {_SPAN_L} - MIN(p) AS span_chars
              FROM isl GROUP BY doc_id, span_id),
    per_doc AS (SELECT doc_id, COUNT(*) AS n_spans,
                       SUM(span_chars) AS dup_chars
                FROM spans GROUP BY doc_id)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(per_doc.doc_id) AS BIGINT) AS n_docs_flagged,
           CAST(COALESCE(SUM(per_doc.n_spans), 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(SUM(per_doc.dup_chars), 0) AS BIGINT) AS dup_chars,
           ROUND(COALESCE(SUM(per_doc.dup_chars), 0) * 1.0 / SUM(d.n), 6)
             AS dup_char_frac
    FROM d LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
    description=f"exact-substring duplicate span profile (Lee et al. ACL 2022): {_SPAN_L}-char shingles sampled at stride {_SPAN_S}, shared across >= 2 distinct docs -> adjacent duplicated positions merged into maximal per-doc spans (islands-and-gaps window over duplicated positions only), per-source duplicated-character fraction — the sub-document dedup evidence whole-doc hashing (q40/q41) and non-overlapping chunk hashing (q116) cannot see; stride is the cost knob (~corpus_chars/{_SPAN_S} shingle rows), winnowing (a0080) is the alignment-robust selection for adversarially-offset copies",
)
def a0026_repeated_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.length("text").alias("n")
    )
    pos = (
        d.filter(F.col("n") >= _SPAN_L)
        .select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(1, length(text) - {_SPAN_L - 1}, {_SPAN_S})")
            ).alias("p"),
            "text",
        )
        .select("doc_id", "p", F.md5(F.expr(f"substr(text, p, {_SPAN_L})")).alias("h"))
    )
    dup = pos.groupBy("h").agg(F.count_distinct("doc_id").alias("nd")).filter(
        F.col("nd") >= 2
    )
    dp = pos.join(dup.select("h"), "h", "left_semi").select("doc_id", "p")
    wlag = Window.partitionBy("doc_id").orderBy("p")
    flag = dp.select(
        "doc_id",
        "p",
        F.when(F.col("p") - F.lag("p").over(wlag) <= _SPAN_L, 0).otherwise(1).alias(
            "new_span"
        ),
    )
    isl = flag.select(
        "doc_id",
        "p",
        F.sum("new_span").over(wlag.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "span_id"
        ),
    )
    spans = isl.groupBy("doc_id", "span_id").agg(
        (F.max("p") + _SPAN_L - F.min("p")).alias("span_chars")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"), F.sum("span_chars").alias("dup_chars")
    )
    return (
        d.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("n_spans").cast("long").alias("n_docs_flagged"),
            F.coalesce(F.sum("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(F.sum("dup_chars"), F.lit(0)).cast("long").alias("dup_chars"),
            F.round(
                F.coalesce(F.sum("dup_chars"), F.lit(0)) * 1.0 / F.sum("n"), 6
            ).alias("dup_char_frac"),
        )
        .orderBy("source")
    )
