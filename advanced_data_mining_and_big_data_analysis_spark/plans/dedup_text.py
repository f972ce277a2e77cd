"""Dedup + text-analysis declared queries over the ``documents`` table.

The Spark side uses operators/{text,dedup}.py; the DuckDB oracle below is
generated from the SAME primitive definitions (tokenize → shingle → salted
md5 minhash → banded buckets → jaccard verify), so the driver's hash check
pins the full dedup semantics, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import text as X
from ..sources import load_table
from .registry import query

# ---------------------------------------------------------------------------
# DuckDB fragments mirroring operators/text.py primitives
# ---------------------------------------------------------------------------

_TOKS = (
    "list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),"
    " x -> x <> '')"
)


def _shingles(toks: str) -> str:
    return (
        f"list_distinct(CASE WHEN len({toks}) >= 3 THEN "
        f"list_transform(range(1, len({toks}) - 1), i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2]) "
        f"ELSE [] END)"
    )


def _sig_list(sh: str, k: int = 16) -> str:
    mins = ", ".join(f"list_min(list_transform({sh}, s -> md5(s || '#{i}')))" for i in range(k))
    return f"[{mins}]"


_FP = f"md5(array_to_string(list_sort(list_distinct({_TOKS})), ' '))"

_SIMHASH = (
    "list_reduce(list_transform(range(0, 16), j -> CASE WHEN "
    f"2 * len(list_filter({_TOKS}, t -> strpos('89abcdef', substr(md5(t), j + 1, 1)) > 0)) "
    f"> len({_TOKS}) THEN (1::BIGINT << j) ELSE 0::BIGINT END), (a, b) -> a + b)"
)


def _stop_hits(toks: str, words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks}, t -> list_contains([{lst}], t)))"


@query(
    "q40_exact_dedup_stats",
    oracle=f"""
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique_exact,
           COUNT(DISTINCT {_FP}) AS n_unique_fingerprint
    FROM documents GROUP BY source ORDER BY source
    """,
    description="exact + token-set-fingerprint dedup statistics per source (north-star dedup tier 1-2)",
)
def q40_exact_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dup_stats(docs, "text", "source").orderBy("source")


def _neardup_ctes(docs_sql: str, cap: int) -> str:
    """CTE body (no WITH keyword) computing verified near-dup candidates
    — shared by the pair query and the recursive clustering query."""
    return f"""
    docs0 AS ({docs_sql}),
    t AS (SELECT doc_id, {_TOKS} AS toks FROM docs0),
    s AS (SELECT doc_id, {_shingles('toks')} AS sh FROM t),
    s2 AS (SELECT doc_id, sh FROM s WHERE len(sh) > 0),
    sig AS (SELECT doc_id, {_sig_list('sh')} AS sig FROM s2),
    bands AS (SELECT doc_id, b,
                     md5(array_to_string(list_slice(sig, 4 * b + 1, 4 * b + 4), '|')) AS bucket
              FROM sig CROSS JOIN range(0, 4) r(b)),
    salted AS (SELECT doc_id, b, bucket,
                      (ROW_NUMBER() OVER (PARTITION BY b, bucket
                           ORDER BY md5(bucket || CAST(doc_id AS VARCHAR)), doc_id) - 1)
                        // {cap} AS salt
               FROM bands),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM salted a JOIN salted b
               ON a.b = b.b AND a.bucket = b.bucket AND a.salt = b.salt
                  AND a.doc_id < b.doc_id),
    j AS (SELECT id_a, id_b,
                 len(list_intersect(sa.sh, sb.sh)) * 1.0
                 / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
          FROM cand JOIN s2 sa ON sa.doc_id = cand.id_a
                    JOIN s2 sb ON sb.doc_id = cand.id_b),
    verified AS (SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5)
"""


def _neardup_oracle(docs_sql: str, cap: int) -> str:
    """MinHash+LSH near-dup SQL mirroring operators/dedup.py exactly,
    including the salted per-bucket cap (salt = (rank-1) div cap, rank by
    md5(bucket || id) — same deterministic order as salt_buckets)."""
    return f"""
    WITH {_neardup_ctes(docs_sql, cap)}
    SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard
    FROM verified ORDER BY id_a, id_b
"""


@query(
    "q41_minhash_neardup",
    oracle=_neardup_oracle("SELECT doc_id, text FROM documents", 64),
    description="MinHash+LSH near-duplicate pairs (16 hashes, 4 bands, per-bucket cap 64) verified by exact shingle Jaccard (north-star dedup tier 4)",
)
def q41_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.near_dup_pairs(docs, num_hashes=16, bands=4, shingle_n=3, jaccard_threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")).orderBy("id_a", "id_b")


_BOILER = "terms of service privacy policy all rights reserved contact us for details"


@query(
    "a083_neardup_skew_capped",
    oracle=_neardup_oracle(
        f"""SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN '{_BOILER}' ELSE text END AS text
            FROM documents WHERE doc_id <= 400""",
        8,
    ),
    description="adversarial-skew LSH dedup: ~1/3 of docs share one boilerplate text (one giant bucket per band); the salted per-bucket cap (8) bounds candidate generation to O(n*cap) — hash-matched against an oracle modeling the identical salting rule",
)
def a083_neardup_skew_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 400)
    planted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, F.lit(_BOILER)).otherwise(F.col("text")),
    )
    pairs = D.near_dup_pairs(
        planted, num_hashes=16, bands=4, shingle_n=3, jaccard_threshold=0.5,
        max_bucket_size=8,
        # the doc_id <= 400 filter bounds this frame at ANY corpus scale,
        # so broadcast is the byte-correct join strategy and the q41
        # merge pins (which protect the UNBOUNDED corpus case at sf10)
        # would be pure exchange+sort overhead here
        bounded_input=True,
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")).orderBy("id_a", "id_b")


@query(
    "q42_simhash_stats",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT {_SIMHASH}) AS n_distinct_simhash
    FROM documents GROUP BY lang ORDER BY lang
    """,
    description="16-bit SimHash collision statistics per language (north-star dedup tier 3)",
)
def q42_simhash_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_stats(docs, "text", "lang").orderBy("lang")


@query(
    "q43_fingerprint_groups",
    oracle=f"""
    WITH g AS (SELECT {_FP} AS fp, COUNT(*) AS group_size FROM documents GROUP BY fp)
    SELECT group_size, COUNT(*) AS n_groups FROM g GROUP BY group_size ORDER BY group_size
    """,
    description="document-fingerprint duplicate-cluster size histogram",
)
def q43_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    groups = (
        docs.select(X.fingerprint(X.tokens("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    return groups.groupBy("group_size").agg(F.count(F.lit(1)).alias("n_groups")).orderBy("group_size")


def _lang_predict_sql() -> str:
    ratios = {
        lang: f"(CASE WHEN len(toks) > 0 THEN {_stop_hits('toks', ws)} * 1.0 / len(toks) ELSE 0.0 END)"
        for lang, ws in X.STOPWORDS.items()
    }
    langs = list(X.STOPWORDS)
    case = []
    for lang in langs[:-1]:
        conds = " AND ".join(f"{ratios[lang]} >= {ratios[o]}" for o in langs if o != lang)
        case.append(f"WHEN {conds} THEN '{lang}'")
    chain = f"CASE {' '.join(case)} ELSE '{langs[-1]}' END"
    any_hit = f"GREATEST({', '.join(ratios[lang] for lang in langs)}) > 0"
    return f"CASE WHEN {any_hit} THEN {chain} ELSE 'unknown' END"


@query(
    "q44_lang_id_confusion",
    oracle=f"""
    WITH t AS (SELECT lang AS labeled, {_TOKS} AS toks FROM documents)
    SELECT labeled, {_lang_predict_sql()} AS predicted, COUNT(*) AS n
    FROM t GROUP BY labeled, predicted ORDER BY labeled, predicted
    """,
    description="stopword-profile language-ID vs labeled lang, confusion counts (north-star text analysis)",
)
def q44_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.col("lang").alias("labeled"), X.predict_lang(X.tokens("text")).alias("predicted"))
        .groupBy("labeled", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("labeled", "predicted")
    )


@query(
    "q45_quality_scores",
    oracle=f"""
    WITH t AS (
      SELECT source, text, {_TOKS} AS toks,
             len(text) AS n_char,
             len(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS n_alnum
      FROM documents),
    q AS (
      SELECT source,
             len(toks) AS n_tokens,
             CASE WHEN n_char > 0 THEN (n_char - n_alnum) * 1.0 / n_char ELSE 0.0 END AS punct_ratio,
             CASE WHEN len(toks) > 0
                  THEN list_reduce(list_transform(toks, t -> len(t)), (a, b) -> a + b) * 1.0 / len(toks)
                  ELSE 0.0 END AS avg_token_len
      FROM t),
    s AS (
      SELECT source, n_tokens, punct_ratio,
             (CAST(n_tokens BETWEEN 20 AND 200 AS DOUBLE)
              + CAST(punct_ratio < 0.1 AS DOUBLE)
              + CAST(avg_token_len BETWEEN 3.0 AND 10.0 AS DOUBLE)) / 3.0 AS score
      FROM q)
    SELECT source, COUNT(*) AS n_docs,
           ROUND(AVG(score), 6) AS avg_quality,
           ROUND(AVG(punct_ratio), 6) AS avg_punct_ratio,
           ROUND(AVG(n_tokens), 4) AS avg_tokens
    FROM s GROUP BY source ORDER BY source
    """,
    description="quality scoring: length/punctuation/word-length gates (north-star text analysis)",
)
def q45_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    staged = X.quality_features_staged(docs, "text", keep=("source",))
    return (
        staged.select(
            "source",
            X.quality_score_from(
                F.col("n_tokens"), F.col("punct_ratio"), F.col("avg_token_len")
            ).alias("score"),
            "punct_ratio",
            "n_tokens",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("score"), 6).alias("avg_quality"),
            F.round(F.avg("punct_ratio"), 6).alias("avg_punct_ratio"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy("source")
    )


@query(
    "q46_token_counts",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
           CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
             AS total_bpe_tokens
    FROM documents GROUP BY lang ORDER BY lang
    """,
    description="whitespace vs BPE-ish regex token counting (north-star text analysis)",
)
def q46_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(X.token_count_ws("text").cast("long")).alias("total_ws_tokens"),
            F.sum(X.token_count_bpe_ish("text").cast("long")).alias("total_bpe_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "q47_char_ngram_vocab",
    oracle="""
    WITH n AS (
      SELECT lang,
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g') AS s
      FROM documents),
    g AS (
      SELECT lang, unnest(list_distinct(
               CASE WHEN len(s) >= 3
                    THEN list_transform(range(1, len(s) - 1), i -> substr(s, i, 3))
                    ELSE [] END)) AS gram
      FROM n)
    SELECT lang, COUNT(DISTINCT gram) AS n_distinct_trigrams, COUNT(*) AS n_doc_grams
    FROM g GROUP BY lang ORDER BY lang
    """,
    description="character trigram vocabulary per language (n-gram profile op)",
)
def q47_char_ngram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grams = X.char_ngram_rows(docs, "doc_id", "text", n=3, extra_cols=("lang",))
    return (
        grams.groupBy("lang")
        .agg(
            F.countDistinct("gram").alias("n_distinct_trigrams"),
            F.count(F.lit(1)).alias("n_doc_grams"),
        )
        .orderBy("lang")
    )


@query(
    "q48_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(list_filter(
               string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
               x -> x <> '')) AS term
      FROM documents),
    tf AS (SELECT doc_id, lang, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, lang, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.lang, tf.term,
             SUM(tf.tf * ln(n.n_docs * 1.0 / df.df)) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
      GROUP BY tf.lang, tf.term),
    ranked AS (
      SELECT lang, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tfidf DESC, term) AS rn
      FROM scored)
    SELECT lang, CAST(rn AS INTEGER) AS rn, term, ROUND(tfidf, 4) AS tfidf
    FROM ranked WHERE rn <= 3 ORDER BY lang, rn
    """,
    description="TF-IDF top terms per language — relational tf/df/idf over token rows, the oracle-checked twin of the MLlib CountVectorizer+IDF pipeline (north-star text analysis)",
)
def q48_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = X.token_rows(docs, "doc_id", "text", extra_cols=("lang",))
    tf = toks.groupBy("doc_id", "lang", F.col("_tok").alias("term")).agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .groupBy("lang", "term")
        .agg(F.sum(F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df"))).alias("tfidf"))
    )
    w = W.partitionBy("lang").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "rn", "term", F.round("tfidf", 4).alias("tfidf"))
        .orderBy("lang", "rn")
    )


def _cluster_ctes(docs_sql: str, cap: int) -> str:
    """CTE body through ``labels`` (id, cluster) — the recursive-CTE twin
    of ``near_dup_clusters``; shared by q88 (histogram) and q90 (survivors)."""
    return f"""{_neardup_ctes(docs_sql, cap)},
    ed AS (SELECT id_a AS a, id_b AS b FROM verified
           UNION SELECT id_b, id_a FROM verified),
    reach(id, label) AS (
      SELECT DISTINCT a, a FROM ed
      UNION
      SELECT ed.a, reach.label FROM ed JOIN reach ON ed.b = reach.id),
    labels AS (SELECT id, MIN(label) AS cluster FROM reach GROUP BY id)"""


@query(
    "a088_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_cluster_ctes("SELECT doc_id, text FROM documents", 64)},
    csizes AS (SELECT cluster, COUNT(*) AS cluster_size FROM labels GROUP BY cluster)
    SELECT cluster_size, COUNT(*) AS n_clusters
    FROM csizes GROUP BY cluster_size ORDER BY cluster_size
    """,
    description="near-duplicate CLUSTERING (dedup-group assignment): connected components over the verified LSH pair graph — iterative distributed min-label propagation on the Spark side (GraphX cc recipe in DataFrame form, rounds = component diameter), recursive CTE on the oracle side; output is the dedup-cluster size histogram",
)
def a088_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.near_dup_pairs(docs, num_hashes=16, bands=4, shingle_n=3, jaccard_threshold=0.5)
    labels = D.near_dup_clusters(pairs)
    return (
        labels.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )


@query(
    "a090_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_cluster_ctes("SELECT doc_id, text FROM documents", 64)},
    removed AS (SELECT id FROM labels WHERE id <> cluster)
    SELECT d.source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN r.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN r.id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
           ROUND(SUM(CASE WHEN r.id IS NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS pct_kept
    FROM documents d LEFT JOIN removed r ON d.doc_id = r.id
    GROUP BY d.source ORDER BY d.source
    """,
    description="dedup SURVIVOR selection — the last step of the pipeline (pairs -> clusters -> deduped corpus): every near-dup cluster keeps only its canonical min-id member via a left-anti join on the label frame; per-source kept/removed accounting",
)
def a090_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.near_dup_pairs(docs, num_hashes=16, bands=4, shingle_n=3, jaccard_threshold=0.5)
    kept = D.dedup_survivors(docs, pairs)
    total = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    kept_n = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        total.join(kept_n, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_docs") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
            F.round(F.coalesce("n_kept", F.lit(0)) / F.col("n_docs"), 6).alias("pct_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q165 — BM25 ranked retrieval: the lexical side of a hybrid search
# stack (the ANN ladder q50-q56/q164 is the dense side). Okapi BM25
# with the Lucene idf variant: score(D,Q) = sum_t idf(t) * tf*(k1+1) /
# (tf + k1*(1 - b + b*dl/avgdl)), k1=1.2, b=0.75,
# idf = ln((N - df + 0.5)/(df + 0.5) + 1).
#
# Scale shape: the query-term filter lands right after the token
# explode, so only matching (doc, term) rows survive into the tf
# aggregate — the inverted-index shape (posting lists for 3 terms),
# never a corpus-wide term table. df and the (N, avgdl) stats are
# broadcast scalars; the final ranking is one TakeOrdered top-10.
# Both engines build the score with the IDENTICAL expression tree and
# exact-integer tf/dl/df inputs, so doubles agree bit-for-bit before
# the 6-dp output round; ties break by doc_id.
# ---------------------------------------------------------------------------

_BM25_TERMS = ["hash", "join", "vector"]
_BM25_K1, _BM25_B = 1.2, 0.75


@query(
    "a0165_bm25_search",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM base),
    dl AS (SELECT doc_id, len(toks) AS dl FROM base),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS term FROM base)
           WHERE term IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
           GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT tf.doc_id,
             ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * (tf.tf * ({_BM25_K1} + 1))
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
               AS c,
             tf.tf
      FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats),
    scored AS (SELECT doc_id, ROUND(SUM(c), 6) AS bm25,
                      CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
                      CAST(SUM(tf) AS BIGINT) AS total_tf
               FROM contrib GROUP BY doc_id)
    SELECT doc_id, bm25, n_terms_matched, total_tf
    FROM scored ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
    description="Okapi BM25 ranked retrieval (k1=1.2, b=0.75, Lucene idf) for a fixed 3-term query — the lexical half of hybrid search next to the dense ANN ladder: token explode filtered to the query terms immediately (posting-list shape, no corpus-wide term table), broadcast df/N/avgdl statistics, one TakeOrdered top-10; exact-integer tf/dl/df feed an identical expression tree on both engines so the 6-dp-rounded scores and doc_id-tie-broken ranking match bit-for-bit",
)
def a0165_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", X.tokens("text").alias("toks"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    dl = base.select("doc_id", F.size("toks").alias("dl"))
    tf = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    denom = F.col("tf") + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    contrib = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * (F.col("tf") * (_BM25_K1 + 1)) / denom).alias("c"), "tf")
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.round(F.sum("c"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.sum("tf").alias("total_tf"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q168 — multi-query BM25: the batched-retrieval form of q165 (the same
# generalization q118 is to q50). The query workload is a declared
# (query_id, term) frame, so scoring N queries is ONE pass over the
# corpus: the token explode is filtered to the UNION of all query terms
# (posting lists), then the broadcast query frame fans each posting out
# to the queries that want its term, and a per-query bounded window
# takes top-k. df/N/avgdl are corpus statistics shared across queries.
#
# Scale shape: workload-sized frames (queries, df, stats) broadcast;
# the only data-proportional stages are the single corpus scan and the
# posting-list aggregation; the ranking window is partitioned by
# query_id (bounded by matched docs per query, never a global sort).
# ---------------------------------------------------------------------------

_BM25_WORKLOAD = [
    ("nav01", ["hash", "join"]),
    ("nav02", ["vector", "scan", "dup"]),
    ("nav03", ["stream", "window", "agg"]),
]
_BM25_ALL_TERMS = sorted({t for _, ts in _BM25_WORKLOAD for t in ts})
_BM25_TOPK = 5
_BM25_Q_SQL = ", ".join(
    f"('{qid}', '{t}')" for qid, ts in _BM25_WORKLOAD for t in ts
)


@query(
    "a0168_bm25_multiquery",
    oracle=f"""
    WITH queries(query_id, term) AS (VALUES {_BM25_Q_SQL}),
    base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM base),
    dl AS (SELECT doc_id, len(toks) AS dl FROM base),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS term FROM base)
           WHERE term IN ({", ".join(f"'{t}'" for t in _BM25_ALL_TERMS)})
           GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT q.query_id, tf.doc_id,
             ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * (tf.tf * ({_BM25_K1} + 1))
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
               AS c,
             tf.tf
      FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats
      JOIN queries q ON q.term = tf.term),
    scored AS (SELECT query_id, doc_id, ROUND(SUM(c), 6) AS bm25,
                      CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
                      CAST(SUM(tf) AS BIGINT) AS total_tf
               FROM contrib GROUP BY query_id, doc_id),
    ranked AS (SELECT *, ROW_NUMBER() OVER
                 (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rn
               FROM scored)
    SELECT query_id, CAST(rn AS INT) AS rnk, doc_id, bm25,
           n_terms_matched, total_tf
    FROM ranked WHERE rn <= {_BM25_TOPK}
    ORDER BY query_id, rnk
    """,
    description="batched BM25 retrieval: a (query_id, term) workload frame scored in ONE corpus pass — token explode filtered to the union of all query terms (posting lists), broadcast query frame fans postings out per query, shared corpus df/N/avgdl statistics, per-query top-5 via a query_id-partitioned window; the multi-query generalization of q165 exactly as q118 generalizes q50",
)
def a0168_bm25_multiquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    qframe = spark.createDataFrame(
        [(qid, t) for qid, ts in _BM25_WORKLOAD for t in ts],
        "query_id string, term string",
    )
    base = docs.select("doc_id", X.tokens("text").alias("toks"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    dl = base.select("doc_id", F.size("toks").alias("dl"))
    tf = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(_BM25_ALL_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    denom = F.col("tf") + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    contrib = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qframe), "term")
        .select(
            "query_id",
            "doc_id",
            (idf * (F.col("tf") * (_BM25_K1 + 1)) / denom).alias("c"),
            "tf",
        )
    )
    wrank = W.partitionBy("query_id").orderBy(F.col("bm25").desc(), "doc_id")
    return (
        contrib.groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum("c"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.sum("tf").alias("total_tf"),
        )
        .withColumn("rnk", F.row_number().over(wrank))
        .filter(F.col("rnk") <= _BM25_TOPK)
        .select("query_id", "rnk", "doc_id", "bm25", "n_terms_matched", "total_tf")
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# a0170 — phrase-query search over POSITIONAL postings: the exact-match
# counterpart of a0168's bag-of-words BM25 (Lucene PhraseQuery /
# "quoted search"). A phrase [t0 t1 ... t_{k-1}] matches doc D at start
# s iff token(s + i) == t_i for every i. Instead of a k-way self-join
# of posting lists, every posting (doc, pos) of phrase term i votes for
# candidate start (pos - i); a start with all k distinct term slots
# voting is a match — ONE aggregation regardless of phrase length.
#
# Scale shape: the positional explode is filtered to the union of all
# phrase vocabularies immediately (posting lists, never a corpus-wide
# position table); the phrase frame is broadcast so the posting stream
# is never shuffled by the join; the start-vote and per-doc aggregates
# are map-side combined; ranking is a per-query bounded window.
# ---------------------------------------------------------------------------

_PHRASES = [
    ("p1", ["table", "table"]),
    ("p2", ["fast", "table"]),
    ("p3", ["group", "value", "sort"]),
    ("p4", ["spark", "window", "batch"]),
]
_PHRASE_TERMS = sorted({t for _, ts in _PHRASES for t in ts})
_PHRASE_TOPK = 5
_PHRASE_SQL = ", ".join(
    f"('{qid}', {i}, '{t}')" for qid, ts in _PHRASES for i, t in enumerate(ts)
)


@query(
    "a0170_phrase_search",
    oracle=f"""
    WITH phrases(query_id, term_idx, term) AS (VALUES {_PHRASE_SQL}),
    plen AS (SELECT query_id, COUNT(*) AS plen FROM phrases GROUP BY query_id),
    base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    post AS (SELECT doc_id, unnest(toks) AS tok,
                    unnest(range(0, len(toks))) AS pos
             FROM base),
    hits AS (SELECT p.query_id, post.doc_id, post.pos - p.term_idx AS start,
                    p.term_idx
             FROM post JOIN phrases p ON post.tok = p.term),
    starts AS (SELECT query_id, doc_id, start,
                      COUNT(DISTINCT term_idx) AS k
               FROM hits GROUP BY query_id, doc_id, start),
    m AS (SELECT s.query_id, s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
          FROM starts s JOIN plen USING (query_id)
          WHERE s.k = plen.plen
          GROUP BY s.query_id, s.doc_id),
    ranked AS (SELECT query_id, doc_id, n_matches,
                      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY n_matches DESC, doc_id) AS INT) AS rnk
               FROM m)
    SELECT query_id, doc_id, n_matches, rnk
    FROM ranked WHERE rnk <= {_PHRASE_TOPK}
    ORDER BY query_id, rnk
    """,
    description="multi-phrase exact search over positional postings (Lucene PhraseQuery shape): each posting of phrase term i votes for candidate start pos-i, a start with all k distinct slots voting is a phrase occurrence — one aggregation regardless of phrase length, no k-way posting self-join; positional explode filtered to the phrase vocabulary immediately, broadcast phrase frame, per-query bounded top-k window; repeated-term phrases (p1) and empty result sets at small SF are exercised",
)
def a0170_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    phrases = spark.createDataFrame(
        [(qid, i, t) for qid, ts in _PHRASES for i, t in enumerate(ts)],
        "query_id string, term_idx int, term string",
    )
    plen = phrases.groupBy("query_id").agg(F.count(F.lit(1)).alias("plen"))
    post = (
        docs.select("doc_id", F.posexplode(X.tokens("text")).alias("pos", "tok"))
        .filter(F.col("tok").isin(_PHRASE_TERMS))
    )
    hits = post.join(F.broadcast(phrases), post.tok == phrases.term).select(
        "query_id", "doc_id", (F.col("pos") - F.col("term_idx")).alias("start"), "term_idx"
    )
    starts = hits.groupBy("query_id", "doc_id", "start").agg(
        F.countDistinct("term_idx").alias("k")
    )
    matches = (
        starts.join(F.broadcast(plen), "query_id")
        .filter(F.col("k") == F.col("plen"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("n_matches"), "doc_id")
    return (
        matches.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _PHRASE_TOPK)
        .orderBy("query_id", "rnk")
    )
