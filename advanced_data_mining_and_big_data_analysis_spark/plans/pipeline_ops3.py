"""Round-6 training-data pipeline queries: mergeable frequency
sketches, product quantization, tokenizer training, classifier
inference, and storage-layout clustering.

These extend the sketch/similarity/corpus families (q82, q111, q114,
q117) with the remaining shapes a 100 TB curation stack runs:

- q119: count-min-sketch heavy hitters — the frequency twin of q117's
  HLL cardinality. Per-shard sketch tables are built in ONE scan and
  any rollup is a linear MERGE (bucket counts add); the no-undercount
  guarantee and merge-exactness are deterministic properties the
  oracle pins as expected-TRUE booleans, alongside exact counts pinned
  in both engines (reference analog: value-frequency scans such as
  ``np.unique`` / ``value_counts``, kaggle.py:804-806, re-expressed as
  a re-aggregatable sketch for shard-parallel corpora).
- q120: product-quantization codebook assignment + reconstruction
  audit — the PQ step real ANN services run between q111's flat int8
  quantization and q114's IVF clustering.
- q121: distributed BPE pair counting (the per-iteration scan of
  tokenizer training; the merge loop itself is
  ``operators.text.bpe_train`` and is pytest-verified against a pure
  python reference).
- q122: hashed-feature linear classifier inference (fastText-style
  quality scoring with a broadcast weight table).
- q123: z-order layout clustering (bit interleaving for multi-column
  data skipping).
- q125-q133 (added through the round): per-key EWMA smoothing as one
  ordered fold; mergeable histogram quantile sketch; ordered funnel;
  hub-capped triangle counting; incremental materialized-view
  maintenance; EXACT prefix-filter set-similarity join (the
  deterministic complement to MinHash-LSH); FP-Growth frequent
  itemsets; the warclite custom Python Data Source end-to-end; and
  ANALYZE-style one-scan table statistics.

Scale notes (100 TB):
- q119 scans the corpus once; sketch state is O(depth*width) per shard
  regardless of data size. The exact-count pass exists only to VERIFY
  the sketch locally; production rollups read the sketch tables alone.
- q120's codeword assignment is a broadcast nested-loop over k=16
  codewords per subspace — no shuffle of the embedding table at all.
- q121 shuffles (pair, count) — vocabulary-sized, with map-side
  combine — never token-stream-sized rows past the partial aggregate.
- q122 scores each document with one higher-order-function fold over
  its own token array — no explode, no per-doc shuffle; the only
  exchange in the plan is the #sources-row rollup.
- q123 is pure column math + a range partition on the z-value — the
  exact write path ``df.repartitionByRange(zval).sortWithinPartitions``
  would use for layout optimization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .dedup_text import _TOKS
from .registry import query

# ---------------------------------------------------------------------------
# q119 — count-min-sketch heavy hitters.
#
# Sketch layout: depth d=4 hash rows x width w=256 buckets, kept as a
# DataFrame of (source, depth, bucket, cnt). Hashing is native
# xxhash64(depth, token) mod w — no strings materialized, no UDF. The
# global sketch is the per-source tables MERGED by bucket addition
# (exactly how shard sketches combine on a cluster: counts are linear).
#
# The driver-hashable contract (q117 pattern): exact counts for the
# top-20 tokens are pinned in both engines; two deterministic CMS
# properties ride along as expected-TRUE booleans:
#   no_undercount — min over depth rows of the merged sketch >= exact
#     count (CMS never undercounts: every occurrence lands in the
#     probed bucket);
#   merge_exact — estimates from the merged per-source sketches equal
#     estimates from a sketch built directly over the whole corpus
#     (long addition is exact, so shard-merge loses nothing).
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 256


def _cms_bucket(tok: Column, depth: int) -> Column:
    """Bucket of `tok` in hash row `depth`: native 64-bit hash, no string concat."""
    return F.pmod(F.xxhash64(F.lit(depth), tok), F.lit(_CMS_WIDTH))


def cms_table(
    toks: DataFrame, tok_col: str, shard_cols: list[str], weight_col: str | None = None
) -> DataFrame:
    """Count-min sketch as a DataFrame: (shard_cols..., depth, bucket, cnt).

    One scan of the token stream; the explode multiplies rows by depth
    (4) before the partial aggregate, so the shuffle carries at most
    shards * depth * width rows after map-side combine. Merging shards
    = groupBy(depth, bucket).sum(cnt).

    With ``weight_col`` the input is a pre-aggregated (token, weight)
    frame instead of a raw occurrence stream — counts are linear, so
    hashing each DISTINCT token once and summing weights builds the
    identical sketch while doing vocabulary-sized (not corpus-sized)
    hash work.
    """
    hashed = toks.select(
        *shard_cols,
        *([weight_col] if weight_col else []),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("depth"), _cms_bucket(F.col(tok_col), j).alias("bucket"))
                    for j in range(_CMS_DEPTH)
                ]
            )
        ).alias("_db"),
    )
    agg = F.sum(weight_col) if weight_col else F.count("*")
    return hashed.groupBy(*shard_cols, "_db.depth", "_db.bucket").agg(agg.alias("cnt"))


def cms_estimate(sketch: DataFrame, candidates: DataFrame, tok_col: str) -> DataFrame:
    """Point-query `candidates[tok_col]` against a merged sketch.

    Candidates are expected to be tiny (top-k heavy-hitter checks), so
    the probe is a broadcast join of their depth*k (depth,bucket) pairs
    against the width-bounded sketch table.
    """
    probes = candidates.select(
        tok_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("depth"), _cms_bucket(F.col(tok_col), j).alias("bucket"))
                    for j in range(_CMS_DEPTH)
                ]
            )
        ).alias("_db"),
    ).select(tok_col, "_db.depth", "_db.bucket")
    return (
        sketch.join(F.broadcast(probes), ["depth", "bucket"])
        .groupBy(tok_col)
        .agg(F.min("cnt").alias("cms_est"))
    )


@query(
    "q119_cms_heavy_hitters",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    w AS (SELECT unnest(toks) AS token FROM t),
    c AS (SELECT token, COUNT(*) AS exact_count FROM w GROUP BY token),
    top AS (SELECT token, exact_count FROM c ORDER BY exact_count DESC, token LIMIT 20)
    SELECT token, CAST(exact_count AS BIGINT) AS exact_count,
           TRUE AS no_undercount, TRUE AS merge_exact
    FROM top ORDER BY exact_count DESC, token
    """,
    description="count-min-sketch heavy hitters (d=4, w=256): per-source sketch tables built in ONE corpus scan with native xxhash64 bucketing, global sketch = linear MERGE of the per-source tables (the re-aggregatable form a 1000-shard frequency rollup needs); top-20 exact token counts pinned in both engines, with the CMS no-undercount guarantee (merged-sketch min-over-depth >= exact) and shard-merge exactness (merged estimates == direct-build estimates) asserted as oracle-expected TRUE booleans",
)
def q119_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(X.tokens("text")).alias("token"))

    # ONE corpus scan builds the per-source term-frequency table; every
    # sketch/exact consumer below is vocabulary-sized arithmetic over it
    # (counts are linear, so weighted hashing of distinct tokens builds
    # the identical sketch). localCheckpoint materializes the frame for
    # its three consumers without leaving a CacheManager entry behind.
    tc = (
        toks.groupBy("source", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )

    # Per-source sketches and the two global variants: merged-from-shards
    # vs built-direct. CMS counts are linear, so `direct` built straight
    # off tc's (token, tf) rows is identical to building it from global
    # token totals — one fewer aggregation layer (r9 A/B: −0.1 s warm).
    per_source = cms_table(tc, "token", ["source"], weight_col="tf")
    merged = per_source.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))
    direct = cms_table(tc, "token", [], weight_col="tf")
    totals = tc.groupBy("token").agg(F.sum("tf").alias("exact_count"))

    # Exact heavy hitters (verification denominator; at production scale
    # this pass is what the sketch REPLACES).
    top = totals.orderBy(F.desc("exact_count"), "token").limit(20)

    # ONE probe join against the tagged union of both sketches (instead
    # of two broadcast joins): the top-20 probes fan out to depth
    # (depth, bucket) cells, min-over-depth per tag via conditional agg.
    sk = merged.withColumn("is_m", F.lit(True)).unionByName(
        direct.withColumn("is_m", F.lit(False))
    )
    probes = top.select("token").select(
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("depth"), _cms_bucket(F.col("token"), j).alias("bucket"))
                    for j in range(_CMS_DEPTH)
                ]
            )
        ).alias("_db"),
    ).select("token", "_db.depth", "_db.bucket")
    est = (
        sk.join(F.broadcast(probes), ["depth", "bucket"])
        .groupBy("token")
        .agg(
            F.min(F.when(F.col("is_m"), F.col("cnt"))).alias("cms_est"),
            F.min(F.when(~F.col("is_m"), F.col("cnt"))).alias("cms_est_direct"),
        )
    )
    return (
        top.join(F.broadcast(est), "token")
        .select(
            "token",
            "exact_count",
            (F.col("cms_est") >= F.col("exact_count")).alias("no_undercount"),
            (F.col("cms_est") == F.col("cms_est_direct")).alias("merge_exact"),
        )
        .orderBy(F.desc("exact_count"), "token")
    )


# ---------------------------------------------------------------------------
# q120 — product quantization: split the 64-dim embedding into m=4
# subspaces of 16 dims, assign each subvector to its nearest of k=8
# codewords, and audit the reconstruction error PQ would pay at ADC
# time. The codebook is deterministic for oracle parity — the 8
# lowest-vec_id vectors (production would train per-subspace KMeans;
# the assignment/audit plan is identical either way, the codebook is
# just an input). Distances are rounded to 9 dp BEFORE every argmin on
# both engines (float-tie rule, ADVICE r5), ties broken by lowest
# code_id via min(struct(d2, code_id)).
#
# Scale shape: the codebook is k rows — broadcast — so assignment is a
# broadcast nested-loop producing N*k rows that collapse back to N via
# a map-side-combined min aggregate; the embedding table itself is
# never shuffled at full width.
# ---------------------------------------------------------------------------

_PQ_M = 4  # subspaces
_PQ_SUB = 16  # dims per subspace
_PQ_K = 8  # codewords per subspace


def _pq_d2_sql(j: int) -> str:
    lo = j * _PQ_SUB + 1
    return (
        f"round(list_reduce(list_transform(range({lo}, {lo + _PQ_SUB}), "
        f"i -> (e.v[i] - cb.cv[i]) * (e.v[i] - cb.cv[i])), (a, b) -> a + b), 9)"
    )


@query(
    "q120_product_quantization",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cb AS (SELECT vec_id AS code_id, v AS cv FROM e WHERE vec_id < {_PQ_K}),
    pairs AS (SELECT e.vec_id, e.label, cb.code_id,
                     {', '.join(f'{_pq_d2_sql(j)} AS d{j}' for j in range(_PQ_M))}
              FROM e CROSS JOIN cb),
    mins AS (SELECT vec_id, label,
                    {', '.join(f'MIN(d{j}) AS m{j}' for j in range(_PQ_M))}
             FROM pairs GROUP BY vec_id, label),
    assign AS (SELECT p.vec_id, m.label,
                      {', '.join(f'm.m{j} AS m{j}' for j in range(_PQ_M))},
                      MIN(CASE WHEN p.d0 = m.m0 THEN p.code_id END) AS c0,
                      MIN(CASE WHEN p.d3 = m.m3 THEN p.code_id END) AS c3
               FROM pairs p JOIN mins m ON p.vec_id = m.vec_id
               GROUP BY p.vec_id, m.label, {', '.join(f'm.m{j}' for j in range(_PQ_M))})
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(m0 + m1 + m2 + m3), 6) AS avg_err2,
           {', '.join(f'ROUND(AVG(m{j}), 6) AS err_s{j}' for j in range(_PQ_M))},
           CAST(COUNT(DISTINCT c0) AS BIGINT) AS codes_used_s0,
           CAST(COUNT(DISTINCT c3) AS BIGINT) AS codes_used_s3
    FROM assign GROUP BY label ORDER BY label
    """,
    description="product quantization (m=4 subspaces x 16 dims, k=8 codewords): deterministic low-vec_id codebook broadcast against the corpus, per-subspace nearest-codeword assignment (9-dp-rounded distances, lowest-code_id tie-break via min(struct)), per-label reconstruction-error audit + codeword-usage counts — the PQ step between q111's flat int8 quantization and q114's IVF coarse clustering; N*k expansion collapses map-side, the embedding table is never shuffled at full width",
)
def q120_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    # codebook = k bounded rows, collected once and closed over by the
    # kernel (the a0018/a0001 BLAS idiom) — at production scale this is
    # the trained per-subspace codebook shipped to every executor
    cb_rows = sorted(
        emb.filter(F.col("vec_id") < _PQ_K).select("vec_id", "v").collect(),
        key=lambda r: r["vec_id"],
    )
    code_ids = np.array([int(r["vec_id"]) for r in cb_rows], dtype=np.int64)
    C = np.array([r["v"] for r in cb_rows], dtype=np.float64)  # k x 64

    # ONE Arrow mapInPandas pass replaces the r11 broadcast cross join +
    # 512-term unrolled codegen expression (whose one-time analysis/
    # codegen cost WAS the sf0.1 floor: 1.75 s of the 1.47 s warm wall,
    # data_fraction 0.0 in BENCH_FLOOR). The kernel is the same math —
    # per-subspace squared distance to all k codewords, rounded 9 BEFORE
    # argmin, np.argmin's first-occurrence = lowest code_id tie-break —
    # vectorized (n x k x 16 einsum-free broadcasting) instead of
    # per-row codegen; per-row cost drops as well, so it wins at every
    # SF, not just at the floor.
    def kernel(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.vstack(pdf["v"].to_numpy()).astype(np.float64)  # n x 64
            out = {"vec_id": pdf["vec_id"], "label": pdf["label"]}
            for j in range(_PQ_M):
                s = slice(j * _PQ_SUB, (j + 1) * _PQ_SUB)
                d = X[:, None, s] - C[None, :, s]  # n x k x 16
                d2 = np.round((d * d).sum(axis=2), 9)  # n x k
                am = np.argmin(d2, axis=1)
                out[f"d{j}"] = d2[np.arange(len(am)), am]
                out[f"c{j}"] = code_ids[am]
            yield pd.DataFrame(out)

    assign = emb.mapInPandas(
        kernel,
        "vec_id long, label int, "
        + ", ".join(f"d{j} double, c{j} long" for j in range(_PQ_M)),
    )
    return (
        assign.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg(sum(F.col(f"d{j}") for j in range(_PQ_M))), 6).alias("avg_err2"),
            *[F.round(F.avg(F.col(f"d{j}")), 6).alias(f"err_s{j}") for j in range(_PQ_M)],
            F.countDistinct("c0").alias("codes_used_s0"),
            F.countDistinct("c3").alias("codes_used_s3"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q121 — distributed BPE pair counting: the per-iteration scan of
# tokenizer training, run over the WORD-FREQUENCY table (the classic
# Sennrich formulation — one corpus scan builds (word, count); every
# merge iteration is vocabulary-sized, which is what makes BPE
# trainable over a 100 TB corpus at all). This query pins round 0:
# weighted adjacent character-pair counts, top-20 by (count desc, pair
# asc). The full iterative trainer is operators.text.bpe_train
# (argmax + greedy left-to-right merge fold, localCheckpointed per
# round), pytest-verified against a pure-python reference.
# ---------------------------------------------------------------------------


@query(
    "q121_bpe_pair_counts",
    oracle=f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    w AS (SELECT unnest(toks) AS word FROM t),
    wc AS (SELECT word, COUNT(*) AS wcount FROM w GROUP BY word),
    i AS (SELECT word, wcount, unnest(range(1, len(word))) AS pos FROM wc),
    p AS (SELECT substr(word, CAST(pos AS INT), 1) AS a,
                 substr(word, CAST(pos AS INT) + 1, 1) AS b, wcount
          FROM i)
    SELECT a, b, CAST(SUM(wcount) AS BIGINT) AS pair_count
    FROM p GROUP BY a, b
    ORDER BY pair_count DESC, a, b LIMIT 20
    """,
    description="BPE tokenizer training, round-0 pair scan: corpus -> word-frequency table (the ONLY corpus-sized job) -> weighted adjacent char-pair counts over the vocabulary frame, top-20 by (count desc, pair asc) — the per-iteration workload of Sennrich-style BPE; the full merge loop (argmax pair -> greedy left-to-right aggregate() fold rewrite -> localCheckpoint) is operators.text.bpe_train, pytest-verified against a pure-python reference trainer",
)
def q121_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    return (
        X.bpe_round0_pair_counts(X.word_counts(docs))
        .orderBy(F.desc("pair_count"), "a", "b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# a0177 — BPE ENCODE (the apply half of the tokenizer story; q121/
# bpe_train is the train half). Spark trains the merge list with
# bpe_train (one corpus scan + vocabulary-frame iterations), then
# encodes every (source, word) with operators.text.bpe_encode_repr —
# a chain of native replace() calls over the wrapped-symbol form
# <s1><s2>..., one per merge, whose semantics are EXACTLY the
# trainer's greedy skip-2 pass (see bpe_encode_repr). Token counts
# are vocabulary-factored: each distinct (source, word) is encoded
# once and weighted by its count, so the encode work is vocab-sized,
# not corpus-sized, and the corpus is scanned exactly twice (once to
# train, once for the word counts).
#
# The DuckDB oracle re-derives the SAME merges from scratch — an
# unrolled round chain (pair-count -> argmax with the trainer's
# (count DESC, a, b) tie-break -> single REPLACE rewrite per round,
# exact by the wrapped-symbol argument) — so the hash match pins
# train AND encode across engines end-to-end.
# ---------------------------------------------------------------------------

_BPE_ENC_MERGES = 8


def _bpe_encode_oracle(n_merges: int) -> str:
    rounds = []
    for k in range(n_merges):
        rounds.append(
            f"""
    p{k} AS (
      SELECT a, b FROM (
        SELECT ss[CAST(pos AS INT)] AS a, ss[CAST(pos AS INT) + 1] AS b, wcount FROM (
          SELECT wcount, ss, unnest(range(1, len(ss))) AS pos
          FROM (SELECT wcount, string_split(trim(repr, '<>'), '><') AS ss FROM v{k})))
      GROUP BY a, b ORDER BY SUM(wcount) DESC, a, b LIMIT 1),
    v{k + 1} AS (
      SELECT word, wcount,
             REPLACE(repr, '<' || a || '><' || b || '>', '<' || a || b || '>') AS repr
      FROM v{k} CROSS JOIN p{k})"""
        )
    return f"""
    WITH t AS (SELECT source, {_TOKS} AS toks FROM documents),
    w AS (SELECT source, unnest(toks) AS word FROM t),
    swc AS (SELECT source, word, COUNT(*) AS cnt FROM w GROUP BY source, word),
    wc0 AS (SELECT word, SUM(cnt) AS wcount FROM swc GROUP BY word),
    v0 AS (SELECT word, wcount,
                  regexp_replace(word, '(.)', '<\\1>', 'g') AS repr FROM wc0),{",".join(rounds)},
    enc AS (SELECT s.source, s.cnt, s.word,
                   length(v.repr) - length(REPLACE(v.repr, '>', '')) AS ntok
            FROM swc s JOIN v{n_merges} v USING (word))
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(SUM(cnt * ntok) AS BIGINT) AS n_tokens,
           ROUND(SUM(cnt * length(word)) * 1.0 / SUM(cnt * ntok), 6) AS chars_per_token,
           ROUND(SUM(cnt * ntok) * 1.0 / SUM(cnt), 6) AS tokens_per_word
    FROM enc GROUP BY source ORDER BY source
    """


@query(
    "a0177_bpe_encode",
    oracle=_bpe_encode_oracle(_BPE_ENC_MERGES),
    description="BPE tokenizer APPLY (train with bpe_train, then encode the corpus): the merge list is replayed as a chain of native replace() calls over the wrapped-symbol form <s1><s2>... — one literal pattern per merge, provably identical to the trainer's greedy skip-2 merge pass, zero UDF/explode/shuffle in the apply path; encode work is vocabulary-factored (each distinct source,word once, weighted by count); per-source rollup reports token totals, chars-per-token compression and tokens-per-word; the oracle re-derives the merges in-SQL (8 unrolled rounds with the trainer's tie-break) so the hash pins train+encode cross-engine",
)
def a0177_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    docs = load_table(spark, sf_dir, "documents")
    merges = X.bpe_train(docs, _BPE_ENC_MERGES)
    swc = (
        docs.select("source", F.explode(X.tokens("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("cnt"))
    )
    enc = X.bpe_encode_repr("word", merges)
    ntok = F.length(enc) - F.length(F.replace(enc, F.lit(">"), F.lit("")))
    return (
        swc.withColumn("_ntok", ntok)
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("_ntok")).cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("cnt") * F.length("word"))
                / F.sum(F.col("cnt") * F.col("_ntok")),
                6,
            ).alias("chars_per_token"),
            F.round(F.sum(F.col("cnt") * F.col("_ntok")) / F.sum("cnt"), 6).alias(
                "tokens_per_word"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q122 — hashed-feature linear classifier inference (fastText-style
# quality scoring): tokens hash into 1024 feature buckets (md5-prefix,
# the engine-portable q106 idiom), a 1024-row weight table is broadcast
# against the token stream, per-doc score = sigmoid(mean bucket
# weight), rolled up per source with a keep-rate at threshold 0.5.
#
# The weight table here is a FIXED deterministic function of the bucket
# (so DuckDB can rebuild it exactly); a trained classifier swaps in a
# learned 1024-entry bucket->weight map (broadcast-trivial at any model
# size that hashes into buckets). The Spark side scores each document
# with ONE higher-order-function fold over its own token array —
# tokenize -> aggregate(transform) — so there is NO explode (no row
# blowup), NO per-doc shuffle, and the only exchange in the whole plan
# is the #sources-row rollup. Weights are dyadic rationals (n/16), so
# the per-doc weight sum is exact in double regardless of fold order
# and the >= 0.5 keep decision (equivalent to sum >= 0) is exact on
# both engines. Zero-token docs score sigmoid(0) = 0.5 exactly, inline.
# ---------------------------------------------------------------------------

_CLS_BUCKETS = 1024


def _scored_docs(docs: DataFrame, *keep_cols: str) -> DataFrame:
    """(keep_cols..., score) per document — the classifier inference
    shared by q122 (scoring rollup) and q155 (calibration table); ONE
    definition so the scoring rule (md5-prefix bucket hashing, dyadic
    n/16 weights, sigmoid of the mean, zero-token docs = 0.5) cannot
    silently diverge between them.

    Two-step projection on purpose: the token array is materialized
    ONCE into ``_toks`` and the fold/size/score expressions reference
    the column. Inlining ``tokens(text)`` expands the tokenizer subtree
    three times (fold, size, score guard) — sf0.1 bench showed ~0.4 s
    of duplicated tokenize work per run from exactly that (r7). One
    higher-order-function fold over the doc's own token array: no
    explode, no join, no per-doc shuffle."""
    from ..operators import text as X

    def wgt(tok: Column) -> Column:
        bucket = F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("long") % _CLS_BUCKETS
        return ((bucket % 41) - 20) / 16.0

    t = docs.select(*keep_cols, X.tokens("text").alias("_toks"))
    s = F.aggregate(F.col("_toks"), F.lit(0.0), lambda acc, tk: acc + wgt(tk))
    n = F.size(F.col("_toks"))
    score = F.when(n > 0, F.lit(1.0) / (F.lit(1.0) + F.exp(-(s / n)))).otherwise(F.lit(0.5))
    return t.select(*keep_cols, score.alias("score"))


@query(
    "q122_classifier_scoring",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    w AS (SELECT doc_id, source, unnest(toks) AS token FROM t),
    h AS (SELECT doc_id, source,
                 CAST(CONCAT('0x', substr(md5(token), 1, 4)) AS BIGINT) % {_CLS_BUCKETS} AS bucket
          FROM w),
    wt AS (SELECT CAST(range AS BIGINT) AS bucket,
                  ((range % 41) - 20) / 16.0 AS wgt
           FROM range({_CLS_BUCKETS})),
    p AS (SELECT doc_id, ANY_VALUE(source) AS source, SUM(wgt) AS s, COUNT(*) AS n
          FROM h JOIN wt USING (bucket) GROUP BY doc_id),
    sc AS (SELECT source, 1.0 / (1.0 + exp(-(s / n))) AS score FROM p),
    tot AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    agg AS (SELECT source, COUNT(*) AS n_scored, SUM(score) AS sum_score,
                   SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS n_kept
            FROM sc GROUP BY source)
    SELECT tot.source, CAST(tot.n_docs AS BIGINT) AS n_docs,
           ROUND((COALESCE(agg.sum_score, 0) + 0.5 * (tot.n_docs - COALESCE(agg.n_scored, 0)))
                 / tot.n_docs, 6) AS avg_score,
           CAST(COALESCE(agg.n_kept, 0) + (tot.n_docs - COALESCE(agg.n_scored, 0)) AS BIGINT)
               AS n_kept
    FROM tot LEFT JOIN agg USING (source) ORDER BY source
    """,
    description="hashed-feature linear classifier inference (fastText shape): md5-prefix feature hashing into 1024 buckets, per-doc score = sigmoid(mean bucket weight) computed as ONE higher-order-function fold over the document's own token array — no explode, no per-doc shuffle; the only exchange is the #sources-row rollup; weights are dyadic rationals so the fold sum is exact in double and the keep decision cannot flip; zero-token docs score sigmoid(0)=0.5 inline; a trained model swaps in a learned bucket->weight map with the identical plan",
)
def q122_classifier_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        _scored_docs(docs, "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("score"), 6).alias("avg_score"),
            F.sum((F.col("score") >= 0.5).cast("long")).alias("n_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q123 — z-order layout clustering for multi-column data skipping (the
# Delta/Iceberg OPTIMIZE ZORDER BY primitive): interleave the bits of
# (l_partkey, l_suppkey) into a 32-bit z-value, bucket rows into 64
# fixed-width z-ranges (the "files"), and report each file's per-column
# min/max footprint — the statistics a scan planner prunes on. Under a
# z-order layout BOTH columns' footprints stay narrow per file, which
# is the whole point vs single-column sort (narrow on one, full-range
# on the other).
#
# The production write is `df.repartitionByRange(64, zval)
# .sortWithinPartitions(zval).write...`; the query keeps deterministic
# fixed-width buckets (range-partition boundaries are sampled, hence
# non-reproducible across engines) so DuckDB can mirror the math
# bit-for-bit. Pure column arithmetic — one map-side-combined
# aggregate, no joins, no UDFs, and the skipping ratio column proves
# the effect: avg fraction of the key domain a file's footprint spans.
# ---------------------------------------------------------------------------

_Z_BITS = 16
_Z_FILES = 64


def _z_terms(xe: str, ye: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({xe} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ye} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_value(x: Column, y: Column, bits: int = _Z_BITS) -> Column:
    """Bit-interleaved (Morton) z-value of two non-negative int columns."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


@query(
    "q123_zorder_layout",
    oracle=f"""
    WITH k AS (SELECT CAST(l_partkey AS BIGINT) AS xr, CAST(l_suppkey AS BIGINT) AS yr
               FROM lineitem),
    b AS (SELECT MIN(xr) AS xmn, MAX(xr) AS xmx, MIN(yr) AS ymn, MAX(yr) AS ymx FROM k),
    n AS (SELECT CASE WHEN xmx = xmn THEN 0
                      ELSE CAST(floor(1.0 * (xr - xmn) * 65535 / (xmx - xmn)) AS BIGINT) END AS x,
                 CASE WHEN ymx = ymn THEN 0
                      ELSE CAST(floor(1.0 * (yr - ymn) * 65535 / (ymx - ymn)) AS BIGINT) END AS y
          FROM k CROSS JOIN b),
    z AS (SELECT x, y, {_z_terms('x', 'y')} AS zval FROM n),
    f AS (SELECT zval >> {32 - 6} AS file_id, x, y FROM z)
    SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(x) AS pk_min, MAX(x) AS pk_max,
           MIN(y) AS sk_min, MAX(y) AS sk_max,
           ROUND(((MAX(x) - MIN(x)) + (MAX(y) - MIN(y))) / (2.0 * 65535.0), 6) AS span_frac
    FROM f GROUP BY file_id ORDER BY file_id
    """,
    description="z-order (Morton) layout clustering over (l_partkey, l_suppkey): 16-bit interleave to a 32-bit z-value, 64 fixed-width z-range 'files', per-file min/max footprints + span fraction — the multi-column data-skipping statistic OPTIMIZE ZORDER BY exists to minimize; production write path is repartitionByRange(zval).sortWithinPartitions(zval) (boundaries sampled, hence the oracle pins the deterministic fixed-width variant); pure bit-arithmetic columns, one map-side-combined aggregate, zero joins/UDFs",
)
def q123_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("long").alias("xr"), F.col("l_suppkey").cast("long").alias("yr")
    )
    # Min-max normalize each key to the 16-bit z-domain (exact integer
    # products well inside double precision, so floor() is engine-stable).
    # The bounds aggregate is one scalar row, broadcast into the scan.
    bounds = li.agg(
        F.min("xr").alias("xmn"),
        F.max("xr").alias("xmx"),
        F.min("yr").alias("ymn"),
        F.max("yr").alias("ymx"),
    )

    def norm(raw: str, mn: str, mx: str) -> Column:
        return (
            F.when(F.col(mx) == F.col(mn), F.lit(0))
            .otherwise(
                F.floor(1.0 * (F.col(raw) - F.col(mn)) * 65535 / (F.col(mx) - F.col(mn)))
            )
            .cast("long")
        )

    scaled = li.crossJoin(F.broadcast(bounds)).select(
        norm("xr", "xmn", "xmx").alias("x"), norm("yr", "ymn", "ymx").alias("y")
    )
    z = scaled.withColumn("zval", zorder_value(F.col("x"), F.col("y")))
    f = z.select(F.shiftright(F.col("zval"), 32 - 6).alias("file_id"), "x", "y")
    return (
        f.groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").alias("pk_min"),
            F.max("x").alias("pk_max"),
            F.min("y").alias("sk_min"),
            F.max("y").alias("sk_max"),
            F.round(
                ((F.max("x") - F.min("x")) + (F.max("y") - F.min("y"))) / (2.0 * 65535.0), 6
            ).alias("span_frac"),
        )
        .orderBy("file_id")
    )


# ---------------------------------------------------------------------------
# q125 — exponential smoothing (EWMA, alpha=0.5) per user over event
# time. The stateful-recursion shape (e_t = a*x_t + (1-a)*e_{t-1})
# no window frame expresses: per-key series collapse to ONE ordered
# fold — array_sort(collect_list(struct)) + aggregate() in Spark,
# list(... ORDER BY) + list_reduce in DuckDB. Both engines run the
# identical left-to-right recursion over identical doubles, so the
# result is bit-identical before the 6-dp round. Per-key state is the
# user's own series (bounded); the only shuffle is the user_id
# aggregate — the same contract as sessionization (q60).
# ---------------------------------------------------------------------------


@query(
    "q125_ewma_smoothing",
    oracle="""
    WITH a AS (SELECT user_id, COUNT(*) AS n_events,
                      list(value ORDER BY ts, event_id) AS vals
               FROM events GROUP BY user_id)
    SELECT user_id, n_events,
           ROUND(list_reduce(vals, (acc, x) -> 0.5*x + 0.5*acc), 6) AS ewma
    FROM a ORDER BY user_id
    """,
    description="per-key exponential smoothing (EWMA alpha=0.5): the stateful recursion e_t = a*x_t + (1-a)*e_{t-1} as ONE ordered fold per user — array_sort(collect_list(struct(ts,event_id,value))) + aggregate() with the first element as seed; both engines execute the identical left-to-right double recursion (dyadic alpha), so values are bit-identical pre-round; per-key state is bounded by the user's own series, the only shuffle is the user_id aggregate",
)
def q125_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.struct("ts", "event_id", "value").alias("s")
    )
    per = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.array_sort(F.collect_list("s")).alias("a")
    )
    vals = F.transform(F.col("a"), lambda x: x["value"])
    ewma = F.when(
        F.size(vals) > 1,
        F.aggregate(
            F.slice(vals, 2, F.size(vals) - 1),
            F.element_at(vals, 1),
            lambda acc, x: F.lit(0.5) * x + F.lit(0.5) * acc,
        ),
    ).otherwise(F.element_at(vals, 1))
    return per.select("user_id", "n_events", F.round(ewma, 6).alias("ewma")).orderBy("user_id")


# ---------------------------------------------------------------------------
# q126 — mergeable equi-width histogram quantile sketch. Rounds out the
# sketch family (q117 HLL cardinality, q119 CMS frequency) with the
# quantile member: per-shard (l_returnflag) histograms over 512
# fixed-width bins are built in one scan and MERGED by bucket addition;
# quantile estimate = upper edge of the first bin whose merged
# cumulative count reaches ceil(q*N). The DuckDB oracle builds the
# histogram DIRECTLY (no shards), so the hash match itself proves
# shard-merge exactness; the deterministic sketch guarantee — the
# estimate is within 2 bin widths of the exact interpolated quantile —
# rides along as an expected-TRUE boolean. Bin ids are exact (one
# IEEE multiply/divide on identical doubles), so the sketch is
# reproducible bit-for-bit across engines.
# ---------------------------------------------------------------------------

_QS_BINS = 512
_QS_QUANTILES = [0.25, 0.5, 0.75, 0.9, 0.99]


@query(
    "q126_quantile_sketch",
    oracle=f"""
    WITH b AS (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx,
                      COUNT(*) AS n,
                      {', '.join(f'quantile_cont(l_extendedprice, {q}) AS ex{i}' for i, q in enumerate(_QS_QUANTILES))}
               FROM lineitem),
    h AS (SELECT CASE WHEN b.mx = b.mn THEN 0
                       ELSE LEAST(CAST(floor((l_extendedprice - b.mn) * {_QS_BINS} / (b.mx - b.mn)) AS BIGINT),
                                  {_QS_BINS - 1}) END AS bin, COUNT(*) AS cnt
          FROM lineitem, b GROUP BY 1),
    c AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM h),
    qs AS (SELECT i, q, ex FROM (VALUES
             {', '.join(f'({i}, {q}::DOUBLE, (SELECT ex{i} FROM b))' for i, q in enumerate(_QS_QUANTILES))}
           ) t(i, q, ex)),
    est AS (SELECT qs.i, qs.q, qs.ex, MIN(c.bin) AS ebin
            FROM qs JOIN c ON c.cum >= CAST(ceil(qs.q * (SELECT n FROM b)) AS BIGINT)
            GROUP BY qs.i, qs.q, qs.ex)
    SELECT q, ROUND((SELECT mn FROM b) + (ebin + 1) * ((SELECT mx FROM b) - (SELECT mn FROM b)) / {_QS_BINS}, 6) AS est,
           ROUND(ex, 6) AS exact,
           ABS((SELECT mn FROM b) + (ebin + 1) * ((SELECT mx FROM b) - (SELECT mn FROM b)) / {_QS_BINS} - ex)
             <= 2 * ((SELECT mx FROM b) - (SELECT mn FROM b)) / {_QS_BINS} AS within_bound
    FROM est ORDER BY q
    """,
    description="mergeable equi-width histogram quantile sketch (512 bins over l_extendedprice): per-shard histograms built in ONE scan, merged by bucket addition, quantile estimate = upper edge of the first bin whose merged cumulative count reaches ceil(q*N) — the quantile member of the mergeable-sketch family (q117 HLL, q119 CMS); the oracle builds the histogram DIRECTLY so the hash match itself proves shard-merge exactness, and the deterministic 2-bin-width error bound vs the exact interpolated quantile rides along as an expected-TRUE boolean",
)
def q126_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("shard"), F.col("l_extendedprice").alias("x")
    )
    bounds = li.agg(
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.count("*").alias("n"),
        F.expr(
            f"percentile(x, array({', '.join(str(q) for q in _QS_QUANTILES)}))"
        ).alias("exacts"),
    )
    binned = li.crossJoin(F.broadcast(bounds.select("mn", "mx"))).select(
        "shard",
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("x") - F.col("mn")) * _QS_BINS / (F.col("mx") - F.col("mn"))
                ).cast("long"),
                F.lit(_QS_BINS - 1),
            )
        )
        .alias("bin"),
    )
    per_shard = binned.groupBy("shard", "bin").agg(F.count("*").alias("cnt"))
    merged = per_shard.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    # bounded frames from here down: <=512 bins x 5 quantiles
    from pyspark.sql import Window

    cum = merged.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
    )
    qs = bounds.select(
        "mn",
        "mx",
        "n",
        F.posexplode(F.array(*[F.lit(q) for q in _QS_QUANTILES])).alias("i", "q"),
        F.col("exacts"),
    ).select("mn", "mx", "n", "q", F.element_at("exacts", F.col("i") + 1).alias("ex"))
    est = (
        qs.join(F.broadcast(cum), F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q", "mn", "mx", "ex")
        .agg(F.min("bin").alias("ebin"))
    )
    width = (F.col("mx") - F.col("mn")) / _QS_BINS
    est_val = F.col("mn") + (F.col("ebin") + 1) * width
    return est.select(
        "q",
        F.round(est_val, 6).alias("est"),
        F.round(F.col("ex"), 6).alias("exact"),
        (F.abs(est_val - F.col("ex")) <= 2 * width).alias("within_bound"),
    ).orderBy("q")


# ---------------------------------------------------------------------------
# q127 — ordered funnel analysis (view -> click -> purchase): the
# event-analytics shape ClickHouse's windowFunnel / sequenceMatch
# exist for. Each step's timestamp must STRICTLY follow the previous
# step's for the same user (min qualifying time per step). Expressed
# as three user-keyed aggregates chained by broadcast-joinable
# per-user step frames — every join is on user_id, AQE-coalesced;
# timestamps stay in interval/date arithmetic (NTZ-safe, the q21 rule).
# ---------------------------------------------------------------------------


@query(
    "q127_funnel",
    oracle="""
    WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2, MIN(s1.t1) AS t1
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t3, MIN(s2.t1) AS t1
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM s1) AS n_step1,
           (SELECT COUNT(*) FROM s2) AS n_step2,
           (SELECT COUNT(*) FROM s3) AS n_step3,
           ROUND((SELECT COUNT(*) FROM s3) * 1.0 / (SELECT COUNT(*) FROM s1), 6) AS conversion,
           ROUND((SELECT AVG(datediff('day', CAST(t1 AS DATE), CAST(t3 AS DATE))) FROM s3), 6)
             AS avg_days_to_convert
    """,
    description="ordered funnel (view -> click -> purchase, strict temporal order per user): the windowFunnel/sequenceMatch analytics shape as three chained user-keyed min aggregates — each step joins the previous step's per-user frame on user_id and keeps only strictly-later events; all joins are key-local (AQE-coalesced), time arithmetic stays in date/interval space (NTZ-safe q21 rule); reports per-step user counts, conversion rate, and mean days to convert",
)
def q127_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.min("t1").alias("t1"))
    )
    c1 = s1.agg(F.count("*").alias("n_step1"))
    c2 = s2.agg(F.count("*").alias("n_step2"))
    c3 = s3.agg(
        F.count("*").alias("n_step3"),
        F.round(F.avg(F.datediff(F.to_date("t3"), F.to_date("t1"))), 6).alias(
            "avg_days_to_convert"
        ),
    )
    return (
        c1.crossJoin(c2)
        .crossJoin(c3)
        .select(
            "n_step1",
            "n_step2",
            "n_step3",
            F.round(F.col("n_step3") * 1.0 / F.col("n_step1"), 6).alias("conversion"),
            "avg_days_to_convert",
        )
    )


# ---------------------------------------------------------------------------
# q129 — incremental materialized-view maintenance (the lakehouse MV /
# CDC-refresh contract): a pre-aggregated base view absorbs a new data
# increment WITHOUT rescanning base data — counts and sums add, derived
# averages recompute from the merged sums. The DuckDB oracle computes
# the aggregate DIRECTLY over the full table, so the hash match itself
# proves increment-merge == full-recompute (the q126 proof pattern, for
# exact aggregates). Only linearly-maintainable aggregates participate;
# distinct counts need the q117 HLL sketch — that boundary is the whole
# design point.
# ---------------------------------------------------------------------------


@query(
    "q129_incremental_view",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    description="incremental materialized-view maintenance: base view (l_orderkey % 10 <> 0) pre-aggregated once, the increment (% 10 = 0) aggregated alone, merged by pure addition with averages re-derived from merged sums — the oracle aggregates the FULL table directly, so the hash match proves increment-merge == full-recompute without base rescan; only linearly-maintainable aggregates participate (distinct counts route to the q117 HLL sketch)",
)
def q129_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
    )

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            F.count("*").alias("n_rows"),
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
        )

    base = agg(li.filter(F.col("l_orderkey") % 10 != 0))
    inc = agg(li.filter(F.col("l_orderkey") % 10 == 0))
    merged = (
        base.unionByName(inc)
        .groupBy("l_returnflag")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_qty").alias("sum_qty"),
            F.sum("sum_price").alias("sum_price"),
        )
    )
    return merged.select(
        "l_returnflag",
        "n_rows",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("sum_price", 2).alias("sum_price"),
        F.round(F.col("sum_qty") / F.col("n_rows"), 6).alias("avg_qty"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# q130 — EXACT set-similarity join via prefix filtering (PPJoin-style):
# the deterministic complement to MinHash-LSH (q41, which trades recall
# for speed). Token order: global rarest-first (frequency, shingle);
# for Jaccard >= 0.6 a pair MUST share one of each doc's first
# p = n - ceil(0.6 n) + 1 ordered shingles (prefix-filter theorem), so
# candidates come from a self-join on PREFIX shingles only, then exact
# verification. ceil(0.6 n) is computed as (3n + 4) // 5 in INTEGER
# arithmetic on both engines (0.6 is not binary-exact; a float ceil
# can off-by-one the prefix), and the threshold test is the integer
# cross-multiplication 10*|I| >= 6*|U|, immune to float ties. The
# oracle generates candidates from ANY shared shingle (no prefix) —
# the hash match proves the prefix prune loses no qualifying pair.
# ---------------------------------------------------------------------------

_SIMJOIN_SH_SQL = (
    "list_distinct(CASE WHEN len(toks) >= 5 THEN "
    "list_transform(range(1, len(toks) - 3), i -> "
    "toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]) "
    "ELSE [] END)"
)


@query(
    "q130_prefix_filter_simjoin",
    oracle=f"""
    WITH t0 AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    t AS (SELECT doc_id, {_SIMJOIN_SH_SQL} AS sh FROM t0),
    tt AS (SELECT doc_id, sh, len(sh) AS n FROM t WHERE len(sh) > 0),
    e AS (SELECT doc_id, unnest(sh) AS g FROM tt),
    cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
             FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id),
    v AS (SELECT d1, d2, len(list_intersect(t1.sh, t2.sh)) AS i,
                 t1.n + t2.n - len(list_intersect(t1.sh, t2.sh)) AS u
          FROM cand JOIN tt t1 ON d1 = t1.doc_id JOIN tt t2 ON d2 = t2.doc_id)
    SELECT d1, d2, ROUND(i * 1.0 / u, 6) AS jaccard
    FROM v WHERE 10 * i >= 6 * u
    ORDER BY d1, d2
    """,
    description="EXACT set-similarity join (Jaccard >= 0.6 over distinct 5-gram shingles) via PPJoin-style prefix filtering: rarest-first (global frequency, shingle) ordering, per-doc prefix of n - ceil(0.6n) + 1 shingles, candidates only from prefix-shingle matches, exact verify with integer cross-multiplication (10|I| >= 6|U| — float-tie-proof) and integer prefix length ((3n+4)//5 — 0.6 is not binary-exact); the deterministic complement to MinHash-LSH q41, and the oracle's no-prefix candidate generation proves the prune loses nothing",
)
def q130_prefix_filter_simjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # Per-doc shingle ARRAYS are materialized ONCE behind a
    # localCheckpoint (r11 reshape): the r6 finding that an array
    # formulation was 35x slower came from Catalyst re-inlining the
    # shingle expression at every operator boundary — the checkpoint
    # removes the re-inline, and the array frame is what makes the
    # VERIFY stage scale (see below). Gram rows for the prefix filter
    # explode back out of the checkpointed arrays (one corpus scan
    # total).
    with_t = docs.select("doc_id", F.split(F.trim(X.normalize("text")), " +").alias("_toks"))
    # grams via the zip_ngram fast path (arrays_zip of offset slices,
    # flat codegen — an interpreted word_shingles HOF here measured
    # 50s vs 2s for the whole tt build at sf0.1), regrouped to arrays
    # once; array order is irrelevant to size/array_intersect
    e0 = X.zip_ngram_rows(with_t, "_toks", 5, "g", ["doc_id"], " ", True)
    tt = (
        e0.groupBy("doc_id")
        .agg(F.collect_list("g").alias("sh"), F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    e = tt.select("doc_id", F.explode("sh").alias("g"))
    nn = tt.select("doc_id", "n")
    freq = e.groupBy("g").agg(F.count("*").alias("f"))

    # rarest-first rank WITHIN each doc (partitioned window — never a
    # global rank over the vocabulary, which grows with the corpus)
    rn = F.row_number().over(Window.partitionBy("doc_id").orderBy("f", "g"))
    p = (F.col("n") - ((3 * F.col("n") + 4) / 5).cast("long") + 1).cast("int")
    # EVERY join side here grows with the corpus (gram rows, the gram-
    # frequency vocabulary, per-doc counts, candidate pairs) — hint
    # "merge" so the STATIC planner never commits to a broadcast off a
    # misestimate; AQE upgrades SMJ->broadcast at runtime when the
    # materialized side is actually small (it is at sf<=1.0), and at
    # sf10 (500k docs, 100x dup groups) the shuffle join is what
    # survives. The r11 first sf10 run OOMed the driver twice on these
    # broadcasts (BENCH_SF10 note).
    prefix = (
        e.join(freq.hint("merge"), "g")
        .withColumn("rn", rn)
        .join(nn.hint("merge"), "doc_id")
        .filter(F.col("rn") <= p)
        .select("doc_id", "g")
    )

    other = prefix.select(F.col("doc_id").alias("d2"), "g")
    cand = (
        prefix.join(other.hint("merge"), "g")
        .filter(F.col("doc_id") < F.col("d2"))
        .select(F.col("doc_id").alias("d1"), "d2")
        .distinct()
    )

    # exact verify: ROW-LOCAL array_intersect against the checkpointed
    # per-doc shingle arrays — the intermediate stays CANDIDATE-PAIR-
    # sized. The r6 shape (gram-key join + count per pair) multiplies
    # every candidate by its ~100 grams before re-collapsing: at sf10
    # (100x-replicated dup groups, ~25M true pairs) that is ~2.5B
    # in-flight rows and exhausted the execution-memory pool
    # (BENCH_SF10 r11 finding — after the first run OOMed the DRIVER
    # on a forced broadcast of the candidate set). NO broadcast hints
    # anywhere: every side is data-grown, so the joins are hinted
    # "merge" and AQE upgrades to broadcast only when the runtime size
    # is actually small.
    t1 = tt.select(
        F.col("doc_id").alias("d1"), F.col("sh").alias("sh1"), F.col("n").alias("n1")
    )
    t2 = tt.select(
        F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"), F.col("n").alias("n2")
    )
    i = F.size(F.array_intersect("sh1", "sh2"))
    v = (
        cand.join(t1.hint("merge"), "d1")
        .join(t2.hint("merge"), "d2")
        .select("d1", "d2", i.alias("i"), (F.col("n1") + F.col("n2") - i).alias("u"))
    )
    return (
        v.filter(10 * F.col("i") >= 6 * F.col("u"))
        .select("d1", "d2", F.round(F.col("i") * 1.0 / F.col("u"), 6).alias("jaccard"))
        .orderBy("d1", "d2")
    )


# ---------------------------------------------------------------------------
# q131 — frequent itemset mining (market-basket association): Spark
# ML's distributed FP-Growth over per-order part baskets, reported as
# frequent PAIRS with support and lift. FP-Growth is the right
# 100 TB algorithm (one count pass + partitioned conditional FP-trees —
# never the candidate-explosion of Apriori); the oracle recomputes the
# pair supports relationally (basket self-join, p1 < p2), so the hash
# pins FP-Growth's output against first-principles counting. The
# support threshold mirrors MLlib's internal rule exactly:
# count >= ceil(minSupport * n_baskets).
# ---------------------------------------------------------------------------

_FPM_MINSUP = 0.0002


@query(
    "q131_frequent_itemsets",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM b),
    thr AS (SELECT CAST(ceil({_FPM_MINSUP} * n) AS BIGINT) AS t, n FROM nb),
    si AS (SELECT l_partkey, COUNT(*) AS c FROM b GROUP BY 1),
    p AS (SELECT a.l_partkey AS p1, b2.l_partkey AS p2, COUNT(*) AS support
          FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
          GROUP BY 1, 2)
    SELECT p.p1, p.p2, CAST(p.support AS BIGINT) AS support,
           ROUND(p.support * 1.0 * thr.n / (s1.c * s2.c), 6) AS lift
    FROM p, thr
    JOIN si s1 ON p.p1 = s1.l_partkey
    JOIN si s2 ON p.p2 = s2.l_partkey
    WHERE p.support >= thr.t
    ORDER BY support DESC, p1, p2
    """,
    description="frequent itemset mining via distributed FP-Growth (pyspark.ml.fpm) over per-order part baskets, reported as frequent pairs with support and lift — FP-Growth's one-count-pass + partitioned conditional trees is the scale-correct association miner (no Apriori candidate explosion); the oracle recounts pair supports from a relational basket self-join and mirrors MLlib's count >= ceil(minSupport*n) threshold, so the hash pins the algorithm against first-principles counting",
)
def q131_frequent_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.fpm import FPGrowth

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.distinct().groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("items"))
    model = FPGrowth(itemsCol="items", minSupport=_FPM_MINSUP, minConfidence=0.5).fit(baskets)
    fi = model.freqItemsets
    n = baskets.agg(F.count("*").alias("n"))
    pairs = fi.filter(F.size("items") == 2).select(
        F.array_min("items").alias("p1"), F.array_max("items").alias("p2"),
        F.col("freq").alias("support"),
    )
    singles = fi.filter(F.size("items") == 1).select(
        F.element_at("items", 1).alias("item"), F.col("freq").alias("c")
    )
    s1 = singles.select(F.col("item").alias("p1"), F.col("c").alias("c1"))
    s2 = singles.select(F.col("item").alias("p2"), F.col("c").alias("c2"))
    return (
        pairs.join(s1, "p1")
        .join(s2, "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "support",
            F.round(F.col("support") * 1.0 * F.col("n") / (F.col("c1") * F.col("c2")), 6).alias(
                "lift"
            ),
        )
        .orderBy(F.desc("support"), "p1", "p2")
    )


# ---------------------------------------------------------------------------
# a0133 (ex-q132, renamed r10 to enter the driver's sorted()[:50]
# correctness window) — custom Python Data Source end-to-end
# (sources/warclite.py):
# a record-container corpus format registered as a first-class
# spark.read/write format. The query writes a closed-form fixture
# corpus through the warclite WRITER (one .wlc file per partition,
# commit-message protocol), reads it back through the READER with a
# doc_id range predicate (file-level pruning from header min/max via
# pushFilters, row-level re-check by Spark), and aggregates per mime.
# The oracle recomputes the expected aggregate from the generating
# formula — a wrong writer framing, reader parse, filter semantics, or
# partition plan all skew the hash.
# ---------------------------------------------------------------------------

_WLC_N = 96


@query(
    "a0133_warclite_source",
    oracle=f"""
    WITH d AS (SELECT i, CASE WHEN i % 3 = 0 THEN 'text/plain'
                              WHEN i % 3 = 1 THEN 'text/html'
                              ELSE 'application/json' END AS mime,
                      16 + (i % 7) AS plen
               FROM range(0, {_WLC_N}) t(i)
               WHERE i >= 24 AND i < 72)
    SELECT mime, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(plen) AS BIGINT) AS total_bytes,
           CAST(MIN(i) AS BIGINT) AS min_doc, CAST(MAX(i) AS BIGINT) AS max_doc
    FROM d GROUP BY mime ORDER BY mime
    """,
    description="custom Python Data Source end-to-end (Spark 4 pyspark.sql.datasource): the warclite record-container format's writer (one .wlc per partition + commit protocol) and reader (one InputPartition per file, doc_id pushFilters pruning whole files from header min/max stats before any payload read) driven through spark.write/read.format('warclite') with a range predicate; the oracle recomputes the per-mime aggregate from the generating formula, so writer framing, reader parsing, filter semantics, and the partition plan are all under the hash",
)
def a0133_warclite_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..sources import warclite as W

    W.register(spark)
    # per-process scratch dir: a FIXED path raced when two harnesses
    # (pytest + check_oracle) ran q132 concurrently — one overwrote the
    # container files while the other was mid-read
    out_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_q132_warclite_{os.getpid()}"
    )
    fixture = spark.range(_WLC_N).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("text/plain"), F.lit("text/html"), F.lit("application/json")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("mime"),
        # payload length 16 + (id % 7): 'x' padding, closed-form in id
        F.encode(F.rpad(F.lit(""), (16 + F.col("id") % 7).cast("int"), "x"), "utf-8").alias(
            "content"
        ),
    ).repartition(4, "doc_id")
    fixture.write.format("warclite").mode("overwrite").save(out_dir)

    back = (
        spark.read.format("warclite")
        .load(out_dir)
        .filter((F.col("doc_id") >= 24) & (F.col("doc_id") < 72))
    )
    return (
        back.groupBy("mime")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("mime")
    )


# ---------------------------------------------------------------------------
# q133 — ANALYZE-style column statistics in ONE scan: the catalog stats
# a cost-based optimizer (and every lakehouse manifest) keeps per
# column — distinct count, null count, min/max. All columns' stats are
# computed in a single aggregate pass over the table (one scan, one
# partial+final pipeline, no per-column jobs), then unpivoted to the
# canonical (column, stat...) catalog shape with a bounded explode. At
# production scale the exact ndv becomes the q117 HLL sketch; the scan
# shape is identical.
# ---------------------------------------------------------------------------

_STATS_COLS = ["l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus", "l_shipdate"]


@query(
    "q133_table_stats",
    oracle="""
    SELECT 'l_orderkey' AS col, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(MIN(l_orderkey) AS VARCHAR) AS min_val, CAST(MAX(l_orderkey) AS VARCHAR) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_suppkey', CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
           CAST(SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MIN(l_suppkey) AS VARCHAR), CAST(MAX(l_suppkey) AS VARCHAR) FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
           CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR) FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', CAST(COUNT(DISTINCT l_linestatus) AS BIGINT),
           CAST(SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MIN(l_linestatus) AS VARCHAR), CAST(MAX(l_linestatus) AS VARCHAR) FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR) FROM lineitem
    ORDER BY col
    """,
    description="ANALYZE-style per-column catalog statistics (ndv, null count, min/max) for five lineitem columns computed in ONE aggregate scan (single partial+final pipeline, no per-column jobs), unpivoted to the (column, stats...) catalog shape with a bounded explode — the CBO/manifest stats surface; at 100 TB the exact ndv swaps for the q117 HLL sketch with the identical scan shape",
)
def q133_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(*_STATS_COLS)
    aggs = []
    for c in _STATS_COLS:
        aggs += [
            F.countDistinct(c).alias(f"{c}__ndv"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"),
            # min/max on the NATIVE type (string-cast first would order
            # "9999" above "14999"), cast to the catalog's string form after
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    one = li.agg(*aggs)
    packed = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(f"{c}__ndv").alias("ndv"),
                        F.col(f"{c}__nn").alias("n_null"),
                        F.col(f"{c}__mn").alias("min_val"),
                        F.col(f"{c}__mx").alias("max_val"),
                    )
                    for c in _STATS_COLS
                ]
            )
        ).alias("s")
    )
    return packed.select("s.col", "s.ndv", "s.n_null", "s.min_val", "s.max_val").orderBy("col")


# ---------------------------------------------------------------------------
# q134 — Pareto skyline over supplier aggregates: the multi-objective
# dominance query (maximize revenue, minimize average discount given).
# The skyline runs over a GROUPED frame (one row per supplier — bounded
# by the dimension's cardinality, never the fact table), so the
# quadratic dominance anti-join is dimension-sized; the fact scan
# collapses through one map-side-combined aggregate first. All compared
# quantities are rounded identically in both engines before the strict/
# non-strict dominance tests (float-tie rule).
# ---------------------------------------------------------------------------


@query(
    "q134_pareto_skyline",
    oracle="""
    WITH a AS (SELECT l_suppkey,
                      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                               * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE) AS rev,
                      ROUND(AVG(l_discount), 6) AS avg_disc
               FROM lineitem GROUP BY l_suppkey)
    SELECT s.l_suppkey, s.rev, s.avg_disc
    FROM a s
    WHERE NOT EXISTS (
      SELECT 1 FROM a t
      WHERE t.rev >= s.rev AND t.avg_disc <= s.avg_disc
        AND (t.rev > s.rev OR t.avg_disc < s.avg_disc))
    ORDER BY s.l_suppkey
    """,
    description="Pareto skyline (maximize revenue, minimize avg discount) over per-supplier aggregates: the multi-objective dominance query, run as an anti-join on the GROUPED dimension-sized frame (suppliers), never the fact table — the fact scan collapses through one map-side-combined aggregate first; dominance quantities rounded identically in both engines before the strict/non-strict comparisons",
)
def q134_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # exact-decimal revenue (the q135 lesson): dominance comparisons on
    # a last-ulp-different double could flip a skyline membership
    a = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("rev"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )
    t = a.select(
        F.col("rev").alias("t_rev"), F.col("avg_disc").alias("t_disc")
    )
    dominated = (
        (F.col("t_rev") >= F.col("rev"))
        & (F.col("t_disc") <= F.col("avg_disc"))
        & ((F.col("t_rev") > F.col("rev")) | (F.col("t_disc") < F.col("avg_disc")))
    )
    return a.join(t, dominated, "left_anti").orderBy("l_suppkey")


# ---------------------------------------------------------------------------
# q135 — trailing-window anomaly detection over the daily revenue
# series: flag days whose revenue deviates more than 2 sample standard
# deviations from the PRECEDING 7 days (the current day is excluded
# from its own baseline — the classic leakage mistake). The window runs
# over the calendar-bounded daily rollup (q74/q86/q89 precedent), never
# raw facts; deviation quantities are rounded to 9 dp on both engines
# before the threshold comparison.
# ---------------------------------------------------------------------------


@query(
    "q135_anomaly_flags",
    oracle="""
    WITH d AS (SELECT CAST(l_shipdate AS DATE) AS day,
                      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                               * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE) AS rev
               FROM lineitem GROUP BY 1),
    w AS (SELECT day, rev,
                 AVG(rev) OVER win AS avg7,
                 STDDEV_SAMP(rev) OVER win AS std7,
                 COUNT(*) OVER win AS n7
          FROM d
          WINDOW win AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT CAST(day AS VARCHAR) AS day, ROUND(rev, 2) AS rev,
           ROUND((rev - avg7) / std7, 6) AS sigma
    FROM w
    WHERE n7 = 7 AND std7 > 0
      AND ROUND(ABS(rev - avg7), 9) > ROUND(2 * std7, 9)
    ORDER BY day
    """,
    description="trailing-window anomaly detection on the daily revenue series: flag days > 2 sample stddevs from the PRECEDING 7 days (current day excluded from its own baseline — the leakage rule), window over the calendar-bounded daily rollup only (q74/q86/q89 precedent); deviation and threshold rounded to 9 dp on both engines before comparison",
)
def q135_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    # exact-decimal accumulation: double sums differ in the last ulp by
    # partition order, and a 2-dp round at a .005 boundary then diverges
    # across engines (bit us on first run); decimal sums are exact, so
    # both engines round the SAME number
    d = li.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("rev")
    )
    win = Window.orderBy("day").rowsBetween(-7, -1)
    w = d.select(
        "day",
        "rev",
        F.avg("rev").over(win).alias("avg7"),
        F.stddev_samp("rev").over(win).alias("std7"),
        F.count("*").over(win).alias("n7"),
    )
    return (
        w.filter(
            (F.col("n7") == 7)
            & (F.col("std7") > 0)
            & (F.round(F.abs(F.col("rev") - F.col("avg7")), 9) > F.round(2 * F.col("std7"), 9))
        )
        .select(
            F.col("day").cast("string").alias("day"),
            F.round("rev", 2).alias("rev"),
            F.round((F.col("rev") - F.col("avg7")) / F.col("std7"), 6).alias("sigma"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q155 — classifier score calibration table (reliability diagram):
# q122's per-doc scores bucketed into deciles, each decile reporting
# its mean score vs the empirical keep base-rate proxy (fraction of
# docs whose score clears the 0.5 gate) plus the population share.
# The ML-eval table every scored-corpus pipeline publishes next to its
# keep decisions; one scan (the q122 fold) + one decile aggregate.
# Decile edges are exact arithmetic on the dyadic-safe scores, so
# bucket membership cannot flip between engines.
# ---------------------------------------------------------------------------


@query(
    "a0155_score_calibration",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    w AS (SELECT doc_id, unnest(toks) AS token FROM t),
    h AS (SELECT doc_id,
                 CAST(CONCAT('0x', substr(md5(token), 1, 4)) AS BIGINT) % 1024 AS bucket
          FROM w),
    wt AS (SELECT CAST(range AS BIGINT) AS bucket, ((range % 41) - 20) / 16.0 AS wgt
           FROM range(1024)),
    p AS (SELECT doc_id, SUM(wgt) AS s, COUNT(*) AS n
          FROM h JOIN wt USING (bucket) GROUP BY doc_id),
    sc AS (
      SELECT 1.0 / (1.0 + exp(-(s / n))) AS score FROM p
      UNION ALL
      SELECT 0.5 AS score FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.doc_id = d.doc_id)),
    b AS (SELECT LEAST(CAST(floor(score * 10) AS INTEGER), 9) AS decile, score FROM sc)
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(score), 6) AS mean_score,
           ROUND(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS kept_frac,
           ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM sc), 6) AS pop_share
    FROM b GROUP BY decile ORDER BY decile
    """,
    description="classifier score calibration table (reliability diagram) over q122's fold-computed scores: decile buckets (exact floor(score*10) edges on dyadic-safe scores, so membership cannot flip between engines) reporting count, mean score, fraction clearing the 0.5 keep gate, and population share — the ML-eval table a scored-corpus pipeline publishes next to its keep decisions; one corpus scan plus a 10-row aggregate",
)
def a0155_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sc = _scored_docs(docs)
    total = sc.agg(F.count("*").alias("tot"))
    b = sc.select(
        F.least(F.floor(F.col("score") * 10).cast("int"), F.lit(9)).alias("decile"),
        "score",
    )
    return (
        b.groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(
                F.sum((F.col("score") >= 0.5).cast("long")) * F.lit(1.0) / F.count("*"), 6
            ).alias("kept_frac"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_docs",
            "mean_score",
            "kept_frac",
            F.round(F.col("n_docs") * F.lit(1.0) / F.col("tot"), 6).alias("pop_share"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q156 — sketch-based join-size estimation (CMS inner product): the
# optimizer-statistics companion to q149's skew report. |A join B| on a
# key equals sum_k fA(k)*fB(k); with CMS tables of both sides the
# estimate is min over hash rows of the bucketwise count dot product —
# a width*depth-sized computation no matter how large the inputs, and
# it NEVER underestimates (hash collisions only add mass). Exact join
# size rides along to pin the guarantee; both sketches reuse q119's
# cms_table (one scan per side, merge-friendly counts).
# ---------------------------------------------------------------------------


@query(
    "a0156_join_size_estimate",
    oracle=f"""
    WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
    b AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
    exact AS (SELECT COUNT(*) AS n FROM a JOIN b USING (k))
    SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_left,
           CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_right,
           CAST((SELECT n FROM exact) AS BIGINT) AS exact_join_size,
           TRUE AS never_underestimates
    """,
    description="sketch-based join cardinality estimation (CMS inner product): |A join B| = sum_k fA(k)*fB(k), estimated as the min over hash rows of the bucketwise dot product of the two sides' count-min tables (width*depth work regardless of input size, reusing q119's cms_table); the estimate provably never underestimates (collisions only add mass) — pinned against the exact join size as an oracle-expected TRUE boolean; the sketch statistics a distributed optimizer consults before choosing a join strategy, companion to q149's skew probe",
)
def a0156_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    sk_a = cms_table(a, "k", []).withColumnRenamed("cnt", "ca")
    sk_b = cms_table(b, "k", []).withColumnRenamed("cnt", "cb")
    est = (
        sk_a.join(sk_b, ["depth", "bucket"])
        .groupBy("depth")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
        .agg(F.min("dot").alias("est"))
    )
    na = a.agg(F.count("*").alias("n_left"))
    nb = b.agg(F.count("*").alias("n_right"))
    exact = a.join(b, "k").agg(F.count("*").alias("exact_join_size"))
    return (
        na.crossJoin(nb)
        .crossJoin(exact)
        .crossJoin(F.broadcast(est))
        .select(
            "n_left",
            "n_right",
            "exact_join_size",
            # An empty intersection leaves the sketch join with zero
            # (depth,bucket) rows, so min('dot') is NULL — coalesce to 0
            # (estimate 0 >= exact 0 still satisfies the guarantee) so the
            # boolean stays literal TRUE instead of going NULL.
            (F.coalesce(F.col("est"), F.lit(0)) >= F.col("exact_join_size")).alias(
                "never_underestimates"
            ),
        )
    )
