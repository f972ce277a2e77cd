"""Round-13 wave (a0003–a0049 name range): incremental SemDeDup, a
grid-blocked kNN classifier, corpus-statistics laws (Zipf, Heaps),
stylometric Burrows' Delta, k-core peeling, and PMI collocations.

Named below a0050 so they sort into the driver's 50-slot correctness
window ``sorted(queries())[:50]`` (COVERAGE.md window mechanics) — every
NEW query gets driver-dated in its own round.

Reference parity: no counterpart in the reference notebook
(kaggle/kaggle.py) — these extend the LLM-data-pipeline and mining axes
the brief makes first-class (corpus growth dedup, text-corpus laws,
authorship statistics, graph cores, collocation mining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..sources import load_table
from .registry import query
from .similarity import _DIMS, _SD_PLANT, _SD_THR

# ---------------------------------------------------------------------------
# a0003 — INCREMENTAL SemDeDup (the q108 bucket-probe idiom lifted to
# the embedding space — VERDICT r12 item 8): the corpus has already
# been deduplicated once ("old" = 80% of vectors); a growth batch
# arrives ("new" = vec_id % 5 == 3, plus the planted 1.01-rescaled
# copies of vec_id < _SD_PLANT at +100000). The coarse codebook was
# built when the OLD corpus was deduped — stride seeds over old ids
# only — and new vectors are assigned into the EXISTING cells, so the
# only pair work is new x cell-members: each new vector compares
# against its cell's occupants (old members and earlier-priority new
# members), never old x old again. Priority is (is_new, vec_id)
# lexicographic — old corpus always wins a tie, matching what a
# production incremental dedup does (the kept id is stable across
# growth batches).
#
# Scale shape (why this is "corpus growth nearly free"): per growth
# batch the matmul work is n_new * cell_size, not cell_size^2 — q108
# measured the relational version of this 170x faster than recompute
# at sf10; the salted per-cell cap (a0001's guard, replayed by the
# oracle) bounds every task at cap * cap whatever the duplicate
# multiplicity. In production old assignments are CACHED (the
# assignment pass here re-derives them only so the oracle can replay
# the rule end-to-end; the docstring contract is that old cell ids are
# a stored column at 100 TB).
# ---------------------------------------------------------------------------

_INC_TARGET = 200  # target cell size (a0001's rule, applied to the OLD corpus)
_INC_CAP = 200  # salted per-cell cap


@query(
    "a0003_semdedup_incremental",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             CASE WHEN vec_id % 5 = 3 THEN 1 ELSE 0 END AS is_new
      FROM embeddings),
    x AS (
      SELECT vec_id, v, is_new FROM base
      UNION ALL
      SELECT vec_id + 100000, list_transform(v, e -> e * 1.01), 1
      FROM base WHERE vec_id < {_SD_PLANT}),
    old_n AS (SELECT COUNT(*) AS n,
                     CAST(CEIL(COUNT(*) / {_INC_TARGET}.0) AS BIGINT) AS k
              FROM base WHERE is_new = 0),
    st AS (SELECT CAST(CEIL(n / (k * 1.0)) AS BIGINT) AS step FROM old_n),
    seeds AS (SELECT vec_id AS sid, v AS sv
              FROM base, st WHERE is_new = 0 AND vec_id % step = 0),
    dist AS (
      SELECT x.vec_id, s.sid,
             ROUND(SUM((x.v[r.dim] - s.sv[r.dim]) * (x.v[r.dim] - s.sv[r.dim])), 9) AS d2
      FROM x CROSS JOIN range(1, {_DIMS + 1}) r(dim) CROSS JOIN seeds s
      GROUP BY x.vec_id, s.sid),
    best AS (
      SELECT vec_id, sid AS cluster,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, sid) AS rn
      FROM dist),
    assign AS (
      SELECT x.vec_id, x.v, x.is_new, b.cluster
      FROM x JOIN best b ON b.vec_id = x.vec_id AND b.rn = 1),
    sal AS (
      SELECT vec_id, v, is_new, cluster,
             CAST(FLOOR((ROW_NUMBER() OVER (
               PARTITION BY cluster
               ORDER BY md5(CAST(cluster AS VARCHAR) || CAST(vec_id AS VARCHAR)),
                        vec_id) - 1) / {_INC_CAP}) AS BIGINT) AS salt
      FROM assign),
    p AS (
      SELECT a.vec_id AS removed_id, b.vec_id AS cand_id, b.is_new AS cand_new,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY b.is_new, b.vec_id) AS rk
      FROM sal a JOIN sal b
        ON a.cluster = b.cluster AND a.salt = b.salt
       AND a.is_new = 1
       AND (b.is_new < a.is_new OR (b.is_new = a.is_new AND b.vec_id < a.vec_id))
      WHERE ROUND(
        list_reduce(list_transform(range(1, {_DIMS + 1}), i -> a.v[i] * b.v[i]), (s, t) -> s + t)
        / (sqrt(list_reduce(list_transform(range(1, {_DIMS + 1}), i -> a.v[i] * a.v[i]), (s, t) -> s + t))
           * sqrt(list_reduce(list_transform(range(1, {_DIMS + 1}), i -> b.v[i] * b.v[i]), (s, t) -> s + t))), 9)
        >= {_SD_THR})
    SELECT removed_id, cand_id AS kept_id,
           CAST(1 - cand_new AS BIGINT) AS kept_is_old
    FROM p WHERE rk = 1 ORDER BY removed_id
    """,
    description=f"INCREMENTAL SemDeDup (q108's bucket-probe idiom in embedding space): the codebook is stride-seeded from the OLD corpus only, the growth batch (20% natural + planted 1.01-rescaled copies) assigns into the EXISTING cells, and pair work is new x cell-members with priority (is_new, vec_id) — old keeps always win, removed new vectors report their kept occupant and whether it is old; the salted per-cell cap (rank by md5(cell||id), shard at {_INC_CAP}) bounds every task at cap^2 under any duplicate multiplicity — corpus growth costs n_new * cell, never cell^2",
)
def a0003_semdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        SIM.as_double("embedding").alias("v"),
        F.when(F.col("vec_id") % 5 == 3, 1).otherwise(0).alias("is_new"),
    )
    # codebook from the OLD corpus only — the cells predate the growth
    # batch (bounded driver collect, the a0001 documented bound)
    old = base.filter(F.col("is_new") == 0)
    n_old = old.count()
    k = -(-n_old // _INC_TARGET)
    step = -(-n_old // k)
    seed_rows = old.filter(F.col("vec_id") % step == 0).orderBy("vec_id").collect()
    sids = np.array([r["vec_id"] for r in seed_rows], dtype=np.int64)
    cmat = np.array([r["v"] for r in seed_rows], dtype=np.float64)

    planted = base.filter(F.col("vec_id") < _SD_PLANT).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("v", lambda e: e * F.lit(1.01)).alias("v"),
        F.lit(1).alias("is_new"),
    )
    x = base.unionAll(planted)

    c2 = (cmat * cmat).sum(axis=1)[None, :]

    def assign_batches(it):
        # nearest old-corpus seed, BLAS expansion form (a0001's kernel):
        # round-9 absorbs reassociation; ties break to the lowest seed id
        for pdf in it:
            if len(pdf) == 0:
                continue
            xm = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            x2 = (xm * xm).sum(axis=1, keepdims=True)
            acc = x2 - 2.0 * (xm @ cmat.T) + c2
            cl = sids[np.argmin(np.round(acc, 9), axis=1)]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cluster": cl, "v": pdf["v"], "is_new": pdf["is_new"]}
            )

    assign = x.mapInPandas(
        assign_batches, "vec_id long, cluster long, v array<double>, is_new int"
    )
    wc = Window.partitionBy("cluster").orderBy(
        F.md5(F.concat(F.col("cluster").cast("string"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    salted = assign.withColumn(
        "salt", F.floor((F.row_number().over(wc) - 1) / _INC_CAP).cast("long")
    )

    thr = _SD_THR

    def probe_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # new x cell-members matmul (n_new rows against ALL members in
        # priority order) — the incremental cost shape; float64 so
        # round(cos, 9) agrees with the SQL oracle
        pdf = pdf.sort_values(["is_new", "vec_id"]).reset_index(drop=True)
        newsel = pdf["is_new"].to_numpy() == 1
        if not newsel.any():
            return pd.DataFrame({"removed_id": [], "kept_id": [], "kept_is_old": []}).astype(
                {"removed_id": "int64", "kept_id": "int64", "kept_is_old": "int64"}
            )
        xm = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(xm, axis=1)
        norms[norms == 0.0] = 1.0
        ids = pdf["vec_id"].to_numpy()
        isnew = pdf["is_new"].to_numpy()
        new_idx = np.nonzero(newsel)[0]
        # dot first, divide after — the exact float order of the a0001
        # kernel and the oracle's sum/(sqrt*sqrt), so round-9 agrees
        cos = np.round(
            (xm[new_idx] @ xm.T) / np.outer(norms[new_idx], norms), 9
        )
        out = []
        for row, ia in enumerate(new_idx):
            if ia == 0:
                continue
            hits = np.nonzero(cos[row, :ia] >= thr)[0]
            if len(hits):
                j = hits[0]  # min (is_new, vec_id) == first in sorted order
                out.append((int(ids[ia]), int(ids[j]), int(1 - isnew[j])))
        return pd.DataFrame(out, columns=["removed_id", "kept_id", "kept_is_old"]).astype(
            {"removed_id": "int64", "kept_id": "int64", "kept_is_old": "int64"}
        )

    return (
        salted.groupBy("cluster", "salt")
        .applyInPandas(probe_pairs, "removed_id long, kept_id long, kept_is_old long")
        .orderBy("removed_id")
    )


# ---------------------------------------------------------------------------
# a0005 — Zipf's-law fit over the corpus frequency spectrum: tokens are
# counted once, ranked by (count DESC, token), and the top-R points
# (ln rank, ln count) get an OLS line — slope ~ -s is the Zipf
# exponent, r^2 the fit quality. The spectrum is the first thing a
# training-data curator reads off a new corpus (natural text ~ -1;
# boilerplate/template corpora skew shallow with high r^2 at the head).
# One tokenize + one (token)-keyed aggregate is the only data-sized
# work; the ranked spectrum and the OLS moments are vocabulary-bounded.
# Scale rule (100 TB): R is a fit-window constant (the law is read off
# the head of the spectrum); the vocabulary frame the window ranks is
# corpus-vocabulary-bounded, not N-bounded.
# ---------------------------------------------------------------------------

_ZIPF_R = 1000

_TOKS_SQL = (
    "list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +'), x -> x <> '')"
)


@query(
    "a0005_zipf_fit",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS tk FROM documents),
    w AS (SELECT unnest(tk) AS w FROM toks),
    cnt AS (SELECT w, COUNT(*) * 1.0 AS c FROM w GROUP BY w),
    rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r FROM cnt),
    pts AS (SELECT ln(r * 1.0) AS x, ln(c) AS y FROM rk WHERE r <= {_ZIPF_R}),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM w),
    voc AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size FROM cnt),
    m AS (SELECT COUNT(*) * 1.0 AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
          FROM pts)
    SELECT tot.n_tokens, voc.vocab_size, CAST(m.n AS BIGINT) AS n_fit,
           ROUND((m.n * sxy - sx * sy) / (m.n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - (m.n * sxy - sx * sy) / (m.n * sxx - sx * sx) * sx) / m.n, 6)
             AS zipf_intercept,
           ROUND(POWER(m.n * sxy - sx * sy, 2)
                 / ((m.n * sxx - sx * sx) * (m.n * syy - sy * sy)), 6) AS r2
    FROM m, tot, voc
    """,
    description=f"Zipf's-law fit over the corpus frequency spectrum: one tokenize + one (token)-keyed count, rank by (count DESC, token), OLS of (ln rank, ln count) over the top-{_ZIPF_R} head — slope = Zipf exponent, with r^2 and corpus totals; everything after the count is vocabulary-bounded",
)
def a0005_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    w = load_table(spark, sf_dir, "documents").select(
        F.explode(X.tokens("text")).alias("w")
    )
    cnt = w.groupBy("w").agg((F.count("*") * 1.0).alias("c")).localCheckpoint(
        eager=False
    )  # vocab-bounded; feeds vocab count + ranked fit
    n_tokens = int(cnt.agg(F.sum("c")).collect()[0][0])
    vocab = cnt.count()
    rk = cnt.select(
        "c", F.row_number().over(Window.orderBy(F.desc("c"), "w")).alias("r")
    )
    pts = rk.filter(F.col("r") <= _ZIPF_R).select(
        F.log(F.col("r") * 1.0).alias("x"), F.log("c").alias("y")
    )
    m = pts.agg(
        (F.count("*") * 1.0).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.lit(n_tokens).cast("long").alias("n_tokens"),
        F.lit(vocab).cast("long").alias("vocab_size"),
        F.col("n").cast("long").alias("n_fit"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "zipf_intercept"
        ),
        F.round(
            F.pow(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"), 2)
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# a0006 — Heaps'-law vocabulary growth: V(T) ~ K * T^beta, read at ten
# corpus prefixes (docs in doc_id order). A token's contribution to the
# prefix vocabulary is its FIRST-occurrence document, so the whole
# curve comes from two aggregates — per-token MIN(doc_id) and per-doc
# token counts — bucketed into prefix deciles and cumulated over the
# 10-row decile frame; the (K, beta) fit is the same OLS-in-log-space
# as a0005 over 10 points. This is the curve that predicts tokenizer
# vocabulary budgets as a corpus scales.
# Scale rule (100 TB): the decile count is a resolution constant; both
# aggregates are one-pass and everything after is 10 rows.
# ---------------------------------------------------------------------------


@query(
    "a0006_heaps_law",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    nn AS (SELECT COUNT(*) * 1.0 AS nd FROM d),
    dl AS (SELECT CAST(FLOOR(doc_id * 10.0 / nn.nd) AS BIGINT) AS dec,
                  len(tk) AS dlen
           FROM d, nn),
    tokd AS (SELECT CAST(SUM(dlen) AS BIGINT) AS toks FROM dl GROUP BY dec
             ORDER BY dec),
    t_by AS (SELECT dec, CAST(SUM(dlen) AS BIGINT) AS toks
             FROM dl GROUP BY dec),
    fo AS (SELECT w, MIN(doc_id) AS fdoc
           FROM (SELECT doc_id, unnest(tk) AS w FROM d) GROUP BY w),
    v_by AS (SELECT CAST(FLOOR(fdoc * 10.0 / nn.nd) AS BIGINT) AS dec,
                    CAST(COUNT(*) AS BIGINT) AS vnew
             FROM fo, nn GROUP BY 1),
    decs AS (SELECT unnest(generate_series(0, 9)) AS dec),
    cum AS (
      SELECT decs.dec,
             SUM(COALESCE(t_by.toks, 0)) OVER (ORDER BY decs.dec) AS tokens_prefix,
             SUM(COALESCE(v_by.vnew, 0)) OVER (ORDER BY decs.dec) AS vocab_prefix
      FROM decs LEFT JOIN t_by ON t_by.dec = decs.dec
                LEFT JOIN v_by ON v_by.dec = decs.dec),
    m AS (SELECT COUNT(*) * 1.0 AS n,
                 SUM(ln(tokens_prefix * 1.0)) AS sx, SUM(ln(vocab_prefix * 1.0)) AS sy,
                 SUM(ln(tokens_prefix * 1.0) * ln(tokens_prefix * 1.0)) AS sxx,
                 SUM(ln(tokens_prefix * 1.0) * ln(vocab_prefix * 1.0)) AS sxy
          FROM cum)
    SELECT cum.dec AS decile,
           CAST(cum.tokens_prefix AS BIGINT) AS tokens_prefix,
           CAST(cum.vocab_prefix AS BIGINT) AS vocab_prefix,
           ROUND((m.n * sxy - sx * sy) / (m.n * sxx - sx * sx), 6) AS heaps_beta,
           ROUND(exp((sy - (m.n * sxy - sx * sy) / (m.n * sxx - sx * sx) * sx) / m.n), 6)
             AS heaps_k
    FROM cum, m ORDER BY decile
    """,
    description="Heaps'-law vocabulary growth V(T) ~ K*T^beta at ten doc-order corpus prefixes: per-token MIN(doc_id) (first occurrence) + per-doc token counts, bucketed to prefix deciles and cumulated over the 10-row frame; (K, beta) by OLS in log space over the 10 points — the tokenizer-vocabulary budget curve",
)
def a0006_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as X

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", X.tokens("text").alias("tk")
    )
    nd = float(d.count())
    dl = d.select(
        F.floor(F.col("doc_id") * 10.0 / nd).cast("long").alias("dec"),
        F.size("tk").alias("dlen"),
    )
    t_by = dl.groupBy("dec").agg(F.sum("dlen").cast("long").alias("toks"))
    fo = (
        d.select("doc_id", F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("fdoc"))
    )
    v_by = fo.groupBy(
        F.floor(F.col("fdoc") * 10.0 / nd).cast("long").alias("dec")
    ).agg(F.count("*").cast("long").alias("vnew"))
    decs = spark.range(10).select(F.col("id").cast("long").alias("dec"))
    wcum = Window.orderBy("dec")
    cum = (
        decs.join(t_by, "dec", "left")
        .join(v_by, "dec", "left")
        .select(
            "dec",
            F.sum(F.coalesce(F.col("toks"), F.lit(0))).over(wcum).alias("tokens_prefix"),
            F.sum(F.coalesce(F.col("vnew"), F.lit(0))).over(wcum).alias("vocab_prefix"),
        )
        .localCheckpoint(eager=False)  # 10 rows; fit + output reuse it
    )
    lx = F.log(F.col("tokens_prefix") * 1.0)
    ly = F.log(F.col("vocab_prefix") * 1.0)
    m = cum.agg(
        (F.count("*") * 1.0).alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(lx * ly).alias("sxy"),
    )
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        cum.crossJoin(F.broadcast(m))
        .select(
            F.col("dec").alias("decile"),
            F.col("tokens_prefix").cast("long").alias("tokens_prefix"),
            F.col("vocab_prefix").cast("long").alias("vocab_prefix"),
            F.round(beta, 6).alias("heaps_beta"),
            F.round(F.exp((F.col("sy") - beta * F.col("sx")) / F.col("n")), 6).alias(
                "heaps_k"
            ),
        )
        .orderBy("decile")
    )
