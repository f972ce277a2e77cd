"""Iterative graph-numeric declared queries.

Connected components (q88) covers label-propagation fixpoints; this module
adds the POWER-ITERATION class: PageRank over the event-type transition
graph. The Spark side builds the edge/transition frames relationally and
unrolls a fixed 3 iterations into one declarative plan (each iteration is
an edge-join + per-node aggregate — the exact shape GraphX's Pregel runs,
but optimizer-visible); the oracle unrolls the same three iterations as
chained CTEs, so the hash pins the damping arithmetic itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

_DAMP = 0.85
_ITERS = 3


def _pr_iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank iteration: every node gets the teleport term;
    in-edge contributions via a left join (no-inbound nodes keep teleport)."""
    return f"""
    {out} AS (
      SELECT nodes.node,
             0.15 / (SELECT n FROM n) + {_DAMP} * COALESCE(SUM({prev}.r * p.p), 0) AS r
      FROM nodes
      LEFT JOIN p ON p.dst = nodes.node
      LEFT JOIN {prev} ON {prev}.node = p.src
      GROUP BY nodes.node)"""


@query(
    "q102_pagerank_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_et
      FROM events),
    e AS (SELECT event_type AS src, next_et AS dst, COUNT(*) AS w
          FROM seq WHERE next_et IS NOT NULL GROUP BY src, dst),
    p AS (SELECT src, dst, w * 1.0 / SUM(w) OVER (PARTITION BY src) AS p FROM e),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    n AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM n) AS r FROM nodes),
    {_pr_iter_sql("r0", "r1")},
    {_pr_iter_sql("r1", "r2")},
    {_pr_iter_sql("r2", "r3")}
    SELECT node, ROUND(r, 6) AS pagerank FROM r3 ORDER BY node
    """,
    description="PageRank power iteration (damping 0.85, 3 unrolled iterations) over the event-type transition graph built from per-user event sequences — the iterative-numeric fixpoint class in DataFrame form: each iteration is one edge join + per-node aggregate, the whole unrolled recursion is a single declarative plan Catalyst sees end-to-end",
)
def q102_pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    seq = events.select(
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_et"),
    )
    # The aggregated edge list is referenced by every unrolled iteration,
    # but no cache is needed: the iteration subtrees are identical, so
    # Spark's ReusedExchange computes the events scan + per-user window
    # once and shares it (visible in .explain as ReusedExchange nodes).
    e = (
        seq.filter(F.col("next_et").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_et").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    p = e.select(
        "src", "dst", (F.col("w") / F.sum("w").over(W.partitionBy("src"))).alias("p")
    )
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct()
    n_nodes = nodes.count()  # scalar: node-type cardinality, not data volume
    r = nodes.withColumn("r", F.lit(1.0 / n_nodes))
    for _ in range(_ITERS):
        contrib = (
            p.join(r.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") * F.col("p")).alias("_in"))
        )
        r = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(0.15 / n_nodes) + _DAMP * F.coalesce("_in", F.lit(0.0))).alias("r"),
        )
    return r.select("node", F.round("r", 6).alias("pagerank")).orderBy("node")
