"""Event-stream queries: sessionization, sliding windows, dedup, late data.

These are the BATCH twins of streaming/windows.py — identical window
semantics expressed over the static ``events`` table so the DuckDB oracle
can check them (SURVEY §2.11: the driver's events table is the stream
surface; tests/test_streaming.py runs the same ops as real streams and
asserts stream == batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap (oracle-side epoch form)


def _gap_exceeded(cur, prev):
    """``cur - prev > 30 minutes`` via interval arithmetic.

    Interval subtraction works for both TIMESTAMP and TIMESTAMP_NTZ inputs
    (the driver's parquet writes plain ``timestamp[us]``, which Spark >= 3.4
    infers as NTZ — ``unix_micros`` rejects that type), and is
    timezone-free, matching DuckDB's naive-epoch oracle exactly.
    """
    return (cur - prev) > F.expr("INTERVAL 30 MINUTES")


@query(
    "a060_sessionization",
    oracle=f"""
    WITH l AS (
      SELECT user_id, event_id, ts, value,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events WHERE user_id <= 30),
    m AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > {_GAP_US}
                  THEN 1 ELSE 0 END AS is_new,
             event_id
      FROM l),
    s AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM m)
    SELECT user_id, session_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
    description="gap-based sessionization (lag + running sum) — batch twin of session_window (SURVEY §2.11)",
)
def a060_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(prev.isNull() | _gap_exceeded(F.col("ts"), prev), 1).otherwise(0)
    with_sid = ev.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("long"),
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "a061_sliding_windows",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTES, value FROM events)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
    FROM b GROUP BY ws ORDER BY window_start
    """,
    description="sliding event-time windows (1h window / 30m slide) — F.window on batch, epoch-aligned pane expansion in SQL (SURVEY §2.11)",
)
def a061_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


@query(
    "a062_first_event_dedup",
    oracle="""
    WITH r AS (
      SELECT event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT event_type, COUNT(*) AS n_first_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS earliest
    FROM r WHERE rn = 1 GROUP BY event_type ORDER BY event_type
    """,
    description="keep-first dedup on (user, event_type) — batch twin of dropDuplicatesWithinWatermark (SURVEY §2.11)",
)
def a062_first_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_first_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("earliest"),
        )
        .orderBy("event_type")
    )


@query(
    "a063_late_events",
    oracle="""
    WITH r AS (
      SELECT event_type, ts,
             MAX(ts) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS high_water
      FROM events)
    SELECT event_type,
           CAST(SUM(CASE WHEN epoch_us(ts) < epoch_us(high_water) - 600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           COUNT(*) AS n_events
    FROM r GROUP BY event_type ORDER BY event_type
    """,
    description="late-data accounting: events >10min behind the running event-time high-watermark (arrival order = event_id). Batch model of watermark drop semantics via a chunked two-pass prefix max — every window is partitioned, no single-task global scan (SURVEY §2.11)",
)
def a063_late_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running max(ts) in event_id order WITHOUT a partition-less
    window: the classic distributed prefix-scan.

    1. chunk = event_id div CHUNK (arrival order is event_id, so chunks
       are contiguous arrival ranges);
    2. running max WITHIN each chunk (window partitioned by chunk —
       parallel, bounded state);
    3. per-chunk max -> tiny boundary frame (#chunks rows), prefix max
       over *previous* chunks there (unpartitioned window, but over the
       aggregated boundary rows only — #events/CHUNK, never the data);
    4. broadcast the carry-in back; high_water = greatest(local, carry).

    At 100 TB you size CHUNK so the boundary frame stays in the millions
    of rows (e.g. 1<<20); the data-side scan stays fully parallel either
    way. The oracle keeps the plain global-order SQL form.
    """
    chunk_rows = 8192  # arrival-range chunk; raise at scale (see docstring)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "_chunk", F.floor(F.col("event_id") / chunk_rows)
    )
    wc = W.partitionBy("_chunk").orderBy("event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    local_hw = F.max("ts").over(wc)
    boundary = ev.groupBy("_chunk").agg(F.max("ts").alias("_chunk_max"))
    w_prev = W.orderBy("_chunk").rowsBetween(W.unboundedPreceding, -1)
    carry = boundary.select(
        "_chunk", F.max("_chunk_max").over(w_prev).alias("_carry_hw")
    )
    high_water = F.greatest(F.col("_local_hw"), F.col("_carry_hw"))  # greatest skips nulls
    late = F.col("ts") < high_water - F.expr("INTERVAL 10 MINUTES")
    return (
        ev.withColumn("_local_hw", local_hw)
        .join(F.broadcast(carry), "_chunk")
        .withColumn("late", late)
        .groupBy("event_type")
        .agg(F.sum(F.col("late").cast("long")).alias("n_late"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


@query(
    "q104_session_funnel",
    oracle=f"""
    WITH l AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    m AS (
      SELECT user_id, ts, event_type, event_id,
             CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > {_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM l),
    s AS (
      SELECT user_id, ts, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM m),
    g AS (
      SELECT user_id, sess,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MAX(CASE WHEN event_type = 'click' THEN ts END) AS last_click
      FROM s GROUP BY user_id, sess)
    SELECT user_id % 10 AS cohort, COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_view,
           CAST(SUM(CASE WHEN last_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_click,
           CAST(SUM(CASE WHEN first_view IS NOT NULL AND last_click IS NOT NULL
                          AND first_view <= last_click THEN 1 ELSE 0 END) AS BIGINT) AS n_funnel
    FROM g GROUP BY cohort ORDER BY cohort
    """,
    description="sessionized funnel analysis: gap-sessions (q60's rule) x ordered-event conversion — a session converts when a 'view' precedes (or ties) a 'click' inside it, tested as min(view ts) <= max(click ts); per-cohort session/conversion counts (composition of sessionization + conditional aggregation)",
)
def q104_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(prev.isNull() | _gap_exceeded(F.col("ts"), prev), 1).otherwise(0)
    with_sid = ev.withColumn(
        "sess", F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    g = with_sid.groupBy("user_id", "sess").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).alias("last_click"),
    )
    return (
        g.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.col("first_view").isNotNull().cast("long")).alias("n_with_view"),
            F.sum(F.col("last_click").isNotNull().cast("long")).alias("n_with_click"),
            F.sum(
                (
                    F.col("first_view").isNotNull()
                    & F.col("last_click").isNotNull()
                    & (F.col("first_view") <= F.col("last_click"))
                ).cast("long")
            ).alias("n_funnel"),
        )
        .orderBy("cohort")
    )


# ---------------------------------------------------------------------------
# q157 — session path mining: the clickstream-path analysis q60/q127
# stop short of. Sessions (same 30-minute gap rule as q60) are reduced
# to their first-3-event-type PATH STRING (the canonical entry-path
# signature), then paths are ranked by frequency. Per-session state is
# an ordered fold of that session's own rows (array_sort + slice —
# bounded by the session, never the user history), the path table is
# path-cardinality-sized, and the top-k is a bounded TakeOrdered.
# ---------------------------------------------------------------------------


@query(
    "a0157_session_paths",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM e),
    p AS (
      SELECT user_id, sid,
             array_to_string(list_slice(list(event_type ORDER BY ts, event_id), 1, 3),
                             ' > ') AS path,
             COUNT(*) AS n_events
      FROM s GROUP BY user_id, sid)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(AVG(n_events), 6) AS avg_session_events
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 15
    """,
    description="session path mining (clickstream entry-path analysis): sessions via the q60 30-minute gap rule, each reduced to its first-3-event-type path string by an ordered fold over the session's OWN rows (array_sort(collect_list(struct)) + slice — state bounded by the session, never the user history), paths ranked by frequency with average session length — top-15 via bounded TakeOrdered; the path table is path-cardinality-sized after a map-side-combined aggregate",
)
def a0157_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(prev.isNull() | _gap_exceeded(F.col("ts"), prev), 1).otherwise(0)
    s = ev.withColumn(
        "sid",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("long"),
    )
    per = s.groupBy("user_id", "sid").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))).alias("a"),
        F.count("*").alias("n_events"),
    )
    path = F.array_join(
        F.slice(F.transform(F.col("a"), lambda x: x["event_type"]), 1, 3), " > "
    )
    return (
        per.select(path.alias("path"), "n_events")
        .groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.round(F.avg("n_events"), 6).alias("avg_session_events"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(15)
    )
