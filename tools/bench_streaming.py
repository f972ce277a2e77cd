"""Streaming micro-bench — the timed baseline for the streaming surface.

VERDICT r14 item 8: the 17 streaming paths and the ingest loops had no
measured baseline, so optimization rounds could not touch them without
speculating. This tool runs the representative streaming operators as
REAL availableNow streams over the sf0.1 tables (events split into 4
parquet files so every run exercises multi-batch semantics; ingest
loops additionally run maxFilesPerTrigger=1 so each file is its own
micro-batch) and prints ONE JSON line shaped like bench.py's:

    {"metric": "streaming_path_wall_time", "value": total_sec,
     "unit": "sec", "queries": {path: sec, ...}, "sf": ...}

NOT wired into bench.py's headline (the driver's bench contract is
untouched); a round-stamped copy goes to BENCH_STREAMING_r{N}.json with
--round N. Sinks: noop for the window/stateful operators (computes
every row, discards — guide §1.4); the ingest loops write their real
parquet outputs into a fresh tempdir per run (the write IS the
operator). Nothing persists across runs.

Usage: python tools/bench_streaming.py [--round N] [path ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_data_mining_and_big_data_analysis_spark import get_spark, streaming as ST
from advanced_data_mining_and_big_data_analysis_spark.sources import SCHEMAS, load_table

AWAIT_S = 600


def _noop_run(stream_df, mode: str, ckpt: str) -> None:
    q = (
        stream_df.writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(AWAIT_S)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    args = sys.argv[1:]
    round_no = None
    if "--round" in args:
        i = args.index("--round")
        round_no = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    only = set(args)

    spark = get_spark("bench_streaming")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="bench_streaming_")
    ev_dir = f"{work}/events"
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(ev_dir)
    doc_dir = f"{work}/docs"
    (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(2)
        .write.mode("overwrite")
        .parquet(doc_dir)
    )
    emb_dir = f"{work}/embs"
    (
        load_table(spark, sf_dir, "embeddings")
        .repartition(2)
        .write.mode("overwrite")
        .parquet(emb_dir)
    )
    doc_schema = spark.read.parquet(doc_dir).schema
    emb_schema = spark.read.parquet(emb_dir).schema

    def ev_src(**kw):
        return ST.stream_from_directory(spark, ev_dir, SCHEMAS["events"], **kw)

    def run_noop(build, mode):
        def f(tag):
            _noop_run(build(ev_src()), mode, f"{work}/ckpt_{tag}")

        return f

    def dedup_ingest(tag):
        src = ST.stream_from_directory(
            spark, doc_dir, doc_schema, max_files_per_trigger=1
        )
        q = ST.write_dedup_ingest(
            src, f"{work}/{tag}_corpus", f"{work}/ckpt_{tag}"
        )
        q.awaitTermination(AWAIT_S)

    def semdedup_ingest(tag):
        src = ST.stream_from_directory(
            spark, emb_dir, emb_schema, max_files_per_trigger=1
        )
        q = ST.write_semdedup_ingest(
            src, f"{work}/{tag}_corpus", f"{work}/ckpt_{tag}"
        )
        q.awaitTermination(AWAIT_S)

    paths = {
        "tumbling_agg": run_noop(lambda s: ST.tumbling_agg(s), "complete"),
        "sliding_agg": run_noop(lambda s: ST.sliding_agg(s), "complete"),
        "session_agg": run_noop(lambda s: ST.session_agg(s), "complete"),
        "streaming_dedup": run_noop(
            lambda s: ST.streaming_dedup(s, ["user_id", "event_id"]), "append"
        ),
        "stateful_running_totals": run_noop(
            lambda s: ST.stateful_running_totals(s), "update"
        ),
        "streaming_cms": run_noop(lambda s: ST.streaming_cms(s, "event_type"), "update"),
        "stateful_ewma": run_noop(lambda s: ST.stateful_ewma(s), "update"),
        "stateful_ohlc": run_noop(lambda s: ST.stateful_ohlc(s), "update"),
        "drift_histogram": run_noop(
            lambda s: ST.streaming_drift_histogram(s), "complete"
        ),
        "dedup_ingest_loop": dedup_ingest,
        "semdedup_ingest_loop": semdedup_ingest,
    }
    if only:
        paths = {k: v for k, v in paths.items() if k in only}

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in paths.items():
        spark.sparkContext.setJobDescription(f"bench_streaming: {name}")
        t0 = time.time()
        try:
            fn(name)
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:300]
        spark.sparkContext.setJobDescription(None)

    shutil.rmtree(work, ignore_errors=True)
    out = {
        "metric": "streaming_path_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "n_errors": len(errors),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if round_no is not None:
        with open(os.path.join(here, f"BENCH_STREAMING_r{round_no}.json"), "w") as f:
            json.dump(out, f, indent=1)
    try:
        spark.sparkContext.setLogLevel("OFF")
        spark.stop()
    except Exception:
        pass
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
