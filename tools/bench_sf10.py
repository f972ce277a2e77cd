"""sf10 per-round benchmark of the dedup/retrieval heavies.

Promoted from spot-check to per-round artifact in round 12 (VERDICT r11
item 5): decade-scale regressions are the class sf0.1 cannot see, so the
pinned suite re-runs each round and writes BENCH_SF10.json plus a
round-stamped BENCH_SF10_r{N}.json when --round N is given.

Runs at /tmp/spark_graft_sf10 (100x sf0.1: 60M lineitem / 500k
documents / 200k embeddings / 10M events, built by tools/make_sf.py —
duplicate groups replicated 100x, the adversarial case for every
pair-generating operator). Per query: cold wall, warm MEDIAN-OF-3
fresh-plan re-runs (single warm for q114, whose oracle-pinned fixed-k
regime is the known quadratic the a0001 twin exists to fix), and the
same-machine DuckDB oracle time under a hard alarm cap. DuckDB entries
already recorded as >cap DNF carry forward unless the query is named on
argv — re-burning the cap to reproduce a DNF string is wasted wall.
Also records the single-JVM peak RSS (VmHWM).

With sf0.1 and sf1.0 (BENCH_SF1.json) this gives three measured decades
for the 100 TB extrapolation.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

SF_DIR = "/tmp/spark_graft_sf10"
DUCK_CAP_S = 600
QUERIES = [
    "q41_minhash_neardup",
    "q108_incremental_dedup",
    "q114_semdedup",
    "q130_prefix_filter_simjoin",
    "a0053_apriori_triples",
    "a0001_semdedup_autok",
    # round-13 rotation (VERDICT r12 item 6): the grid-bounded CC claim
    # at the decade + the reshaped MF step + the incremental twin
    "a0002_density_level_hierarchy",
    "a0083_mf_gradient_step",
    "a0003_semdedup_incremental",
    # round-14 rotation (VERDICT r13 item 8): a0004/a0019 rotate IN for
    # their first decade rows; a0103/a0054 rotate OUT (inversions
    # re-confirmed in r12 AND r13 — stable). a0013 (2-iteration re-
    # measure) and a0085 (first decade row) run as spot-merges into
    # BENCH_SF10.json the same session.
    "a0004_knn_classify",
    "a0019_ngram_self_overlap",
    # round-15 rotation (VERDICT r14 item 4): a0085's first decade row —
    # the remaining `weak` entry without an sf10 measurement.
    "a0085_tfidf_keywords",
]
# q114's oracle-pinned fixed-k regime is quadratic per decade (the a0001
# twin carries the production rule): one warm rep, not three
SINGLE_WARM = {"q114_semdedup"}


def jvm_peak_rss_gib(spark) -> float:
    pid = spark._jvm.java.lang.ProcessHandle.current().pid()
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return round(int(line.split()[1]) / 1024 / 1024, 2)
    return -1.0


class _Alarm(Exception):
    pass


def duck_time(sql: str) -> float | str:
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    def _raise(signum, frame):
        raise _Alarm

    signal.signal(signal.SIGALRM, _raise)
    signal.alarm(DUCK_CAP_S)
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        dt = round(time.time() - t0, 1)
    except _Alarm:
        dt = f">{DUCK_CAP_S} (did not finish)"
    except Exception as e:  # noqa: BLE001
        # the alarm can surface as DuckDB's own "query interrupted"
        # RuntimeError instead of our exception — classify by elapsed
        if time.time() - t0 >= DUCK_CAP_S - 5:
            dt = f">{DUCK_CAP_S} (did not finish)"
        else:
            dt = f"error: {type(e).__name__}"
    finally:
        signal.alarm(0)
        try:
            con.interrupt()
        except Exception:
            pass
        try:
            con.close()
        except Exception:
            pass
    return dt


def main() -> None:
    # optional argv names: re-measure just those and merge into the
    # existing BENCH_SF10.json (after reshaping one query the whole
    # suite need not re-run). --round N also writes BENCH_SF10_r{N}.json.
    args = sys.argv[1:]
    round_no = None
    if "--round" in args:
        i = args.index("--round")
        round_no = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    only = set(args)
    spark = get_spark("bench_sf10")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out = {
        "note": (
            "sf10 spot-check (100x sf0.1 replica: 60M lineitem / 500k docs / "
            "200k embeddings / 10M events; duplicate groups replicated 100x). "
            "Spark cold + warm median-of-3 fresh-plan re-runs per query on "
            "local[32] (single warm for q114's known fixed-k quadratic); "
            f"DuckDB runs the registered oracle SQL, {DUCK_CAP_S}s alarm cap, "
            "fresh in-process connection per query. peak_rss_gib = the single "
            "local-mode JVM's VmHWM after all Spark runs (driver+executors in "
            "one process here)."
        ),
        "spark_cold_sec": {},
        "spark_warm_sec": {},
        "duckdb_sec": {},
        "errors": {},
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior = {}
    try:
        with open(os.path.join(root, "BENCH_SF10.json")) as f:
            prior = json.load(f)
    except FileNotFoundError:
        pass
    if only:
        out = prior or out
        out.setdefault("errors", {})
    elif prior.get("scale_reading"):
        # keep the per-query scale commentary across full refreshes
        # (updated by hand when a query's story changes)
        out["scale_reading"] = prior["scale_reading"]
    out.setdefault("rows", {})
    out.setdefault("warm_reps_sec", {})
    for name in [n for n in QUERIES if not only or n in only]:
        try:
            t0 = time.time()
            n = qs[name].fn(spark, SF_DIR).count()
            cold = round(time.time() - t0, 1)
            reps = []
            for _ in range(1 if name in SINGLE_WARM else 3):
                t0 = time.time()
                qs[name].fn(spark, SF_DIR).count()
                reps.append(round(time.time() - t0, 1))
            warm = sorted(reps)[len(reps) // 2]
            out["spark_cold_sec"][name] = cold
            out["spark_warm_sec"][name] = warm
            out["warm_reps_sec"][name] = reps
            out["rows"][name] = n
            out["errors"].pop(name, None)
            print(f"{name}: cold {cold}s warm_med {warm}s reps {reps} rows {n}", flush=True)
        except Exception as e:  # noqa: BLE001
            out["errors"][name] = f"{type(e).__name__}: {e}"[:300]
            print(f"{name}: ERROR {e}", flush=True)
    out["peak_rss_gib"] = max(out.get("peak_rss_gib", 0.0), jvm_peak_rss_gib(spark))
    out["n_errors"] = len(out["errors"])
    spark.stop()
    for name in [n for n in QUERIES if not only or n in only]:
        if name in out["errors"]:
            continue
        have = out["duckdb_sec"].get(name, prior.get("duckdb_sec", {}).get(name))
        if isinstance(have, str) and name not in only:
            # carry forward ONLY recorded cap-DNF strings — re-burning the
            # cap to reproduce a DNF is wasted wall. NUMERIC prior timings
            # are re-measured on every full refresh so the DuckDB
            # denominators never go stale across data/oracle changes
            # (ADVICE r12: the old branch also reused numeric entries).
            out["duckdb_sec"][name] = have
            continue
        out["duckdb_sec"][name] = duck_time(qs[name].oracle)
        print(f"{name}: duckdb {out['duckdb_sec'][name]}", flush=True)
    with open(os.path.join(root, "BENCH_SF10.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_SF10.json", flush=True)
    if round_no is not None:
        with open(os.path.join(root, f"BENCH_SF10_r{round_no:02d}.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote BENCH_SF10_r{round_no:02d}.json", flush=True)


if __name__ == "__main__":
    main()
