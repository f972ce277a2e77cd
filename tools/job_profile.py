"""Per-query job/stage/shuffle profile — the r14 optimization instrument.

For each named query (default: bench HEADLINE), runs it once to warm the
session, then once inside a dedicated job group and reads the Spark UI
REST API (/api/v1) for every job/stage that ran in that group:

    n_jobs          distinct Spark jobs (actions + eager materializations)
    n_stages        completed stages across those jobs
    n_tasks         sum of task counts
    shuffle_read    bytes fetched across all stages
    shuffle_write   bytes written across all stages
    input_bytes     bytes read from storage
    wall            wall-clock of the profiled run

The job/stage count IS the sf0.1 floor (each job costs ~0.1-0.3 s of
scheduling + barrier latency on local[32], and each is a cluster-wide
barrier at 100 TB), so this table ranks where removing an action or an
exchange buys real wall. Writes tools/JOB_PROFILE.json.

Usage: python tools/job_profile.py [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from advanced_data_mining_and_big_data_analysis_spark import get_spark
from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = all_queries()
    if len(sys.argv) > 1:
        names = sys.argv[1:]
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in qs]
    # the session factory disables the UI (bench hygiene); the profiler
    # needs the /api/v1 REST surface, so re-enable it for this tool only
    spark = get_spark("job_profile", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # session warmup (same as bench)
    qs[names[0]].fn(spark, sf_dir).collect()

    out: dict[str, dict] = {}
    for name in names:
        # warm pass (plan/codegen hot)
        qs[name].fn(spark, sf_dir).collect()
        group = f"profile_{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = qs[name].fn(spark, sf_dir)
        t_build = time.time() - t0  # plan construction (py4j + any driver
        # actions the fn itself runs: codebook collects, scalar aggs)
        df.collect()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        try:
            jobs = [j for j in _api(base, "/jobs") if j.get("jobGroup") == group]
            stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
            stages = []
            for sid in stage_ids:
                try:
                    for att in _api(base, f"/stages/{sid}"):
                        stages.append(att)
                except Exception:
                    pass
            prof = {
                "wall": round(wall, 3),
                "build": round(t_build, 3),
                "n_jobs": len(jobs),
                "n_stages": sum(1 for s in stages if s.get("status") == "COMPLETE"),
                "n_skipped_stages": sum(
                    1 for j in jobs for _ in range(j.get("numSkippedStages", 0))
                ),
                "n_tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
                "shuffle_read_mb": round(
                    sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 2
                ),
                "shuffle_write_mb": round(
                    sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 2
                ),
                "input_mb": round(sum(s.get("inputBytes", 0) for s in stages) / 1e6, 2),
            }
        except Exception as e:  # UI API unavailable — record wall only
            prof = {
                "wall": round(wall, 3),
                "build": round(t_build, 3),
                "err": f"{type(e).__name__}: {e}"[:120],
            }
        out[name] = prof
        print(
            f"{name:38s} wall={prof['wall']:7.3f} build={prof['build']:6.3f} "
            f"jobs={prof.get('n_jobs', '?'):>3} "
            f"stages={prof.get('n_stages', '?'):>3} tasks={prof.get('n_tasks', '?'):>5} "
            f"shW={prof.get('shuffle_write_mb', '?'):>8} in={prof.get('input_mb', '?'):>8}",
            flush=True,
        )
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "JOB_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
