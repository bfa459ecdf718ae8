#!/usr/bin/env python
"""Per-query profiling: wall (noop sink, same methodology as bench.py)
PLUS the job/stage/task counts Spark actually scheduled — the
local-mode proxy for "how many sequential barriers does this query
pay" (each AQE stage materialization is a job; each 1-row stats
broadcast is a job; at local[32] every job costs ~50-150 ms of
scheduling latency regardless of data size).

Usage: python tools/bench_profile.py [query ...]   (default: HEADLINE)
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPS

Prints one JSON line per query:
  {"q": name, "sec": best, "jobs": n, "stages": n, "tasks": n}
and a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import HEADLINE
    from kinesis_analytics_demo_spark.caching import release_tracked
    from kinesis_analytics_demo_spark.plans.registry import all_queries
    from kinesis_analytics_demo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    only = sys.argv[1:]
    spark = get_spark(app_name="kads-bench-profile")
    sc = spark.sparkContext
    specs = all_queries()

    # same warmup as bench.py
    spark.range(1).count()

    def _noop(batches):
        yield from batches

    spark.range(32).repartition(32).mapInPandas(_noop, schema="id long").count()

    names = only or HEADLINE
    out = {}
    total = 0.0
    for name in names:
        spec = specs[name]
        best = None
        jobs = stages = tasks = 0
        for rep in range(reps):
            group = f"prof-{name}-{rep}"
            sc.setJobGroup(group, name)
            tb = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            if best is None or dt < best:
                best = dt
                build = t0 - tb
            if rep == 0:
                st = sc.statusTracker()
                jids = st.getJobIdsForGroup(group)
                jobs = len(jids)
                sids = set()
                for j in jids:
                    ji = st.getJobInfo(j)
                    if ji:
                        sids.update(ji.stageIds)
                stages = len(sids)
                for s in sids:
                    si = st.getStageInfo(s)
                    if si:
                        tasks += si.numTasks
            release_tracked(blocking=True)
        rec = {"q": name, "sec": round(best, 3), "build": round(build, 3),
               "jobs": jobs, "stages": stages, "tasks": tasks}
        out[name] = rec
        total += best
        print(json.dumps(rec), flush=True)
    print(json.dumps({"total_sec": round(total, 3), "n": len(names),
                      "sf_dir": sf_dir, "reps": reps}))


if __name__ == "__main__":
    main()
