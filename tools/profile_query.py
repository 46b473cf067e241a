#!/usr/bin/env python
"""Profile headline queries: wall time, Spark job/stage/task counts.

Lifecycle witnesses (lake_*, stream_*) spend their wall in many small
Spark jobs — commit machinery, bounded probes, refresh deltas — so the
job count is the honest profile, not a single query plan. This tool
runs each named query inside its own job group and reads the counts
back from the status tracker.

Usage:
  python tools/profile_query.py NAME [NAME ...]      # profile queries
  python tools/profile_query.py --runs 2 NAME        # min of N runs
  python tools/profile_query.py --desc NAME          # per-job description dump
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interop_datalake_spark import catalog  # noqa: E402
from interop_datalake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--desc", action="store_true",
                    help="dump per-job group/description via listener log")
    args = ap.parse_args()

    spark = get_spark(
        master=f"local[{CPUS}]", app_name="profile",
        shuffle_partitions=int(CPUS),
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    queries = catalog.all_queries()

    # warmup: flagship + tiny shuffle to absorb session/codegen init
    queries["q1_pricing_summary"](spark, SF_DIR).count()

    for name in args.names:
        if name not in queries:
            print(f"!! unknown query: {name}")
            continue
        best_wall = float("inf")
        best = None
        for run in range(args.runs):
            group = f"prof_{name}_{run}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).count()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            st = sc.statusTracker()
            job_ids = sorted(st.getJobIdsForGroup(group))
            n_stages = 0
            n_tasks = 0
            for jid in job_ids:
                info = st.getJobInfo(jid)
                if info is None:
                    continue
                for sid in info.stageIds:
                    si = st.getStageInfo(sid)
                    if si is not None and si.numActiveTasks + si.numCompletedTasks + si.numFailedTasks > 0:
                        n_stages += 1
                        n_tasks += si.numCompletedTasks
            if wall < best_wall:
                best_wall = wall
                best = (len(job_ids), n_stages, n_tasks)
        print(
            f"{name:34s} wall={best_wall:7.3f}s jobs={best[0]:4d} "
            f"stages={best[1]:4d} tasks={best[2]:5d}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
