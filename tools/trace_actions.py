#!/usr/bin/env python
"""Attribute every Spark action a query issues to its repo call site.

The lifecycle witnesses spend their wall in dozens of small Spark jobs;
``profile_query.py`` counts them, this tool says WHERE they come from.
It monkeypatches the DataFrame action entry points, runs each action in
its own job group, and aggregates wall time + job count per call site
(innermost repo frame).

Usage:
  python tools/trace_actions.py NAME [NAME ...]
  python tools/trace_actions.py --top 40 NAME
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter  # noqa: E402

from interop_datalake_spark import catalog  # noqa: E402
from interop_datalake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_records: list[tuple[str, str, float, int]] = []  # (site, action, wall, jobs)
_seq = [0]
_sc = [None]


def _site() -> str:
    """Innermost stack frame inside the repo (excluding this tool)."""
    best = "<outside>"
    for fr in traceback.extract_stack():
        fn = fr.filename
        if fn.startswith(REPO) and "trace_actions" not in fn and "/tools/" not in fn:
            best = f"{os.path.relpath(fn, REPO)}:{fr.lineno}"
    return best


def _wrap(cls, name):
    orig = getattr(cls, name)

    def patched(self, *a, **kw):
        sc = _sc[0]
        _seq[0] += 1
        group = f"act{_seq[0]}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            _records.append((_site(), name, wall, jobs))

    patched.__name__ = name
    setattr(cls, name, patched)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    spark = get_spark(
        master=f"local[{CPUS}]", app_name="trace",
        shuffle_partitions=int(CPUS),
    )
    _sc[0] = spark.sparkContext
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.all_queries()
    queries["q1_pricing_summary"](spark, SF_DIR).count()  # warmup

    for name in ("count", "collect", "take", "head", "first", "toPandas",
                 "isEmpty", "tail", "foreach", "foreachPartition",
                 "localCheckpoint", "checkpoint"):
        _wrap(DataFrame, name)
    for name in ("save", "parquet", "json", "csv", "text", "saveAsTable"):
        _wrap(DataFrameWriter, name)
    for name in ("load", "parquet", "json", "csv", "text", "table"):
        _wrap(DataFrameReader, name)

    for qname in args.names:
        if qname not in queries:
            print(f"!! unknown query: {qname}")
            continue
        queries[qname](spark, SF_DIR).count()  # cold run: codegen compile
        _records.clear()
        t0 = time.perf_counter()
        n = queries[qname](spark, SF_DIR).count()
        wall = time.perf_counter() - t0
        agg: dict[tuple[str, str], list[float]] = {}
        for site, action, w, j in _records:
            cur = agg.setdefault((site, action), [0, 0.0, 0])
            cur[0] += 1
            cur[1] += w
            cur[2] += j
        print(f"\n== {qname}: wall={wall:.3f}s rows={n} "
              f"actions={len(_records)} jobs={sum(r[3] for r in _records)}")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][1])[: args.top]
        for (site, action), (cnt, w, j) in rows:
            print(f"  {w:7.3f}s calls={cnt:3d} jobs={j:3d} {action:10s} {site}")

    spark.stop()


if __name__ == "__main__":
    main()
