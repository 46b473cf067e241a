#!/usr/bin/env python
"""Bench-methodology timing for a subset of queries: same session
settings, same warmup, same min-of-2 `.count()` timing as bench.py —
for A/B-ing optimizations without paying the full 114-query wall.

Usage:
  python tools/minibench.py NAME [NAME ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interop_datalake_spark import catalog  # noqa: E402
from interop_datalake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(
        master=f"local[{CPUS}]", app_name="minibench",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.all_queries()
    queries["q1_pricing_summary"](spark, SF_DIR).count()  # warmup

    per_query: dict[str, float] = {}
    for name in names:
        if name not in queries:
            print(f"!! unknown query: {name}", file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 4)
    print(json.dumps({"queries": per_query,
                      "total": round(sum(per_query.values()), 4),
                      "loadavg_1m": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
