#!/usr/bin/env python
"""Dump .explain("formatted") for named queries into a directory —
the per-round optimization evidence (plans/r<N>/<query>_{before,after}.txt).

Usage:
  python tools/dump_query_plans.py OUTDIR SUFFIX NAME [NAME ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interop_datalake_spark import catalog  # noqa: E402
from interop_datalake_spark.plans.inspect import explain_str  # noqa: E402
from interop_datalake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.all_queries()
    for name in names:
        if name not in queries:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        df = queries[name](spark, SF_DIR)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(explain_str(df, mode="formatted"))
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
