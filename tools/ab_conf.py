#!/usr/bin/env python
"""Interleaved same-session A/B of a runtime conf toggle.

This host shows bursty hypervisor steal (multi-minute, up to ~2.7x),
so accept/reject decisions come from ALTERNATING the variants inside
one session and comparing per-variant minima — never from two separate
bench runs (round-14/15 methodology).

Usage:
  python tools/ab_conf.py KEY=VAL_A KEY=VAL_B -- NAME [NAME ...]
  (each KEY=VAL list is comma-separated; '-' = leave defaults)
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
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


def _parse(v: str) -> dict:
    if v == "-":
        return {}
    return dict(kv.split("=", 1) for kv in v.split(","))


def main() -> None:
    sep = sys.argv.index("--")
    variants = [_parse(v) for v in sys.argv[1:sep]]
    names = sys.argv[sep + 1 :]
    spark = get_spark(
        master=f"local[{CPUS}]", app_name="ab",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.all_queries()
    queries["q1_pricing_summary"](spark, SF_DIR).count()  # warmup

    defaults = {
        k: spark.conf.get(k, None) for var in variants for k in var
    }
    best: dict[tuple, float] = {}
    for rnd in range(ROUNDS):
        for vi, var in enumerate(variants):
            for k, dflt in defaults.items():
                v = var.get(k, dflt)
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            for name in names:
                queries[name](spark, SF_DIR).count()  # warm the variant
                t0 = time.perf_counter()
                queries[name](spark, SF_DIR).count()
                w = time.perf_counter() - t0
                key = (vi, name)
                best[key] = min(best.get(key, float("inf")), w)
    out = {}
    for name in names:
        row = {f"v{vi}": round(best[(vi, name)], 3) for vi in range(len(variants))}
        if len(variants) == 2 and best[(0, name)] > 0:
            row["ratio_v1_v0"] = round(best[(1, name)] / best[(0, name)], 3)
        out[name] = row
    print(json.dumps({"variants": [v or "default" for v in variants],
                      "rounds": ROUNDS, "results": out,
                      "loadavg_1m": round(os.getloadavg()[0], 2)}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
