"""Accuracy bounds for sketch-based aggregates (no SQL oracle possible)
and pandas-surface unit checks."""

from pyspark.sql import functions as F

from interop_datalake_spark.catalog.advanced import agg_approx_distinct
from interop_datalake_spark.sources.tables import load_table


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """HLL default rsd=0.05 — assert within 10% of exact (2x headroom)."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["p"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("p"),
            F.countDistinct("l_suppkey").alias("s"),
        )
        .collect()
    }
    approx = {
        r["l_returnflag"]: (r["approx_parts"], r["approx_supps"])
        for r in agg_approx_distinct(spark, sf_dir).collect()
    }
    for flag, (ep, es) in exact.items():
        ap, asym = approx[flag]
        assert abs(ap - ep) / ep < 0.10, f"{flag}: parts {ap} vs {ep}"
        assert abs(asym - es) / es < 0.10, f"{flag}: supps {asym} vs {es}"


def test_approx_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, agg_approx_distinct(spark, sf_dir).collect()))
    b = sorted(map(tuple, agg_approx_distinct(spark, sf_dir).collect()))
    assert a == b
