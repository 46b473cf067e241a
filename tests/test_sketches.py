"""Mergeable-HLL invariants (operators/sketches.py) at a cardinality
high enough to leave the sketch's exact sparse mode (~15k distinct
orderkeys at sf0.01), where merge-losslessness is a real claim rather
than trivial exactness."""

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.sources.tables import load_table


def test_partitioned_union_matches_monolithic_dense(spark, sf_dir):
    """Dense regime (~15k keys): the union's HLL_8 target makes merged
    and monolithic estimates drift slightly (they are NOT bit-equal —
    measured 14908 vs 14892 at sf0.01); both must agree well inside
    the estimator's own ~1.6% error."""
    li = load_table(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_linenumber").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0]["e"]
    mono = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("e")
    ).collect()[0]["e"]
    assert merged != mono  # the honest part: union is not bit-lossless
    assert abs(merged - mono) <= 0.005 * mono


def test_sparse_mode_union_is_bit_exact(spark, sf_dir):
    """Below the sparse→dense promotion (150 users) the union IS
    bit-exact — the regime the daily rollup's per-day sketches live in."""
    ev = load_table(spark, sf_dir, "events")
    per_day = ev.groupBy(F.date_trunc("day", "ts")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_day.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0]["e"]
    mono = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    assert merged == mono


def test_estimate_within_documented_error(spark, sf_dir):
    """Default lgConfigK=12 → ~1.6% standard error; 5% is the hard
    bound we document for the rollup's est_ok contract."""
    li = load_table(spark, sf_dir, "lineitem")
    est = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("e")
    ).collect()[0]["e"]
    exact = li.select("l_orderkey").distinct().count()
    assert abs(est - exact) <= 0.05 * exact, (est, exact)


def test_sketch_survives_parquet_roundtrip(spark, tmp_path):
    """The store pattern depends on the binary sketch column writing
    to parquet and merging after read-back."""
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("k")
    )
    sk = df.groupBy("g").agg(F.hll_sketch_agg("k").alias("sk"))
    path = str(tmp_path / "sketches")
    sk.write.parquet(path)
    back = spark.read.parquet(path)
    merged = back.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0]["e"]
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("k")).alias("e")
    ).collect()[0]["e"]
    assert merged == direct
