"""Scale levers: bucketed co-located joins (no Exchange) and salted
joins for extreme key skew (correctness + distribution)."""

from pyspark.sql import functions as F

from interop_datalake_spark.operators.skew import salted_join, write_bucketed
from interop_datalake_spark.plans.inspect import explain_str
from interop_datalake_spark.sources.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").limit(5000)
    li = load_table(spark, sf_dir, "lineitem").limit(20000)
    write_bucketed(orders, "b_orders", "o_orderkey", 8, str(tmp_path / "bo"))
    write_bucketed(li, "b_lineitem", "l_orderkey", 8, str(tmp_path / "bl"))
    # force a non-broadcast join so the bucketed layout is what decides
    # the shuffle (at real scale neither fact side broadcasts anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        # sanity: result matches the unbucketed join
        plain = orders.join(li, orders.o_orderkey == li.l_orderkey)
        assert joined.count() == plain.count()
        # the whole point: no shuffle on either side of the join
        plan = explain_str(joined, mode="simple")
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 0, f"bucketed join still shuffles:\n{plan}"
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_correct_and_spread(spark):
    # extreme skew: 90% of left rows share one key
    left = spark.range(10000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    expected = left.join(right, "k").agg(
        F.count("*").alias("n"), F.sum("rv").alias("s")
    ).first()
    got = salted_join(left, right, "k", n_salts=8).agg(
        F.count("*").alias("n"), F.sum("rv").alias("s")
    ).first()
    assert (got["n"], got["s"]) == (expected["n"], expected["s"])

    # the hot key's rows actually spread across salts
    salted = left.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), 8)
    )
    spread = (
        salted.filter(F.col("k") == 7).groupBy("_salt").count().count()
    )
    assert spread >= 6, "hot key should hit most salt buckets"
