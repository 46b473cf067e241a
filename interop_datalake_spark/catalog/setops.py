"""Set-operation catalog — union / intersect / except (+ _all variants).

All set ops here run on projected key columns only (never whole rows of
wide tables), so the dedup shuffle that INTERSECT/EXCEPT implies moves
minimal bytes at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from interop_datalake_spark.functions.money import money, money_sum
from interop_datalake_spark.sources.tables import load_table


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two heterogeneous activity feeds (orders + events
    projected to a common (entity_id, kind, amount) schema) — the lake's
    mixed-resource-batch analog (DatalakePublishService.kt:45-46)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("entity_id"),
        F.lit("order").alias("kind"),
        F.round("o_totalprice", 2).alias("amount"),
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity_id"),
        F.lit("event").alias("kind"),
        F.round("value", 2).alias("amount"),
    )
    return (
        orders.unionByName(events)
        .groupBy("kind")
        .agg(F.count("*").alias("cnt"), money_sum(money("amount")).alias("total"))
        .orderBy("kind")
    )


SET_UNION_ORACLE = """
SELECT kind, count(*) AS cnt,
       round(sum(amount::DECIMAL(12,2)), 2)::DOUBLE AS total
FROM (
  SELECT o_custkey AS entity_id, 'order' AS kind, round(o_totalprice, 2) AS amount FROM orders
  UNION ALL
  SELECT user_id, 'event', round(value, 2) FROM events
) GROUP BY kind ORDER BY kind
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in BOTH segments of behavior: placed an 'F'
    order and an 'O' order."""
    orders = load_table(spark, sf_dir, "orders")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f_cust.intersect(o_cust).orderBy("custkey")


SET_INTERSECT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY custkey
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with 'F' orders but no 'O' orders."""
    orders = load_table(spark, sf_dir, "orders")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f_cust.subtract(o_cust).orderBy("custkey")  # EXCEPT (distinct)


SET_EXCEPT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY custkey
"""


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersectAll keeps multiplicity — pair counts matter."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_orderkey").alias("orderkey")
    )
    b = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("orderkey")
    )
    return (
        a.intersectAll(b)
        .groupBy("orderkey")
        .agg(F.count("*").alias("multiplicity"))
        .orderBy("orderkey")
    )


SET_INTERSECT_ALL_ORACLE = """
SELECT orderkey, count(*) AS multiplicity FROM (
  SELECT l_orderkey AS orderkey FROM lineitem WHERE l_returnflag = 'A'
  INTERSECT ALL
  SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
) GROUP BY orderkey ORDER BY orderkey
"""


QUERIES = {
    "set_union_all": set_union_all,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "set_intersect_all": set_intersect_all,
}

ORACLES = {
    "set_union_all": SET_UNION_ORACLE,
    "set_intersect": SET_INTERSECT_ORACLE,
    "set_except": SET_EXCEPT_ORACLE,
    "set_intersect_all": SET_INTERSECT_ALL_ORACLE,
}
