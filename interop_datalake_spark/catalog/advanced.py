"""Advanced aggregates + subquery catalog: exact percentiles/median,
deterministic manual variance, approx-distinct (rows-only), correlated
EXISTS / NOT EXISTS, scalar subqueries, by-name unions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from interop_datalake_spark.sources.tables import load_table


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) quartiles of order value per status."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
            F.round(F.min("o_totalprice"), 2).alias("p0"),
            F.round(F.max("o_totalprice"), 2).alias("p100"),
        )
        .orderBy("o_orderstatus")
    )


AGG_PERCENTILES_ORACLE = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       round(min(o_totalprice), 2)                 AS p0,
       round(max(o_totalprice), 2)                 AS p100
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.median("l_quantity").alias("median_qty"))
        .orderBy("l_returnflag")
    )


AGG_MEDIAN_ORACLE = """
SELECT l_returnflag, median(l_quantity) AS median_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_variance_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance/stddev via the sum-of-squares identity with
    pre-rounded sums — deterministic across engines (catalog float
    policy; the built-in var_pop/stddev_pop map 1:1 but their Welford
    accumulation order makes cross-engine hashing flaky).
    l_quantity is small-magnitude so round(Σx²,2) is exact-safe."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count("*")
    sx = F.round(F.sum("l_quantity"), 2)
    sxx = F.round(F.sum(F.col("l_quantity") * F.col("l_quantity")), 2)
    var = (sxx - sx * sx / n) / n
    return (
        li.groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            var.alias("var_pop_qty"),
            F.sqrt(var).alias("stddev_pop_qty"),
        )
        .orderBy("l_returnflag")
    )


AGG_VARIANCE_ORACLE = """
SELECT l_returnflag, count(*) AS n,
       (round(sum(l_quantity * l_quantity), 2)
        - round(sum(l_quantity), 2) * round(sum(l_quantity), 2) / count(*))
       / count(*)                                    AS var_pop_qty,
       sqrt((round(sum(l_quantity * l_quantity), 2)
        - round(sum(l_quantity), 2) * round(sum(l_quantity), 2) / count(*))
       / count(*))                                   AS stddev_pop_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx-distinct — intentionally NO oracle (sketch results are
    engine-specific); the driver records a rows-only check and
    tests/test_advanced.py bounds the error vs exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_count_distinct("l_suppkey").alias("approx_supps"),
        )
        .orderBy("l_returnflag")
    )


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price (uncorrelated scalar subquery)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_adv_orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM _adv_orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM _adv_orders)
        ORDER BY o_orderkey
        """
    )


SUBQUERY_SCALAR_ORACLE = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
ORDER BY o_orderkey
"""


def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: customers holding at least one high-value
    urgent order (decorrelates to a semi join — SURVEY §4)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_adv_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_adv_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM _adv_customer c
        WHERE EXISTS (
          SELECT 1 FROM _adv_orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_totalprice > 300000 AND o.o_orderpriority = '1-URGENT'
        )
        ORDER BY c_custkey
        """
    )


SUBQUERY_EXISTS_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_totalprice > 300000 AND o.o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
"""


def subquery_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS (anti-join decorrelation): parts never
    shipped with a discount above 8%."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_adv_lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("_adv_part")
    return spark.sql(
        """
        SELECT p_partkey, p_brand
        FROM _adv_part p
        WHERE NOT EXISTS (
          SELECT 1 FROM _adv_lineitem l
          WHERE l.l_partkey = p.p_partkey AND l.l_discount > 0.08
        )
        ORDER BY p_partkey
        """
    )


SUBQUERY_NOT_EXISTS_ORACLE = """
SELECT p_partkey, p_brand
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_discount > 0.08
)
ORDER BY p_partkey
"""


def union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: frames with different column sets merged
    by name, absent columns null-filled (the lake's mixed-resource-type
    batches produce exactly this shape)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("rec_id"),
        F.lit("order").alias("kind"),
        F.round("o_totalprice", 2).alias("amount"),
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("rec_id"),
        F.lit("event").alias("kind"),
        F.col("event_type"),
    )
    merged = orders.unionByName(events, allowMissingColumns=True)
    return (
        merged.groupBy("kind")
        .agg(
            F.count("*").alias("cnt"),
            F.count("amount").alias("amount_present"),
            F.count("event_type").alias("type_present"),
        )
        .orderBy("kind")
    )


UNION_BY_NAME_ORACLE = """
SELECT kind, count(*) AS cnt, count(amount) AS amount_present,
       count(event_type) AS type_present
FROM (
  SELECT o_orderkey AS rec_id, 'order' AS kind,
         round(o_totalprice, 2) AS amount, NULL AS event_type
  FROM orders
  UNION ALL
  SELECT event_id, 'event', NULL, event_type FROM events
) GROUP BY kind ORDER BY kind
"""


QUERIES = {
    "agg_percentiles": agg_percentiles,
    "agg_median": agg_median,
    "agg_variance_manual": agg_variance_manual,
    "agg_approx_distinct": agg_approx_distinct,
    "subquery_scalar": subquery_scalar,
    "subquery_exists": subquery_exists,
    "subquery_not_exists": subquery_not_exists,
    "union_by_name_missing": union_by_name_missing,
}

ORACLES = {
    "agg_percentiles": AGG_PERCENTILES_ORACLE,
    "agg_median": AGG_MEDIAN_ORACLE,
    "agg_variance_manual": AGG_VARIANCE_ORACLE,
    # agg_approx_distinct: intentionally no oracle (sketch-dependent)
    "subquery_scalar": SUBQUERY_SCALAR_ORACLE,
    "subquery_exists": SUBQUERY_EXISTS_ORACLE,
    "subquery_not_exists": SUBQUERY_NOT_EXISTS_ORACLE,
    "union_by_name_missing": UNION_BY_NAME_ORACLE,
}
