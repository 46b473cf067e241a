"""Relational core query catalog — scans, filters, joins, aggregates.

Each entry is a named query (SURVEY.md §2.B "Relational core") with a
DuckDB oracle twin. Column aliases match exactly between the Spark
DataFrame and the oracle SQL (driver hashes values after sorting columns
by name).

Scale notes are inline per query: which side broadcasts, where the
shuffle lands, why the plan survives 100×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from interop_datalake_spark.functions.money import (
    RATE,
    money,
    money_sum,
    one_minus,
    one_plus,
)
from interop_datalake_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# q1 pricing summary — flagship. scan → filter (pushed to parquet) →
# hash agg (partial map-side + final after one shuffle on the 2 grouping
# cols) → sort of a handful of groups. At 100 TB: grouping cardinality is
# tiny (R/A/N × O/F) so the shuffle moves only partial aggregates; the
# filter prunes row groups via parquet min/max stats on l_shipdate.
# ---------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantity sums are exact (integer-valued doubles); money sums
            # go through the decimal policy (functions/money.py): cast the
            # 2-dec columns to DECIMAL, multiply/sum exactly, round in
            # decimal, emit double — order-independent in both engines.
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            money_sum(money("l_extendedprice")).alias("sum_base_price"),
            money_sum(money("l_extendedprice") * one_minus("l_discount")).alias(
                "sum_disc_price"
            ),
            money_sum(
                money("l_extendedprice")
                * one_minus("l_discount")
                * one_plus("l_tax")
            ).alias("sum_charge"),
            # avgs as deterministic-sum / count with NO outer round: the
            # division of bit-identical doubles is bit-identical; an outer
            # round would diverge on quotients whose decimal form ends in
            # ...5 (Spark rounds the decimal string, DuckDB the binary
            # double)
            (F.round(F.sum("l_quantity"), 2) / F.count("*")).alias("avg_qty"),
            (money_sum(money("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (money_sum(F.col("l_discount").cast(RATE)) / F.count("*")).alias(
                "avg_disc"
            ),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                           AS sum_qty,
       round(sum(l_extendedprice::DECIMAL(12,2)), 2)::DOUBLE               AS sum_base_price,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE             AS sum_disc_price,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount::DECIMAL(3,2))
                 * (1 + l_tax::DECIMAL(3,2))), 2)::DOUBLE                  AS sum_charge,
       round(sum(l_quantity), 2) / count(*)                                AS avg_qty,
       round(sum(l_extendedprice::DECIMAL(12,2)), 2)::DOUBLE / count(*)    AS avg_price,
       round(sum(l_discount::DECIMAL(3,2)), 2)::DOUBLE / count(*)          AS avg_disc,
       count(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3 shipping priority — customer ⋈ orders ⋈ lineitem, agg, top-10.
# customer SCALES WITH SF, so no broadcast hint: AQE picks broadcast
# when the filtered side fits and falls back to shuffle join when it
# doesn't (a forced hint would OOM executors at 100×). orders⋈lineitem
# is the big shuffle join on l_orderkey — at scale both sides would be
# bucketed on orderkey to kill that shuffle. Catalyst rewrites
# sort+limit into TakeOrderedAndProject (no global sort).
# ---------------------------------------------------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(money("l_extendedprice") * one_minus("l_discount")).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5 local supplier volume — 5-way join. region/nation broadcast
# (fixed-size dims at any SF); customer/supplier scale with SF so they
# get NO hint — AQE broadcasts them while small and shuffle-joins them
# at scale. Only orders⋈lineitem is an unavoidable big shuffle.
# ---------------------------------------------------------------------------
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    # [1995, 1996): the synthetic testdata's orderdates start 1995-01-01,
    # so TPC-H's canonical 1994 window matches NOTHING (vacuous parity).
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        # TPC-H Q5: customer and supplier must share the nation
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            money_sum(money("l_extendedprice") * one_minus("l_discount")).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_ORACLE = """
SELECT n_name, round(sum(l_extendedprice::DECIMAL(12,2)
                         * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# projection + filter with pushdown: a 3-column scan of an 11-column
# table — ReadSchema in the plan must show only the selected columns and
# PushedFilters must carry both predicates into the parquet reader.
# ---------------------------------------------------------------------------
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") >= 49) & (F.col("l_discount") > 0.05))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


SCAN_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_quantity >= 49 AND l_discount > 0.05
ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------------------
# broadcast inner join — explicit broadcast() of the dim table: at any
# scale nation is tiny, so a shuffle-free broadcast-hash join is the
# only acceptable plan.
# ---------------------------------------------------------------------------
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("customers"),
            money_sum(money("c_acctbal")).alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


JOIN_BROADCAST_ORACLE = """
SELECT n_name, count(*) AS customers,
       round(sum(c_acctbal::DECIMAL(12,2)), 2)::DOUBLE AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# left semi join — the reference's batch point-lookup semantics (R8:
# retrieveBinaryData(urls) drops missing keys, SURVEY §2) is an IN-list
# semi join. Semi joins never widen rows, so the shuffle carries only the
# probe side's needed columns.
# ---------------------------------------------------------------------------
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(money("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


JOIN_SEMI_ORACLE = """
SELECT o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice::DECIMAL(12,2)), 2)::DOUBLE AS total_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# left anti join — orphan detection (customers with no orders).
# ---------------------------------------------------------------------------
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# outer join with null handling — every customer, order stats or zero.
# ---------------------------------------------------------------------------
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("cnt"),
        money_sum(money("o_totalprice")).alias("tot"),
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("tot"), F.lit(0.0)).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


JOIN_LEFT_OUTER_ORACLE = """
SELECT c_custkey,
       coalesce(cnt, 0)   AS n_orders,
       coalesce(tot, 0.0) AS total_spent
FROM customer
LEFT JOIN (
    SELECT o_custkey, count(*) AS cnt,
           round(sum(o_totalprice::DECIMAL(12,2)), 2)::DOUBLE AS tot
    FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# basic aggregate suite over one scan (count/sum/avg/min/max + distinct).
# Spark splits into partial (map-side) + final agg automatically; the
# count(distinct) triggers an expand+two-phase plan.
# ---------------------------------------------------------------------------
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            money_sum(money("l_extendedprice")).alias("sum_price"),
            (F.round(F.sum("l_quantity"), 2) / F.count("*")).alias("avg_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
        )
        .orderBy("l_returnflag")
    )


AGG_BASIC_ORACLE = """
SELECT l_returnflag,
       count(*)                        AS cnt,
       round(sum(l_extendedprice::DECIMAL(12,2)), 2)::DOUBLE AS sum_price,
       round(sum(l_quantity), 2) / count(*) AS avg_qty,
       round(min(l_extendedprice), 2)  AS min_price,
       round(max(l_extendedprice), 2)  AS max_price,
       count(DISTINCT l_partkey)       AS distinct_parts
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# rollup — tenant×type×date style reporting over the lake layout
# (here: returnflag × linestatus). grouping_id exposed as grp level.
# ---------------------------------------------------------------------------
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


AGG_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt, round(sum(l_quantity), 2) AS qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            money_sum(money("o_totalprice")).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


AGG_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
       round(sum(o_totalprice::DECIMAL(12,2)), 2)::DOUBLE AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_gs_orders"
    )
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


AGG_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# global top-k: Catalyst rewrites orderBy+limit → TakeOrderedAndProject,
# so each partition computes a local top-k and only k rows per partition
# reach the driver-side merge — no global sort at any scale.
# ---------------------------------------------------------------------------
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .limit(25)
    )


SORT_LIMIT_ORACLE = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


# ---------------------------------------------------------------------------
# full outer join — reconcile two entity sets keeping unmatched rows of
# both sides (customers with orders ∪ event users): the lake's
# cross-system reconciliation shape.
# ---------------------------------------------------------------------------
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count("*").alias("n_orders")
    )
    events = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").alias("n_events")
    )
    return (
        orders.join(events, orders.o_custkey == events.user_id, "full_outer")
        .select(
            F.coalesce(F.col("o_custkey"), F.col("user_id")).alias("entity_id"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        )
        .orderBy("entity_id")
    )


JOIN_FULL_OUTER_ORACLE = """
SELECT coalesce(o.o_custkey, e.user_id) AS entity_id,
       coalesce(o.n_orders, 0)          AS n_orders,
       coalesce(e.n_events, 0)          AS n_events
FROM (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1) o
FULL OUTER JOIN (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1) e
  ON o.o_custkey = e.user_id
ORDER BY entity_id
"""


# ---------------------------------------------------------------------------
# explicit cross join — only ever legitimate between tiny frames (here
# 5×25 dim rows); the engine keeps it out of every other plan
# (tests/test_plans.py asserts no accidental cartesian products).
# ---------------------------------------------------------------------------
def join_cross_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.crossJoin(nation)
        .select("r_name", "n_name", (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"))
        .orderBy("r_name", "n_name")
    )


JOIN_CROSS_ORACLE = """
SELECT r_name, n_name, r_regionkey = n_regionkey AS is_home
FROM region CROSS JOIN nation
ORDER BY r_name, n_name
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "join_full_outer": join_full_outer,
    "join_cross_dims": join_cross_dims,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "scan_filter_project": scan_filter_project,
    "join_broadcast": join_broadcast,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_left_outer": join_left_outer,
    "agg_basic": agg_basic,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "sort_limit_topk": sort_limit_topk,
}

ORACLES = {
    "q1_pricing_summary": Q1_ORACLE,
    "join_full_outer": JOIN_FULL_OUTER_ORACLE,
    "join_cross_dims": JOIN_CROSS_ORACLE,
    "q3_shipping_priority": Q3_ORACLE,
    "q5_local_supplier_volume": Q5_ORACLE,
    "scan_filter_project": SCAN_ORACLE,
    "join_broadcast": JOIN_BROADCAST_ORACLE,
    "join_semi": JOIN_SEMI_ORACLE,
    "join_anti": JOIN_ANTI_ORACLE,
    "join_left_outer": JOIN_LEFT_OUTER_ORACLE,
    "agg_basic": AGG_BASIC_ORACLE,
    "agg_rollup": AGG_ROLLUP_ORACLE,
    "agg_cube": AGG_CUBE_ORACLE,
    "agg_grouping_sets": AGG_GROUPING_SETS_ORACLE,
    "sort_limit_topk": SORT_LIMIT_ORACLE,
}
