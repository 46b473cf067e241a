"""Window-function catalog — ranking, analytic, running frames,
per-group top-k, as-of and range joins over events/orders.

Every window here partitions by a key whose cardinality grows with the
data (custkey / user_id), so at 100 TB the single shuffle per query
spreads across the cluster; no window runs unpartitioned (an
``orderBy`` without ``partitionBy`` would serialize on one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from interop_datalake_spark.operators.joins import asof_join, range_join
from interop_datalake_spark.operators.topk import top_k_per_group
from interop_datalake_spark.sources.tables import load_table


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


WINDOW_RANK_ORACLE = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
         row_number() OVER w AS rn,
         rank()       OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         ntile(4)     OVER w AS quartile
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3 ORDER BY o_custkey, rn
"""


def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            F.lag("event_type", 1).over(w).alias("prev_type"),
            F.lead("event_type", 1).over(w).alias("next_type"),
            F.first("event_type").over(wf).alias("first_type"),
            F.last("event_type").over(wf).alias("last_type"),
        )
        .orderBy("user_id", "event_id")
    )


WINDOW_ANALYTIC_ORACLE = """
SELECT user_id, event_id, round(value, 2) AS value,
       lag(event_type)  OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       first_value(event_type) OVER wf AS first_type,
       last_value(event_type)  OVER wf AS last_type
FROM events
WINDOW w  AS (PARTITION BY user_id ORDER BY ts, event_id),
       wf AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY user_id, event_id
"""


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals + sliding 3-row average per user over time."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slide = w.rowsBetween(-2, Window.currentRow)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(run), 2).alias("running_sum"),
            F.round(F.avg("value").over(slide), 4).alias("sliding_avg3"),
            F.count("*").over(run).alias("events_so_far"),
        )
        .orderBy("user_id", "event_id")
    )


WINDOW_RUNNING_ORACLE = """
SELECT user_id, event_id,
       round(sum(value) OVER run, 2)   AS running_sum,
       round(avg(value) OVER slide, 4) AS sliding_avg3,
       count(*) OVER run               AS events_so_far
FROM events
WINDOW run   AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       slide AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top spender per nation — per-group top-k via the operator."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    top = top_k_per_group(
        joined,
        ["n_name"],
        [F.desc("c_acctbal"), F.col("c_custkey")],
        k=2,
    )
    return top.select(
        "n_name", "rn", "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal")
    ).orderBy("n_name", "rn")


TOPK_PER_GROUP_ORACLE = """
SELECT n_name, rn, c_custkey, round(c_acctbal, 2) AS c_acctbal
FROM (
  SELECT n_name, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) WHERE rn <= 2 ORDER BY n_name, rn
"""


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the user's most recent prior-or-equal click
    value (event-time as-of join, union+window plan — operators/joins.py)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_values=["click_value"],
        suffix="",
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("click_value", 2).alias("last_click_value"),
    ).orderBy("user_id", "event_id")


JOIN_ASOF_ORACLE = """
SELECT p.user_id, p.event_id,
       round(p.value, 2) AS purchase_value,
       round(c.value, 2) AS last_click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.user_id, p.event_id
"""


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error events within 2h after a purchase by the same user —
    bucketed range join (no unbounded theta join; operators/joins.py)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user_id"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("ets"),
    )
    errors = errors.withColumnRenamed("e_user_id", "user_id")
    out = range_join(
        purchases,
        errors,
        on="user_id",
        left_ts="pts",
        right_ts="ets",
        max_distance_seconds=7200,
    )
    # range_join equi-joins on the key so 'user_id' appears once per side;
    # select via the left frame reference
    return out.select(
        purchases["user_id"].alias("user_id"), "purchase_id", "error_id"
    ).orderBy("user_id", "purchase_id", "error_id")


JOIN_RANGE_ORACLE = """
SELECT p.user_id AS user_id, p.event_id AS purchase_id, e.event_id AS error_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND e.ts >= p.ts
 AND epoch(e.ts) - epoch(p.ts) <= 7200
ORDER BY user_id, purchase_id, error_id
"""


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist over
    account balance within each market segment."""
    from interop_datalake_spark.functions.fixedpoint import (
        exact_ratio,
        try_exact_ratio,
    )

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wp = Window.partitionBy("c_mktsegment")
    # percent_rank/cume_dist are integer ratios (rank−1)/(n−1), rn/n —
    # emitted via the exact 6-dp half-up integer ratio, because
    # round(double, 6) of an integer ratio can land exactly half-way
    # on the grid (ewma red-row class). The ORDER BY tiebreak is
    # unique (c_custkey), so rank == row_number and cume counts rn.
    rn = F.row_number().over(w)
    n = F.count("*").over(wp)
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            F.coalesce(
                try_exact_ratio(rn - 1, n - 1), F.lit(0.0)
            ).alias("pct_rank"),
            exact_ratio(rn, n).alias("cume"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


WINDOW_DISTRIBUTION_ORACLE = """
WITH r AS (
  SELECT c_mktsegment, c_custkey,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
)
SELECT c_mktsegment, c_custkey,
       coalesce(CASE WHEN n > 1 THEN
         ((2 * (rn - 1) * 1000000 + (n - 1))
          // (2 * (n - 1)))::DOUBLE / 1000000.0 END, 0.0) AS pct_rank,
       ((2 * rn * 1000000 + n) // (2 * n))::DOUBLE / 1000000.0 AS cume
FROM r
ORDER BY c_mktsegment, c_custkey
"""


QUERIES = {
    "window_rank": window_rank,
    "window_distribution": window_distribution,
    "window_analytic": window_analytic,
    "window_running": window_running,
    "topk_per_group": topk_per_group,
    "join_asof": join_asof,
    "join_range": join_range,
}

ORACLES = {
    "window_rank": WINDOW_RANK_ORACLE,
    "window_distribution": WINDOW_DISTRIBUTION_ORACLE,
    "window_analytic": WINDOW_ANALYTIC_ORACLE,
    "window_running": WINDOW_RUNNING_ORACLE,
    "topk_per_group": TOPK_PER_GROUP_ORACLE,
    "join_asof": JOIN_ASOF_ORACLE,
    "join_range": JOIN_RANGE_ORACLE,
}
