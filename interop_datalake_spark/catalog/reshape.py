"""Reshaping + semi-structured catalog: pivot/unpivot, time-series
gap-fill, and Spark 4 VariantType JSON access.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from interop_datalake_spark.functions.money import money, money_sum
from interop_datalake_spark.sources.tables import load_table, local_frame

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user event counts (pivot with an explicit value list —
    at scale ALWAYS pass the list: without it Spark runs an extra
    distinct pass over the full table to discover columns)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
        .orderBy("user_id")
    )


PIVOT_ORACLE = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'error')    AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'view')     AS view
FROM events GROUP BY user_id ORDER BY user_id
"""


def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form metrics via unpivot (melt) — the inverse reshape."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderstatus").agg(
        money_sum(money("o_totalprice")).alias("total_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
    )
    return (
        wide.unpivot("o_orderstatus", ["total_price", "max_price", "n_orders"],
                     "metric", "value")
        .orderBy("o_orderstatus", "metric")
    )


UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT o_orderstatus,
         round(sum(o_totalprice::DECIMAL(12,2)), 2)::DOUBLE AS total_price,
         round(max(o_totalprice), 2)     AS max_price,
         count(*)::DOUBLE                AS n_orders
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, metric, value FROM (
  SELECT o_orderstatus, 'total_price' AS metric, total_price AS value FROM wide
  UNION ALL
  SELECT o_orderstatus, 'max_price', max_price FROM wide
  UNION ALL
  SELECT o_orderstatus, 'n_orders', n_orders FROM wide
) ORDER BY o_orderstatus, metric
"""


def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: dense hourly grid for the first day ×
    event types, zero-filling hours with no events (sequence+explode —
    the scale-safe alternative to a driver-side calendar loop)."""
    ev = load_table(spark, sf_dir, "events")
    start = F.lit("2024-01-01 00:00:00").cast("timestamp")
    end = F.lit("2024-01-01 23:00:00").cast("timestamp")
    grid = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(start, end, F.expr("INTERVAL 1 HOUR"))
            ).alias("hour")
        )
        .crossJoin(local_frame(spark, [(t,) for t in _EVENT_TYPES], "event_type STRING"))
    )
    counts = (
        ev.filter(F.col("ts") < F.lit("2024-01-02").cast("timestamp"))
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        grid.join(counts, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
        .orderBy("hour", "event_type")
    )


GAPFILL_ORACLE = """
WITH grid AS (
  SELECT g.ts AS hour, t.event_type
  FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                       TIMESTAMP '2024-01-01 23:00:00',
                       INTERVAL 1 HOUR) g(ts)
  CROSS JOIN (SELECT unnest(['click','error','purchase','signup','view']) AS event_type) t
), counts AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
  FROM events WHERE ts < TIMESTAMP '2024-01-02'
  GROUP BY 1, 2
)
SELECT g.hour, g.event_type, coalesce(c.n, 0) AS n_events
FROM grid g LEFT JOIN counts c ON g.hour = c.hour AND g.event_type = c.event_type
ORDER BY g.hour, g.event_type
"""


def variant_json_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType: parse once, access typed fields — the
    engine's semi-structured path for documents whose schema is not
    worth declaring (bronze FHIR exploration)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return (
        ev.select(
            "event_id",
            F.try_variant_get(v, "$.k", "int").alias("k_typed"),
            F.try_variant_get(v, "$.missing", "string").alias("absent"),
            F.is_variant_null(v).alias("is_null_doc"),
        )
        .orderBy("event_id")
    )


VARIANT_ORACLE = """
SELECT event_id,
       json_extract(props, '$.k')::INT          AS k_typed,
       json_extract_string(props, '$.missing')  AS absent,
       props IS NULL OR json(props) = 'null'    AS is_null_doc
FROM events ORDER BY event_id
"""


QUERIES = {
    "pivot_event_types": pivot_event_types,
    "unpivot_order_metrics": unpivot_order_metrics,
    "events_gapfill_hourly": events_gapfill_hourly,
    "variant_json_access": variant_json_access,
}

ORACLES = {
    "pivot_event_types": PIVOT_ORACLE,
    "unpivot_order_metrics": UNPIVOT_ORACLE,
    "events_gapfill_hourly": GAPFILL_ORACLE,
    "variant_json_access": VARIANT_ORACLE,
}
