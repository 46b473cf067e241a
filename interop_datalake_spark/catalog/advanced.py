"""Advanced aggregates + subquery catalog: exact percentiles/median,
deterministic manual variance, approx-distinct (rows-only), correlated
EXISTS / NOT EXISTS, scalar subqueries, by-name unions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from interop_datalake_spark.sources.tables import load_table, local_frame


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


def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles (the engine's sketch
    quantile, deterministic for fixed data+accuracy) checked IN-QUERY
    against the exact percentile: the oracle pins the exact values and
    the ``err_ok`` flag (GK's rank error ε=1/accuracy translates to a
    value tolerance measured here as 1% of the exact), not the
    engine-specific sketch numbers — the same honesty pattern as the
    HLL rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_a"),
        F.percentile_approx("l_extendedprice", 0.95, 1000).alias("p95_a"),
        F.round(F.percentile("l_extendedprice", 0.5), 6).alias("p50_exact"),
        F.round(F.percentile("l_extendedprice", 0.95), 6).alias("p95_exact"),
    )
    tol = 0.01
    return (
        per.select(
            "l_returnflag",
            "p50_exact",
            "p95_exact",
            (
                (F.abs(F.col("p50_a") - F.col("p50_exact"))
                 <= tol * F.col("p50_exact"))
                & (F.abs(F.col("p95_a") - F.col("p95_exact"))
                   <= tol * F.col("p95_exact"))
            ).alias("err_ok"),
        )
        .orderBy("l_returnflag")
    )


APPROX_PERCENTILE_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_exact,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_exact,
       true AS err_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


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


def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax): which order holds the extreme
    price per status. Prices tie at 2 decimals, so the ordering key is
    made unique by appending the zero-padded orderkey — fixed-width
    formatting gives identical lexicographic=numeric order in both
    engines (plain min_by over a tied key is nondeterministic)."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.format_string("%018.2f|%012d", F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.min_by("o_orderkey", key).alias("cheapest_order"),
            F.max_by("o_orderkey", key).alias("priciest_order"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


AGG_MIN_MAX_BY_ORACLE = """
SELECT o_orderstatus,
       arg_min(o_orderkey, printf('%018.2f|%012d', o_totalprice, o_orderkey)) AS cheapest_order,
       arg_max(o_orderkey, printf('%018.2f|%012d', o_totalprice, o_orderkey)) AS priciest_order,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): distinct customer segments
    per nation, sorted — collect_set + array_sort keeps the result
    deterministic regardless of shuffle order."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.size(F.collect_set("c_mktsegment")).alias("n_segments"),
        )
        .orderBy("n_name")
    )


AGG_STRING_CONCAT_ORACLE = """
SELECT n_name,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
       count(DISTINCT c_mktsegment)                                 AS n_segments
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


#: entity-resolution fixture: clean records + planted dirty variants.
#: Deterministic literals so the DuckDB oracle replays the ENTIRE
#: pipeline (normalize → block → bigram-Jaccard → threshold) from the
#: same VALUES, not from pinned outputs.
_ER_FIXTURE = [
    (101, "John Smith", "r1"),
    (102, "Maria  Garcia", "r1"),
    (103, "Wei Chen", "r2"),
    (104, "Olu Adebayo", "r2"),
    (105, "Jane Doe", "r1"),
    (106, "James Smythe", "r1"),
    (201, "Jon Smith", "r1"),        # typo variant of 101, same block
    (202, "MARIA GARCIA", "r1"),     # case/space variant of 102
    (203, "Wei Chen jr", "r2"),      # suffix variant of 103
    (204, "Olu Adebayo", "r3"),      # exact name, WRONG block: must miss
    (205, "X", "r1"),                # degenerate 1-char name: no bigrams
]


def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (operators/linkage.py): normalize → block on
    (region, first letter) → character-bigram Jaccard ≥ 0.6. The
    planted variants witness each rule: typo and case/space variants
    match; a suffix variant matches at a lower score; an exact name in
    the WRONG block is (correctly, instructively) missed — blocking
    trades that recall for the Σ|b|² candidate bound; unrelated names
    sharing a block score below threshold; a 1-char name has no
    bigrams and cannot join. Candidate pairs are Σ per-block, the only
    shuffle is the blocking equi-join, and every score replays in the
    oracle from the same VALUES."""
    from interop_datalake_spark.operators.linkage import resolve_entities

    df = local_frame(spark,
        _ER_FIXTURE, "rec_id INT, name STRING, region STRING"
    )
    return resolve_entities(
        df, "rec_id", "name", ["region"], threshold=0.6
    ).orderBy("id_a", "id_b")


def _er_values_sql() -> str:
    rows = ", ".join(
        f"({i}, '{n}', '{r}')" for i, n, r in _ER_FIXTURE
    )
    return f"SELECT * FROM (VALUES {rows}) AS t(rec_id, name, region)"


ENTITY_RESOLUTION_ORACLE = f"""
WITH recs AS ({_er_values_sql()}),
norm AS (
  SELECT rec_id, region,
         trim(regexp_replace(lower(name), '[^a-z0-9]+', ' ', 'g')) AS nm
  FROM recs
), feat AS (
  SELECT rec_id, region, nm, substr(nm, 1, 1) AS blk,
         CASE WHEN length(nm) < 2 THEN []::VARCHAR[]
              ELSE list_distinct(list_transform(
                     generate_series(1, length(nm) - 1),
                     i -> substr(nm, i, 2)))
         END AS bg
  FROM norm
)
, pairs AS (
  SELECT a.rec_id AS id_a, b.rec_id AS id_b,
         len(list_filter(a.bg, x -> list_contains(b.bg, x))) AS inter,
         len(a.bg) + len(b.bg)
           - len(list_filter(a.bg, x -> list_contains(b.bg, x))) AS uni
  FROM feat a JOIN feat b
    ON a.blk = b.blk AND a.region = b.region AND a.rec_id < b.rec_id
)
-- exact 6-dp half-up integer ratio (round(double, 6) red class);
-- the threshold also filters on the same 6-dp value, like Spark
SELECT id_a, id_b,
       (CASE WHEN uni <> 0 THEN
          ((2 * inter * 1000000 + uni) // (2 * uni))::DOUBLE / 1000000.0
        END) AS jaccard
FROM pairs
WHERE (CASE WHEN uni <> 0 THEN
         ((2 * inter * 1000000 + uni) // (2 * uni))::DOUBLE / 1000000.0
       END) >= 0.6
ORDER BY id_a, id_b
"""


QUERIES = {
    "agg_percentiles": agg_percentiles,
    "entity_resolution": entity_resolution,
    "agg_min_max_by": agg_min_max_by,
    "agg_string_concat": agg_string_concat,
    "agg_median": agg_median,
    "agg_variance_manual": agg_variance_manual,
    "agg_approx_distinct": agg_approx_distinct,
    "agg_approx_percentile": agg_approx_percentile,
    "subquery_scalar": subquery_scalar,
    "subquery_exists": subquery_exists,
    "subquery_not_exists": subquery_not_exists,
    "union_by_name_missing": union_by_name_missing,
}

ORACLES = {
    "agg_approx_percentile": APPROX_PERCENTILE_ORACLE,
    "entity_resolution": ENTITY_RESOLUTION_ORACLE,
    "agg_percentiles": AGG_PERCENTILES_ORACLE,
    "agg_min_max_by": AGG_MIN_MAX_BY_ORACLE,
    "agg_string_concat": AGG_STRING_CONCAT_ORACLE,
    "agg_median": AGG_MEDIAN_ORACLE,
    "agg_variance_manual": AGG_VARIANCE_ORACLE,
    # agg_approx_distinct: intentionally no oracle (sketch-dependent)
    "subquery_scalar": SUBQUERY_SCALAR_ORACLE,
    "subquery_exists": SUBQUERY_EXISTS_ORACLE,
    "subquery_not_exists": SUBQUERY_NOT_EXISTS_ORACLE,
    "union_by_name_missing": UNION_BY_NAME_ORACLE,
}
