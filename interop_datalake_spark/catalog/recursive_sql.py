"""Modern-SQL surface: recursive CTEs and correlated LATERAL
subqueries — the two query shapes Spark 4 added that a reference user
migrating an analytics workload would reach for next (hierarchy
walks, per-row top-k without a window rewrite by hand).

Both queries run the SAME SQL text on Spark and on the DuckDB oracle
(built from one shared template, so the two engines can never drift
apart silently), which is exactly the portability promise the rest of
the catalog makes with DataFrame-vs-SQL pairs.

Scale notes:
- Recursive CTE: Spark 4 executes WITH RECURSIVE as an iterative
  union-loop; each step joins the current frontier (shrinking: only
  non-root rows survive the step) against the edge list. The edge
  list here is dim-sized (one row per supplier) and broadcastable;
  depth is bounded by log10(max key), so the loop runs ~4 iterations
  at any scale factor. At 100 TB the same plan holds as long as the
  EDGE side stays dim-sized — a fact-sized edge list would instead
  want the shuffle-both-sides reachability loop that
  llm/dedup.py:dedup_cluster already implements (Pregel-style
  min-label propagation), which is the documented escape hatch.
- LATERAL top-k: Catalyst de-correlates `LATERAL ... ORDER BY ...
  LIMIT k` into WindowGroupLimit with a PARTIAL (map-side) group
  limit before the exchange — each task keeps only k rows per key
  before shuffling, so the shuffle volume is k·|keys|, independent of
  fact-table row count. Verified in the plan
  (tests/test_recursive_sql.py asserts the partial WindowGroupLimit),
  which is why this needs no hand-written rewrite to survive a 100×
  scale-up.

Determinism: ancestor math is pure integer arithmetic
(floor(k/10) parents — doubles ≤ 1e7 are exact, floor is identical in
both engines; CAST of a fractional double would NOT be: DuckDB rounds
half-even where Spark truncates). The lateral query orders by a raw
double read untouched from parquet (byte-identical in both engines)
with an integer tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from interop_datalake_spark.sources.tables import load_table

# One template, two engines. Placeholders are table names only.
_ANCESTOR_SQL = """
WITH RECURSIVE edges AS (
  SELECT s_suppkey AS child,
         CAST(floor(s_suppkey / 10.0) AS BIGINT) AS parent
  FROM {supplier} WHERE s_suppkey >= 10
),
chain AS (
  SELECT s_suppkey AS node, s_suppkey AS anc, 0 AS depth
  FROM {supplier}
  UNION ALL
  SELECT c.node, e.parent, c.depth + 1
  FROM chain c JOIN edges e ON c.anc = e.child
)
SELECT node AS s_suppkey, anc AS root_key, depth
FROM chain WHERE anc <= 9
ORDER BY s_suppkey
"""

_LATERAL_TOPK_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM {customer} c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_custkey <= 200
ORDER BY c_custkey, o_totalprice DESC, o_orderkey
"""


def graph_ancestor_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive ancestor walk over the supplier reporting forest
    (parent(k) = floor(k/10); keys < 10 are roots) via WITH RECURSIVE:
    every supplier resolves to its root and depth. The recursion is a
    frontier-join loop — rows leave the frontier the step they hit a
    root, so the working set shrinks monotonically."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "rsql_supplier"
    )
    return spark.sql(_ANCESTOR_SQL.format(supplier="rsql_supplier"))


GRAPH_ANCESTOR_ORACLE = _ANCESTOR_SQL.format(supplier="supplier")


def lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-2 orders by price via a correlated LATERAL
    subquery with ORDER BY + LIMIT — the declarative form of
    topk_per_group. Catalyst de-correlates it into a partial
    WindowGroupLimit (map-side top-k before the shuffle), so the
    exchange moves k rows per key, not the fact table."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "rsql_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "rsql_orders"
    )
    return spark.sql(
        _LATERAL_TOPK_SQL.format(customer="rsql_customer", orders="rsql_orders")
    )


LATERAL_TOPK_ORACLE = _LATERAL_TOPK_SQL.format(
    customer="customer", orders="orders"
)


QUERIES = {
    "graph_ancestor_chain": graph_ancestor_chain,
    "lateral_topk_orders": lateral_topk_orders,
}

ORACLES = {
    "graph_ancestor_chain": GRAPH_ANCESTOR_ORACLE,
    "lateral_topk_orders": LATERAL_TOPK_ORACLE,
}
