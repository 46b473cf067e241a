"""Graph analytics catalog: iterative PageRank over the
customer↔supplier trade graph — the representative of the
fixed-point/iterative-algorithm operator class (alongside
llm/dedup.py's connected-components loop), expressed as a driver loop
of joins + aggregations with NO per-vertex Python anywhere.

Graph construction: distinct (customer, supplier) pairs that traded
(orders ⋈ lineitem), symmetrized so every node has out-degree ≥ 1 —
the standard undirected-PageRank trick that removes dangling-mass
bookkeeping. Node ids are prefixed ('c'/'s') to keep the two key
spaces disjoint.

Scale shape per iteration: the rank vector is |V| rows — broadcast to
the edge list (pre-joined with out-degree ONCE and
``localCheckpoint``-ed), so each round is ONE shuffle: the
contribution groupBy. Rank mass is summed as exact DECIMAL(20,15) —
order-independent, so the trajectory is a pure function of the graph
and the DuckDB oracle replays all three iterations CTE-for-CTE
(memory: spark-duckdb-float-determinism). At 1000 executors the same
plan holds while ranks fit a broadcast (~10⁸ nodes); beyond that the
join degrades gracefully to the classic shuffle-both-sides PageRank.
Skewed hubs (every supplier here has ~500 customer neighbors)
partial-aggregate map-side before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from interop_datalake_spark.sources.tables import load_table

_DAMP = 0.85
_ITERS = 3


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 synchronous PageRank iterations (d = 0.85) from a uniform
    start; returns (node, deg, rank). Suppliers concentrate mass
    (~15× a customer's rank at sf0.01) — the graph's actual hub
    structure, not an artifact."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    # tagged-integer node ids (customer 2k, supplier 2k+1): every
    # shuffle, hash, and checkpoint moves 8-byte longs instead of
    # strings; labels are formatted once, at output. The expensive
    # fact-join + distinct feeds FOUR consumers (degree table, init
    # ranks, per-iteration joins, final join): materialize it once.
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .localCheckpoint()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint()
    # edges carry their source degree once; reused by every iteration.
    # deg and ranks are |V| rows — always broadcastable (the checkpoint
    # hides size stats from the optimizer, so say it explicitly): the
    # 2|E| edge list is never shuffled by a join, only by the
    # contribution groupBy.
    edges_deg = edges.join(F.broadcast(deg), "src").localCheckpoint(
        eager=False
    )
    n = deg.count()  # bounded driver scalar: |V|, needed for the teleport term
    base = F.round(F.lit(0.15) / F.lit(float(n)), 12)
    ranks = deg.select(
        F.col("src").alias("node"),
        F.round(F.lit(1.0) / F.lit(float(n)), 12).alias("r"),
    )
    for _ in range(_ITERS):
        contrib = edges_deg.join(
            F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
        ).select(
            F.col("dst").alias("node"),
            (F.col("r") / F.col("deg")).cast("decimal(20,15)").alias("_c"),
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("_c").alias("_s"))
            .select(
                "node",
                F.round(
                    base + F.lit(_DAMP) * F.col("_s").cast("double"), 12
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("bigint")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("bigint"))
    )
    return (
        ranks.join(deg.withColumnRenamed("src", "node"), "node")
        .select(label.alias("node"), "deg", F.round("r", 6).alias("rank"))
        .orderBy("node")
    )


def _pr_iter_sql(prev: str, n: int) -> str:
    """One synchronous PageRank round as a CTE fragment."""
    return f"""r{n} AS (
  SELECT e.dst AS node,
         round((SELECT round(0.15 / n, 12) FROM nn)
               + 0.85 * sum((p.r / e.deg)::DECIMAL(20,15))::DOUBLE,
               12) AS r
  FROM ed e JOIN {prev} p ON e.src = p.node
  GROUP BY e.dst
)"""


PAGERANK_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), edges AS (
  SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
), deg AS (
  SELECT src, count(*) AS deg FROM edges GROUP BY src
), ed AS (
  SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src
), nn AS (SELECT count(*)::DOUBLE AS n FROM deg),
r0 AS (
  SELECT src AS node, round(1.0 / n, 12) AS r FROM deg, nn
), {_pr_iter_sql('r0', 1)}, {_pr_iter_sql('r1', 2)}, {_pr_iter_sql('r2', 3)}
SELECT CASE WHEN r.node % 2 = 0 THEN 'c' || (r.node // 2)
            ELSE 's' || ((r.node - 1) // 2) END AS node,
       d.deg, round(r.r, 6) AS rank
FROM r3 r JOIN deg d ON d.src = r.node
ORDER BY node
"""


QUERIES = {
    "graph_pagerank": graph_pagerank,
}

ORACLES = {
    "graph_pagerank": PAGERANK_ORACLE,
}
