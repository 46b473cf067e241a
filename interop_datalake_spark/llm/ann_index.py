"""Persisted, incrementally-maintained IVF index over TxnTables — the
ANN counterpart of the LSH signature store (llm/dedup.py's
round-4 architecture): train once, then serve queries and absorb new
vectors WITHOUT ever re-touching the already-indexed corpus.

Two lake tables per index:

- ``{name}_centroids`` — the coarse quantizer in long form
  (cluster_id, dim, cx): the model artifact, k·d rows, always
  broadcastable;
- ``{name}_vectors``  — (id, cell, vec): every indexed vector stored
  IN its cell assignment, so a query's candidate fetch is an
  equi-join on ``cell`` against exactly this table.

Incremental append: a new batch is assigned against the STORED
centroids (one broadcast join over the batch — O(new batch), zero
reads of indexed vectors) and appended in one ACID commit. Queries
read only the two store tables. Centroid drift under sustained
appends is the documented operational tradeoff (same as every IVF
deployment): retrain with :func:`build_ivf_index` when recall decays.

Determinism: the quantizer is the RNG-free Lloyd trajectory
(llm/clustering.py:kmeans_fit), so build → append → append → query is
a pure function of the inputs and the DuckDB oracle replays the WHOLE
index lifecycle, not just one query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from interop_datalake_spark.functions.vectors import cosine_similarity
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.llm.clustering import kmeans_assign, kmeans_fit


class IvfIndex:
    def __init__(self, session, name: str):
        self.centroids = TxnTable(session, f"{name}_centroids")
        self.vectors = TxnTable(session, f"{name}_vectors")

    def _assign(self, df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
        cents = self.centroids.read()
        return kmeans_assign(df, vec_col, id_col, cents).select(
            id_col, F.col("cluster_id").alias("cell")
        )

    def build(
        self,
        df: DataFrame,
        vec_col: str,
        id_col: str,
        k: int = 8,
        iters: int = 2,
    ) -> None:
        """Train the quantizer on ``df`` and index it: centroid table
        + cell-assigned vector table, each one ACID overwrite."""
        self.centroids.overwrite(
            kmeans_fit(df, vec_col, id_col, k=k, iters=iters)
        )
        assigned = self._assign(df, vec_col, id_col)
        self.vectors.overwrite(
            assigned.join(df.select(id_col, vec_col), id_col).select(
                F.col(id_col).alias("id"), "cell", F.col(vec_col).alias("vec")
            )
        )

    def append(self, df: DataFrame, vec_col: str, id_col: str) -> int:
        """Index a new batch against the STORED centroids: O(batch),
        one atomic commit, indexed vectors never rescanned."""
        assigned = self._assign(df, vec_col, id_col)
        return self.vectors.append(
            assigned.join(df.select(id_col, vec_col), id_col).select(
                F.col(id_col).alias("id"), "cell", F.col(vec_col).alias("vec")
            )
        )

    def query(
        self, queries: DataFrame, vec_col: str, id_col: str, k: int = 3
    ) -> DataFrame:
        """(query_id, neighbor_id, rn, cos): per query, the local
        top-k by cosine among the vectors of its nearest cell (probe
        widening = the multiprobe lever of llm/similarity.py; single
        probe here keeps the oracle one CTE shorter). Candidates come
        ONLY from the store."""
        probes = self._assign(queries, vec_col, id_col)
        q = probes.join(queries.select(id_col, vec_col), id_col).select(
            F.col(id_col).alias("query_id"), "cell",
            F.col(vec_col).alias("_qv"),
        )
        c = self.vectors.read().select(
            F.col("id").alias("neighbor_id"), "cell", F.col("vec").alias("_cv")
        )
        scored = (
            q.join(c, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("cos", cosine_similarity("_qv", "_cv"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos"), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", "rn", "cos")
        )
