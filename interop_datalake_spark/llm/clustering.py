"""K-means clustering over embedding columns — corpus domain discovery
and cluster-balanced sampling for training-data curation.

Layout choice: vectors are kept in LONG form (id, dim, x) for the
distance math. Assignment is then an equi-join on ``dim`` against the
(k·d)-row centroid table — always broadcastable (k·d ≪ corpus) — plus
one partial-aggregated groupBy per (vector, centroid). No arrays are
rebuilt between iterations and no stage ever shuffles full vectors:
the shuffle rows are (id, cid, partial-sum) triples. Lloyd iterations
run as a driver loop of DataFrame ops; each iteration is two shuffles
(assign-argmin, recompute-means) regardless of corpus size.

Determinism: initial centroids are the first ``k`` vectors by id (no
RNG), argmin ties break on the lower centroid id, means are exact
DOUBLE averages — the whole trajectory is a pure function of the
input, which is what lets the DuckDB oracle replay every iteration.

``localCheckpoint`` truncates lineage between iterations (same pattern
as llm/dedup.py:duplicate_clusters) so the plan does not grow by two
joins per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def vectors_long(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, dim, x): 1-based dim, x as DOUBLE."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("_p", "_x"),
    ).select(
        F.col(id_col),
        (F.col("_p") + 1).alias("dim"),
        F.col("_x").cast("double").alias("x"),
    )


def _assign(
    emb_long: DataFrame, centroids_long: DataFrame, id_col: str
) -> DataFrame:
    """argmin_c Σ_d (x - c_x)²  →  (id, cluster_id, dist2)."""
    d2 = (
        emb_long.join(F.broadcast(centroids_long), "dim")
        .withColumn("_sq", (F.col("x") - F.col("cx")) ** 2)
        .groupBy(id_col, "cluster_id")
        .agg(F.sum("_sq").alias("dist2"))
    )
    w = Window.partitionBy(id_col).orderBy("dist2", "cluster_id")
    return (
        d2.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "cluster_id", "dist2")
    )


def kmeans_assign(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: DataFrame,
) -> DataFrame:
    """One assignment pass against a fixed centroid table
    (cluster_id, dim, cx). Returns (id, cluster_id, dist2)."""
    return _assign(vectors_long(df, vec_col, id_col), centroids, id_col)


def seed_centroids(
    df: DataFrame, vec_col: str, id_col: str, k: int
) -> DataFrame:
    """Deterministic init: the k lowest-id vectors, relabeled 0..k-1
    by id rank. (Production would use k-means‖ sampling; init
    determinism is the point here.) Works for SPARSE or non-contiguous
    ids: a sort+limit picks the k lowest ids (a TakeOrdered over the
    tiny (id) projection, not a global sort of vectors), then the rank
    relabel makes cluster ids dense 0..k-1 regardless of id layout."""
    low = (
        df.select(F.col(id_col))
        .orderBy(id_col)
        .limit(k)
        .withColumn(
            "cluster_id",
            F.row_number().over(Window.orderBy(id_col)) - 1,
        )
    )
    return vectors_long(
        df.join(F.broadcast(low.select(id_col)), id_col, "left_semi"),
        vec_col,
        id_col,
    ).join(F.broadcast(low), id_col).select(
        F.col("cluster_id").cast("int").alias("cluster_id"),
        "dim",
        F.col("x").alias("cx"),
    )


def _kmeans_core(
    df: DataFrame, vec_col: str, id_col: str, k: int, iters: int
) -> tuple[DataFrame, DataFrame]:
    """(checkpointed long vectors, final centroids) after ``iters``
    Lloyd rounds from the deterministic seed. Empty clusters keep
    their previous centroid (no reseeding — deterministic)."""
    emb = vectors_long(df, vec_col, id_col)
    emb = emb.localCheckpoint(eager=False)
    cents = seed_centroids(df, vec_col, id_col, k)
    for _ in range(iters):
        assign = _assign(emb, cents, id_col)
        new_cents = (
            emb.join(assign.select(id_col, "cluster_id"), id_col)
            .groupBy("cluster_id", "dim")
            .agg(F.avg("x").alias("cx"))
        )
        # carry forward centroids whose cluster emptied
        cents = new_cents.unionByName(
            cents.join(
                new_cents.select("cluster_id").distinct(),
                "cluster_id",
                "left_anti",
            )
        ).localCheckpoint(eager=False)
    return emb, cents


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Final CENTROID table (cluster_id, dim, cx) — the reusable model
    artifact: persist it, assign future batches against it without
    re-touching the training vectors (llm/ann_index.py does exactly
    that)."""
    return _kmeans_core(df, vec_col, id_col, k, iters)[1]


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """``iters`` Lloyd rounds from the deterministic seed; returns the
    final assignment (id, cluster_id, dist2)."""
    emb, cents = _kmeans_core(df, vec_col, id_col, k, iters)
    return _assign(emb, cents, id_col)


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    look for near-duplicates ONLY within a cluster — the cluster
    assignment is the blocking structure that removes the O(N²)
    all-pairs scan. Returns one row per duplicate
    ``(dup_id, kept_id, cos)`` where ``kept_id`` is the LOWEST id
    whose within-cluster cosine with ``dup_id`` clears ``threshold``
    (deterministic keeper rule, same convention as
    llm/dedup.py:duplicate_clusters).

    Scale shape: candidates are Σ_c |c|² instead of N², and k is the
    lever that bounds |c| as the corpus grows — at 100 TB raise k so
    clusters stay ~10³-10⁴ vectors: the per-cluster cosine matrix is
    |c|² doubles (10⁴ → 800 MB, the executor ceiling; beyond that,
    split the cluster into the half-matrix blocks of
    llm/similarity.py:blocked_cosine_pairs_above). No vector crosses
    the shuffle more than twice (once for assignment, once into its
    cluster's Arrow batch).

    Determinism: clustering is the RNG-free Lloyd trajectory of
    :func:`kmeans_lloyd`, so the DuckDB oracle replays assignment AND
    pair generation exactly (float64 GEMM cosines agree with the
    oracle's per-pair fold at the 6-dp output rounding — the same
    contract ann_cosine_topk_arrow has held since round 2).

    Execution: one ``applyInPandas`` per cluster — the whole
    |c|×|c| cosine matrix is ONE BLAS call (the dedup_embedding_blocked
    pattern, with the cluster as the natural block), emitting only the
    ≥ threshold hits. A row-per-pair JVM-fold version of the same
    semantics measured 7.5 s at sf0.1; this runs the identical answer
    in well under a second because the pair loop never leaves the GEMM.
    """
    import numpy as np
    import pandas as pd

    assign = kmeans_lloyd(df, vec_col, id_col, k=k, iters=iters).select(
        id_col, "cluster_id"
    )
    vecs = assign.join(df.select(id_col, vec_col), id_col).select(
        "cluster_id", F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )

    thr = float(threshold)

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        ids = pdf["_id"].to_numpy()
        M = np.vstack(pdf["_v"].to_numpy()).astype("float64")
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = np.inf  # zero vectors match nothing
        U = M / norms[:, None]
        S = U @ U.T
        # upper triangle (a < b in id order because rows are id-sorted)
        hit_a, hit_b = np.where(np.triu(S >= thr, k=1))
        if len(hit_a) == 0:
            return pd.DataFrame(
                {"dup_id": ids[:0], "kept_id": ids[:0], "cos": np.array([])}
            )
        # lowest keeper per dup: first occurrence after sorting by (b, a)
        order = np.lexsort((hit_a, hit_b))
        hit_a, hit_b = hit_a[order], hit_b[order]
        first = np.ones(len(hit_b), dtype=bool)
        first[1:] = hit_b[1:] != hit_b[:-1]
        a_sel, b_sel = hit_a[first], hit_b[first]
        return pd.DataFrame(
            {
                "dup_id": ids[b_sel],
                "kept_id": ids[a_sel],
                "cos": S[a_sel, b_sel],
            }
        )

    return vecs.groupBy("cluster_id").applyInPandas(
        cluster_pairs, "dup_id BIGINT, kept_id BIGINT, cos DOUBLE"
    )
