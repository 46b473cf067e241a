"""ADVICE r3 items: bm25 duplicate-term/empty-query handling,
seed_centroids sparse-id robustness. Full-pipeline DuckDB parity for
kmeans_lloyd and bm25_scores runs in test_oracle_parity
(cluster_kmeans / search_bm25)."""

import math

from pyspark.sql import functions as F

from interop_datalake_spark.llm.clustering import (
    kmeans_assign,
    kmeans_lloyd,
    seed_centroids,
)
from interop_datalake_spark.llm.search import bm25_scores


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana banana banana"),
            (3, "cherry plum"),
        ],
        "doc_id LONG, text STRING",
    )


def test_bm25_duplicate_query_terms_do_not_double_count(spark):
    docs = _docs(spark)
    once = {
        r["doc_id"]: (r["n_hit_terms"], r["score"])
        for r in bm25_scores(docs, "text", "doc_id", ["apple"]).collect()
    }
    twice = {
        r["doc_id"]: (r["n_hit_terms"], r["score"])
        for r in bm25_scores(docs, "text", "doc_id", ["apple", "APPLE", "apple"]).collect()
    }
    assert once == twice
    assert once[1][0] == 1  # one hit term, counted once


def test_bm25_empty_query_returns_empty_with_schema(spark):
    out = bm25_scores(_docs(spark), "text", "doc_id", [])
    assert out.columns == ["doc_id", "n_hit_terms", "score"]
    assert out.count() == 0


def test_bm25_known_value_on_tiny_corpus(spark):
    # term 'apple': df=1 of N=3 docs, doc 1 tf=2, dl=4, avgdl=3
    out = bm25_scores(_docs(spark), "text", "doc_id", ["apple"]).collect()
    assert len(out) == 1
    row = out[0]
    idf = math.log(1.0 + (3 - 1 + 0.5) / (1 + 0.5))
    tfn = (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 4 / 3))
    assert row["doc_id"] == 1 and row["n_hit_terms"] == 1
    assert math.isclose(row["score"], idf * tfn, rel_tol=1e-12)


def _sparse_vectors(spark):
    # ids deliberately sparse and non-contiguous (ADVICE: filter id < k
    # silently under-seeded here)
    rows = [
        (100, [0.0, 0.0]),
        (205, [1.0, 0.0]),
        (310, [10.0, 10.0]),
        (999, [10.5, 10.0]),
        (1204, [0.2, 0.1]),
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_seed_centroids_handles_sparse_ids(spark):
    cents = seed_centroids(_sparse_vectors(spark), "embedding", "vec_id", k=3)
    rows = cents.collect()
    assert len(rows) == 3 * 2  # k centroids x dim rows — never fewer
    assert {r["cluster_id"] for r in rows} == {0, 1, 2}  # dense relabel
    # centroid 0 is the LOWEST id (100), centroid 2 the third (310)
    c0 = {r["dim"]: r["cx"] for r in rows if r["cluster_id"] == 0}
    c2 = {r["dim"]: r["cx"] for r in rows if r["cluster_id"] == 2}
    assert c0 == {1: 0.0, 2: 0.0}
    assert c2 == {1: 10.0, 2: 10.0}


def test_kmeans_lloyd_sparse_ids_assigns_everything(spark):
    vecs = _sparse_vectors(spark)
    out = kmeans_lloyd(vecs, "embedding", "vec_id", k=2, iters=2)
    labels = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    assert set(labels) == {100, 205, 310, 999, 1204}
    # the two far points co-cluster, the three near-origin points too
    assert labels[310] == labels[999]
    assert labels[100] == labels[205] == labels[1204]
    assert labels[100] != labels[310]


def test_kmeans_assign_is_deterministic(spark, sf_dir):
    from interop_datalake_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    cents = seed_centroids(emb, "embedding", "vec_id", k=4)
    a = sorted(
        (r["vec_id"], r["cluster_id"])
        for r in kmeans_assign(emb, "embedding", "vec_id", cents).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster_id"])
        for r in kmeans_assign(emb, "embedding", "vec_id", cents).collect()
    )
    assert a == b and len(a) == 50
