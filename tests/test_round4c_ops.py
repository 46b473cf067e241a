"""Unit tests for the round-4 continuation-2 operators: degree-oriented
triangle counting, count-min heavy hitters, weighted sampling (A-ES),
and positional phrase search — edge semantics the sf0.01 oracle runs
can't isolate (planted graphs, repeated phrase terms, empty inputs,
weighting direction, determinism under repartitioning).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.catalog.graph_ops import triangle_counts
from interop_datalake_spark.catalog.sampling import corpus_sample_weighted
from interop_datalake_spark.llm.search import phrase_search


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u BIGINT, v BIGINT")


class TestTriangleCounts:
    def test_planted_k4_plus_pendant(self, spark):
        # K4 on {1,2,3,4} has C(4,3)=4 triangles, each node in 3 of
        # them; pendant edge 4-5 adds no triangle and node 5 must be
        # absent from the result.
        k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        out = triangle_counts(_edges(spark, k4 + [(4, 5)])).collect()
        got = {r["user_id"]: r["n_triangles"] for r in out}
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_triangle_counted_once_regardless_of_orientation(self, spark):
        # single triangle with a hub (node 1 also touches 4,5,6 —
        # degree skew): still exactly one triangle, each corner once.
        pairs = [(1, 2), (1, 3), (2, 3), (1, 4), (1, 5), (1, 6)]
        out = triangle_counts(_edges(spark, pairs)).collect()
        got = {r["user_id"]: r["n_triangles"] for r in out}
        assert got == {1: 1, 2: 1, 3: 1}

    def test_triangle_free_graph_empty(self, spark):
        # a path and a 4-cycle: no triangles at all
        pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 13), (10, 13)]
        assert triangle_counts(_edges(spark, pairs)).count() == 0


class TestPhraseSearch:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    def test_basic_match_and_position(self, spark):
        docs = self._docs(spark, [(1, "x slow hash batch y"), (2, "slow batch hash")])
        out = {r["doc_id"]: (r["n_occurrences"], r["first_pos"])
               for r in phrase_search(docs, "text", "doc_id",
                                      ["slow", "hash", "batch"]).collect()}
        assert out == {1: (1, 1)}  # doc 2 has the terms but not the order

    def test_multi_occurrence_and_case(self, spark):
        docs = self._docs(spark, [(1, "Slow Hash batch z slow hash BATCH")])
        out = phrase_search(docs, "text", "doc_id",
                            ["SLOW", "hash", "Batch"]).collect()
        assert out[0]["n_occurrences"] == 2 and out[0]["first_pos"] == 0

    def test_repeated_phrase_term(self, spark):
        # 'a a' in 'a a a' overlaps: anchors 0 and 1 both match
        docs = self._docs(spark, [(1, "a a a"), (2, "a b a")])
        out = {r["doc_id"]: r["n_occurrences"]
               for r in phrase_search(docs, "text", "doc_id", ["a", "a"]).collect()}
        assert out == {1: 2}

    def test_empty_phrase_short_circuits(self, spark):
        docs = self._docs(spark, [(1, "a b c")])
        out = phrase_search(docs, "text", "doc_id", [])
        assert out.count() == 0
        assert out.columns == ["doc_id", "n_occurrences", "first_pos"]


class TestWeightedSample:
    def test_weighting_skews_toward_long_docs(self, spark, sf_dir):
        # weight ∝ n_chars: the k=50 winners must be longer on average
        # than the corpus (deterministic given the data, so a hard
        # assert, not a flaky statistical one).
        sample = corpus_sample_weighted(spark, sf_dir)
        s_mean = sample.agg(F.avg("n_chars")).collect()[0][0]
        docs_mean = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .agg(F.avg("n_chars"))
            .collect()[0][0]
        )
        assert s_mean > docs_mean

    def test_sample_is_partitioning_invariant(self, spark, sf_dir):
        ids1 = sorted(
            r["doc_id"] for r in corpus_sample_weighted(spark, sf_dir).collect()
        )
        # the SAME canonical key expression over a repartitioned scan
        # must pick the identical winners (content-hash keys, not RNG
        # state)
        from interop_datalake_spark.catalog.sampling import race_key

        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(13)
        )
        ids2 = sorted(
            r["doc_id"]
            for r in docs.select("doc_id", race_key().alias("k"))
            .orderBy("k", "doc_id")
            .limit(50)
            .collect()
        )
        assert ids1 == ids2


class TestContainmentPairs:
    def test_planted_quote_caught_by_containment_not_jaccard(self, spark):
        from interop_datalake_spark.llm.dedup import (
            containment_pairs,
            minhash_lsh_dedup,
        )

        long_words = [f"w{i}" for i in range(100)]
        quote = long_words[40:60]  # 20-word verbatim excerpt
        docs = spark.createDataFrame(
            [
                (1, " ".join(long_words)),
                (2, " ".join(quote)),
                (3, " ".join(f"z{i}" for i in range(50))),
            ],
            "doc_id BIGINT, text STRING",
        )
        cp = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in containment_pairs(
                docs, "text", "doc_id", k=5, threshold=0.8
            ).collect()
        }
        # the excerpt's 16 shingles all occur in doc 1: containment 1.0
        assert cp == {(1, 2): 1.0}
        # Jaccard for the same pair is 16/96 ≈ 0.17 — the LSH pipeline
        # (correctly, per its own semantics) reports nothing
        jp = minhash_lsh_dedup(
            docs, "text", "doc_id", k=5, num_hashes=16, rows_per_band=4,
            threshold=0.8,
        ).collect()
        assert jp == []

    def test_xxhash64_path_identical_pairs(self, spark, sf_dir):
        from interop_datalake_spark.llm.dedup import containment_pairs

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

        def pairs(hash_name):
            return sorted(
                (r["id_a"], r["id_b"], r["n_inter"])
                for r in containment_pairs(
                    docs, "text", "doc_id", hash_name=hash_name
                ).collect()
            )

        assert pairs(None) == pairs("xxhash64")

    def test_boilerplate_capped_before_join(self, spark):
        from interop_datalake_spark.llm.dedup import containment_pairs

        # 12 docs sharing ONLY a 6-word footer: with max_shingle_freq
        # below 12 the shared shingles are dropped pre-join and no
        # boilerplate-only pair can reach the threshold
        footer = "common footer text shared by all"
        docs = spark.createDataFrame(
            [(i, f"unique{i} body{i} words{i} here{i} {footer}") for i in range(12)],
            "doc_id BIGINT, text STRING",
        )
        out = containment_pairs(
            docs, "text", "doc_id", k=5, threshold=0.8, max_shingle_freq=10
        ).collect()
        assert out == []


class TestHeavyHitters:
    def test_cms_never_undercounts(self, spark, sf_dir):
        from interop_datalake_spark.catalog.events_analytics import (
            events_heavy_hitters,
        )

        rows = events_heavy_hitters(spark, sf_dir).collect()
        assert rows, "threshold should catch a non-empty upper tail"
        assert all(r["no_undercount"] for r in rows)
        assert all(r["est_n"] >= r["exact_n"] for r in rows)
