"""Pins for product-quantization search (llm/pq.py): ADC identity on
hand-built codebooks, code invariants, determinism, and MEASURED
recall floors for both raw ADC and the shortlist→rerank pipeline
(rows-only catalog entries — these pins are their correctness gate)."""

import math

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.llm.pq import (
    pq_adc_topk,
    pq_encode,
    pq_rerank_topk,
    pq_topk,
    train_pq_codebooks,
)
from interop_datalake_spark.llm.similarity import brute_force_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def exact_top10(spark, emb):
    ex = brute_force_topk(
        emb.filter(F.col("vec_id") < 20).select("vec_id", "embedding"),
        emb.select("vec_id", "embedding"),
        "embedding",
        "vec_id",
        k=10,
    )
    return {(r.query_id, r.neighbor_id) for r in ex.collect()}


# hand-built 2-subspace codebook over 4-dim vectors: subspace
# centroids are the 2-dim unit axes, so codes and ADC scores are
# computable by hand.
_BOOKS = [[[1.0, 0.0], [0.0, 1.0]], [[1.0, 0.0], [0.0, 1.0]]]


def _frame(spark, rows):
    return spark.createDataFrame(rows, "vid long, v array<double>")


class TestADCAlgebra:
    def test_encode_picks_nearest_axis(self, spark):
        df = _frame(
            spark,
            [
                (0, [5.0, 0.0, 0.0, 5.0]),   # → codes [0, 1]
                (1, [0.0, 3.0, 3.0, 0.0]),   # → codes [1, 0]
            ],
        )
        codes = {
            r.vid: list(r.codes)
            for r in pq_encode(df, "v", "vid", _BOOKS).collect()
        }
        assert codes == {0: [0, 1], 1: [1, 0]}

    def test_adc_score_exact_on_centroid_vector(self, spark):
        """A corpus vector that IS a concatenation of centroids scores
        exactly dot(q_normalized, that concatenation)."""
        corpus = _frame(spark, [(1, [1.0, 0.0, 0.0, 1.0])])  # codes [0,1]
        queries = _frame(spark, [(0, [2.0, 0.0, 0.0, 0.0])])
        codes = pq_encode(corpus, "v", "vid", _BOOKS)
        rows = pq_adc_topk(queries, codes, "v", "vid", _BOOKS, k=1).collect()
        assert len(rows) == 1
        # q normalizes to [1,0,0,0]; decoded corpus = [1,0,0,1];
        # ADC = dot = 1.0 exactly
        assert rows[0].score_pq == pytest.approx(1.0, abs=1e-12)

    def test_self_match_excluded(self, spark):
        df = _frame(spark, [(0, [1.0, 0.0, 0.0, 1.0])])
        codes = pq_encode(df, "v", "vid", _BOOKS)
        assert pq_adc_topk(df, codes, "v", "vid", _BOOKS, k=3).count() == 0

    def test_external_query_id_space_keeps_colliding_neighbor(
        self, spark
    ):
        """exclude_self=False is the external-id-space contract: a
        corpus doc whose id equals a query id must NOT be silently
        dropped (round-8 advice)."""
        corpus = _frame(spark, [(0, [1.0, 0.0, 0.0, 1.0])])
        queries = _frame(spark, [(0, [2.0, 0.0, 0.0, 0.0])])
        codes = pq_encode(corpus, "v", "vid", _BOOKS)
        rows = pq_adc_topk(
            queries, codes, "v", "vid", _BOOKS, k=1, exclude_self=False
        ).collect()
        assert [(r.query_id, r.neighbor_id) for r in rows] == [(0, 0)]

    def test_zero_vector_no_crash(self, spark):
        df = _frame(
            spark, [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0, 0.0])]
        )
        codes = pq_encode(df, "v", "vid", _BOOKS)
        assert codes.count() == 2
        rows = pq_adc_topk(df, codes, "v", "vid", _BOOKS, k=1).collect()
        # zero query scores 0 against everything but must not be NULL
        for r in rows:
            assert r.score_pq is not None and not math.isnan(r.score_pq)


class TestTrainedInvariants:
    def test_codes_shape_and_range(self, emb):
        books = train_pq_codebooks(emb, "embedding", "vec_id", m=8, n_codes=16)
        assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
        codes = pq_encode(emb, "embedding", "vec_id", books).collect()
        assert len(codes) == emb.count()
        for r in codes:
            assert len(r.codes) == 8
            assert all(0 <= c < 16 for c in r.codes)

    def test_training_deterministic(self, emb):
        b1 = train_pq_codebooks(emb, "embedding", "vec_id")
        b2 = train_pq_codebooks(emb, "embedding", "vec_id")
        assert b1 == b2

    def test_search_deterministic(self, emb):
        r1 = sorted(
            map(
                tuple,
                pq_topk(
                    emb, "embedding", "vec_id", k=10,
                    query_filter=F.col("vec_id") < 20,
                ).collect(),
            )
        )
        r2 = sorted(
            map(
                tuple,
                pq_topk(
                    emb, "embedding", "vec_id", k=10,
                    query_filter=F.col("vec_id") < 20,
                ).collect(),
            )
        )
        assert r1 == r2


class TestRecall:
    """Measured on the sf0.01 corpus (near-uniform unit sphere — the
    hardest regime for any quantizer): raw ADC recall@10 = 0.29,
    pipeline recall@10 = 0.555 / 0.71 / 0.85 at shortlist 30/50/100.
    Floors pinned with wide margins (memory: never pin knife-edge
    booleans)."""

    def test_adc_recall_floor(self, emb, exact_top10):
        got = {
            (r.query_id, r.neighbor_id)
            for r in pq_topk(
                emb, "embedding", "vec_id", k=10,
                query_filter=F.col("vec_id") < 20,
            ).collect()
        }
        recall = len(got & exact_top10) / len(exact_top10)
        assert recall >= 0.2, recall

    def test_pipeline_recall_floor_and_lever(self, emb, exact_top10):
        def recall(shortlist):
            got = {
                (r.query_id, r.neighbor_id)
                for r in pq_rerank_topk(
                    emb, "embedding", "vec_id", k=10, shortlist=shortlist,
                    query_filter=F.col("vec_id") < 20,
                ).collect()
            }
            return len(got & exact_top10) / len(exact_top10)

        r50 = recall(50)
        assert r50 >= 0.6, r50
        # the shortlist is a monotone recall lever (0.555 → 0.85
        # measured); demand a real gap, not just non-decrease
        r30, r100 = recall(30), recall(100)
        assert r100 >= r30 + 0.1, (r30, r100)

    def test_rerank_scores_are_exact_cosine(self, emb):
        """Stage-2 scores must equal the exact float cosine for the
        (query, neighbor) pairs it returns — the rerank is NOT an
        approximation."""
        rows = pq_rerank_topk(
            emb, "embedding", "vec_id", k=5, shortlist=50,
            query_filter=F.col("vec_id") < 5,
        ).collect()
        # fetch exactly the vectors the result references — sf-independent
        ids = {r.query_id for r in rows} | {r.neighbor_id for r in rows}
        vecs = {
            r.vec_id: list(r.embedding)
            for r in emb.filter(F.col("vec_id").isin(list(ids))).collect()
        }

        def cos(a, b):
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return dot / (na * nb)

        for r in rows:
            expect = cos(vecs[r.query_id], vecs[r.neighbor_id])
            assert r.cos == pytest.approx(expect, abs=1e-9)
