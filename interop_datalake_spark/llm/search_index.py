"""Persisted incremental BM25 inverted index over TxnTables — the
lexical sibling of llm/ann_index.py's IVF store: ingest tokenizes the
NEW batch only (zero rescans of indexed documents), queries read the
query terms' postings only (term-pruned file resolution), and the
scoring expression is byte-for-byte the one-shot path's
(llm/search.py:score_bm25_stats), so "index built incrementally ≡
BM25 over the whole corpus" is provable, not aspirational — the
catalog query reuses search_bm25's DuckDB oracle verbatim.

Layout:
- ``<name>_postings`` (term, doc_id, tf): range-partitioned and
  sorted by term at every write, so per-file term min/max stats are
  narrow and a query's per-term point-range file resolution
  (lake/ivm_join.py:resolve_key_files — the shared pruning loop)
  opens a small file subset. At 100 TB this is the sharded posting
  list every search engine stores; appends create new term-sorted
  segments and ``postings.compact(sort_by=["term"])`` is the segment
  merge.
- ``<name>_doclens`` (doc_id, dl): the length-normalization table,
  one narrow row per document.

Global statistics (df, N, avgdl) are NOT materialized: df derives
from the queried terms' postings (exact after any number of appends —
pruning keeps every posting of a queried term) and N/avgdl from one
aggregate over doclens — always current, no stale-scalar invalidation
problem.

Consistency: the two tables commit independently (postings first). A
crash between the commits leaves postings for documents missing from
doclens; ``query`` joins ON doclens, so half-indexed documents are
invisible rather than mis-normalized. Recovery: pass a monotone
``_epoch`` per ingest batch (build/append) — both commits then ride
TxnTable ``append_epoch``, so a re-run after ANY crash point is
exactly-once (the postings replay no-ops, the doclens commit
applies). A bare re-run WITHOUT an epoch would double-append the
batch's postings and skew every score — refused nowhere, documented
here, which is why streamed ingest (the dedup_stream_pipeline shape)
should always forward its foreachBatch epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from interop_datalake_spark.lake.ivm_join import resolve_key_files
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.llm.search import (
    score_bm25_stats,
    tokenize_words,
)


class BM25Index:
    def __init__(self, session, name: str, shards: int = 4):
        self.postings = TxnTable(
            session, f"{name}_postings", stats_cols=["term"]
        )
        self.doclens = TxnTable(
            session, f"{name}_doclens", stats_cols=["doc_id"]
        )
        self.shards = shards
        #: files the last query's term resolution opened (pruning
        #: observability, like ivm_join.last_snapshot_scan_files)
        self.last_query_scan_files: list[str] | None = None

    def _index_batch(
        self, docs: DataFrame, text_col: str, id_col: str,
        _epoch: int | None,
    ):
        postings = tokenize_words(docs, text_col, id_col)
        tf = postings.groupBy(id_col, "term").agg(
            F.count("*").alias("tf")
        )
        dl = postings.groupBy(id_col).agg(F.count("*").alias("dl"))
        # term-sorted segments: disjoint per-file term ranges are what
        # make the query-time per-term file resolution prune
        tf_sorted = tf.repartitionByRange(
            self.shards, "term"
        ).sortWithinPartitions("term")
        p = tf_sorted.select("term", F.col(id_col), "tf")
        d = dl.select(F.col(id_col), "dl")
        if _epoch is not None:
            # exactly-once: a crash-replayed batch no-ops the commit(s)
            # that already landed and applies the missing one
            self.postings.append_epoch(p, _epoch)
            self.doclens.append_epoch(d, _epoch)
        else:
            self.postings.append(p)
            self.doclens.append(d)

    def build(
        self, docs: DataFrame, text_col: str, id_col: str,
        _epoch: int | None = None,
    ) -> None:
        """Index an initial corpus. Tokenization reads ``docs`` once;
        nothing else is scanned. Pass ``_epoch`` for crash-replayable
        exactly-once ingest (module docstring)."""
        self._index_batch(docs, text_col, id_col, _epoch)

    def append(
        self, docs: DataFrame, text_col: str, id_col: str,
        _epoch: int | None = None,
    ) -> None:
        """Index a NEW batch: tokenizes the batch only — the already-
        indexed postings/doclens files are never read or rewritten
        (pinned: the pre-append file sets are untouched). Documents
        must be new ids; re-indexing an existing doc would double its
        postings (callers dedupe upstream, same contract as
        ann_index_incremental). Pass a monotone ``_epoch`` per batch
        for exactly-once replay."""
        self._index_batch(docs, text_col, id_col, _epoch)

    def compact(self) -> None:
        """Segment merge: re-sort all postings into term-disjoint
        files (TxnTable sort-clustered compaction)."""
        self.postings.compact(sort_by=["term"])

    def query(
        self,
        query_terms: list[str],
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """(id, n_hit_terms, score) for documents matching ≥1 term —
        the postings scan is file-pruned to the query terms
        (``last_query_scan_files`` records what was opened)."""
        terms = sorted({t.lower() for t in query_terms})
        # the id column is whatever the doclens table records — a
        # fresh process attaching to a persisted index needs no
        # constructor state
        st = self.doclens.table_schema()
        id_col = st.fields[0].name if st is not None else "doc_id"
        if not terms:
            return self.doclens.spark.createDataFrame(
                [], f"{id_col} BIGINT, n_hit_terms BIGINT, score DOUBLE"
            )
        m = self.postings.manifest(self.postings.current_version())
        files = resolve_key_files(self.postings, None, "term", terms)
        self.last_query_scan_files = files
        if not files:
            return self.doclens.spark.createDataFrame(
                [], f"{id_col} BIGINT, n_hit_terms BIGINT, score DOUBLE"
            )
        tf = (
            self.postings._load_files(files, m)
            .filter(F.col("term").isin(terms))
        )
        return score_bm25_stats(
            tf, self.doclens.read(), id_col, terms, k1, b
        )
