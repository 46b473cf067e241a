"""Persisted LSH signature store (llm/dedup.py:incremental_lsh_dedup):
the incremental run must read the corpus side from the TxnTable store
(never re-shingle corpus text), produce the same pairs as a full
recompute, and compose across successive daily batches."""

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.llm.dedup import (
    incremental_candidates,
    incremental_lsh_dedup,
    lsh_sign_bands,
    minhash_lsh_dedup,
)
from interop_datalake_spark.plans.inspect import explain_str
from interop_datalake_spark.session import DatalakeSession
from interop_datalake_spark.sources.tables import load_table

CUTOFF = 450


@pytest.fixture()
def store(spark, tmp_path):
    session = DatalakeSession(lake_root=str(tmp_path / "lake"), spark=spark)
    return TxnTable(session, "lsh_signatures", stats_cols=["doc_id"])


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_candidate_join_scans_the_store_not_document_text(spark, sf_dir, store):
    """The O(new batch) claim, pinned on the physical plan: after the
    new batch's bands are appended (the one signing job), BOTH sides
    of the candidate join read back from the signature store — the
    candidate plan contains store scans and ZERO document scans."""
    docs = _docs(spark, sf_dir)
    store.append(lsh_sign_bands(docs.filter(F.col("doc_id") < CUTOFF), "text", "doc_id"))

    base = store.current_version()
    new_version = store.append(
        lsh_sign_bands(docs.filter(F.col("doc_id") >= CUTOFF), "text", "doc_id")
    )
    cand = incremental_candidates(
        store.read(version=new_version).select("doc_id", "band", "band_key"),
        store.read_changes(base, new_version).select("doc_id", "band", "band_key"),
        "doc_id",
    )
    plan = explain_str(cand)
    assert str(store.root) in plan, "candidate sides must read the store table"
    assert "documents.parquet" not in plan, (
        "candidate generation must not rescan document text"
    )


def test_signing_scan_pushes_the_new_batch_filter(spark, sf_dir):
    """The one raw-text scan (the signing job) reads only the new
    batch: the cutoff predicate reaches the parquet reader."""
    docs = _docs(spark, sf_dir)
    bands_new = lsh_sign_bands(
        docs.filter(F.col("doc_id") >= CUTOFF), "text", "doc_id"
    )
    plan = explain_str(bands_new).replace(" ", "")
    assert "GreaterThanOrEqual(doc_id,450)" in plan


def test_incremental_pairs_match_full_recompute(spark, sf_dir, store):
    docs = _docs(spark, sf_dir)
    store.append(lsh_sign_bands(docs.filter(F.col("doc_id") < CUTOFF), "text", "doc_id"))
    inc = incremental_lsh_dedup(
        store, docs, "text", "doc_id", F.col("doc_id") >= CUTOFF
    )
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6)) for r in inc.collect()
    }
    full = minhash_lsh_dedup(docs, "text", "doc_id")
    want = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in full.collect()
        if r["id_a"] >= CUTOFF or r["id_b"] >= CUTOFF
    }
    assert got == want
    # the run appended the new batch's bands: next day's corpus side
    assert store.current_version() == 2
    assert [h["op"] for h in store.history()] == ["append", "append"]


def test_concurrent_batch_during_signing_is_not_reemitted(
    spark, sf_dir, store, monkeypatch
):
    """A concurrent daily batch landing in the store between our
    snapshot resolution and our append must NOT be treated as this
    run's news: its corpus pairs belong to its own run. Our run still
    emits pairs against it (it is in our bands_all snapshot), so
    cross-batch pairs land exactly once — in the run that committed
    second. (Code-review regression: the change window must be
    (new_version-1, new_version], never (pre-append, new_version].)"""
    docs = _docs(spark, sf_dir)
    store.append(lsh_sign_bands(docs.filter(F.col("doc_id") < CUTOFF), "text", "doc_id"))
    other_bands = lsh_sign_bands(
        docs.filter((F.col("doc_id") >= 450) & (F.col("doc_id") < 460)),
        "text",
        "doc_id",
    )

    orig = TxnTable.append
    state = {"injected": False}

    def racing_append(self, df):
        if not state["injected"]:
            state["injected"] = True
            orig(self, other_bands)  # the concurrent batch lands first
        return orig(self, df)

    monkeypatch.setattr(TxnTable, "append", racing_append)
    inc = incremental_lsh_dedup(
        store, docs, "text", "doc_id", F.col("doc_id") >= 460
    )
    monkeypatch.undo()

    got = {(r["id_a"], r["id_b"]) for r in inc.collect()}
    full = minhash_lsh_dedup(docs, "text", "doc_id")
    want = {
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_a"] >= 460 or r["id_b"] >= 460
    }
    # exactly the pairs with ≥1 side in OUR batch: includes the
    # ours-vs-concurrent pair (458,462), excludes the concurrent
    # batch's own corpus pairs (26,455), (92,450), (326,457)
    assert got == want
    assert (458, 462) in got
    assert not {(26, 455), (92, 450), (326, 457)} & got


def test_successive_batches_compose_through_the_store(spark, sf_dir, store):
    """Day 1 ingests [450, 475), day 2 ingests [475, ∞): day 2's
    corpus side (the store) must already contain day 1's signatures,
    so day-2 pairs equal the full recompute's pairs with ≥1 side in
    day 2 — including day2×day1 pairs that no single run computed
    from raw text together."""
    docs = _docs(spark, sf_dir)
    day1 = (F.col("doc_id") >= CUTOFF) & (F.col("doc_id") < 475)
    day2 = F.col("doc_id") >= 475
    store.append(lsh_sign_bands(docs.filter(F.col("doc_id") < CUTOFF), "text", "doc_id"))
    incremental_lsh_dedup(store, docs, "text", "doc_id", day1).collect()
    got = {
        (r["id_a"], r["id_b"])
        for r in incremental_lsh_dedup(store, docs, "text", "doc_id", day2).collect()
    }
    full = minhash_lsh_dedup(docs, "text", "doc_id")
    want = {
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_a"] >= 475 or r["id_b"] >= 475
    }
    assert got == want
    assert store.current_version() == 3


def test_steady_state_entry_is_result_idempotent_across_runs(spark, sf_dir):
    """dedup_incremental_steady re-runs against the SAME persisted
    store (bench.py min-of-2, the daily-run measurement): every run
    RESTOREs the store to the corpus-seed snapshot first (ADVICE
    round 5), so the data the candidate join scans is constant-size
    run-to-run — and the verified output is identical."""
    from interop_datalake_spark.catalog.llm_ops import (
        _STEADY_STORE_ROOTS,
        dedup_incremental_steady,
    )
    from interop_datalake_spark.lake.txn import TxnTable
    from interop_datalake_spark.session import DatalakeSession

    first = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup_incremental_steady(spark, sf_dir).collect()
    )
    second = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup_incremental_steady(spark, sf_dir).collect()
    )
    assert first == second and len(first) > 0
    # the store's LATEST snapshot row count equals seed + one batch —
    # not seed + N batches — no matter how many runs happened
    store = TxnTable(
        DatalakeSession(
            lake_root=_STEADY_STORE_ROOTS[str(sf_dir)], spark=spark
        ),
        "lsh_signatures",
    )
    latest = store.read().count()
    seed = store.read(version=1).count()
    one_batch = store.read_changes(1, 2).count()
    assert latest == seed + one_batch
