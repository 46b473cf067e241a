"""readStream source over the TxnTable change feed (Spark 4 Python
DataSource API): schema inference from the log, typed partition-column
injection, offset = manifest version, exactly-once resume across
restarts, and the closed sink→source streaming loop."""

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession
from interop_datalake_spark.streaming.txn_source import read_txn_stream

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture()
def session(spark, tmp_path):
    return DatalakeSession(lake_root=str(tmp_path / "lake"), spark=spark)


def _drain(session, table, ckpt, sink_rows):
    q = (
        read_txn_stream(session, table)
        .writeStream.foreachBatch(
            lambda bdf, eid: sink_rows.extend(bdf.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_source_tails_commits_and_resumes(session, spark, tmp_path):
    t = TxnTable(session, "cdc", partition_cols=["tenant"])
    t.append(spark.createDataFrame(
        [("tA", 1, "a"), ("tB", 2, "b")], "tenant STRING, k INT, v STRING"
    ))
    t.append(spark.createDataFrame(
        [("tA", 3, "c")], "tenant STRING, k INT, v STRING"
    ))

    got: list = []
    ckpt = str(tmp_path / "ckpt")
    _drain(session, "cdc", ckpt, got)
    # schema: data cols + typed partition col + _commit_version
    assert {(r["tenant"], r["k"], r["_commit_version"]) for r in got} == {
        ("tA", 1, 1), ("tB", 2, 1), ("tA", 3, 2)
    }

    # new commit, SAME checkpoint → resume delivers only the delta
    t.append(spark.createDataFrame(
        [("tB", 4, "d")], "tenant STRING, k INT, v STRING"
    ))
    got2: list = []
    _drain(session, "cdc", ckpt, got2)
    assert {(r["tenant"], r["k"], r["_commit_version"]) for r in got2} == {
        ("tB", 4, 3)
    }

    # replaying the drained checkpoint again delivers nothing
    got3: list = []
    _drain(session, "cdc", ckpt, got3)
    assert got3 == []


def test_stream_source_starting_version(session, spark):
    t = TxnTable(session, "cdc_sv")
    t.append(spark.createDataFrame([(1, "a")], "k INT, v STRING"))
    t.append(spark.createDataFrame([(2, "b")], "k INT, v STRING"))
    rows: list = []
    q = (
        read_txn_stream(session, "cdc_sv", starting_version=1)
        .writeStream.foreachBatch(lambda b, e: rows.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {(r["k"], r["_commit_version"]) for r in rows} == {(2, 2)}


def test_sink_source_round_trip(session, spark, tmp_path):
    """The closed streaming loop: parquet stream → exactly-once
    TxnTable sink (foreach_batch_writer) → change-feed source tails
    the sink table's commits."""
    src = tmp_path / "src"
    spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING").coalesce(
        1
    ).write.parquet(str(src))
    sink_table = TxnTable(session, "loop_sink")
    q = (
        spark.readStream.schema("k INT, v STRING").parquet(str(src))
        .writeStream.foreachBatch(sink_table.foreach_batch_writer())
        .option("checkpointLocation", str(tmp_path / "in_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    tailed: list = []
    _drain(session, "loop_sink", str(tmp_path / "out_ckpt"), tailed)
    assert {(r["k"], r["v"]) for r in tailed} == {(1, "a"), (2, "b")}
    assert all(r["_commit_version"] == 1 for r in tailed)

    # second hop of the pipeline: a merge on the sink table surfaces
    # through the same feed on resume
    sink_table.merge(
        spark.createDataFrame([(2, "B")], "k INT, v STRING"), key_cols=["k"]
    )
    tailed2: list = []
    _drain(session, "loop_sink", str(tmp_path / "out_ckpt"), tailed2)
    assert {(r["k"], r["v"]) for r in tailed2} == {(1, "a"), (2, "B")}
    assert all(r["_commit_version"] == 2 for r in tailed2)


def test_source_rejects_empty_table(session):
    with pytest.raises(Exception):
        df = read_txn_stream(session, "nope")
        df.schema  # schema resolution must fail loudly, not hang


def test_max_versions_per_trigger_paces_steady_state(
    session, spark, tmp_path
):
    """Rate limiting: EVERY micro-batch — the opener included — spans
    at most max_versions_per_trigger commits (the base seeds from the
    configured start on fresh runs; streaming/pacing.py documents the
    measured call order). Pinned by gating the sink: batch 1 blocks
    while 6 commits pile up, then the backlog must drain in ≤2-commit
    hops."""
    import threading

    t = TxnTable(session, "cdc_rl")
    t.append(spark.createDataFrame([(0,)], "k INT"))  # v1

    gate = threading.Event()
    batches: list[set] = []

    def sink(bdf, eid):
        vs = {r["_commit_version"] for r in bdf.collect()}
        if vs:
            batches.append(vs)
            if len(batches) == 1:
                gate.wait(60)  # hold batch 1 open while backlog builds

    q = (
        read_txn_stream(session, "cdc_rl", max_versions_per_trigger=2)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_rl"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        import time

        # wait until batch 1 (just v1) is IN the gated sink before
        # building the backlog — otherwise a slow first trigger could
        # absorb two of the appends into the opener's 2-commit hop
        # (race)
        deadline = time.time() + 60
        while time.time() < deadline and not batches:
            time.sleep(0.1)
        assert batches and batches[0] == {1}, batches
        for k in range(1, 7):  # v2..v7 while batch 1 is gated
            t.append(spark.createDataFrame([(k,)], "k INT"))
        gate.set()

        deadline = time.time() + 90
        while time.time() < deadline:
            if set().union(*batches) == {1, 2, 3, 4, 5, 6, 7}:
                break
            time.sleep(0.3)
    finally:
        q.stop()
    assert set().union(*batches) == {1, 2, 3, 4, 5, 6, 7}, batches
    # EVERY batch — the opener included — spans ≤ 2 commits
    assert all(len(b) <= 2 for b in batches), batches
    assert any(len(b) == 2 for b in batches[1:]), (
        "backlog should drain in 2-commit hops",
        batches,
    )
