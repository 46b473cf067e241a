"""Transactional table layer (lake/txn.py): ACID commits, snapshot
isolation, time travel, conflict detection, crash atomicity, vacuum."""

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.txn import CommitConflictError, TxnTable
from interop_datalake_spark.session import DatalakeSession


@pytest.fixture()
def session(spark, tmp_path):
    return DatalakeSession(lake_root=str(tmp_path / "lake"), spark=spark)


@pytest.fixture()
def table(session):
    return TxnTable(session, "txn_demo")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k INT, v STRING")


def _snapshot(table):
    return {(r["k"], r["v"]) for r in table.read().collect()}


def test_append_and_read_roundtrip(table, spark):
    assert table.current_version() == 0
    v1 = table.append(_df(spark, [(1, "a"), (2, "b")]))
    v2 = table.append(_df(spark, [(3, "c")]))
    assert (v1, v2) == (1, 2)
    assert _snapshot(table) == {(1, "a"), (2, "b"), (3, "c")}
    assert table.manifest()["rows"] == 3


def test_merge_is_atomic_upsert_across_files(table, spark):
    table.append(_df(spark, [(1, "a"), (2, "b")]))
    table.append(_df(spark, [(3, "c")]))  # second file set
    table.merge(_df(spark, [(2, "B"), (4, "d")]), key_cols=["k"])
    assert _snapshot(table) == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_delete_where(table, spark):
    table.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    table.delete_where(F.col("k") == 2)
    assert _snapshot(table) == {(1, "a"), (3, "c")}


def test_time_travel_and_snapshot_isolation(table, spark):
    table.append(_df(spark, [(1, "a")]))
    old = table.read(version=1)  # resolve files at v1
    table.overwrite(_df(spark, [(9, "z")]))
    # the already-resolved frame still reads v1's immutable files
    assert {(r["k"], r["v"]) for r in old.collect()} == {(1, "a")}
    # and explicit time travel sees each version
    assert {(r["k"], r["v"]) for r in table.read(version=1).collect()} == {(1, "a")}
    assert _snapshot(table) == {(9, "z")}


def test_crash_before_pointer_swap_is_invisible(table, spark, monkeypatch):
    table.append(_df(spark, [(1, "a")]))

    import os as _os
    real_replace = _os.replace

    def exploding_replace(src, dst):
        raise RuntimeError("injected crash at the commit point")

    monkeypatch.setattr("interop_datalake_spark.lake.txn.os.replace", exploding_replace)
    with pytest.raises(RuntimeError, match="injected"):
        table.overwrite(_df(spark, [(9, "z")]))
    monkeypatch.setattr("interop_datalake_spark.lake.txn.os.replace", real_replace)

    # data + manifest for v2 may exist on disk, but the snapshot is v1
    assert table.current_version() == 1
    assert _snapshot(table) == {(1, "a")}
    # and the table is not wedged: the next commit succeeds
    table.append(_df(spark, [(2, "b")]))
    assert _snapshot(table) == {(1, "a"), (2, "b")}


def test_commit_conflict_detection(table, spark):
    table.append(_df(spark, [(1, "a")]))
    base = table.current_version()
    new_files, new_rows, new_stats = table._write_data(_df(spark, [(2, "b")]))
    # another writer lands first
    table.append(_df(spark, [(3, "c")]))
    with pytest.raises(CommitConflictError):
        table._commit(base, new_files, new_rows, new_stats)
    # retry against the fresh snapshot succeeds
    prev = table.manifest()
    table._commit(table.current_version(), prev["files"] + new_files,
                  prev["rows"] + new_rows)
    assert _snapshot(table) == {(1, "a"), (2, "b"), (3, "c")}


def test_compact_preserves_rows_and_is_versioned(table, spark):
    for i in range(4):
        table.append(_df(spark, [(i, str(i))]))
    before = _snapshot(table)
    v = table.compact(target_files=1)
    assert _snapshot(table) == before
    assert v == 5
    assert len(table.files()) < 4 * len(table.files(version=1))


def test_merge_file_pruning_carries_untouched_files(session, spark):
    t = TxnTable(session, "txn_pruned", stats_cols=["k"])
    # three appends with disjoint key ranges → three file sets with
    # disjoint recorded [min,max] stats
    t.append(_df(spark, [(1, "a"), (2, "b")]).coalesce(1))
    t.append(_df(spark, [(10, "c"), (11, "d")]).coalesce(1))
    t.append(_df(spark, [(20, "e"), (21, "f")]).coalesce(1))
    before = t.manifest()
    assert all(f in before["stats"] for f in before["files"])

    t.merge(_df(spark, [(10, "C"), (12, "g")]).coalesce(1), key_cols=["k"])
    after = t.manifest()
    carried = set(before["files"]) & set(after["files"])
    # the [1,2] and [20,21] files must be carried by reference (same
    # path strings), the [10,11] file replaced
    assert len(carried) == 2
    mins = sorted(before["stats"][f]["k"][0] for f in carried)
    assert mins == [1, 20]
    assert {(r["k"], r["v"]) for r in t.read().collect()} == {
        (1, "a"), (2, "b"), (10, "C"), (11, "d"), (12, "g"),
        (20, "e"), (21, "f"),
    }
    assert after["rows"] == 7

    # empty updates: every file carried, still a clean new version
    t.merge(spark.createDataFrame([], "k INT, v STRING"), key_cols=["k"])
    assert {(r["k"], r["v"]) for r in t.read().collect()} == {
        (1, "a"), (2, "b"), (10, "C"), (11, "d"), (12, "g"),
        (20, "e"), (21, "f"),
    }


def test_read_key_range_prunes_files(session, spark):
    t = TxnTable(session, "txn_skip", stats_cols=["k"])
    t.append(_df(spark, [(1, "a"), (2, "b")]).coalesce(1))
    t.append(_df(spark, [(10, "c"), (11, "d")]).coalesce(1))
    t.append(_df(spark, [(20, "e"), (21, "f")]).coalesce(1))

    full = t.read()
    pruned = t.read(key_range=("k", 10, 12))
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert {(r["k"], r["v"]) for r in pruned.collect()} == {(10, "c"), (11, "d")}
    # residual row filter applies inside kept files
    point = t.read(key_range=("k", 11, 11))
    assert {(r["k"], r["v"]) for r in point.collect()} == {(11, "d")}
    # fully out-of-range: empty frame, correct schema
    none = t.read(key_range=("k", 500, 600))
    assert none.count() == 0 and none.columns == full.columns


def test_append_epoch_is_exactly_once(session, spark):
    t = TxnTable(session, "txn_epochs")
    assert t.append_epoch(_df(spark, [(1, "a")]), epoch_id=0) is True
    assert t.append_epoch(_df(spark, [(2, "b")]), epoch_id=1) is True
    # crash-replay of epoch 1: must be a no-op
    assert t.append_epoch(_df(spark, [(2, "b")]), epoch_id=1) is False
    assert t.append_epoch(_df(spark, [(3, "c")]), epoch_id=2) is True
    assert _snapshot_of(t) == {(1, "a"), (2, "b"), (3, "c")}
    # non-epoch commits don't reset the high-water mark
    t.compact(target_files=1)
    assert t.append_epoch(_df(spark, [(9, "x")]), epoch_id=2) is False


def _snapshot_of(t):
    return {(r["k"], r["v"]) for r in t.read().collect()}


def test_streaming_foreach_batch_sink(session, spark, tmp_path):
    """True readStream → transactional sink: every source row lands
    exactly once, commits are manifest versions."""
    src = tmp_path / "stream_src"
    _df(spark, [(1, "a"), (2, "b")]).coalesce(1).write.parquet(str(src))
    t = TxnTable(session, "txn_stream")
    stream = (
        spark.readStream.schema("k INT, v STRING").parquet(str(src))
        .writeStream.foreachBatch(t.foreach_batch_writer())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination(120)
    assert _snapshot_of(t) == {(1, "a"), (2, "b")}
    assert t.manifest()["epoch"] == 0

    # second micro-batch (new file) under the same checkpoint
    _df(spark, [(3, "c")]).coalesce(1).write.mode("append").parquet(str(src))
    stream2 = (
        spark.readStream.schema("k INT, v STRING").parquet(str(src))
        .writeStream.foreachBatch(t.foreach_batch_writer())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    stream2.awaitTermination(120)
    assert _snapshot_of(t) == {(1, "a"), (2, "b"), (3, "c")}
    assert t.manifest()["epoch"] == 1


def test_vacuum_drops_unreferenced_keeps_live(table, spark):
    table.append(_df(spark, [(1, "a")]))
    table.overwrite(_df(spark, [(2, "b")]))
    table.overwrite(_df(spark, [(3, "c")]))
    removed = table.vacuum(keep_versions=1)
    assert removed == 2  # v1 + v2 data subdirs gone
    assert _snapshot(table) == {(3, "c")}
    with pytest.raises(FileNotFoundError):
        table.manifest(version=1)
