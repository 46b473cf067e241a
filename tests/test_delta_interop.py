"""Delta transaction-log interop (lake/delta_interop.py): export a
TxnTable snapshot as a public-protocol ``_delta_log`` and read Delta
logs back without delta-spark. The reader is validated BOTH against
the exporter (roundtrip) and against a hand-written multi-commit log,
so the pair can't just agree on a shared mistake."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.delta_interop import (
    export_delta_log,
    read_delta,
)
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession


@pytest.fixture()
def lake(spark):
    root = tempfile.mkdtemp(prefix="txn_delta_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


def test_export_then_read_roundtrip(spark, lake):
    t = TxnTable(
        lake, "d1", partition_cols=["site"], stats_cols=["k"]
    )
    df = spark.createDataFrame(
        [(k, "a" if k % 2 == 0 else "b", k * 1.5) for k in range(40)],
        "k INT, site STRING, val DOUBLE",
    )
    t.append(df)
    t.append(
        spark.createDataFrame([(100, None, 0.5)], "k INT, site STRING, val DOUBLE")
    )  # NULL partition value → __HIVE_DEFAULT_PARTITION__ → JSON null
    log_dir = export_delta_log(t)
    assert (log_dir / f"{0:020d}.json").exists()
    back = read_delta(spark, str(t.root))
    assert back.schema == t.read().schema
    want = {(r["k"], r["site"], r["val"]) for r in t.read().collect()}
    got = {(r["k"], r["site"], r["val"]) for r in back.collect()}
    assert got == want
    assert back.filter(F.col("site").isNull()).count() == 1


def test_export_log_structure_and_stats(spark, lake):
    t = TxnTable(lake, "d2", stats_cols=["k"])
    t.append(
        spark.range(0, 100).selectExpr("id as k", "'x' as v").coalesce(1)
    )
    log_dir = export_delta_log(t)
    actions = [
        json.loads(line)
        for line in (log_dir / f"{0:020d}.json").read_text().splitlines()
        if line.strip()
    ]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["format"]["provider"] == "parquet"
    schema = json.loads(meta["schemaString"])
    assert {f["name"] for f in schema["fields"]} == {"k", "v"}
    adds = [a["add"] for a in actions[2:] if "add" in a]
    assert len(adds) == 1
    assert adds[0]["size"] > 0
    stats = json.loads(adds[0]["stats"])
    assert stats["numRecords"] == 100
    assert int(stats["minValues"]["k"]) == 0
    assert int(stats["maxValues"]["k"]) == 99


def test_export_encodes_deletion_vectors(spark, lake):
    """A vectored snapshot exports DIRECTLY (no forced compact): the
    adds carry DV descriptors + tightBounds=false, the log claims the
    deletionVectors feature, and read_delta's independent decode path
    reproduces the soft-deleted view exactly."""
    t = TxnTable(lake, "d3", stats_cols=["k"])
    t.append(spark.range(0, 50).selectExpr("id as k", "'x' as v"))
    t.delete_where(F.col("k") < 10, merge_on_read=True)
    log_dir = export_delta_log(t)
    actions = [
        json.loads(line)
        for line in (log_dir / f"{0:020d}.json").read_text().splitlines()
        if line.strip()
    ]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    adds = [a["add"] for a in actions if "add" in a]
    dv_adds = [a for a in adds if a.get("deletionVector")]
    assert dv_adds, "no add carries a deletionVector"
    for a in dv_adds:
        assert a["deletionVector"]["storageType"] == "u"
        assert a["deletionVector"]["pathOrInlineDv"].startswith("_dv")
        assert json.loads(a["stats"])["tightBounds"] is False
    assert (t.root / "_dv").is_dir()
    want = {(r["k"], r["v"]) for r in t.read().collect()}
    got = {
        (r["k"], r["v"])
        for r in read_delta(spark, str(t.root)).collect()
    }
    assert got == want and len(got) == 40
    # compact still reconciles: the re-export goes back to a clean
    # 1/2-protocol log and the stale packed vectors are replaced
    t.compact(target_files=1)
    log_dir = export_delta_log(t)
    actions0 = [
        json.loads(line)
        for line in (log_dir / f"{0:020d}.json").read_text().splitlines()
        if line.strip()
    ]
    assert next(
        a["protocol"] for a in actions0 if "protocol" in a
    ) == {"minReaderVersion": 1, "minWriterVersion": 2}
    assert not (t.root / "_dv").exists()
    assert read_delta(spark, str(t.root)).count() == 40


def test_failed_export_preserves_previous_log(
    spark, lake, monkeypatch
):
    """Round-12 ADVICE: a full export whose fallible DV collection
    raises (over-bound vectors, or any Spark failure) must leave the
    PREVIOUS valid export readable — not rmtree it first and die on
    the rubble."""
    import interop_datalake_spark.lake.delta_interop as di

    t = TxnTable(lake, "dfail", stats_cols=["k"])
    t.append(spark.range(0, 20).selectExpr("id as k", "'x' as v"))
    export_delta_log(t)
    want = {r["k"] for r in read_delta(spark, str(t.root)).collect()}
    assert len(want) == 20
    t.delete_where(F.col("k") < 5, merge_on_read=True)
    monkeypatch.setattr(di, "_DV_POSITIONS_BOUND", 0)
    with pytest.raises(ValueError, match="compact"):
        export_delta_log(t)
    # the old snapshot export is still fully readable
    got = {r["k"] for r in read_delta(spark, str(t.root)).collect()}
    assert got == want
    # and with the bound restored, the re-export succeeds and
    # replaces it cleanly (DV'd view: k>=5)
    monkeypatch.undo()
    export_delta_log(t)
    got2 = {r["k"] for r in read_delta(spark, str(t.root)).collect()}
    assert got2 == set(range(5, 20))


def test_checkpoint_adds_carry_datachange_false(spark, lake):
    """Delta canonicalizes checkpoint file actions to
    dataChange=false (a checkpoint is a snapshot, not new data) —
    compliant CDC/stream consumers keying on dataChange must not
    reprocess the checkpointed state."""
    import pyarrow.parquet as pq_mod

    t = TxnTable(lake, "dckdc", stats_cols=["k"])
    t.append(spark.range(0, 6).selectExpr("id as k").coalesce(1))
    export_delta_log(t, mode="mirror", checkpoint_every=1)
    t.append(spark.range(6, 9).selectExpr("id as k").coalesce(1))
    export_delta_log(t, mode="mirror", checkpoint_every=1)
    ckpt = t.root / "_delta_log" / f"{1:020d}.checkpoint.parquet"
    assert ckpt.exists()
    rows = pq_mod.read_table(ckpt, columns=["add"]).to_pylist()
    adds = [r["add"] for r in rows if r["add"] and r["add"].get("path")]
    assert adds and all(a["dataChange"] is False for a in adds)
    # and the checkpoint still replays to the right live set
    got = {r["k"] for r in read_delta(spark, str(t.root)).collect()}
    assert got == set(range(9))


def test_mirror_exports_dv_update_commits(spark, lake):
    """The mirror encodes vector changes as Delta's DV-update shape:
    remove naming the previously published descriptor + re-add with
    the widened one, protocol upgraded in the first vectored commit.
    Every mirrored delta version must equal the TxnTable's view at
    the matching txn version."""
    t = TxnTable(lake, "d3m", stats_cols=["k"])
    t.append(
        spark.range(0, 60).selectExpr("id as k", "'x' as v").coalesce(1)
    )
    export_delta_log(t, mode="mirror")  # v0: clean, protocol 1/2
    t.delete_where(F.col("k") < 10, merge_on_read=True)
    export_delta_log(t, mode="mirror")  # v1: first vectors
    t.delete_where(F.col("k") >= 55, merge_on_read=True)  # widen
    t.append(
        spark.range(100, 110)
        .selectExpr("id as k", "'y' as v")
        .coalesce(1)
    )
    export_delta_log(t, mode="mirror")  # v2+: widened + new file
    log_dir = t.root / "_delta_log"
    v1 = [
        json.loads(line)
        for line in (log_dir / f"{1:020d}.json").read_text().splitlines()
        if line.strip()
    ]
    assert any(
        a.get("protocol", {}).get("minReaderVersion") == 3 for a in v1
    ), "first vectored mirror commit must upgrade the protocol"
    rm1 = [a["remove"] for a in v1 if "remove" in a]
    ad1 = [a["add"] for a in v1 if "add" in a]
    assert len(rm1) == 1 and len(ad1) == 1
    assert rm1[0].get("deletionVector") is None  # was clean before
    assert ad1[0]["deletionVector"]["cardinality"] == 10
    # the widen commit's remove must name EXACTLY the v1 descriptor
    v2 = [
        json.loads(line)
        for line in (log_dir / f"{2:020d}.json").read_text().splitlines()
        if line.strip()
    ]
    rm2 = [
        a["remove"] for a in v2
        if "remove" in a and a["remove"].get("deletionVector")
    ]
    assert rm2 and rm2[0]["deletionVector"] == ad1[0]["deletionVector"]
    # value parity at every mirrored version
    cur = read_delta(spark, str(t.root))
    want = {(r["k"], r["v"]) for r in t.read().collect()}
    assert {(r["k"], r["v"]) for r in cur.collect()} == want
    v1_rows = {
        r["k"]
        for r in read_delta(spark, str(t.root), version=1).collect()
    }
    assert v1_rows == set(range(10, 60))
    v0_rows = read_delta(spark, str(t.root), version=0).count()
    assert v0_rows == 60


def test_reader_replays_handwritten_multi_commit_log(spark, tmp_path):
    """The reader against a log this repo's exporter did NOT write:
    three commits with add/remove churn + VERSION AS OF."""
    root = tmp_path / "ext_delta"
    (root / "_delta_log").mkdir(parents=True)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    df2 = spark.createDataFrame([(3, "c")], "k INT, v STRING")
    df3 = spark.createDataFrame([(4, "d")], "k INT, v STRING")
    for name, frame in (("f1", df1), ("f2", df2), ("f3", df3)):
        frame.coalesce(1).write.parquet(str(root / "stage" / name))
    rel = {
        name: f"stage/{name}/"
        + next(
            p.name
            for p in (root / "stage" / name).iterdir()
            if p.name.endswith(".parquet")
        )
        for name in ("f1", "f2", "f3")
    }
    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )

    def commit(v, actions):
        (root / "_delta_log" / f"{v:020d}.json").write_text(
            "\n".join(json.dumps(a) for a in actions) + "\n"
        )

    commit(
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "ext-1",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
            {"add": {"path": rel["f1"], "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ],
    )
    commit(
        1,
        [{"add": {"path": rel["f2"], "partitionValues": {}, "size": 1,
                  "modificationTime": 0, "dataChange": True}}],
    )
    commit(
        2,
        [
            {"remove": {"path": rel["f1"], "dataChange": True}},
            {"add": {"path": rel["f3"], "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ],
    )

    def rows(df):
        return {(r["k"], r["v"]) for r in df.collect()}

    assert rows(read_delta(spark, str(root))) == {(3, "c"), (4, "d")}
    assert rows(read_delta(spark, str(root), version=0)) == {
        (1, "a"), (2, "b"),
    }
    assert rows(read_delta(spark, str(root), version=1)) == {
        (1, "a"), (2, "b"), (3, "c"),
    }
    with pytest.raises(ValueError, match="version 9"):
        read_delta(spark, str(root), version=9)


def test_reader_refuses_unknown_dv_storage_and_truncated_logs(
    spark, tmp_path
):
    """DV adds are READ now (test_delta_dv.py); what still refuses
    loudly is a storage type the decoder can't prove it understands,
    and truncated logs."""
    root = tmp_path / "bad_delta"
    (root / "_delta_log").mkdir(parents=True)
    schema_string = json.dumps(
        {"type": "struct", "fields": [
            {"name": "k", "type": "integer", "nullable": True, "metadata": {}}
        ]}
    )
    (root / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(
            json.dumps(a)
            for a in [
                {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                              "readerFeatures": ["deletionVectors"],
                              "writerFeatures": ["deletionVectors"]}},
                {"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                              "schemaString": schema_string,
                              "partitionColumns": [], "configuration": {}}},
                {"add": {"path": "f.parquet", "partitionValues": {}, "size": 1,
                         "modificationTime": 0, "dataChange": True,
                         "deletionVector": {"storageType": "z", "pathOrInlineDv": "x",
                                            "offset": 1, "sizeInBytes": 1, "cardinality": 1}}},
            ]
        )
    )
    with pytest.raises(NotImplementedError, match="storageType"):
        read_delta(spark, str(root)).collect()
    # log whose version-0 json was checkpoint-compacted away
    root2 = tmp_path / "trunc_delta"
    (root2 / "_delta_log").mkdir(parents=True)
    (root2 / "_delta_log" / f"{5:020d}.json").write_text("{}\n")
    with pytest.raises(ValueError, match="checkpoint"):
        read_delta(spark, str(root2))


def test_reexport_replaces_log_wholesale(spark, lake):
    t = TxnTable(lake, "d4", stats_cols=["k"])
    t.append(spark.range(0, 10).selectExpr("id as k", "'x' as v"))
    export_delta_log(t)
    assert read_delta(spark, str(t.root)).count() == 10
    t.append(spark.range(10, 25).selectExpr("id as k", "'y' as v"))
    export_delta_log(t)  # snapshot export: still ONE commit, v0
    log = t.root / "_delta_log"
    assert sorted(
        p.name for p in log.glob("*.json") if p.stem.isdigit()
    ) == [f"{0:020d}.json"]
    assert read_delta(spark, str(t.root)).count() == 25


# -- model-based reader property ------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_POOL = 6  # pre-written single-row parquet files, k = 0..5


@pytest.fixture(scope="module")
def delta_pool(spark):
    """A reusable pool of tiny parquet files + a log-builder: each
    hypothesis example writes only JSON commits, never data."""
    root = Path(tempfile.mkdtemp(prefix="delta_prop_"))
    rels = []
    for k in range(_POOL):
        d = root / "stage" / f"f{k}"
        spark.createDataFrame([(k,)], "k INT").coalesce(1).write.parquet(
            str(d)
        )
        rels.append(
            f"stage/f{k}/"
            + next(p.name for p in d.iterdir() if p.name.endswith(".parquet"))
        )
    yield root, rels
    shutil.rmtree(root, ignore_errors=True)


_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "integer", "nullable": True, "metadata": {}}
        ],
    }
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    ops=st.lists(
        st.lists(
            st.tuples(
                st.sampled_from(["add", "remove"]),
                st.integers(min_value=0, max_value=_POOL - 1),
            ),
            min_size=0,
            max_size=4,
        ),
        min_size=1,
        max_size=5,
    ),
    probe=st.integers(min_value=0, max_value=4),
)
def test_reader_matches_replay_model(spark, delta_pool, ops, probe):
    """Hypothesis model check: for ANY add/remove commit sequence, the
    reader's row set at every probed version equals a trivial Python
    replay of the same actions (add wins by path, remove drops,
    re-add after remove resurrects)."""
    root, rels = delta_pool
    log = root / "_delta_log"
    shutil.rmtree(log, ignore_errors=True)
    log.mkdir()
    model: set[int] = set()
    states = []
    for v, commit_ops in enumerate(ops):
        actions = []
        if v == 0:
            actions += [
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                {
                    "metaData": {
                        "id": "prop",
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _SCHEMA_STRING,
                        "partitionColumns": [],
                        "configuration": {},
                    }
                },
            ]
        for op, idx in commit_ops:
            if op == "add":
                actions.append(
                    {
                        "add": {
                            "path": rels[idx],
                            "partitionValues": {},
                            "size": 1,
                            "modificationTime": 0,
                            "dataChange": True,
                        }
                    }
                )
                model.add(idx)
            else:
                actions.append(
                    {"remove": {"path": rels[idx], "dataChange": True}}
                )
                model.discard(idx)
        (log / f"{v:020d}.json").write_text(
            "\n".join(json.dumps(a) for a in actions) + "\n"
        )
        states.append(set(model))
    v = min(probe, len(ops) - 1)
    got = {
        r["k"] for r in read_delta(spark, str(root), version=v).collect()
    }
    assert got == states[v]


def test_export_refuses_pre_spec_partition_files(spark, lake):
    """Round-8 review 2: a file written BEFORE the current partition
    spec keeps its partition values in the data, not the manifest —
    exporting empty partitionValues would make Delta readers NULL the
    column for those rows. Refused until compact() rewrites under the
    current spec."""
    t = TxnTable(lake, "d5", stats_cols=["k"])
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k INT, site STRING"
        )
    )  # unpartitioned: site lives IN the data
    t2 = TxnTable(lake, "d5", partition_cols=["site"], stats_cols=["k"])
    t2.append(
        spark.createDataFrame([(3, "a")], "k INT, site STRING")
    )  # current spec: site in the path
    with pytest.raises(ValueError, match="partition spec"):
        export_delta_log(t2)
    t2.compact(target_files=1)
    export_delta_log(t2)
    back = read_delta(spark, str(t2.root))
    assert {(r["k"], r["site"]) for r in back.collect()} == {
        (1, "a"), (2, "b"), (3, "a"),
    }
    assert back.filter(F.col("site").isNull()).count() == 0


def test_export_url_encodes_paths_and_reader_decodes(spark, lake):
    """Round-8 review 2: the protocol specifies URL-encoded add.path.
    A '%'-containing partition value is Hive-escaped on disk
    (site=50%25); the export must percent-encode that literal and the
    reader must decode before resolving — both directions pinned via
    a value that breaks under raw paths."""
    t = TxnTable(lake, "d6", partition_cols=["site"], stats_cols=["k"])
    t.append(
        spark.createDataFrame(
            [(1, "50%"), (2, "a b"), (3, "plain")], "k INT, site STRING"
        )
    )
    log_dir = export_delta_log(t)
    raw = (log_dir / f"{0:020d}.json").read_text()
    actions = [json.loads(x) for x in raw.splitlines() if x.strip()]
    paths = [a["add"]["path"] for a in actions if "add" in a]
    # the on-disk '%' of the Hive-escaped dir is itself percent-encoded
    assert any("site=50%2525" in p for p in paths), paths
    assert any("site=a%20b" in p for p in paths), paths
    back = read_delta(spark, str(t.root))
    assert {(r["k"], r["site"]) for r in back.collect()} == {
        (1, "50%"), (2, "a b"), (3, "plain"),
    }


def test_vacuum_deletes_stale_export(spark, lake):
    """Round-8 review 2: vacuum may reclaim exactly the files an
    exported snapshot references — it deletes the export rather than
    leave external engines a log of dangling paths."""
    t = TxnTable(lake, "d7", stats_cols=["k"])
    t.append(spark.range(0, 20).selectExpr("id as k", "'x' as v"))
    export_delta_log(t)
    assert (t.root / "_delta_log").exists()
    t.overwrite(spark.range(0, 5).selectExpr("id as k", "'y' as v"))
    t.vacuum(keep_versions=1)  # reclaims v1's files — export is stale
    assert not (t.root / "_delta_log").exists()


def test_vacuum_keeps_current_export_and_mirror_identity(spark, lake):
    """Round-8 advice: vacuum deletes the export ONLY when it reclaims
    a file the log's LIVE add set references. A routine vacuum under a
    CURRENT mirror keeps the log (and its marker), so the next mirror
    continues incrementally under the same table id — no identity
    churn for streaming consumers."""
    from interop_datalake_spark.lake.delta_interop import _replay_log

    t = TxnTable(lake, "d7b", stats_cols=["k"])
    # one file so the copy-on-write delete rewrites its whole commit
    # subdir (vacuum reclaims at subdir granularity)
    t.append(
        spark.range(0, 10).selectExpr("id as k", "'a' as v").coalesce(1)
    )
    export_delta_log(t, mode="mirror")
    t.delete_where(F.col("k") < 3)  # copy-on-write rewrite
    export_delta_log(t, mode="mirror")  # mirror is CURRENT
    id_before = _replay_log(str(t.root), None)[0]["id"]
    removed = t.vacuum(keep_versions=1)
    assert removed > 0  # the rewrite's old subdir was reclaimed
    assert (t.root / "_delta_log").exists()  # live add set intact
    assert read_delta(spark, str(t.root)).count() == 7
    t.append(spark.range(100, 103).selectExpr("id as k", "'b' as v"))
    export_delta_log(t, mode="mirror")  # incremental, same identity
    assert _replay_log(str(t.root), None)[0]["id"] == id_before
    assert read_delta(spark, str(t.root)).count() == 10


def test_reader_data_skipping_via_add_stats(spark, lake):
    """The reader's manifest-level pruning: a clustered export records
    disjoint per-file min/max in add.stats, and a point read plans
    ~one file — delta_files makes the skipping observable, exact rows
    via the residual filter."""
    from interop_datalake_spark.lake.delta_interop import delta_files

    t = TxnTable(lake, "d8", stats_cols=["k"])
    for i in range(4):  # 4 files with disjoint k ranges
        t.append(
            spark.range(i * 100, (i + 1) * 100)
            .selectExpr("id as k", "'x' as v")
            .coalesce(1)
        )
    export_delta_log(t)
    all_files = delta_files(str(t.root))
    assert len(all_files) == 4
    pruned = delta_files(str(t.root), key_range=("k", 150, 160))
    assert len(pruned) == 1
    got = read_delta(spark, str(t.root), key_range=("k", 150, 160))
    assert sorted(r["k"] for r in got.collect()) == list(range(150, 161))


def test_reader_partition_filter_prunes_and_filters(spark, lake):
    from interop_datalake_spark.lake.delta_interop import delta_files

    t = TxnTable(lake, "d9", partition_cols=["site"], stats_cols=["k"])
    t.append(
        spark.createDataFrame(
            [(k, "a" if k % 2 == 0 else "b") for k in range(20)],
            "k INT, site STRING",
        )
    )
    export_delta_log(t)
    a_files = delta_files(str(t.root), partition_filter={"site": "a"})
    assert 0 < len(a_files) < len(delta_files(str(t.root)))
    got = read_delta(spark, str(t.root), partition_filter={"site": "a"})
    assert {r["k"] for r in got.collect()} == {k for k in range(20) if k % 2 == 0}
    # stats-less external adds are conservatively kept
    assert delta_files(
        str(t.root), key_range=("nonexistent_col", 0, 1)
    ) == delta_files(str(t.root))


def test_reader_replays_from_parquet_checkpoint(spark, tmp_path):
    """Real long-lived Delta tables checkpoint every N commits and
    clean old JSON — the reader must start from the newest usable
    checkpoint and replay only the JSON commits after it. Built
    by hand with the protocol's checkpoint row shape (add/metaData/
    protocol struct columns), JSON v0..v3 deleted."""
    root = tmp_path / "ckpt_delta"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    frames = {}
    for k in range(5):
        d = root / "stage" / f"f{k}"
        spark.createDataFrame([(k,)], "k INT").coalesce(1).write.parquet(
            str(d)
        )
        frames[k] = f"stage/f{k}/" + next(
            p.name for p in d.iterdir() if p.name.endswith(".parquet")
        )
    schema_string = json.dumps(
        {"type": "struct", "fields": [
            {"name": "k", "type": "integer", "nullable": True, "metadata": {}}
        ]}
    )
    # checkpoint at version 3: live set = {f1, f2, f3} (f0 was removed
    # by some pre-checkpoint commit we never materialize as JSON)
    ckpt_schema = (
        "add STRUCT<path: STRING, partitionValues: MAP<STRING,STRING>,"
        " size: BIGINT, modificationTime: BIGINT, dataChange: BOOLEAN,"
        " stats: STRING>,"
        " metaData STRUCT<id: STRING, format: STRUCT<provider: STRING>,"
        " schemaString: STRING, partitionColumns: ARRAY<STRING>,"
        " configuration: MAP<STRING,STRING>>,"
        " protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT>"
    )
    rows = [
        (None, ("ck", ("parquet",), schema_string, [], {}), None),
        (None, None, (1, 2)),
    ] + [
        ((frames[k], {}, 1, 0, True, json.dumps({"numRecords": 1})),
         None, None)
        for k in (1, 2, 3)
    ]
    tmp_dir = tmp_path / "ckpt_stage"
    spark.createDataFrame(rows, ckpt_schema).coalesce(1).write.parquet(
        str(tmp_dir)
    )
    part = next(p for p in tmp_dir.iterdir() if p.name.endswith(".parquet"))
    shutil.copy(part, log / f"{3:020d}.checkpoint.parquet")
    # JSON commits AFTER the checkpoint: v4 removes f2, adds f4
    (log / f"{4:020d}.json").write_text(
        "\n".join(
            json.dumps(a)
            for a in [
                {"remove": {"path": frames[2], "dataChange": True}},
                {"add": {"path": frames[4], "partitionValues": {},
                         "size": 1, "modificationTime": 0,
                         "dataChange": True}},
            ]
        )
        + "\n"
    )

    def rows_of(df):
        return {r["k"] for r in df.collect()}

    assert rows_of(read_delta(spark, str(root))) == {1, 3, 4}
    # pure-checkpoint read at the checkpoint version itself
    assert rows_of(read_delta(spark, str(root), version=3)) == {1, 2, 3}
    # pre-checkpoint history is gone: refused loudly
    with pytest.raises(ValueError, match="history truncated"):
        read_delta(spark, str(root), version=2)
    # stats survive the checkpoint path for data skipping
    from interop_datalake_spark.lake.delta_interop import delta_files

    assert len(delta_files(str(root), version=3, key_range=("k", 2, 2))) == 3


def test_reader_replays_from_multipart_checkpoint(spark, tmp_path):
    """The MULTI-PART classic checkpoint layout (filename encodes
    part/nParts; large tables split their snapshot rows across
    parts): all parts concatenate into one live set, metaData and
    protocol land in whichever part holds them, and the JSON tail
    replays on top."""
    root = tmp_path / "mp_delta"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    frames = {}
    for k in range(5):
        d = root / "stage" / f"f{k}"
        spark.createDataFrame([(k,)], "k INT").coalesce(1).write.parquet(
            str(d)
        )
        frames[k] = f"stage/f{k}/" + next(
            p.name for p in d.iterdir() if p.name.endswith(".parquet")
        )
    schema_string = json.dumps(
        {"type": "struct", "fields": [
            {"name": "k", "type": "integer", "nullable": True, "metadata": {}}
        ]}
    )
    ckpt_schema = (
        "add STRUCT<path: STRING, partitionValues: MAP<STRING,STRING>,"
        " size: BIGINT, modificationTime: BIGINT, dataChange: BOOLEAN,"
        " stats: STRING>,"
        " metaData STRUCT<id: STRING, format: STRUCT<provider: STRING>,"
        " schemaString: STRING, partitionColumns: ARRAY<STRING>,"
        " configuration: MAP<STRING,STRING>>,"
        " protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT>"
    )
    part_rows = [
        # part 1: metaData + protocol + f1
        [
            (None, ("mp", ("parquet",), schema_string, [], {}), None),
            (None, None, (1, 2)),
            ((frames[1], {}, 1, 0, True, None), None, None),
        ],
        # part 2: f2 + f3
        [
            ((frames[k], {}, 1, 0, True, None), None, None)
            for k in (2, 3)
        ],
    ]
    for i, rows in enumerate(part_rows, start=1):
        tmp_dir = tmp_path / f"mp_stage{i}"
        spark.createDataFrame(rows, ckpt_schema).coalesce(1).write.parquet(
            str(tmp_dir)
        )
        part = next(
            p for p in tmp_dir.iterdir() if p.name.endswith(".parquet")
        )
        shutil.copy(
            part,
            log / f"{3:020d}.checkpoint.{i:010d}.{2:010d}.parquet",
        )
    (log / f"{4:020d}.json").write_text(
        "\n".join(
            json.dumps(a)
            for a in [
                {"remove": {"path": frames[2], "dataChange": True}},
                {"add": {"path": frames[4], "partitionValues": {},
                         "size": 1, "modificationTime": 0,
                         "dataChange": True}},
            ]
        )
        + "\n"
    )
    assert {r["k"] for r in read_delta(spark, str(root)).collect()} == {
        1, 3, 4,
    }
    assert {
        r["k"] for r in read_delta(spark, str(root), version=3).collect()
    } == {1, 2, 3}
    # dropping a part → loud incompleteness refusal, not a partial set
    (log / f"{3:020d}.checkpoint.{2:010d}.{2:010d}.parquet").unlink()
    with pytest.raises(ValueError, match="incomplete"):
        read_delta(spark, str(root), version=3)


def _mini_log(root, rel_paths, extra_meta_conf=None, protocol=None):
    """One-commit JSON log over pre-written files (test helper)."""
    log = root / "_delta_log"
    log.mkdir(parents=True, exist_ok=True)
    schema_string = json.dumps(
        {"type": "struct", "fields": [
            {"name": "k", "type": "integer", "nullable": True, "metadata": {}}
        ]}
    )
    actions = [
        {"protocol": protocol or {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "m", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema_string, "partitionColumns": [],
                      "configuration": extra_meta_conf or {}}},
    ] + [
        {"add": {"path": p, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}}
        for p in rel_paths
    ]
    (log / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions) + "\n"
    )


def test_reader_refuses_malformed_and_incomplete_checkpoints(
    spark, tmp_path
):
    """Round-8 review 3 (amended round 11 — V2 checkpoints are READ
    now, TestV2Checkpoint): a V2 manifest with no usable state still
    refuses loudly rather than returning a silently empty table; an
    incomplete multi-part checkpoint would silently drop files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path / "v2ckpt"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    # UUID-named V2 manifest with no metaData/sidecars/adds at all
    pq.write_table(
        pa.table({"x": [1]}),
        log / f"{3:020d}.checkpoint.80a083e8.parquet",
    )
    with pytest.raises(ValueError, match="no metaData"):
        read_delta(spark, str(root), version=3)
    # incomplete classic multi-part: part 1 of 2 only
    root2 = tmp_path / "partial_ckpt"
    log2 = root2 / "_delta_log"
    log2.mkdir(parents=True)
    pq.write_table(
        pa.table({"add": [None]}),
        log2 / f"{3:020d}.checkpoint.{1:010d}.{2:010d}.parquet",
    )
    with pytest.raises(ValueError, match="incomplete"):
        read_delta(spark, str(root2), version=3)
    # classic-named checkpoint with no 'add' column: not action layout
    root3 = tmp_path / "no_add_ckpt"
    log3 = root3 / "_delta_log"
    log3.mkdir(parents=True)
    pq.write_table(
        pa.table({"checkpointMetadata": [1]}),
        log3 / f"{3:020d}.checkpoint.parquet",
    )
    with pytest.raises(NotImplementedError, match="add"):
        read_delta(spark, str(root3), version=3)


def test_reader_refuses_column_mapping_and_unknown_features(
    spark, tmp_path
):
    """Round-8 review 3 (amended rounds 11+12): ``name`` mapping — a
    name-mode table whose fields carry no physicalName metadata
    resolves to its logical names (the delta-spark fallback) and
    reads fine. ``id`` mode is now implemented via parquet field-id
    resolution, so a mode=id table whose schema carries NO
    columnMapping.id metadata is CORRUPT (Spark's fieldId reader
    would silently fall back to name matching) and refuses. Unknown
    readerFeatures and unknown mapping modes likewise refuse."""
    root = tmp_path / "cm_delta"
    d = root / "stage" / "f0"
    spark.createDataFrame([(1,)], "k INT").coalesce(1).write.parquet(str(d))
    rel = "stage/f0/" + next(
        p.name for p in d.iterdir() if p.name.endswith(".parquet")
    )
    _mini_log(
        root, [rel], extra_meta_conf={"delta.columnMapping.mode": "name"}
    )
    assert read_delta(spark, str(root)).count() == 1
    _mini_log(
        root, [rel], extra_meta_conf={"delta.columnMapping.mode": "id"}
    )
    with pytest.raises(ValueError, match="columnMapping.id"):
        read_delta(spark, str(root))
    _mini_log(
        root, [rel],
        extra_meta_conf={"delta.columnMapping.mode": "something-new"},
    )
    with pytest.raises(NotImplementedError, match="something-new"):
        read_delta(spark, str(root))
    root2 = tmp_path / "feat_delta"
    d2 = root2 / "stage" / "f0"
    spark.createDataFrame([(1,)], "k INT").coalesce(1).write.parquet(str(d2))
    rel2 = "stage/f0/" + next(
        p.name for p in d2.iterdir() if p.name.endswith(".parquet")
    )
    _mini_log(
        root2, [rel2],
        protocol={"minReaderVersion": 3, "minWriterVersion": 7,
                  "readerFeatures": ["typeWidening"]},
    )
    with pytest.raises(NotImplementedError, match="typeWidening"):
        read_delta(spark, str(root2))
    # supported features pass (timestampNtz is just a type)
    root3 = tmp_path / "ok_feat_delta"
    d3 = root3 / "stage" / "f0"
    spark.createDataFrame([(7,)], "k INT").coalesce(1).write.parquet(str(d3))
    rel3 = "stage/f0/" + next(
        p.name for p in d3.iterdir() if p.name.endswith(".parquet")
    )
    _mini_log(
        root3, [rel3],
        protocol={"minReaderVersion": 3, "minWriterVersion": 7,
                  "readerFeatures": ["timestampNtz"]},
    )
    assert read_delta(spark, str(root3)).count() == 1


def test_partition_filter_conservative_on_unrecorded_columns(
    spark, lake
):
    """Round-8 review 3: filtering on a DATA column (or any column an
    add's partitionValues don't record) must keep the files and let
    the residual row filter decide — pruning may only drop what it
    PROVES out of range. A boolean value canonicalizes to Delta's
    lowercase rendering."""
    from interop_datalake_spark.lake.delta_interop import delta_files

    t = TxnTable(lake, "d10", stats_cols=["k"])
    t.append(
        spark.createDataFrame(
            [(1, "x", True), (2, "y", False), (3, "x", True)],
            "k INT, v STRING, flag BOOLEAN",
        )
    )
    export_delta_log(t)
    # unpartitioned: partitionValues never record 'v' — files kept,
    # residual filters rows
    got = read_delta(spark, str(t.root), partition_filter={"v": "x"})
    assert sorted(r["k"] for r in got.collect()) == [1, 3]
    assert len(
        delta_files(str(t.root), partition_filter={"v": "x"})
    ) == len(delta_files(str(t.root)))
    # boolean values canonicalize ('true', not 'True')
    got2 = read_delta(
        spark, str(t.root), partition_filter={"flag": True}
    )
    assert sorted(r["k"] for r in got2.collect()) == [1, 3]


def test_delta_files_accepts_composite_key_ranges(spark, lake):
    """resolve_files parity: a LIST of key ranges intersects, same
    spelling as TxnTable.read (round-8 review 3)."""
    from interop_datalake_spark.lake.delta_interop import delta_files

    t = TxnTable(lake, "d11", stats_cols=["k", "j"])
    for i in range(4):
        t.append(
            spark.range(i * 100, (i + 1) * 100)
            .selectExpr("id as k", "id * 2 as j", "'x' as v")
            .coalesce(1)
        )
    export_delta_log(t)
    both = delta_files(
        str(t.root),
        key_range=[("k", 150, 160), ("j", 300, 320)],
    )
    assert len(both) == 1
    got = read_delta(
        spark, str(t.root),
        key_range=[("k", 150, 160), ("j", 300, 320)],
    )
    assert sorted(r["k"] for r in got.collect()) == list(range(150, 161))


class TestMirrorExport:
    def test_mirror_appends_incremental_delta_commits(self, spark, lake):
        """mode='mirror': one Delta commit per effective TxnTable
        version — external engines follow the table continuously and
        time-travel the mirrored history."""
        t = TxnTable(lake, "m1", stats_cols=["k"])
        t.append(spark.range(0, 10).selectExpr("id as k", "'a' as v"))
        export_delta_log(t, mode="mirror")  # no marker yet: full v0
        assert read_delta(spark, str(t.root)).count() == 10
        t.append(spark.range(10, 25).selectExpr("id as k", "'b' as v"))
        t.delete_where(F.col("k") < 5)  # copy-on-write rewrite
        export_delta_log(t, mode="mirror")
        log = t.root / "_delta_log"
        commits = sorted(
            p.name for p in log.glob("*.json") if p.stem.isdigit()
        )
        assert len(commits) == 3  # v0 full + append + cow delete
        assert read_delta(spark, str(t.root)).count() == 20
        # Delta time travel over the mirrored history
        assert read_delta(spark, str(t.root), version=0).count() == 10
        assert read_delta(spark, str(t.root), version=1).count() == 25
        got = {r["k"] for r in read_delta(spark, str(t.root)).collect()}
        assert got == set(range(5, 25))
        # idempotent: nothing new → no new commit
        export_delta_log(t, mode="mirror")
        assert (
            sorted(p.name for p in log.glob("*.json") if p.stem.isdigit())
            == commits
        )

    def test_mirror_vector_window_then_compact(self, spark, lake):
        """A mor-delete mirrors as a DV commit (it used to refuse);
        the following compact mirrors as a rewrite whose adds are
        vector-free again, and every mirrored version reads back
        value-exact."""
        t = TxnTable(lake, "m2", stats_cols=["k"])
        t.append(spark.range(0, 30).selectExpr("id as k", "'a' as v"))
        export_delta_log(t, mode="mirror")
        t.delete_where(F.col("k") % 3 == 0, merge_on_read=True)
        export_delta_log(t, mode="mirror")  # DV commit, not a refusal
        want = {k for k in range(30) if k % 3 != 0}
        got = {r["k"] for r in read_delta(spark, str(t.root)).collect()}
        assert got == want
        t.compact(target_files=1)  # reconciles the vectors
        log_dir = export_delta_log(t, mode="mirror")
        assert read_delta(spark, str(t.root)).count() == 20
        got = {r["k"] for r in read_delta(spark, str(t.root)).collect()}
        assert got == want
        # the compact commit's adds are clean (no descriptors), and
        # its removes name the vectored file's published descriptor
        last = max(
            int(p.stem) for p in log_dir.glob("*.json") if p.stem.isdigit()
        )
        acts = [
            json.loads(line)
            for line in (log_dir / f"{last:020d}.json")
            .read_text()
            .splitlines()
            if line.strip()
        ]
        assert all(
            not a["add"].get("deletionVector")
            for a in acts
            if "add" in a
        )
        assert any(
            a["remove"].get("deletionVector")
            for a in acts
            if "remove" in a
        )

    def test_mirror_emits_metadata_on_schema_evolution(self, spark, lake):
        t = TxnTable(lake, "m3", stats_cols=["k"])
        t.append(spark.range(0, 5).selectExpr("id as k"))
        export_delta_log(t, mode="mirror")
        t.append(spark.range(5, 8).selectExpr("id as k", "'x' as extra"))
        export_delta_log(t, mode="mirror")
        back = read_delta(spark, str(t.root))
        assert set(back.columns) == {"k", "extra"}
        assert back.count() == 8
        assert back.filter(F.col("extra").isNull()).count() == 5

    def test_mirror_restarts_full_after_vacuum(self, spark, lake):
        t = TxnTable(lake, "m4", stats_cols=["k"])
        t.append(spark.range(0, 10).selectExpr("id as k", "'a' as v"))
        export_delta_log(t, mode="mirror")
        t.overwrite(spark.range(0, 4).selectExpr("id as k", "'b' as v"))
        t.vacuum(keep_versions=1)  # deletes the stale export + marker
        assert not (t.root / "_delta_log").exists()
        export_delta_log(t, mode="mirror")  # falls back to full export
        assert read_delta(spark, str(t.root)).count() == 4

    def test_mirror_keeps_table_id_stable_and_survives_torn_marker(
        self, spark, lake
    ):
        """Round-8 review 4: metaData.id is the table's STABLE
        identity — external engines key caches/stream sources on it,
        so a mirrored schema evolution must re-emit the same id; a
        torn marker falls back to a full export instead of raising
        forever."""
        t = TxnTable(lake, "m5", stats_cols=["k"])
        t.append(spark.range(0, 4).selectExpr("id as k"))
        log = export_delta_log(t, mode="mirror")
        t.append(spark.range(4, 6).selectExpr("id as k", "'x' as extra"))
        export_delta_log(t, mode="mirror")  # schema change → metaData

        def _ids():
            out = []
            for p in sorted(log.glob("*.json")):
                if not p.stem.isdigit():
                    continue
                for line in p.read_text().splitlines():
                    a = json.loads(line)
                    if "metaData" in a:
                        out.append(a["metaData"]["id"])
            return out

        ids = _ids()
        assert len(ids) == 2 and len(set(ids)) == 1
        # torn marker: next mirror restarts full, no crash
        (log / ".txn_mirror.json").write_text("{ torn")
        export_delta_log(t, mode="mirror")
        assert read_delta(spark, str(t.root)).count() == 6

    def test_mirror_midloop_failure_keeps_published_commits_immutable(
        self, spark, lake
    ):
        """Round-8 review 4: the marker advances per processed
        version AFTER its commit, so published commits are never
        regenerated (or clobbered) by later mirror runs — pinned
        byte-for-byte across a DV commit and a compact rewrite."""
        t = TxnTable(lake, "m6", stats_cols=["k"])
        t.append(spark.range(0, 10).selectExpr("id as k", "'a' as v"))
        log = export_delta_log(t, mode="mirror")
        t.append(spark.range(10, 14).selectExpr("id as k", "'b' as v"))
        t.delete_where(F.col("k") < 2, merge_on_read=True)  # dv HEAD
        export_delta_log(t, mode="mirror")  # append + DV commits
        c1 = (log / f"{1:020d}.json")
        c2 = (log / f"{2:020d}.json")
        assert c1.exists() and c2.exists()
        before = (c1.read_text(), c2.read_text())
        assert read_delta(spark, str(t.root)).count() == 12
        t.compact(target_files=1)
        export_delta_log(t, mode="mirror")
        # published commits untouched byte-for-byte; table reads right
        assert (c1.read_text(), c2.read_text()) == before
        assert read_delta(spark, str(t.root)).count() == 12
        got = {r["k"] for r in read_delta(spark, str(t.root)).collect()}
        assert got == set(range(2, 14))

    def test_mirror_refuses_pre_spec_files_on_spec_change(
        self, spark, lake
    ):
        """Round-8 review 4: a partition-spec change re-scopes every
        published file — survivors exported under the old spec would
        silently read NULL partition values; the mirror validates the
        WHOLE snapshot on a spec change, like replace mode."""
        t = TxnTable(lake, "m7", stats_cols=["k"])
        t.append(
            spark.createDataFrame([(1, "a"), (2, "b")], "k INT, site STRING")
        )
        export_delta_log(t, mode="mirror")
        t2 = TxnTable(lake, "m7", partition_cols=["site"], stats_cols=["k"])
        t2.append(
            spark.createDataFrame([(3, "a")], "k INT, site STRING")
        )
        with pytest.raises(ValueError, match="partition spec"):
            export_delta_log(t2, mode="mirror")
        t2.compact(target_files=1)  # rewrites under the current spec
        export_delta_log(t2, mode="mirror")
        back = read_delta(spark, str(t2.root))
        assert {(r["k"], r["site"]) for r in back.collect()} == {
            (1, "a"), (2, "b"), (3, "a"),
        }
        assert back.filter(F.col("site").isNull()).count() == 0

    def test_mirror_recovers_from_crash_between_commit_and_marker(
        self, spark, lake
    ):
        """Round-8 review 5: a crash after a commit published but
        before the marker recorded it leaves an orphan above the
        marker; the retry must clean it and resume — not collide with
        it forever."""
        t = TxnTable(lake, "m8", stats_cols=["k"])
        t.append(spark.range(0, 6).selectExpr("id as k", "'a' as v"))
        log = export_delta_log(t, mode="mirror")
        t.append(spark.range(6, 9).selectExpr("id as k", "'b' as v"))
        # simulate the torn run: an unacknowledged commit 1 exists,
        # marker still says delta_version=0
        (log / f"{1:020d}.json").write_text(
            json.dumps({"add": {"path": "garbage.parquet",
                                "partitionValues": {}, "size": 1,
                                "modificationTime": 0,
                                "dataChange": True}}) + "\n"
        )
        export_delta_log(t, mode="mirror")  # recovers, no collision
        back = read_delta(spark, str(t.root))
        assert back.count() == 9  # the orphan's garbage add is gone
        assert {r["k"] for r in back.collect()} == set(range(9))

    def test_mirror_refuses_spec_narrowing_without_rewrite(
        self, spark, lake
    ):
        """Round-8 review 5: narrowing the partition spec leaves
        survivors' data files without the dropped path column — no
        manifest check can prove them readable, so only a full
        rewrite (compact) mirrors a spec change."""
        t = TxnTable(
            lake, "m9",
            partition_cols=["site", "region"], stats_cols=["k"],
        )
        t.append(
            spark.createDataFrame(
                [(1, "a", "eu"), (2, "b", "us")],
                "k INT, site STRING, region STRING",
            )
        )
        export_delta_log(t, mode="mirror")
        t2 = TxnTable(lake, "m9", partition_cols=["site"], stats_cols=["k"])
        t2.append(
            spark.createDataFrame(
                [(3, "a", "eu")], "k INT, site STRING, region STRING"
            )
        )
        with pytest.raises(ValueError, match="full rewrite"):
            export_delta_log(t2, mode="mirror")
        t2.compact(target_files=1)
        export_delta_log(t2, mode="mirror")
        back = read_delta(spark, str(t2.root))
        assert back.filter(F.col("region").isNull()).count() == 0
        assert back.count() == 3

    def test_replace_rewind_mints_fresh_table_id(self, spark, lake):
        """Round-8 review 5: a replace-mode export REWINDS the Delta
        history to version 0 — the fresh metaData.id is the loud
        'table was replaced' signal streaming consumers detect."""
        t = TxnTable(lake, "m10", stats_cols=["k"])
        t.append(spark.range(0, 5).selectExpr("id as k"))
        log = export_delta_log(t, mode="mirror")

        def _id():
            for line in (log / f"{0:020d}.json").read_text().splitlines():
                a = json.loads(line)
                if "metaData" in a:
                    return a["metaData"]["id"]

        first = _id()
        export_delta_log(t)  # replace: rewind → new incarnation
        assert _id() != first

    def test_streaming_trigger_drives_continuous_mirror(
        self, spark, lake
    ):
        """Composition capstone: readStream tails the TxnTable and
        each micro-batch mirrors the table into the Delta log —
        continuous open-format publishing, the streaming analog of
        the reference's publish-for-downstream contract. The stream
        is purely the trigger (mirror reads its own exact diffs from
        the manifests); the idempotent marker makes replays no-ops."""
        from interop_datalake_spark.streaming.txn_source import (
            read_txn_stream,
        )

        t = TxnTable(lake, "m11", stats_cols=["k"])
        t.append(spark.range(0, 8).selectExpr("id as k", "'a' as v"))
        t.append(spark.range(8, 12).selectExpr("id as k", "'b' as v"))
        t.delete_where(F.col("k") < 2)  # cow rewrite
        stream = read_txn_stream(lake, "m11", max_versions_per_trigger=1)
        q = (
            stream.writeStream.foreachBatch(
                lambda batch_df, epoch_id: export_delta_log(
                    t, mode="mirror"
                )
            )
            .trigger(availableNow=True)
            .option(
                "checkpointLocation",
                str(t.root.parent / "_ckpt_mirror_stream"),
            )
            .start()
        )
        q.awaitTermination(120)
        back = read_delta(spark, str(t.root))
        assert {r["k"] for r in back.collect()} == set(range(2, 12))
        # replaying the mirror once more is a no-op
        log = t.root / "_delta_log"
        commits = sorted(
            p.name for p in log.glob("*.json") if p.stem.isdigit()
        )
        export_delta_log(t, mode="mirror")
        assert sorted(
            p.name for p in log.glob("*.json") if p.stem.isdigit()
        ) == commits

    def test_mirror_lock_excludes_concurrent_writers(self, spark, lake):
        """Round-8 review 6: the crash-recovery unlink is only safe
        under single-writer mirroring — a second concurrent mirror
        must refuse loudly while the lock is held."""
        import fcntl
        import os as _os

        t = TxnTable(lake, "m12", stats_cols=["k"])
        t.append(spark.range(0, 5).selectExpr("id as k"))
        export_delta_log(t, mode="mirror")
        t.append(spark.range(5, 8).selectExpr("id as k"))
        # the lock lives at the TABLE ROOT (outside the log dir, which
        # _full_export rmtree's) and covers BOTH modes: a replace
        # export racing a mirror mid-publish would delete acknowledged
        # commits (round-8 advice)
        fd = _os.open(
            t.root / ".delta_export.lock", _os.O_CREAT | _os.O_RDWR
        )
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            with pytest.raises(ValueError, match="lock"):
                export_delta_log(t, mode="mirror")
            with pytest.raises(ValueError, match="lock"):
                export_delta_log(t, mode="replace")
        finally:
            _os.close(fd)  # releases the flock
        export_delta_log(t, mode="mirror")  # lock free: proceeds
        assert read_delta(spark, str(t.root)).count() == 8

    def test_mirror_spec_reorder_needs_no_rewrite(self, spark, lake):
        """Round-8 review 6: reordering partition_cols drops no
        column — it re-emits metaData and mirrors WITHOUT forcing a
        full rewrite (membership changes still do)."""
        t = TxnTable(
            lake, "m13",
            partition_cols=["site", "region"], stats_cols=["k"],
        )
        t.append(
            spark.createDataFrame(
                [(1, "a", "eu"), (2, "b", "us")],
                "k INT, site STRING, region STRING",
            )
        )
        export_delta_log(t, mode="mirror")
        t2 = TxnTable(
            lake, "m13",
            partition_cols=["region", "site"], stats_cols=["k"],
        )
        t2.append(
            spark.createDataFrame(
                [(3, "c", "ap")], "k INT, site STRING, region STRING"
            )
        )
        export_delta_log(t2, mode="mirror")  # no rewrite required
        back = read_delta(spark, str(t2.root))
        assert {(r["k"], r["site"], r["region"]) for r in back.collect()} == {
            (1, "a", "eu"), (2, "b", "us"), (3, "c", "ap"),
        }
        assert back.filter(
            F.col("site").isNull() | F.col("region").isNull()
        ).count() == 0


class TestCheckpointWriting:
    def test_mirror_writes_checkpoints_and_expiry(self, spark, lake):
        """Every checkpoint_every-th mirror commit writes a classic
        parquet checkpoint + _last_checkpoint; expire_delta_log drops
        the pre-checkpoint history; reads replay from the checkpoint
        and expired time travel refuses loudly."""
        from interop_datalake_spark.lake.delta_interop import (
            expire_delta_log,
        )

        t = TxnTable(lake, "mck", stats_cols=["k"])
        t.append(
            spark.range(0, 10).selectExpr("id as k", "'a' as v").coalesce(1)
        )
        export_delta_log(t, mode="mirror", checkpoint_every=2)
        for i in range(1, 5):
            t.append(
                spark.range(10 * i, 10 * i + 10)
                .selectExpr("id as k", "'a' as v")
                .coalesce(1)
            )
            export_delta_log(t, mode="mirror", checkpoint_every=2)
        log = t.root / "_delta_log"
        assert (log / f"{2:020d}.checkpoint.parquet").exists()
        assert (log / f"{4:020d}.checkpoint.parquet").exists()
        lc = json.loads((log / "_last_checkpoint").read_text())
        assert lc["version"] == 4
        want = {r["k"] for r in t.read().collect()}
        removed = expire_delta_log(t)
        # jsons 0..3 + the older checkpoint at 2
        assert removed == 5
        assert not (log / f"{1:020d}.json").exists()
        assert (log / f"{4:020d}.json").exists()
        got = {r["k"] for r in read_delta(spark, str(t.root)).collect()}
        assert got == want and len(got) == 50
        with pytest.raises(ValueError, match="not present"):
            read_delta(spark, str(t.root), version=1)
        # idempotent: nothing older than the newest checkpoint remains
        assert expire_delta_log(t) == 0

    def test_dv_descriptors_survive_checkpoint_replay(self, spark, lake):
        """A vectored table checkpointed then expired must still read
        correctly from the checkpoint alone — the DV descriptors ride
        the checkpoint's add structs."""
        from interop_datalake_spark.lake.delta_interop import (
            expire_delta_log,
        )

        t = TxnTable(lake, "mckdv", stats_cols=["k"])
        t.append(
            spark.range(0, 40).selectExpr("id as k", "'a' as v").coalesce(1)
        )
        export_delta_log(t, mode="mirror", checkpoint_every=1)
        t.delete_where(F.col("k") % 4 == 0, merge_on_read=True)
        export_delta_log(t, mode="mirror", checkpoint_every=1)
        log = t.root / "_delta_log"
        assert (log / f"{1:020d}.checkpoint.parquet").exists()
        assert expire_delta_log(t) >= 1
        # version 0's json is gone: this replay MUST come from the
        # checkpoint, which must carry the protocol upgrade + DVs
        got = {r["k"] for r in read_delta(spark, str(t.root)).collect()}
        assert got == {k for k in range(40) if k % 4 != 0}


class TestColumnMapping:
    """delta.columnMapping.mode=name: physical parquet names resolve
    through the schemaString's per-field metadata — top-level AND
    nested — while the caller sees only logical names."""

    def _write_mapped_table(self, spark, root):
        (root / "_delta_log").mkdir(parents=True)
        df = spark.createDataFrame(
            [
                (k, (k * 10, f"s{k}"), "east" if k < 5 else "west")
                for k in range(10)
            ],
            "`col-aaa` INT, `col-bbb` STRUCT<`col-x1`: INT, "
            "`col-y1`: STRING>, `col-ppp` STRING",
        )
        rels = {}
        for part in ("east", "west"):
            sub = df.filter(F.col("col-ppp") == part).drop("col-ppp")
            sub.coalesce(1).write.parquet(str(root / "stage" / part))
            rels[part] = f"stage/{part}/" + next(
                p.name
                for p in (root / "stage" / part).iterdir()
                if p.name.endswith(".parquet")
            )
        fields = [
            {"name": "k", "type": "integer", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaa"}},
            {"name": "payload", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bbb"},
             "type": {"type": "struct", "fields": [
                 {"name": "x", "type": "integer", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 3,
                               "delta.columnMapping.physicalName": "col-x1"}},
                 {"name": "y", "type": "string", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 4,
                               "delta.columnMapping.physicalName": "col-y1"}},
             ]}},
            {"name": "p", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 5,
                          "delta.columnMapping.physicalName": "col-ppp"}},
        ]
        schema_string = json.dumps({"type": "struct", "fields": fields})
        actions = [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["columnMapping"],
                          "writerFeatures": ["columnMapping"]}},
            {"metaData": {"id": "cm-1",
                          "format": {"provider": "parquet", "options": {}},
                          "schemaString": schema_string,
                          "partitionColumns": ["p"],
                          "configuration": {
                              "delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "5",
                          }}},
            {"add": {"path": rels["east"],
                     "partitionValues": {"col-ppp": "east"},
                     "size": 1, "modificationTime": 0, "dataChange": True,
                     "stats": json.dumps({"numRecords": 5,
                                          "minValues": {"col-aaa": 0},
                                          "maxValues": {"col-aaa": 4}})}},
            {"add": {"path": rels["west"],
                     "partitionValues": {"col-ppp": "west"},
                     "size": 1, "modificationTime": 0, "dataChange": True,
                     "stats": json.dumps({"numRecords": 5,
                                          "minValues": {"col-aaa": 5},
                                          "maxValues": {"col-aaa": 9}})}},
        ]
        (root / "_delta_log" / f"{0:020d}.json").write_text(
            "\n".join(json.dumps(a) for a in actions) + "\n"
        )
        return rels

    def test_name_mapping_reads_logical(self, spark, tmp_path):
        from interop_datalake_spark.lake.delta_interop import delta_files

        root = tmp_path / "cm"
        rels = self._write_mapped_table(spark, root)
        df = read_delta(spark, str(root))
        assert df.columns == ["k", "payload", "p"]
        assert df.schema["payload"].dataType.fieldNames() == ["x", "y"]
        got = {
            (r["k"], r["payload"]["x"], r["payload"]["y"], r["p"])
            for r in df.collect()
        }
        assert got == {
            (k, k * 10, f"s{k}", "east" if k < 5 else "west")
            for k in range(10)
        }
        # logical predicates prune through physical stats + pv keys
        assert delta_files(str(root), key_range=("k", 7, 7)) == [
            rels["west"]
        ]
        assert delta_files(
            str(root), partition_filter={"p": "east"}
        ) == [rels["east"]]
        pruned = read_delta(
            spark, str(root), partition_filter={"p": "east"},
            key_range=("k", 2, 3),
        )
        assert {r["k"] for r in pruned.collect()} == {2, 3}

    def test_id_mapping_on_name_shaped_table(self, spark, tmp_path):
        """A mode=id table whose parquet files are written with
        matching field ids (the _write_mapped_table fixture's
        schemaString already records ids 1..5) reads identically to
        name mode — the files here carry NO parquet field ids, which
        under mode=id is the delta-spark physicalName fallback shape
        only when Spark's fieldId reader tolerates it; this pin
        documents the REFUSAL instead (ids required end-to-end)."""
        root = tmp_path / "cmid"
        self._write_mapped_table(spark, root)
        log = root / "_delta_log" / f"{0:020d}.json"
        log.write_text(
            log.read_text().replace(
                '"delta.columnMapping.mode": "name"',
                '"delta.columnMapping.mode": "id"',
            )
        )
        # schema ids are present, so the read proceeds by field id;
        # the parquet files were written WITHOUT ids by plain Spark,
        # so the scan errors loudly rather than silently NULLing
        with pytest.raises(Exception):
            read_delta(spark, str(root)).collect()

    def test_id_mapping_reads_by_field_id(self, spark, tmp_path):
        """mode=id END-TO-END: the parquet files' column NAMES are
        garbage (neither logical nor physicalName), but their field
        ids match the schemaString's delta.columnMapping.id — the
        read must resolve strictly by id (a name-based fallback
        would produce all-NULL columns)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = tmp_path / "cmid2"
        (root / "_delta_log").mkdir(parents=True)
        (root / "stage").mkdir()
        pa_schema = pa.schema([
            pa.field("junk_a", pa.int32(),
                     metadata={b"PARQUET:field_id": b"1"}),
            pa.field("junk_b", pa.string(),
                     metadata={b"PARQUET:field_id": b"2"}),
        ])
        tbl = pa.table(
            {
                "junk_a": pa.array([1, 2, 3], pa.int32()),
                "junk_b": pa.array(["x", "y", "z"]),
            },
            schema=pa_schema,
        )
        pq.write_table(tbl, root / "stage" / "f0.parquet")
        fields = [
            {"name": "k", "type": "integer", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName":
                              "col-aaa"}},
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName":
                              "col-bbb"}},
        ]
        actions = [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["columnMapping"],
                          "writerFeatures": ["columnMapping"]}},
            {"metaData": {"id": "cm-id",
                          "format": {"provider": "parquet",
                                     "options": {}},
                          "schemaString": json.dumps(
                              {"type": "struct", "fields": fields}
                          ),
                          "partitionColumns": [],
                          "configuration": {
                              "delta.columnMapping.mode": "id",
                              "delta.columnMapping.maxColumnId": "2",
                          }}},
            {"add": {"path": "stage/f0.parquet",
                     "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ]
        (root / "_delta_log" / f"{0:020d}.json").write_text(
            "\n".join(json.dumps(a) for a in actions) + "\n"
        )
        df = read_delta(spark, str(root))
        assert df.columns == ["k", "v"]
        got = {(r["k"], r["v"]) for r in df.collect()}
        assert got == {(1, "x"), (2, "y"), (3, "z")}


class TestV2Checkpoint:
    def test_v2_checkpoint_with_sidecars_reads(self, spark, tmp_path):
        """A hand-built V2 (UUID-named) checkpoint: the manifest
        carries checkpointMetadata/protocol/metaData/sidecar rows;
        the add set lives in TWO sidecar parquets under _sidecars/.
        Replay must reconstruct the table from the checkpoint plus
        the JSON tail, including an expired (deleted) v0 json."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = tmp_path / "v2ck"
        log = root / "_delta_log"
        (log / "_sidecars").mkdir(parents=True)
        rels = {}
        for name, lo, hi in (("f1", 0, 3), ("f2", 3, 6), ("f3", 6, 8)):
            df = spark.range(lo, hi).selectExpr("id as k")
            df.coalesce(1).write.parquet(str(root / "stage" / name))
            rels[name] = f"stage/{name}/" + next(
                p.name
                for p in (root / "stage" / name).iterdir()
                if p.name.endswith(".parquet")
            )
        schema_string = json.dumps(
            {"type": "struct", "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {}}]}
        )
        add_t = pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ])

        def sidecar(fname, paths):
            tbl = pa.Table.from_pylist(
                [
                    {"add": {"path": p, "partitionValues": {},
                             "size": 1, "modificationTime": 0,
                             "dataChange": True}}
                    for p in paths
                ],
                schema=pa.schema([("add", add_t)]),
            )
            pq.write_table(tbl, log / "_sidecars" / fname)
            return fname

        s1 = sidecar("sc-1.parquet", [rels["f1"]])
        s2 = sidecar("sc-2.parquet", [rels["f2"]])
        manifest_schema = pa.schema([
            ("checkpointMetadata", pa.struct([("version", pa.int64())])),
            ("protocol", pa.struct([
                ("minReaderVersion", pa.int32()),
                ("minWriterVersion", pa.int32()),
                ("readerFeatures", pa.list_(pa.string())),
                ("writerFeatures", pa.list_(pa.string())),
            ])),
            ("metaData", pa.struct([
                ("id", pa.string()),
                ("format", pa.struct([
                    ("provider", pa.string()),
                    ("options", pa.map_(pa.string(), pa.string())),
                ])),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", pa.map_(pa.string(), pa.string())),
                ("createdTime", pa.int64()),
            ])),
            ("sidecar", pa.struct([
                ("path", pa.string()),
                ("sizeInBytes", pa.int64()),
                ("modificationTime", pa.int64()),
            ])),
        ])
        rows = [
            {"checkpointMetadata": {"version": 1}},
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["v2Checkpoint"],
                          "writerFeatures": ["v2Checkpoint"]}},
            {"metaData": {"id": "v2-1",
                          "format": {"provider": "parquet",
                                     "options": {}},
                          "schemaString": schema_string,
                          "partitionColumns": [],
                          "configuration": {},
                          "createdTime": 0}},
            {"sidecar": {"path": s1, "sizeInBytes": 1,
                         "modificationTime": 0}},
            {"sidecar": {"path": s2, "sizeInBytes": 1,
                         "modificationTime": 0}},
        ]
        pq.write_table(
            pa.Table.from_pylist(rows, schema=manifest_schema),
            log / f"{1:020d}.checkpoint.abc-123.parquet",
        )
        # JSON tail after the checkpoint adds f3 (v0/v1 jsons expired)
        (log / f"{2:020d}.json").write_text(
            json.dumps({"add": {"path": rels["f3"],
                                "partitionValues": {}, "size": 1,
                                "modificationTime": 0,
                                "dataChange": True}}) + "\n"
        )
        got = {r["k"] for r in read_delta(spark, str(root)).collect()}
        assert got == set(range(8))
        # VERSION AS OF the checkpoint itself: sidecar adds only
        got1 = {
            r["k"]
            for r in read_delta(spark, str(root), version=1).collect()
        }
        assert got1 == set(range(6))
        # a missing sidecar refuses loudly
        (log / "_sidecars" / s2).unlink()
        with pytest.raises(ValueError, match="sidecar"):
            read_delta(spark, str(root))

    def test_v2_manifest_version_mismatch_refuses(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = tmp_path / "v2bad"
        log = root / "_delta_log"
        log.mkdir(parents=True)
        schema = pa.schema([
            ("checkpointMetadata", pa.struct([("version", pa.int64())])),
            ("add", pa.struct([("path", pa.string())])),
        ])
        pq.write_table(
            pa.Table.from_pylist(
                [{"checkpointMetadata": {"version": 9}}], schema=schema
            ),
            log / f"{1:020d}.checkpoint.zzz.parquet",
        )
        with pytest.raises(ValueError, match="claims version"):
            read_delta(spark, str(root))


def test_exported_commits_carry_commit_info(spark, lake):
    """Every exported commit leads with a commitInfo provenance row
    (DESCRIBE HISTORY surface): WRITE for appends, OPTIMIZE for
    compaction — and the replay ignores it."""
    t = TxnTable(lake, "dci", stats_cols=["k"])
    t.append(spark.range(0, 6).selectExpr("id as k").coalesce(1))
    export_delta_log(t, mode="mirror")
    t.compact(target_files=1)
    export_delta_log(t, mode="mirror")
    log = t.root / "_delta_log"

    def first_action(v):
        return json.loads(
            (log / f"{v:020d}.json").read_text().splitlines()[0]
        )

    ci0 = first_action(0)["commitInfo"]
    assert ci0["operation"] == "WRITE"
    assert ci0["operationParameters"]["txnVersion"] == "1"
    ci1 = first_action(1)["commitInfo"]
    assert ci1["operation"] == "OPTIMIZE"
    assert read_delta(spark, str(t.root)).count() == 6


def test_id_gate_descends_array_and_map_nests():
    """columnMapping=id missing-id detection walks through array
    elements and map keys/values: a struct-in-array subfield with no
    delta.columnMapping.id is corrupt metadata and refuses (it would
    otherwise silently fall back to name matching); a fully-id'd
    schema with the same nesting passes."""
    from interop_datalake_spark.lake.delta_interop import (
        _check_reader_features,
    )

    def meta_of(fields):
        return {
            "configuration": {"delta.columnMapping.mode": "id"},
            "schemaString": json.dumps(
                {"type": "struct", "fields": fields}
            ),
        }

    idm = lambda i: {  # noqa: E731
        "delta.columnMapping.id": i,
        "delta.columnMapping.physicalName": f"col-{i}",
    }
    nested_bad = [
        {"name": "arr", "nullable": True, "metadata": idm(1),
         "type": {"type": "array", "containsNull": True,
                  "elementType": {"type": "struct", "fields": [
                      {"name": "x", "type": "integer",
                       "nullable": True, "metadata": {}},  # NO id
                  ]}}},
    ]
    with pytest.raises(ValueError, match=r"arr\.element\.x"):
        _check_reader_features(meta_of(nested_bad), None)
    map_bad = [
        {"name": "m", "nullable": True, "metadata": idm(1),
         "type": {"type": "map", "valueContainsNull": True,
                  "keyType": "string",
                  "valueType": {"type": "struct", "fields": [
                      {"name": "y", "type": "long",
                       "nullable": True, "metadata": {}},  # NO id
                  ]}}},
    ]
    with pytest.raises(ValueError, match=r"m\.value\.y"):
        _check_reader_features(meta_of(map_bad), None)
    nested_ok = [
        {"name": "arr", "nullable": True, "metadata": idm(1),
         "type": {"type": "array", "containsNull": True,
                  "elementType": {"type": "struct", "fields": [
                      {"name": "x", "type": "integer",
                       "nullable": True, "metadata": idm(2)},
                  ]}}},
        {"name": "m", "nullable": True, "metadata": idm(3),
         "type": {"type": "map", "valueContainsNull": True,
                  "keyType": "string",
                  "valueType": {"type": "struct", "fields": [
                      {"name": "y", "type": "long",
                       "nullable": True, "metadata": idm(4)},
                  ]}}},
    ]
    _check_reader_features(meta_of(nested_ok), None)  # no raise


class TestV2CheckpointWriting:
    def test_mirror_writes_v2_checkpoints(self, spark, lake):
        """checkpoint_format='v2': the mirror publishes UUID-named
        manifests + _sidecars parquet, upgrades the protocol to claim
        v2Checkpoint, replays checkpoint-only after expiry, and the
        sidecar sweep reclaims superseded files. Classic default is
        byte-shape-unchanged (separate tests pin it)."""
        from interop_datalake_spark.lake.delta_interop import (
            expire_delta_log,
        )

        t = TxnTable(lake, "v2ck", stats_cols=["k"])
        t.append(
            spark.range(0, 10).selectExpr("id as k", "'a' as v")
            .coalesce(1)
        )
        export_delta_log(
            t, mode="mirror", checkpoint_every=2,
            checkpoint_format="v2",
        )
        for i in range(1, 5):
            t.append(
                spark.range(10 * i, 10 * i + 10)
                .selectExpr("id as k", "'a' as v")
                .coalesce(1)
            )
            export_delta_log(
                t, mode="mirror", checkpoint_every=2,
                checkpoint_format="v2",
            )
        log = t.root / "_delta_log"
        v2_manifests = sorted(log.glob("*.checkpoint.*.parquet"))
        assert [p.name.split(".")[0] for p in v2_manifests] == [
            f"{2:020d}", f"{4:020d}",
        ]
        assert all(len(p.name.split(".")) == 4 for p in v2_manifests)
        sidecars = list((log / "_sidecars").glob("*.parquet"))
        assert len(sidecars) == 2
        # protocol claims the v2Checkpoint feature in the log
        proto = next(
            json.loads(line)["protocol"]
            for line in (log / f"{0:020d}.json").read_text()
            .splitlines()
            if '"protocol"' in line
        )
        assert "v2Checkpoint" in proto["readerFeatures"]
        assert "v2Checkpoint" in proto["writerFeatures"]
        assert proto["minReaderVersion"] == 3
        want = {r["k"] for r in t.read().collect()}
        assert {
            r["k"] for r in read_delta(spark, str(t.root)).collect()
        } == want
        # expiry: pre-checkpoint history AND the superseded v2
        # manifest + its orphaned sidecar go; replay is
        # checkpoint-only and still correct
        removed = expire_delta_log(t)
        assert removed >= 5
        assert not (log / f"{1:020d}.json").exists()
        assert len(list(log.glob("*.checkpoint.*.parquet"))) == 1
        assert len(list((log / "_sidecars").glob("*.parquet"))) == 1
        assert {
            r["k"] for r in read_delta(spark, str(t.root)).collect()
        } == want and len(want) == 50

    def test_classic_to_v2_transition_and_streams(
        self, spark, lake, tmp_path
    ):
        """A classic mirror continued with checkpoint_format='v2'
        emits the protocol upgrade in the next published commit; the
        delta_appends stream keeps streaming across it (v2Checkpoint
        is stream-safe), and a vectored v2 checkpoint replays its DV
        descriptors after expiry."""
        from interop_datalake_spark.lake.delta_interop import (
            expire_delta_log,
        )
        from interop_datalake_spark.streaming.delta_source import (
            read_delta_stream,
        )

        t = TxnTable(lake, "v2ck2", stats_cols=["k"])
        t.append(
            spark.range(0, 15).selectExpr("id as k").coalesce(1)
        )
        export_delta_log(t, mode="mirror", checkpoint_every=1)
        t.append(
            spark.range(15, 20).selectExpr("id as k").coalesce(1)
        )
        export_delta_log(t, mode="mirror", checkpoint_every=1)
        log = t.root / "_delta_log"
        # classic shape at commit 1 (the full export at v0 writes no
        # checkpoint), and no v2Checkpoint claim yet
        assert (log / f"{1:020d}.checkpoint.parquet").exists()
        proto0 = next(
            json.loads(line)["protocol"]
            for line in (log / f"{0:020d}.json").read_text()
            .splitlines()
            if '"protocol"' in line
        )
        assert "readerFeatures" not in proto0

        got: list = []
        q = (
            read_delta_stream(spark, str(t.root))
            .writeStream.foreachBatch(
                lambda b, e: got.extend(b.collect())
            )
            .option("checkpointLocation", str(tmp_path / "v2ck_s"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        assert sorted(r.k for r in got) == list(range(20))

        t.append(spark.range(20, 25).selectExpr("id as k").coalesce(1))
        export_delta_log(
            t, mode="mirror", checkpoint_every=1,
            checkpoint_format="v2",
        )
        proto = next(
            json.loads(line)["protocol"]
            for line in (log / f"{2:020d}.json").read_text()
            .splitlines()
            if '"protocol"' in line
        )
        assert "v2Checkpoint" in proto["readerFeatures"]
        assert list(log.glob(f"{2:020d}.checkpoint.*.parquet"))
        # the stream resumes across the upgrade commit
        got2: list = []
        q2 = (
            read_delta_stream(spark, str(t.root))
            .writeStream.foreachBatch(
                lambda b, e: got2.extend(b.collect())
            )
            .option("checkpointLocation", str(tmp_path / "v2ck_s"))
            .trigger(availableNow=True)
            .start()
        )
        assert q2.awaitTermination(120)
        assert sorted(r.k for r in got2) == list(range(20, 25))

        # vectored v2 checkpoint: DV descriptors ride the sidecar
        t.delete_where(F.col("k") % 3 == 0, merge_on_read=True)
        export_delta_log(
            t, mode="mirror", checkpoint_every=1,
            checkpoint_format="v2",
        )
        assert expire_delta_log(t) >= 1
        got3 = {
            r["k"] for r in read_delta(spark, str(t.root)).collect()
        }
        assert got3 == {k for k in range(25) if k % 3 != 0}
        with pytest.raises(ValueError, match="checkpoint_format"):
            export_delta_log(t, checkpoint_format="v3")
