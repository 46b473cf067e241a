"""Foreign-Delta CHANGE DATA FEED read (lake/delta_interop.py:
read_delta_changes): the table_changes()/readChangeFeed analog over a
raw ``_delta_log``. Validated three ways so the reader can't just
agree with the exporter on a shared mistake:

1. against ``TxnTable.read_changes(include_deletes=True)`` over the
   SAME mirrored history (the two derive the same change sets through
   entirely different code paths — manifest diffs vs log actions);
2. against hand-written commits carrying ``cdc`` actions +
   ``_change_data`` parquet files (the authoritative protocol shape
   delta-spark writers produce — add/remove in the same commit must
   be IGNORED);
3. shape-by-shape derivation checks: copy-on-write remove+add, DV
   position diffs, restores, OPTIMIZE no-ops, refusals.
"""

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
    read_delta_changes,
)
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture()
def lake(spark):
    root = tempfile.mkdtemp(prefix="delta_cdf_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


def _changes_set(df, cols):
    return {
        tuple(r[c] for c in cols)
        for r in df.select(*cols).collect()
    }


class TestMirrorParity:
    def test_matches_txn_change_feed(self, spark, lake):
        """Mirrored append → MOR delete → MOR merge history: the
        foreign-CDF read of the exported log reproduces the
        TxnTable's own delete-emitting change feed row for row
        (modulo the version offset: TxnTable v1.. ↔ Delta v0..)."""
        t = TxnTable(lake, "cdf1", stats_cols=["k"])
        t.append(
            spark.range(0, 40)
            .selectExpr("id as k", "cast(id % 4 as int) as g")
            .repartition(3)
        )
        export_delta_log(t, mode="mirror")
        t.delete_where(F.col("k") % 5 == 0, merge_on_read=True)
        export_delta_log(t, mode="mirror")
        up = spark.createDataFrame(
            [(2, 99), (100, 7)], "k BIGINT, g INT"
        )
        t.merge(up, ["k"], merge_on_read=True)
        export_delta_log(t, mode="mirror")

        want = {
            (r["k"], r["g"], r["_change_type"], r["_commit_version"])
            for r in t.read_changes(0, include_deletes=True).collect()
        }
        got = {
            (r["k"], r["g"], r["_change_type"], r["_commit_version"] + 1)
            for r in read_delta_changes(spark, str(t.root), -1).collect()
        }
        assert got == want
        # _commit_timestamp is populated everywhere
        assert (
            read_delta_changes(spark, str(t.root), -1)
            .filter(F.col("_commit_timestamp").isNull())
            .count()
            == 0
        )

    def test_window_and_empty_range(self, spark, lake):
        t = TxnTable(lake, "cdf2", stats_cols=["k"])
        t.append(spark.range(0, 5).selectExpr("id as k"))
        export_delta_log(t, mode="mirror")
        t.append(spark.range(5, 8).selectExpr("id as k"))
        export_delta_log(t, mode="mirror")
        # only the second commit's window
        got = _changes_set(
            read_delta_changes(spark, str(t.root), 0),
            ["k", "_change_type", "_commit_version"],
        )
        assert got == {(k, "insert", 1) for k in range(5, 8)}
        # empty window → empty frame with the full CDF schema
        empty = read_delta_changes(spark, str(t.root), 1)
        assert empty.count() == 0
        assert set(empty.columns) == {
            "k", "_change_type", "_commit_version", "_commit_timestamp"
        }

    def test_optimize_emits_nothing(self, spark, lake):
        t = TxnTable(lake, "cdf3", stats_cols=["k"])
        t.append(spark.range(0, 10).selectExpr("id as k").repartition(4))
        export_delta_log(t, mode="mirror")
        t.compact(target_files=1)
        export_delta_log(t, mode="mirror")
        assert (
            read_delta_changes(spark, str(t.root), 0).count() == 0
        )

    def test_partitioned_removes_carry_partition_values(
        self, spark, lake
    ):
        """Copy-on-write overwrite of one partition: the mirror's
        remove actions now record partitionValues (extended file
        metadata), so the CDF read reconstructs the deleted rows'
        partition columns."""
        t = TxnTable(lake, "cdf4", partition_cols=["site"],
                     stats_cols=["k"])
        t.append(
            spark.createDataFrame(
                [(1, "a"), (2, "a"), (3, "b")], "k INT, site STRING"
            )
        )
        export_delta_log(t, mode="mirror")
        t.overwrite_partitions(
            spark.createDataFrame([(9, "a")], "k INT, site STRING")
        )
        export_delta_log(t, mode="mirror")
        got = _changes_set(
            read_delta_changes(spark, str(t.root), 0),
            ["k", "site", "_change_type"],
        )
        assert got == {
            (1, "a", "delete"),
            (2, "a", "delete"),
            (9, "a", "insert"),
        }


_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "integer", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    }
)


def _base_actions():
    return [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        {"metaData": {"id": "cdf-tbl",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": _SCHEMA_STRING,
                      "partitionColumns": [],
                      "configuration": {
                          "delta.enableChangeDataFeed": "true"
                      }}},
    ]


def _write_parquet(spark, root, sub, rows, schema):
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.parquet(str(root / "stage" / sub))
    return f"stage/{sub}/" + next(
        p.name
        for p in (root / "stage" / sub).iterdir()
        if p.name.endswith(".parquet")
    )


def _commit(root, v, actions):
    (root / "_delta_log" / f"{v:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions) + "\n"
    )


class TestCdcActions:
    def test_cdc_actions_are_authoritative(self, spark, tmp_path):
        """A commit with cdc actions: its change data is exactly the
        _change_data files — the same commit's add/remove are ignored
        for CDC (the protocol's Change Data Files rule). This is the
        UPDATE shape delta-spark writes: preimage+postimage rows in
        the cdc file, rewritten files in add/remove."""
        root = tmp_path / "cdc1"
        (root / "_delta_log").mkdir(parents=True)
        f0 = _write_parquet(
            spark, root, "f0", [(1, "a"), (2, "b")], "k INT, v STRING"
        )
        _commit(root, 0, _base_actions() + [
            {"add": {"path": f0, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ])
        # v1: UPDATE k=2 → v='B' (rewrites f0 as f1; cdc file carries
        # the pre/post images)
        f1 = _write_parquet(
            spark, root, "f1", [(1, "a"), (2, "B")], "k INT, v STRING"
        )
        cdc1 = _write_parquet(
            spark, root, "_change_data0",
            [(2, "b", "update_preimage"), (2, "B", "update_postimage")],
            "k INT, v STRING, _change_type STRING",
        )
        _commit(root, 1, [
            {"remove": {"path": f0, "dataChange": True,
                        "partitionValues": {}}},
            {"add": {"path": f1, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
            {"cdc": {"path": cdc1, "partitionValues": {}, "size": 1,
                     "dataChange": False}},
            {"commitInfo": {"timestamp": 1700000000000,
                            "operation": "UPDATE"}},
        ])
        got = _changes_set(
            read_delta_changes(spark, str(root), 0),
            ["k", "v", "_change_type", "_commit_version"],
        )
        assert got == {
            (2, "b", "update_preimage", 1),
            (2, "B", "update_postimage", 1),
        }
        # the commitInfo timestamp rides through
        ts = (
            read_delta_changes(spark, str(root), 0)
            .select("_commit_timestamp")
            .first()[0]
        )
        assert ts is not None and ts.year == 2023
        # whole-history read: v0 derives inserts, v1 uses cdc
        full = _changes_set(
            read_delta_changes(spark, str(root), -1),
            ["k", "v", "_change_type", "_commit_version"],
        )
        assert full == got | {
            (1, "a", "insert", 0), (2, "b", "insert", 0),
        }
        # and the snapshot read agrees with the folded changes
        snap = {(r["k"], r["v"])
                for r in read_delta(spark, str(root)).collect()}
        assert snap == {(1, "a"), (2, "B")}

    def test_copy_on_write_derivation(self, spark, tmp_path):
        """No cdc actions: remove emits the file's rows as delete,
        add emits as insert (delta-spark CDCReader's derivation)."""
        root = tmp_path / "cdc2"
        (root / "_delta_log").mkdir(parents=True)
        f0 = _write_parquet(
            spark, root, "f0", [(1, "a"), (2, "b")], "k INT, v STRING"
        )
        f1 = _write_parquet(
            spark, root, "f1", [(1, "a")], "k INT, v STRING"
        )
        _commit(root, 0, _base_actions() + [
            {"add": {"path": f0, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ])
        _commit(root, 1, [
            {"remove": {"path": f0, "dataChange": True}},
            {"add": {"path": f1, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ])
        got = _changes_set(
            read_delta_changes(spark, str(root), 0),
            ["k", "v", "_change_type"],
        )
        assert got == {
            (1, "a", "delete"), (2, "b", "delete"), (1, "a", "insert"),
        }

    def test_refusals(self, spark, tmp_path, lake):
        # expired window
        t = TxnTable(lake, "cdfr", stats_cols=["k"])
        t.append(spark.range(0, 3).selectExpr("id as k").coalesce(1))
        export_delta_log(t, mode="mirror", checkpoint_every=2)
        for i in range(1, 3):
            t.append(
                spark.range(3 * i, 3 * i + 3)
                .selectExpr("id as k")
                .coalesce(1)
            )
            export_delta_log(t, mode="mirror", checkpoint_every=2)
        from interop_datalake_spark.lake.delta_interop import (
            expire_delta_log,
        )

        assert expire_delta_log(t) > 0
        with pytest.raises(ValueError, match="expired"):
            read_delta_changes(spark, str(t.root), -1)
        # a retained window still reads
        assert read_delta_changes(spark, str(t.root), 1).count() == 3
        # partitioned remove without partitionValues
        root2 = tmp_path / "cdcp"
        (root2 / "_delta_log").mkdir(parents=True)
        fa = _write_parquet(
            spark, root2, "fa", [(1, "x")], "k INT, v STRING"
        )
        schema = json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "k", "type": "integer", "nullable": True,
                     "metadata": {}},
                    {"name": "v", "type": "string", "nullable": True,
                     "metadata": {}},
                    {"name": "p", "type": "string", "nullable": True,
                     "metadata": {}},
                ],
            }
        )
        _commit(root2, 0, [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "pp",
                          "format": {"provider": "parquet",
                                     "options": {}},
                          "schemaString": schema,
                          "partitionColumns": ["p"],
                          "configuration": {}}},
            {"add": {"path": fa, "partitionValues": {"p": "e"},
                     "size": 1, "modificationTime": 0,
                     "dataChange": True}},
        ])
        _commit(root2, 1, [
            {"remove": {"path": fa, "dataChange": True}},
        ])
        with pytest.raises(ValueError, match="partitionValues"):
            read_delta_changes(spark, str(root2), -1).collect()


class TestMappedCdf:
    def test_name_mapped_table_reads_logical_changes(
        self, spark, tmp_path
    ):
        """columnMapping=name: derivation scans physical column names
        and renames back — change rows come out fully logical (the
        round-12 lift of the mapped-CDF refusal)."""
        root = tmp_path / "cdfm"
        (root / "_delta_log").mkdir(parents=True)
        f0 = _write_parquet(
            spark, root, "f0", [(1, "a"), (2, "b")],
            "`col-aaa` INT, `col-bbb` STRING",
        )
        f1 = _write_parquet(
            spark, root, "f1", [(1, "a")],
            "`col-aaa` INT, `col-bbb` STRING",
        )
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
        _commit(root, 0, [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["columnMapping"],
                          "writerFeatures": ["columnMapping"]}},
            {"metaData": {"id": "cdf-cm",
                          "format": {"provider": "parquet",
                                     "options": {}},
                          "schemaString": json.dumps(
                              {"type": "struct", "fields": fields}
                          ),
                          "partitionColumns": [],
                          "configuration": {
                              "delta.columnMapping.mode": "name"
                          }}},
            {"add": {"path": f0, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ])
        _commit(root, 1, [
            {"remove": {"path": f0, "dataChange": True}},
            {"add": {"path": f1, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ])
        df = read_delta_changes(spark, str(root), -1)
        assert set(df.columns) == {
            "k", "v", "_change_type", "_commit_version",
            "_commit_timestamp",
        }
        got = _changes_set(
            df, ["k", "v", "_change_type", "_commit_version"]
        )
        assert got == {
            (1, "a", "insert", 0), (2, "b", "insert", 0),
            (1, "a", "delete", 1), (2, "b", "delete", 1),
            (1, "a", "insert", 1),
        }


class TestChangeDataWrite:
    """export_delta_log(change_data=True): the mirror writes Delta
    CHANGE DATA FILES (cdc actions + _change_data parquet) for
    DV-update commits, claims the changeDataFeed writer feature, and
    sets delta.enableChangeDataFeed — so compliant engines (and this
    repo's own CDF readers, via the authoritative-cdc route instead
    of derivation) consume the mirrored change feed directly."""

    def _actions(self, log_dir, v):
        return [
            json.loads(line)
            for line in (log_dir / f"{v:020d}.json")
            .read_text()
            .splitlines()
            if line.strip()
        ]

    def test_dv_commit_writes_cdc_and_reads_back(self, spark, lake):
        t = TxnTable(lake, "cdw1", stats_cols=["k"])
        t.append(
            spark.range(0, 30)
            .selectExpr("id as k", "cast(id % 3 as int) as g")
            .repartition(2)
        )
        log_dir = export_delta_log(t, mode="mirror", change_data=True)
        # v0: vector-free + CDF → legacy writer version 4, config set
        a0 = self._actions(log_dir, 0)
        proto0 = next(a["protocol"] for a in a0 if "protocol" in a)
        assert proto0 == {"minReaderVersion": 1, "minWriterVersion": 4}
        meta0 = next(a["metaData"] for a in a0 if "metaData" in a)
        assert meta0["configuration"] == {
            "delta.enableChangeDataFeed": "true"
        }
        assert not any("cdc" in a for a in a0)  # adds derive as inserts

        t.delete_where(F.col("k") % 4 == 0, merge_on_read=True)
        export_delta_log(t, mode="mirror", change_data=True)
        a1 = self._actions(log_dir, 1)
        proto1 = next(a["protocol"] for a in a1 if "protocol" in a)
        assert set(proto1["writerFeatures"]) == {
            "deletionVectors", "changeDataFeed",
        }
        cdc1 = [a["cdc"] for a in a1 if "cdc" in a]
        assert cdc1 and all(c["dataChange"] is False for c in cdc1)
        assert all(
            c["path"].startswith("_change_data/") for c in cdc1
        )
        # the CDF read takes the authoritative cdc route and equals
        # the TxnTable's own change feed
        want = {
            (r["k"], r["g"], r["_change_type"], r["_commit_version"])
            for r in t.read_changes(0, include_deletes=True).collect()
        }
        got = {
            (r["k"], r["g"], r["_change_type"], r["_commit_version"] + 1)
            for r in read_delta_changes(spark, str(t.root), -1).collect()
        }
        assert got == want
        # the snapshot read is untouched by cdc actions
        assert read_delta(spark, str(t.root)).count() == 30 - 8

    def test_partitioned_cdc_files_carry_partition_values(
        self, spark, lake
    ):
        t = TxnTable(lake, "cdw2", partition_cols=["site"],
                     stats_cols=["k"])
        t.append(
            spark.createDataFrame(
                [(1, "a"), (2, "a"), (3, "b"), (4, None)],
                "k INT, site STRING",
            )
        )
        log_dir = export_delta_log(t, mode="mirror", change_data=True)
        t.delete_where(F.col("k").isin(1, 3, 4), merge_on_read=True)
        export_delta_log(t, mode="mirror", change_data=True)
        cdc1 = [
            a["cdc"] for a in self._actions(log_dir, 1) if "cdc" in a
        ]
        assert cdc1
        # partition columns live in partitionValues (NULL partition
        # included), never in the cdc parquet
        assert all(list(c["partitionValues"]) == ["site"] for c in cdc1)
        assert {c["partitionValues"]["site"] for c in cdc1} == {
            "a", "b", None,
        }
        got = {
            (r["k"], r["site"], r["_change_type"])
            for r in read_delta_changes(spark, str(t.root), 0).collect()
        }
        assert got == {
            (1, "a", "delete"), (3, "b", "delete"), (4, None, "delete"),
        }

    def test_cdc_stream_consumes_written_change_data(
        self, spark, lake, tmp_path
    ):
        from interop_datalake_spark.streaming.delta_source import (
            read_delta_cdc_stream,
        )

        t = TxnTable(lake, "cdw3", stats_cols=["k"])
        t.append(spark.range(0, 10).selectExpr("id as k").coalesce(1))
        export_delta_log(t, mode="mirror", change_data=True)
        t.delete_where(F.col("k") < 3, merge_on_read=True)
        export_delta_log(t, mode="mirror", change_data=True)
        got: list = []
        q = (
            read_delta_cdc_stream(spark, str(t.root))
            .writeStream.foreachBatch(
                lambda bdf, eid: got.extend(bdf.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        want = {(k, "insert", 0) for k in range(10)} | {
            (k, "delete", 1) for k in range(3)
        }
        assert {
            (r.k, r._change_type, r._commit_version) for r in got
        } == want

    def test_mid_mirror_cdf_transition(self, spark, lake):
        t = TxnTable(lake, "cdw4", stats_cols=["k"])
        t.append(spark.range(0, 5).selectExpr("id as k").coalesce(1))
        log_dir = export_delta_log(t, mode="mirror")  # CDF off
        a0 = self._actions(log_dir, 0)
        assert next(
            a["protocol"] for a in a0 if "protocol" in a
        )["minWriterVersion"] == 2
        t.append(spark.range(5, 8).selectExpr("id as k").coalesce(1))
        export_delta_log(t, mode="mirror", change_data=True)  # enable
        a1 = self._actions(log_dir, 1)
        assert next(
            a["protocol"] for a in a1 if "protocol" in a
        )["minWriterVersion"] == 4
        assert next(
            a["metaData"] for a in a1 if "metaData" in a
        )["configuration"] == {"delta.enableChangeDataFeed": "true"}
        # steady state: no repeated metaData churn
        t.append(spark.range(8, 9).selectExpr("id as k").coalesce(1))
        export_delta_log(t, mode="mirror", change_data=True)
        a2 = self._actions(log_dir, 2)
        assert not any("metaData" in a for a in a2)
        assert not any("protocol" in a for a in a2)


class TestReviewFixes:
    """Round-12 review findings on the fresh CDF code."""

    def test_folded_commit_suppresses_cdc(self, spark, lake, monkeypatch):
        """A mirror commit that FOLDS a transient-skipped version must
        NOT write cdc (its read_changes window would cover one version
        while the commit's actions cover several — authoritative-cdc
        data loss); derivation keeps the feed net-correct."""
        import interop_datalake_spark.lake.delta_interop as di

        src = TxnTable(lake, "rf1", stats_cols=["k"])
        src.append(
            spark.range(0, 20).selectExpr("id as k").repartition(2)
        )
        log_dir = export_delta_log(src, mode="mirror", change_data=True)
        src.delete_where(F.col("k") < 3, merge_on_read=True)   # txn v2
        src.delete_where(F.col("k") >= 17, merge_on_read=True)  # txn v3
        real = di._collect_txn_dv_indexes
        calls = {"n": 0}

        def flaky(table, m, only=None):
            calls["n"] += 1
            if calls["n"] == 1:
                raise ValueError("transient: simulated over-bound")
            return real(table, m, only=only)

        monkeypatch.setattr(di, "_collect_txn_dv_indexes", flaky)
        export_delta_log(src, mode="mirror", change_data=True)
        monkeypatch.undo()
        # txn v2 skipped, v3 folded into Delta commit 1: no cdc action
        acts = [
            json.loads(line)
            for line in (log_dir / f"{1:020d}.json").read_text().splitlines()
            if line.strip()
        ]
        assert not any("cdc" in a for a in acts)
        assert not (log_dir / f"{2:020d}.json").exists()
        # the derived feed still nets to the right state
        from interop_datalake_spark.lake.cdc_apply import (
            apply_changes_into,
        )

        tgt = TxnTable(lake, "rf1_t", stats_cols=["k"])
        apply_changes_into(
            tgt, read_delta_changes(spark, str(src.root), -1), ["k"]
        )
        assert {r["k"] for r in tgt.read().collect()} == {
            r["k"] for r in src.read().collect()
        } == set(range(3, 17))
        # a following SINGLE-version DV commit writes cdc again
        src.delete_where(F.col("k") == 10, merge_on_read=True)
        export_delta_log(src, mode="mirror", change_data=True)
        acts2 = [
            json.loads(line)
            for line in (log_dir / f"{2:020d}.json").read_text().splitlines()
            if line.strip()
        ]
        assert any("cdc" in a for a in acts2)

    def test_full_export_sweeps_change_data(self, spark, lake):
        t = TxnTable(lake, "rf2", stats_cols=["k"])
        t.append(spark.range(0, 10).selectExpr("id as k").coalesce(1))
        export_delta_log(t, mode="mirror", change_data=True)
        t.delete_where(F.col("k") < 2, merge_on_read=True)
        export_delta_log(t, mode="mirror", change_data=True)
        assert (t.root / "_change_data").exists()
        # snapshot replace: single-commit log, old cdc unreachable
        export_delta_log(t, mode="replace")
        assert not (t.root / "_change_data").exists()
        assert read_delta(spark, str(t.root)).count() == 8

    def test_expire_sweeps_unreferenced_change_data(self, spark, lake):
        from interop_datalake_spark.lake.delta_interop import (
            expire_delta_log,
        )

        t = TxnTable(lake, "rf3", stats_cols=["k"])
        t.append(spark.range(0, 12).selectExpr("id as k").coalesce(1))
        export_delta_log(t, mode="mirror", change_data=True,
                         checkpoint_every=2)
        t.delete_where(F.col("k") < 2, merge_on_read=True)   # Δ1 + cdc
        export_delta_log(t, mode="mirror", change_data=True,
                         checkpoint_every=2)
        t.delete_where(F.col("k") == 11, merge_on_read=True)  # Δ2 + cdc
        export_delta_log(t, mode="mirror", change_data=True,
                         checkpoint_every=2)
        t.delete_where(F.col("k") == 10, merge_on_read=True)  # Δ3 + cdc
        export_delta_log(t, mode="mirror", change_data=True,
                         checkpoint_every=2)
        cdc_files_before = {
            p for p in (t.root / "_change_data").rglob("*.parquet")
        }
        assert len(cdc_files_before) >= 3
        assert expire_delta_log(t) > 0  # drops jsons before the ckpt
        # only the retained commits' cdc files remain, and the
        # retained CDC window still reads
        remaining = {
            p for p in (t.root / "_change_data").rglob("*.parquet")
        }
        assert remaining < cdc_files_before
        kept_window = read_delta_changes(spark, str(t.root), 2)
        assert {
            (r["k"], r["_change_type"])
            for r in kept_window.collect()
        } == {(10, "delete")}

    def test_id_mode_nested_missing_id_refused(self, spark, tmp_path):
        root = tmp_path / "rfid"
        (root / "_delta_log").mkdir(parents=True)
        fields = [
            {"name": "k", "type": "integer", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName":
                              "col-a"}},
            {"name": "payload", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName":
                              "col-b"},
             "type": {"type": "struct", "fields": [
                 # nested field WITHOUT an id: silent name-matching
                 # hazard → must refuse
                 {"name": "x", "type": "integer", "nullable": True,
                  "metadata": {}},
             ]}},
        ]
        _commit(root, 0, [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["columnMapping"],
                          "writerFeatures": ["columnMapping"]}},
            {"metaData": {"id": "rfid",
                          "format": {"provider": "parquet",
                                     "options": {}},
                          "schemaString": json.dumps(
                              {"type": "struct", "fields": fields}
                          ),
                          "partitionColumns": [],
                          "configuration": {
                              "delta.columnMapping.mode": "id"
                          }}},
        ])
        with pytest.raises(ValueError, match="payload.x"):
            read_delta(spark, str(root))
