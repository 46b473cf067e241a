"""Delta ROW TRACKING on the mirror export (round 14 — the Delta twin
of the Iceberg v3 row lineage): export_delta_log(row_tracking=True)
claims the writer-only rowTracking + domainMetadata features, assigns
baseRowId / defaultRowCommitVersion per add with the
delta.rowTracking high-water-mark domain, and
read_delta(with_row_tracking=True) projects _row_id /
_row_commit_version — stable across DV deletes and re-adds, preserved
through checkpoints and log expiry, with copy-on-write rewrites
refused loudly (a zero-copy mirror cannot preserve moved rows' ids)."""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.delta_interop import (
    expire_delta_log,
    export_delta_log,
    read_delta,
)
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture()
def lake(spark):
    root = tempfile.mkdtemp(prefix="drt_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


def _ids(spark, t):
    df = read_delta(spark, str(t.root), with_row_tracking=True)
    return {
        r.k: (r._row_id, r._row_commit_version) for r in df.collect()
    }


def _commits(t):
    out = {}
    for p in sorted((t.root / "_delta_log").glob("*.json")):
        if not p.stem.isdigit():
            continue
        out[int(p.stem)] = [
            json.loads(ln)
            for ln in p.read_text().splitlines()
            if ln.strip()
        ]
    return out


class TestRowTrackingMirror:
    def test_assignment_one_way_and_domain(self, spark, lake):
        t = TxnTable(lake, "rt1", stats_cols=["k"])
        t.append(
            spark.createDataFrame(
                [(i,) for i in range(5)], "k INT"
            ).coalesce(1)
        )
        export_delta_log(t, mode="mirror", row_tracking=True)
        t.append(
            spark.createDataFrame(
                [(i,) for i in range(5, 8)], "k INT"
            ).coalesce(1)
        )
        export_delta_log(t, mode="mirror")  # flag forgotten: one-way
        got = _ids(spark, t)
        assert got == {
            **{i: (i, 0) for i in range(5)},
            **{i: (i, 1) for i in range(5, 8)},
        }
        commits = _commits(t)
        proto = next(
            a for a in commits[0] if "protocol" in a
        )["protocol"]
        assert {"rowTracking", "domainMetadata"} <= set(
            proto["writerFeatures"]
        )
        meta = next(a for a in commits[0] if "metaData" in a)[
            "metaData"
        ]
        assert (
            meta["configuration"]["delta.enableRowTracking"] == "true"
        )
        hwms = [
            json.loads(a["domainMetadata"]["configuration"])[
                "rowIdHighWaterMark"
            ]
            for v in (0, 1)
            for a in commits[v]
            if "domainMetadata" in a
        ]
        assert hwms == [4, 7]
        # plain reads never see the metadata columns
        assert read_delta(spark, str(t.root)).columns == ["k"]

    def test_stable_across_dv_delete_and_readd(self, spark, lake):
        t = TxnTable(lake, "rt2", stats_cols=["k"])
        t.append(
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(8)], "k INT, v STRING"
            ).coalesce(1)
        )
        export_delta_log(t, mode="mirror", row_tracking=True)
        before = _ids(spark, t)
        t.delete_where(F.col("k") % 2 == 1, merge_on_read=True)
        export_delta_log(t, mode="mirror")
        after = _ids(spark, t)
        assert set(after) == {0, 2, 4, 6}
        assert all(after[k] == before[k] for k in after)
        # the DV re-add preserved the base verbatim
        commits = _commits(t)
        readd = next(a for a in commits[1] if "add" in a)["add"]
        assert readd["baseRowId"] == 0
        assert readd["defaultRowCommitVersion"] == 0

    def test_mid_mirror_enablement_backfill_and_checkpoint(
        self, spark, lake
    ):
        t = TxnTable(lake, "rt3", stats_cols=["k"])
        t.append(
            spark.createDataFrame(
                [(i,) for i in range(4)], "k INT"
            ).coalesce(1)
        )
        export_delta_log(t, mode="mirror")  # no rt at creation
        t.append(
            spark.createDataFrame([(4,), (5,)], "k INT").coalesce(1)
        )
        export_delta_log(
            t, mode="mirror", row_tracking=True, checkpoint_every=2
        )
        before = _ids(spark, t)
        # the pre-enablement file was BACKFILLED (dataChange=false
        # re-add carrying its assigned base)
        commits = _commits(t)
        backfills = [
            a["add"]
            for a in commits[1]
            if "add" in a and a["add"]["dataChange"] is False
        ]
        assert len(backfills) == 1
        assert backfills[0]["baseRowId"] is not None
        assert set(before) == set(range(6))
        assert all(v[0] is not None for v in before.values())

        t.append(spark.createDataFrame([(6,)], "k INT").coalesce(1))
        export_delta_log(t, mode="mirror", checkpoint_every=2)
        expire_delta_log(t)  # checkpoint-only replay
        after = _ids(spark, t)
        assert all(after[k] == before[k] for k in before)
        assert after[6][1] == 2

    def test_cow_rewrite_refuses(self, spark, lake):
        t = TxnTable(lake, "rt4", stats_cols=["k"])
        t.append(
            spark.createDataFrame(
                [(i,) for i in range(4)], "k INT"
            ).coalesce(1)
        )
        t.append(
            spark.createDataFrame([(4,)], "k INT").coalesce(1)
        )
        export_delta_log(t, mode="mirror", row_tracking=True)
        t.compact()
        with pytest.raises(ValueError, match="rewrites files"):
            export_delta_log(t, mode="mirror")
        # replace-mode re-export is the documented escape hatch: a
        # fresh table identity signals the id reset
        export_delta_log(t, row_tracking=True)
        got = _ids(spark, t)
        assert set(got) == set(range(5))
        assert sorted(i for i, _ in got.values()) == list(range(5))

    def test_column_clash_refuses(self, spark, lake):
        t = TxnTable(lake, "rt5", stats_cols=["_row_id"])
        t.append(
            spark.createDataFrame([(1,)], "_row_id INT").coalesce(1)
        )
        export_delta_log(t, mode="mirror", row_tracking=True)
        with pytest.raises(ValueError, match="collide"):
            read_delta(spark, str(t.root), with_row_tracking=True)
