"""AS-OF-timestamp time travel: commits record ts_utc; reads resolve
an instant to the latest version committed at or before it.
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timedelta, timezone

import pytest

from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession


@pytest.fixture()
def lake(spark):
    root = tempfile.mkdtemp(prefix="txn_ts_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k INT")


class TestTimestampTravel:
    def test_resolution_and_read(self, spark, lake):
        t = TxnTable(lake, "t")
        t.append(_df(spark, [(1,)]))
        between = datetime.now(timezone.utc)
        t.append(_df(spark, [(2,)]))
        assert t.version_at_timestamp(between) == 1
        assert t.version_at_timestamp(datetime.now(timezone.utc)) == 2
        assert sorted(
            r["k"] for r in t.read(as_of_ts=between).collect()
        ) == [1]
        # ISO-string form and naive-UTC form both resolve
        assert t.version_at_timestamp(between.isoformat()) == 1
        assert (
            t.version_at_timestamp(between.replace(tzinfo=None)) == 1
        )

    def test_before_history_raises(self, spark, lake):
        t = TxnTable(lake, "t2")
        t.append(_df(spark, [(1,)]))
        ancient = datetime.now(timezone.utc) - timedelta(days=1)
        with pytest.raises(ValueError, match="no retained commit"):
            t.version_at_timestamp(ancient)

    def test_both_version_and_ts_rejected(self, spark, lake):
        t = TxnTable(lake, "t3")
        t.append(_df(spark, [(1,)]))
        with pytest.raises(ValueError, match="not both"):
            t.read(version=1, as_of_ts=datetime.now(timezone.utc))

    def test_history_carries_timestamps_monotone(self, spark, lake):
        t = TxnTable(lake, "t4")
        t.append(_df(spark, [(1,)]))
        t.append(_df(spark, [(2,)]))
        hs = t.history()
        stamps = [h["ts_utc"] for h in hs]
        assert all(stamps)
        assert stamps == sorted(stamps)

    def test_expire_snapshots_by_age(self, spark, lake):
        t = TxnTable(lake, "t6")
        t.append(_df(spark, [(1,)]))                  # v1 (old)
        mid = datetime.now(timezone.utc)
        t.overwrite(_df(spark, [(2,)]))               # v2 (new)
        t.append(_df(spark, [(3,)]))                  # v3 (new)
        t.expire_snapshots(older_than=mid)
        # v1's history is gone, v2/v3 remain readable
        with pytest.raises(FileNotFoundError):
            t.read(version=1).collect()
        assert sorted(r["k"] for r in t.read(version=2).collect()) == [2]
        assert sorted(r["k"] for r in t.read().collect()) == [2, 3]

    def test_expire_with_timedelta_keeps_recent(self, spark, lake):
        t = TxnTable(lake, "t7")
        t.append(_df(spark, [(1,)]))
        t.append(_df(spark, [(2,)]))
        # everything is seconds old: a 1-day retention keeps it all
        t.expire_snapshots(older_than=timedelta(days=1))
        assert sorted(r["k"] for r in t.read(version=1).collect()) == [1]
        assert t.current_version() == 2

    def test_vacuum_truncates_resolvable_range(self, spark, lake):
        t = TxnTable(lake, "t5")
        t.append(_df(spark, [(1,)]))
        pre = datetime.now(timezone.utc)
        t.overwrite(_df(spark, [(9,)]))
        t.vacuum(keep_versions=1)
        with pytest.raises(ValueError, match="no retained commit"):
            t.version_at_timestamp(pre)


class TestMetadataTables:
    def test_files_df_matches_manifest(self, spark, lake):
        import json as _json

        t = TxnTable(lake, "m1", stats_cols=["k"], partition_cols=[])
        t.append(_df(spark, [(1,), (2,)]))
        t.append(_df(spark, [(5,)]))
        fdf = t.files_df().collect()
        m = t.manifest()
        assert sorted(r["file"] for r in fdf) == sorted(m["files"])
        # empty part files carry no stats entry → rows is NULL there
        assert sum(r["rows"] or 0 for r in fdf) == m["rows"]
        # per-file stats ride along, JSON-typed
        for r in fdf:
            st = _json.loads(r["stats_json"])
            if st.get("k"):
                assert len(st["k"]) == 2  # [min, max]

    def test_history_df_shape(self, spark, lake):
        t = TxnTable(lake, "m2")
        t.append(_df(spark, [(1,)]))
        t.overwrite(_df(spark, [(2,)]))
        hs = t.history_df().orderBy("version").collect()
        assert [h["op"] for h in hs] == ["append", "overwrite"]
        assert all(h["ts_utc"] for h in hs)
        assert hs[-1]["rows_total"] == 1
