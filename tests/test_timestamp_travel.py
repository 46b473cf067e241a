"""TIMESTAMP AS OF over foreign logs: Delta (delta_version_at —
commitInfo timestamps, mtime fallback, delta-spark's monotonize rule,
loud before/after ends) and Iceberg (iceberg_snapshot_at — the
snapshot-log resolution of FOR SYSTEM_TIME AS OF)."""

from __future__ import annotations

import json
import shutil
import tempfile
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F  # noqa: F401

from interop_datalake_spark.lake.delta_interop import (
    delta_version_at,
    read_delta,
)
from interop_datalake_spark.lake.iceberg_interop import (
    export_iceberg_metadata,
    iceberg_snapshot_at,
    read_iceberg,
)
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture()
def lake(spark):
    root = tempfile.mkdtemp(prefix="ts_travel_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


def _delta_log(root, commits):
    """commits: list of (ts_ms_or_None, extra_actions)."""
    log = root / "_delta_log"
    log.mkdir(parents=True, exist_ok=True)
    schema = json.dumps(
        {"type": "struct", "fields": [
            {"name": "k", "type": "integer", "nullable": True,
             "metadata": {}}]}
    )
    for v, (ts, extra) in enumerate(commits):
        actions = []
        if ts is not None:
            actions.append(
                {"commitInfo": {"timestamp": ts, "operation": "WRITE"}}
            )
        if v == 0:
            actions += [
                {"protocol": {"minReaderVersion": 1,
                              "minWriterVersion": 2}},
                {"metaData": {"id": "tt",
                              "format": {"provider": "parquet",
                                         "options": {}},
                              "schemaString": schema,
                              "partitionColumns": [],
                              "configuration": {}}},
            ]
        actions += extra
        (log / f"{v:020d}.json").write_text(
            "\n".join(json.dumps(a) for a in actions) + "\n"
        )


class TestDeltaTimestamp:
    def test_resolution_and_ends(self, spark, tmp_path):
        root = tmp_path / "d1"
        _delta_log(root, [(1000, []), (2000, []), (3000, [])])
        assert delta_version_at(str(root), 1000) == 0
        assert delta_version_at(str(root), 1500) == 0
        assert delta_version_at(str(root), 2000) == 1
        assert delta_version_at(str(root), 2999) == 1
        assert delta_version_at(str(root), 3000) == 2
        with pytest.raises(ValueError, match="before the earliest"):
            delta_version_at(str(root), 999)
        with pytest.raises(ValueError, match="after the latest"):
            delta_version_at(str(root), 3001)
        # datetime + ISO spellings resolve like raw millis
        dt = datetime.fromtimestamp(2.5, tz=timezone.utc)
        assert delta_version_at(str(root), dt) == 1
        assert delta_version_at(
            str(root), dt.isoformat()
        ) == 1

    def test_monotonize_like_delta_spark(self, spark, tmp_path):
        """A later commit with an EARLIER stamp (clock skew, file
        copies) clamps up: it must never resolve before its
        predecessor."""
        root = tmp_path / "d2"
        _delta_log(root, [(1000, []), (2000, []), (1500, [])])
        # v2's stamp 1500 clamps to 2000 → at 2000 the LAST version
        # with effective ts <= 2000 is v2
        assert delta_version_at(str(root), 1999) == 0
        assert delta_version_at(str(root), 2000) == 2

    def test_read_delta_timestamp_content(self, spark, lake):
        from interop_datalake_spark.lake.delta_interop import (
            export_delta_log,
        )

        t = TxnTable(lake, "dtt", stats_cols=["k"])
        t.append(spark.range(0, 4).selectExpr("id as k").coalesce(1))
        log_dir = export_delta_log(t, mode="mirror")
        t.append(spark.range(4, 7).selectExpr("id as k").coalesce(1))
        export_delta_log(t, mode="mirror")
        # pin distinct commitInfo timestamps by hand (one export call
        # stamps both commits with the same wall clock)
        for v, ts in ((0, 10_000), (1, 20_000)):
            p = log_dir / f"{v:020d}.json"
            lines = p.read_text().splitlines()
            out = []
            for line in lines:
                a = json.loads(line)
                if "commitInfo" in a:
                    a["commitInfo"]["timestamp"] = ts
                out.append(json.dumps(a))
            p.write_text("\n".join(out) + "\n")
        assert {
            r["k"]
            for r in read_delta(
                spark, str(t.root), timestamp=15_000
            ).collect()
        } == {0, 1, 2, 3}
        assert read_delta(
            spark, str(t.root), timestamp=20_000
        ).count() == 7
        with pytest.raises(ValueError, match="not both"):
            read_delta(spark, str(t.root), version=0, timestamp=1)

    def test_cdf_timestamp_bounds(self, spark, lake):
        from interop_datalake_spark.lake.delta_interop import (
            export_delta_log,
            read_delta_changes,
        )

        t = TxnTable(lake, "dct", stats_cols=["k"])
        t.append(spark.range(0, 3).selectExpr("id as k").coalesce(1))
        log_dir = export_delta_log(t, mode="mirror")
        t.append(spark.range(3, 5).selectExpr("id as k").coalesce(1))
        export_delta_log(t, mode="mirror")
        t.append(spark.range(5, 6).selectExpr("id as k").coalesce(1))
        export_delta_log(t, mode="mirror")
        for v, ts in ((0, 10_000), (1, 20_000), (2, 30_000)):
            p = log_dir / f"{v:020d}.json"
            out = []
            for line in p.read_text().splitlines():
                a = json.loads(line)
                if "commitInfo" in a:
                    a["commitInfo"]["timestamp"] = ts
                out.append(json.dumps(a))
            p.write_text("\n".join(out) + "\n")
        # delta-spark's startingTimestamp rule: the first commit
        # stamped AT-or-after the instant is IN — so starting at
        # v1's exact stamp includes v1; ending at it includes v1 too
        got = {
            (r["k"], r["_commit_version"])
            for r in read_delta_changes(
                spark, str(t.root),
                from_timestamp=20_000, to_timestamp=20_000,
            ).collect()
        }
        assert got == {(3, 1), (4, 1)}
        # an instant strictly between v0 and v1 starts at v1 as well
        got2 = {
            r["_commit_version"]
            for r in read_delta_changes(
                spark, str(t.root), from_timestamp=10_001
            ).collect()
        }
        assert got2 == {1, 2}
        # an instant BEFORE the earliest retained commit resolves to
        # the full history (delta-spark resolves to version 0)
        assert (
            read_delta_changes(
                spark, str(t.root), from_timestamp=5_000
            ).count()
            == 6
        )
        # an instant past the newest commit refuses loudly
        with pytest.raises(ValueError, match="after the latest"):
            read_delta_changes(
                spark, str(t.root), from_timestamp=30_001
            )
        with pytest.raises(ValueError, match="not both"):
            read_delta_changes(
                spark, str(t.root), from_version=0,
                from_timestamp=10_000,
            )
        with pytest.raises(ValueError, match="needs from_version"):
            read_delta_changes(spark, str(t.root))

    def test_mtime_fallback(self, spark, tmp_path):
        import os

        root = tmp_path / "d3"
        _delta_log(root, [(None, []), (None, [])])
        log = root / "_delta_log"
        os.utime(log / f"{0:020d}.json", (100, 100))   # 100_000 ms
        os.utime(log / f"{1:020d}.json", (200, 200))
        assert delta_version_at(str(root), 150_000) == 0
        assert delta_version_at(str(root), 200_000) == 1


class TestIcebergTimestamp:
    def test_snapshot_log_resolution(self, spark, lake):
        t = TxnTable(lake, "itt", stats_cols=["k"])
        t.append(spark.range(0, 5).selectExpr("id as k").coalesce(1))
        export_iceberg_metadata(t)
        t.append(spark.range(5, 9).selectExpr("id as k").coalesce(1))
        export_iceberg_metadata(t)
        meta_dir = t.root / "metadata"
        n = int((meta_dir / "version-hint.text").read_text())
        mp = meta_dir / f"v{n}.metadata.json"
        meta = json.loads(mp.read_text())
        assert len(meta["snapshot-log"]) == 2
        for e, ts in zip(meta["snapshot-log"], (10_000, 20_000)):
            e["timestamp-ms"] = ts
        mp.write_text(json.dumps(meta))
        s1, s2 = (e["snapshot-id"] for e in meta["snapshot-log"])
        assert iceberg_snapshot_at(str(t.root), 15_000) == s1
        assert iceberg_snapshot_at(str(t.root), 20_000) == s2
        with pytest.raises(ValueError, match="before the earliest"):
            iceberg_snapshot_at(str(t.root), 9_999)
        with pytest.raises(ValueError, match="after the latest"):
            iceberg_snapshot_at(str(t.root), 20_001)
        assert read_iceberg(
            spark, str(t.root), timestamp=15_000
        ).count() == 5
        assert read_iceberg(
            spark, str(t.root), timestamp=20_000
        ).count() == 9
        with pytest.raises(ValueError, match="not both"):
            read_iceberg(
                spark, str(t.root), snapshot_id=s1, timestamp=1
            )

    def test_v1_metadata_no_snapshot_log(self, spark, tmp_path):
        """format-version 1 metadata: snapshots carry no
        sequence-number and a writer kept no snapshot-log — the
        fallback orders by timestamp-ms (the only ordering signal v1
        has) instead of raising KeyError."""
        meta = {
            "format-version": 1,
            "table-uuid": "t-v1",
            "location": str(tmp_path),
            "current-snapshot-id": 20,
            "snapshots": [
                # list order scrambled on purpose: resolution must
                # not depend on it
                {"snapshot-id": 30, "timestamp-ms": 15_000},
                {"snapshot-id": 10, "timestamp-ms": 10_000},
                {"snapshot-id": 20, "timestamp-ms": 20_000},
            ],
        }
        assert iceberg_snapshot_at(meta, 10_000) == 10
        assert iceberg_snapshot_at(meta, 14_999) == 10
        assert iceberg_snapshot_at(meta, 19_999) == 30
        assert iceberg_snapshot_at(meta, 20_000) == 20
        with pytest.raises(ValueError, match="before the earliest"):
            iceberg_snapshot_at(meta, 9_999)
        with pytest.raises(ValueError, match="after the latest"):
            iceberg_snapshot_at(meta, 20_001)

    def test_v2_fallback_monotonizes_like_delta(self, spark, tmp_path):
        """No snapshot-log but sequence-numbers present: order by
        sequence, and a later snapshot with an EARLIER stamp clamps
        up (delta_version_at's monotonize rule) so it never resolves
        before its predecessor."""
        meta = {
            "format-version": 2,
            "table-uuid": "t-v2",
            "location": str(tmp_path),
            "current-snapshot-id": 30,
            "snapshots": [
                {"snapshot-id": 10, "sequence-number": 1,
                 "timestamp-ms": 10_000},
                {"snapshot-id": 20, "sequence-number": 2,
                 "timestamp-ms": 20_000},
                {"snapshot-id": 30, "sequence-number": 3,
                 "timestamp-ms": 15_000},
            ],
        }
        assert iceberg_snapshot_at(meta, 19_999) == 10
        # 30's stamp clamps to 20_000; both land there, last wins
        assert iceberg_snapshot_at(meta, 20_000) == 30
        with pytest.raises(ValueError, match="after the latest"):
            iceberg_snapshot_at(meta, 20_001)

    def test_changelog_timestamp_bounds(self, spark, lake):
        """read_iceberg_changes(from_timestamp/to_timestamp): the
        Delta CDF spelling mirrored — start includes the first
        snapshot stamped at-or-after the instant, end resolves to
        the snapshot current at the instant, before-history floors
        to the full history, past-latest refuses."""
        from interop_datalake_spark.lake.iceberg_interop import (
            read_iceberg_changes,
        )

        t = TxnTable(lake, "ict", stats_cols=["k"])
        t.append(spark.range(0, 3).selectExpr("id as k").coalesce(1))
        export_iceberg_metadata(t)
        t.append(spark.range(3, 5).selectExpr("id as k").coalesce(1))
        export_iceberg_metadata(t)
        t.append(spark.range(5, 6).selectExpr("id as k").coalesce(1))
        export_iceberg_metadata(t)
        meta_dir = t.root / "metadata"
        n = int((meta_dir / "version-hint.text").read_text())
        mp = meta_dir / f"v{n}.metadata.json"
        meta = json.loads(mp.read_text())
        assert len(meta["snapshot-log"]) == 3
        for e, ts in zip(
            meta["snapshot-log"], (10_000, 20_000, 30_000)
        ):
            e["timestamp-ms"] = ts
        mp.write_text(json.dumps(meta))
        s1, s2, s3 = (e["snapshot-id"] for e in meta["snapshot-log"])

        def ks(**kw):
            return {
                (r["k"], r["_snapshot_id"])
                for r in read_iceberg_changes(
                    spark, str(t.root), **kw
                ).collect()
            }

        # start at s2's exact stamp: s2 is IN; end there: s2 is last
        assert ks(from_timestamp=20_000, to_timestamp=20_000) == {
            (3, s2), (4, s2),
        }
        # strictly between s1 and s2 starts at s2 as well
        assert ks(from_timestamp=10_001) == {
            (3, s2), (4, s2), (5, s3),
        }
        # before the earliest snapshot: the FULL history, first
        # snapshot included
        assert ks(from_timestamp=5_000) == {
            (0, s1), (1, s1), (2, s1), (3, s2), (4, s2), (5, s3),
        }
        with pytest.raises(ValueError, match="after the latest"):
            read_iceberg_changes(
                spark, str(t.root), from_timestamp=30_001
            )
        with pytest.raises(ValueError, match="not both"):
            read_iceberg_changes(
                spark, str(t.root), from_snapshot_id=s1,
                from_timestamp=10_000,
            )
        with pytest.raises(ValueError, match="not both"):
            read_iceberg_changes(
                spark, str(t.root), from_snapshot_id=s1,
                to_snapshot_id=s2, to_timestamp=20_000,
            )
        with pytest.raises(ValueError, match="needs from_snapshot_id"):
            read_iceberg_changes(spark, str(t.root))


class TestInCommitTimestamps:
    def test_ict_preferred_over_wall_clock(self, spark, tmp_path):
        """commitInfo.inCommitTimestamp (the ICT writer feature) is
        the authoritative commit time when present — time travel and
        the CDF timestamp bounds resolve by it, not the wall-clock
        `timestamp` field (which ICT tables may still carry, skewed)."""
        root = tmp_path / "ict"
        log = root / "_delta_log"
        log.mkdir(parents=True)
        schema = json.dumps(
            {"type": "struct", "fields": [
                {"name": "k", "type": "integer", "nullable": True,
                 "metadata": {}}]}
        )
        for v, (wall, ict) in enumerate(
            ((5_000, 10_000), (6_000, 20_000))
        ):
            actions = [
                {"commitInfo": {"timestamp": wall,
                                "inCommitTimestamp": ict,
                                "operation": "WRITE"}}
            ]
            if v == 0:
                actions += [
                    {"protocol": {"minReaderVersion": 1,
                                  "minWriterVersion": 7,
                                  "writerFeatures":
                                      ["inCommitTimestamp"]}},
                    {"metaData": {"id": "ict",
                                  "format": {"provider": "parquet",
                                             "options": {}},
                                  "schemaString": schema,
                                  "partitionColumns": [],
                                  "configuration": {}}},
                ]
            (log / f"{v:020d}.json").write_text(
                "\n".join(json.dumps(a) for a in actions) + "\n"
            )
        assert delta_version_at(str(root), 10_000) == 0
        assert delta_version_at(str(root), 19_999) == 0
        assert delta_version_at(str(root), 20_000) == 1
        # the wall-clock stamps (5k/6k) must NOT resolve
        with pytest.raises(ValueError, match="before the earliest"):
            delta_version_at(str(root), 6_000)
