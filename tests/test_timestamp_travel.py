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


class TestInCommitTimestampWrite:
    """The WRITE half of the ICT feature (round-14): mirror exports
    with in_commit_timestamps=True stamp every published commit and
    claim the writer feature, so foreign readers resolve time travel
    and CDF bounds by protocol-authoritative commit times even after
    file mtimes are perturbed — the twin of
    TestInCommitTimestamps.test_ict_preferred_over_wall_clock."""

    @staticmethod
    def _commits(root):
        import json as _json

        log = root / "_delta_log"
        out = {}
        for p in sorted(log.glob("*.json")):
            if not p.stem.isdigit():
                continue
            acts = [
                _json.loads(ln)
                for ln in p.read_text().splitlines()
                if ln.strip()
            ]
            out[int(p.stem)] = acts
        return out

    def _perturb_mtimes(self, root):
        """Scramble commit-file mtimes BACKWARDS (the copy/restore
        hazard ICT exists to survive)."""
        import os

        for i, p in enumerate(
            sorted((root / "_delta_log").glob("*.json"))
        ):
            os.utime(p, (1_000_000 - i * 1000, 1_000_000 - i * 1000))

    def test_mirror_stamps_monotone_ict_and_claims_feature(
        self, spark, lake
    ):
        from interop_datalake_spark.lake.delta_interop import (
            export_delta_log,
            read_delta_changes,
        )

        t = TxnTable(lake, "ictw", stats_cols=["k"])
        for i in range(3):
            t.append(spark.createDataFrame([(i,)], "k INT"))
            export_delta_log(
                t, mode="mirror", in_commit_timestamps=True
            )
        commits = self._commits(t.root)
        assert set(commits) == {0, 1, 2}
        icts = []
        for v, acts in commits.items():
            ci = next(a for a in acts if "commitInfo" in a)
            icts.append(ci["commitInfo"]["inCommitTimestamp"])
        assert icts == sorted(icts) and len(set(icts)) == 3, icts
        proto = next(
            a for a in commits[0] if "protocol" in a
        )["protocol"]
        # writer-only feature: reader version stays 1
        assert proto["minReaderVersion"] == 1
        assert proto["minWriterVersion"] == 7
        assert "inCommitTimestamp" in proto["writerFeatures"]
        meta = next(
            a for a in commits[0] if "metaData" in a
        )["metaData"]
        assert (
            meta["configuration"]["delta.enableInCommitTimestamps"]
            == "true"
        )
        # enabled at creation → no enablement-provenance properties
        assert (
            "delta.inCommitTimestampEnablementVersion"
            not in meta["configuration"]
        )

        # mtime perturbation must not move resolution: travel + CDF
        # bounds resolve by ICT
        self._perturb_mtimes(t.root)
        assert delta_version_at(str(t.root), icts[0]) == 0
        assert delta_version_at(str(t.root), icts[1]) == 1
        assert delta_version_at(str(t.root), icts[2]) == 2
        assert delta_version_at(str(t.root), icts[2] - 1) == 1
        ch = read_delta_changes(
            spark,
            str(t.root),
            from_timestamp=icts[1],
            to_timestamp=icts[2],
        )
        assert {r["k"] for r in ch.collect()} == {1, 2}
        # the plain reader still consumes the table (no reader gate)
        assert {r["k"] for r in read_delta(spark, str(t.root)).collect()} \
            == {0, 1, 2}

    def test_mid_mirror_enablement_and_one_way(self, spark, lake):
        from interop_datalake_spark.lake.delta_interop import (
            export_delta_log,
        )

        t = TxnTable(lake, "ictm", stats_cols=["k"])
        t.append(spark.createDataFrame([(0,)], "k INT"))
        export_delta_log(t, mode="mirror")  # ICT off at creation
        t.append(spark.createDataFrame([(1,)], "k INT"))
        export_delta_log(t, mode="mirror", in_commit_timestamps=True)
        # one-way: the NEXT mirror forgets the flag, must keep stamping
        t.append(spark.createDataFrame([(2,)], "k INT"))
        export_delta_log(t, mode="mirror")
        commits = self._commits(t.root)
        assert set(commits) == {0, 1, 2}
        ci0 = next(a for a in commits[0] if "commitInfo" in a)
        assert "inCommitTimestamp" not in ci0["commitInfo"]
        ci1 = next(a for a in commits[1] if "commitInfo" in a)
        ci2 = next(a for a in commits[2] if "commitInfo" in a)
        t1 = ci1["commitInfo"]["inCommitTimestamp"]
        t2 = ci2["commitInfo"]["inCommitTimestamp"]
        assert t2 > t1
        # the enablement commit re-emits metaData with the provenance
        # pair naming ITSELF (version 1, its own ICT)
        meta1 = next(
            a for a in commits[1] if "metaData" in a
        )["metaData"]
        conf = meta1["configuration"]
        assert conf["delta.enableInCommitTimestamps"] == "true"
        assert conf["delta.inCommitTimestampEnablementVersion"] == "1"
        assert conf["delta.inCommitTimestampEnablementTimestamp"] == str(t1)
        proto1 = next(
            a for a in commits[1] if "protocol" in a
        )["protocol"]
        assert "inCommitTimestamp" in proto1["writerFeatures"]
        # version 2 (flag forgotten) publishes no NEW protocol/meta —
        # the claim is already on — but still stamps
        assert not any("protocol" in a for a in commits[2])

    def test_full_export_with_ict(self, spark, lake):
        from interop_datalake_spark.lake.delta_interop import (
            export_delta_log,
        )

        t = TxnTable(lake, "ictf", stats_cols=["k"])
        t.append(spark.createDataFrame([(0,), (1,)], "k INT"))
        export_delta_log(t, in_commit_timestamps=True)  # replace mode
        commits = self._commits(t.root)
        ci = next(a for a in commits[0] if "commitInfo" in a)
        assert isinstance(
            ci["commitInfo"]["inCommitTimestamp"], int
        )
        proto = next(
            a for a in commits[0] if "protocol" in a
        )["protocol"]
        assert proto == {
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["inCommitTimestamp"],
        }
