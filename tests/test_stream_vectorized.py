"""Round-11 (verdict item 1, the round-10 weak flag): both Python
DataSource streaming sources yield VECTORIZED ``pyarrow.RecordBatch``
objects from ``read()`` instead of per-row Python tuples.

Pins: (1) the batch path row-equal to the retired tuple path
(``_read_rows``) on mixed-type partitioned tables for BOTH sources;
(2) schema-on-read NULL fill survives the batch path; (3) the batches
are shaped exactly like the declared schema (the worker validates
names/count but does NOT reorder); (4) the round-11 advice fix — a
FRESH stream over a foreign table whose retained history starts past
the initial offset begins at min(retained) instead of refusing,
while provably-expired local history and resumed streams still
refuse."""

import json
import shutil
import tempfile
from datetime import timezone
from decimal import Decimal
from pathlib import Path

import pyarrow as pa
import pytest

from interop_datalake_spark.lake.iceberg_interop import (
    export_iceberg_metadata,
)
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture()
def lake(spark):
    root = tempfile.mkdtemp(prefix="vecstream_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


def _norm(v):
    """tz-normalize: the tuple path yielded naive datetimes (file wall
    time), the arrow path carries timestamp[us, tz=UTC] — same instant
    under the repo's UTC session convention."""
    if hasattr(v, "tzinfo") and getattr(v, "tzinfo", None) is not None:
        return v.astimezone(timezone.utc).replace(tzinfo=None)
    return v


def _batch_rows(batches):
    rows = []
    for b in batches:
        assert isinstance(b, pa.RecordBatch)
        cols = [c.to_pylist() for c in b.columns]
        rows.extend(
            tuple(_norm(v) for v in row) for row in zip(*cols)
        )
    return rows


def _tuple_rows(it):
    return [tuple(_norm(v) for v in row) for row in it]


class TestTxnSourceVectorized:
    def _reader(self, root):
        from pyspark.sql.types import StructType

        from interop_datalake_spark.streaming.txn_source import (
            TxnTableDataSource,
            TxnTableStreamReader,
            _latest_version,
        )

        ds = TxnTableDataSource({"path": str(root)})
        struct = StructType.fromDDL(ds.schema())
        rdr = TxnTableStreamReader(str(root), 0, struct, None)
        latest = _latest_version(Path(root) / "_manifests")
        return rdr, struct, latest

    def test_batch_path_equals_tuple_path(self, spark, lake):
        t = TxnTable(
            lake, "vec1", stats_cols=["k"], partition_cols=["p"]
        )
        t.append(
            spark.createDataFrame(
                [
                    (1, "a", Decimal("1.25"), "P0"),
                    (2, None, Decimal("2.50"), "P1"),
                    (3, "c", None, "P0"),
                ],
                "k BIGINT, v STRING, d DECIMAL(10,2), p STRING",
            ).selectExpr(
                "k", "v", "d", "p",
                "timestamp'2024-03-01 10:00:00' as ts",
            )
        )
        t.append(
            spark.createDataFrame(
                [(4, "d", Decimal("9.99"), "P2")],
                "k BIGINT, v STRING, d DECIMAL(10,2), p STRING",
            ).selectExpr(
                "k", "v", "d", "p",
                "timestamp'2024-03-02 11:30:00' as ts",
            )
        )
        rdr, struct, latest = self._reader(t.root)
        slices = rdr.partitions({"version": 0}, {"version": latest})
        assert slices
        got_b, got_t = [], []
        for s in slices:
            got_b.extend(_batch_rows(rdr.read(s)))
            got_t.extend(_tuple_rows(rdr._read_rows(s)))
        assert sorted(got_b, key=str) == sorted(got_t, key=str)
        assert len(got_b) == 4
        # batches are shaped exactly like the declared schema — the
        # DataSource worker checks names/count but never reorders
        b0 = next(iter(rdr.read(slices[0])))
        assert b0.schema.names == [f.name for f in struct.fields]

    def test_streamed_values_end_to_end(self, spark, lake, tmp_path):
        from interop_datalake_spark.streaming.txn_source import (
            read_txn_stream,
        )

        t = TxnTable(
            lake, "vec2", stats_cols=["k"], partition_cols=["p"]
        )
        t.append(
            spark.createDataFrame(
                [(1, "x", "A"), (2, "y", "B")],
                "k BIGINT, v STRING, p STRING",
            )
        )
        got: list = []
        q = (
            read_txn_stream(lake, "vec2")
            .writeStream.foreachBatch(
                lambda bdf, eid: got.extend(bdf.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        assert sorted((r.k, r.v, r.p, r._commit_version) for r in got) == [
            (1, "x", "A", 1),
            (2, "y", "B", 1),
        ]


class TestIcebergSourceVectorized:
    def _reader(self, spark, t, start_seq=0):
        from pyspark.sql.types import StructType

        from interop_datalake_spark.streaming.iceberg_source import (
            IcebergAppendsDataSource,
            IcebergStreamReader,
        )

        ds = IcebergAppendsDataSource({"path": str(t.root)})
        struct = StructType.fromDDL(ds.schema())
        return IcebergStreamReader(str(t.root), struct, start_seq), struct

    def test_batch_path_equals_tuple_path_with_partitions(
        self, spark, lake
    ):
        t = TxnTable(
            lake, "ivec1", stats_cols=["k"], partition_cols=["tenant"]
        )
        t.append(
            spark.createDataFrame(
                [(1, "a", "T0"), (2, "b", "T1"), (3, None, "T0")],
                "k BIGINT, v STRING, tenant STRING",
            )
        )
        export_iceberg_metadata(t)
        t.append(
            spark.createDataFrame(
                [(4, "d", "T2")], "k BIGINT, v STRING, tenant STRING"
            )
        )
        export_iceberg_metadata(t)
        rdr, struct = self._reader(spark, t)
        end = rdr.latestOffset()
        slices = rdr.partitions({"seq": 0}, end)
        assert slices
        got_b, got_t = [], []
        for s in slices:
            got_b.extend(_batch_rows(rdr.read(s)))
            got_t.extend(_tuple_rows(rdr._read_rows(s)))
        assert sorted(got_b, key=str) == sorted(got_t, key=str)
        assert len(got_b) == 4
        b0 = next(iter(rdr.read(slices[0])))
        assert b0.schema.names == [f.name for f in struct.fields]
        # identity partition values came from the MANIFEST constants
        ti = b0.schema.names.index("tenant")
        assert all(v is not None for v in b0.column(ti).to_pylist())

    def test_schema_on_read_null_fill(self, spark, lake):
        """A column added after a file was written is absent from its
        footer — the batch path must NULL-fill it, same as the tuple
        path did."""
        t = TxnTable(lake, "ivec2", stats_cols=["k"])
        t.append(
            spark.createDataFrame([(1,), (2,)], "k BIGINT").coalesce(1)
        )
        t.append(
            spark.createDataFrame(
                [(3, "new")], "k BIGINT, v STRING"
            ).coalesce(1)
        )
        export_iceberg_metadata(t)
        rdr, struct = self._reader(spark, t)
        slices = rdr.partitions({"seq": 0}, rdr.latestOffset())
        rows = []
        for s in slices:
            rows.extend(_batch_rows(rdr.read(s)))
            assert _batch_rows(rdr.read(s)) == _tuple_rows(
                rdr._read_rows(s)
            )
        by_k = {r[0]: r for r in rows}
        vi = [f.name for f in struct.fields].index("v")
        assert by_k[1][vi] is None and by_k[3][vi] == "new"


class TestFreshStreamOverTrimmedHistory:
    """Round-11 advice: the expiry guard refusing FRESH streams over
    foreign tables whose retained history starts past seq start+1."""

    def _trim_oldest(self, t):
        """Simulate a FOREIGN engine having trimmed history before any
        local consumption: drop the oldest snapshot from the metadata
        WITHOUT recording txn.expired-snapshot-ids (our own expiry
        records it; a foreign engine's leaves no trace)."""
        meta_dir = t.root / "metadata"
        n = int((meta_dir / "version-hint.text").read_text())
        meta = json.loads(
            (meta_dir / f"v{n}.metadata.json").read_text()
        )
        oldest = min(
            meta["snapshots"], key=lambda s: s["sequence-number"]
        )
        meta["snapshots"] = [
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] != oldest["snapshot-id"]
        ]
        (meta_dir / f"v{n + 1}.metadata.json").write_text(
            json.dumps(meta)
        )
        (meta_dir / "version-hint.text").write_text(str(n + 1))

    def test_fresh_stream_starts_at_min_retained(self, spark, lake):
        from interop_datalake_spark.streaming.iceberg_source import (
            IcebergAppendsDataSource,
            IcebergStreamReader,
        )
        from pyspark.sql.types import StructType

        t = TxnTable(lake, "trim1", stats_cols=["k"])
        for lo, hi in ((0, 2), (2, 4), (4, 6)):
            t.append(
                spark.range(lo, hi).selectExpr("id as k").coalesce(1)
            )
            export_iceberg_metadata(t)
        self._trim_oldest(t)
        ds = IcebergAppendsDataSource({"path": str(t.root)})
        struct = StructType.fromDDL(ds.schema())
        rdr = IcebergStreamReader(str(t.root), struct, 0)
        # fresh stream: start == configured initial offset → allowed,
        # window begins at the oldest retained snapshot
        slices = rdr.partitions({"seq": 0}, rdr.latestOffset())
        rows = []
        for s in slices:
            rows.extend(_batch_rows(rdr.read(s)))
        ki = [f.name for f in struct.fields].index("k")
        assert sorted(r[ki] for r in rows) == [2, 3, 4, 5]
        # a RESUMED stream (checkpointed start ≠ the configured
        # initial offset) still refuses: its checkpoint proves the
        # missing range once existed and was consumable
        rdr2 = IcebergStreamReader(str(t.root), struct, 5)
        with pytest.raises(ValueError, match="expired"):
            rdr2.partitions({"seq": 0}, rdr2.latestOffset())

    def test_local_expiry_still_refuses_fresh_stream(
        self, spark, lake
    ):
        """Our own expireSnapshots records txn.expired-snapshot-ids —
        that's PROOF the missing range once had consumable snapshots,
        so even a fresh stream refuses (the round-10 pin holds)."""
        from interop_datalake_spark.lake.iceberg_interop import (
            expire_iceberg_snapshots,
        )
        from interop_datalake_spark.streaming.iceberg_source import (
            IcebergAppendsDataSource,
            IcebergStreamReader,
        )
        from pyspark.sql.types import StructType

        t = TxnTable(lake, "trim2", stats_cols=["k"])
        for lo, hi in ((0, 2), (2, 4)):
            t.append(
                spark.range(lo, hi).selectExpr("id as k").coalesce(1)
            )
            export_iceberg_metadata(t)
        expire_iceberg_snapshots(t, keep_last=1)
        ds = IcebergAppendsDataSource({"path": str(t.root)})
        struct = StructType.fromDDL(ds.schema())
        rdr = IcebergStreamReader(str(t.root), struct, 0)
        with pytest.raises(ValueError, match="expired"):
            rdr.partitions({"seq": 0}, rdr.latestOffset())
