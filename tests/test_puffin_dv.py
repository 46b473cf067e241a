"""Iceberg v3 deletion vectors (lake/puffin.py + iceberg_interop):
Puffin container framing pinned against hand-written spec bytes, the
DV blob's Delta-compatible framing (len-BE + portable
RoaringBitmapArray + CRC-BE), batch MOR application in read_iceberg,
and the CDC mode's cumulative-superset DIFF emission. Fixtures are
FOREIGN-style: hand-crafted v3 delete manifests (content=1,
file_format=PUFFIN, referenced_data_file/content_offset/
content_size_in_bytes) over tables this repo exported — the reader
is never validated only against its own writer.
"""

from __future__ import annotations

import json
import shutil
import struct
import tempfile
import uuid as _uuid
import zlib
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.iceberg_interop import (
    export_iceberg_metadata,
    read_iceberg,
    read_iceberg_changes,
)
from interop_datalake_spark.lake.puffin import (
    DV_BLOB_TYPE,
    MAGIC,
    read_puffin_dv,
    read_puffin_dvs,
    read_puffin_footer,
    write_puffin_dv_file,
)
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture()
def lake(spark):
    root = tempfile.mkdtemp(prefix="puffin_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


class TestPuffinFraming:
    def test_roundtrip_and_footer_shape(self, tmp_path):
        p = tmp_path / "dv.puffin"
        refs = write_puffin_dv_file(
            p, {"s3://b/data/f1.parquet": [0, 5, 70000],
                "s3://b/data/f2.parquet": [2]},
        )
        footer = read_puffin_footer(p)
        assert [b["type"] for b in footer["blobs"]] == [DV_BLOB_TYPE] * 2
        got = read_puffin_dvs(p)
        assert got == {
            "s3://b/data/f1.parquet": [0, 5, 70000],
            "s3://b/data/f2.parquet": [2],
        }
        d = refs["s3://b/data/f1.parquet"]
        assert read_puffin_dv(p, d["offset"], d["length"]) == [
            0, 5, 70000,
        ]
        assert d["cardinality"] == 3

    def test_hand_written_bytes(self, tmp_path):
        """Pin the container independent of the writer: build the
        file byte-by-byte from the spec (Magic, blob = len-BE +
        portable bitmap + crc-BE, Footer = Magic payload size-LE
        flags Magic)."""
        from interop_datalake_spark.lake.delta_dv import (
            encode_roaring_bitmap_array,
        )

        data = encode_roaring_bitmap_array([1, 3])
        blob = (
            struct.pack(">i", len(data))
            + data
            + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        )
        payload = json.dumps(
            {
                "blobs": [
                    {
                        "type": DV_BLOB_TYPE,
                        "fields": [],
                        "snapshot-id": 7,
                        "sequence-number": 7,
                        "offset": 4,
                        "length": len(blob),
                        "properties": {
                            "referenced-data-file": "f.parquet",
                            "cardinality": "2",
                        },
                    }
                ]
            }
        ).encode()
        raw = (
            MAGIC + blob + MAGIC + payload
            + struct.pack("<i", len(payload))
            + b"\x00\x00\x00\x00" + MAGIC
        )
        p = tmp_path / "hand.puffin"
        p.write_bytes(raw)
        assert read_puffin_dvs(p) == {"f.parquet": [1, 3]}

    def test_refusals(self, tmp_path):
        p = tmp_path / "dv.puffin"
        write_puffin_dv_file(p, {"f": [1]})
        raw = bytearray(p.read_bytes())
        # compressed-footer flag
        bad = bytearray(raw)
        bad[-8] |= 0x01
        (tmp_path / "c.puffin").write_bytes(bytes(bad))
        with pytest.raises(NotImplementedError, match="compressed"):
            read_puffin_footer(tmp_path / "c.puffin")
        # corrupt blob CRC
        footer = read_puffin_footer(p)
        b = footer["blobs"][0]
        bad = bytearray(raw)
        bad[b["offset"] + 5] ^= 0xFF
        (tmp_path / "crc.puffin").write_bytes(bytes(bad))
        with pytest.raises(ValueError, match="CRC"):
            read_puffin_dv(
                tmp_path / "crc.puffin", b["offset"], b["length"]
            )
        # head magic
        bad = bytearray(raw)
        bad[0] ^= 0xFF
        (tmp_path / "m.puffin").write_bytes(bytes(bad))
        with pytest.raises(ValueError, match="magic"):
            read_puffin_footer(tmp_path / "m.puffin")
        # non-DV blob type refuses in the discovery read
        payload = json.dumps(
            {"blobs": [{"type": "apache-datasketches-theta-v1",
                        "offset": 4, "length": 8}]}
        ).encode()
        raw2 = (
            MAGIC + b"\x00" * 8 + MAGIC + payload
            + struct.pack("<i", len(payload))
            + b"\x00\x00\x00\x00" + MAGIC
        )
        (tmp_path / "t.puffin").write_bytes(raw2)
        with pytest.raises(NotImplementedError, match="theta"):
            read_puffin_dvs(tmp_path / "t.puffin")


def _add_dv_snapshot(spark, t, per_file: dict, shrink_ok=False):
    """Hand-craft a FOREIGN v3 deletion-vector snapshot on an
    exported Iceberg table: one Puffin file holding a DV per
    referenced data file + a delete manifest whose entries carry the
    v3 fields, published as a new metadata version. ``per_file``:
    {data file URI: positions}. Returns the new snapshot id."""
    from interop_datalake_spark.lake.iceberg_interop import (
        _MANIFEST_FILE_SCHEMA,
        _AvroFileWriter,
        _jvm,
        _manifest_entry_schema,
        _read_avro,
        _uri_to_path,
    )

    meta_dir = t.root / "metadata"
    n = int((meta_dir / "version-hint.text").read_text())
    meta = json.loads((meta_dir / f"v{n}.metadata.json").read_text())
    schema = next(
        s for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
    )
    jvm = _jvm(spark)
    seq = int(meta["last-sequence-number"]) + 1
    snap_id = max(s["snapshot-id"] for s in meta["snapshots"]) + 1000
    specs = list(meta["partition-specs"])
    empty = next((s for s in specs if not s["fields"]), None)
    if empty is None:
        del_spec_id = max(s["spec-id"] for s in specs) + 1
        specs.append({"spec-id": del_spec_id, "fields": []})
    else:
        del_spec_id = empty["spec-id"]

    # 1. the Puffin file
    pf = meta_dir / f"dv-{_uuid.uuid4().hex}.puffin"
    blob_info = write_puffin_dv_file(
        pf, per_file, snapshot_id=snap_id, sequence_number=seq
    )

    # 2. the v3 delete manifest (one DV entry per referenced file)
    dm = meta_dir / f"{_uuid.uuid4().hex}-dv-m0.avro"
    dw = _AvroFileWriter(
        jvm,
        _manifest_entry_schema([], v3_dv=True),
        dm,
        {
            "schema": json.dumps(schema),
            "schema-id": schema["schema-id"],
            "partition-spec": "[]",
            "partition-spec-id": del_spec_id,
            "format-version": "2",
            "content": "deletes",
        },
    )
    for ref, info in blob_info.items():
        dw.append_json(
            {
                "status": 1,
                "snapshot_id": None,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": 1,  # POSITION_DELETES (DV flavor)
                    "file_path": pf.resolve().as_uri(),
                    "file_format": "PUFFIN",
                    "partition": {},
                    "record_count": info["cardinality"],
                    "file_size_in_bytes": pf.stat().st_size,
                    "lower_bounds": None,
                    "upper_bounds": None,
                    "equality_ids": None,
                    "referenced_data_file": {"string": ref},
                    "content_offset": {"long": info["offset"]},
                    "content_size_in_bytes": {"long": info["length"]},
                },
            }
        )
    dw.close()

    # 3. manifest list: carry the previous snapshot's manifests,
    # REPLACING any older DV delete manifest (a v3 writer publishes
    # the cumulative vector; carrying both would double-apply and —
    # in CDC — make the 'parent DV' ambiguous)
    prev_snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    carried, _m = _read_avro(
        jvm, Path(_uri_to_path(prev_snap["manifest-list"]))
    )
    names_int = [
        "manifest_length", "partition_spec_id", "content",
        "sequence_number", "min_sequence_number", "added_snapshot_id",
        "added_files_count", "existing_files_count",
        "deleted_files_count", "added_rows_count",
        "existing_rows_count", "deleted_rows_count",
    ]
    ml = meta_dir / f"snap-{snap_id}-{_uuid.uuid4().hex}.avro"
    lw = _AvroFileWriter(
        jvm,
        _MANIFEST_FILE_SCHEMA,
        ml,
        {
            "snapshot-id": snap_id,
            "parent-snapshot-id": meta["current-snapshot-id"],
            "sequence-number": seq,
            "format-version": "2",
        },
    )
    for rec in carried:
        if int(rec.get("content") or 0) == 1:
            # replace ANY older delete manifest (fixture-written
            # -dv-m0 or exporter-written -deletes-m0): the published
            # vector is cumulative
            continue
        lw.append_json(
            {
                "manifest_path": str(rec.get("manifest_path")),
                **{nm: int(rec.get(nm)) for nm in names_int},
            }
        )
    lw.append_json(
        {
            "manifest_path": dm.resolve().as_uri(),
            "manifest_length": dm.stat().st_size,
            "partition_spec_id": del_spec_id,
            "content": 1,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snap_id,
            "added_files_count": len(blob_info),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": sum(
                i["cardinality"] for i in blob_info.values()
            ),
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }
    )
    lw.close()

    meta2 = dict(meta)
    meta2["partition-specs"] = specs
    meta2["last-sequence-number"] = max(
        seq, int(meta["last-sequence-number"])
    )
    meta2["current-snapshot-id"] = snap_id
    meta2["snapshots"] = meta["snapshots"] + [
        {
            "snapshot-id": snap_id,
            "parent-snapshot-id": meta["current-snapshot-id"],
            "sequence-number": seq,
            "timestamp-ms": 0,
            "manifest-list": ml.resolve().as_uri(),
            "summary": {"operation": "overwrite"},
            "schema-id": schema["schema-id"],
        }
    ]
    (meta_dir / f"v{n + 1}.metadata.json").write_text(json.dumps(meta2))
    (meta_dir / "version-hint.text").write_text(str(n + 1))
    return snap_id


def _data_file_uris(spark, t):
    from interop_datalake_spark.lake.iceberg_interop import (
        _load_metadata,
        _resolve_snapshot,
        _snapshot_entries_all,
    )

    meta = _load_metadata(str(t.root))
    snap = _resolve_snapshot(meta, None)
    data_e, _ = _snapshot_entries_all(spark, meta, snap)
    return [str(d[1].get("file_path")) for d in data_e]


class TestReadWithDVs:
    def test_batch_mor_and_cumulative_cdc(self, spark, lake):
        t = TxnTable(lake, "pdv1", stats_cols=["k"])
        t.append(
            spark.range(0, 10)
            .selectExpr("id as k", "concat('r', id) as v")
            .orderBy("k")
            .coalesce(1)
        )
        export_iceberg_metadata(t)
        base_snap = json.loads(
            (t.root / "metadata" / "v1.metadata.json").read_text()
        )["current-snapshot-id"]
        (uri,) = _data_file_uris(spark, t)

        s1 = _add_dv_snapshot(spark, t, {uri: [1, 3]})
        got = {r["k"] for r in read_iceberg(spark, str(t.root)).collect()}
        assert got == set(range(10)) - {1, 3}
        # cumulative update: superset vector replaces the old one
        s2 = _add_dv_snapshot(spark, t, {uri: [1, 3, 5]})
        got = {r["k"] for r in read_iceberg(spark, str(t.root)).collect()}
        assert got == set(range(10)) - {1, 3, 5}
        # time travel still sees each snapshot's own vector
        got1 = {
            r["k"]
            for r in read_iceberg(
                spark, str(t.root), snapshot_id=s1
            ).collect()
        }
        assert got1 == set(range(10)) - {1, 3}
        # CDC: each snapshot emits its DIFF only
        ch = read_iceberg_changes(
            spark, str(t.root), base_snap, include_deletes=True
        ).collect()
        by_snap = {}
        for r in ch:
            by_snap.setdefault(r["_snapshot_id"], set()).add(
                (r["k"], r["_change_type"])
            )
        assert by_snap[s1] == {(1, "delete"), (3, "delete")}
        assert by_snap[s2] == {(5, "delete")}

    def test_shrinking_vector_refuses_in_cdc(self, spark, lake):
        t = TxnTable(lake, "pdv2", stats_cols=["k"])
        t.append(
            spark.range(0, 6).selectExpr("id as k").orderBy("k").coalesce(1)
        )
        export_iceberg_metadata(t)
        base_snap = json.loads(
            (t.root / "metadata" / "v1.metadata.json").read_text()
        )["current-snapshot-id"]
        (uri,) = _data_file_uris(spark, t)
        _add_dv_snapshot(spark, t, {uri: [1, 2]})
        _add_dv_snapshot(spark, t, {uri: [1]})  # drops position 2
        # the batch read applies the CURRENT vector as-is
        got = {r["k"] for r in read_iceberg(spark, str(t.root)).collect()}
        assert got == {0, 2, 3, 4, 5}
        # the CDC diff cannot be expressed — refuse as corrupt
        with pytest.raises(ValueError, match="cumulative"):
            read_iceberg_changes(
                spark, str(t.root), base_snap, include_deletes=True
            ).collect()

    def test_two_dvs_for_one_file_refused(self, spark, lake):
        from interop_datalake_spark.lake.iceberg_interop import (
            _dv_positions_frame,
        )

        with pytest.raises(ValueError, match="at most one"):
            _dv_positions_frame(
                spark,
                [
                    ("file:///p.puffin", 1, "f1", 4, 20),
                    ("file:///q.puffin", 1, "f1", 4, 20),
                ],
            )

    def test_dv_entry_missing_fields_refused(self, spark, lake):
        from interop_datalake_spark.lake.iceberg_interop import (
            _split_delete_files,
        )

        e = {"sequence_number": 1}
        mf = {"sequence_number": 1}
        dfr = {
            "content": 1,
            "file_path": "file:///x.puffin",
            "file_format": "PUFFIN",
            "referenced_data_file": "f1",
            "content_offset": None,
            "content_size_in_bytes": None,
        }
        with pytest.raises(ValueError, match="content_offset"):
            _split_delete_files([(e, dfr, [], mf)])


class TestV3Export:
    """export_iceberg_metadata(format_version=3): vectored snapshots
    publish Puffin deletion-vector-v1 blobs + v3 DV manifest entries
    instead of v2 position-delete parquet — the write half of the
    already-pinned read path."""

    def _delete_entries(self, spark, t):
        """[(file_format, referenced_data_file, offset, size,
        record_count)] of the current snapshot's delete manifests."""
        from interop_datalake_spark.lake.iceberg_interop import (
            _jvm,
            _load_metadata,
            _read_avro,
            _resolve_snapshot,
            _uri_to_path,
        )

        meta = _load_metadata(str(t.root))
        snap = _resolve_snapshot(meta, None)
        jvm = _jvm(spark)
        lists, _m = _read_avro(
            jvm, Path(_uri_to_path(snap["manifest-list"]))
        )
        out = []
        for mf in lists:
            if (mf.get("content") or 0) != 1:
                continue
            entries, _ = _read_avro(
                jvm, Path(_uri_to_path(str(mf.get("manifest_path"))))
            )
            for e in entries:
                d = e.get("data_file")

                def opt(rec, name):
                    try:
                        return rec.get(name)
                    except Exception:
                        return None  # field absent in a v2 schema

                out.append(
                    (
                        str(d.get("file_format")),
                        opt(d, "referenced_data_file"),
                        opt(d, "content_offset"),
                        opt(d, "content_size_in_bytes"),
                        int(d.get("record_count")),
                    )
                )
        return out

    def test_v3_mor_roundtrip_and_shape(self, spark, lake):
        t = TxnTable(lake, "v3e1", stats_cols=["k"])
        t.append(
            spark.range(0, 12)
            .selectExpr("id as k", "concat('r', id) as v")
            .orderBy("k")
            .coalesce(2)
        )
        t.delete_where(F.col("k") % 3 == 0, merge_on_read=True)
        export_iceberg_metadata(t, format_version=3)
        meta_dir = t.root / "metadata"
        meta = json.loads(
            (meta_dir / "v1.metadata.json").read_text()
        )
        assert meta["format-version"] == 3
        # the delete manifest carries PUFFIN DV entries, one per
        # referenced data file, blob-addressed
        ents = self._delete_entries(spark, t)
        assert ents and all(f == "PUFFIN" for f, *_ in ents)
        assert all(
            ref is not None and off is not None and size is not None
            for _, ref, off, size, _n in ents
        )
        # exactly one puffin file, discoverable via the footer too
        puffins = list(meta_dir.glob("dv-*.puffin"))
        assert len(puffins) == 1
        footer_dvs = read_puffin_dvs(puffins[0])
        assert sum(len(v) for v in footer_dvs.values()) == sum(
            n for *_x, n in ents
        )
        # blob coordinates in the manifest decode to the same vectors
        for _f, ref, off, size, n in ents:
            idxs = read_puffin_dv(puffins[0], int(off), int(size))
            assert len(idxs) == n and footer_dvs[str(ref)] == list(
                idxs
            )
        # merge-on-read roundtrip: reader == TxnTable state
        got = {
            (r["k"], r["v"])
            for r in read_iceberg(spark, str(t.root)).collect()
        }
        want = {(r["k"], r["v"]) for r in t.read().collect()}
        assert got == want and {k for k, _ in got} == {
            k for k in range(12) if k % 3 != 0
        }

    def test_v3_cdc_and_fixture_interop(self, spark, lake):
        """The exporter's v3 DV snapshots diff in the changelog, and
        a FIXTURE-written DV snapshot layered on a REAL v3 export
        keeps the cumulative-vector CDC semantics — the exporter's
        shape is bit-compatible with the hand-built one the reader
        was pinned against."""
        t = TxnTable(lake, "v3e2", stats_cols=["k"])
        t.append(
            spark.range(0, 10)
            .selectExpr("id as k")
            .orderBy("k")
            .coalesce(1)
        )
        export_iceberg_metadata(t, format_version=3)
        base = json.loads(
            (t.root / "metadata" / "v1.metadata.json").read_text()
        )["current-snapshot-id"]
        t.delete_where(F.col("k").isin(1, 3), merge_on_read=True)
        export_iceberg_metadata(t)  # inherits v3
        meta = json.loads(
            (
                t.root
                / "metadata"
                / f"v{int((t.root / 'metadata' / 'version-hint.text').read_text())}.metadata.json"
            ).read_text()
        )
        assert meta["format-version"] == 3
        s1 = meta["current-snapshot-id"]
        (uri,) = _data_file_uris(spark, t)
        # fixture-written cumulative superset on top of the real
        # export
        s2 = _add_dv_snapshot(spark, t, {uri: [1, 3, 5]})
        got = {
            r["k"] for r in read_iceberg(spark, str(t.root)).collect()
        }
        assert got == set(range(10)) - {1, 3, 5}
        ch = read_iceberg_changes(
            spark, str(t.root), base, include_deletes=True
        ).collect()
        by_snap = {}
        for r in ch:
            by_snap.setdefault(r["_snapshot_id"], set()).add(
                (r["k"], r["_change_type"])
            )
        assert by_snap[s1] == {(1, "delete"), (3, "delete")}
        assert by_snap[s2] == {(5, "delete")}

    def test_upgrade_one_way_and_v2_unchanged(self, spark, lake):
        # v2 default: vectored export still writes position-delete
        # PARQUET, no puffin anywhere
        t = TxnTable(lake, "v3e3", stats_cols=["k"])
        t.append(
            spark.range(0, 8).selectExpr("id as k").orderBy("k")
            .coalesce(1)
        )
        t.delete_where(F.col("k") == 2, merge_on_read=True)
        export_iceberg_metadata(t)
        meta_dir = t.root / "metadata"
        assert json.loads(
            (meta_dir / "v1.metadata.json").read_text()
        )["format-version"] == 2
        assert not list(meta_dir.glob("*.puffin"))
        ents = self._delete_entries(spark, t)
        assert ents and all(f == "PARQUET" for f, *_ in ents)
        # v2 → v3 upgrade mid-history is allowed; time travel still
        # reads the v2 snapshot
        t.delete_where(F.col("k") == 4, merge_on_read=True)
        export_iceberg_metadata(t, format_version=3)
        n = int((meta_dir / "version-hint.text").read_text())
        meta = json.loads((meta_dir / f"v{n}.metadata.json").read_text())
        assert meta["format-version"] == 3
        got = {
            r["k"] for r in read_iceberg(spark, str(t.root)).collect()
        }
        assert got == {0, 1, 3, 5, 6, 7}
        old_snap = meta["snapshots"][0]["snapshot-id"]
        got_v2 = {
            r["k"]
            for r in read_iceberg(
                spark, str(t.root), snapshot_id=old_snap
            ).collect()
        }
        assert got_v2 == {0, 1, 3, 4, 5, 6, 7}
        # downgrade refuses
        t.append(spark.range(8, 9).selectExpr("id as k").coalesce(1))
        with pytest.raises(ValueError, match="one-way"):
            export_iceberg_metadata(t, format_version=2)
        with pytest.raises(ValueError, match="format_version"):
            export_iceberg_metadata(t, format_version=4)
