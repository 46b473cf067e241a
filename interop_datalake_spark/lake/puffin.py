"""Puffin file read/write for Iceberg v3 DELETION VECTORS.

Puffin (iceberg.apache.org/puffin-spec) is Iceberg's stats/blob
container: ``Magic Blob₁ … Blobₙ Footer`` with
``Footer = Magic FooterPayload FooterPayloadSize(4 LE) Flags(4)
Magic`` and a JSON footer payload listing each blob's
``type/offset/length/properties``. Iceberg v3 stores deletion
vectors as ``deletion-vector-v1`` blobs whose bytes are — by
explicit spec design — the same framing Delta's DV files use per
vector: ``<len(data):4B BE><data = portable-RoaringBitmapArray
(magic-prefixed)><crc32(data):4B BE>``, so the decode path is the
already-pinned :mod:`.delta_dv` portable decoder. Manifest entries
for DVs (``content=1``, ``file_format='puffin'``) carry
``referenced_data_file`` + ``content_offset`` +
``content_size_in_bytes``, letting readers load a vector without
touching the footer; the footer remains the source of truth for
discovery-style reads (:func:`read_puffin_dvs`).

The writer here produces spec-shaped fixture/export files; the
reader refuses loudly on every malformed shape (bad magics,
compressed footers without the codec, length/CRC mismatches,
non-DV blob types where a vector was expected) — never a silently
wrong row set.
"""

from __future__ import annotations

import json
import struct
import zlib
from pathlib import Path

from interop_datalake_spark.lake.delta_dv import (
    decode_roaring_bitmap_array,
    encode_roaring_bitmap_array,
)

MAGIC = b"PFA1"

#: Puffin blob type for an Iceberg v3 deletion vector
DV_BLOB_TYPE = "deletion-vector-v1"


def write_puffin_dv_file(
    path: str | Path,
    per_file: dict[str, list[int]],
    snapshot_id: int = -1,
    sequence_number: int = -1,
) -> dict[str, dict]:
    """Write one Puffin file holding a ``deletion-vector-v1`` blob
    per referenced data file and return
    ``{referenced data file → {"offset", "length", "cardinality"}}``
    — exactly the triple a v3 manifest entry records
    (``content_offset`` / ``content_size_in_bytes`` +
    the ``cardinality`` the entry's record_count carries)."""
    buf = bytearray(MAGIC)
    blobs = []
    out: dict[str, dict] = {}
    for ref, idxs in per_file.items():
        idxs = sorted({int(i) for i in idxs})
        if idxs and idxs[0] < 0:
            raise ValueError(f"negative row position {idxs[0]}")
        data = encode_roaring_bitmap_array(idxs)
        off = len(buf)
        blob = (
            struct.pack(">i", len(data))
            + data
            + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        )
        buf += blob
        blobs.append(
            {
                "type": DV_BLOB_TYPE,
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "offset": off,
                "length": len(blob),
                "properties": {
                    "referenced-data-file": ref,
                    "cardinality": str(len(idxs)),
                },
            }
        )
        out[ref] = {
            "offset": off,
            "length": len(blob),
            "cardinality": len(idxs),
        }
    payload = json.dumps({"blobs": blobs}).encode("utf-8")
    buf += MAGIC + payload
    buf += struct.pack("<i", len(payload))
    buf += b"\x00\x00\x00\x00"  # flags: uncompressed footer
    buf += MAGIC
    Path(path).write_bytes(bytes(buf))
    return out


def read_puffin_footer(path: str | Path) -> dict:
    """Parse a Puffin file's footer payload (the blob index).
    Validates all three magics and refuses compressed footer
    payloads (bit 0 of flags — lz4, codec not in this environment)
    rather than mis-parsing."""
    raw = Path(path).read_bytes()
    if len(raw) < 4 + 4 + 4 + 4 + 4 or raw[:4] != MAGIC:
        raise ValueError(f"{path}: not a Puffin file (bad head magic)")
    if raw[-4:] != MAGIC:
        raise ValueError(f"{path}: truncated Puffin file (tail magic)")
    flags = raw[-8:-4]
    if flags[0] & 0x01:
        raise NotImplementedError(
            f"{path}: Puffin footer payload is compressed "
            f"(FOOTER_PAYLOAD_COMPRESSED) — lz4 is unavailable here"
        )
    (psize,) = struct.unpack("<i", raw[-12:-8])
    if psize < 0 or 12 + psize + 4 > len(raw):
        raise ValueError(f"{path}: footer payload size {psize} invalid")
    payload = raw[len(raw) - 12 - psize : len(raw) - 12]
    if raw[len(raw) - 16 - psize : len(raw) - 12 - psize] != MAGIC:
        raise ValueError(
            f"{path}: footer start magic missing — payload size lies"
        )
    return json.loads(payload.decode("utf-8"))


def read_puffin_dv(
    path: str | Path, offset: int, length: int
) -> list[int]:
    """Decode ONE deletion-vector blob at (offset, length) — the
    manifest-entry route (``content_offset`` /
    ``content_size_in_bytes``): length-prefix + portable
    RoaringBitmapArray + CRC-32, all validated."""
    with open(path, "rb") as fh:
        fh.seek(int(offset))
        raw = fh.read(int(length))
    if len(raw) != length:
        raise ValueError(
            f"{path}: DV blob truncated (wanted {length} bytes at "
            f"{offset}, got {len(raw)})"
        )
    if length < 8:
        raise ValueError(f"{path}: DV blob impossibly short ({length})")
    (dlen,) = struct.unpack_from(">i", raw, 0)
    if dlen < 0 or 4 + dlen + 4 != length:
        raise ValueError(
            f"{path}: DV blob length prefix {dlen} inconsistent with "
            f"blob length {length}"
        )
    data = raw[4 : 4 + dlen]
    (crc,) = struct.unpack_from(">I", raw, 4 + dlen)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"{path}: DV blob CRC mismatch at {offset}")
    return decode_roaring_bitmap_array(data)


def read_puffin_dvs(path: str | Path) -> dict[str, list[int]]:
    """Footer-driven read of EVERY deletion vector in the file:
    ``{referenced data file → sorted positions}``. Non-DV blob types
    refuse loudly (stats blobs like ``apache-datasketches-theta-v1``
    need their own decoders; silently skipping them here would make
    this function lie about the file's content)."""
    footer = read_puffin_footer(path)
    out: dict[str, list[int]] = {}
    for b in footer.get("blobs") or []:
        btype = b.get("type")
        if btype != DV_BLOB_TYPE:
            raise NotImplementedError(
                f"{path}: Puffin blob type {btype!r} is not a "
                f"deletion vector — only {DV_BLOB_TYPE} decodes here"
            )
        ref = (b.get("properties") or {}).get("referenced-data-file")
        if not ref:
            raise ValueError(
                f"{path}: deletion-vector blob at {b.get('offset')} "
                f"names no referenced-data-file"
            )
        if ref in out:
            raise ValueError(
                f"{path}: multiple deletion vectors reference "
                f"{ref} — the spec allows at most one per data file"
            )
        out[ref] = read_puffin_dv(path, b["offset"], b["length"])
    return out
