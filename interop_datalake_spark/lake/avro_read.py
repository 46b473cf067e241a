"""Minimal pure-Python Avro object-container-file reader.

Why this exists: Iceberg manifests are Avro container files. The
export/read path (lake/iceberg_interop.py) drives the Avro JAVA
library pyspark bundles through py4j — fine on the driver, impossible
inside Spark 4's Python DataSource workers (the streaming planner
process has no py4j gateway). The streaming Iceberg source
(streaming/iceberg_source.py) therefore needs a gateway-free decoder;
it doubles as an INDEPENDENT validator of the exporter's output
(tests decode exporter-written manifests with this reader and pin
equality against the Java library's records).

Implements the PUBLIC Avro 1.12 spec (avro.apache.org/docs — binary
encoding + object container files): zigzag varints, strings/bytes as
length-prefixed, records as field concatenation, unions as
index-prefixed branches, arrays/maps as count-delimited blocks
(negative count ⇒ byte size follows), enum/fixed, named-type
references, and the ``null``/``deflate`` codecs (the two every
implementation must support; snappy refuses loudly). Decodes with the
WRITER schema embedded in the file header — the right semantics for
"read whatever a foreign writer wrote into dicts" (no reader-schema
resolution needed). Logical types are left raw (Iceberg manifests
only use them for date ordinals, which callers already treat as
ints).

Driver-side and manifest-scale by design: manifests are metadata
(one record per data file), never data.
"""

from __future__ import annotations

import json
import struct
import zlib

_MAGIC = b"Obj\x01"


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.b):
            raise EOFError("truncated Avro data")
        out = self.b[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        # zigzag varint
        shift, acc = 0, 0
        while True:
            byte = self.read(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        return self.read(self.long())


def _decode(r: _Reader, schema, named: dict):
    """One datum per the writer ``schema`` (dict | list | str)."""
    if isinstance(schema, str):
        t = schema
        if t in named:
            return _decode(r, named[t], named)
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) != b"\x00"
        if t in ("int", "long"):
            return r.long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.bytes_()
        if t == "string":
            return r.bytes_().decode("utf-8")
        raise ValueError(f"unknown Avro type {t!r}")
    if isinstance(schema, list):  # union: long branch index, then value
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range")
        return _decode(r, schema[idx], named)
    t = schema["type"]
    if t in ("record", "error"):
        name = schema.get("name")
        if name:
            named[name] = schema
            if schema.get("namespace"):
                named[f"{schema['namespace']}.{name}"] = schema
        return {
            f["name"]: _decode(r, f["type"], named)
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # block byte-size prefix variant
                r.long()
                n = -n
            for _ in range(n):
                out.append(_decode(r, schema["items"], named))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                r.long()
                n = -n
            for _ in range(n):
                k = r.bytes_().decode("utf-8")
                out[k] = _decode(r, schema["values"], named)
    if t == "enum":
        name = schema.get("name")
        if name:
            named[name] = schema
        return schema["symbols"][r.long()]
    if t == "fixed":
        name = schema.get("name")
        if name:
            named[name] = schema
        return r.read(schema["size"])
    # {"type": "string", "logicalType": ...}-style wrapping of a
    # primitive (or a named reference): unwrap
    return _decode(r, t, named)


def _register_names(schema, named: dict) -> None:
    """Pre-walk: record/enum/fixed definitions are referencable from
    ANYWHERE after their textual definition — a recursive pre-pass is
    simpler than tracking textual order and strictly more permissive
    (Avro names are unique per schema, so earlier registration cannot
    change a decode)."""
    if isinstance(schema, list):
        for s in schema:
            _register_names(s, named)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "error", "enum", "fixed"):
        name = schema.get("name")
        if name:
            named[name] = schema
            if schema.get("namespace"):
                named[f"{schema['namespace']}.{name}"] = schema
    for f in schema.get("fields", []) or []:
        _register_names(f.get("type"), named)
    for key in ("items", "values"):
        if key in schema:
            _register_names(schema[key], named)


def read_avro_file(path) -> tuple[list[dict], dict]:
    """(records, file metadata) of one Avro object container file —
    the pure-Python sibling of iceberg_interop._read_avro (which
    returns py4j GenericRecords); this one returns plain dicts, so
    ``rec["field"]`` replaces ``rec.get("field")``."""
    with open(path, "rb") as fh:
        data = fh.read()
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            r.long()
            n = -n
        for _ in range(n):
            k = r.bytes_().decode("utf-8")
            meta[k] = r.bytes_()
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(
            f"{path}: Avro codec {codec!r} is not supported by this "
            f"reader (null/deflate are — the spec's required set)"
        )
    named: dict = {}
    _register_names(schema, named)
    records: list = []
    while r.pos < len(r.b):
        count = r.long()
        size = r.long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(br, schema, dict(named)))
    return records, meta
