"""Pure-Python murmur3_x86_32 + Iceberg bucket-transform helpers.

The Iceberg spec (Appendix B) mandates murmur3_x86_32(seed=0) over a
type-specific single-value serialization for ``bucket[N]``
transforms. The WRITE path computes it as Spark column algebra
(lake/txn.py:_mmh3_32_of_long / _mmh3_32_of_bytes — JVM-side, per
row); this module is the PLANNER-side twin for hashing one literal
(point-lookup pruning over foreign bucket-partitioned tables) with
zero Spark jobs. Both are pinned against the spec's Appendix-B test
vectors (34 → 2017239379, "iceberg" → 1210000089, …) so they cannot
drift apart silently.
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timezone

_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_TS = datetime(1970, 1, 1, tzinfo=timezone.utc)


def mmh3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32, unsigned result."""
    c1, c2, m = 0xCC9E2D51, 0x1B873593, 0xFFFFFFFF

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & m

    h = seed
    nblocks = len(data) // 4
    for i in range(nblocks):
        k = struct.unpack_from("<I", data, i * 4)[0]
        k = (k * c1) & m
        k = rotl(k, 15)
        k = (k * c2) & m
        h ^= k
        h = rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & m
    tail = data[nblocks * 4 :]
    k1 = 0
    if len(tail) >= 3:
        k1 ^= tail[2] << 16
    if len(tail) >= 2:
        k1 ^= tail[1] << 8
    if len(tail) >= 1:
        k1 ^= tail[0]
        k1 = (k1 * c1) & m
        k1 = rotl(k1, 15)
        k1 = (k1 * c2) & m
        h ^= k1
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & m
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & m
    h ^= h >> 16
    return h


def iceberg_bucket_of(value, iceberg_type, n: int) -> int | None:
    """``bucket[n]`` ordinal of one literal per the Iceberg spec's
    single-value serialization (ints promote to long and hash their
    8 LE bytes; dates hash days-from-epoch; timestamps hash
    micros-from-epoch — naive datetimes read as UTC wall time for
    ``timestamp`` but return None for ``timestamptz`` (the caller's
    naive literal was likely session-time; a UTC guess would prune
    the WRONG bucket's files); strings hash UTF-8 bytes; binary
    hashes raw bytes). Returns
    ``None`` for types this helper cannot serialize faithfully —
    callers must then KEEP the file (prune only what is proven)."""
    if value is None:
        return None
    try:
        if iceberg_type in ("int", "long"):
            b = struct.pack("<q", int(value))
        elif iceberg_type == "date":
            days = (
                (value - _EPOCH_DATE).days
                if isinstance(value, date)
                and not isinstance(value, datetime)
                else int(value)
            )
            b = struct.pack("<q", days)
        elif iceberg_type in ("timestamp", "timestamptz"):
            if isinstance(value, datetime):
                if value.tzinfo is None:
                    if iceberg_type == "timestamptz":
                        # a naive literal against a tz-aware column
                        # was likely meant in SESSION time, not UTC —
                        # guessing UTC would hash a different bucket
                        # and silently prune files holding matching
                        # rows. Conservative: keep the file.
                        return None
                    v = value.replace(tzinfo=timezone.utc)
                else:
                    v = value
                td = v - _EPOCH_TS
                micros = (
                    td.days * 86_400_000_000
                    + td.seconds * 1_000_000
                    + td.microseconds
                )
            else:
                micros = int(value)
            b = struct.pack("<q", micros)
        elif iceberg_type == "string":
            b = str(value).encode("utf-8")
        elif iceberg_type in ("binary",) or (
            isinstance(iceberg_type, str)
            and iceberg_type.startswith("fixed")
        ):
            b = bytes(value)
        else:
            return None  # decimal/uuid/nested: not serialized here
    except (ValueError, TypeError, struct.error):
        return None
    return (mmh3_32(b) & 0x7FFFFFFF) % int(n)
