"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata, with decode / feature-extraction / resize / frame-sampling as
Arrow-batched ``mapInPandas`` operators.

The reference stores media as FHIR ``Binary`` resources — opaque
payload + contentType code (``DatalakePublishService.kt:100-120``,
content types "pdf"/"text/json"/"mp4" in
``DatalakeRetrieveServiceTest.kt:30-32``). This module is the engine's
typed equivalent: the lake keeps ``content BINARY`` untouched (bronze
fidelity), and processing happens in vectorized batches.

DECODE STUB NOTICE: real image/audio codecs are not available in this
environment. Each operator routes through ``_decode_header``: if a real
decoder (PIL) is importable it would be used — that branch currently
raises ``NotImplementedError`` (clearly marked) — otherwise bytes are
parsed with the deterministic SGIM fake codec below. Everything
Spark-side (schemas, partitioning, mapInPandas signatures, Arrow batch
shapes) is real and tested; swapping the codec touches only
``_decode_header``.

SGIM fake codec layout (little-endian):
  bytes 0-3   magic b"SGIM"
  bytes 4-5   width  (uint16)
  bytes 6-7   height (uint16)
  byte  8     channels (uint8)
  bytes 9+    payload

Scale notes: a 100 TB media table is dominated by payload bytes —
operators here project metadata out of binary ONCE and persist it
(columnar stats, partition pruning), so later pipeline stages filter on
width/height/channels without touching payloads. mapInPandas streams
Arrow batches, so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × mean asset size.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: lake schema for media assets (Binary-resource equivalent)
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("fhir_tenant_id", StringType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("content_type", StringType(), True),  # mime-ish code
        StructField("content", BinaryType(), True),
    ]
)

_MAGIC = b"SGIM"


def encode_fake_image(width: int, height: int, channels: int, payload: bytes = b"") -> bytes:
    """Produce SGIM bytes (test fixture helper)."""
    return _MAGIC + struct.pack("<HHB", width, height, channels) + payload


def _decode_header(data: bytes | None) -> tuple[int, int, int, bool]:
    """(width, height, channels, ok). See DECODE STUB NOTICE."""
    use_real_codec = False
    try:  # pragma: no cover - real codec absent in this environment
        import PIL  # noqa: F401

        use_real_codec = True
    except ImportError:
        pass
    if use_real_codec:  # pragma: no cover
        raise NotImplementedError(
            "STUB: real image decode (PIL) intentionally not implemented; "
            "wire PIL.Image.open here when codecs are available"
        )
    if data is None or len(data) < 9 or data[:4] != _MAGIC:
        return (0, 0, 0, False)
    w, h, c = struct.unpack("<HHB", data[4:9])
    return (w, h, c, True)


DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("decode_ok", StringType(), True),  # 'ok' | 'corrupt'
    ]
)


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Project typed metadata out of the binary column (one pass over
    payloads; downstream filters never touch bytes again)."""

    def _it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["content"]):
                w, h, c, ok = _decode_header(data)
                rows.append(
                    (aid, w, h, c, len(data) if data is not None else 0,
                     "ok" if ok else "corrupt")
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODE_SCHEMA.fields]
            )

    return df.mapInPandas(_it, schema=DECODE_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic content-hash feature vector (stands in for a model
    embedding; same mapInPandas shape a real encoder would use)."""

    def _it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["content"]):
                digest = hashlib.sha256(data or b"").digest()
                vec = [
                    int.from_bytes(digest[4 * i : 4 * i + 4], "little")
                    / 2**32
                    for i in range(dim)
                ]
                rows.append((aid, vec))
            yield pd.DataFrame(rows, columns=["asset_id", "features"])

    return df.mapInPandas(_it, schema=FEATURES_SCHEMA)


def resize_images(df: DataFrame, max_side: int) -> DataFrame:
    """Resize = header rewrite under the fake codec (a real codec would
    resample payloads here; schema/flow identical). Aspect preserved."""
    schema = StructType(
        [
            StructField("asset_id", StringType(), False),
            StructField("content", BinaryType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )

    def _it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["content"]):
                w, h, c, ok = _decode_header(data)
                if not ok:
                    rows.append((aid, None, None, None))
                    continue
                scale = min(1.0, max_side / max(w, h, 1))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                rows.append((aid, encode_fake_image(nw, nh, c), nw, nh))
            yield pd.DataFrame(
                rows, columns=["asset_id", "content", "width", "height"]
            )

    return df.mapInPandas(_it, schema=schema)


AUDIO_META_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("decode_ok", StringType(), True),
    ]
)


def decode_audio_meta(df: DataFrame, bytes_per_sample: int = 2) -> DataFrame:
    """Audio metadata projection under the fake codec: the SGIM header's
    (width, height) fields carry (sample_rate/100, n_channels) for audio
    assets; payload length / (channels × bytes_per_sample) = samples.
    A real decoder (soundfile/ffprobe — stubbed, see module notice)
    slots into ``_decode_header`` identically."""

    def _it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["content"]):
                w, h, c, ok = _decode_header(data)
                if not ok or w == 0 or c == 0:
                    rows.append((aid, 0, 0, 0, 0, "corrupt"))
                    continue
                sample_rate = w * 100
                n_channels = c
                payload = len(data) - 9
                n_samples = payload // (n_channels * bytes_per_sample)
                duration_ms = int(n_samples * 1000 / sample_rate)
                rows.append(
                    (aid, sample_rate, n_channels, n_samples, duration_ms, "ok")
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
            )

    return df.mapInPandas(_it, schema=AUDIO_META_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("frame_index", IntegerType(), True),
        StructField("frame_offset_bytes", LongType(), True),
    ]
)


def sample_frames(df: DataFrame, frame_size: int = 16, every_n: int = 4) -> DataFrame:
    """Video frame sampling: emit every-nth frame offset (fake codec =
    fixed-size frames after the 9-byte header; a real demuxer would
    read the container index the same way). One→many mapInPandas."""

    def _it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["content"]):
                if data is None or len(data) < 9:
                    continue
                n_frames = (len(data) - 9) // frame_size
                for idx in range(0, n_frames, every_n):
                    rows.append((aid, idx, 9 + idx * frame_size))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA.fields]
            )

    return df.mapInPandas(_it, schema=FRAMES_SCHEMA)
