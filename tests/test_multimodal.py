"""Multimodal binary-column plumbing: schemas, mapInPandas signatures,
Arrow batch shapes, and the deterministic fake-codec semantics."""

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    decode_image_meta,
    encode_fake_image,
    extract_features,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        ("a1", "t1", "image", "image/sgim", encode_fake_image(640, 480, 3)),
        ("a2", "t1", "image", "image/sgim", encode_fake_image(100, 2000, 1)),
        ("a3", "t2", "image", "image/sgim", encode_fake_image(8, 8, 4, b"xyz")),
        ("a4", "t2", "image", "image/sgim", b"NOTANIMAGE"),
        ("a5", "t2", "video", "video/sgim", encode_fake_image(32, 32, 3, b"f" * 160)),
        ("a6", "t2", "image", "image/sgim", None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_meta(assets):
    got = {r["asset_id"]: r for r in decode_image_meta(assets).collect()}
    assert (got["a1"]["width"], got["a1"]["height"], got["a1"]["channels"]) == (640, 480, 3)
    assert got["a2"]["height"] == 2000
    assert got["a4"]["decode_ok"] == "corrupt"
    assert got["a6"]["decode_ok"] == "corrupt" and got["a6"]["n_bytes"] == 0
    assert got["a3"]["n_bytes"] == 12


def test_extract_features_deterministic(assets, spark):
    f1 = {r["asset_id"]: r["features"] for r in extract_features(assets).collect()}
    f2 = {r["asset_id"]: r["features"] for r in extract_features(assets).collect()}
    assert f1 == f2
    assert len(f1["a1"]) == 8
    assert all(0.0 <= v <= 1.0 for v in f1["a1"])
    assert f1["a1"] != f1["a2"]


def test_resize_preserves_aspect(assets):
    got = {r["asset_id"]: r for r in resize_images(assets, max_side=64).collect()}
    assert (got["a1"]["width"], got["a1"]["height"]) == (64, 48)
    assert (got["a2"]["width"], got["a2"]["height"]) == (3, 64)
    assert (got["a3"]["width"], got["a3"]["height"]) == (8, 8)  # no upscale
    assert got["a4"]["content"] is None  # corrupt stays null
    # resized bytes re-decode under the codec
    w, h = got["a1"]["width"], got["a1"]["height"]
    assert got["a1"]["content"][:4] == b"SGIM"


def test_sample_frames_one_to_many(assets):
    got = sample_frames(assets, frame_size=16, every_n=4).collect()
    a5 = sorted((r["frame_index"], r["frame_offset_bytes"]) for r in got if r["asset_id"] == "a5")
    # 160 payload bytes / 16 = 10 frames, every 4th -> indices 0,4,8
    assert a5 == [(0, 9), (4, 9 + 64), (8, 9 + 128)]


def test_arrow_batch_shape(spark):
    """mapInPandas must see multi-row Arrow batches, not per-row calls."""
    from interop_datalake_spark.operators.pandas_ops import batch_augment

    df = spark.range(1000).coalesce(1)
    out = batch_augment(df)
    sizes = [r["_batch_rows"] for r in out.select("_batch_rows").distinct().collect()]
    assert max(sizes) > 1  # vectorized batches


def test_decode_audio_meta(spark):
    from interop_datalake_spark.multimodal.binary_ops import decode_audio_meta

    rows = [
        # 441 -> 44100 Hz, 2 channels, 400 payload bytes -> 100 samples
        ("au1", "t1", "audio", "audio/sgim", encode_fake_image(441, 0, 2, b"\x00" * 400)),
        ("au2", "t1", "audio", "audio/sgim", b"JUNK"),
    ]
    assets = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["asset_id"]: r for r in decode_audio_meta(assets).collect()}
    a = got["au1"]
    assert (a["sample_rate"], a["n_channels"], a["n_samples"]) == (44100, 2, 100)
    assert a["duration_ms"] == int(100 * 1000 / 44100)
    assert got["au2"]["decode_ok"] == "corrupt"


def test_hot_shingle_filter(spark):
    from interop_datalake_spark.llm.dedup import drop_hot_shingles, shingles

    docs = spark.createDataFrame(
        [(i, "common boiler plate text here unique" + f" word{i} a b c d" ) for i in range(10)],
        "doc_id LONG, text STRING",
    )
    sh = shingles(docs, "text", "doc_id", k=5)
    filtered = drop_hot_shingles(sh, "doc_id", max_freq=5)
    # the shared prefix shingle appears in all 10 docs -> dropped
    remaining = {r["shingle"] for r in filtered.collect()}
    assert "common boiler plate text here" not in remaining
    assert any("word3" in s for s in remaining)  # doc-unique shingles survive
