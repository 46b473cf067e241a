"""Perceptual-hash dedup (multimodal/phash.py): banded blocking must
equal brute force (the pigeonhole recall guarantee), the hash must
separate unrelated content, and corrupt assets must never join."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.catalog.python_surface import _phash_fixture
from interop_datalake_spark.multimodal.binary_ops import MEDIA_SCHEMA
from interop_datalake_spark.multimodal.phash import (
    _phash_one,
    phash_images,
    phash_near_dups,
)


def test_banded_equals_brute_force_on_random_hashes(spark):
    """200 seeded random 63-bit hashes + 40 planted ≤3-bit
    perturbations: the 4-band equi-join must find EXACTLY the pairs a
    full O(N²) Hamming scan finds."""
    rng = random.Random(7)
    hashes = {f"r{i}": rng.getrandbits(63) for i in range(200)}
    for i in range(40):
        base = hashes[f"r{i}"]
        flipped = base
        for _ in range(rng.randint(0, 3)):
            flipped ^= 1 << rng.randrange(63)
        hashes[f"p{i}"] = flipped
    expected = sorted(
        (min(a, b), max(a, b), bin(hashes[a] ^ hashes[b]).count("1"))
        for a, b in itertools.combinations(hashes, 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    )
    df = spark.createDataFrame(
        list(hashes.items()), "asset_id STRING, phash LONG"
    )
    got = sorted(
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b), r.hamming)
        for r in phash_near_dups(df, max_hamming=3).collect()
    )
    assert got == expected
    assert len(got) >= 40  # every planted perturbation was found


def test_fixture_hashes_separate_unrelated(spark):
    rows = _phash_fixture()
    hs = {rid: _phash_one(c) for rid, _, _, _, c in rows}
    assert hs["img-bad"] is None
    unrelated = [f"img-{i}" for i in range(8)]
    for a, b in itertools.combinations(unrelated, 2):
        assert bin(hs[a] ^ hs[b]).count("1") > 10, (a, b)


def test_corrupt_assets_hash_null_and_never_join(spark):
    df = spark.createDataFrame(_phash_fixture(), MEDIA_SCHEMA)
    h = phash_images(df)
    assert (
        h.filter(F.col("asset_id") == "img-bad").collect()[0]["phash"] is None
    )
    pairs = phash_near_dups(h).collect()
    assert all("img-bad" not in (r.id_a, r.id_b) for r in pairs)


def test_radius_beyond_band_guarantee_rejected(spark):
    df = spark.createDataFrame([("a", 1)], "asset_id STRING, phash LONG")
    with pytest.raises(AssertionError):
        phash_near_dups(df, max_hamming=4)
