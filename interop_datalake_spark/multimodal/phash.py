"""Perceptual-hash (pHash) image dedup: DCT fingerprints + banded
Hamming blocking — the standard near-duplicate-image pipeline for a
multimodal training corpus, with the hash computed in Arrow batches
and ALL pair generation in JVM column algebra.

Algorithm (the classic pHash): grayscale image → 32×32 → 2-D DCT-II →
keep the top-left 8×8 low-frequency block, drop the DC term → threshold
the 63 coefficients at their median → 63-bit fingerprint. Perceptually
similar images agree on most bits; near-duplicates are pairs within a
small Hamming distance.

DECODE STUB NOTICE (same contract as binary_ops.py): without a real
codec the "grayscale 32×32" step is a deterministic surrogate — the
SGIM payload is tiled to 1024 bytes and reshaped; a real pipeline swaps
``_gray32`` for PIL resize + convert("L") and NOTHING else changes.
The DCT, thresholding, banding, and verification are the real thing.

Scale shape: hashing is one ``mapInPandas`` pass (payload bytes never
cross a shuffle afterwards — 8 bytes of hash do); candidate generation
is the pigeonhole band trick: split 63 bits into 4 × 16-bit bands —
any pair within Hamming distance 3 agrees EXACTLY on ≥1 band, so an
equi-join on (band_index, band_value) finds every such pair without an
O(N²) comparison; verification is ``bit_count(h1 XOR h2) ≤ k`` on the
candidates only (JVM codegen, no UDF). Same banding logic as MinHash
LSH (llm/dedup.py) but with a recall GUARANTEE instead of a
probabilistic one, because Hamming balls are finite.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from interop_datalake_spark.multimodal.binary_ops import _decode_header

#: 32-point DCT-II basis (orthonormal scaling is irrelevant to the
#: median threshold, so the raw cosine basis keeps the math obvious)
_N = 32
_DCT = np.cos(
    np.pi * np.arange(_N)[:, None] * (np.arange(_N)[None, :] + 0.5) / _N
)

PHASH_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("phash", LongType(), True),
    ]
)


def _gray32(data: bytes) -> np.ndarray | None:
    """Deterministic 32×32 grayscale surrogate from SGIM bytes (see
    DECODE STUB NOTICE). Returns None for corrupt assets."""
    w, h, c, ok = _decode_header(data)
    if not ok:
        return None
    payload = data[9:] or b"\x00"
    need = _N * _N
    buf = (payload * (need // len(payload) + 1))[:need]
    return np.frombuffer(buf, dtype=np.uint8).astype(np.float64).reshape(
        _N, _N
    )


def _phash_one(data: bytes | None) -> int | None:
    if data is None:
        return None
    img = _gray32(data)
    if img is None:
        return None
    coeffs = (_DCT @ img @ _DCT.T)[:8, :8].ravel()[1:]  # drop DC
    med = np.median(coeffs)
    bits = coeffs > med
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out


def phash_images(df: DataFrame) -> DataFrame:
    """(asset_id, phash): 63-bit perceptual hash per asset; corrupt
    assets hash to NULL. One Arrow pass over payloads — everything
    downstream touches only the 8-byte hash."""

    def _it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # .to_numpy(): a Series carries its index into the frame
            # constructor and would ALIGN against the positional hash
            # list — ids and hashes must pair positionally
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "phash": pd.array(
                        [_phash_one(d) for d in pdf["content"]],
                        dtype="Int64",
                    ),
                }
            )

    return df.mapInPandas(_it, schema=PHASH_SCHEMA)


def phash_near_dups(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "asset_id",
    hash_col: str = "phash",
) -> DataFrame:
    """(id_a, id_b, hamming): every pair of assets within
    ``max_hamming`` bits, via 4-band pigeonhole blocking. With 4 bands,
    recall is EXACT for max_hamming ≤ 3 (a pair differing in ≤3 bits
    cannot differ in all 4 bands); larger radii would need more bands
    (⌈bits/(max_hamming+1)⌉ stays exact). All column algebra — the
    only shuffles are the band equi-join and the pair distinct."""
    n_bands = 4
    assert max_hamming < n_bands, "pigeonhole guarantee needs bands > radius"
    h = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    )
    bands = h.select(
        "_id",
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("_h", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_h", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._h").alias("h_a"),
            F.col("b._h").alias("h_b"),
        )
        .distinct()  # a pair can match in several bands
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
