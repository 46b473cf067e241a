"""Catalog coverage for the Arrow/Python surface: scalar pandas UDF,
grouped-map applyInPandas, grouped-agg pandas UDF, and the multimodal
mapInPandas decode — each hash-checked (arithmetic oracles for the UDFs,
golden VALUES for the fake-codec decode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from interop_datalake_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    decode_image_meta,
    encode_fake_image,
    sample_frames,
)
from interop_datalake_spark.operators.pandas_ops import (
    demean_per_group,
    make_clip_scale_udf,
    make_weighted_mean_udf,
)
from interop_datalake_spark.sources.tables import load_table, local_frame


def pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.round(make_clip_scale_udf()(F.col("value")), 6).alias("scaled"),
        )
        .orderBy("event_id")
    )


PANDAS_SCALAR_ORACLE = """
SELECT event_id, round(least(greatest(value, 0.0), 100.0) / 100.0, 6) AS scaled
FROM events ORDER BY event_id
"""


def pandas_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    out = demean_per_group(ev, "user_id", "value")
    return out.select("user_id", "event_id", "demeaned").orderBy("event_id")


# no rounding of demeaned: the operator's round(sum,2)/n mean makes the
# value bit-identical to this SQL (see demean_per_group docstring)
PANDAS_GROUPED_MAP_ORACLE = """
SELECT user_id, event_id,
       value - round(sum(value) OVER (PARTITION BY user_id), 2)
               / count(*) OVER (PARTITION BY user_id) AS demeaned
FROM events ORDER BY event_id
"""


def pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "w", (F.col("event_id") % 5 + 1).cast("double")
    )
    return (
        ev.groupBy("user_id")
        .agg(
            make_weighted_mean_udf()(F.col("value"), F.col("w")).alias("wmean")
        )
        .orderBy("user_id")
    )


PANDAS_GROUPED_AGG_ORACLE = """
SELECT user_id,
       round(sum(value * (event_id % 5 + 1)), 2) / sum(event_id % 5 + 1) AS wmean
FROM events GROUP BY user_id ORDER BY user_id
"""


_FIXTURE = [
    ("a1", "t1", "image", "image/sgim", encode_fake_image(640, 480, 3)),
    ("a2", "t1", "image", "image/sgim", encode_fake_image(100, 2000, 1)),
    ("a3", "t2", "image", "image/sgim", encode_fake_image(8, 8, 4, b"xyz")),
    ("a4", "t2", "image", "image/sgim", b"NOTANIMAGE"),
    ("a5", "t2", "video", "video/sgim", encode_fake_image(32, 32, 3, b"f" * 160)),
]


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = local_frame(spark, _FIXTURE, MEDIA_SCHEMA)
    return decode_image_meta(assets).orderBy("asset_id")


MULTIMODAL_DECODE_ORACLE = """
SELECT * FROM (VALUES
  ('a1', 640, 480, 3, 9,   'ok'),
  ('a2', 100, 2000, 1, 9,  'ok'),
  ('a3', 8, 8, 4, 12,      'ok'),
  ('a4', 0, 0, 0, 10,      'corrupt'),
  ('a5', 32, 32, 3, 169,   'ok')
) AS t(asset_id, width, height, channels, n_bytes, decode_ok)
ORDER BY asset_id
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = local_frame(spark, _FIXTURE, MEDIA_SCHEMA)
    return sample_frames(assets, frame_size=16, every_n=4).orderBy(
        "asset_id", "frame_index"
    )


MULTIMODAL_FRAMES_ORACLE = """
SELECT * FROM (VALUES
  ('a5', 0, 9), ('a5', 4, 73), ('a5', 8, 137)
) AS t(asset_id, frame_index, frame_offset_bytes)
ORDER BY asset_id, frame_index
"""


def text_trigrams_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4): a one-row→many-rows table
    function applied per document via SQL LATERAL — the fourth leg of
    the Python API coverage (scalar pandas UDF, grouped map/agg,
    mapInPandas, UDTF). Emits positional word trigrams for the first
    20 docs; DuckDB replays with unnest + list slicing. UDTFs run
    row-at-a-time in Python — the catalog's shingle/ngram OPERATORS
    stay pure column algebra (llm/dedup.py) and this entry exists to
    witness the API, not to recommend it for the hot path (that
    trade-off is the module's standing no-row-UDF rule,
    operators/pandas_ops.py:9)."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, ngram STRING")
    class Trigrams:
        def eval(self, text: str):
            ws = [w for w in re.split(r"\s+", (text or "").lower()) if w]
            for i in range(len(ws) - 2):
                yield i, " ".join(ws[i : i + 3])

    spark.udtf.register("trigrams_tvf", Trigrams)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.ngram
        FROM _udtf_docs d, LATERAL trigrams_tvf(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )


TEXT_TRIGRAMS_UDTF_ORACLE = """
SELECT doc_id, i - 1 AS pos,
       ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS ngram
FROM (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     w -> w <> '') AS ws
  FROM documents WHERE doc_id < 20
), unnest(generate_series(1, len(ws) - 2)) AS t(i)
ORDER BY doc_id, pos
"""


def _phash_fixture():
    """12 deterministic SGIM assets: 8 unrelated seeds, one 1-byte
    perturbation of img-2, one 8-byte perturbation of img-3, one exact
    copy of img-5, one corrupt blob. sha256-chain payloads — stable
    across sessions, so the pHash pairs are pinnable VALUES."""
    import hashlib

    def payload(seed, n=600):
        out, h = b"", str(seed).encode()
        while len(out) < n:
            h = hashlib.sha256(h).digest()
            out += h
        return out[:n]

    rows = [
        (f"img-{i}", "t", "image", "image/sgim",
         encode_fake_image(64, 48, 3, payload(i)))
        for i in range(8)
    ]
    p = bytearray(payload(2))
    p[100] ^= 0x01
    rows.append(
        ("img-2near", "t", "image", "image/sgim",
         encode_fake_image(64, 48, 3, bytes(p)))
    )
    p = bytearray(payload(3))
    for j in range(0, 64, 8):
        p[j] ^= 0xFF
    rows.append(
        ("img-3mod", "t", "image", "image/sgim",
         encode_fake_image(64, 48, 3, bytes(p)))
    )
    rows.append(
        ("img-5dup", "t", "image", "image/sgim",
         encode_fake_image(64, 48, 3, payload(5)))
    )
    rows.append(("img-bad", "t", "image", "image/sgim", b"XXXX123"))
    return rows


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup (multimodal/phash.py): DCT pHash in
    one Arrow pass, then 4×16-bit-band pigeonhole blocking — recall is
    EXACT for Hamming radius ≤ 3, so the banded equi-join provably
    finds the same pairs as the O(N²) scan (pinned against brute force
    in tests/test_phash.py). The planted perturbations land at
    measured distances 0 (1-byte flip: low-frequency signs unmoved),
    2 (8-byte flip), and 0 (exact copy); the corrupt asset hashes to
    NULL and never reaches the join. Unrelated seeds sit at distance
    ~31 (tests pin > 10) — the hash separates, not just matches."""
    from interop_datalake_spark.multimodal.phash import (
        phash_images,
        phash_near_dups,
    )

    assets = local_frame(spark, _phash_fixture(), MEDIA_SCHEMA)
    return phash_near_dups(phash_images(assets), max_hamming=3).orderBy(
        "id_a", "id_b"
    )


MULTIMODAL_PHASH_ORACLE = """
SELECT * FROM (VALUES
  ('img-2', 'img-2near', 0),
  ('img-3', 'img-3mod',  2),
  ('img-5', 'img-5dup',  0)
) AS t(id_a, id_b, hamming)
ORDER BY id_a, id_b
"""


QUERIES = {
    "pandas_scalar_udf": pandas_scalar_udf,
    "pandas_grouped_map": pandas_grouped_map,
    "pandas_grouped_agg": pandas_grouped_agg,
    "multimodal_decode": multimodal_decode,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_phash_dedup": multimodal_phash_dedup,
    "text_trigrams_udtf": text_trigrams_udtf,
}

ORACLES = {
    "pandas_scalar_udf": PANDAS_SCALAR_ORACLE,
    "pandas_grouped_map": PANDAS_GROUPED_MAP_ORACLE,
    "pandas_grouped_agg": PANDAS_GROUPED_AGG_ORACLE,
    "multimodal_decode": MULTIMODAL_DECODE_ORACLE,
    "multimodal_frame_sample": MULTIMODAL_FRAMES_ORACLE,
    "multimodal_phash_dedup": MULTIMODAL_PHASH_ORACLE,
    "text_trigrams_udtf": TEXT_TRIGRAMS_UDTF_ORACLE,
}
