"""Corpus sampling / splitting catalog — the reproducibility-critical
ops of a training-data pipeline.

The flagship is the content-hash split: at 100 TB, train/val membership
must be a pure function of the record (never of partitioning, run
order, or RNG state) so re-runs, backfills, and incremental appends
never leak validation data into training. ``sample``/``sampleBy`` are
included as the engine surface for quick subsampling, checked
rows-only (their RNG streams are engine- and partitioning-specific by
design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from interop_datalake_spark.sources.tables import load_table


def split_bucket(text_col: str = "text"):
    """Content-hash split bucket 0-99 — THE canonical split rule.
    Every query that splits or audits the split (train_val, the
    capstone, corpus_split_contamination) must use this helper, so a
    future change to the rule cannot leave an audit checking a split
    nobody uses."""
    return (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 4), 16, 10).cast(
            "bigint"
        )
        % 100
    )


def split_label(bucket):
    """90/5/5 train/val/test from a :func:`split_bucket` value."""
    return (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )


def corpus_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 split keyed on the content hash: stable
    under re-runs, appends, and engine changes (md5 is the portable
    choice here; xxhash64 in production for speed)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = split_bucket("text")
    return (
        docs.select(
            "doc_id", bucket.alias("bucket"), split_label(bucket).alias("split")
        )
        .orderBy("doc_id")
    )


SPLIT_ORACLE = """
SELECT doc_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         ('0x' || substr(md5(text), 1, 4))::BIGINT % 100 AS bucket
  FROM documents
) ORDER BY doc_id
"""


def corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (rows-only: RNG streams are
    engine-specific; determinism per seed+partitioning is pinned in
    tests/test_sampling.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.sample(fraction=0.2, seed=42).select("doc_id", "lang").orderBy(
        "doc_id"
    )


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sampling (sampleBy) — balancing a multilingual
    corpus; rows-only for the same RNG reason."""
    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.1, "es": 0.5, "fr": 0.5, "de": 0.5, "zh": 0.5}
    return (
        docs.sampleBy("lang", fractions, seed=7)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("lang")
    )


def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array predicates: exists / forall / filter+size."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    return (
        docs.select(
            "doc_id",
            F.exists(words, lambda w: w == "spark").alias("mentions_spark"),
            F.forall(words, lambda w: F.length(w) <= 10).alias("all_short"),
            F.size(F.filter(words, lambda w: F.length(w) >= 6)).alias("n_long_words"),
        )
        .orderBy("doc_id")
    )


ARRAY_HOF_ORACLE = """
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents
)
SELECT doc_id,
       len(list_filter(ws, w -> w = 'spark')) > 0        AS mentions_spark,
       len(list_filter(ws, w -> length(w) > 10)) = 0     AS all_short,
       len(list_filter(ws, w -> length(w) >= 6))         AS n_long_words
FROM base ORDER BY doc_id
"""


def corpus_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=50, weight ∝ n_chars —
    Efraimidis–Spirakis A-ES made fully deterministic: each doc draws
    a content-hashed uniform u ∈ (0,1] (md5 high bits, the same
    portable-hash trick as the train/val split) and races with
    exponential key −ln(u)/w; the k smallest keys win. This is THE
    distributed weighted-sample: one pass to key, one top-k — no
    sequential reservoir, no RNG state, and (like the split) membership
    is a pure function of content, so re-runs, backfills, and
    partitioning changes reproduce the identical sample. At 100 TB the
    top-k is per-partition TakeOrdered + a k-row driver merge — no
    global sort.

    Keys are rounded to 12 dp before ranking (ties broken by doc_id)
    so Spark's and DuckDB's libm-ulp differences can't flip a
    comparison — the oracle replays key derivation bit-for-bit.
    Weights are floored at 1 (greatest∘coalesce, identical in both
    engines) so a zero/NULL n_chars yields a finite key instead of a
    NULL that would sort NULLS-FIRST into the sample on the Spark
    side only."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "n_chars", race_key().alias("race_key"))
        .orderBy("race_key", "doc_id")
        .limit(50)
    )


def race_key(text_col: str = "text", weight_col: str = "n_chars"):
    """THE canonical A-ES race-key expression (content-hashed uniform,
    exponential key, weight floored at 1) — one definition shared by
    the operator and its invariance tests, so they cannot drift."""
    u = (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast(
            "bigint"
        )
        + 1
    ) / F.lit(4294967296.0)
    w = F.greatest(F.coalesce(F.col(weight_col), F.lit(0)), F.lit(1))
    return F.round(-F.log(u) / w.cast("double"), 12)


SAMPLE_WEIGHTED_ORACLE = """
SELECT doc_id, n_chars, race_key FROM (
  SELECT doc_id, n_chars,
         round(
           -ln((('0x' || substr(md5(text), 1, 8))::BIGINT + 1)
               / 4294967296.0)
           / greatest(coalesce(n_chars, 0), 1)::DOUBLE, 12) AS race_key
  FROM documents
)
ORDER BY race_key, doc_id
LIMIT 50
"""


def shuffle_key(seed: str, id_col: str = "doc_id"):
    """THE canonical deterministic-shuffle key: a content-hash of
    (seed, id) — a pure function of the record and the seed, never of
    partitioning, run order, or RNG state, so the permutation is
    reproducible across engines, re-runs, and cluster sizes (the
    property ``df.orderBy(rand(seed))`` does NOT have: Spark's rand
    stream is partitioning-dependent). md5-sliced for oracle
    portability; swap xxhash64 in production for speed (the recorded
    convention)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")


def corpus_shuffle_deterministic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seeded GLOBAL SHUFFLE of the corpus into training shards — the
    op every epoch of LLM training starts with at 100 TB, where
    "shuffle the dataset" must be (a) reproducible bit-for-bit from
    (seed, doc_id) alone and (b) free of any global sort bottleneck:
    shard = key % n_shards routes each doc independently, and the
    within-shard position is a window ORDER BY (key, doc_id)
    PARTITIONED BY shard — n_shards independent local sorts, exactly
    the sharded-writer layout (one output file per shard, readable in
    shard order = shuffled order). Re-running with the same seed
    reproduces the permutation on any cluster size; a new seed is a
    fresh epoch permutation."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    key = shuffle_key("epoch0")
    n_shards = 8
    keyed = docs.select(
        "doc_id",
        key.alias("skey"),
        (key % n_shards).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return (
        keyed.select(
            "doc_id",
            "shard",
            F.row_number().over(w).alias("pos_in_shard"),
        )
        .orderBy("shard", "pos_in_shard")
    )


SHUFFLE_ORACLE = """
WITH keyed AS (
  SELECT doc_id,
         ('0x' || substr(md5('epoch0:' || doc_id::VARCHAR), 1, 12))::BIGINT
           AS skey
  FROM documents
)
SELECT doc_id,
       (skey % 8)::INT AS shard,
       row_number() OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id)
         AS pos_in_shard
FROM keyed
ORDER BY shard, pos_in_shard
"""


def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM ordering: tier the corpus by a difficulty proxy
    (document length — short docs first, the classic length-based
    curriculum), then shuffle WITHIN each tier with the deterministic
    key, so training consumes easy→hard with reproducible within-tier
    order. The composition every curriculum/annealing schedule needs:
    tiering is one column expression, the within-tier permutation is
    the same shuffle_key, and the global order is (tier, key) — a
    range-partitionable sort, no driver involvement."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    tier = (
        F.when(F.col("n_chars") < 500, 0)
        .when(F.col("n_chars") < 2000, 1)
        .otherwise(2)
    )
    key = shuffle_key("curr0")
    w = Window.partitionBy("tier").orderBy("skey", "doc_id")
    return (
        docs.select(
            "doc_id",
            tier.alias("tier"),
            key.alias("skey"),
        )
        .select(
            "doc_id",
            "tier",
            F.row_number().over(w).alias("pos_in_tier"),
        )
        .orderBy("tier", "pos_in_tier")
    )


CURRICULUM_ORACLE = """
WITH keyed AS (
  SELECT doc_id,
         CASE WHEN n_chars < 500 THEN 0
              WHEN n_chars < 2000 THEN 1
              ELSE 2 END AS tier,
         ('0x' || substr(md5('curr0:' || doc_id::VARCHAR), 1, 12))::BIGINT
           AS skey
  FROM documents
)
SELECT doc_id, tier,
       row_number() OVER (PARTITION BY tier ORDER BY skey, doc_id)
         AS pos_in_tier
FROM keyed
ORDER BY tier, pos_in_tier
"""


QUERIES = {
    "corpus_split_train_val": corpus_split_train_val,
    "corpus_sample_weighted": corpus_sample_weighted,
    "corpus_sample": corpus_sample,
    "corpus_sample_stratified": corpus_sample_stratified,
    "corpus_shuffle_deterministic": corpus_shuffle_deterministic,
    "corpus_curriculum_order": corpus_curriculum_order,
    "array_higher_order": array_higher_order,
}

ORACLES = {
    "corpus_split_train_val": SPLIT_ORACLE,
    "corpus_sample_weighted": SAMPLE_WEIGHTED_ORACLE,
    # corpus_sample / corpus_sample_stratified: rows-only by design
    "corpus_shuffle_deterministic": SHUFFLE_ORACLE,
    "corpus_curriculum_order": CURRICULUM_ORACLE,
    "array_higher_order": ARRAY_HOF_ORACLE,
}
