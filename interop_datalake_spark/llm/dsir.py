"""Data Selection via Importance Resampling (DSIR) — hashed n-gram
importance weights as pure DataFrame algebra.

Method (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", public paper): fit two bag-of-hashed-ngrams
multinomials — one on a small TARGET corpus (the distribution you want
more of), one on the RAW corpus — and score every raw document by its
log importance weight

    log w(d) = Σ_{tokens t ∈ d} [ log p̂_target(bucket(t))
                                 − log p̂_raw(bucket(t)) ]

with add-α smoothing over B hash buckets. Selecting the top-K weighted
documents concentrates the selection on target-like text. The original
paper uses Gumbel-top-k resampling; top-K on the deterministic weights
is the zero-temperature limit and keeps the operator engine-replayable.

Scale shape (the reason this is THE practical data-selection method at
100 TB): both count tables are **bucket-bounded** (B rows, default
1024), never corpus-bounded — they broadcast to every executor while
the token-instance table streams through an int-key join. One
doc-keyed shuffle for the final per-doc sum. No UDFs, no collects.

Float discipline: the per-bucket log-ratio is rounded to 9 dp and the
per-doc sum accumulated as exact DECIMAL, so document scores are
independent of partitioning and engine (memory:
spark-duckdb-float-determinism).

Hashing is the repo's portable md5-derived 32-bit hash
(llm/dedup.py:_hash64) so the DuckDB oracle replays bucketing exactly;
collisions only blur the feature space (they are the POINT of hashed
features — DSIR itself uses hashed n-grams for exactly this
dimensionality bound).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from interop_datalake_spark.functions import text as T
from interop_datalake_spark.llm.dedup import _hash64


def _bucketed_tokens(
    docs: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket) — one row per token INSTANCE (counts, not set
    membership: the multinomial is over occurrences)."""
    return docs.select(
        F.col(id_col),
        F.explode(T.words(F.lower(F.col(text_col)))).alias("w"),
    ).select(
        id_col, (_hash64(F.col("w")) % F.lit(n_buckets)).alias("bucket")
    )


def importance_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log importance weight.

    ``is_target`` is a boolean Column over ``docs`` marking the target
    corpus (it stays in the frame — target docs are scored too, which
    is the standard sanity probe: they should score high).

    Returns (id, n_toks, log_weight) with log_weight rounded to 6 dp.
    Documents with zero tokens carry no evidence and are absent.
    """
    toks = _bucketed_tokens(
        docs.withColumn("_tgt", is_target), text_col, id_col, n_buckets
    )
    tgt_ids = docs.withColumn("_tgt", is_target).filter("_tgt").select(id_col)
    # bucket-bounded count tables (≤ n_buckets rows each)
    raw = toks.groupBy("bucket").agg(F.count("*").alias("c_raw"))
    tgt = (
        toks.join(F.broadcast(tgt_ids), id_col, "left_semi")
        .groupBy("bucket")
        .agg(F.count("*").alias("c_tgt"))
    )
    # per-side totals as 1-row frames (broadcast cross join, no collect)
    tot = (
        raw.agg(F.sum("c_raw").alias("t_raw"))
        .crossJoin(tgt.agg(F.sum("c_tgt").alias("t_tgt")))
    )
    b = F.lit(float(n_buckets))
    a = F.lit(float(alpha))
    ratio = (
        raw.join(tgt, "bucket", "left")
        .na.fill({"c_tgt": 0})
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log((F.col("c_tgt") + a) / (F.col("t_tgt") + a * b))
                - F.log((F.col("c_raw") + a) / (F.col("t_raw") + a * b)),
                9,
            )
            .cast("decimal(18,9)")
            .alias("log_ratio"),
        )
    )
    from interop_datalake_spark.functions.fixedpoint import (
        div_half_up,
        micros_to_double,
    )

    # the 9-dp DECIMAL sum sits on the 1e-9 grid, where round(double,
    # 6) can land exactly half-way (ewma red-row class): emit the
    # 6-dp weight via exact half-up nano→micro integer division
    return (
        toks.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_toks"),
            micros_to_double(
                div_half_up(
                    (F.sum("log_ratio") * 1000000000).cast("bigint"),
                    F.lit(1000),
                )
            ).alias("log_weight"),
        )
    )


def select_top_k(
    weights: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Zero-temperature DSIR resampling: mark the K highest-weight
    documents (ties broken by id for determinism). A global
    rank — but over the (doc_id, log_weight) frame, which is ~16 bytes
    a row: at 100 TB of text that frame is ~billions of rows, and
    rank-without-partition is the one global sort in the pipeline;
    production replaces it with an approx-quantile threshold
    (approxQuantile on log_weight, then a filter) when K need only be
    approximate."""
    w = Window.orderBy(F.desc("log_weight"), F.col(id_col))
    return weights.withColumn(
        "selected", (F.row_number().over(w) <= k)
    )
