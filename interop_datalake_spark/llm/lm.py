"""Corpus-trained n-gram language-model scoring — the CCNet-style
perplexity quality filter, as pure DataFrame algebra.

Model: bigram LM with add-k smoothing fit on the scored corpus itself,
p(w₂|w₁) = (c(w₁,w₂) + k) / (c(w₁) + k·V). Documents are scored by
cross-entropy (mean −ln p over their bigrams): boilerplate scores low,
token soup scores high, and a curation pipeline thresholds the tail.

Scale shape: posexplode → one lag window keyed by doc (the same
doc-keyed shuffle the final per-doc agg reuses) → two count tables
that are VOCAB bounded, not corpus bounded — at 100 TB the bigram and
unigram tables are dictionary-sized and broadcastable while the
instance table streams through the join.

Float discipline: each ln is rounded to 9 dp and summed as exact
DECIMAL, so the per-doc sum is order-independent across partitionings
and engines; the single final division happens on bit-identical
doubles (memory: spark-duckdb-float-determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from interop_datalake_spark.functions import text as T
from interop_datalake_spark.functions.fixedpoint import (
    div_half_up,
    micros_to_double,
)


def bigram_cross_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """(id, n_bigrams, cross_entropy): per-document mean −ln p(w₂|w₁)
    under the corpus-fit add-k bigram LM. Documents with fewer than
    two tokens produce no bigrams and are absent from the output
    (they carry no LM evidence either way)."""
    toks = docs.select(
        F.col(id_col), F.posexplode(T.words(text_col)).alias("pos", "w")
    ).select(id_col, "pos", F.lower("w").alias("w"))
    lagw = Window.partitionBy(id_col).orderBy("pos")
    big = (
        toks.withColumn("w1", F.lag("w").over(lagw))
        .filter(F.col("w1").isNotNull())
        .select(id_col, "w1", "w")
    )
    c12 = big.groupBy("w1", "w").agg(F.count("*").alias("c12"))
    c1 = toks.groupBy("w").agg(F.count("*").alias("c1")).withColumnRenamed(
        "w", "w1"
    )
    vocab = toks.agg(F.countDistinct("w").alias("v"))
    lp = F.round(
        F.log(
            (F.col("c12") + F.lit(k))
            / (F.col("c1") + F.lit(k) * F.col("v"))
        ),
        9,
    ).cast("decimal(18,9)")
    return (
        big.join(c12, ["w1", "w"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("_lp", lp)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            # mean at 6 dp via exact BIGINT nano/micro units: the
            # 9-dp DECIMAL sum over an integer count is rational and
            # CAN land exactly half-way on the 6-dp grid, where
            # round(double, 6) flips between engines (ewma red class)
            micros_to_double(
                div_half_up(
                    (F.sum("_lp") * F.lit(-1000000000)).cast("bigint"),
                    F.count("*") * F.lit(1000),
                )
            ).alias("cross_entropy"),
        )
    )
