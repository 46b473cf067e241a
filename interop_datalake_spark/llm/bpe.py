"""BPE (byte-pair encoding) tokenizer TRAINING as pure DataFrame
algebra — the vocabulary-learning step of an LLM data pipeline
(Sennrich et al. 2016), with the classic scaling trick built in: the
corpus is scanned ONCE to build the weighted word-frequency table, and
every merge iteration runs over the word VOCABULARY (dictionary-sized,
shuffles keyed by word) — corpus size only ever affects the first
groupBy.

Semantics (matching the reference BPE algorithm):

- pair frequencies count every adjacent occurrence (overlaps included:
  'aaaa' contributes three (a,a) pairs), weighted by word frequency;
- the best pair is the global argmax with a deterministic tie-break
  (count desc, then left, then right lexicographically);
- merging replaces non-overlapping occurrences LEFTMOST-FIRST
  ('aaaa' + merge (a,a) → 'aa','aa', not 'a','aa','a') — implemented
  as a parity rule over islands of consecutive match positions, which
  is exactly greedy left-to-right;
- no RNG anywhere, so the whole merge trajectory is a pure function of
  the corpus and a DuckDB oracle can replay it CTE-for-CTE.

Every per-iteration operation is a window or aggregation keyed by
``word`` — one shuffle key reused across all passes — plus one
broadcast of the single-row argmax. Symbol tables are
``localCheckpoint``-ed between iterations (same lineage discipline as
llm/clustering.py's Lloyd loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from interop_datalake_spark.functions import text as T


def word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, wcount): the one corpus-sized pass."""
    return (
        docs.select(F.explode(T.words(text_col)).alias("w"))
        .select(F.lower("w").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wcount"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """(word, wcount, pos, sym): each word split into 1-char symbols,
    pos dense 1..len."""
    return words.select(
        "word",
        "wcount",
        F.posexplode(
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        ).alias("_p", "sym"),
    ).select("word", "wcount", (F.col("_p") + 1).alias("pos"), "sym")


def _pair_stats(syms: DataFrame) -> DataFrame:
    """(left, right, pair_count): adjacent-pair frequencies, overlaps
    included, weighted by word frequency."""
    w = Window.partitionBy("word").orderBy("pos")
    return (
        syms.withColumn("nxt", F.lead("sym").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("left"), F.col("nxt").alias("right"))
        .agg(F.sum("wcount").alias("pair_count"))
    )


def bpe_iteration(syms: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One merge round: returns (new_syms, best) where best is the
    single-row (left, right, pair_count) argmax that was merged."""
    best = (
        _pair_stats(syms)
        .orderBy(F.desc("pair_count"), "left", "right")
        .limit(1)
    )
    w = Window.partitionBy("word").orderBy("pos")
    marked = (
        syms.crossJoin(F.broadcast(best))
        .withColumn("nxt", F.lead("sym").over(w))
        .withColumn(
            "is_match",
            # coalesce: the last symbol of a word has NULL nxt, and a
            # NULL flag would poison the lag/filter chain below
            F.coalesce(
                (F.col("sym") == F.col("left"))
                & (F.col("nxt") == F.col("right")),
                F.lit(False),
            ),
        )
    )
    # leftmost-first non-overlapping: within each island of CONSECUTIVE
    # match positions, merge every other one (positions at even offset
    # from the island head). island = pos - rank among matches.
    mw = Window.partitionBy("word", "is_match").orderBy("pos")
    iw = Window.partitionBy("word", "island")
    merged = (
        marked.withColumn(
            "island",
            F.when(F.col("is_match"), F.col("pos") - F.row_number().over(mw)),
        )
        .withColumn(
            "do_merge",
            F.col("is_match")
            & ((F.col("pos") - F.min("pos").over(iw)) % 2 == 0),
        )
        .withColumn("prev_merged", F.lag("do_merge", 1, False).over(w))
        .filter(~F.col("prev_merged"))  # drop the consumed right symbol
        .select(
            "word",
            "wcount",
            "pos",
            F.when(
                F.col("do_merge"), F.concat(F.col("sym"), F.col("nxt"))
            ).otherwise(F.col("sym")).alias("sym"),
        )
    )
    new_syms = merged.withColumn(
        "pos", F.row_number().over(Window.partitionBy("word").orderBy("pos"))
    )
    return new_syms, best


def bpe_train(
    docs: DataFrame, text_col: str, n_merges: int = 2
) -> tuple[DataFrame, DataFrame]:
    """Train ``n_merges`` BPE merges on the corpus. Returns
    (merges, symbols): ``merges`` is (rank, left, right, pair_count)
    — the learned merge table a tokenizer ships; ``symbols`` is the
    post-merge (word, wcount, pos, sym) state for inspection/encoding.
    """
    spark = docs.sparkSession
    syms = initial_symbols(word_counts(docs, text_col)).localCheckpoint(
        eager=False
    )
    merges = None
    for rank in range(1, n_merges + 1):
        syms, best = bpe_iteration(syms)
        # eager: the next iteration's pair stats AND the merges union
        # below both consume this state; without the cut the plan
        # nests one full merge round per iteration
        syms = syms.localCheckpoint()
        step = best.withColumn("rank", F.lit(rank)).select(
            "rank", "left", "right", "pair_count"
        )
        merges = step if merges is None else merges.unionByName(step)
    return merges, syms
