"""Lexical retrieval over the corpus: BM25 scoring as pure DataFrame
algebra (inverted-index shape, no UDFs).

The pipeline is the textbook distributed inverted index:

- **postings**: explode words → groupBy (doc, term) count = tf. The
  only wide shuffle, keyed on (doc, term) — at 100 TB this is the
  index-build pass every search engine pays once.
- **document frequencies**: postings → groupBy term → countDistinct
  doc. Output is vocabulary-sized (Heaps-law bounded — tiny next to
  the corpus), so the df/idf table broadcasts.
- **scoring**: the query is a literal handful of terms; semi-joining
  postings against it broadcasts the query side, so scoring scans the
  postings of the query terms only (partition-pruned if the index is
  bucketed by term) and never the full corpus.

Corpus-level scalars (N, avgdl) ride along as a broadcast single-row
aggregate — never a driver-side collect.

Scoring is Lucene-flavored BM25:
``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``,
``tfn = tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))``, score = Σ idf·tfn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize_words(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) postings input: lowercased whitespace words."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    return df.select(
        F.col(id_col), F.explode(words).alias("term")
    ).withColumn("term", F.lower(F.col("term")))


def bm25_scores(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document containing ≥1 query term.

    Returns (id, n_hit_terms, score) — callers order/limit. All math
    in DOUBLE so the DuckDB oracle replays it exactly.

    Query terms are DEDUPLICATED (case-insensitively) before scoring —
    BM25 is defined over the term set, and a repeated term would
    double-count its contribution. An empty (or all-duplicate-empty)
    query short-circuits to an empty result with the right schema
    instead of failing schema inference on an empty literal frame.
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        id_type = dict(docs.dtypes)[id_col]
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, n_hit_terms BIGINT, score DOUBLE"
        )
    postings = tokenize_words(docs, text_col, id_col)
    tf = postings.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    doclen = postings.groupBy(id_col).agg(F.count("*").alias("dl"))
    return score_bm25_stats(tf, doclen, id_col, terms, k1, b)


def score_bm25_stats(
    tf: DataFrame,
    doclen: DataFrame,
    id_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    n_docs: float | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """BM25 scoring from the INDEX STATS themselves — ``tf``
    (id, term, tf) and ``doclen`` (id, dl) — so the one scoring
    expression serves both the one-shot path (bm25_scores, stats
    derived in-flight) and the persisted BM25Index (stats read back
    from TxnTables). ``terms`` must already be lowercased/deduped.
    df is computed from the tf frame restricted to nothing — callers
    passing a term-pruned tf still get exact per-term df because
    pruning keeps every posting of the queried terms. Callers that
    already KNOW the corpus scalars (BM25Index: manifest row count +
    maintained Σdl commit property) pass ``n_docs``/``avgdl`` to skip
    the doclen aggregate — the values must equal what the aggregate
    would produce (exact-int Σdl / N division is)."""
    spark = tf.sparkSession
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    # corpus scalars as a broadcast 1-row frame (no driver collect)
    if n_docs is not None and avgdl is not None:
        scalars = spark.createDataFrame(
            [(float(n_docs), float(avgdl))], "n_docs DOUBLE, avgdl DOUBLE"
        )
    else:
        scalars = doclen.agg(
            F.count("*").cast("double").alias("n_docs"),
            F.avg(F.col("dl").cast("double")).alias("avgdl"),
        )

    q = F.broadcast(
        spark.createDataFrame([(t,) for t in terms], "term STRING")
    )
    hits = (
        tf.join(q, "term")
        .join(F.broadcast(dfreq), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(scalars))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf").cast("double") * (k1 + 1)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
        )
    )
    return (
        hits.withColumn("term_score", idf * tfn)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_hit_terms"),
            F.sum("term_score").alias("score"),
        )
    )


def tfidf_keywords(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    top_n: int = 3,
) -> DataFrame:
    """Per-document keyword extraction by TF-IDF: tf from the doc's
    postings, idf = ln(N/df) from the corpus, top-N terms per doc by
    (score desc, term asc) — the deterministic tie-break matters
    because word-salad corpora produce exact score ties.

    Scale shape: same two aggregations as BM25's index build (tf and
    df — df is vocabulary-sized and broadcasts); the per-doc top-N is
    a window over each doc's DISTINCT terms, partitioned by doc —
    never a global sort. Scores are idf·tf with idf rounded to 9 dp
    BEFORE the multiply so the ranking replays bit-for-bit in the
    oracle."""
    from pyspark.sql import Window

    postings = tokenize_words(docs, text_col, id_col)
    # tf feeds three consumers (df table, the N scalar, the scoring
    # join): materialize it once; N rides as a broadcast 1-row
    # crossJoin — never a driver collect (the bm25_scores convention)
    tf = (
        postings.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = tf.agg(
        F.count_distinct(id_col).cast("double").alias("_n_docs")
    )
    from interop_datalake_spark.functions.fixedpoint import (
        div_half_up,
        micros_to_double,
    )

    # score = tf · idf with idf on the 9-dp grid puts score on the
    # 1e-9 grid, where round(double, 6) can land exactly half-way
    # (ewma red-row class): carry score as exact BIGINT nano-units —
    # ranking compares the integers (no double-collision tie risk) and
    # the emitted 6-dp value is an exact half-up division.
    # round at nano scale directly (a ×1e9 THEN truncating cast would
    # corrupt k − ε doubles); ln is irrational so the 0-dp round of
    # ln·1e9 never sits near a tie
    idf_nano = F.round(
        F.log(F.col("_n_docs") / F.col("df")) * 1000000000, 0
    ).cast("bigint")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            id_col,
            "term",
            "tf",
            (F.col("tf") * idf_nano).alias("_score_nano"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_score_nano"), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            id_col,
            "rank",
            "term",
            "tf",
            micros_to_double(
                div_half_up(F.col("_score_nano"), F.lit(1000))
            ).alias("score"),
        )
    )


def positional_postings(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, pos, term) positional index input: 0-based positions over
    lowercased whitespace words — the index layout phrase and
    proximity queries need (tf-only postings can't order terms)."""
    words = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda w: w != "")
    return df.select(
        F.col(id_col), F.posexplode(words).alias("pos", "term")
    )


def phrase_search(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    phrase: list[str],
) -> DataFrame:
    """Exact phrase matching over a positional inverted index.

    Instead of chaining m−1 self-joins (one per adjacent term pair —
    m shuffles), every posting that matches phrase term i is projected
    to its **anchor** ``pos − i``: a phrase occurrence starting at p
    puts all m of its postings on the same (doc, anchor=p) key, so ONE
    groupBy counting distinct term slots == m finds every occurrence.
    Repeated phrase terms are handled naturally — a posting of a
    repeated word joins once per slot it could fill.

    Scale shape: the phrase frame is a broadcast literal; the postings
    scan is pruned to the phrase's terms BEFORE the shuffle, so the
    groupBy moves only candidate postings (at 100 TB: the posting
    lists of m terms, not the corpus). Returns
    (id, n_occurrences, first_pos)."""
    m = len(phrase)
    if m == 0:
        id_type = dict(docs.dtypes)[id_col]
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, n_occurrences BIGINT, first_pos INT"
        )
    slots = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(i, t.lower()) for i, t in enumerate(phrase)], "i INT, term STRING"
        )
    )
    postings = positional_postings(docs, text_col, id_col)
    anchored = postings.join(slots, "term").select(
        id_col, (F.col("pos") - F.col("i")).alias("anchor"), "i"
    )
    occ = (
        anchored.groupBy(id_col, "anchor")
        .agg(F.count_distinct("i").alias("n_slots"))
        .filter(F.col("n_slots") == m)
    )
    return occ.groupBy(id_col).agg(
        F.count("*").alias("n_occurrences"),
        F.min("anchor").cast("int").alias("first_pos"),
    )


def hybrid_rrf(
    docs: DataFrame,
    emb: DataFrame,
    text_col: str,
    id_col: str,
    vec_col: str,
    vec_id_col: str,
    query_terms: list[str],
    query_vec_id,
    n_each: int = 20,
    rrf_k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Hybrid retrieval: lexical BM25 ∪ dense cosine, fused by
    Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009):
    ``rrf = Σ 1/(rrf_k + rank_i)`` over the lists a document appears
    in. RRF is the standard production fusion because it needs no
    score calibration — only RANKS cross the modality boundary, so a
    BM25 log-scale score and a [−1, 1] cosine can never outvote each
    other by units.

    Scale shape: each side is its own top-``n_each`` cut BEFORE
    fusion — the lexical candidates collapse via orderBy+limit
    (TakeOrderedAndProject: per-partition top-N, never a global
    sort) and the dense side reuses :func:`~interop_datalake_spark.
    llm.similarity.brute_force_topk` (queries broadcast, corpus
    scanned once). The fusion join then touches ≤ 2·n_each rows —
    driver-trivial at any corpus size. The final row_number windows
    run on those ≤ n_each-row frames only.

    Determinism: ranks tie-break on the id columns; fused scores
    tie-break on ``id_col`` — so the output replays exactly in the
    DuckDB oracle. Returns (id, lex_rank, dense_rank, rrf) with NULL
    ranks for single-list documents."""
    from pyspark.sql import Window

    from interop_datalake_spark.llm.similarity import brute_force_topk

    lex = bm25_scores(docs, text_col, id_col, query_terms)
    lex_top = lex.orderBy(F.desc("score"), F.col(id_col)).limit(n_each)
    w = Window.orderBy(F.desc("score"), F.col(id_col))
    lex_r = lex_top.withColumn(
        "lex_rank", F.row_number().over(w)
    ).select(F.col(id_col).alias("_rid"), "lex_rank")
    dense = brute_force_topk(
        emb.filter(F.col(vec_id_col) == query_vec_id),
        emb,
        vec_col,
        vec_id_col,
        k=n_each,
    )
    dense_r = dense.select(
        F.col("neighbor_id").alias("_rid"),
        F.col("rn").alias("dense_rank"),
    )
    fused = (
        lex_r.join(dense_r, "_rid", "full_outer")
        .select(
            F.col("_rid").alias(id_col),
            "lex_rank",
            "dense_rank",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(rrf_k) + F.col("dense_rank")),
                    F.lit(0.0),
                )
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), F.col(id_col)).limit(top_n)
