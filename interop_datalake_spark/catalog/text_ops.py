"""Text-analysis catalog: quality scoring, token counting, language
heuristic, fingerprinting over the documents table (functions/text.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from interop_datalake_spark.functions import text as T
from interop_datalake_spark.functions.fixedpoint import (
    exact_ratio,
    sql_exact_ratio,
    sql_try_exact_ratio,
)
from interop_datalake_spark.sources.tables import fan_out, load_table


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.length("text").alias("n_chars_actual"),
            T.token_count_ws("text").alias("n_words"),
            T.token_count_bpe_ish("text").alias("n_tokens"),
            # emitted ratios use the exact 6-dp integer-ratio variants
            # (round(double, 6) of an integer ratio is the ewma red
            # class — functions/fixedpoint.py)
            F.coalesce(T.punct_ratio_6dp("text"), F.lit(0.0)).alias(
                "punct_ratio"
            ),
            T.avg_word_length_6dp("text").alias("avg_word_len"),
            F.coalesce(
                T.stopword_ratio_6dp("text", "en"), F.lit(0.0)
            ).alias("en_stopword_ratio"),
            T.quality_score("text").alias("quality"),
        )
        .orderBy("doc_id")
    )


_WORDS = "list_filter(string_split_regex(text, '\\s+'), w -> w <> '')"
_EN_SW = "['the','a','of','and','to','in','is','on','for','with']"
#: punct-char count (f-string expressions can't hold backslashes)
_PUNCT_N = "length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))"

TEXT_QUALITY_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, {_WORDS} AS ws FROM documents
), m AS (
  SELECT doc_id,
         length(text)                                            AS n_chars_actual,
         len(ws)                                                 AS n_words,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens,
         coalesce({sql_try_exact_ratio(_PUNCT_N, "length(text)")},
                  0.0)                                           AS punct_ratio,
         {sql_try_exact_ratio(
             "list_sum(list_transform(ws, w -> length(w)))::BIGINT",
             "len(ws)")}                                         AS avg_word_len,
         coalesce({sql_try_exact_ratio(
             "len(list_filter(list_transform(ws, w -> lower(w)),"
             f" w -> list_contains({_EN_SW}, w)))",
             "len(ws)")}, 0.0)                                   AS en_stopword_ratio,
         length(text) AS L,
         coalesce(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
                  / nullif(length(text), 0), 0.0)                AS praw,
         coalesce(len(list_filter(list_transform(ws, w -> lower(w)),
                                  w -> list_contains({_EN_SW}, w)))::DOUBLE
                  / nullif(len(ws), 0), 0.0)                     AS sraw
  FROM base
)
SELECT doc_id, n_chars_actual, n_words, n_tokens, punct_ratio, avg_word_len,
       en_stopword_ratio,
       round((CASE WHEN L >= 100 AND L <= 20000 THEN 1.0 ELSE 0.4 END)::DOUBLE * 0.4
           + (CASE WHEN praw <= 0.2 THEN 1.0 ELSE 0.5 END)::DOUBLE * 0.3
           + (CASE WHEN sraw >= 0.02 THEN 1.0 ELSE 0.6 END)::DOUBLE * 0.3, 4) AS quality
FROM m ORDER BY doc_id
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            T.stopword_hits("text", "en").alias("en_hits"),
            T.stopword_hits("text", "es").alias("es_hits"),
            T.stopword_hits("text", "fr").alias("fr_hits"),
            T.stopword_hits("text", "de").alias("de_hits"),
            T.language_guess("text").alias("lang_guess"),
        )
        .orderBy("doc_id")
    )


def _hits_sql(sw_list: str) -> str:
    return (
        f"len(list_filter(list_transform({_WORDS}, w -> lower(w)),"
        f" w -> list_contains({sw_list}, w)))"
    )


_SW = {
    "en": _EN_SW,
    "es": "['el','la','de','y','en','es','un','una','por','con']",
    "fr": "['le','la','de','et','en','est','un','une','pour','avec']",
    "de": "['der','die','das','und','zu','in','ist','ein','eine','mit']",
}

TEXT_LANG_ORACLE = f"""
WITH h AS (
  SELECT doc_id, lang,
         {_hits_sql(_SW['en'])} AS en_hits,
         {_hits_sql(_SW['es'])} AS es_hits,
         {_hits_sql(_SW['fr'])} AS fr_hits,
         {_hits_sql(_SW['de'])} AS de_hits
  FROM documents
)
SELECT doc_id, lang, en_hits, es_hits, fr_hits, de_hits,
       CASE WHEN en_hits > 0 AND en_hits > es_hits AND en_hits > fr_hits AND en_hits > de_hits THEN 'en'
            WHEN es_hits > 0 AND es_hits > en_hits AND es_hits > fr_hits AND es_hits > de_hits THEN 'es'
            WHEN fr_hits > 0 AND fr_hits > en_hits AND fr_hits > es_hits AND fr_hits > de_hits THEN 'fr'
            WHEN de_hits > 0 AND de_hits > en_hits AND de_hits > es_hits AND de_hits > fr_hits THEN 'de'
            ELSE 'und' END AS lang_guess
FROM h ORDER BY doc_id
"""


#: characteristic character-bigrams per language (tiny, deterministic
#: inventory for the n-gram language heuristic)
_LANG_BIGRAMS = {
    "en": ["th", "he", "in"],
    "es": ["os", "ue", "ci"],
    "fr": ["le", "ou", "es"],
    "de": ["ch", "ei", "en"],
}


def _count_sub(col: str, sub: str):
    """Occurrences of ``sub`` via length difference — portable to any
    SQL engine (no regex escaping concerns)."""
    return (
        F.length(col) - F.length(F.replace(F.col(col), F.lit(sub), F.lit("")))
    ) / len(sub)


def text_lang_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-n-gram language heuristic: score = summed frequency of each
    language's characteristic bigrams; strict-majority argmax, else
    'und'. Complements the stopword-based text_lang_id."""
    docs = load_table(spark, sf_dir, "documents")
    scores = {
        lang: sum(
            (_count_sub("text", bg) for bg in bigrams), F.lit(0).cast("double")
        ).cast("int")
        for lang, bigrams in _LANG_BIGRAMS.items()
    }
    guess = F.lit("und")
    for lang, sc in scores.items():
        others = [o for lo, o in scores.items() if lo != lang]
        best = sc > 0
        for o in others:
            best = best & (sc > o)
        guess = F.when(best, F.lit(lang)).otherwise(guess)
    return (
        docs.select(
            "doc_id",
            *[sc.alias(f"{lang}_score") for lang, sc in scores.items()],
            guess.alias("lang_ngram_guess"),
        )
        .orderBy("doc_id")
    )


def _bigram_score_sql(bigrams: list[str]) -> str:
    terms = " + ".join(
        f"(length(text) - length(replace(text, '{bg}', ''))) / 2"
        for bg in bigrams
    )
    return f"({terms})::INT"


_SCORES_SQL = {
    lang: _bigram_score_sql(bgs) for lang, bgs in _LANG_BIGRAMS.items()
}

TEXT_LANG_NGRAM_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         {_SCORES_SQL['en']} AS en_score,
         {_SCORES_SQL['es']} AS es_score,
         {_SCORES_SQL['fr']} AS fr_score,
         {_SCORES_SQL['de']} AS de_score
  FROM documents
)
SELECT doc_id, en_score, es_score, fr_score, de_score,
       CASE WHEN en_score > 0 AND en_score > es_score AND en_score > fr_score AND en_score > de_score THEN 'en'
            WHEN es_score > 0 AND es_score > en_score AND es_score > fr_score AND es_score > de_score THEN 'es'
            WHEN fr_score > 0 AND fr_score > en_score AND fr_score > es_score AND fr_score > de_score THEN 'fr'
            WHEN de_score > 0 AND de_score > en_score AND de_score > es_score AND de_score > fr_score THEN 'de'
            ELSE 'und' END AS lang_ngram_guess
FROM scored ORDER BY doc_id
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            T.fingerprint("text").alias("fp"),
            T.fingerprint64("text").alias("fp64"),
        )
        .orderBy("doc_id")
    )


TEXT_FP_ORACLE = """
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))   AS fp,
       ('0x' || substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 8))::BIGINT AS fp64
FROM documents ORDER BY doc_id
"""


def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (MOSS-style rolling selection):
    hash every word-4-gram (the rolling hash), slide a window of 4
    consecutive shingle hashes, keep each window's minimum — the
    guaranteed-overlap fingerprint subset used for plagiarism/near-dup
    detection. Output: per doc, the count + min/max of its distinct
    fingerprints (stable summary of the selected set)."""
    from interop_datalake_spark.llm.dedup import _hash64, positioned_shingles
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    exploded = positioned_shingles(docs, "text", "doc_id", k=4).withColumn(
        "h", _hash64(F.col("gram"))
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-3, Window.currentRow)
    )
    fps = (
        exploded.withColumn("fp", F.min("h").over(w))
        .filter(F.col("pos") >= 3)  # only full windows
        .select("doc_id", "fp")
        .distinct()
    )
    return (
        fps.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_fingerprints"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


TEXT_WINNOW_ORACLE = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, g.i - 1 AS pos,
         array_to_string(w[g.i:g.i+3], ' ') AS gram
  FROM tok, unnest(generate_series(1, greatest(len(w) - 3, 0))) AS g(i)
), hashed AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5(gram), 1, 8))::BIGINT AS h
  FROM grams
), winmin AS (
  SELECT doc_id, pos,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
  FROM hashed
), fps AS (
  SELECT DISTINCT doc_id, fp FROM winmin WHERE pos >= 3
)
SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS min_fp, max(fp) AS max_fp
FROM fps GROUP BY doc_id ORDER BY doc_id
"""


def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: 5-gram containment of a held-out set
    against the training corpus (llm/dedup.py:ngram_containment). The
    held-out set derives deterministically from documents < 20: even
    ids keep their text verbatim (contaminated, containment 1.0), odd
    ids reverse their word order (clean, containment ~0). flagged =
    containment >= 0.8 — the rows a training run would drop."""
    from interop_datalake_spark.llm.dedup import ngram_containment

    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("eval_id"),
        F.when(
            F.col("doc_id") % 2 == 0, F.col("text")
        ).otherwise(
            F.array_join(F.reverse(F.split(F.col("text"), " ")), " ")
        ).alias("text"),
    )
    out = ngram_containment(
        docs, eval_df, "text", "eval_id", k=5, train_id_col="doc_id"
    )
    # containment n_hit/n_shingles is an integer ratio: exact 6-dp
    # half-up micro-units (round(double, 6) red class). flagged
    # compares the RAW IEEE ratio n_hit/n_shingles — one exact
    # int÷int division, bit-identical on both engines — matching the
    # oracle's raw-ratio comparison (the 6-dp-rounded value would flag
    # a raw containment in [0.7999995, 0.8) that the oracle doesn't:
    # the knife-edge boolean class, ADVICE round 5).
    return out.select(
        "eval_id",
        "n_shingles",
        "n_hit",
        exact_ratio(F.col("n_hit"), F.col("n_shingles")).alias(
            "containment"
        ),
        (
            F.col("n_hit").cast("double") / F.col("n_shingles") >= 0.8
        ).alias("flagged"),
    ).orderBy("eval_id")


CORPUS_DECONTAMINATE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), train_sh AS (
  SELECT DISTINCT
         unnest(list_transform(generate_series(1, greatest(len(w) - 4, 0)),
                               i -> array_to_string(w[i:i+4], ' '))) AS shingle
  FROM tok
), eval_docs AS (
  SELECT doc_id AS eval_id,
         CASE WHEN doc_id % 2 = 0 THEN string_split(text, ' ')
              ELSE list_reverse(string_split(text, ' ')) END AS w
  FROM documents WHERE doc_id < 20
), eval_sh AS (
  SELECT DISTINCT eval_id,
         unnest(list_transform(generate_series(1, greatest(len(w) - 4, 0)),
                               i -> array_to_string(w[i:i+4], ' '))) AS shingle
  FROM eval_docs
)
SELECT eval_id,
       count(*)                                    AS n_shingles,
       count(t.shingle)                            AS n_hit,
       {sql_exact_ratio('count(t.shingle)', 'count(*)')}
                                                   AS containment,
       count(t.shingle) / count(*) >= 0.8          AS flagged
FROM eval_sh e LEFT JOIN train_sh t ON e.shingle = t.shingle
GROUP BY eval_id ORDER BY eval_id
"""


def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (functions/text.py:chunk_words): 64-word
    windows at stride 48 (16-word overlap) — the sliding-window split
    a long-document training pipeline packs into fixed-length
    sequences. Chunk text is emitted as md5 so the checked frame stays
    narrow; n_chunk_words pins the tail-window semantics. Drop-tail
    convention (functions/text.py:chunk_starts): long docs emit full
    windows only — a ragged tail shorter than a stride is dropped, not
    re-emitted as a partial chunk; the oracle mirrors it."""
    from interop_datalake_spark.functions.text import chunk_words

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_words(docs, "text", "doc_id", size=64, stride=48)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.md5("chunk_text").alias("chunk_hash"),
        "n_chunk_words",
    ).orderBy("doc_id", "chunk_idx")


DOC_CHUNK_ORACLE = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), starts AS (
  SELECT doc_id, w,
         unnest(list_transform(
           generate_series(1, greatest(len(w) - 63, 1), 48),
           s -> s)) AS start
  FROM tok
)
SELECT doc_id,
       ((start - 1) // 48)::INT                 AS chunk_idx,
       md5(array_to_string(w[start:start+63], ' ')) AS chunk_hash,
       len(w[start:start+63])::INT              AS n_chunk_words
FROM starts ORDER BY doc_id, chunk_idx
"""


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (GPT-style concat-and-chunk): documents in
    corpus order are laid head-to-tail on a token tape; training
    sequence i covers tape positions [i·B, (i+1)·B). Each document is
    assigned to the sequence where it STARTS (exclusive running token
    count div B) — the deterministic batch layout a pretraining
    dataloader materializes. Output: per sequence, how many documents
    start there, their token mass, and the doc-id span.

    Scale note: the demo uses ONE global ordering window (a single-
    partition sort) for oracle determinism; the production layout is
    identical algebra per shard — partitionBy(shard) in the window —
    which packs each output shard independently with no global
    shuffle."""
    from pyspark.sql import Window

    from interop_datalake_spark.functions.text import token_count_ws

    budget = 2048
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_ws(F.col("text")).alias("n_tokens")
    )
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = docs.withColumn(
        "seq_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget
        ).cast("int"),
    )
    return (
        placed.groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("seq_id")
    )


CORPUS_PACK_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens
  FROM documents
), placed AS (
  SELECT doc_id, n_tokens,
         (coalesce(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          // 2048)::INT AS seq_id
  FROM toks
)
SELECT seq_id, count(*) AS n_docs, sum(n_tokens)::BIGINT AS seq_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM placed GROUP BY seq_id ORDER BY seq_id
"""


def corpus_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION form of sequence packing: each shard packs its
    documents independently — ``Window.partitionBy(shard)`` instead of
    the global-window demo above, so the running token count is a
    per-partition prefix sum and NO single-partition global sort
    exists. At 100 TB each shard's packing runs where its data lives
    (one shuffle by shard key, then per-shard window), which is how a
    pretraining dataloader actually materializes batches; shard =
    doc_id % 8 here so the oracle is deterministic, a real pipeline
    uses its file/bucket layout as the shard key."""
    from pyspark.sql import Window

    from interop_datalake_spark.functions.text import token_count_ws

    budget, n_shards = 2048, 8
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        token_count_ws(F.col("text")).alias("n_tokens"),
        (F.col("doc_id") % n_shards).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = docs.withColumn(
        "seq_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget
        ).cast("int"),
    )
    return (
        placed.groupBy("shard", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "seq_id")
    )


CORPUS_PACK_SHARDED_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
         (doc_id % 8)::INT AS shard
  FROM documents
), placed AS (
  SELECT doc_id, n_tokens, shard,
         (coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          // 2048)::INT AS seq_id
  FROM toks
)
SELECT shard, seq_id, count(*) AS n_docs, sum(n_tokens)::BIGINT AS seq_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM placed GROUP BY shard, seq_id ORDER BY shard, seq_id
"""


def corpus_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1),
    composed from pure column algebra — at 100 TB this keep/drop pass
    is a scan-bound projection, zero shuffles, zero Python. Five rules,
    each surfaced as its own boolean so downstream can audit WHY a doc
    dropped (the standard corpus-curation report), plus the composite
    ``keep``:

    - word count in [25, 100000]
    - mean word length in [3, 10]
    - ≥ 80% of words contain an alphabetic character
    - ≥ 2 distinct English stopwords (templated/keyword soup gate)
    - duplicate-word fraction ≤ 0.6 (Gopher's repetition gate)

    Thresholds sit inside this corpus's signal distributions (quartiles
    measured: n_words p25=32, dup_frac p75=0.64, distinct_sw p25=1) so
    every rule fires both ways — the filter demonstrably discriminates
    rather than rubber-stamping."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = T.token_count_ws("text")
    mwl = T.avg_word_length("text").cast("double")
    alpha = T.alpha_word_frac("text")
    dsw = T.distinct_stopword_count("text", "en")
    dupf = T.dup_word_frac("text")
    rules = {
        "r_word_count": (n_words >= 25) & (n_words <= 100000),
        "r_mean_word_len": (mwl >= 3.0) & (mwl <= 10.0),
        "r_alpha_words": F.coalesce(alpha, F.lit(0.0)) >= 0.8,
        "r_stopwords": dsw >= 2,
        "r_repetition": F.coalesce(dupf, F.lit(0.0)) <= 0.6,
    }
    keep = F.lit(True)
    for c in rules.values():
        keep = keep & c
    # rule booleans compare the RAW ratios (bit-identical IEEE doubles
    # on both engines — safe); only the EMITTED ratios switch to the
    # exact 6-dp integer variants (round(double, 6) red class)
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        T.avg_word_length_6dp("text").alias("mean_word_len"),
        F.coalesce(T.alpha_word_frac_6dp("text"), F.lit(0.0)).alias(
            "alpha_word_frac"
        ),
        dsw.alias("distinct_stopwords"),
        F.coalesce(T.dup_word_frac_6dp("text"), F.lit(0.0)).alias(
            "dup_word_frac"
        ),
        *[c.alias(n) for n, c in rules.items()],
        keep.alias("keep"),
    ).orderBy("doc_id")


CORPUS_FILTER_GOPHER_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_WORDS} AS ws FROM documents
), m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         list_sum(list_transform(ws, w -> length(w)))::DOUBLE
           / nullif(len(ws), 0) AS mwl,
         coalesce(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
           / nullif(len(ws), 0), 0.0) AS alpha,
         len(list_distinct(list_filter(list_transform(ws, w -> lower(w)),
             w -> list_contains({_EN_SW}, w)))) AS dsw,
         coalesce(1.0 - len(list_distinct(ws))::DOUBLE / nullif(len(ws), 0), 0.0)
           AS dupf,
         -- exact 6-dp twins for the EMITTED columns (rule booleans
         -- keep the raw IEEE ratios above, same as the Spark side)
         {sql_try_exact_ratio(
             "list_sum(list_transform(ws, w -> length(w)))::BIGINT",
             "len(ws)")} AS mwl6,
         coalesce({sql_try_exact_ratio(
             "len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))",
             "len(ws)")}, 0.0) AS alpha6,
         coalesce({sql_try_exact_ratio(
             "len(ws) - len(list_distinct(ws))", "len(ws)")}, 0.0) AS dupf6
  FROM base
)
SELECT doc_id, n_words, mwl6 AS mean_word_len,
       alpha6 AS alpha_word_frac, dsw AS distinct_stopwords,
       dupf6 AS dup_word_frac,
       (n_words >= 25 AND n_words <= 100000) AS r_word_count,
       (mwl >= 3.0 AND mwl <= 10.0) AS r_mean_word_len,
       (alpha >= 0.8) AS r_alpha_words,
       (dsw >= 2) AS r_stopwords,
       (dupf <= 0.6) AS r_repetition,
       (n_words >= 25 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
        AND alpha >= 0.8 AND dsw >= 2 AND dupf <= 0.6) AS keep
FROM m ORDER BY doc_id
"""


def corpus_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass (functions/text.py:redact_pii): typed
    placeholders for emails / phone numbers / SSNs plus per-kind audit
    counts. The synthetic corpus carries no PII, so the query PLANTS
    deterministic instances first (same planted-input pattern as
    ``dedup_exact``): an email on doc_id%7==0, a phone on %5==0, an SSN
    on %11==0 — docs hit several buckets, docs in none prove the
    no-op path. Redacted text is emitted as md5 to keep the checked
    frame narrow; ``clean`` pins that redacted text never re-matches
    any PII pattern (the idempotence property a scrubber must have)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" contact john.doe@example.com")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit(" call 555-123-4567 now")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit(" ssn 123-45-6789")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    counts = T.pii_counts(F.col("text"))
    redacted = T.redact_pii(F.col("text"))
    re_counts = T.pii_counts(redacted)
    clean = F.lit(True)
    for c in re_counts.values():
        clean = clean & (c == 0)
    return docs.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["phone"].alias("n_phones"),
        counts["ssn"].alias("n_ssns"),
        F.md5(redacted).alias("redacted_md5"),
        clean.alias("clean"),
    ).orderBy("doc_id")


_PII_PLANT = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' contact john.doe@example.com' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567 now' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789' ELSE '' END AS text
  FROM documents
"""

_PII_SSN = '\\b\\d{3}-\\d{2}-\\d{4}\\b'
_PII_PHONE = '\\b\\d{3}-\\d{3}-\\d{4}\\b'
_PII_EMAIL = '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'

CORPUS_REDACT_PII_ORACLE = f"""
WITH planted AS ({_PII_PLANT}), red AS (
  SELECT doc_id, text,
         regexp_replace(regexp_replace(regexp_replace(text,
             '{_PII_SSN}', '[SSN]', 'g'),
             '{_PII_PHONE}', '[PHONE]', 'g'),
             '{_PII_EMAIL}', '[EMAIL]', 'g') AS redacted
  FROM planted
)
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phones,
       len(regexp_extract_all(text, '{_PII_SSN}')) AS n_ssns,
       md5(redacted) AS redacted_md5,
       (len(regexp_extract_all(redacted, '{_PII_EMAIL}')) = 0
        AND len(regexp_extract_all(redacted, '{_PII_PHONE}')) = 0
        AND len(regexp_extract_all(redacted, '{_PII_SSN}')) = 0) AS clean
FROM red ORDER BY doc_id
"""


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals: the fraction of
    tokens that are repeats of an earlier token (``dup_word_frac``) and
    the share of bigram slots taken by the single most frequent bigram
    (``top_bigram_frac``). Boilerplate / template / spam documents
    score high on both; pretraining filters (Gopher §A.2, C4) drop
    them before tokenization.

    Scale notes: everything is per-document algebra — the only shuffle
    is the (doc_id, bigram) partial-aggregated groupBy, whose key
    cardinality is bounded by corpus token count; no window, no
    collect. Ratios are single IEEE divisions of exact integers, so
    they hash identically cross-engine without rounding (see
    functions/money.py for the determinism policy)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        T.words("text").alias("ws"),
    ).select(
        "doc_id",
        "ws",
        F.size("ws").alias("n_words"),
        F.size(F.array_distinct("ws")).alias("n_distinct"),
    )
    bigrams = base.where(F.col("n_words") >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("ws", 1, F.col("n_words") - 1),
                F.slice("ws", 2, F.col("n_words") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    )
    top_bigram = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"))
    )
    return (
        base.drop("ws")
        .join(top_bigram, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.coalesce(
                F.lit(1.0) - F.try_divide("n_distinct", "n_words"), F.lit(0.0)
            ).alias("dup_word_frac"),
            F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
            F.coalesce(
                F.try_divide("top_bigram_count", F.col("n_words") - 1),
                F.lit(0.0),
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


TEXT_REPETITION_ORACLE = f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS ws FROM documents
), base AS (
  SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct, ws
  FROM w
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS bigram
  FROM base WHERE len(ws) >= 2
), tb AS (
  SELECT doc_id, max(c) AS top_bigram_count
  FROM (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2)
  GROUP BY doc_id
)
SELECT b.doc_id, b.n_words,
       coalesce(1.0 - b.n_distinct::DOUBLE / nullif(b.n_words, 0), 0.0)
         AS dup_word_frac,
       coalesce(tb.top_bigram_count, 0)::BIGINT AS top_bigram_count,
       coalesce(tb.top_bigram_count::DOUBLE / nullif(b.n_words - 1, 0), 0.0)
         AS top_bigram_frac
FROM base b LEFT JOIN tb ON b.doc_id = tb.doc_id
ORDER BY b.doc_id
"""


def corpus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction: corpus-wide word frequencies, a
    min-count threshold (>= 5), and dense ids assigned by
    (frequency DESC, word ASC) — the table a tokenizer trainer or
    embedding layer consumes.

    Scale notes: the explode + groupBy is one map-side-combined
    shuffle on the word key; the min-count filter happens BEFORE the
    ranking, so the single-partition ``row_number`` window only ever
    sees the surviving vocabulary (~10⁵-10⁶ rows at any corpus size —
    vocabulary growth is sublinear in corpus size by Heaps' law), not
    the corpus."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(T.words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= 5)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("word"))
    return freq.select(
        "word", "freq", F.row_number().over(w).alias("vocab_id")
    ).orderBy("vocab_id")


CORPUS_VOCAB_ORACLE = f"""
WITH w AS (
  SELECT unnest({_WORDS}) AS word FROM documents
), f AS (
  SELECT word, count(*) AS freq FROM w GROUP BY word HAVING count(*) >= 5
)
SELECT word, freq,
       row_number() OVER (ORDER BY freq DESC, word)::INT AS vocab_id
FROM f ORDER BY vocab_id
"""


def corpus_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing weights (the multilingual-/
    multi-domain sampling rule from GPT-3 / XLM-R style pipelines):
    per-source token counts, then ``p_i ∝ sqrt(tokens_i)`` (α = 0.5)
    normalized over the corpus. Up-weights tail domains, down-weights
    the head — the table a sampler consumes to draw a token-budgeted
    training mix. One tiny agg (|sources| rows) + a broadcast of the
    single-row normalizer; nothing here grows with corpus size except
    the first groupBy, which partial-aggregates map-side."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(T.token_count_ws("text")).alias("n_tokens"),
    )
    z = per.agg(
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("_z")
    )
    return (
        per.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(
                F.sqrt(F.col("n_tokens").cast("double")) / F.col("_z"), 6
            ).alias("p_sample"),
        )
        .orderBy("source")
    )


DOMAIN_MIX_ORACLE = f"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         sum(len({_WORDS}))::BIGINT AS n_tokens
  FROM documents GROUP BY source
), z AS (SELECT sum(sqrt(n_tokens::DOUBLE)) AS _z FROM per)
SELECT source, n_docs, n_tokens,
       round(sqrt(n_tokens::DOUBLE) / _z, 6) AS p_sample
FROM per, z ORDER BY source
"""


def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LM quality score (CCNet-style perplexity filter):
    a bigram LM with add-½ smoothing is fit on the corpus itself, and
    each document is scored by its cross-entropy under that LM —
    boilerplate scores low, token soup scores high; a curation
    pipeline thresholds the tail. p(w₂|w₁) = (c₁₂+½)/(c₁+½V).

    Shape: posexplode → one lag window keyed by doc (the same shuffle
    the final per-doc agg reuses) → two count tables (vocab² bounded,
    NOT corpus bounded) joined back by word — every join key is a
    token string, so at 100 TB the count tables are dictionary-sized
    and broadcastable while the instance table streams.

    Float discipline: each ln is rounded to 9 dp and summed as exact
    DECIMAL, so the per-doc sum is order-independent; the single final
    division happens on bit-identical doubles in both engines
    (memory: spark-duckdb-float-determinism). Core in llm/lm.py."""
    from interop_datalake_spark.llm.lm import bigram_cross_entropy

    docs = load_table(spark, sf_dir, "documents")
    return bigram_cross_entropy(docs, "text", "doc_id", k=0.5).orderBy(
        "doc_id"
    )


TEXT_PERPLEXITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, i AS pos, lower(ws[i]) AS w
  FROM (SELECT doc_id, {_WORDS} AS ws FROM documents),
       unnest(generate_series(1, len(ws))) AS t(i)
), big AS (
  SELECT doc_id, lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w1, w
  FROM toks QUALIFY w1 IS NOT NULL
), c12 AS (
  SELECT w1, w, count(*) AS c12 FROM big GROUP BY w1, w
), c1 AS (
  SELECT w AS w1, count(*) AS c1 FROM toks GROUP BY w
), vocab AS (SELECT count(DISTINCT w) AS v FROM toks)
SELECT b.doc_id, count(*) AS n_bigrams,
       -- exact half-up micro-unit mean of the 9-dp DECIMAL sum
       -- (round(double, 6) of this rational is the ewma red class)
       ((2 * (sum(
         round(ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * vocab.v)), 9)
           ::DECIMAL(18,9)
       ) * -1000000000)::BIGINT + count(*) * 1000)
        // (2 * count(*) * 1000))::DOUBLE / 1000000.0 AS cross_entropy
FROM big b
JOIN c12 USING (w1, w)
JOIN c1 USING (w1)
CROSS JOIN vocab
GROUP BY b.doc_id ORDER BY b.doc_id
"""


def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016) as DataFrame
    algebra (llm/bpe.py): 3 learned merges over the corpus vocabulary.
    Pair counting includes overlaps, merging is leftmost-first
    non-overlapping (a parity rule over islands of consecutive match
    positions), ties break (count desc, left, right) — so the merge
    trajectory is deterministic and the oracle replays every round
    CTE-for-CTE. Ranks 2-3 depend on rank 1's merge being applied
    correctly, so the 3-row output witnesses counting, argmax AND
    application. The corpus is scanned once (word counts); every
    iteration is vocabulary-sized."""
    from interop_datalake_spark.llm.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges, _ = bpe_train(docs, "text", n_merges=3)
    return merges.orderBy("rank")


def _bpe_iter_sql(prev: str, n: int) -> str:
    """One BPE merge round as CTE fragments: pair stats over ``prev``,
    argmax pick, island-parity merge, renumber."""
    return f"""pc{n} AS (
  SELECT sym AS lft, nxt AS rgt, sum(wcount) AS pair_count FROM (
    SELECT word, wcount, pos, sym,
           lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
    FROM {prev}
  ) WHERE nxt IS NOT NULL GROUP BY sym, nxt
), b{n} AS (
  SELECT * FROM pc{n} ORDER BY pair_count DESC, lft, rgt LIMIT 1
), m{n} AS (
  SELECT s.word, s.wcount, s.pos, s.sym,
         lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) AS nxt,
         coalesce(
           s.sym = b.lft
           AND lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) = b.rgt,
           false) AS is_match
  FROM {prev} s CROSS JOIN b{n} b
), i{n} AS (
  SELECT *, CASE WHEN is_match
    THEN pos - row_number() OVER (PARTITION BY word, is_match ORDER BY pos)
    END AS island
  FROM m{n}
), d{n} AS (
  SELECT *, is_match AND
    ((pos - min(pos) OVER (PARTITION BY word, island)) % 2 = 0) AS do_merge
  FROM i{n}
), f{n} AS (
  SELECT word, wcount, pos,
         CASE WHEN do_merge THEN sym || nxt ELSE sym END AS sym
  FROM (
    SELECT *, coalesce(
      lag(do_merge) OVER (PARTITION BY word ORDER BY pos), false
    ) AS prev_merged
    FROM d{n}
  ) WHERE NOT prev_merged
), s{n} AS (
  SELECT word, wcount,
         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
  FROM f{n}
)"""


TEXT_BPE_ORACLE = f"""
WITH w0 AS (
  SELECT lower(tok) AS word, count(*) AS wcount
  FROM (SELECT unnest({_WORDS}) AS tok FROM documents)
  GROUP BY 1
), s0 AS (
  SELECT word, wcount, i AS pos, substr(word, i, 1) AS sym
  FROM w0, unnest(generate_series(1, length(word))) AS t(i)
), {_bpe_iter_sql('s0', 1)}, {_bpe_iter_sql('s1', 2)}, {_bpe_iter_sql('s2', 3)}
SELECT rank, lft AS "left", rgt AS "right",
       -- ::BIGINT: DuckDB sum() yields HUGEINT, which the driver's
       -- hashing layer canonicalizes differently from Spark's int64
       -- (round-4 driver-red class; tests/oracle.py type whitelist)
       pair_count::BIGINT AS pair_count FROM (
  SELECT 1 AS rank, lft, rgt, pair_count FROM b1
  UNION ALL SELECT 2, lft, rgt, pair_count FROM b2
  UNION ALL SELECT 3, lft, rgt, pair_count FROM b3
) ORDER BY rank
"""


def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under the LEARNED tokenizer — the budget a
    dataloader actually pays, vs the whitespace proxy elsewhere:
    trains the same 3 BPE merges as text_bpe_train, then counts each
    document's subword tokens. Tokenization is word-level, so the
    apply step is a JOIN against the vocabulary's final symbol counts
    — no per-document work, no driver state: docs → words →
    (word, n_subwords) lookup → per-doc sum. At 100 TB the trained
    vocabulary table is dictionary-sized and broadcastable. Output
    also carries the whitespace word count, so the compression the
    merges bought is visible per document."""
    from interop_datalake_spark.llm.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    _, syms = bpe_train(docs, "text", n_merges=3)
    per_word = syms.groupBy("word").agg(F.count("*").alias("n_subwords"))
    toks = docs.select(
        "doc_id", F.explode(T.words("text")).alias("w")
    ).select("doc_id", F.lower("w").alias("word"))
    return (
        toks.join(F.broadcast(per_word), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_subwords").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


TEXT_BPE_TOKENIZE_ORACLE = f"""
WITH w0 AS (
  SELECT lower(tok) AS word, count(*) AS wcount
  FROM (SELECT unnest({_WORDS}) AS tok FROM documents)
  GROUP BY 1
), s0 AS (
  SELECT word, wcount, i AS pos, substr(word, i, 1) AS sym
  FROM w0, unnest(generate_series(1, length(word))) AS t(i)
), {_bpe_iter_sql('s0', 1)}, {_bpe_iter_sql('s1', 2)}, {_bpe_iter_sql('s2', 3)},
per_word AS (
  SELECT word, count(*) AS n_subwords FROM s3 GROUP BY word
), toks AS (
  SELECT doc_id, lower(tok) AS word
  FROM (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents)
)
SELECT t.doc_id, count(*) AS n_words,
       sum(p.n_subwords)::BIGINT AS n_bpe_tokens
FROM toks t JOIN per_word p USING (word)
GROUP BY t.doc_id ORDER BY t.doc_id
"""


def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distill an expensive label into a cheap linear scorer: 3
    full-batch gradient-descent steps of logistic regression predicting
    ``lang = 'en'`` from 6-dp surface features (mean word length / 10,
    stopword ratio, ln-length/10). Output is the weight TRAJECTORY — one row per
    iteration with the start-of-iteration mean log-loss, so iter 1's
    0.693147 (ln 2 at w = 0) and the strictly-decreasing loss column
    witness that descent descends; each later row depends on the
    previous update being applied exactly.

    Execution shape (llm/classifier.py): per iteration, ONE scan +
    one map-side-combinable scalar agg; the 1-row weight state
    broadcasts back. σ rounded to 9 dp, per-row gradient/loss terms
    rounded to 9 dp and summed as DECIMAL, weights carried as 9-dp
    DECIMAL — the DuckDB oracle replays all 3 iterations CTE-for-CTE."""
    from interop_datalake_spark.llm.classifier import (
        doc_features,
        logreg_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = doc_features(docs, F.col("lang") == "en")
    return logreg_train(feats, iters=3, lr=1.0).orderBy("iter")


_LR_FEATS = f"""
  SELECT doc_id,
         round(coalesce(list_sum(list_transform({_WORDS}, w -> length(w)))::DOUBLE
               / nullif(len({_WORDS}), 0), 0.0) / 10.0, 6) AS x_awl,
         round(coalesce(len(list_filter(list_transform({_WORDS}, w -> lower(w)),
                                        w -> list_contains({_EN_SW}, w)))::DOUBLE
               / nullif(len({_WORDS}), 0), 0.0), 6) AS x_stop,
         round(ln(length(text) + 1.0) / 10.0, 6) AS x_loglen,
         (lang = 'en')::INT AS y
  FROM documents
"""


def _lr_iter_sql(k: int) -> str:
    """One GD iteration as CTE fragments reading weights from w{k-1}."""
    z = (
        "wb::DOUBLE + wp::DOUBLE * x_awl + ws_::DOUBLE * x_stop"
        " + wl::DOUBLE * x_loglen"
    )
    return f"""it{k} AS (
  SELECT count(*) AS n,
         sum(round(s - y, 9)::DECIMAL(20,9)) AS g_b,
         sum(round((s - y) * x_awl, 9)::DECIMAL(20,9)) AS g_p,
         sum(round((s - y) * x_stop, 9)::DECIMAL(20,9)) AS g_s,
         sum(round((s - y) * x_loglen, 9)::DECIMAL(20,9)) AS g_l,
         sum(round(-(y * ln(s) + (1 - y) * ln(1.0 - s)), 9)
             ::DECIMAL(20,9)) AS loss_sum
  FROM (SELECT f.*,
               round(1.0 / (1.0 + exp(-({z}))), 9) AS s
        FROM feats f CROSS JOIN w{k - 1})
), w{k} AS (
  SELECT round(wb::DOUBLE - g_b::DOUBLE / n, 9)::DECIMAL(20,9) AS wb,
         round(wp::DOUBLE - g_p::DOUBLE / n, 9)::DECIMAL(20,9) AS wp,
         round(ws_::DOUBLE - g_s::DOUBLE / n, 9)::DECIMAL(20,9) AS ws_,
         round(wl::DOUBLE - g_l::DOUBLE / n, 9)::DECIMAL(20,9) AS wl,
         -- 6-dp mean loss via exact BIGINT micro-units (loss >= 0):
         -- round(double, 6) at output precision is hash-fragile
         ((2 * (loss_sum * 1000000000)::BIGINT + n * 1000)
          // (2 * n * 1000))::DOUBLE / 1000000.0 AS train_loss
  FROM it{k} CROSS JOIN w{k - 1}
)"""


TEXT_CLASSIFIER_ORACLE = f"""
WITH feats AS ({_LR_FEATS}
), w0 AS (
  SELECT 0.0::DECIMAL(20,9) AS wb, 0.0::DECIMAL(20,9) AS wp,
         0.0::DECIMAL(20,9) AS ws_, 0.0::DECIMAL(20,9) AS wl
), {_lr_iter_sql(1)}, {_lr_iter_sql(2)}, {_lr_iter_sql(3)}
-- weights recurse as DECIMAL(20,9) but are EMITTED as DOUBLE (one
-- correctly-rounded cast, identical in both engines); a DECIMAL
-- output column is the round-4 driver-red canonicalization class
SELECT 1 AS iter, wb::DOUBLE AS w_bias, wp::DOUBLE AS w_awl,
       ws_::DOUBLE AS w_stop, wl::DOUBLE AS w_loglen, train_loss FROM w1
UNION ALL SELECT 2, wb::DOUBLE, wp::DOUBLE, ws_::DOUBLE, wl::DOUBLE,
       train_loss FROM w2
UNION ALL SELECT 3, wb::DOUBLE, wp::DOUBLE, ws_::DOUBLE, wl::DOUBLE,
       train_loss FROM w3
ORDER BY iter
"""


def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiler (ANALYZE/describe-extended analog) in long form:
    one wide single-scan aggregate unpivoted to (column, metric) rows,
    plus a per-categorical-column top-value pass with a DETERMINISTIC
    tie-break (count desc, value asc — never engine-arbitrary ``mode``).
    Numeric results ride in ``value_num`` and categorical exemplars in
    ``value_str``, so no float→string formatting has to match across
    engines.

    Scale shape: the wide aggregate is one scan with partial
    aggregation (countDistinct on bounded-cardinality columns; swap in
    approx_count_distinct for unbounded ones); each top-value pass
    groups on a low-cardinality column. Nothing touches the driver."""
    docs = load_table(spark, sf_dir, "documents")
    wide = docs.agg(
        F.count("*").alias("row_count"),
        F.count_distinct("lang").alias("lang_nd"),
        F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0)).alias("lang_nn"),
        F.count_distinct("source").alias("source_nd"),
        F.sum(F.when(F.col("source").isNull(), 1).otherwise(0)).alias(
            "source_nn"
        ),
        F.min("n_chars").cast("double").alias("nc_min"),
        F.max("n_chars").cast("double").alias("nc_max"),
        # round(avg(int), 2) can land EXACTLY half-way on the 2-dp
        # grid (sum ≡ n/2 mod n patterns) — the ewma red-row class;
        # both averages use the exact integer half-up ratio instead
        F.sum("n_chars").alias("nc_sum"),
        F.sum(
            F.size(F.filter(F.split("text", " "), lambda w: w != ""))
        ).alias("words_sum"),
    ).select(
        "*",
        exact_ratio(F.col("nc_sum"), F.col("row_count"), dp=2).alias(
            "nc_avg"
        ),
        exact_ratio(F.col("words_sum"), F.col("row_count"), dp=2).alias(
            "text_avg_words"
        ),
    )
    long = wide.selectExpr(
        """stack(9,
          '_table', 'row_count', row_count * 1.0D,
          'lang', 'n_distinct', lang_nd * 1.0D,
          'lang', 'null_count', lang_nn * 1.0D,
          'source', 'n_distinct', source_nd * 1.0D,
          'source', 'null_count', source_nn * 1.0D,
          'n_chars', 'min', nc_min,
          'n_chars', 'max', nc_max,
          'n_chars', 'avg', nc_avg,
          'text', 'avg_words', text_avg_words
        ) AS (column, metric, value_num)"""
    ).withColumn("value_str", F.lit(None).cast("string"))

    def top_of(col):
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("n"), F.col(col))
        return (
            docs.groupBy(col)
            .agg(F.count("*").alias("n"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.lit(col).alias("column"),
                F.lit("top_value").alias("metric"),
                F.col("n").cast("double").alias("value_num"),
                F.col(col).cast("string").alias("value_str"),
            )
        )

    return (
        long.unionByName(top_of("lang"))
        .unionByName(top_of("source"))
        .orderBy("column", "metric")
    )


CORPUS_PROFILE_ORACLE = f"""
WITH wide AS (
  SELECT count(*)::DOUBLE AS row_count,
         count(DISTINCT lang)::DOUBLE AS lang_nd,
         sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::DOUBLE AS lang_nn,
         count(DISTINCT source)::DOUBLE AS source_nd,
         sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::DOUBLE AS source_nn,
         min(n_chars)::DOUBLE AS nc_min,
         max(n_chars)::DOUBLE AS nc_max,
         -- exact 2-dp half-up integer ratio, not round(avg(...), 2):
         -- a mean of ints can land exactly half-way on the 2-dp grid
         {sql_exact_ratio('sum(n_chars)::BIGINT', 'count(*)', dp=2)}
           AS nc_avg,
         {sql_exact_ratio(
             "sum(len(list_filter(string_split(text, ' '),"
             " w -> w <> '')))::BIGINT",
             'count(*)', dp=2)}
           AS text_avg_words
  FROM documents
), long AS (
  SELECT '_table' AS "column", 'row_count' AS metric, row_count AS value_num FROM wide
  UNION ALL SELECT 'lang', 'n_distinct', lang_nd FROM wide
  UNION ALL SELECT 'lang', 'null_count', lang_nn FROM wide
  UNION ALL SELECT 'source', 'n_distinct', source_nd FROM wide
  UNION ALL SELECT 'source', 'null_count', source_nn FROM wide
  UNION ALL SELECT 'n_chars', 'min', nc_min FROM wide
  UNION ALL SELECT 'n_chars', 'max', nc_max FROM wide
  UNION ALL SELECT 'n_chars', 'avg', nc_avg FROM wide
  UNION ALL SELECT 'text', 'avg_words', text_avg_words FROM wide
), tops AS (
  SELECT col AS "column", 'top_value' AS metric, n::DOUBLE AS value_num,
         val AS value_str
  FROM (
    SELECT 'lang' AS col, lang AS val, count(*) AS n,
           row_number() OVER (ORDER BY count(*) DESC, lang) AS rn
    FROM documents GROUP BY lang
  ) WHERE rn = 1
  UNION ALL
  SELECT 'source', 'top_value', n::DOUBLE, val
  FROM (
    SELECT source AS val, count(*) AS n,
           row_number() OVER (ORDER BY count(*) DESC, source) AS rn
    FROM documents GROUP BY source
  ) WHERE rn = 1
)
SELECT "column", metric, value_num, NULL::VARCHAR AS value_str FROM long
UNION ALL
SELECT * FROM tops
ORDER BY "column", metric
"""


def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health diagnostic: per-language Zipf fit — closed-form
    OLS slope of ln(freq) on ln(rank) over the word-frequency table
    (natural text sits near −1; a slope far off flags synthetic or
    degenerate corpora before any training run). All regression inputs
    are 9-dp-rounded BEFORE the DECIMAL sums, so the normal-equation
    arithmetic is order-independent and the oracle replays it exactly
    (the same determinism pattern as the classifier/perplexity
    trajectories). One explode + one vocab-sized window per language —
    the regression itself runs over Σ|vocab| rows. A single-word
    vocabulary makes the OLS denominator zero: both engines emit NULL
    slope for that language (n_vocab = 1 is the explicit signal)."""
    from pyspark.sql import Window

    from interop_datalake_spark.llm.search import tokenize_words

    docs = load_table(spark, sf_dir, "documents")
    # ONE tokenizer definition (llm/search.py) across BM25, TF-IDF,
    # and this diagnostic — they cannot drift
    freq = (
        tokenize_words(docs, "text", "lang")
        .withColumnRenamed("term", "word")
        .groupBy("lang", "word")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "word")
    xy = freq.select(
        "lang",
        F.round(F.log(F.row_number().over(w).cast("double")), 9).alias("x"),
        F.round(F.log(F.col("n").cast("double")), 9).alias("y"),
    ).select(
        "lang",
        F.col("x").cast("decimal(28,9)").alias("x"),
        F.col("y").cast("decimal(28,9)").alias("y"),
        F.round(F.col("x") * F.col("y"), 9)
        .cast("decimal(28,9)")
        .alias("xy"),
        F.round(F.col("x") * F.col("x"), 9)
        .cast("decimal(28,9)")
        .alias("xx"),
    )
    sums = xy.groupBy("lang").agg(
        F.count("*").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"),
        F.sum("xx").alias("sxx"),
    )
    m = F.col("m").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    slope = (m * F.col("sxy").cast("double") - sx * sy) / (
        m * F.col("sxx").cast("double") - sx * sx
    )
    intercept = (sy - slope * sx) / m
    return (
        sums.select(
            "lang",
            F.col("m").alias("n_vocab"),
            F.round(slope, 6).alias("zipf_slope"),
            F.round(intercept, 6).alias("intercept"),
        )
        .orderBy("lang")
    )


ZIPF_ORACLE = """
WITH freq AS (
  SELECT lang, word, count(*) AS n
  FROM (
    SELECT lang,
           unnest(list_filter(string_split(lower(text), ' '),
                              w -> w <> '')) AS word
    FROM documents
  )
  GROUP BY lang, word
), xy AS (
  SELECT lang,
         round(ln(row_number() OVER (
           PARTITION BY lang ORDER BY n DESC, word)::DOUBLE), 9)
           ::DECIMAL(28,9) AS x,
         round(ln(n::DOUBLE), 9)::DECIMAL(28,9) AS y
  FROM freq
), terms AS (
  SELECT lang, x, y,
         round(x::DOUBLE * y::DOUBLE, 9)::DECIMAL(28,9) AS xy,
         round(x::DOUBLE * x::DOUBLE, 9)::DECIMAL(28,9) AS xx
  FROM xy
), sums AS (
  SELECT lang, count(*) AS m, sum(x) AS sx, sum(y) AS sy,
         sum(xy) AS sxy, sum(xx) AS sxx
  FROM terms GROUP BY lang
)
SELECT lang, m AS n_vocab,
       round((m * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (m * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6)
         AS zipf_slope,
       round((sy::DOUBLE
              - ((m * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (m * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
                * sx::DOUBLE) / m, 6) AS intercept
FROM sums ORDER BY lang
"""


QUERIES = {
    "text_quality": text_quality,
    "corpus_profile": corpus_profile,
    "corpus_zipf_fit": corpus_zipf_fit,
    "text_winnowing_fingerprints": text_winnowing_fingerprints,
    "text_lang_ngram": text_lang_ngram,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "corpus_decontaminate": corpus_decontaminate,
    "doc_chunk_windows": doc_chunk_windows,
    "corpus_pack_sequences": corpus_pack_sequences,
    "corpus_pack_sequences_sharded": corpus_pack_sequences_sharded,
    "corpus_filter_gopher": corpus_filter_gopher,
    "corpus_redact_pii": corpus_redact_pii,
    "text_repetition": text_repetition,
    "corpus_vocab": corpus_vocab,
    "corpus_domain_mix": corpus_domain_mix,
    "text_perplexity": text_perplexity,
    "text_bpe_train": text_bpe_train,
    "text_bpe_tokenize": text_bpe_tokenize,
    "text_quality_classifier": text_quality_classifier,
}

ORACLES = {
    "corpus_profile": CORPUS_PROFILE_ORACLE,
    "corpus_zipf_fit": ZIPF_ORACLE,
    "text_quality_classifier": TEXT_CLASSIFIER_ORACLE,
    "text_bpe_tokenize": TEXT_BPE_TOKENIZE_ORACLE,
    "corpus_domain_mix": DOMAIN_MIX_ORACLE,
    "text_perplexity": TEXT_PERPLEXITY_ORACLE,
    "text_bpe_train": TEXT_BPE_ORACLE,
    "text_quality": TEXT_QUALITY_ORACLE,
    "text_winnowing_fingerprints": TEXT_WINNOW_ORACLE,
    "text_lang_ngram": TEXT_LANG_NGRAM_ORACLE,
    "text_lang_id": TEXT_LANG_ORACLE,
    "text_fingerprint": TEXT_FP_ORACLE,
    "corpus_decontaminate": CORPUS_DECONTAMINATE_ORACLE,
    "doc_chunk_windows": DOC_CHUNK_ORACLE,
    "corpus_pack_sequences": CORPUS_PACK_ORACLE,
    "corpus_pack_sequences_sharded": CORPUS_PACK_SHARDED_ORACLE,
    "corpus_filter_gopher": CORPUS_FILTER_GOPHER_ORACLE,
    "corpus_redact_pii": CORPUS_REDACT_PII_ORACLE,
    "text_repetition": TEXT_REPETITION_ORACLE,
    "corpus_vocab": CORPUS_VOCAB_ORACLE,
}
