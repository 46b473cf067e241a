"""Text-analysis column functions for training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

All JVM-side column algebra (split/regexp/aggregate) — these run inside
the scan's codegen stage, so a 100 TB quality-scoring pass is
scan-bound, not CPU-bound on Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword inventories for the n-gram/stopword
#: language heuristic (deterministic, oracle-replayable)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "es": ["el", "la", "de", "y", "en", "es", "un", "una", "por", "con"],
    "fr": ["le", "la", "de", "et", "en", "est", "un", "une", "pour", "avec"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "mit"],
}

#: BPE-ish tokenizer: runs of letters, runs of digits, or single
#: non-alphanumeric glyphs — a deterministic stand-in for a subword
#: tokenizer's pre-tokenization pass
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def words(text: Column | str) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(_col(text), r"\s+"), lambda w: w != "")


def token_count_ws(text: Column | str) -> Column:
    return F.size(words(text))


def token_count_bpe_ish(text: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_col(text), F.lit(BPE_ISH_RE), 0))


def punct_ratio(text: Column | str) -> Column:
    """Non-alphanumeric-non-space chars / total chars (NULL on empty)."""
    t = _col(text)
    return F.try_divide(
        F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")), F.length(t)
    )


def stopword_hits(text: Column | str, lang: str = "en") -> Column:
    sw = STOPWORDS[lang]
    return F.size(F.filter(words(F.lower(_col(text))), lambda w: w.isin(sw)))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    return F.try_divide(stopword_hits(text, lang), token_count_ws(text))


def avg_word_length(text: Column | str) -> Column:
    ws = words(text)
    return F.try_divide(
        F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)), F.size(ws)
    )


def punct_ratio_6dp(text: Column | str) -> Column:
    """Exact 6-dp :func:`punct_ratio` via integer half-up micro-units
    (functions/fixedpoint.py) — for EMITTED columns, where
    ``round(double, 6)`` of an integer ratio can land exactly
    half-way on the grid and flip between engines (ewma red class)."""
    from interop_datalake_spark.functions.fixedpoint import try_exact_ratio

    t = _col(text)
    return try_exact_ratio(
        F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")), F.length(t)
    )


def stopword_ratio_6dp(text: Column | str, lang: str = "en") -> Column:
    """Exact 6-dp :func:`stopword_ratio` (see :func:`punct_ratio_6dp`)."""
    from interop_datalake_spark.functions.fixedpoint import try_exact_ratio

    return try_exact_ratio(stopword_hits(text, lang), token_count_ws(text))


def avg_word_length_6dp(text: Column | str) -> Column:
    """Exact 6-dp :func:`avg_word_length` (see :func:`punct_ratio_6dp`)."""
    from interop_datalake_spark.functions.fixedpoint import try_exact_ratio

    ws = words(text)
    return try_exact_ratio(
        F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)),
        F.size(ws),
    )


def dup_word_frac_6dp(text: Column | str) -> Column:
    """Exact 6-dp :func:`dup_word_frac` as (total − distinct)/total
    (see :func:`punct_ratio_6dp`)."""
    from interop_datalake_spark.functions.fixedpoint import try_exact_ratio

    ws = words(text)
    return try_exact_ratio(
        F.size(ws) - F.size(F.array_distinct(ws)), F.size(ws)
    )


def alpha_word_frac_6dp(text: Column | str) -> Column:
    """Exact 6-dp :func:`alpha_word_frac` (see :func:`punct_ratio_6dp`)."""
    from interop_datalake_spark.functions.fixedpoint import try_exact_ratio

    ws = words(text)
    return try_exact_ratio(
        F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))), F.size(ws)
    )


def language_guess(text: Column | str) -> Column:
    """Stopword-vote language heuristic: the language with the most
    stopword hits wins; ties and zero hits → 'und' (undetermined).
    Deterministic tie-break: a language wins only with a strict
    majority over every other candidate."""
    hits = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    expr = F.lit("und")
    # build CASE from last to first so earlier langs win exact ties only
    # via the strict > comparison (no ordering dependence)
    for lang, h in hits.items():
        others = [o for o in hits.values() if o is not h]
        strictly_best = (h > 0)
        for o in others:
            strictly_best = strictly_best & (h > o)
        expr = F.when(strictly_best, F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column | str) -> Column:
    """[0,1] composite: length sweet-spot, low punctuation, healthy
    stopword density — the classic cheap pre-filter for LLM corpora."""
    t = _col(text)
    len_ok = F.when((F.length(t) >= 100) & (F.length(t) <= 20000), 1.0).otherwise(0.4)
    punct_ok = F.when(F.coalesce(punct_ratio(t), F.lit(0.0)) <= 0.2, 1.0).otherwise(0.5)
    sw_ok = F.when(F.coalesce(stopword_ratio(t), F.lit(0.0)) >= 0.02, 1.0).otherwise(0.6)
    return F.round(len_ok * 0.4 + punct_ok * 0.3 + sw_ok * 0.3, 4)


def dup_word_frac(text: Column | str) -> Column:
    """Fraction of word occurrences that repeat an earlier word:
    ``1 - distinct/total`` (NULL on empty). Gopher's strongest cheap
    repetition signal — pure array algebra, no shuffle."""
    ws = words(text)
    return F.lit(1.0) - F.try_divide(F.size(F.array_distinct(ws)), F.size(ws))


def distinct_stopword_count(text: Column | str, lang: str = "en") -> Column:
    """How many DISTINCT stopwords of ``lang`` appear — Gopher's
    "contains at least 2 of a tiny stopword list" gate uses distinct
    presence, not hit volume."""
    sw = STOPWORDS[lang]
    return F.size(
        F.array_distinct(
            F.filter(words(F.lower(_col(text))), lambda w: w.isin(sw))
        )
    )


def alpha_word_frac(text: Column | str) -> Column:
    """Fraction of words containing at least one A-Za-z character
    (NULL on empty) — Gopher drops docs where < 80% of words have an
    alphabetic character (tables, hex dumps, markup)."""
    ws = words(text)
    return F.try_divide(
        F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))), F.size(ws)
    )


#: PII patterns, ordered most-specific-first so replacements never
#: partially consume a longer match (SSN 3-2-4 before phone 3-3-4).
#: Conservative syntax shared by Java regex (Spark) and RE2 (DuckDB):
#: character classes, bounded repeats, \b anchors — no lookaround.
PII_PATTERNS = [
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
]


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts (before redaction) — the audit metric
    a scrubbing pass reports. Counted most-specific-first on the
    ORIGINAL text; kinds are mutually exclusive by pattern shape."""
    t = _col(text)
    return {
        kind: F.regexp_count(t, F.lit(pat)) for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its typed placeholder. A chained
    ``regexp_replace`` — JVM codegen, so scrubbing 100 TB is a
    scan-bound projection like every other signal here."""
    out = _col(text)
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def chunk_starts(text: Column | str, size: int, stride: int) -> Column:
    """1-based word offsets of context-window chunks: 1, 1+stride, …
    up to the last offset that still yields a full-or-tail window
    (``greatest(n_words - size + 1, 1)``). Pure column algebra —
    chunking a 100 TB corpus is a projection, no shuffle.

    DROP-TAIL SEMANTICS (deliberate): for documents LONGER than
    ``size``, offsets stop at the last FULL window, so up to
    ``stride - 1`` trailing words past it are not covered by any chunk
    (e.g. words 113-120 of a 120-word doc at size 64 / stride 48). A
    document shorter than ``size`` yields exactly one (short) chunk.
    This is the fixed-length-training convention — every emitted chunk
    from a long doc is a full window; emit-the-ragged-tail variants
    add one final start when ``(n_words - size) % stride != 0``."""
    w = F.split(_col(text), " ")
    last = F.greatest(F.size(w) - F.lit(size - 1), F.lit(1))
    return F.sequence(F.lit(1), last, F.lit(stride))


def chunk_words(
    df: DataFrame, text_col: str, id_col: str, size: int = 64, stride: int = 48
) -> DataFrame:
    """Overlapping word-window chunks for context-length packing:
    (id, chunk_idx, chunk_text, n_chunk_words). ``stride < size``
    gives ``size - stride`` words of overlap between neighbors —
    the standard sliding-window split for long-document training.
    posexplode keeps the chunk index without a window function.
    Inherits :func:`chunk_starts`'s drop-tail semantics: long docs
    emit full windows only; a ragged tail shorter than a stride is
    not re-emitted as a partial chunk."""
    w = F.split(F.col(text_col), " ")
    exploded = df.select(
        F.col(id_col),
        w.alias("_w"),
        F.posexplode(chunk_starts(F.col(text_col), size, stride)).alias(
            "chunk_idx", "_start"
        ),
    )
    chunk = F.slice(F.col("_w"), F.col("_start"), size)
    return exploded.select(
        F.col(id_col),
        "chunk_idx",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_chunk_words"),
    )


def normalize_text(text: Column | str) -> Column:
    """Whitespace-collapse + lowercase + trim — canonical form for
    exact-dup hashing."""
    return F.lower(F.trim(F.regexp_replace(_col(text), r"\s+", " ")))


def fingerprint(text: Column | str) -> Column:
    """128-bit content fingerprint (md5 hex of normalized text)."""
    return F.md5(normalize_text(text))


def fingerprint64(text: Column | str) -> Column:
    """64-bit-ish numeric fingerprint (first 8 md5 hex chars)."""
    return F.conv(F.substring(fingerprint(text), 1, 8), 16, 10).cast("bigint")
