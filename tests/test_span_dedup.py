"""Span-level dedup (llm/dedup.py:span_positions /
duplicate_span_coverage): planted shared paragraphs produce exactly
the expected islands, full copies cover fully, clean docs report zero.
Oracle parity for the catalog query runs in test_oracle_parity."""

from pyspark.sql import functions as F

from interop_datalake_spark.llm.dedup import (
    duplicate_span_coverage,
    span_positions,
)


def _w(prefix, n, start=1):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


def _frame(spark):
    # A: a1..a20. B: a5..a16 (a 12-word paragraph shared with A) + 8
    # unique words. C: all unique. D: identical copy of A.
    rows = [
        (1, _w("a", 20)),
        (2, _w("a", 12, start=5) + " " + _w("b", 8)),
        (3, _w("c", 20)),
        (4, _w("a", 20)),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_planted_shared_paragraph_islands(spark):
    out = {
        r["doc_id"]: (
            r["n_words"], r["n_dup_grams"], r["dup_tokens"], r["dup_fraction"]
        )
        for r in duplicate_span_coverage(
            _frame(spark), "text", "doc_id", k=8
        ).collect()
    }
    # A vs D are identical: every one of the 13 grams duplicated, one
    # island covering all 20 words
    assert out[1] == (20, 13, 20, 1.0)
    assert out[4] == (20, 13, 20, 1.0)
    # B shares a5..a16 with A/D: grams at pos 1..5 merge into one
    # island [1, 12] → 12 of 20 words covered
    assert out[2] == (20, 5, 12, 0.6)
    # C is clean
    assert out[3] == (20, 0, 0, 0.0)


def test_span_positions_are_positional_and_unique_per_doc(spark):
    grams = span_positions(_frame(spark), "text", "doc_id", k=8)
    rows = grams.collect()
    # n - k + 1 grams per 20-word doc
    assert len(rows) == 4 * 13
    # (doc, pos) unique; positions 1-based and contiguous
    keys = {(r["doc_id"], r["pos"]) for r in rows}
    assert len(keys) == len(rows)
    assert {r["pos"] for r in rows} == set(range(1, 14))
    # identical docs A and D agree on every positional gram hash
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["pos"]] = r["gram_hash"]
    assert by_doc[1] == by_doc[4]
    # 60-bit hash: values exceed the 32-bit range somewhere in the set
    # (collision widening actually landed — ADVICE r3)
    assert any(abs(r["gram_hash"]) > (1 << 32) for r in rows)


def test_short_docs_produce_no_grams(spark):
    df = spark.createDataFrame(
        [(1, "only three words"), (2, _w("x", 8))], "doc_id LONG, text STRING"
    )
    out = {
        r["doc_id"]: (r["n_dup_grams"], r["dup_tokens"], r["dup_fraction"])
        for r in duplicate_span_coverage(df, "text", "doc_id", k=8).collect()
    }
    assert out[1] == (0, 0, 0.0)  # < k words: no grams, still a row
    assert out[2] == (0, 0, 0.0)  # exactly k words, but nothing shared
