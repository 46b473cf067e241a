"""Skew handling in LSH dedup (llm/dedup.py:drop_hot_shingles): a
boilerplate footer shared by every document collapses min-hash bands
and explodes the candidate join; the hot-shingle filter restores it.
Oracle parity for dedup_minhash_lsh_skewsafe runs in test_oracle_parity."""

from pyspark.sql import functions as F

from interop_datalake_spark.catalog.llm_ops import _FOOTER
from interop_datalake_spark.llm.dedup import (
    drop_hot_shingles,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_signatures,
    shingles,
)
from interop_datalake_spark.sources.tables import load_table


def _footered(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(" ", F.col("text"), F.lit(_FOOTER)).alias("text"),
    )


def _candidates(docs, max_freq=None):
    sh = shingles(docs, "text", "doc_id", 5, distinct=False)
    if max_freq is not None:
        sh = drop_hot_shingles(sh, "doc_id", max_freq)
    bands = lsh_bands(minhash_signatures(sh, "doc_id"), "doc_id")
    return lsh_candidate_pairs(bands, "doc_id").count()


def test_boilerplate_explodes_candidates_and_filter_restores(spark, sf_dir):
    docs = _footered(spark, sf_dir)
    unfiltered = _candidates(docs)
    filtered = _candidates(docs, max_freq=50)
    clean = _candidates(load_table(spark, sf_dir, "documents"))
    print(f"candidates: boilerplate={unfiltered} filtered={filtered} clean={clean}")
    # the shared footer hot-spots the bands: orders of magnitude more
    # candidate pairs than the clean corpus (measured 25 -> 12,347)...
    assert unfiltered > 100 * clean
    # ...and the hot-shingle filter brings it back to the same order
    assert filtered < 2 * clean


def test_skewsafe_pairs_match_filtered_space_ground_truth(spark, sf_dir):
    """With the footer filtered out before signing, the 64-hash LSH
    pipeline at threshold 0.6 must have COMPLETE recall against the
    filtered-space exact ground truth (brute-force Jaccard over the
    same filtered shingles) — and that ground truth equals the clean
    corpus's pairs minus exactly one: (26,455), two very short docs
    whose k-1 boundary shingles dilute J 0.875 → 0.438. The dilution
    is a property of the footered corpus, not an operator defect; the
    operator is exact w.r.t. its own input space."""
    from interop_datalake_spark.llm.dedup import jaccard_pairs

    docs = _footered(spark, sf_dir)
    sh_filtered = drop_hot_shingles(
        shingles(docs, "text", "doc_id", 5), "doc_id", 50
    )
    ground_truth = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(sh_filtered, "doc_id", 0.6).collect()
    }
    skewsafe = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup(
            docs, "text", "doc_id", num_hashes=64, rows_per_band=4,
            threshold=0.6, max_shingle_freq=50,
        ).collect()
    }
    assert skewsafe == ground_truth and len(ground_truth) > 0

    clean_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup(
            load_table(spark, sf_dir, "documents"), "text", "doc_id"
        ).collect()
    }
    assert clean_pairs - ground_truth == {(26, 455)}  # the short-doc pair
    assert ground_truth <= clean_pairs  # no background pair gained


def test_short_boilerplate_does_not_skew_minhash(spark, sf_dir):
    """The counter-story that justifies the 60-word footer above: an
    8-word footer on ~56-word docs barely moves the candidate count —
    minhash samples the shingle set uniformly, so short shared text
    cannot dominate signatures. Skew mitigation is for SHARED-FRACTION
    pathology, not any shared text."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            " ", F.col("text"), F.lit("zqa zqb zqc zqd zqe zqf zqg zqh")
        ).alias("text"),
    )
    clean = _candidates(load_table(spark, sf_dir, "documents"))
    short = _candidates(docs)
    assert short < 3 * clean
