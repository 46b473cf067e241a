"""Planted-data semantics tests for DSIR importance weighting
(llm/dsir.py). Engine parity is covered by test_oracle_parity's
corpus_importance_sample row; these pin the METHOD: target-like
documents must outscore target-unlike ones, weights must be
translation-consistent, and top-k selection deterministic."""

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.llm.dsir import importance_weights, select_top_k


@pytest.fixture(scope="module")
def planted(spark):
    # target docs share a vocabulary ("alpha beta gamma"); the distractor
    # uses disjoint tokens. Doc 10 is unlabeled but written in the target
    # vocabulary; doc 11 is unlabeled distractor-speak.
    rows = [
        (0, "alpha beta gamma alpha beta", True),
        (1, "beta gamma alpha gamma", True),
        (2, "zork quux blarg zork quux blarg", False),
        (10, "alpha beta gamma beta", False),
        (11, "quux blarg zork quux", False),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, tgt BOOLEAN")


def test_target_vocab_outscores_distractor(planted):
    w = {
        r.doc_id: r.log_weight
        for r in importance_weights(planted, F.col("tgt")).collect()
    }
    assert set(w) == {0, 1, 2, 10, 11}
    # ordering is the method's contract (absolute signs are dominated
    # by the add-1 smoothing mass at toy scale): every doc written in
    # the target vocabulary — labeled or not — must outscore every
    # distractor-speak doc
    assert min(w[0], w[1], w[10]) > max(w[2], w[11])


def test_n_toks_counts_instances(planted):
    n = {
        r.doc_id: r.n_toks
        for r in importance_weights(planted, F.col("tgt")).collect()
    }
    assert n[0] == 5 and n[11] == 4  # instances, not distinct tokens


def test_select_top_k_deterministic_ties_by_id(spark):
    w = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 1.0)], "doc_id BIGINT, log_weight DOUBLE"
    )
    sel = {r.doc_id: r.selected for r in select_top_k(w, 2).collect()}
    assert sel == {1: True, 2: True, 3: False}
    sel1 = {r.doc_id: r.selected for r in select_top_k(w, 1).collect()}
    assert sel1 == {1: True, 2: False, 3: False}  # tie broken by id


def test_empty_doc_absent(spark):
    df = spark.createDataFrame(
        [(0, "alpha", True), (1, "   ", False)],
        "doc_id BIGINT, text STRING, tgt BOOLEAN",
    )
    ids = {r.doc_id for r in importance_weights(df, F.col("tgt")).collect()}
    assert ids == {0}  # whitespace-only doc carries no evidence
