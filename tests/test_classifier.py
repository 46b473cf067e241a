"""Semantics tests for the in-frame logistic-regression classifier
(llm/classifier.py). Engine parity is test_oracle_parity's
text_quality_classifier row; these pin the LEARNING behavior on a
separable toy set."""

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.llm.classifier import (
    doc_features,
    logreg_score,
    logreg_train,
)


@pytest.fixture(scope="module")
def toy(spark):
    # "English" docs are saturated with the en stopword list; the
    # negatives contain none — x_stop alone separates them.
    rows = [
        (0, "the of and to in is on for with the of and", True),
        (1, "a the of and in on is the for with a and", True),
        (2, "zork quux blarg frobnitz zork quux blarg frob", False),
        (3, "wibble wobble frobnitz quux blarg wibble zork", False),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, en BOOLEAN")


def test_loss_starts_at_ln2_and_decreases(toy):
    traj = logreg_train(
        doc_features(toy, F.col("en")), iters=3, lr=1.0
    ).orderBy("iter").collect()
    assert traj[0].train_loss == pytest.approx(0.693147, abs=1e-6)
    losses = [r.train_loss for r in traj]
    assert losses == sorted(losses, reverse=True)
    assert losses[2] < losses[0]


def test_trained_model_separates(toy):
    feats = doc_features(toy, F.col("en"))
    traj = logreg_train(feats, iters=10, lr=2.0).orderBy("iter")
    last = traj.filter("iter = 10").select(
        "w_bias", "w_awl", "w_stop", "w_loglen"
    )
    scored = {r.doc_id: r.p for r in logreg_score(feats, last).collect()}
    assert min(scored[0], scored[1]) > max(scored[2], scored[3])


def test_score_is_pure_map_no_shuffle(toy):
    """Scoring must stay a broadcast map — no Exchange in the plan."""
    feats = doc_features(toy, F.col("en"))
    last = logreg_train(feats, iters=1).select(
        "w_bias", "w_awl", "w_stop", "w_loglen"
    )
    plan = logreg_score(feats, last)._jdf.queryExecution().executedPlan().toString()
    # the weight side broadcasts; the feature side must not shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
