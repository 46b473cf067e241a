"""Entity-resolution semantics (operators/linkage.py) beyond the
oracle row: blocking recall trade-off, normalization, degenerate
names, and threshold monotonicity on the planted fixture."""

from interop_datalake_spark.catalog.advanced import _ER_FIXTURE
from interop_datalake_spark.operators.linkage import resolve_entities


def _run(spark, threshold):
    df = spark.createDataFrame(
        _ER_FIXTURE, "rec_id INT, name STRING, region STRING"
    )
    return {
        (r.id_a, r.id_b): r.jaccard
        for r in resolve_entities(
            df, "rec_id", "name", ["region"], threshold=threshold
        ).collect()
    }


def test_planted_matches_and_blocking_miss(spark):
    got = _run(spark, 0.6)
    assert set(got) == {(101, 201), (102, 202), (103, 203)}
    assert got[(102, 202)] == 1.0  # case/space normalize to identical
    # 104 vs 204: identical names, different region → blocked apart
    assert (104, 204) not in got


def test_lower_threshold_is_superset(spark):
    strict = _run(spark, 0.6)
    loose = _run(spark, 0.2)
    assert set(strict) <= set(loose)
    # the loose pass may admit same-block coincidences (e.g. Jane/James)
    # but every admitted score must still be consistent
    for k in strict:
        assert loose[k] == strict[k]


def test_degenerate_name_never_joins(spark):
    got = _run(spark, 0.0)
    assert all(205 not in pair for pair in got)
