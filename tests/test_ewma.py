"""EWMA fold semantics (catalog/events_analytics.py:events_ewma):
hand-computed recursion on a planted series, seed rule, and per-user
independence. Engine parity is the oracle row."""

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.catalog.events_analytics import events_ewma
from interop_datalake_spark.sources.tables import load_table


def test_recursion_matches_hand_computation(spark, sf_dir):
    out = {
        (r.user_id, str(r.day)): (r.x, r.ewma)
        for r in events_ewma(spark, sf_dir).collect()
    }
    # replay the recursion in plain Python per user and compare
    by_user = {}
    for (uid, day), (x, ew) in sorted(out.items()):
        by_user.setdefault(uid, []).append((day, x, ew))
    from decimal import ROUND_HALF_UP, Decimal

    def round6(v: float) -> float:
        # Spark's round() is HALF_UP on the decimal rendering; Python's
        # built-in round is banker's on the binary double — not the same
        return float(
            Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    for uid, series in by_user.items():
        acc = None
        for day, x, ew in series:
            acc = x if acc is None else round6(0.3 * x + 0.7 * acc)
            assert ew == pytest.approx(acc, abs=1e-9), (uid, day)


def test_first_observation_seeds(spark, sf_dir):
    first = (
        events_ewma(spark, sf_dir)
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy("day")
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    assert first and all(r.ewma == r.x for r in first)
