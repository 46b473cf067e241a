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
    # the fold runs in exact BIGINT micro-units with HALF_UP ties
    # (functions/fixedpoint.py) — replay the same integer recursion
    def div10_half_up(n: int) -> int:
        return (2 * n + 10) // 20 if n >= 0 else -((-2 * n + 10) // 20)

    for uid, series in by_user.items():
        acc = None  # micro-units
        for day, x, ew in series:
            x_micro = round(x * 1_000_000)
            acc = (
                x_micro
                if acc is None
                else div10_half_up(3 * x_micro + 7 * acc)
            )
            assert ew == acc / 1_000_000.0, (uid, day)


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
