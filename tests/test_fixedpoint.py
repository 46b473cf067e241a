"""functions/fixedpoint.py: the Spark helpers, the documented DuckDB
idiom, and a plain-Python reference must agree exactly — including
negatives, ties, and values far past 2^53 where any double-based
floor would corrupt."""

import duckdb
import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.functions.fixedpoint import (
    div_half_up,
    exact_ratio,
    sql_div_half_up,
    sql_exact_ratio,
)


def _py_div_half_up(n: int, d: int) -> int:
    assert d > 0
    return (2 * n + d) // (2 * d) if n >= 0 else -((-2 * n + d) // (2 * d))


CASES = [
    (7, 2),  # tie: 3.5 -> 4
    (-7, 2),  # tie away from zero: -3.5 -> -4
    (5, 2),
    (-5, 2),
    (1, 3),
    (-1, 3),
    (0, 7),
    (9999995, 10),
    (-9999995, 10),
    (2**60 + 12345, 7),  # far past double precision
    (-(2**60) - 12345, 7),
    (3 * 131_699_076_500 + 7 * 131_699_076_500, 10),  # ewma-shaped
]


def test_python_reference_half_up():
    assert _py_div_half_up(7, 2) == 4
    assert _py_div_half_up(-7, 2) == -4
    assert _py_div_half_up(6, 4) == 2  # 1.5 -> 2
    assert _py_div_half_up(-6, 4) == -2


def test_spark_matches_python(spark):
    df = spark.createDataFrame(CASES, "n LONG, d LONG")
    got = df.select("n", "d", div_half_up(F.col("n"), F.col("d")).alias("q"))
    for r in got.collect():
        assert r.q == _py_div_half_up(r.n, r.d), (r.n, r.d)


def test_duckdb_idiom_matches_python():
    con = duckdb.connect()
    for n, d in CASES:
        got = con.execute(
            f"SELECT {sql_div_half_up(f'{n}::BIGINT', f'{d}::BIGINT')}"
        ).fetchone()[0]
        assert got == _py_div_half_up(n, d), (n, d)


def test_exact_ratio_cross_engine(spark):
    pairs = [(1, 3), (2, 3), (355, 113), (0, 5), (10, 4), (999999, 1000000)]
    df = spark.createDataFrame(pairs, "n LONG, d LONG")
    s_vals = [
        r.r
        for r in df.select(
            exact_ratio(F.col("n"), F.col("d")).alias("r")
        ).collect()
    ]
    con = duckdb.connect()
    d_vals = [
        con.execute(
            f"SELECT {sql_exact_ratio(f'{n}::BIGINT', f'{d}::BIGINT')}"
        ).fetchone()[0]
        for n, d in pairs
    ]
    # bit-exact, not approx: this is the whole point of the module
    assert [repr(v) for v in s_vals] == [repr(v) for v in d_vals]
    for (n, d), v in zip(pairs, s_vals):
        assert v == pytest.approx(n / d, abs=5.1e-7)
