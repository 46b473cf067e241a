"""Local stand-in for the driver's DuckDB correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and
order-insensitive values (floats via isclose, everything else exact).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from interop_datalake_spark.sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return conn


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def compare(spark_df, conn, sql: str, float_tol: float = 1e-6) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errors: list[str] = []
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    res = conn.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        errors.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return errors
    if len(spark_rows) != len(duck_rows):
        errors.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    # project both to the same column order (sorted by name, like the driver)
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
    s_vals = sorted(
        [tuple(_norm(r[i]) for i in s_order) for r in spark_rows], key=_sort_key
    )
    d_vals = sorted(
        [tuple(_norm(r[i]) for i in d_order) for r in duck_rows], key=_sort_key
    )
    for i, (sr, dr) in enumerate(zip(s_vals, d_vals)):
        for sv, dv in zip(sr, dr):
            if isinstance(sv, float) and isinstance(dv, float):
                if not math.isclose(sv, dv, rel_tol=float_tol, abs_tol=float_tol):
                    errors.append(f"row {i}: {sr} != {dr}")
                    break
            elif sv != dv:
                errors.append(f"row {i}: {sr} != {dr}")
                break
        if len(errors) > 5:
            errors.append("... (truncated)")
            break
    return errors
