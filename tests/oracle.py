"""Local stand-in for the driver's DuckDB correctness gate — EXACT.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names,
result-column TYPES, and order-insensitive values bit-exactly.

Round 4 lesson (VERDICT r4; memory: spark-graft-conventions): the
driver hashes EXACT canonicalized values, while this gate used to
compare floats with ``isclose(1e-6)`` and collapse ``Decimal`` to
``float`` — so five witnessed queries shipped driver-red while local
CI called them green. Two structural causes, both now checked here:

* value drift — ``round(double, n)`` disagreeing between engines at
  representation boundaries. Floats are now compared BIT-exactly
  (``repr`` equality, which distinguishes -0.0 and every ULP).
* type drift — DuckDB ``sum(BIGINT)``/windowed sums return HUGEINT,
  and DECIMAL output columns survive into the driver's hashing layer
  even though ``fetchall()`` collapses them to int/float locally.
  The gate now DESCRIBEs the oracle and inspects the Spark schema,
  failing any query whose output types leave the portable whitelist
  (BIGINT/INT/DOUBLE/VARCHAR/BOOLEAN/DATE/TIMESTAMP + arrays
  thereof): emitting a fragile type is an error even when the values
  happen to match locally.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from interop_datalake_spark.sources.tables import TABLES

#: DuckDB result types that hash portably against Spark's output.
DUCK_SAFE_TYPES = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
}

#: Spark result dtypes (simpleString) that hash portably.
SPARK_SAFE_TYPES = {
    "bigint",
    "int",
    "smallint",
    "tinyint",
    "double",
    "string",
    "boolean",
    "date",
}


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return conn


def _duck_type_ok(t: str) -> bool:
    t = t.upper()
    if t.startswith("TIMESTAMP"):
        return True
    if t.endswith("[]"):  # list type
        return _duck_type_ok(t[:-2])
    return t in DUCK_SAFE_TYPES


def _spark_type_ok(t: str) -> bool:
    t = t.lower()
    if t.startswith("timestamp"):
        return True
    if t.startswith("array<") and t.endswith(">"):
        return _spark_type_ok(t[6:-1])
    return t in SPARK_SAFE_TYPES


def fragile_types(spark_df, conn, sql: str) -> list[str]:
    """Output-type audit: any non-whitelisted result column type on
    either side is a driver-hash risk (HUGEINT, DECIMAL, FLOAT, …)."""
    errors = []
    for f in spark_df.schema.fields:
        t = f.dataType.simpleString()
        if not _spark_type_ok(t):
            errors.append(f"spark column '{f.name}' has fragile type {t}")
    for name, typ, *_ in conn.execute(f"DESCRIBE {sql}").fetchall():
        if not _duck_type_ok(typ):
            errors.append(f"oracle column '{name}' has fragile type {typ}")
    return errors


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        # kept distinct from float on purpose: a Decimal that meets a
        # float across engines must FAIL (the driver's canonicalizer
        # treats them differently); Decimal-vs-Decimal compares by
        # exact value. The type whitelist flags these columns anyway.
        return v
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
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def _values_equal(sv, dv) -> bool:
    """Driver-exact equality: floats bit-for-bit (repr distinguishes
    every ULP and -0.0), everything else by ==, and cross-type-class
    pairs (int vs float, Decimal vs float) never equal."""
    if sv is None or dv is None:
        return sv is None and dv is None
    if isinstance(sv, float) or isinstance(dv, float):
        if not (isinstance(sv, float) and isinstance(dv, float)):
            return False
        return repr(sv) == repr(dv)
    if isinstance(sv, Decimal) or isinstance(dv, Decimal):
        if not (isinstance(sv, Decimal) and isinstance(dv, Decimal)):
            return False
        return sv == dv
    if isinstance(sv, bool) != isinstance(dv, bool):
        return False
    return sv == dv


def compare(spark_df, conn, sql: str, check_types: bool = True) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errors: list[str] = []
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    if check_types:
        errors.extend(fragile_types(spark_df, conn, sql))
        if errors:
            return errors
    res = conn.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        errors.append(
            f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        )
        return errors
    if len(spark_rows) != len(duck_rows):
        errors.append(
            f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
        )

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
            if not _values_equal(sv, dv):
                errors.append(f"row {i}: {sr} != {dr}")
                break
        if len(errors) > 5:
            errors.append("... (truncated)")
            break
    return errors
