"""Audit every oracle's DuckDB result-column types for hash-fragile
classes.

The driver hashes EXACT values from both engines. DuckDB's
``sum(BIGINT)`` returns HUGEINT (int128) and aggregates over INT
return BIGINT-vs-HUGEINT depending on input width; DECIMAL and
FLOAT(real) columns likewise survive into the driver's
canonicalization layer even when Python's ``fetchall()`` collapses
them to int/float. Any oracle column whose DuckDB type is not in the
SAFE set below is a cross-engine hash risk and must be cast
explicitly (``::BIGINT`` / ``::DOUBLE``) — with the Spark twin
producing the matching type.

Usage: python tools/audit_oracle_types.py [sf_dir]
Prints one line per flagged (query, column, type); exits 0 always
(reporting tool — the pytest twin enforces).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from interop_datalake_spark import catalog  # noqa: E402
from tests.oracle import duckdb_conn  # noqa: E402

SAFE = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
}


def flagged_columns(conn, sql: str):
    res = conn.execute(f"DESCRIBE {sql}")
    out = []
    for name, typ, *_ in res.fetchall():
        t = typ.upper()
        if t not in SAFE and not t.startswith("TIMESTAMP"):
            out.append((name, typ))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    conn = duckdb_conn(sf_dir)
    oracles = catalog.all_oracles()
    n_bad = 0
    for name in sorted(oracles):
        try:
            bad = flagged_columns(conn, oracles[name])
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: DESCRIBE failed: {e}")
            n_bad += 1
            continue
        for col, typ in bad:
            print(f"{name}: column '{col}' has fragile type {typ}")
            n_bad += 1
    print(f"-- audited {len(oracles)} oracles, {n_bad} fragile columns")


if __name__ == "__main__":
    main()
