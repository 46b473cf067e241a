"""CI twin of ``tools/audit_oracle_types.py`` (VERDICT round 5 item
6): every oracle's DuckDB result-column types must stay inside the
portable whitelist, so a future query cannot reintroduce
HUGEINT/DECIMAL/REAL outputs — the round-4 driver-red class — without
failing the suite. One DESCRIBE per oracle (no query execution), so
the whole sweep is seconds.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.audit_oracle_types import flagged_columns  # noqa: E402

from interop_datalake_spark import catalog  # noqa: E402
from tests.oracle import duckdb_conn  # noqa: E402


@pytest.fixture(scope="module")
def conn(sf_dir):
    # env-driven sf_dir from conftest (the audit is DESCRIBE-only, so
    # any scale factor works — follow the suite-wide override)
    return duckdb_conn(sf_dir)


def _oracle_items():
    return sorted(catalog.all_oracles().items())


@pytest.mark.parametrize(
    "name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()]
)
def test_oracle_emits_only_portable_types(conn, name, sql):
    bad = flagged_columns(conn, sql)
    assert not bad, (
        f"{name} emits hash-fragile DuckDB column types {bad}; cast to "
        "::BIGINT/::DOUBLE on both engines (see functions/fixedpoint.py)"
    )
