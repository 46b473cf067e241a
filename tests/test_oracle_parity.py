"""Driver-gate emulation: every catalog query with an oracle must match
DuckDB on sf0.01 (row count + columns + order-insensitive values)."""

import pytest

from interop_datalake_spark import catalog
from tests.oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def conn(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


_QUERIES = catalog.all_queries()
_ORACLES = catalog.all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES.keys()))
def test_oracle_parity(name, spark, sf_dir, conn):
    df = _QUERIES[name](spark, sf_dir)
    errors = compare(df, conn, _ORACLES[name])
    assert not errors, f"{name}: " + "; ".join(errors[:6])


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(name, spark, sf_dir):
    """Queries without an oracle still must run and return a stable schema."""
    df = _QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0


def test_witness_priority_ordering():
    """The driver records only the first 50 queries() entries: they
    must be exactly WITNESS_PRIORITY (one representative per distinct
    operator class), every one of them oracle-backed so all 50 recorded
    rows are hash-checked, and the catalog must contain them all."""
    names = list(_QUERIES)
    assert len(catalog.WITNESS_PRIORITY) == 50
    assert names[:50] == catalog.WITNESS_PRIORITY
    unbacked = [n for n in catalog.WITNESS_PRIORITY if n not in _ORACLES]
    assert not unbacked, f"priority queries without oracles: {unbacked}"


def test_catalog_contract():
    """Structural invariants the driver relies on: every oracle has a
    query, names are non-empty, and callables accept (spark, sf_dir)."""
    import inspect

    assert set(_ORACLES) <= set(_QUERIES)
    for name, fn in _QUERIES.items():
        assert name and callable(fn)
        assert len(inspect.signature(fn).parameters) == 2, name
    for name, sql in _ORACLES.items():
        assert "SELECT" in sql.upper(), name
