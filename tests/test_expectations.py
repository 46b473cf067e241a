"""Write-audit-publish edge rules (lake/expectations.py). The catalog
query lake_expectations pins the end-to-end scenario; these cover the
routing/atomicity corners."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.expectations import (
    Expectation,
    ExpectationFailed,
    append_with_expectations,
)
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession


@pytest.fixture()
def tables(spark):
    root = tempfile.mkdtemp(prefix="exp_test_")
    s = DatalakeSession(lake_root=root, spark=spark)
    yield TxnTable(s, "main"), TxnTable(s, "quar"), TxnTable(s, "audit")
    shutil.rmtree(root, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id BIGINT, v STRING")


def test_warn_publishes_everything(spark, tables):
    main, quar, audit = tables
    rep = append_with_expectations(
        main,
        _df(spark, [(1, "a"), (2, None)]),
        [Expectation("v_set", F.col("v").isNotNull(), "warn")],
        quar,
        audit,
    )
    assert rep["rows_published"] == 2 and rep["rows_quarantined"] == 0
    assert rep["violations"] == {"v_set": 1}
    assert main.read().count() == 2
    assert quar.current_version() == 0  # nothing quarantined, no commit


def test_drop_routes_to_quarantine_with_tags(spark, tables):
    main, quar, audit = tables
    rep = append_with_expectations(
        main,
        _df(spark, [(1, "a"), (2, None), (-3, None)]),
        [
            Expectation("v_set", F.col("v").isNotNull(), "drop"),
            Expectation("id_pos", F.col("id") > 0, "drop"),
        ],
        quar,
        audit,
    )
    assert rep["rows_published"] == 1 and rep["rows_quarantined"] == 2
    got = {r.id: sorted(r["_violations"]) for r in quar.read().collect()}
    assert got == {2: ["v_set"], -3: ["id_pos", "v_set"]}
    assert [r.id for r in main.read().collect()] == [1]


def test_null_predicate_counts_as_violation(spark, tables):
    main, quar, audit = tables
    # v > 'a' is NULL for NULL v: must be treated as NOT ok
    rep = append_with_expectations(
        main,
        _df(spark, [(1, "b"), (2, None)]),
        [Expectation("v_gt", F.col("v") > "a", "drop")],
        quar,
        audit,
    )
    assert rep["rows_quarantined"] == 1


def test_fail_aborts_before_any_write(spark, tables):
    main, quar, audit = tables
    append_with_expectations(
        main, _df(spark, [(1, "a")]), [], quar, audit
    )
    versions = (
        main.current_version(),
        quar.current_version(),
        audit.current_version(),
    )
    with pytest.raises(ExpectationFailed, match="id_pos"):
        append_with_expectations(
            main,
            _df(spark, [(2, "b"), (-9, "c")]),
            [
                # drop rule would also fire — but fail must win BEFORE
                # anything (including quarantine) is written
                Expectation("v_not_c", F.col("v") != "c", "drop"),
                Expectation("id_pos", F.col("id") > 0, "fail"),
            ],
            quar,
            audit,
        )
    assert versions == (
        main.current_version(),
        quar.current_version(),
        audit.current_version(),
    )


def test_audit_table_accumulates_per_version(spark, tables):
    main, quar, audit = tables
    e = [Expectation("id_pos", F.col("id") > 0, "drop")]
    append_with_expectations(main, _df(spark, [(1, "a")]), e, quar, audit)
    append_with_expectations(main, _df(spark, [(-2, "b")]), e, quar, audit)
    rows = sorted(
        (r.main_version, r.violations, r.rows_published)
        for r in audit.read().collect()
    )
    assert rows == [(1, 0, 1), (2, 1, 0)]
