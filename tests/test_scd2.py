"""SCD Type-2 semantics on TxnTable (lake/scd.py): planted dimension
batches with hand-verifiable history chains. The catalog query
lake_scd2 pins the end-to-end scenario; these cover the edge rules."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.scd import scd2_apply, scd2_snapshot_at
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession


@pytest.fixture()
def dim(spark):
    root = tempfile.mkdtemp(prefix="scd2_test_")
    yield TxnTable(DatalakeSession(lake_root=root, spark=spark), "dim")
    shutil.rmtree(root, ignore_errors=True)


def _batch(spark, rows, day):
    return spark.createDataFrame(rows, "key BIGINT, attr STRING").withColumn(
        "effective_ts",
        F.lit(f"2024-02-{day:02d} 00:00:00").cast("timestamp"),
    )


def _hist(dim):
    return {
        (r.key, r.attr, r.is_current, r.valid_to is None)
        for r in dim.read().collect()
    }


def test_initial_load_all_current(spark, dim):
    v = scd2_apply(dim, _batch(spark, [(1, "A"), (2, "B")], 1), ["key"], ["attr"])
    assert v == 1
    rows = dim.read().collect()
    assert len(rows) == 2
    assert all(r.is_current and r.valid_to is None for r in rows)


def test_noop_batch_writes_no_commit(spark, dim):
    scd2_apply(dim, _batch(spark, [(1, "A")], 1), ["key"], ["attr"])
    v_before = dim.current_version()
    assert scd2_apply(dim, _batch(spark, [(1, "A")], 2), ["key"], ["attr"]) is None
    assert dim.current_version() == v_before  # idempotent: zero commits


def test_change_closes_old_version(spark, dim):
    scd2_apply(dim, _batch(spark, [(1, "A")], 1), ["key"], ["attr"])
    scd2_apply(dim, _batch(spark, [(1, "A2")], 2), ["key"], ["attr"])
    assert _hist(dim) == {
        (1, "A", False, False),   # closed, valid_to set
        (1, "A2", True, True),    # current, open
    }
    closed = dim.read().filter(~F.col("is_current")).collect()[0]
    assert closed.valid_to.day == 2  # closed exactly at the new batch ts


def test_null_transitions_are_null_safe(spark, dim):
    scd2_apply(dim, _batch(spark, [(1, None)], 1), ["key"], ["attr"])
    # NULL -> NULL: no change, no commit
    assert scd2_apply(dim, _batch(spark, [(1, None)], 2), ["key"], ["attr"]) is None
    # NULL -> value: change fires
    assert scd2_apply(dim, _batch(spark, [(1, "X")], 3), ["key"], ["attr"]) is not None
    assert _hist(dim) == {(1, None, False, False), (1, "X", True, True)}


def test_intra_batch_dedupe_latest_wins(spark, dim):
    b = spark.createDataFrame(
        [(1, "early", "2024-02-01 00:00:00"), (1, "late", "2024-02-01 12:00:00")],
        "key BIGINT, attr STRING, effective_ts STRING",
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    scd2_apply(dim, b, ["key"], ["attr"])
    rows = dim.read().collect()
    assert len(rows) == 1 and rows[0].attr == "late"


def test_mixed_batch_single_atomic_commit(spark, dim):
    scd2_apply(dim, _batch(spark, [(1, "A"), (2, "B")], 1), ["key"], ["attr"])
    v = scd2_apply(
        dim, _batch(spark, [(1, "A"), (2, "B2"), (3, "C")], 2), ["key"], ["attr"]
    )
    # change + no-op + insert land in ONE commit
    assert v == dim.current_version() == 2
    assert _hist(dim) == {
        (1, "A", True, True),
        (2, "B", False, False),
        (2, "B2", True, True),
        (3, "C", True, True),
    }


def test_snapshot_at_reads_history_point_in_time(spark, dim):
    scd2_apply(dim, _batch(spark, [(1, "A")], 1), ["key"], ["attr"])
    scd2_apply(dim, _batch(spark, [(1, "A2")], 5), ["key"], ["attr"])
    mid = spark.sql("SELECT timestamp'2024-02-03 00:00:00'").collect()[0][0]
    snap = scd2_snapshot_at(dim, mid).collect()
    assert len(snap) == 1 and snap[0].attr == "A"
    now = spark.sql("SELECT timestamp'2024-02-06 00:00:00'").collect()[0][0]
    snap2 = scd2_snapshot_at(dim, now).collect()
    assert len(snap2) == 1 and snap2[0].attr == "A2"
