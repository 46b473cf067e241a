"""merge_sync (MERGE … WHEN NOT MATCHED BY SOURCE THEN DELETE,
scoped): after the commit, rows matching the scope equal the source
exactly — matched keys replaced, unmatched-in-scope deleted — and rows
outside the scope are untouched.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession


@pytest.fixture()
def lake(spark):
    root = tempfile.mkdtemp(prefix="txn_sync_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id INT, tenant STRING, v STRING")


def _content(t):
    return sorted(
        (r["id"], r["tenant"], r["v"]) for r in t.read().collect()
    )


class TestMergeSync:
    def test_scoped_sync_is_full_state_of_the_scope(self, spark, lake):
        t = TxnTable(lake, "t", stats_cols=["id"])
        t.append(
            _df(spark, [(1, "A", "old"), (2, "A", "old"), (3, "B", "keep")])
        )
        # source = tenant A's COMPLETE new state: 1 updated, 2 gone, 4 new
        t.merge_sync(
            _df(spark, [(1, "A", "new"), (4, "A", "new")]),
            ["id"],
            scope=F.col("tenant") == "A",
        )
        assert _content(t) == [
            (1, "A", "new"),
            (3, "B", "keep"),
            (4, "A", "new"),
        ]
        assert t.commit_record(t.current_version())["op"] == "merge_sync"

    def test_unscoped_sync_equals_source(self, spark, lake):
        t = TxnTable(lake, "t2")
        t.append(_df(spark, [(1, "A", "x"), (2, "B", "y")]))
        t.merge_sync(_df(spark, [(2, "B", "z"), (9, "C", "w")]), ["id"])
        assert _content(t) == [(2, "B", "z"), (9, "C", "w")]

    def test_sync_into_empty_table(self, spark, lake):
        t = TxnTable(lake, "t3")
        t.merge_sync(_df(spark, [(1, "A", "x")]), ["id"])
        assert _content(t) == [(1, "A", "x")]

    def test_out_of_scope_matched_key_is_still_replaced(self, spark, lake):
        # a source row may carry a key that currently lives OUTSIDE the
        # scope: matched keys are replaced regardless (standard MERGE
        # matched-clause semantics), the scope only widens deletion
        t = TxnTable(lake, "t4")
        t.append(_df(spark, [(1, "B", "was_b"), (2, "A", "a")]))
        t.merge_sync(
            _df(spark, [(1, "A", "moved"), (2, "A", "a2")]),
            ["id"],
            scope=F.col("tenant") == "A",
        )
        assert _content(t) == [(1, "A", "moved"), (2, "A", "a2")]

    def test_untouched_files_carry_by_reference(self, spark, lake):
        t = TxnTable(lake, "t5", stats_cols=["id"])
        t.append(_df(spark, [(1, "A", "a")]).coalesce(1))    # ids ~1
        t.append(_df(spark, [(100, "B", "b")]).coalesce(1))  # ids ~100
        before = set(t.manifest()["files"])
        t.merge_sync(
            _df(spark, [(1, "A", "a2")]),
            ["id"],
            scope=F.col("tenant") == "A",
        )
        after = set(t.manifest()["files"])
        # the B file (scope-free, key-range disjoint) is carried
        assert before & after, "disjoint file should carry by reference"
        assert _content(t) == [(1, "A", "a2"), (100, "B", "b")]

    def test_conflicted_sync_raises_not_rebases(self, spark, lake):
        t = TxnTable(lake, "t6")
        t.append(_df(spark, [(1, "A", "a")]))
        base = t.current_version()
        # another writer lands first
        t2 = TxnTable(lake, "t6")
        t2.append(_df(spark, [(50, "B", "b")]))
        # simulate the losing writer: commit against the stale base
        from interop_datalake_spark.lake.txn import CommitConflictError

        with pytest.raises(CommitConflictError):
            t._commit_retry(
                base,
                op="merge_sync",
                added=[],
                removed=[],
                new_rows=0,
                removed_rows=0,
            )
