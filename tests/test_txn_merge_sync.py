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

    def test_null_scope_rows_are_kept_not_deleted(self, spark, lake):
        # scope = (tenant == 'A') is NULL for a NULL-tenant row living
        # in a touched file: SQL MERGE deletes only when the condition
        # is TRUE, so the row must survive (review finding: ~NULL=NULL
        # silently dropped it)
        t = TxnTable(lake, "tn")
        t.append(
            spark.createDataFrame(
                [(1, "A", "x"), (2, None, "y")],
                "id INT, tenant STRING, v STRING",
            ).coalesce(1)  # one file: the NULL row shares the touched file
        )
        t.merge_sync(
            _df(spark, [(1, "A", "x2")]),
            ["id"],
            scope=F.col("tenant") == "A",
        )
        assert _content(t) == [(1, "A", "x2"), (2, None, "y")]

    def test_kept_rows_retain_columns_source_lacks(self, spark, lake):
        # schema-evolved table has a column the sync source doesn't
        # carry; an out-of-scope row in a touched file must keep its
        # value (review finding: projecting kept to source columns
        # nulled it via the log-schema read path)
        t = TxnTable(lake, "tv")
        t.append(
            spark.createDataFrame(
                [(1, "A", "x", "keep-me"), (3, "B", "y", "important")],
                "id INT, tenant STRING, v STRING, note STRING",
            ).coalesce(1)
        )
        t.merge_sync(
            _df(spark, [(1, "A", "x2")]),  # no 'note' column
            ["id"],
            scope=F.col("tenant") == "A",
        )
        got = {
            r["id"]: (r["tenant"], r["v"], r["note"])
            for r in t.read().collect()
        }
        assert got[3] == ("B", "y", "important")  # untouched, value intact
        assert got[1] == ("A", "x2", None)  # replaced; source had no note

    def test_merge_kept_rows_retain_columns_updates_lack(self, spark, lake):
        # same latent bug in plain merge(): kept (non-matching) rows of
        # a rewritten file must not lose columns the updates frame lacks
        t = TxnTable(lake, "tm")
        t.append(
            spark.createDataFrame(
                [(1, "a", "n1"), (2, "b", "n2")],
                "id INT, v STRING, note STRING",
            ).coalesce(1)
        )
        t.merge(
            spark.createDataFrame([(1, "a2")], "id INT, v STRING"),
            ["id"],
        )
        got = {
            r["id"]: (r["v"], r["note"]) for r in t.read().collect()
        }
        assert got[2] == ("b", "n2")  # kept row, note intact
        assert got[1] == ("a2", None)

    def test_incompatible_schema_fails_before_writing(self, spark, lake):
        from interop_datalake_spark.lake.txn import SchemaEvolutionError

        t = TxnTable(lake, "ts")
        t.append(_df(spark, [(1, "A", "x")]))
        files_before = sorted(
            p for p in (t.root / "data").rglob("*") if p.is_file()
        )
        with pytest.raises(SchemaEvolutionError):
            t.merge_sync(
                spark.createDataFrame(
                    [(1, "A", 5)], "id INT, tenant STRING, v INT"
                ),
                ["id"],
            )
        files_after = sorted(
            p for p in (t.root / "data").rglob("*") if p.is_file()
        )
        assert files_before == files_after  # no orphaned data written

    def test_scope_partition_filter_bounds_the_scan(self, spark, lake):
        # with the partition hint, the scope scan touches only tenant
        # A's files — and results are identical to the unhinted sync
        t = TxnTable(lake, "tp", partition_cols=["tenant"])
        t.append(
            _df(spark, [(1, "A", "a"), (2, "A", "stale"), (3, "B", "keep")])
        )
        t.merge_sync(
            _df(spark, [(1, "A", "a2")]),
            ["id"],
            scope=F.col("tenant") == "A",
            scope_partition_filter={"tenant": "A"},
        )
        assert _content(t) == [(1, "A", "a2"), (3, "B", "keep")]

    def test_scope_candidate_files_bound_the_scan(self, spark, lake):
        # a caller-resolved candidate list replaces the whole-table
        # scope-hit scan; results identical to the unhinted sync
        t = TxnTable(lake, "tc", stats_cols=["id"])
        t.append(_df(spark, [(1, "A", "a"), (2, "A", "stale")]))
        t.append(_df(spark, [(30, "B", "keep")]))
        f_a = t.commit_record(1)["added"]  # files holding tenant A rows
        t.merge_sync(
            _df(spark, [(1, "A", "a2")]),
            ["id"],
            scope=F.col("tenant") == "A",
            scope_candidate_files=f_a,
        )
        assert _content(t) == [(1, "A", "a2"), (30, "B", "keep")]

    def test_scope_candidate_files_trust_contract_under_deletes(
        self, spark, lake
    ):
        # files OUTSIDE the candidate list are trusted scope-free: a
        # too-narrow list UNDER-deletes (the stale in-scope row in the
        # excluded file survives) — it never corrupts kept rows. This
        # is the documented contract, mirroring scope_partition_filter
        t = TxnTable(lake, "tc2", stats_cols=["id"])
        t.append(_df(spark, [(1, "A", "a")]))
        t.append(_df(spark, [(2, "A", "stale-survives")]))
        f_first = t.commit_record(1)["added"]
        t.merge_sync(
            _df(spark, [(1, "A", "a2")]),
            ["id"],
            scope=F.col("tenant") == "A",
            scope_candidate_files=f_first,
        )
        assert _content(t) == [(1, "A", "a2"), (2, "A", "stale-survives")]

    def test_scope_candidate_files_tolerate_stale_entries(
        self, spark, lake
    ):
        # a candidate that was compacted away between the caller's
        # resolution and the sync must not crash the load — it simply
        # can't hold scope rows anymore
        t = TxnTable(lake, "tc3", stats_cols=["id"])
        t.append(_df(spark, [(1, "A", "a"), (2, "A", "stale")]))
        gone = t.manifest()["files"][0]
        t.compact()
        live = t.manifest()["files"]
        t.merge_sync(
            _df(spark, [(1, "A", "a2")]),
            ["id"],
            scope=F.col("tenant") == "A",
            scope_candidate_files=[gone] + live,
        )
        assert _content(t) == [(1, "A", "a2")]

    def test_delete_where_null_predicate_keeps_row(self, spark, lake):
        # same three-valued trap as merge_sync's scope: DELETE removes
        # rows only where the predicate is TRUE; a NULL-tenant row in
        # the touched file must survive
        t = TxnTable(lake, "td")
        t.append(
            spark.createDataFrame(
                [(1, "A"), (2, None)], "id INT, tenant STRING"
            ).coalesce(1)
        )
        t.delete_where(F.col("tenant") == "A")
        assert sorted(
            (r["id"], r["tenant"]) for r in t.read().collect()
        ) == [(2, None)]

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


class TestPercentEncodedPaths:
    """input_file_name() returns percent-ENCODED URIs; scope/key file
    matching must decode before the suffix compare or files whose
    partition value contains a URI-reserved character (space → %20)
    are treated as scope-free and in-scope deletes silently no-op
    (round-5 advice finding)."""

    def test_sync_deletes_in_scope_rows_under_encoded_partition(
        self, spark, lake
    ):
        t = TxnTable(lake, "tp", partition_cols=["tenant"])
        t.append(
            _df(spark, [(1, "A corp", "old"), (2, "A corp", "old"),
                        (3, "B", "keep")])
        )
        # source = 'A corp' tenant's COMPLETE new state: 2 must DIE
        t.merge_sync(
            _df(spark, [(1, "A corp", "new")]),
            ["id"],
            scope=F.col("tenant") == "A corp",
        )
        assert _content(t) == [(1, "A corp", "new"), (3, "B", "keep")]

    def test_delete_where_hits_encoded_partition(self, spark, lake):
        t = TxnTable(lake, "tq", partition_cols=["tenant"])
        t.append(_df(spark, [(1, "A corp", "x"), (2, "B", "y")]))
        t.delete_where(F.col("tenant") == "A corp")
        assert _content(t) == [(2, "B", "y")]

    def test_bloom_stats_attach_under_encoded_partition(self, spark, lake):
        # _write_data keys per-file stats by the same suffix match;
        # an unmatched file would commit with NO stats/bloom entry
        t = TxnTable(
            lake, "tr", partition_cols=["tenant"],
            stats_cols=["id"], bloom_cols=["v"],
        )
        t.append(_df(spark, [(1, "A corp", "x1"), (2, "B", "y2")]))
        st = t._state(t.current_version())
        assert all(f in st["stats"] for f in st["files"])
        got = t.read(bloom_eq={"v": "x1"})
        assert [r["id"] for r in got.collect()] == [1]
