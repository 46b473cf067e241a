"""CLONE TABLE semantics (TxnTable.clone_to): one-commit snapshot into
an independent table — shallow = hard links (zero copy, vacuum-safe),
deep = byte copy; stats/partition metadata carry over so pruning works
on the clone from v1.
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
    root = tempfile.mkdtemp(prefix="txn_clone_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k INT, v STRING")


def _ks(t, **kw):
    return sorted(r["k"] for r in t.read(**kw).collect())


class TestCloneBasics:
    def test_clone_matches_source_snapshot(self, spark, lake):
        src = TxnTable(lake, "src")
        src.append(_df(spark, [(1, "a"), (2, "b")]))
        src.append(_df(spark, [(3, "c")]))
        dst = src.clone_to("dst")
        assert dst.current_version() == 1
        assert dst.commit_record(1)["op"] == "clone"
        assert _ks(dst) == [1, 2, 3]
        assert dst.manifest()["rows"] == src.manifest()["rows"]

    def test_clone_of_past_version(self, spark, lake):
        src = TxnTable(lake, "src")
        src.append(_df(spark, [(1, "a")]))
        src.append(_df(spark, [(2, "b")]))
        dst = src.clone_to("dst_v1", version=1)
        assert _ks(dst) == [1]

    def test_clone_onto_nonempty_target_raises(self, spark, lake):
        src = TxnTable(lake, "src")
        src.append(_df(spark, [(1, "a")]))
        TxnTable(lake, "busy").append(_df(spark, [(9, "z")]))
        with pytest.raises(ValueError, match="not empty"):
            src.clone_to("busy")


class TestCloneIndependence:
    def test_writes_to_clone_do_not_touch_source(self, spark, lake):
        src = TxnTable(lake, "src")
        src.append(_df(spark, [(1, "a"), (2, "b")]))
        dst = src.clone_to("dst")
        dst.append(_df(spark, [(7, "g")]))
        dst.delete_where(F.col("k") == 1)
        assert _ks(dst) == [2, 7]
        assert _ks(src) == [1, 2]          # source untouched
        assert src.current_version() == 1  # no commits leaked across

    def test_writes_to_source_do_not_touch_clone(self, spark, lake):
        src = TxnTable(lake, "src")
        src.append(_df(spark, [(1, "a"), (2, "b")]))
        dst = src.clone_to("dst")
        src.delete_where(F.col("k") == 2)
        src.append(_df(spark, [(8, "h")]))
        assert _ks(src) == [1, 8]
        assert _ks(dst) == [1, 2]

    def test_vacuumed_source_leaves_clone_readable(self, spark, lake):
        # the Delta shallow-clone footgun, closed by hard links: the
        # source rewrites + vacuums away every original file, yet the
        # clone still reads its snapshot byte-for-byte.
        src = TxnTable(lake, "src")
        src.append(_df(spark, [(1, "a"), (2, "b")]))
        dst = src.clone_to("dst")
        src.overwrite(_df(spark, [(99, "zz")]))
        src.vacuum(keep_versions=1)
        assert _ks(src) == [99]
        assert _ks(dst) == [1, 2]

    def test_deleting_source_table_leaves_clone_readable(self, spark, lake):
        src = TxnTable(lake, "src")
        src.append(_df(spark, [(1, "a")]))
        dst = src.clone_to("dst")
        shutil.rmtree(src.root)
        assert _ks(dst) == [1]


class TestCloneMetadata:
    def test_partition_layout_and_pruning_carry_over(self, spark, lake):
        src = TxnTable(lake, "src_p", partition_cols=["v"])
        src.append(_df(spark, [(1, "a"), (2, "a"), (3, "b")]))
        dst = src.clone_to("dst_p")
        pruned = dst.resolve_files(partition_filter={"v": "a"})
        assert pruned and len(pruned) < len(dst.manifest()["files"])
        assert _ks(dst, partition_filter={"v": "a"}) == [1, 2]

    def test_stats_pruning_carries_over(self, spark, lake):
        src = TxnTable(lake, "src_s", stats_cols=["k"])
        src.append(_df(spark, [(1, "a")]))
        src.append(_df(spark, [(100, "b")]))
        dst = src.clone_to("dst_s")
        # identical skipping decisions as the source (same rel paths,
        # fewer files than the full snapshot)
        pruned = dst.resolve_files(key_range=("k", 90, 110))
        assert pruned == src.resolve_files(key_range=("k", 90, 110))
        assert len(pruned) < len(dst.manifest()["files"])

    def test_deep_clone_copies_bytes(self, spark, lake):
        src = TxnTable(lake, "src_d")
        src.append(_df(spark, [(1, "a"), (2, "b")]))
        dst = src.clone_to("dst_d", deep=True)
        # deep files are distinct inodes: removing the source leaves them
        shutil.rmtree(src.root)
        assert _ks(dst) == [1, 2]

    def test_clone_of_vacuumed_snapshot_raises(self, spark, lake):
        src = TxnTable(lake, "src_v")
        src.append(_df(spark, [(1, "a")]))
        src.overwrite(_df(spark, [(2, "b")]))
        src.vacuum(keep_versions=1)
        # vacuum truncated the log behind the checkpoint, so snapshot
        # reconstruction itself refuses — still a loud FileNotFoundError,
        # never a silent partial clone
        with pytest.raises(FileNotFoundError):
            src.clone_to("dst_v", version=1)
