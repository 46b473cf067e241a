"""Partition-spec evolution (Iceberg semantics): a snapshot may mix
files written before the table was partitioned (partition column stored
IN the data) with files written under the key=value layout (column
stored in the PATH). The manifest's per-file partition values pick the
right read schema per group — old files must never come back NULLed.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession


@pytest.fixture()
def lake(spark):
    root = tempfile.mkdtemp(prefix="txn_pevo_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k INT, v STRING")


class TestPartitionEvolution:
    def test_mixed_layout_reads_old_values_from_data(self, spark, lake):
        plain = TxnTable(lake, "t")
        plain.append(_df(spark, [(1, "a"), (2, "b")]))        # v IN data
        part = TxnTable(lake, "t", partition_cols=["v"])
        part.append(_df(spark, [(3, "a"), (4, "c")]))         # v in PATH
        got = {
            r["k"]: r["v"] for r in part.read().collect()
        }
        assert got == {1: "a", 2: "b", 3: "a", 4: "c"}

    def test_partition_filter_correct_across_layouts(self, spark, lake):
        plain = TxnTable(lake, "t2")
        plain.append(_df(spark, [(1, "a"), (2, "b")]))
        part = TxnTable(lake, "t2", partition_cols=["v"])
        part.append(_df(spark, [(3, "a"), (4, "c")]))
        rows = part.read(partition_filter={"v": "a"}).collect()
        assert sorted(r["k"] for r in rows) == [1, 3]
        # pruning: the old (value-less) file is conservatively kept,
        # the new v=c file is pruned away
        kept = part.resolve_files(partition_filter={"v": "a"})
        assert len(kept) < len(part.manifest()["files"])

    def test_time_travel_to_pre_evolution_version(self, spark, lake):
        plain = TxnTable(lake, "t3")
        plain.append(_df(spark, [(1, "a")]))
        part = TxnTable(lake, "t3", partition_cols=["v"])
        part.append(_df(spark, [(2, "b")]))
        v1 = {r["k"]: r["v"] for r in part.read(version=1).collect()}
        assert v1 == {1: "a"}

    def test_partial_spec_old_path_columns_survive(self, spark, lake):
        # spec ['a'] → spec ['a','b']: old files carry a in the PATH
        # (absent from their parquet data) and predate b entirely. The
        # per-COLUMN discriminator must still path-inject a for them
        # (review finding: an all-or-nothing split silently NULLed it).
        p1 = TxnTable(lake, "ps", partition_cols=["a"])
        p1.append(
            spark.createDataFrame([(1, "x"), (2, "y")], "k INT, a STRING")
        )
        p2 = TxnTable(lake, "ps", partition_cols=["a", "b"])
        p2.append(
            spark.createDataFrame(
                [(3, "x", "m")], "k INT, a STRING, b STRING"
            )
        )
        got = {
            r["k"]: (r["a"], r["b"]) for r in p2.read().collect()
        }
        assert got == {1: ("x", None), 2: ("y", None), 3: ("x", "m")}
        rows = p2.read(partition_filter={"a": "x"}).collect()
        assert sorted(r["k"] for r in rows) == [1, 3]

    def test_column_order_stable_across_mixed_specs(self, spark, lake):
        # positional consumers (toPandas, CSV export) must see the log
        # schema's column order regardless of which spec-group loads
        # first (review finding: path-injected columns appended last)
        plain = TxnTable(lake, "tc")
        plain.append(_df(spark, [(1, "a")]))
        part = TxnTable(lake, "tc", partition_cols=["v"])
        part.append(_df(spark, [(2, "b")]))
        assert part.read().columns == ["k", "v"]
        assert part.read(version=1).columns == ["k", "v"]

    def test_pure_layouts_unchanged(self, spark, lake):
        # regression guard: single-layout tables take the single-read
        # path and behave exactly as before
        p = TxnTable(lake, "t4", partition_cols=["v"])
        p.append(_df(spark, [(1, "a"), (2, "b")]))
        assert {r["k"]: r["v"] for r in p.read().collect()} == {1: "a", 2: "b"}
        u = TxnTable(lake, "t5")
        u.append(_df(spark, [(9, "z")]))
        assert u.read().count() == 1


class TestSpecColumnDrop:
    def test_dropped_path_column_still_injected_from_path(self, spark, lake):
        # spec ['v'] → spec [] (column dropped from the spec, still in
        # the log schema): the old file's v lives ONLY in its path, and
        # the manifest records it — reads must inject it, not NULL it
        # (round-5 advice finding: grouping keyed on the CURRENT spec
        # silently NULLed older specs' path columns)
        part = TxnTable(lake, "td", partition_cols=["v"])
        part.append(_df(spark, [(1, "a"), (2, "b")]))         # v in PATH
        plain = TxnTable(lake, "td")                          # spec drops v
        plain.append(_df(spark, [(3, "c")]))                  # v IN data
        got = {r["k"]: r["v"] for r in plain.read().collect()}
        assert got == {1: "a", 2: "b", 3: "c"}

    def test_replaced_path_column_keeps_old_files_whole(self, spark, lake):
        # spec ['v'] → spec ['w']: files from both specs coexist; each
        # group injects ITS OWN recorded path column
        df1 = spark.createDataFrame([(1, "a", "x")], "k INT, v STRING, w STRING")
        t1 = TxnTable(lake, "tr", partition_cols=["v"])
        t1.append(df1)
        df2 = spark.createDataFrame([(2, "b", "y")], "k INT, v STRING, w STRING")
        t2 = TxnTable(lake, "tr", partition_cols=["w"])
        t2.append(df2)
        rows = {r["k"]: (r["v"], r["w"]) for r in t2.read().collect()}
        assert rows == {1: ("a", "x"), 2: ("b", "y")}
