"""UniForm-style dual export: ONE TxnTable root carries BOTH a
mirrored Delta ``_delta_log`` and Iceberg ``metadata/`` over the SAME
data parquet (zero data bytes copied), and the two foreign readers
must agree with each other and with the TxnTable at every lifecycle
point — current state, time travel version-for-snapshot, and the
change feeds (Delta CDF vs the Iceberg changelog) ordinal by ordinal.
This is the invariant Delta UniForm sells: one copy of the data,
every engine's metadata."""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.delta_interop import (
    export_delta_log,
    read_delta,
    read_delta_changes,
)
from interop_datalake_spark.lake.iceberg_interop import (
    export_iceberg_metadata,
    read_iceberg,
    read_iceberg_changes,
)
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture()
def lake(spark):
    root = tempfile.mkdtemp(prefix="uniform_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


def test_dual_export_readers_and_feeds_agree(spark, lake):
    t = TxnTable(lake, "uni", stats_cols=["k"])

    def export_both():
        export_delta_log(t, mode="mirror")
        export_iceberg_metadata(t)

    t.append(
        spark.range(0, 30)
        .selectExpr("id as k", "cast(id % 3 as int) as g")
        .repartition(2)
    )
    export_both()  # delta v0 / snapshot 1
    t.delete_where(F.col("k") % 5 == 0, merge_on_read=True)
    export_both()  # delta v1 / snapshot 2 (vectored)
    up = spark.createDataFrame(
        [(3, 99), (100, 7)], "k BIGINT, g INT"
    ).coalesce(1)
    t.merge(up, ["k"], merge_on_read=True)
    export_both()  # delta v2 / snapshot 3

    # zero data copies: both logs reference the table's own parquet
    assert not list((t.root / "_delta_log").glob("*.parquet.data"))

    def rows(df):
        return sorted((r["k"], r["g"]) for r in df.collect())

    want = rows(t.read())
    assert rows(read_delta(spark, str(t.root))) == want
    assert rows(read_iceberg(spark, str(t.root))) == want

    # time travel: delta version N == iceberg snapshot-log[N]
    meta_dir = t.root / "metadata"
    n = int((meta_dir / "version-hint.text").read_text())
    meta = json.loads((meta_dir / f"v{n}.metadata.json").read_text())
    snap_ids = [e["snapshot-id"] for e in meta["snapshot-log"]]
    assert len(snap_ids) == 3
    for v, sid in enumerate(snap_ids):
        assert rows(
            read_delta(spark, str(t.root), version=v)
        ) == rows(
            read_iceberg(spark, str(t.root), snapshot_id=sid)
        ), f"delta v{v} vs iceberg snapshot ordinal {v}"

    # change feeds: Delta CDF ordinal-for-ordinal against the Iceberg
    # changelog (plus the base snapshot, which only the Delta feed
    # covers — the changelog is exclusive-from)
    delta_ch = {}
    for r in read_delta_changes(spark, str(t.root), -1).collect():
        delta_ch.setdefault(r["_commit_version"], []).append(
            (r["k"], r["g"], r["_change_type"])
        )
    ice_ch = {}
    for r in read_iceberg_changes(
        spark, str(t.root), snap_ids[0], include_deletes=True
    ).collect():
        ice_ch.setdefault(
            snap_ids.index(r["_snapshot_id"]), []
        ).append((r["k"], r["g"], r["_change_type"]))
    assert sorted(delta_ch[0]) == sorted(
        (k, k % 3, "insert") for k in range(30)
    )
    for ordinal in (1, 2):
        assert sorted(delta_ch[ordinal]) == sorted(
            ice_ch[ordinal]
        ), f"feeds disagree at ordinal {ordinal}"
