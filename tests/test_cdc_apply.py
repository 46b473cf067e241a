"""CDC consumption (lake/cdc_apply.py + TxnTable.delete_keys): fold a
change feed to latest-per-key and apply into a keyed state table —
the APPLY CHANGES INTO / upsert-sink shape — validated end-to-end by
replaying a mirrored table's OWN change feed into a fresh table and
demanding state equality, plus shape pins (image-pair folds,
same-version delete+reinsert, idempotent replay, keyed deletes via
semi-join on both the copy-on-write and merge-on-read paths)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.cdc_apply import (
    apply_changes_into,
    fold_changes,
)
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture()
def lake(spark):
    root = tempfile.mkdtemp(prefix="cdc_apply_")
    yield DatalakeSession(lake_root=root, spark=spark)
    shutil.rmtree(root, ignore_errors=True)


class TestDeleteKeys:
    @pytest.mark.parametrize("mor", [False, True])
    def test_keyed_delete(self, spark, lake, mor):
        t = TxnTable(lake, f"dk{int(mor)}", stats_cols=["k"])
        t.append(
            spark.range(0, 20).selectExpr("id as k", "'x' as v")
            .repartition(3)
        )
        keys = spark.createDataFrame(
            [(3,), (5,), (300,)], "k BIGINT"
        )
        t.delete_keys(keys, ["k"], merge_on_read=mor)
        got = {r["k"] for r in t.read().collect()}
        assert got == set(range(20)) - {3, 5}
        # composite keys + no-match no-op commit
        v0 = t.current_version()
        t.delete_keys(
            spark.createDataFrame([(999,)], "k BIGINT"), ["k"],
            merge_on_read=mor,
        )
        assert t.current_version() == v0 + 1
        assert t.read().count() == 18

    def test_null_keys_never_match(self, spark, lake):
        t = TxnTable(lake, "dkn", stats_cols=["k"])
        t.append(
            spark.createDataFrame(
                [(1, "a"), (None, "n")], "k INT, v STRING"
            )
        )
        t.delete_keys(
            spark.createDataFrame([(None,)], "k INT"), ["k"]
        )
        assert t.read().count() == 2  # NULL never joins


class TestFold:
    def test_image_pairs_and_same_version_reinsert(self, spark):
        rows = [
            # key 1: update at v2 (preimage + postimage) after insert
            (1, "old", "insert", 1),
            (1, "old", "update_preimage", 2),
            (1, "new", "update_postimage", 2),
            # key 2: delete + reinsert in the SAME version → insert
            (2, "gone", "delete", 2),
            (2, "back", "insert", 2),
            # key 3: latest event is the delete
            (3, "x", "insert", 1),
            (3, "x", "delete", 3),
        ]
        ch = spark.createDataFrame(
            rows,
            "k INT, v STRING, _change_type STRING, "
            "_commit_version BIGINT",
        )
        got = {
            (r["k"], r["v"], r["_change_type"])
            for r in fold_changes(ch, ["k"]).collect()
        }
        assert got == {
            (1, "new", "update_postimage"),
            (2, "back", "insert"),
            (3, "x", "delete"),
        }


class TestApplyChanges:
    def test_replaying_own_feed_reproduces_state(self, spark, lake):
        """append → MOR delete → MOR merge on a source table; apply
        its change feed into a FRESH table → states equal."""
        src = TxnTable(lake, "ca_src", stats_cols=["k"])
        src.append(
            spark.range(0, 40)
            .selectExpr("id as k", "cast(id % 4 as int) as g")
            .repartition(3)
        )
        src.delete_where(F.col("k") % 5 == 0, merge_on_read=True)
        up = spark.createDataFrame(
            [(2, 99), (100, 7)], "k BIGINT, g INT"
        )
        src.merge(up, ["k"], merge_on_read=True)

        tgt = TxnTable(lake, "ca_tgt", stats_cols=["k"])
        apply_changes_into(
            tgt, src.read_changes(0, include_deletes=True), ["k"]
        )
        want = {(r["k"], r["g"]) for r in src.read().collect()}
        got = {(r["k"], r["g"]) for r in tgt.read().collect()}
        assert got == want
        # idempotent replay of the SAME window
        v = tgt.current_version()
        apply_changes_into(
            tgt, src.read_changes(0, include_deletes=True), ["k"]
        )
        assert {(r["k"], r["g"]) for r in tgt.read().collect()} == want
        assert tgt.current_version() > v  # commits happen, state fixed

    def test_foreign_delta_cdf_feed_applies(self, spark, lake):
        """The cross-format chain: mirror a table WITH change data,
        read the foreign CDF (cdc actions authoritative), apply into
        a fresh table → state equality."""
        from interop_datalake_spark.lake.delta_interop import (
            export_delta_log,
            read_delta_changes,
        )

        src = TxnTable(lake, "ca_d_src", stats_cols=["k"])
        src.append(
            spark.range(0, 25).selectExpr("id as k", "'a' as v")
            .repartition(2)
        )
        export_delta_log(src, mode="mirror", change_data=True)
        src.delete_where(F.col("k") % 3 == 0, merge_on_read=True)
        export_delta_log(src, mode="mirror", change_data=True)

        tgt = TxnTable(lake, "ca_d_tgt", stats_cols=["k"])
        apply_changes_into(
            tgt,
            read_delta_changes(spark, str(src.root), -1),
            ["k"],
        )
        want = {(r["k"], r["v"]) for r in src.read().collect()}
        got = {(r["k"], r["v"]) for r in tgt.read().collect()}
        assert got == want and len(got) == 25 - 9

    def test_incremental_windows_compose(self, spark, lake):
        src = TxnTable(lake, "ca_w_src", stats_cols=["k"])
        src.append(spark.range(0, 10).selectExpr("id as k"))
        v1 = src.current_version()
        src.delete_where(F.col("k") < 4, merge_on_read=True)
        v2 = src.current_version()
        src.append(spark.range(100, 103).selectExpr("id as k"))

        tgt = TxnTable(lake, "ca_w_tgt", stats_cols=["k"])
        apply_changes_into(
            tgt, src.read_changes(0, v1, include_deletes=True), ["k"]
        )
        assert tgt.read().count() == 10
        apply_changes_into(
            tgt, src.read_changes(v1, v2, include_deletes=True), ["k"]
        )
        assert tgt.read().count() == 6
        apply_changes_into(
            tgt, src.read_changes(v2, include_deletes=True), ["k"]
        )
        assert {r["k"] for r in tgt.read().collect()} == {
            r["k"] for r in src.read().collect()
        }

    def test_unknown_change_type_refused(self, spark, lake):
        t = TxnTable(lake, "ca_u", stats_cols=["k"])
        ch = spark.createDataFrame(
            [(1, "upsert", 1)],
            "k INT, _change_type STRING, _commit_version BIGINT",
        )
        with pytest.raises(ValueError, match="unknown change type"):
            apply_changes_into(t, ch, ["k"])


class TestStreamingApply:
    def test_cdc_stream_foreachbatch_apply(self, spark, lake, tmp_path):
        """The full streaming pipeline: a mirrored Delta table's
        delta_cdc readStream feeds apply_changes_into inside
        foreachBatch — the upsert-sink idiom — and the target
        converges to the source state across two drains (initial
        snapshot + a later retraction commit)."""
        from interop_datalake_spark.lake.delta_interop import (
            export_delta_log,
        )
        from interop_datalake_spark.streaming.delta_source import (
            read_delta_cdc_stream,
        )

        src = TxnTable(lake, "sa_src", stats_cols=["k"])
        src.append(
            spark.range(0, 15).selectExpr("id as k", "'v1' as v")
            .repartition(2)
        )
        export_delta_log(src, mode="mirror")
        tgt = TxnTable(lake, "sa_tgt", stats_cols=["k"])

        def drain():
            q = (
                read_delta_cdc_stream(spark, str(src.root))
                .writeStream.foreachBatch(
                    lambda bdf, eid: apply_changes_into(
                        tgt, bdf, ["k"]
                    )
                    if not bdf.isEmpty()
                    else None
                )
                .option(
                    "checkpointLocation", str(tmp_path / "ck_apply")
                )
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(180), "stream did not drain"

        drain()
        assert {(r["k"], r["v"]) for r in tgt.read().collect()} == {
            (k, "v1") for k in range(15)
        }
        # a retraction commit (the shape delta_appends refuses)
        # streams as deletes and applies
        src.delete_where(F.col("k") % 3 == 0, merge_on_read=True)
        src.merge(
            spark.createDataFrame([(1, "v2")], "k BIGINT, v STRING"),
            ["k"],
            merge_on_read=True,
        )
        export_delta_log(src, mode="mirror")
        drain()
        assert {(r["k"], r["v"]) for r in tgt.read().collect()} == {
            (r["k"], r["v"]) for r in src.read().collect()
        }


class TestScd2ApplyChanges:
    """APPLY CHANGES … STORED AS SCD TYPE 2: the folded feed routes
    into a Type-2 history table; scd2_snapshot_at over the sequence
    values must replay the SOURCE's own time travel version for
    version — the oracle the docstring promises."""

    def _source_with_history(self, spark, lake, name):
        src = TxnTable(lake, name, stats_cols=["k"])
        src.append(
            spark.range(0, 12)
            .selectExpr("id as k", "cast(id % 3 as int) as g")
            .repartition(2)
        )  # v1
        src.delete_where(F.col("k") % 4 == 0, merge_on_read=True)  # v2
        up = spark.createDataFrame(
            [(1, 99), (50, 7)], "k BIGINT, g INT"
        )
        src.merge(up, ["k"], merge_on_read=True)  # v3
        src.delete_where(F.col("k") == 1, merge_on_read=True)  # v4
        return src

    def test_snapshot_at_equals_source_time_travel(self, spark, lake):
        from interop_datalake_spark.lake.scd import scd2_snapshot_at

        src = self._source_with_history(spark, lake, "s2_src")
        dim = TxnTable(lake, "s2_dim", stats_cols=["k"])
        apply_changes_into(
            dim,
            src.read_changes(0, include_deletes=True),
            ["k"],
            stored_as_scd2=True,
        )
        for v in range(1, src.current_version() + 1):
            want = {
                (r["k"], r["g"])
                for r in src.read(version=v).collect()
            }
            got = {
                (r["k"], r["g"])
                for r in scd2_snapshot_at(dim, v).collect()
            }
            assert got == want, f"version {v}"
        # history invariants: exactly one current row per live key,
        # no overlapping intervals
        rows = dim.read().collect()
        cur = [r for r in rows if r["is_current"]]
        assert len(cur) == len({r["k"] for r in cur})
        assert {r["k"] for r in cur} == {
            r["k"] for r in src.read().collect()
        }
        assert all(
            r["valid_to"] is None or r["valid_to"] > r["valid_from"]
            for r in rows
        )

    def test_incremental_windows_and_replay(self, spark, lake):
        """Applying the feed window-by-window (the foreachBatch
        shape) builds the same history as one shot, and replaying an
        already-applied window is idempotent."""
        from interop_datalake_spark.lake.scd import scd2_snapshot_at

        src = self._source_with_history(spark, lake, "s2i_src")
        dim = TxnTable(lake, "s2i_dim", stats_cols=["k"])
        mid = 2
        apply_changes_into(
            dim,
            src.read_changes(0, to_version=mid, include_deletes=True),
            ["k"],
            stored_as_scd2=True,
        )
        apply_changes_into(
            dim,
            src.read_changes(mid, include_deletes=True),
            ["k"],
            stored_as_scd2=True,
        )
        hist1 = {
            (r["k"], r["g"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in dim.read().collect()
        }
        # replay the SECOND window again: history unchanged
        apply_changes_into(
            dim,
            src.read_changes(mid, include_deletes=True),
            ["k"],
            stored_as_scd2=True,
        )
        assert {
            (r["k"], r["g"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in dim.read().collect()
        } == hist1
        # equals the one-shot build
        dim2 = TxnTable(lake, "s2i_dim2", stats_cols=["k"])
        apply_changes_into(
            dim2,
            src.read_changes(0, include_deletes=True),
            ["k"],
            stored_as_scd2=True,
        )
        assert {
            (r["k"], r["g"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in dim2.read().collect()
        } == hist1
        for v in range(1, src.current_version() + 1):
            assert {
                (r["k"], r["g"])
                for r in scd2_snapshot_at(dim, v).collect()
            } == {
                (r["k"], r["g"]) for r in src.read(version=v).collect()
            }

    def test_delete_then_reinsert_gap(self, spark, lake):
        """A deleted key has NO covering row between its delete and
        re-insert; the re-insert opens a fresh current version."""
        from interop_datalake_spark.lake.scd import (
            scd2_apply_changes,
            scd2_snapshot_at,
        )

        feed = spark.createDataFrame(
            [
                (1, "a", 1, "insert"),
                (1, "a", 3, "delete"),
                (1, "b", 7, "insert"),
            ],
            "k INT, v STRING, _commit_version BIGINT, "
            "_change_type STRING",
        )
        dim = TxnTable(lake, "s2g_dim", stats_cols=["k"])
        scd2_apply_changes(dim, feed, ["k"])
        assert {
            (r["k"], r["v"])
            for r in scd2_snapshot_at(dim, 2).collect()
        } == {(1, "a")}
        assert scd2_snapshot_at(dim, 5).count() == 0
        assert {
            (r["k"], r["v"], r["is_current"])
            for r in scd2_snapshot_at(dim, 7).collect()
        } == {(1, "b", True)}
        # empty feed: no commit
        assert scd2_apply_changes(dim, feed.limit(0), ["k"]) is None


class TestPairChangelogUpdates:
    def test_retags_same_sequence_pairs(self, spark):
        feed = spark.createDataFrame(
            [
                # key 1: delete+insert at v2 → an update pair
                (1, "old", 2, "delete"),
                (1, "new", 2, "insert"),
                # key 2: bare delete stays a delete
                (2, "x", 2, "delete"),
                # key 3: bare insert stays an insert
                (3, "y", 2, "insert"),
                # key 4: delete v2, insert v3 — different sequence
                # values, NOT an update pair
                (4, "a", 2, "delete"),
                (4, "b", 3, "insert"),
            ],
            "k INT, v STRING, _commit_version BIGINT, "
            "_change_type STRING",
        )
        from interop_datalake_spark.lake.cdc_apply import (
            pair_changelog_updates,
        )

        got = {
            (r.k, r.v, r._commit_version, r._change_type)
            for r in pair_changelog_updates(feed, ["k"]).collect()
        }
        assert got == {
            (1, "old", 2, "update_preimage"),
            (1, "new", 2, "update_postimage"),
            (2, "x", 2, "delete"),
            (3, "y", 2, "insert"),
            (4, "a", 2, "delete"),
            (4, "b", 3, "insert"),
        }

    def test_apply_agrees_with_raw_feed(self, spark, lake):
        """Retagging never changes what APPLY CHANGES produces — the
        priority rule treats the pair exactly like delete+insert."""
        src = TxnTable(lake, "pcu_src", stats_cols=["k"])
        src.append(
            spark.range(0, 20).selectExpr("id as k", "'a' as v")
            .coalesce(1)
        )
        up = spark.createDataFrame(
            [(3, "B"), (7, "C")], "k BIGINT, v STRING"
        )
        src.merge(up, ["k"], merge_on_read=True)
        src.delete_where(F.col("k") == 5, merge_on_read=True)
        feed = src.read_changes(0, include_deletes=True)
        from interop_datalake_spark.lake.cdc_apply import (
            pair_changelog_updates,
        )

        paired = pair_changelog_updates(feed, ["k"])
        # the merge's delete+insert pairs retagged as update images
        assert (
            paired.filter(
                F.col("_change_type") == "update_postimage"
            ).count()
            == 2
        )
        t1 = TxnTable(lake, "pcu_t1", stats_cols=["k"])
        t2 = TxnTable(lake, "pcu_t2", stats_cols=["k"])
        apply_changes_into(t1, feed, ["k"])
        apply_changes_into(t2, paired, ["k"])
        assert {(r.k, r.v) for r in t1.read().collect()} == {
            (r.k, r.v) for r in t2.read().collect()
        } == {(r.k, r.v) for r in src.read().collect()}


class TestIcebergCdcStreamApply:
    def test_stream_foreachbatch_apply_converges(
        self, spark, lake, tmp_path
    ):
        """The cross-format composition, Iceberg edition: an
        iceberg_cdc readStream piped through foreachBatch
        apply_changes_into (folding on the stream's monotone
        _sequence_number) converges the target to the source across
        the initial snapshot and a later retraction snapshot."""
        from interop_datalake_spark.lake.iceberg_interop import (
            export_iceberg_metadata,
        )
        from interop_datalake_spark.streaming.iceberg_source import (
            read_iceberg_cdc_stream,
        )

        src = TxnTable(lake, "isa_src", stats_cols=["k"])
        src.append(
            spark.range(0, 30)
            .selectExpr("id as k", "cast(id % 3 as int) as g")
            .coalesce(1)
        )
        export_iceberg_metadata(src)
        tgt = TxnTable(lake, "isa_tgt", stats_cols=["k"])

        def apply_batch(bdf, epoch_id):
            if bdf.isEmpty():
                return
            apply_changes_into(
                tgt, bdf, ["k"], sequence_col="_sequence_number"
            )

        ck = str(tmp_path / "isa_ck")

        def drain():
            q = (
                read_iceberg_cdc_stream(spark, str(src.root))
                .writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(180)

        drain()
        assert {(r.k, r.g) for r in tgt.read().collect()} == {
            (r.k, r.g) for r in src.read().collect()
        }
        # retraction + upsert snapshot streams incrementally and
        # converges again
        src.delete_where(F.col("k") % 5 == 0, merge_on_read=True)
        export_iceberg_metadata(src)
        up = spark.createDataFrame(
            [(1, 77)], "k BIGINT, g INT"
        ).coalesce(1)
        src.merge(up, ["k"], merge_on_read=True)
        export_iceberg_metadata(src)
        drain()
        assert {(r.k, r.g) for r in tgt.read().collect()} == {
            (r.k, r.g) for r in src.read().collect()
        }


class TestScd2StreamingApply:
    def test_cdc_stream_foreachbatch_scd2(self, spark, lake, tmp_path):
        """The streaming STORED AS SCD TYPE 2 shape: a delta_cdc
        readStream piped through foreachBatch
        apply_changes_into(stored_as_scd2=True) builds the same
        history as the one-shot batch apply, across an initial
        snapshot and a later retraction+upsert window."""
        from interop_datalake_spark.lake.delta_interop import (
            export_delta_log,
        )
        from interop_datalake_spark.lake.scd import scd2_snapshot_at
        from interop_datalake_spark.streaming.delta_source import (
            read_delta_cdc_stream,
        )

        src = TxnTable(lake, "s2s_src", stats_cols=["k"])
        src.append(
            spark.range(0, 16)
            .selectExpr("id as k", "cast(id % 2 as int) as g")
            .coalesce(1)
        )
        export_delta_log(src, mode="mirror")
        dim = TxnTable(lake, "s2s_dim", stats_cols=["k"])

        def apply_batch(bdf, epoch_id):
            if bdf.isEmpty():
                return
            apply_changes_into(
                dim, bdf, ["k"], stored_as_scd2=True
            )

        ck = str(tmp_path / "s2s_ck")

        def drain():
            q = (
                read_delta_cdc_stream(spark, str(src.root))
                .writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(180)

        drain()
        src.delete_where(F.col("k") % 4 == 0, merge_on_read=True)
        export_delta_log(src, mode="mirror")
        up = spark.createDataFrame([(1, 55)], "k BIGINT, g INT").coalesce(1)
        src.merge(up, ["k"], merge_on_read=True)
        export_delta_log(src, mode="mirror")
        drain()

        # the streamed history equals the one-shot batch build over
        # the foreign feed (same commit-version sequence)
        from interop_datalake_spark.lake.delta_interop import (
            read_delta_changes,
        )

        dim2 = TxnTable(lake, "s2s_dim2", stats_cols=["k"])
        apply_changes_into(
            dim2,
            read_delta_changes(spark, str(src.root), -1),
            ["k"],
            stored_as_scd2=True,
        )

        def hist(d):
            return sorted(
                (r["k"], r["g"], r["valid_from"], r["valid_to"],
                 r["is_current"])
                for r in d.read().collect()
            )

        assert hist(dim) == hist(dim2)
        # and the history replays the source's own time travel
        # (delta version 0..2 == scd2 snapshot at 0..2)
        for v in range(0, 3):
            from interop_datalake_spark.lake.delta_interop import (
                read_delta,
            )

            assert {
                (r["k"], r["g"])
                for r in scd2_snapshot_at(dim, v).collect()
            } == {
                (r["k"], r["g"])
                for r in read_delta(
                    spark, str(src.root), version=v
                ).collect()
            }, f"version {v}"


class TestPairingFoldInvariance:
    """Property: pair_changelog_updates never changes what the fold
    produces — retagging a delete+insert pair as update images is
    apply-neutral by the priority symmetry (postimage>preimage ≡
    insert>delete). Pure DataFrame check, no table I/O."""

    def test_random_feeds_fold_identically(self, spark):
        import random

        from interop_datalake_spark.lake.cdc_apply import (
            pair_changelog_updates,
        )

        rng = random.Random(13)
        types = ["insert", "delete"]
        for trial in range(6):
            rows = []
            for _ in range(rng.randint(1, 30)):
                rows.append(
                    (
                        rng.randint(0, 5),           # key
                        rng.randint(0, 9),           # value
                        rng.randint(1, 4),           # seq
                        rng.choice(types),           # change type
                    )
                )
            # dedup (key, seq, type): two different values for one
            # slot make the winner arbitrary in BOTH spellings
            rows = list(
                {(k, s, c): (k, v, s, c) for k, v, s, c in rows}
                .values()
            )
            feed = spark.createDataFrame(
                rows,
                "k INT, v INT, _commit_version BIGINT, "
                "_change_type STRING",
            )
            paired = pair_changelog_updates(feed, ["k"])

            def net(df):
                f = fold_changes(df, ["k"])
                return {
                    (
                        r["k"],
                        r["v"],
                        r["_change_type"]
                        in ("insert", "update_postimage"),
                    )
                    for r in f.collect()
                }

            assert net(feed) == net(paired), f"trial {trial}: {rows}"
