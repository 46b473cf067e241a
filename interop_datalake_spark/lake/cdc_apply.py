"""APPLY CHANGES INTO — consume a change feed into a keyed state
table (the SCD1 CDC-upsert every streaming-lakehouse stack ships:
Delta Live Tables' APPLY CHANGES, Flink's upsert sink, Iceberg's
upsert mode).

The input is any frame shaped like this repo's change feeds —
``TxnTable.read_changes(include_deletes=True)``,
``read_delta_changes`` (foreign Delta CDF, cdc actions included),
``read_iceberg_changes(include_deletes=True)`` — i.e. data columns +
a change-type column + a monotone sequence column. The fold keeps
ONE event per key (latest sequence wins; within a sequence value
``update_postimage`` > ``insert`` > ``delete`` > ``update_preimage``,
so an update's two images and a same-version delete+reinsert both net
to the surviving row) and applies it in two ACID commits: a keyed
MERGE for the upserts and a keyed DELETE (:meth:`TxnTable.
delete_keys` — a distributed semi-join, never a driver ``isin``
list) for the deletions. Both commits are idempotent for a replayed
batch (the merge re-writes identical values; the delete no-ops), so
a crash between them is repaired by re-applying the same window.

Scale shape: the fold is one shuffle over the CHANGE rows (window by
key), never the state table; the merge and delete both file-prune to
the keys they touch. With ``merge_on_read=True`` (default) neither
moves existing data bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from interop_datalake_spark.lake.txn import TxnTable

#: same-sequence tie-break: an update's postimage beats its preimage,
#: and a delete+reinsert within one version nets to the insert
_CHANGE_PRIORITY = {
    "update_postimage": 3,
    "insert": 2,
    "delete": 1,
    "update_preimage": 0,
}


def fold_changes(
    changes: DataFrame,
    key_cols: list[str],
    sequence_col: str = "_commit_version",
    change_col: str = "_change_type",
) -> DataFrame:
    """The latest event per key: one row per key tuple carrying the
    winning change (data columns + ``change_col``), ready to split
    into upserts and deletes. Unknown change types get NULL priority
    (they lose every same-sequence tie but can still win a key
    outright) — :func:`apply_changes_into` pre-checks and refuses
    them; direct callers of this fold own that check."""
    pri = F.lit(None).cast("int")
    for name, p in _CHANGE_PRIORITY.items():
        pri = F.when(F.col(change_col) == name, F.lit(p)).otherwise(pri)
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(sequence_col), F.desc("_pri")
    )
    folded = (
        changes.withColumn("_pri", pri)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_pri", sequence_col)
    )
    return folded


def apply_changes_into(
    table: TxnTable,
    changes: DataFrame,
    key_cols: list[str],
    sequence_col: str = "_commit_version",
    change_col: str = "_change_type",
    merge_on_read: bool = True,
    stored_as_scd2: bool = False,
) -> int:
    """Fold ``changes`` to its latest event per key and apply into
    ``table``: upserts (insert / update_postimage) MERGE on
    ``key_cols``, deletions remove their keys. Returns the table's
    version after the apply. Extra feed columns that are not table
    columns (``_commit_timestamp``, ``_snapshot_id``,
    ``_change_ordinal``…) are dropped automatically.

    ``stored_as_scd2=True`` is DLT's ``APPLY CHANGES … STORED AS SCD
    TYPE 2``: instead of latest-state, the target keeps the full
    Type-2 version history (valid_from / valid_to / is_current keyed
    off the sequence column) — routed through
    :func:`~interop_datalake_spark.lake.scd.scd2_apply_changes`, see
    its docstring for the validity rules."""
    if stored_as_scd2:
        from interop_datalake_spark.lake.scd import scd2_apply_changes

        v = scd2_apply_changes(
            table, changes, key_cols, sequence_col, change_col
        )
        return table.current_version() if v is None else v
    # the feed plan (a CDF read: log parse + scans + DV joins + the
    # fold's window shuffle) is consumed by FOUR actions below — the
    # type probe, the upsert/delete split counts, the merge, and the
    # keyed delete. Persist the folded frame so the expensive plan
    # runs once, not per action.
    changes = changes.persist()
    try:
        bad = changes.filter(
            ~F.col(change_col).isin(list(_CHANGE_PRIORITY))
        ).limit(1)
        bad_rows = bad.collect()  # materializes the persist too
        if bad_rows:
            raise ValueError(
                f"unknown change type {bad_rows[0][change_col]!r} in "
                f"the feed — implemented: {sorted(_CHANGE_PRIORITY)}"
            )
        folded = fold_changes(
            changes, key_cols, sequence_col, change_col
        )
        meta_cols = [
            c
            for c in (
                "_commit_timestamp", "_snapshot_id", "_change_ordinal"
            )
            if c in folded.columns
        ]
        folded = folded.drop(*meta_cols).persist()
        try:
            upserts = folded.filter(
                F.col(change_col).isin("insert", "update_postimage")
            ).drop(change_col)
            deletes = folded.filter(
                F.col(change_col) == "delete"
            ).select(*key_cols)
            v = table.current_version()
            if upserts.limit(1).count():
                v = table.merge(
                    upserts, key_cols, merge_on_read=merge_on_read
                )
            if deletes.limit(1).count():
                v = table.delete_keys(
                    deletes, key_cols, merge_on_read=merge_on_read
                )
            return v
        finally:
            folded.unpersist()
    finally:
        changes.unpersist()


def pair_changelog_updates(
    changes: DataFrame,
    key_cols: list[str],
    sequence_col: str = "_commit_version",
    change_col: str = "_change_type",
) -> DataFrame:
    """Iceberg's ``create_changelog_view(compute_updates)`` / Delta
    CDF's update-image pairing, as a post-processing step over any
    change feed: when ONE sequence value (snapshot/commit) carries
    both a ``delete`` and an ``insert`` for the same key, the pair IS
    an update — retag them ``update_preimage`` / ``update_postimage``
    so consumers see updates as updates instead of
    delete-then-reinsert. Rows without a counterpart keep their tag.

    Identifier semantics: ``key_cols`` must identify a row within one
    sequence value (Iceberg's identifier-field requirement). A key
    with MULTIPLE inserts or deletes in one sequence value is
    ambiguous — this retags them all rather than guessing pairings,
    which preserves the fold semantics of
    :func:`apply_changes_into`/:func:`~interop_datalake_spark.lake.
    scd.scd2_apply_changes` (their priority rule treats
    postimage-beats-preimage exactly like insert-beats-delete).

    Scale shape: one window shuffle over the change rows, no join
    against any table."""
    w = Window.partitionBy(*key_cols, sequence_col)
    has_del = F.max(
        F.when(F.col(change_col) == "delete", 1).otherwise(0)
    ).over(w)
    has_ins = F.max(
        F.when(F.col(change_col) == "insert", 1).otherwise(0)
    ).over(w)
    retag = (
        F.when(
            (F.col(change_col) == "delete") & (has_ins == 1),
            F.lit("update_preimage"),
        )
        .when(
            (F.col(change_col) == "insert") & (has_del == 1),
            F.lit("update_postimage"),
        )
        .otherwise(F.col(change_col))
    )
    return changes.withColumn(change_col, retag)
