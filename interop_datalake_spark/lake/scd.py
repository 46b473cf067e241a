"""SCD Type-2 dimension history over TxnTable — the lakehouse pattern
for "what did this dimension row look like on date X".

History layout (Kimball SCD2): the table carries the business key, the
tracked attributes, and ``valid_from`` / ``valid_to`` / ``is_current``.
A batch of updates closes the current version of every key whose
tracked attributes changed (``valid_to`` = batch timestamp) and
inserts the new version as current; unchanged keys are untouched;
unseen keys insert their first version. The whole batch is ONE atomic
TxnTable MERGE keyed on (business key, valid_from): closed rows match
an existing (key, valid_from) pair and update in place, new versions
have a fresh valid_from and insert — so a crash can never leave a key
with zero (or two) current rows.

Scale shape: the change detection is a LEFT join of the (small) update
batch against only the ``is_current`` slice of the dimension —
update-batch-sized, broadcastable; the history's closed rows are never
scanned. The merge itself file-prunes on the merge key like any
TxnTable merge, and history grows strictly by appended versions.

Reference analog: the publish path's tenant upsert
(DatalakePublishService.kt:50-90) overwrites in place — this is the
same ingest trigger keeping full attribute history instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from interop_datalake_spark.lake.txn import TxnTable

_META = ("valid_from", "valid_to", "is_current")


def _as_history(updates: DataFrame, ts_col: str) -> DataFrame:
    """Shape a raw update batch as new current-version rows."""
    return (
        updates.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lit(None).cast(updates.schema[ts_col].dataType))
        .withColumn("is_current", F.lit(True))
        .drop(ts_col)
    )


def scd2_apply(
    table: TxnTable,
    updates: DataFrame,
    key_cols: list[str],
    change_cols: list[str],
    ts_col: str = "effective_ts",
) -> int | None:
    """Apply one SCD2 batch; returns the committed version, or None if
    the batch was a complete no-op (no commit is written — idempotent
    re-delivery of an already-applied batch leaves no trace).

    ``updates`` carries key_cols + change_cols + ts_col. If a batch
    contains several rows per key, only the LATEST by ts_col (ties:
    arbitrary but deterministic per the sort) is applied — the
    intermediate flickers within one batch are not history.

    Change detection is null-safe (NULL → value and value → NULL both
    count as changes; NULL → NULL does not), via ``eqNullSafe``.
    """
    cols = list(key_cols) + list(change_cols) + [ts_col]
    u = updates.select(*cols)
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    u = (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    if table.current_version() == 0:
        return table.append(_as_history(u, ts_col))

    cur = table.read().filter(F.col("is_current"))
    same = None
    for c in change_cols:
        eq = F.col(f"u.{c}").eqNullSafe(F.col(f"c.{c}"))
        same = eq if same is None else (same & eq)

    joined = u.alias("u").join(
        cur.alias("c"),
        [F.col(f"u.{k}") == F.col(f"c.{k}") for k in key_cols],
        "left",
    )
    # keys whose current version differs, or which have no version yet
    fresh = joined.filter(
        F.col(f"c.{key_cols[0]}").isNull() | ~same
    ).localCheckpoint(eager=False)

    new_rows = _as_history(
        fresh.select(*[F.col(f"u.{c}") for c in cols]), ts_col
    )
    closed = (
        fresh.filter(F.col(f"c.{key_cols[0]}").isNotNull())
        .select(
            *[F.col(f"c.{k}").alias(k) for k in key_cols],
            *[F.col(f"c.{c}").alias(c) for c in change_cols],
            F.col("c.valid_from").alias("valid_from"),
            F.col(f"u.{ts_col}").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    delta = closed.unionByName(new_rows.select(*closed.columns))
    if not delta.take(1):  # complete no-op batch: do not write a commit
        return None
    return table.merge(delta, key_cols=list(key_cols) + ["valid_from"])


def scd2_snapshot_at(table: TxnTable, ts) -> DataFrame:
    """The dimension as of timestamp ``ts``: rows whose validity
    interval covers it (valid_from <= ts < valid_to, open current
    rows included). A point-in-time read over HISTORY — distinct from
    TxnTable time travel, which reads past COMMITS."""
    t = F.lit(ts)
    return table.read().filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def scd2_apply_changes(
    table: TxnTable,
    changes: DataFrame,
    key_cols: list[str],
    sequence_col: str = "_commit_version",
    change_col: str = "_change_type",
) -> int | None:
    """APPLY CHANGES … STORED AS SCD TYPE 2 (the DLT spelling): fold
    a change feed — the same shape :func:`~interop_datalake_spark.
    lake.cdc_apply.apply_changes_into` consumes — into a Type-2
    HISTORY table instead of latest-state, so every version a key
    passed through stays queryable (:func:`scd2_snapshot_at` over the
    sequence values replays the source's own time travel).

    Validity comes from the sequencing column (DLT's ``__START_AT`` /
    ``__END_AT`` rule): each surviving insert/update_postimage event
    opens a version at its sequence value, closed by the key's NEXT
    event (delete events close their predecessor without opening
    anything — a deleted key has no covering row until re-inserted).
    Within one sequence value the same tie-break as the SCD1 fold
    applies (postimage > insert > delete > preimage). Pre-existing
    current rows for keys whose first feed event lands later are
    closed at that first event.

    One atomic TxnTable MERGE keyed on (key, valid_from) — the
    invariant :func:`scd2_apply` established: a replayed feed
    rewrites identical version rows and re-closes the same rows, so
    crash-replay and at-least-once delivery are idempotent. Returns
    the committed version, or None for an empty feed.

    Ordering contract (DLT's sequencing rule): windows must be
    applied in sequence order. Replaying the LATEST window (the
    foreachBatch crash-recovery shape) or the FULL feed is idempotent
    — both rewrite the identical history — but applying a strictly
    OLDER partial window after a newer one would re-open its last
    event as current (the old window cannot know about the closures
    that followed); out-of-order late events need the full feed
    re-applied.

    Scale shape: TWO window shuffles over the CHANGE rows only
    (the per-sequence tie-break, then the per-key lead/last), one
    update-batch-sized join against the table's ``is_current`` slice,
    and a key-pruned merge — the history's closed rows are never
    scanned."""
    from interop_datalake_spark.lake.cdc_apply import _CHANGE_PRIORITY

    # the feed plan is consumed three times below (the type check,
    # the versions chain, the per-key firsts) and a fourth by the
    # merge — persist it once, like apply_changes_into does
    changes = changes.persist()
    try:
        return _scd2_apply_persisted(
            table, changes, key_cols, sequence_col, change_col
        )
    finally:
        changes.unpersist()


def _scd2_apply_persisted(
    table: TxnTable,
    changes: DataFrame,
    key_cols: list[str],
    sequence_col: str,
    change_col: str,
) -> int | None:
    from interop_datalake_spark.lake.cdc_apply import _CHANGE_PRIORITY

    bad = changes.filter(
        ~F.col(change_col).isin(list(_CHANGE_PRIORITY))
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"unknown change type {bad[0][change_col]!r} in the "
            f"feed — implemented: {sorted(_CHANGE_PRIORITY)}"
        )
    drop_meta = [
        c
        for c in ("_commit_timestamp", "_snapshot_id", "_change_ordinal")
        if c in changes.columns
    ]
    changes = changes.drop(*drop_meta)
    data_cols = [
        c
        for c in changes.columns
        if c not in key_cols and c not in (sequence_col, change_col)
    ]

    pri = F.lit(None).cast("int")
    for name, p in _CHANGE_PRIORITY.items():
        pri = F.when(F.col(change_col) == name, F.lit(p)).otherwise(pri)
    w_seq = Window.partitionBy(*key_cols, sequence_col).orderBy(
        F.desc("_pri")
    )
    ev = (
        changes.withColumn("_pri", pri)
        .withColumn("_rn", F.row_number().over(w_seq))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_pri")
    )
    w_key = Window.partitionBy(*key_cols).orderBy(F.asc(sequence_col))
    ev = ev.withColumn("_next_seq", F.lead(sequence_col).over(w_key))
    versions = ev.filter(
        F.col(change_col).isin("insert", "update_postimage")
    ).select(
        *key_cols,
        *data_cols,
        F.col(sequence_col).alias("valid_from"),
        F.col("_next_seq").alias("valid_to"),
        F.col("_next_seq").isNull().alias("is_current"),
    )

    if table.current_version() == 0:
        if not versions.take(1):
            return None
        return table.append(versions)

    firsts = ev.groupBy(*key_cols).agg(
        F.min(sequence_col).alias("_first_seq")
    )
    cur = table.read().filter(F.col("is_current"))
    closed = (
        cur.join(firsts, list(key_cols))
        .filter(F.col("valid_from") < F.col("_first_seq"))
        .select(
            *key_cols,
            *data_cols,
            F.col("valid_from"),
            F.col("_first_seq").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    delta = versions.unionByName(closed.select(*versions.columns))
    if not delta.take(1):
        return None
    return table.merge(delta, key_cols=list(key_cols) + ["valid_from"])
