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
