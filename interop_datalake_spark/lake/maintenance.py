"""Lake maintenance — small-file compaction.

The reference's one-object-per-resource layout
(``DatalakePublishService.kt:68-76``) makes the small-file problem
intrinsic: a 100 TB bronze zone written that way is billions of tiny
objects, and scan throughput dies on open() overhead. The fix at the
table layer is periodic compaction: rewrite each Hive partition's many
small files into few large ones (Delta ``OPTIMIZE`` when available;
plain parquet rewrite otherwise).

Scale notes: the rewrite is one Spark job — read (partition-pruned if
``partition_filter`` given), ``repartition`` by the partition columns so
each output partition's rows co-locate, write to a staging path, swap.
The repartition-by-partition-columns keeps one task per output
partition writing sequential large files instead of 32 tasks each
writing a sliver into every partition.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from interop_datalake_spark.session import DatalakeSession


def _recover_interrupted_merge(path: str) -> int:
    """Phase 0 of :func:`merge_by_key`: heal a crash that happened
    mid-swap in a previous run. A ``<dir>__pre_merge`` backup whose
    live directory is MISSING marks a swap interrupted between
    backup-rename and stage-rename — restore it (atomic rename back).
    A backup whose live directory exists is post-swap residue — drop
    it. Returns the number of restored partitions."""
    root = Path(path)
    if not root.exists():
        return 0
    restored = 0
    for backup in sorted(root.rglob("*__pre_merge")):
        if not backup.is_dir():
            continue
        real = backup.with_name(backup.name[: -len("__pre_merge")])
        if real.exists():
            shutil.rmtree(backup)  # swap completed; stale residue
        else:
            backup.rename(real)  # swap interrupted; restore pre-merge rows
            restored += 1
    return restored


def merge_by_key(
    session: DatalakeSession,
    table: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
) -> int:
    """Upsert (MERGE) without a transactional table format: rows in
    ``updates`` replace same-key rows; new keys append.

    Crash-safety contract (tests/test_lake_extended.py):

    - phase 1 stages the merged result under ``<table>__merging`` —
      the live table is read, never written, so a crash anywhere in
      the (expensive, distributed) compute+write leaves it untouched;
    - phase 2 swaps each staged partition directory into place with a
      backup-rename / stage-rename pair (two atomic POSIX renames).
      Single-partition upserts — the common tenant/day case — are
      therefore fully atomic; a crash mid-swap of a multi-partition
      batch leaves earlier partitions new, later ones old, with the
      interrupted partition recoverable from its ``__pre_merge``
      backup — and phase 0 of the NEXT merge performs that recovery
      (renames the backup into place when the live dir is missing)
      BEFORE reading the table, so an interrupted partition's
      pre-merge rows are never silently dropped from the recompute.
      Cross-partition atomicity needs a manifest commit — that is
      ``TxnTable.merge`` (lake/txn.py), the transactional twin of
      this function; with Delta/Iceberg available this becomes a real
      ``MERGE INTO`` (same signature).

    Scale notes: the anti join shuffles just the affected partitions'
    data (callers should pre-filter ``updates``'s partition values, and
    the read side prunes on them). Returns rows written.
    """
    spark = session.spark
    path = session.table_path(table)
    _recover_interrupted_merge(path)
    existing = session.read_table(table)
    # restrict the rewrite to partitions the updates touch
    parts = updates.select(*partition_cols).distinct()
    affected = existing.join(F.broadcast(parts), partition_cols, "left_semi")
    kept = affected.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = kept.select(*updates.columns).unionByName(updates)

    # phase 1 — stage (live table untouched; stale staging from a
    # previous crash is discarded first)
    staging = f"{path}__merging"
    if Path(staging).exists():
        shutil.rmtree(staging)
    (
        merged.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .format(session.format)
        .save(staging)
    )
    n = spark.read.format(session.format).load(staging).count()

    # phase 2 — swap staged partition dirs into place
    stage_root, real_root = Path(staging), Path(path)
    pattern = "/".join(["*=*"] * len(partition_cols))
    for staged in sorted(stage_root.glob(pattern)):
        rel = staged.relative_to(stage_root)
        real = real_root / rel
        backup = real.with_name(real.name + "__pre_merge")
        real.parent.mkdir(parents=True, exist_ok=True)
        if backup.exists():
            shutil.rmtree(backup)
        if real.exists():
            real.rename(backup)
        staged.rename(real)
        if backup.exists():
            shutil.rmtree(backup)
    shutil.rmtree(staging, ignore_errors=True)
    return n


def compact_table(
    session: DatalakeSession,
    table: str,
    partition_cols: list[str],
    target_files_per_partition: int = 1,
    partition_filter: str | None = None,
) -> int:
    """Rewrite a lake table with large files; returns rows rewritten.

    Local-filesystem staging swap; on a real object store this becomes
    Delta ``OPTIMIZE`` / Iceberg ``rewrite_data_files`` (transactional).
    """
    path = session.table_path(table)
    df = session.read_table(table)
    if partition_filter:
        df = df.filter(partition_filter)
    n = df.count()
    if n == 0:
        return 0

    writer = df
    if partition_cols:
        salt = (F.abs(F.hash(*[F.col(c) for c in partition_cols])) %
                target_files_per_partition) if target_files_per_partition > 1 else F.lit(0)
        writer = df.withColumn("_bucket", salt).repartition(
            *[F.col(c) for c in partition_cols], F.col("_bucket")
        ).drop("_bucket")
    else:
        writer = df.coalesce(target_files_per_partition)

    if partition_cols:
        # dynamic partition overwrite rewrites ONLY the partitions
        # present in the (possibly filtered) frame — untouched tenants'
        # partitions survive. localCheckpoint materializes the rows
        # before their source files are replaced.
        spark = session.spark
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out = writer.localCheckpoint(eager=True)
            (
                out.write.mode("overwrite")
                .partitionBy(*partition_cols)
                .format(session.format)
                .save(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return n

    # unpartitioned table: full rewrite via staging swap (filesystem
    # only; object stores use table-format commits)
    staging = f"{path}__compacting"
    writer.write.mode("overwrite").format(session.format).save(staging)
    real, stage = Path(path), Path(staging)
    backup = Path(f"{path}__pre_compact")
    real.rename(backup)
    stage.rename(real)
    shutil.rmtree(backup)
    return n
