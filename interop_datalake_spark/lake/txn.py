"""Transactional parquet tables via manifest commits — the ACID layer
the plain Hive-layout lake lacks (Delta/Iceberg are not installed in
this environment; ``session.py`` re-probes each round).

This is the table-format design pattern (Delta/Iceberg's core) reduced
to its essentials, Spark-first:

- **data files are written by normal distributed Spark jobs** into
  per-commit unique subdirectories — never modified, never deleted by
  a commit (immutability gives snapshot isolation for free);
- **a commit is one tiny driver-side atomic operation**: write
  manifest ``v{N}.json`` (the complete file list of the new snapshot),
  then atomically replace the ``_latest`` pointer (``os.replace`` on a
  POSIX fs; a conditional PUT / If-None-Match on an object store).
  Readers resolve the pointer once and read an immutable file set, so
  a crash at ANY point before the pointer swap leaves the previous
  snapshot intact and fully readable — including multi-partition
  upserts, which the Hive-layout ``merge_by_key`` can only make
  per-partition atomic.
- **optimistic concurrency**: each manifest records its parent
  version; commit fails (``CommitConflictError``) if ``_latest`` moved
  since the snapshot was resolved — the caller retries on the new
  snapshot. Single-writer per table is the expected deployment (the
  reference's publish pipeline), multi-writer degrades safely.

Scale notes: the manifest holds one entry per data file, not per row —
at 100 TB with 256 MB files that is ~400k entries, a few tens of MB of
JSON read once per query by the driver; Delta/Iceberg shard this with
checkpoint/manifest-list files, and the same sharding drops in here
without changing the commit protocol. File-level min/max stats for
data skipping are recorded per file at append time (currently row
counts; column stats are an additive extension).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame

from interop_datalake_spark.session import DatalakeSession


class CommitConflictError(RuntimeError):
    """The table's latest version moved between snapshot resolution and
    commit — retry against the new snapshot."""


class TxnTable:
    """A manifest-committed parquet table rooted at
    ``session.table_path(name)``."""

    def __init__(
        self,
        session: DatalakeSession,
        name: str,
        stats_cols: list[str] | None = None,
    ):
        """``stats_cols``: columns whose per-file min/max get recorded
        in the manifest at write time — the data-skipping metadata that
        lets :meth:`merge` rewrite only intersecting files. Pick the
        merge key (and natural clustering) columns."""
        self.session = session
        self.spark = session.spark
        self.name = name
        self.stats_cols = list(stats_cols or [])
        self.root = Path(session.table_path(name))
        self._manifest_dir = self.root / "_manifests"
        self._pointer = self.root / "_latest"

    # -- snapshot resolution ------------------------------------------------

    def current_version(self) -> int:
        """Latest committed version; 0 = empty table (no commits)."""
        try:
            return int(self._pointer.read_text().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def _manifest_path(self, version: int) -> Path:
        return self._manifest_dir / f"v{version}.json"

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v == 0:
            return {"version": 0, "parent": None, "files": [], "rows": 0}
        return json.loads(self._manifest_path(v).read_text())

    def files(self, version: int | None = None) -> list[str]:
        """Absolute data-file paths of a snapshot."""
        return [str(self.root / f) for f in self.manifest(version)["files"]]

    def read(
        self,
        version: int | None = None,
        key_range: tuple[str, object, object] | None = None,
    ) -> DataFrame:
        """The snapshot as a DataFrame (time travel via ``version``).
        The resolved file list is immutable: later commits and even
        logical deletes don't disturb this frame (snapshot isolation).

        ``key_range=(col, lo, hi)`` performs manifest-level data
        skipping: files whose recorded [min,max] for ``col`` don't
        intersect [lo, hi] are dropped from the scan BEFORE Spark sees
        them — on a 100 TB table clustered by ``col``, a point read
        opens one file instead of planning over 400k. The residual
        filter still applies (stats prune files, not rows). Stats-less
        files are conservatively kept."""
        from pyspark.sql import functions as F

        m = self.manifest(version)
        fs = m["files"]
        if not fs:
            raise FileNotFoundError(
                f"table {self.name} has no committed data at "
                f"version {version if version is not None else self.current_version()}"
            )
        if key_range is not None:
            col, lo, hi = key_range
            stats = m.get("stats", {})
            fs = [
                f
                for f in fs
                if (rng := stats.get(f, {}).get(col)) is None
                or (rng[0] <= hi and lo <= rng[1])
            ]
            if not fs:
                return (
                    self.spark.read.format(self.session.format)
                    .load([str(self.root / f) for f in m["files"][:1]])
                    .filter(F.lit(False))
                )
        df = self.spark.read.format(self.session.format).load(
            [str(self.root / f) for f in fs]
        )
        if key_range is not None:
            col, lo, hi = key_range
            df = df.filter(F.col(col).between(lo, hi))
        return df

    # -- write path ---------------------------------------------------------

    def _write_data(
        self, df: DataFrame
    ) -> tuple[list[str], int, dict[str, dict]]:
        """Distributed write into a fresh per-commit subdir; returns
        (root-relative file paths, row count, per-file stats). The
        subdir is invisible to readers until a manifest references it.

        Stats are one extra aggregation over the just-written files
        (grouped by ``input_file_name`` — min/max of each stats col +
        row count), the same pass Delta's stats collection makes."""
        from pyspark.sql import functions as F

        commit_dir = f"data/{uuid.uuid4().hex}"
        out = self.root / commit_dir
        df.write.mode("overwrite").format(self.session.format).save(str(out))
        rel_files = sorted(
            str(p.relative_to(self.root))
            for p in out.rglob("*")
            if p.is_file() and not p.name.startswith(("_", "."))
        )
        if not rel_files:
            return [], 0, {}
        back = self.spark.read.format(self.session.format).load(str(out))
        aggs = [F.count(F.lit(1)).alias("_rows")]
        for c in self.stats_cols:
            aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
        per_file = (
            back.withColumn("_file", F.input_file_name())
            .groupBy("_file")
            .agg(*aggs)
            .collect()  # one row per data file — bounded, driver-side
        )
        stats: dict[str, dict] = {}
        rows = 0
        for r in per_file:
            rel = next(
                (f for f in rel_files if r["_file"].endswith(f)), None
            )
            rows += r["_rows"]
            if rel is not None:
                stats[rel] = {
                    "rows": r["_rows"],
                    **{
                        c: [r[f"_min_{c}"], r[f"_max_{c}"]]
                        for c in self.stats_cols
                    },
                }
        return rel_files, rows, stats

    def _commit(
        self,
        base_version: int,
        files: list[str],
        rows: int,
        stats: dict[str, dict] | None = None,
        epoch: int | None = None,
    ) -> int:
        """Atomically publish a new snapshot. Raises CommitConflictError
        if the table advanced past ``base_version``."""
        if self.current_version() != base_version:
            raise CommitConflictError(
                f"table {self.name}: expected v{base_version}, "
                f"found v{self.current_version()}"
            )
        new_version = base_version + 1
        self._manifest_dir.mkdir(parents=True, exist_ok=True)
        manifest = {
            "version": new_version,
            "parent": base_version,
            "files": files,
            "rows": rows,
            "stats": stats or {},
            "epoch": epoch if epoch is not None else self.manifest(base_version).get("epoch"),
        }
        self._manifest_path(new_version).write_text(json.dumps(manifest))
        # the commit point: atomic pointer replace
        tmp = self._pointer.with_suffix(f".tmp-{uuid.uuid4().hex}")
        tmp.write_text(str(new_version))
        os.replace(tmp, self._pointer)
        return new_version

    def append(self, df: DataFrame) -> int:
        """ACID append; returns the new version."""
        base = self.current_version()
        new_files, new_rows, new_stats = self._write_data(df)
        prev = self.manifest(base)
        return self._commit(
            base,
            prev["files"] + new_files,
            prev["rows"] + new_rows,
            {**prev.get("stats", {}), **new_stats},
        )

    def overwrite(self, df: DataFrame) -> int:
        """ACID full replace; returns the new version. Old files stay
        on disk for time travel until :meth:`vacuum`."""
        base = self.current_version()
        new_files, new_rows, new_stats = self._write_data(df)
        return self._commit(base, new_files, new_rows, new_stats)

    def merge(
        self, updates: DataFrame, key_cols: list[str], prune: bool = True
    ) -> int:
        """ACID upsert: update rows matching ``key_cols``, insert the
        rest — atomic across every file in ONE pointer swap (the
        property the Hive-layout merge cannot give).

        File pruning: when the first merge key is a stats column, only
        files whose recorded [min,max] range intersects the updates'
        key range are rewritten; every other file is carried into the
        new manifest BY REFERENCE — zero read, zero write. On a 100 TB
        table clustered by the merge key, a single-tenant upsert
        rewrites one file's worth of data and the commit is still one
        pointer swap. Files without recorded stats are conservatively
        rewritten; ``prune=False`` forces the full rewrite."""
        base = self.current_version()
        if base == 0:
            return self.append(updates)
        prev = self.manifest(base)
        stats = prev.get("stats", {})
        k = key_cols[0]
        touched, carried = list(prev["files"]), []
        if prune and self.stats_cols and k in self.stats_cols:
            from pyspark.sql import functions as F

            row = updates.agg(
                F.min(k).alias("lo"), F.max(k).alias("hi")
            ).collect()[0]
            umin, umax = row["lo"], row["hi"]
            touched, carried = [], []
            for f in prev["files"]:
                rng = stats.get(f, {}).get(k)
                if umin is None:  # empty updates: nothing intersects
                    carried.append(f)
                elif rng is None or (rng[0] <= umax and umin <= rng[1]):
                    touched.append(f)
                else:
                    carried.append(f)
        if not touched:
            new_files, new_rows, new_stats = self._write_data(updates)
        else:
            existing = self.spark.read.format(self.session.format).load(
                [str(self.root / f) for f in touched]
            )
            kept = existing.join(
                updates.select(*key_cols).distinct(), key_cols, "left_anti"
            )
            merged = kept.select(*updates.columns).unionByName(updates)
            new_files, new_rows, new_stats = self._write_data(merged)
        carried_rows = sum(stats.get(f, {}).get("rows", 0) for f in carried)
        if carried and any(f not in stats for f in carried):
            # stats-less carried files: fall back to a count for an
            # accurate manifest row total
            carried_rows = (
                self.spark.read.format(self.session.format)
                .load([str(self.root / f) for f in carried])
                .count()
            )
        return self._commit(
            base,
            carried + new_files,
            carried_rows + new_rows,
            {**{f: stats[f] for f in carried if f in stats}, **new_stats},
        )

    # -- streaming sink -----------------------------------------------------

    def append_epoch(self, batch_df: DataFrame, epoch_id: int) -> bool:
        """Idempotent epoch append — the exactly-once foreachBatch
        contract: Structured Streaming re-delivers the last epoch after
        a crash between sink write and checkpoint commit; recording the
        applied epoch IN the same atomic manifest commit makes the
        replay a no-op. Returns True if the batch was applied."""
        base = self.current_version()
        last = self.manifest(base).get("epoch")
        if last is not None and epoch_id <= last:
            return False
        new_files, new_rows, new_stats = self._write_data(batch_df)
        prev = self.manifest(base)
        self._commit(
            base,
            prev["files"] + new_files,
            prev["rows"] + new_rows,
            {**prev.get("stats", {}), **new_stats},
            epoch=epoch_id,
        )
        return True

    def foreach_batch_writer(self):
        """``writeStream.foreachBatch(table.foreach_batch_writer())`` —
        a transactional, exactly-once streaming sink."""

        def _write(batch_df: DataFrame, epoch_id: int) -> None:
            self.append_epoch(batch_df, epoch_id)

        return _write

    def delete_where(self, condition) -> int:
        """ACID delete: rewrite the snapshot without matching rows."""
        base = self.current_version()
        remaining = self.read(base).filter(~condition)
        new_files, new_rows, new_stats = self._write_data(remaining)
        return self._commit(base, new_files, new_rows, new_stats)

    def compact(self, target_files: int = 1) -> int:
        """Rewrite the snapshot into ``target_files`` files — the
        OPTIMIZE analog, transactional like every other commit."""
        base = self.current_version()
        df = self.read(base).coalesce(target_files)
        new_files, new_rows, new_stats = self._write_data(df)
        return self._commit(base, new_files, new_rows, new_stats)

    # -- maintenance --------------------------------------------------------

    def vacuum(self, keep_versions: int = 1) -> int:
        """Delete data subdirs unreferenced by the newest
        ``keep_versions`` manifests (and drop older manifests).
        Returns the number of removed subdirs. Readers of retained
        versions are unaffected — that is the time-travel grace
        window."""
        latest = self.current_version()
        keep = range(max(1, latest - keep_versions + 1), latest + 1)
        referenced: set[str] = set()
        for v in keep:
            for f in self.manifest(v)["files"]:
                # data/<commit-uuid>/...
                referenced.add("/".join(Path(f).parts[:2]))
        removed = 0
        data_dir = self.root / "data"
        if data_dir.exists():
            for sub in data_dir.iterdir():
                if f"data/{sub.name}" not in referenced:
                    shutil.rmtree(sub)
                    removed += 1
        for mf in self._manifest_dir.glob("v*.json"):
            if int(mf.stem[1:]) not in keep:
                mf.unlink()
        return removed
