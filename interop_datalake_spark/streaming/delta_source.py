"""``readStream`` source over a Delta table's append history — the
``spark.readStream.format("delta")`` analog for FOREIGN ``_delta_log``
tables, built on Spark 4's Python DataSource API (the sibling of
streaming/iceberg_source.py for the other public table format).

Offsets are Delta VERSION numbers (monotone by construction): each
micro-batch covers the commits in ``(start.version, end.version]``
and its input partitions are the data files those commits ADDED with
``dataChange=true`` — one :class:`InputPartition` per file, read on
executors as vectorized Arrow batches (streaming/arrow_yield.py).
Partition values inject from each add's ``partitionValues`` (typed
from Delta's canonical string forms), and every row carries
``_commit_version``. Replays are deterministic: a published commit
json is immutable (delta_interop's own exporter pins this
byte-for-byte).

TWO formats register here: ``delta_appends`` (row feed of appended
data — refuses retractions) and ``delta_cdc`` (the readChangeFeed
stream analog: every commit's CHANGE rows, tagged ``_change_type`` /
``_commit_version`` / ``_commit_timestamp``, with cdc actions
authoritative and file-action derivation otherwise — the same
per-commit semantics as the batch ``read_delta_changes``; deletion
vectors decode executor-side from their descriptors, so the planner
never materializes positions).

``delta_appends`` refusals (an append-only row feed can't express
retractions or silent re-shapes — loudly, at planning time, never a
wrong row):

- a ``remove`` with ``dataChange=true`` (DELETE/UPDATE/MERGE) — use
  the ``delta_cdc`` stream or the batch CDC reader; compaction
  (``dataChange=false`` on both sides) is skipped as pure rewrite;
- an ``add`` carrying a ``deletionVector`` (its rows need a MOR
  anti-join — the ``delta_cdc`` stream performs it positionally);
- a ``metaData`` whose schema carries columns the stream's declared
  one lacks — the delta-spark ``schemaTrackingLocation`` UX, pinned
  by ``tests/test_delta_stream.py::TestEvolutionRestart``: the
  refusal fires BEFORE offsets advance, so a restarted query on the
  same checkpoint re-resolves the widened schema and resumes exactly
  at the evolution commit (pre-evolution files null-fill through the
  schema-on-read subset rule; nothing skips or double-reads). Both
  formats behave the same;
- expired history: a window whose commit json was removed by log
  cleanup (``expire_delta_log``) refuses rather than silently
  skipping its rows;
- protocol/reader features and ``columnMapping`` gate through the
  SAME ``_check_reader_features`` as the batch reader at schema
  time (``columnMapping=name`` is refused here even though the
  batch reader supports it: the executor slices read physical
  parquet directly and would silently NULL logical columns);
- a MID-STREAM table upgrade: an in-window ``protocol`` claiming
  reader features beyond the stream-safe set, or a ``metaData``
  configuration change enabling ``columnMapping``, refuses in
  ``partitions()`` — later physical files would otherwise read as
  wrong/NULL columns with no error.

The planner process of a Python DataSource has no py4j gateway; all
log parsing is the pure-Python replay delta_interop already uses.
"""

from __future__ import annotations

import json
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "delta_appends"


def _typed_pv(s: str | None, dt_simple: str):
    """A Delta partitionValues string in its canonical serialization →
    the Python value ``arrow_yield`` can type as the declared arrow
    scalar."""
    if s is None:
        return None
    if dt_simple in ("int", "bigint", "smallint", "tinyint"):
        return int(s)
    if dt_simple in ("float", "double"):
        return float(s)
    if dt_simple == "boolean":
        return s == "true"
    if dt_simple == "date":
        return date.fromisoformat(s)
    if dt_simple.startswith("decimal"):
        return Decimal(s)
    if dt_simple.startswith("timestamp"):
        return datetime.fromisoformat(s)
    return s


def _schema_fingerprint(schema_string: str) -> list:
    """(name, canonical-type-json) pairs — the type is re-serialized
    because nested types are DICTS (unhashable in the subset check,
    and key order varies by writer)."""
    st = json.loads(schema_string)
    return [
        (f["name"], json.dumps(f["type"], sort_keys=True))
        for f in st["fields"]
    ]


#: reader features an in-window protocol upgrade may claim without
#: changing how this stream reads physical parquet. columnMapping is
#: NOT here (the executor slice reads physical column names directly);
#: deletionVectors IS — enabling the feature is harmless because any
#: add that actually carries a vector refuses individually below.
_STREAM_SAFE_READER_FEATURES = {
    "timestampNtz",
    "vacuumProtocolCheck",
    "deletionVectors",
    "v2Checkpoint",
}


class _DeltaSlice(InputPartition):
    def __init__(self, path, version, part_values):
        self.path = path
        self.version = version
        self.part_values = part_values  # {col: typed python value}


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        root: str,
        schema,
        start_version: int,
        schema_string: str,
        partition_cols: list[str],
        max_versions_per_trigger: int | None = None,
    ):
        from interop_datalake_spark.streaming.pacing import Pacer

        self.root = Path(root)
        self.schema_struct = schema  # declared StructType (picklable)
        self.start_version = start_version
        self.fingerprint = _schema_fingerprint(schema_string)
        self.partition_cols = partition_cols
        self.ptypes = {
            f["name"]: (
                f["type"] if isinstance(f["type"], str) else "string"
            )
            for f in json.loads(schema_string)["fields"]
            if f["name"] in partition_cols
        }
        #: rate limit — every micro-batch (the opener of a fresh or
        #: restarted run included) spans at most this many commits;
        #: streaming/pacing.py documents the measured call order
        #: that seeds the base on both run shapes
        self.max_versions_per_trigger = max_versions_per_trigger
        self._pacer = Pacer(start_version)
        #: listing floor: the highest commit version known to exist.
        #: Seeded by ONE glob, then advanced by O(new commits)
        #: exists() probes per trigger — latestOffset stops listing
        #: the entire _delta_log every micro-batch (commit jsons are
        #: written contiguously by version, so probing head+1, head+2,
        #: … finds every new commit)
        self._head: int | None = None

    def initialOffset(self) -> dict:
        self._pacer.note(self.start_version)
        return {"version": self.start_version}

    def _latest_version(self) -> int:
        log = self.root / "_delta_log"
        if self._head is None:
            versions = [
                int(p.stem)
                for p in log.glob("*.json")
                if p.stem.isdigit()
            ]
            self._head = max(versions) if versions else self.start_version
        v = self._head + 1
        while (log / f"{v:020d}.json").exists():
            self._head = v
            v += 1
        return self._head

    def latestOffset(self) -> dict:
        n = self.max_versions_per_trigger
        return {
            "version": self._pacer.advance(
                self._latest_version(),
                None if n is None else (lambda base: base + n),
            )
        }

    def commit(self, end: dict) -> None:
        pass  # commit jsons are immutable; Spark checkpoints progress

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # restart replay reveals the checkpointed base BEFORE the
        # first latestOffset (measured — streaming/pacing.py)
        self._pacer.note(end["version"])
        log = self.root / "_delta_log"
        slices: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            p = log / f"{v:020d}.json"
            try:
                text = p.read_text()
            except FileNotFoundError:
                raise ValueError(
                    f"commit json for version {v} is gone — history "
                    f"was expired by log cleanup; restart the stream "
                    f"with starting_after_version at or past the "
                    f"oldest retained commit"
                )
            for line in text.splitlines():
                if not line.strip():
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    # a mid-stream table upgrade (e.g. enabling
                    # columnMapping) changes how later physical files
                    # must be read — refuse like the batch reader's
                    # schema-time gate instead of NULLing columns
                    feats = (
                        set(action["protocol"].get("readerFeatures")
                            or [])
                        - _STREAM_SAFE_READER_FEATURES
                    )
                    if feats:
                        raise ValueError(
                            f"version {v} upgrades the table to "
                            f"reader features {sorted(feats)} this "
                            f"streaming source does not implement — "
                            f"read the table with the batch reader"
                        )
                elif "metaData" in action:
                    md = action["metaData"]
                    mode = (md.get("configuration") or {}).get(
                        "delta.columnMapping.mode"
                    )
                    if mode and mode != "none":
                        raise ValueError(
                            f"version {v} sets delta.columnMapping."
                            f"mode={mode!r} mid-stream — the executor "
                            f"slices read physical parquet directly "
                            f"and would silently NULL logical "
                            f"columns; use the batch reader"
                        )
                    # HISTORICAL schemas (older, fewer columns) are
                    # safe — their files null-fill through the
                    # schema-on-read rule. Refuse only when a window
                    # metaData carries (name, type) pairs the DECLARED
                    # schema lacks: the table evolved after this
                    # stream resolved its schema, and emitting those
                    # files would silently drop or re-type columns.
                    fp = _schema_fingerprint(md["schemaString"])
                    extra = set(fp) - set(self.fingerprint)
                    if extra:
                        raise ValueError(
                            f"table schema changed at version {v} "
                            f"(new/retyped columns "
                            f"{sorted(n for n, _ in extra)}) — "
                            f"restart the stream to pick up the new "
                            f"schema"
                        )
                elif "remove" in action:
                    if action["remove"].get("dataChange", True):
                        raise ValueError(
                            f"version {v} removes data "
                            f"({unquote(action['remove']['path'])}) — "
                            f"a streaming append feed cannot express "
                            f"retractions; use the delta_cdc stream "
                            f"(read_delta_cdc_stream) or the batch "
                            f"CDC reader (read_delta_changes)"
                        )
                elif "add" in action:
                    a = action["add"]
                    if not a.get("dataChange", True):
                        continue  # compaction rewrite: no new rows
                    if a.get("deletionVector"):
                        raise ValueError(
                            f"version {v} adds a deletion-vectored "
                            f"file — its rows need a MOR anti-join; "
                            f"use the delta_cdc stream or the batch "
                            f"reader"
                        )
                    pv = a.get("partitionValues") or {}
                    typed = {
                        c: _typed_pv(pv.get(c), self.ptypes.get(c, ""))
                        for c in self.partition_cols
                    }
                    slices.append(
                        _DeltaSlice(
                            str(self.root / unquote(a["path"])),
                            v,
                            typed,
                        )
                    )
        return slices

    def read(self, partition: _DeltaSlice):
        from interop_datalake_spark.streaming.arrow_yield import (
            arrow_batches,
        )

        yield from arrow_batches(
            partition.path,
            self.schema_struct,
            {
                **partition.part_values,
                "_commit_version": partition.version,
            },
        )


class DeltaAppendsDataSource(DataSource):
    """``spark.readStream.format("delta_appends").option("path",
    <table root>)`` — register with :func:`register_delta_source`.
    Schema = the log's current logical schema (partition columns
    included — they inject from add actions) +
    ``_commit_version bigint``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _meta(self):
        from interop_datalake_spark.lake.delta_interop import (
            _replay_log,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError(
                "delta_appends source requires "
                ".option('path', <table root>)"
            )
        meta, _ = _replay_log(path, None)
        mode = (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode"
        )
        if mode and mode != "none":
            raise ValueError(
                f"delta.columnMapping.mode={mode!r}: the streaming "
                f"source reads physical parquet directly and would "
                f"silently NULL logical columns; read mapped tables "
                f"with the batch reader (read_delta)"
            )
        return meta

    def schema(self) -> str:
        from pyspark.sql.types import StructType

        meta = self._meta()
        st = StructType.fromJson(json.loads(meta["schemaString"]))
        parts = [
            f"`{f.name}` {f.dataType.simpleString()}" for f in st.fields
        ]
        parts.append("`_commit_version` bigint")
        return ", ".join(parts)

    def streamReader(self, schema) -> DeltaStreamReader:
        meta = self._meta()
        mvpt = self.options.get("max_versions_per_trigger")
        return DeltaStreamReader(
            str(self.options["path"]),
            schema,
            int(self.options.get("starting_after_version", -1)),
            meta["schemaString"],
            list(meta.get("partitionColumns") or []),
            int(mvpt) if mvpt is not None else None,
        )


CDC_FORMAT_NAME = "delta_cdc"


class _CdcSlice(InputPartition):
    """One unit of change data: a whole file tagged with a constant
    change type (or a cdc file whose rows carry their own), or a
    deletion-vector POSITION DIFF of one file (the DV-update commit
    shape) — vectors decode on the EXECUTOR from their descriptors,
    so the planner never materializes positions."""

    def __init__(
        self, root, path, version, ts_ms, part_values,
        ctype=None, drop_desc=None, old_desc=None, new_desc=None,
    ):
        self.root = root
        self.path = path
        self.version = version
        self.ts_ms = ts_ms
        self.part_values = part_values
        self.ctype = ctype          # None → cdc file carries its own
        self.drop_desc = drop_desc  # DV to EXCLUDE (live rows only)
        self.old_desc = old_desc    # diff mode: positions(new−old)
        self.new_desc = new_desc    # (ctype=delete) / old−new (insert)


class DeltaCdcStreamReader(DataSourceStreamReader):
    """CDC micro-batches over a Delta log: each commit window emits
    its change rows per the SAME per-commit semantics as the batch
    :func:`~interop_datalake_spark.lake.delta_interop.
    read_delta_changes` — cdc actions authoritative, else derived
    from file actions (full-file insert/delete, DV position diffs).
    This LIFTS the delta_appends source's retraction refusal: a
    DELETE/UPDATE/MERGE commit streams as its delete/insert rows
    instead of refusing."""

    # offset/pacing machinery is identical to the appends reader —
    # __init__ included (same signature, same attributes)
    __init__ = DeltaStreamReader.__init__
    initialOffset = DeltaStreamReader.initialOffset
    _latest_version = DeltaStreamReader._latest_version
    latestOffset = DeltaStreamReader.latestOffset
    commit = DeltaStreamReader.commit

    def _typed(self, pv: dict | None) -> dict:
        pv = pv or {}
        return {
            c: _typed_pv(pv.get(c), self.ptypes.get(c, ""))
            for c in self.partition_cols
        }

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # the SAME per-commit parse as read_delta_changes — batch and
        # streaming CDC must never drift on identical commits
        from interop_datalake_spark.lake.delta_interop import (
            parse_cdc_commit,
        )

        # restart replay reveals the checkpointed base BEFORE the
        # first latestOffset (measured — streaming/pacing.py)
        self._pacer.note(end["version"])
        log = self.root / "_delta_log"
        slices: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            p = log / f"{v:020d}.json"
            try:
                text = p.read_text()
            except FileNotFoundError:
                raise ValueError(
                    f"commit json for version {v} is gone — history "
                    f"was expired by log cleanup; restart the stream "
                    f"with starting_after_version at or past the "
                    f"oldest retained commit"
                )
            parsed = parse_cdc_commit(text)
            for proto in parsed["protocols"]:
                feats = (
                    set(proto.get("readerFeatures") or [])
                    - _STREAM_SAFE_READER_FEATURES
                )
                if feats:
                    raise ValueError(
                        f"version {v} upgrades the table to reader "
                        f"features {sorted(feats)} this streaming "
                        f"source does not implement"
                    )
            for md in parsed["metas"]:
                mode = (md.get("configuration") or {}).get(
                    "delta.columnMapping.mode"
                )
                if mode and mode != "none":
                    raise ValueError(
                        f"version {v} sets delta.columnMapping."
                        f"mode={mode!r} mid-stream; use the "
                        f"batch reader"
                    )
                extra = set(
                    _schema_fingerprint(md["schemaString"])
                ) - set(self.fingerprint)
                if extra:
                    raise ValueError(
                        f"table schema changed at version {v} "
                        f"(new/retyped columns "
                        f"{sorted(n for n, _ in extra)}) — "
                        f"restart the stream to pick up the new "
                        f"schema"
                    )
            cdc, adds, removes = (
                parsed["cdc"], parsed["adds"], parsed["removes"],
            )
            ts_ms = parsed["ts_ms"]
            if ts_ms is None:
                ts_ms = int(p.stat().st_mtime * 1000)
            if cdc:
                slices += [
                    _CdcSlice(
                        str(self.root),
                        str(self.root / unquote(c["path"])),
                        v, ts_ms,
                        self._typed(c.get("partitionValues")),
                    )
                    for c in cdc
                ]
                continue
            paired = set(adds) & set(removes)
            for f, a in adds.items():
                if f in paired:
                    continue
                slices.append(_CdcSlice(
                    str(self.root), str(self.root / f), v, ts_ms,
                    self._typed(a.get("partitionValues")),
                    ctype="insert", drop_desc=a.get("deletionVector"),
                ))
            for f, r in removes.items():
                if f in paired:
                    continue
                pv = r.get("partitionValues")
                if self.partition_cols and pv is None:
                    raise ValueError(
                        f"remove action for {f} at version {v} "
                        f"records no partitionValues on a partitioned "
                        f"table — its deleted rows' partition columns "
                        f"cannot be reconstructed"
                    )
                slices.append(_CdcSlice(
                    str(self.root), str(self.root / f), v, ts_ms,
                    self._typed(pv),
                    ctype="delete", drop_desc=r.get("deletionVector"),
                ))
            for f in paired:
                old_desc = removes[f].get("deletionVector")
                new_desc = adds[f].get("deletionVector")
                if old_desc is None and new_desc is None:
                    # remove+add of the same file with no vectors on
                    # either side: the position diff is empty, so the
                    # commit changed no rows of this file. The batch
                    # reader (read_delta_changes) emits nothing here;
                    # without this skip the slices below would fall
                    # through read()'s ctype branch and emit the whole
                    # file as delete+insert — batch/stream drift.
                    continue
                common = dict(
                    root=str(self.root),
                    path=str(self.root / f),
                    version=v,
                    ts_ms=ts_ms,
                    part_values=self._typed(
                        adds[f].get("partitionValues")
                    ),
                    old_desc=old_desc,
                    new_desc=new_desc,
                )
                slices.append(_CdcSlice(**common, ctype="delete"))
                slices.append(_CdcSlice(**common, ctype="insert"))
        return slices

    def read(self, partition: _CdcSlice):
        from datetime import datetime, timezone

        from interop_datalake_spark.streaming.arrow_yield import (
            arrow_batches,
        )

        s = partition
        constants = {
            **s.part_values,
            "_commit_version": s.version,
            "_commit_timestamp": datetime.fromtimestamp(
                s.ts_ms / 1000, tz=timezone.utc
            ),
        }
        keep = drop = None
        if s.old_desc is not None or s.new_desc is not None:
            # DV position diff, decoded HERE on the executor
            import numpy as np

            from interop_datalake_spark.lake.delta_dv import (
                load_dv_row_indexes,
            )

            def pos(d):
                return np.asarray(
                    load_dv_row_indexes(s.root, d) if d else [],
                    dtype=np.int64,
                )

            old, new = pos(s.old_desc), pos(s.new_desc)
            keep = (
                np.setdiff1d(new, old)
                if s.ctype == "delete"
                else np.setdiff1d(old, new)
            )
            if len(keep) == 0:
                return
        elif s.drop_desc is not None:
            from interop_datalake_spark.lake.delta_dv import (
                load_dv_row_indexes,
            )

            drop = load_dv_row_indexes(s.root, s.drop_desc)
        if s.ctype is not None:
            constants["_change_type"] = s.ctype
        yield from arrow_batches(
            s.path,
            self.schema_struct,
            constants,
            keep_positions=keep,
            drop_positions=drop,
        )


class DeltaCdcDataSource(DataSource):
    """``spark.readStream.format("delta_cdc").option("path", <table
    root>)`` — register with :func:`register_delta_source`. Schema =
    the log's current logical schema + ``_change_type string`` +
    ``_commit_version bigint`` + ``_commit_timestamp timestamp``."""

    @classmethod
    def name(cls) -> str:
        return CDC_FORMAT_NAME

    _meta = DeltaAppendsDataSource._meta

    def schema(self) -> str:
        from pyspark.sql.types import StructType

        meta = self._meta()
        st = StructType.fromJson(json.loads(meta["schemaString"]))
        parts = [
            f"`{f.name}` {f.dataType.simpleString()}" for f in st.fields
        ]
        parts += [
            "`_change_type` string",
            "`_commit_version` bigint",
            "`_commit_timestamp` timestamp",
        ]
        return ", ".join(parts)

    def streamReader(self, schema) -> DeltaCdcStreamReader:
        meta = self._meta()
        mvpt = self.options.get("max_versions_per_trigger")
        return DeltaCdcStreamReader(
            str(self.options["path"]),
            schema,
            int(self.options.get("starting_after_version", -1)),
            meta["schemaString"],
            list(meta.get("partitionColumns") or []),
            int(mvpt) if mvpt is not None else None,
        )


def register_delta_source(spark) -> None:
    """Idempotently register the ``delta_appends`` + ``delta_cdc``
    streaming formats."""
    spark.dataSource.register(DeltaAppendsDataSource)
    spark.dataSource.register(DeltaCdcDataSource)


def _delta_stream_reader(
    spark,
    fmt: str,
    path: str,
    starting_after_version: int,
    max_versions_per_trigger: int | None,
):
    register_delta_source(spark)
    reader = (
        spark.readStream.format(fmt)
        .option("path", path)
        .option("starting_after_version", starting_after_version)
    )
    if max_versions_per_trigger is not None:
        reader = reader.option(
            "max_versions_per_trigger", max_versions_per_trigger
        )
    return reader.load()


def read_delta_stream(
    spark,
    path: str,
    starting_after_version: int = -1,
    max_versions_per_trigger: int | None = None,
):
    """Convenience: a streaming DataFrame tailing the append history
    of the Delta table at ``path``, starting after the given version
    (-1 = from version 0, i.e. the initial snapshot is the first
    micro-batch — Delta's own ``startingVersion=0`` shape).
    ``max_versions_per_trigger`` (delta-spark's ``maxFilesPerTrigger``
    analog, at per-commit granularity) bounds EVERY micro-batch —
    catch-up over a long history drains in bounded hops instead of one
    giant batch; use a processing-time trigger for throttled catch-up
    (streaming/pacing.py)."""
    return _delta_stream_reader(
        spark, FORMAT_NAME, path, starting_after_version,
        max_versions_per_trigger,
    )


def read_delta_cdc_stream(
    spark,
    path: str,
    starting_after_version: int = -1,
    max_versions_per_trigger: int | None = None,
):
    """Convenience: a CDC streaming DataFrame over the Delta table at
    ``path`` — delta-spark's ``readChangeFeed`` stream analog. Unlike
    :func:`read_delta_stream`, retraction commits (DELETE / UPDATE /
    MERGE, with or without cdc actions) stream as tagged
    ``_change_type`` rows instead of refusing.
    ``max_versions_per_trigger`` bounds every micro-batch's commit
    span, exactly as in :func:`read_delta_stream`."""
    return _delta_stream_reader(
        spark, CDC_FORMAT_NAME, path, starting_after_version,
        max_versions_per_trigger,
    )
