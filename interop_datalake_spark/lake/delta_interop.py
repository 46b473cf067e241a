"""Delta Lake transaction-log interop for TxnTable snapshots.

The north star names "Spark SQL + Delta/Iceberg" as the storage
pattern; ``lake/txn.py`` is this repo's from-scratch ACID format
because the delta-spark package is absent from the environment. This
module keeps the interop promise WITHOUT that package, both ways,
using only the PUBLIC Delta transaction-log protocol
(delta-io/delta PROTOCOL.md — newline-delimited JSON actions:
``protocol`` / ``metaData`` / ``add`` / ``remove``):

- :func:`export_delta_log` writes a ``_delta_log`` into a TxnTable's
  root, making the root directly readable as a Delta table by any
  Delta-aware engine (delta-spark, Trino, DuckDB's delta extension,
  polars…) the moment one is pointed at it. Schema, partition
  columns, per-file partition values, and per-file stats
  (numRecords / minValues / maxValues — the data-skipping metadata)
  all carry over.
- :func:`read_delta` is a minimal, self-contained Delta LOG READER:
  it replays the JSON commits (add/remove actions keyed by path,
  last metaData wins) from the newest usable parquet CHECKPOINT —
  single- or multi-part, the layout every long-lived Delta table has
  after log cleanup — supports ``VERSION AS OF`` time travel and
  manifest-level data skipping, and reconstructs the frame with
  per-file partition-value injection — so this engine can consume
  tables Delta writers publish, again without delta-spark.

Both directions are pinned by a roundtrip test plus a reader test
over a hand-written multi-commit log (the reader is NOT validated
only against our own exporter). Deletion vectors are supported BOTH
ways via :mod:`.delta_dv`: the reader decodes ``deletionVector``
adds (merge-on-read position anti-join — the default-on shape
modern Delta writers produce) and the exporter re-encodes TxnTable
vectors as packed Delta DV files, including the mirror-mode
DV-update commit shape. Honest limitations, refused loudly: the
reader rejects truncated logs with no usable checkpoint. Vector
decode on the READ side scales past the driver bound by shipping
descriptor rows to executors (mapInPandas); the EXPORT side stays
driver-bounded (packing is a single-writer step) and names
``compact()`` as the cure.

Reference parity: the reference publishes parquet for downstream
engines to consume in place (DatalakeRetrieveService.kt:18-39);
exporting the public log format is the 100 TB version of that
contract — consumers bring their own engine.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from pathlib import Path
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from interop_datalake_spark.lake.txn import TxnTable

#: Hive's directory token for a NULL partition value; Delta's
#: partitionValues map uses JSON null instead
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


_MIRROR_MARKER = ".txn_mirror.json"  # dot-prefixed: log readers skip it


def _validate_exportable(
    table: TxnTable, m: dict, files: list[str]
) -> None:
    """The refuse-loudly gate both export modes share: pre-spec
    ``files`` (partition values in the data, not the manifest) would
    export empty partitionValues that readers NULL; ``compact()``
    cures it. Deletion vectors are NOT a refusal any more — the
    export re-encodes TxnTable vectors as Delta DVs (see
    :func:`_export_dv_descriptors`)."""
    if m.get("schema") is None:
        raise ValueError(
            f"table {table.name}: no log schema recorded; Delta "
            f"metaData requires schemaString"
        )
    pcols = m.get("partition_cols") or []
    parts_map = m.get("partitions", {})
    if pcols:
        uncovered = [
            f
            for f in files
            if any(c not in (parts_map.get(f) or {}) for c in pcols)
        ]
        if uncovered:
            raise ValueError(
                f"table {table.name}: {len(uncovered)} file(s) predate "
                f"the current partition spec (their partition values "
                f"live in the data, not the manifest) — an export "
                f"would record empty partitionValues and Delta "
                f"readers would NULL the column for those rows; run "
                f"compact() to rewrite under the current spec first"
            )


def _ict_configuration(
    ict: bool, enablement: dict | None = None
) -> dict:
    """The table-property keys the inCommitTimestamp writer feature
    requires in ``metaData.configuration`` (Delta PROTOCOL.md,
    In-Commit Timestamps): the enablement flag, plus — when the
    feature was turned on AFTER table creation — the provenance pair
    naming the first ICT-stamped version and its timestamp, which
    compliant engines use to know where mtime-based history ends and
    ICT-based history begins."""
    if not ict:
        return {}
    conf = {"delta.enableInCommitTimestamps": "true"}
    if enablement:
        conf["delta.inCommitTimestampEnablementVersion"] = str(
            enablement["version"]
        )
        conf["delta.inCommitTimestampEnablementTimestamp"] = str(
            enablement["timestamp"]
        )
    return conf


def _meta_action(
    m: dict,
    now_ms: int,
    table_id: str,
    cdf: bool = False,
    extra_conf: dict | None = None,
) -> dict:
    # metaData.id is the table's STABLE unique identifier (Delta
    # PROTOCOL.md) — external engines key snapshot caches and
    # streaming-source identity on it, so a mirrored schema evolution
    # must re-emit the SAME id, never a fresh uuid (round-8 review 4)
    conf = {"delta.enableChangeDataFeed": "true"} if cdf else {}
    conf.update(extra_conf or {})
    return {
        "metaData": {
            "id": table_id,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": m["schema"],
            "partitionColumns": m.get("partition_cols") or [],
            "configuration": conf,
            "createdTime": now_ms,
        }
    }


def _protocol_action(
    dv: bool,
    cdf: bool,
    v2c: bool = False,
    ict: bool = False,
    rt: bool = False,
) -> dict:
    """The protocol a snapshot/commit must claim: vector-free tables
    stay maximally consumable (1/2, or 1/4 — the legacy CDF writer
    version — when change data is recorded); vectored tables claim
    3/7 with the deletionVectors feature, plus the writer-only
    changeDataFeed feature when cdc actions are written. ``v2c``
    (sidecar-based V2 checkpoints published) forces 3/7 with the
    ``v2Checkpoint`` reader+writer feature — the spec's gate: a
    reader that cannot follow sidecars must not replay the table.
    ``ict`` (in-commit timestamps stamped) claims the writer-only
    ``inCommitTimestamp`` feature: writer features require writer
    version 7, but the READER version stays at whatever the reader
    features demand (1 when none — ICT-stamped vector-free tables
    remain readable by engines that predate table features).
    ``rt`` (row tracking) claims the writer-only ``rowTracking``
    feature plus ``domainMetadata`` (the high-water mark lives in a
    ``delta.rowTracking`` domain per the protocol) — also
    reader-transparent."""
    if dv or v2c or ict or rt:
        feats_r = (["deletionVectors"] if dv else []) + (
            ["v2Checkpoint"] if v2c else []
        )
        feats_w = (
            list(feats_r)
            + (["changeDataFeed"] if cdf else [])
            + (["inCommitTimestamp"] if ict else [])
            + (["rowTracking", "domainMetadata"] if rt else [])
        )
        if feats_r:
            return {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": feats_r,
                    "writerFeatures": feats_w,
                }
            }
        return {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": feats_w,
            }
        }
    return {
        "protocol": {
            "minReaderVersion": 1,
            "minWriterVersion": 4 if cdf else 2,
        }
    }


def _schema_names(m: dict) -> set[str]:
    """Field-name set of the manifest's log schema — computed ONCE per
    manifest by callers, not per file (round-8 review 4)."""
    return {
        fld.name
        for fld in StructType.fromJson(json.loads(m["schema"])).fields
    }


def _rt_domain_action(hwm: int) -> dict:
    """The row-tracking HIGH-WATER MARK carrier (PROTOCOL.md, Row
    Tracking + Domain Metadata): a ``delta.rowTracking`` domain whose
    configuration records the highest assigned fresh row id — what a
    compliant writer reads before assigning new ``baseRowId``s."""
    return {
        "domainMetadata": {
            "domain": "delta.rowTracking",
            "configuration": json.dumps({"rowIdHighWaterMark": hwm}),
            "removed": False,
        }
    }


def _add_action(
    table: TxnTable,
    m: dict,
    f: str,
    now_ms: int,
    names: set[str],
    dv_desc: dict | None = None,
    data_change: bool = True,
    row_base: tuple[int, int] | None = None,
) -> dict:
    p = table.root / f
    fstat = m.get("stats", {}).get(f, {})
    # hidden transform dirs are layout-only — _partition_values_of
    # keeps spec-visible columns
    pv = _partition_values_of(m, f)
    stats_payload: dict = {}
    if "rows" in fstat:
        # numRecords is the file's PHYSICAL row count (what the
        # TxnTable recorded at write); with a DV attached the min/max
        # still span soft-deleted rows, which the protocol flags as
        # tightBounds=false so engines keep them as conservative
        # skipping bounds only
        stats_payload["numRecords"] = int(fstat["rows"])
        mins, maxs = {}, {}
        for c, mm in fstat.items():
            if c == "rows" or c.startswith("bloom:") or c not in names:
                continue
            if isinstance(mm, (list, tuple)) and len(mm) == 2:
                mins[c], maxs[c] = mm[0], mm[1]
        if mins:
            stats_payload["minValues"] = mins
            stats_payload["maxValues"] = maxs
        if dv_desc:
            stats_payload["tightBounds"] = False
    return {
        "add": {
            **({"deletionVector": dv_desc} if dv_desc else {}),
            # the protocol specifies URL-encoded relative paths: a
            # Hive-escaped dir like 'site=50%25' must export as
            # 'site=50%2525' or a compliant reader's decode resolves
            # the wrong directory (round-8 review). '=' stays literal
            # (RFC3986 sub-delim, what reference writers emit).
            "path": quote(f, safe="/="),
            "partitionValues": pv,
            "size": p.stat().st_size if p.exists() else 0,
            "modificationTime": now_ms,
            "dataChange": data_change,
            # row tracking: (baseRowId, defaultRowCommitVersion) —
            # fresh on first add, PRESERVED verbatim on every re-add
            # of the same file (DV updates, backfills): stable row ids
            # are the feature's whole contract
            **(
                {
                    "baseRowId": row_base[0],
                    "defaultRowCommitVersion": row_base[1],
                }
                if row_base is not None
                else {}
            ),
            **(
                {"stats": json.dumps(stats_payload)}
                if stats_payload
                else {}
            ),
        }
    }


#: directory (and descriptor prefix) the export's packed DV files
#: live under — cleaned up together with the _delta_log they serve
_DV_EXPORT_PREFIX = "_dv"



def _collect_txn_dv_indexes(
    table: TxnTable, m: dict, only=None
) -> dict[str, list[int]]:
    """Resolve a TxnTable snapshot's deletion-vector state to
    {file → sorted deleted row indexes}: ONE scan over the (file_key,
    row_idx) vector parquets the manifest references, restricted to
    ``only`` when the caller knows which files changed. Driver-
    bounded like the read side (vectors are per-commit deltas;
    anything past the bound should be compacted, which reconciles
    them into clean files)."""
    dvs_map = {
        f: ps
        for f, ps in (m.get("dvs") or {}).items()
        if only is None or f in only
    }
    if not dvs_map:
        return {}
    paths = sorted({p for ps in dvs_map.values() for p in ps})
    rows = (
        table.spark.read.schema("file_key STRING, row_idx BIGINT")
        .parquet(*[str(table.root / p) for p in paths])
        .select("file_key", "row_idx")
        .filter(F.col("file_key").isin(list(dvs_map)))
        .limit(_DV_POSITIONS_BOUND + 1)
        .collect()
    )
    if len(rows) > _DV_POSITIONS_BOUND:
        raise ValueError(
            f"table {table.name}: snapshot carries more than "
            f"{_DV_POSITIONS_BOUND} soft-deleted row positions — run "
            f"compact() (reconciling the vectors) before exporting"
        )
    out: dict[str, set] = {}
    for r in rows:
        out.setdefault(r["file_key"], set()).add(int(r["row_idx"]))
    return {f: sorted(s) for f, s in out.items()}


def _export_dv_descriptors(
    table: TxnTable, per_file: dict[str, list[int]]
) -> dict[str, dict]:
    """Pack one commit's worth of vectors into a single uuid-named DV
    file under ``<root>/_dv`` and return Delta descriptors per data
    file (delta_dv.write_packed_dv_file — the framing read_delta's
    own decoder consumes)."""
    from interop_datalake_spark.lake.delta_dv import write_packed_dv_file

    if not per_file:
        return {}
    return write_packed_dv_file(
        table.root, per_file, prefix=_DV_EXPORT_PREFIX
    )


#: TxnTable commit op → the Delta operation name external engines
#: surface in DESCRIBE HISTORY (unknown ops fall back to the raw op)
_DELTA_OP_NAMES = {
    "append": "WRITE",
    "overwrite": "WRITE",
    "overwrite_partitions": "WRITE",
    "compact": "OPTIMIZE",
    "consolidate_dv": "OPTIMIZE",
    "delete": "DELETE",
    "merge": "MERGE",
    "merge_sync": "MERGE",
    "restore": "RESTORE",
    "clone": "CLONE",
}


def _commit_info(
    now_ms: int, op: str | None, txn_version=None, ict: int | None = None
) -> dict:
    """A ``commitInfo`` action (PROTOCOL.md: free-form provenance;
    engines surface it as DESCRIBE HISTORY). Readers — including this
    module's — ignore it for replay, EXCEPT ``inCommitTimestamp``
    (present iff the ICT writer feature is claimed): the protocol's
    authoritative, monotone commit time, which time travel and CDF
    timestamp bounds prefer over file mtimes."""
    info = {
        "timestamp": now_ms,
        "operation": _DELTA_OP_NAMES.get(op, op or "WRITE"),
        "operationParameters": {},
        "engineInfo": "interop-datalake-spark txn mirror",
    }
    if ict is not None:
        info["inCommitTimestamp"] = int(ict)
    if txn_version is not None:
        info["operationParameters"] = {"txnVersion": str(txn_version)}
    return {"commitInfo": info}


def _write_commit(log_dir: Path, delta_version: int, actions) -> None:
    """Atomic + DURABLE + IMMUTABLE publish of one commit json:
    rename alone is atomic only against process crashes — after power
    loss the rename can be durable while the data blocks are not,
    leaving a complete-looking truncated commit (round-8 review 3).
    fsync the data before publishing and the directory after. The
    publish itself is ``os.link`` put-if-absent (TxnTable's own CAS):
    a published Delta commit is immutable — silently clobbering one a
    reader may have cached is never correct (round-8 review 4)."""
    tmp = log_dir / f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    target = log_dir / f"{delta_version:020d}.json"
    try:
        os.link(tmp, target)
    except FileExistsError:
        raise ValueError(
            f"Delta commit {target.name} already exists — published "
            f"commits are immutable (concurrent mirror, or a marker "
            f"rolled back by hand); delete the log and re-export to "
            f"restart"
        )
    except OSError as e:
        # ONLY filesystems that genuinely cannot hard-link (SMB/FAT/
        # some NFS) degrade to check-then-rename; transient errors
        # (EIO/ENOSPC/…) must NOT downgrade the CAS to a clobber-
        # capable path on a link-capable mount (round-8 review 6)
        import errno as _errno

        if e.errno not in (
            _errno.EPERM,
            _errno.EOPNOTSUPP,
            getattr(_errno, "ENOTSUP", _errno.EOPNOTSUPP),
            _errno.ENOSYS,
            _errno.EINVAL,
        ):
            raise
        if target.exists():
            raise ValueError(
                f"Delta commit {target.name} already exists — "
                f"published commits are immutable"
            )
        tmp.replace(target)
    finally:
        tmp.unlink(missing_ok=True)
    dir_fd = os.open(log_dir, os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)


def _write_marker(
    log_dir: Path,
    txn_version: int,
    delta_version: int,
    table_id: str,
    dv_descs: dict | None = None,
    dv_protocol: bool = False,
    cdf: bool = False,
    v2c: bool = False,
    ict: bool = False,
    ict_last: int = 0,
    ict_enablement: dict | None = None,
    rt: bool = False,
    rt_hwm: int = -1,
):
    """Atomic + fsync'd like the commits — INCLUDING the directory
    fsync after the rename (round-8 review 5): a dir-cached rename
    lost to power loss while the commit survived would leave the
    marker behind the published log. ``dv_descs`` persists each
    exported file's CURRENT deletionVector descriptor: compliant
    engines key log replay on (path, DV identity), so a later mirror
    commit that drops or updates a vectored file must emit a remove
    naming the EXACT descriptor previously published — without the
    marker the mirror could not reconstruct it."""
    tmp = log_dir / f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        fh.write(
            json.dumps(
                {
                    "txn_version": txn_version,
                    "delta_version": delta_version,
                    "table_id": table_id,
                    "dv_descs": dv_descs or {},
                    "dv_protocol": bool(dv_protocol),
                    "cdf": bool(cdf),
                    "v2c": bool(v2c),
                    # ICT is one-way once claimed: ict_last carries the
                    # last stamped timestamp across export sessions so
                    # monotonicity survives process restarts;
                    # ict_enablement the provenance pair checkpoints
                    # must keep re-emitting
                    "ict": bool(ict),
                    "ict_last": int(ict_last),
                    "ict_enablement": ict_enablement,
                    # row tracking is one-way once claimed; the
                    # high-water mark persists so fresh baseRowIds
                    # never collide across export sessions (per-file
                    # bases recover from the published log itself)
                    "rt": bool(rt),
                    "rt_hwm": int(rt_hwm),
                }
            )
        )
        fh.flush()
        os.fsync(fh.fileno())
    tmp.replace(log_dir / _MIRROR_MARKER)
    dir_fd = os.open(log_dir, os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)


def _read_marker(log_dir: Path) -> dict | None:
    """None when absent OR unparseable — a torn marker falls back to
    a full export instead of raising forever (round-8 review 4)."""
    p = log_dir / _MIRROR_MARKER
    if not p.exists():
        return None
    try:
        d = json.loads(p.read_text())
        return {
            "txn_version": int(d["txn_version"]),
            "delta_version": int(d["delta_version"]),
            "table_id": str(d["table_id"]),
            # pre-DV-export markers lack these: default clean
            "dv_descs": dict(d.get("dv_descs") or {}),
            "dv_protocol": bool(d.get("dv_protocol")),
            "cdf": bool(d.get("cdf")),
            "v2c": bool(d.get("v2c")),
            "ict": bool(d.get("ict")),
            "ict_last": int(d.get("ict_last") or 0),
            "ict_enablement": d.get("ict_enablement"),
            "rt": bool(d.get("rt")),
            "rt_hwm": int(
                d["rt_hwm"] if d.get("rt_hwm") is not None else -1
            ),
        }
    except (ValueError, KeyError, TypeError):
        return None


def _full_export(
    table: TxnTable,
    version: int | None,
    cdf: bool = False,
    v2c: bool = False,
    ict: bool = False,
    rt: bool = False,
) -> Path:
    m = table.manifest(version)
    _validate_exportable(table, m, m["files"])
    now_ms = int(time.time() * 1000)
    log_dir = table.root / "_delta_log"
    # a full export REWINDS the Delta version history to 0 — something
    # real Delta never does in place — so it mints a FRESH table id:
    # the id change is exactly the loud "table was replaced" signal
    # streaming consumers rely on; reusing the old id would serve them
    # rewound versions under an identity that promises immutability
    # (round-8 review 5). Within mirror mode the id stays stable via
    # the marker.
    table_id = str(uuid.uuid4())
    names = _schema_names(m)
    # ALL fallible work (the DV position scan may raise the over-bound
    # ValueError, and Spark itself can fail) runs BEFORE anything of
    # the previous export is deleted — a failed export must leave the
    # old valid log readable, not a rubble pile. New packed vectors
    # are uuid-named, so they coexist with the old log's files; the
    # stale ones are swept only after the new log is fully staged.
    dv_dir = table.root / _DV_EXPORT_PREFIX
    stale_dv = set(dv_dir.iterdir()) if dv_dir.exists() else set()
    dv_descs = _export_dv_descriptors(
        table, _collect_txn_dv_indexes(table, m)
    )
    if log_dir.exists():
        shutil.rmtree(log_dir)  # snapshot export: replace wholesale
    for p in stale_dv:  # stale packed vectors of the old log
        p.unlink(missing_ok=True)
    if dv_dir.exists() and not any(dv_dir.iterdir()):
        dv_dir.rmdir()
    # the old log's change-data files are referenced only by the
    # commits just deleted — a fresh single-commit export has no CDC
    # history, so leaving them would accumulate forever
    cdc_dir = table.root / "_change_data"
    if cdc_dir.exists():
        shutil.rmtree(cdc_dir)
    extra_conf = dict(_ict_configuration(ict))
    if rt:
        extra_conf["delta.enableRowTracking"] = "true"
    actions = [
        # ICT enabled at table creation (version 0) needs no
        # enablement-provenance properties — the whole history is
        # ICT-stamped
        _commit_info(
            now_ms, "append", m["version"], ict=now_ms if ict else None
        ),
        # vector-free snapshots stay minReader/Writer 1/2 (plain
        # parquet + partition columns) — maximally consumable; a
        # vectored snapshot must claim the deletionVectors feature
        _protocol_action(bool(dv_descs), cdf, v2c, ict, rt),
        _meta_action(m, now_ms, table_id, cdf, extra_conf or None),
    ]
    rt_hwm = -1
    for f in m["files"]:
        row_base = None
        if rt:
            # row tracking from creation: every file's rows get fresh
            # ids (baseRowId + position), commit version 0
            n = int(m.get("stats", {}).get(f, {}).get("rows") or 0)
            row_base = (rt_hwm + 1, 0)
            rt_hwm += n
        actions.append(
            _add_action(
                table, m, f, now_ms, names, dv_descs.get(f),
                row_base=row_base,
            )
        )
    if rt:
        actions.append(_rt_domain_action(rt_hwm))
    log_dir.mkdir(parents=True)
    _write_commit(log_dir, 0, actions)
    _write_marker(
        log_dir, m["version"], 0, table_id, dv_descs, bool(dv_descs),
        cdf, v2c, ict, now_ms if ict else 0, rt=rt, rt_hwm=rt_hwm,
    )
    return log_dir


def export_delta_log(
    table: TxnTable,
    version: int | None = None,
    mode: str = "replace",
    checkpoint_every: int = 10,
    change_data: bool = False,
    checkpoint_format: str = "classic",
    in_commit_timestamps: bool = False,
    row_tracking: bool = False,
) -> Path:
    """Write a Delta ``_delta_log`` describing the TxnTable into the
    table's root — the root then IS a Delta table: ``add.path``
    entries are the same root-relative parquet paths the TxnTable
    manifest records, so zero data bytes move.

    ``mode="replace"`` (default): a SNAPSHOT export of ``version``
    (default latest) — one Delta commit, any existing log replaced
    wholesale. ``mode="mirror"``: INCREMENTAL — continue a previous
    export by appending one Delta commit per TxnTable version since
    the recorded high-water mark (file-set diff → add/remove actions;
    schema or partition-spec changes emit a fresh metaData action;
    no-op TxnTable commits — epoch stamps, empty deletes — advance
    the mark without a Delta commit). External engines then follow
    the table CONTINUOUSLY, with Delta time travel over the mirrored
    history; falls back to a full export when no marker exists or the
    TxnTable log no longer retains the marked version (post-vacuum).
    ``version`` must be None in mirror mode.

    CHECKPOINTS: every ``checkpoint_every``-th mirrored Delta commit
    also writes a parquet checkpoint + ``_last_checkpoint`` (the
    state at that version: protocol, metaData, live adds with DV
    descriptors), so external engines replay O(checkpoint + tail);
    :func:`expire_delta_log` then implements Delta's metadata
    retention by dropping the pre-checkpoint history (V2 sidecars
    orphaned by expired manifests included).
    ``checkpoint_format="classic"`` (default) writes the single-part
    action-per-row shape; ``"v2"`` writes the sidecar-based V2 shape
    (UUID-named manifest + ``_delta_log/_sidecars/`` parquet) and
    upgrades the published protocol to claim the ``v2Checkpoint``
    reader+writer feature in the next published commit — a one-way
    table feature: once claimed it stays claimed even if a later
    mirror reverts to classic files.

    ``change_data=True`` records Delta's CHANGE DATA FEED: the
    metaData sets ``delta.enableChangeDataFeed``, the protocol claims
    the ``changeDataFeed`` writer feature (legacy writer version 4 on
    vector-free tables), and every mirrored DV-update commit writes
    its exact row-level delta — vector position diffs plus added-file
    inserts, straight from ``TxnTable.read_changes`` — as
    ``_change_data/`` parquet referenced by ``cdc`` actions, the
    authoritative change content compliant CDC readers consume
    instead of file-action derivation. Pure appends and full-file
    removes still derive (writing cdc there would duplicate data —
    delta-spark's own rule). Enabling or disabling mid-mirror emits
    the metaData/protocol transition in the next published commit.

    ``in_commit_timestamps=True`` claims the ``inCommitTimestamp``
    writer feature and stamps every published commit's ``commitInfo``
    with a strictly-monotone ``inCommitTimestamp`` — the mirrored
    TxnTable commit's own recorded time — so foreign readers resolve
    time travel and CDF timestamp bounds by protocol-authoritative
    commit times instead of file mtimes (immune to copies/restores
    perturbing mtime). Mirror enablement mid-history emits the
    enablement-provenance properties the spec requires; once claimed
    the feature is ONE-WAY (later mirrors keep stamping even without
    the flag). Vector-free ICT tables keep minReaderVersion 1 — the
    feature is writer-only.

    ``row_tracking=True`` claims the writer-only ``rowTracking`` (+
    ``domainMetadata``) features and assigns each add action a
    ``baseRowId`` / ``defaultRowCommitVersion`` with the
    ``delta.rowTracking`` domain carrying the high-water mark — a
    row's id is its file's base + position, read back by
    ``read_delta(with_row_tracking=True)`` and STABLE across DV
    deletes and re-adds (re-adds preserve bases verbatim; mid-mirror
    enablement backfills the already-published live files as
    dataChange=false re-adds, delta-spark's own mechanism). One-way
    once claimed; checkpoints preserve the ids and the domain. The
    Delta twin of the Iceberg v3 row lineage this repo also writes.

    STALENESS CONTRACT (replace mode): the export describes the
    snapshot AT EXPORT TIME; later TxnTable commits do not update it
    — re-export (or mirror) after mutating. The exported snapshot
    stays CONSISTENT because removed files stay on disk for time
    travel… until :meth:`vacuum` reclaims them, so vacuum DELETES a
    stale exported log rather than leave external engines a log of
    dangling paths (round-8 review).

    DELETION VECTORS export natively: a vectored snapshot's
    per-file deleted-row sets are re-encoded as Delta DVs (packed
    uuid-named RoaringBitmapArray files under ``_dv/``, one per
    commit — :mod:`.delta_dv`), the adds carry descriptors +
    ``tightBounds: false`` stats, and the log claims the
    ``deletionVectors`` reader/writer feature (protocol 3/7; clean
    snapshots stay 1/2). In mirror mode a vector change exports as
    Delta's own DV-update shape — remove naming the previously
    published descriptor + re-add with the new one — with per-file
    descriptors persisted in the mirror marker so replay identity
    ((path, DV id)) is preserved across export sessions.

    Refuses loudly (never silently wrong): mixed-partition-spec
    snapshots whose pre-spec files would export empty
    partitionValues (``compact()`` cures), and vector sets past the
    driver-side decode bound. Returns the ``_delta_log`` directory
    path."""
    if mode not in ("replace", "mirror"):
        raise ValueError("mode must be 'replace' or 'mirror'")
    if checkpoint_format not in ("classic", "v2"):
        raise ValueError(
            "checkpoint_format must be 'classic' or 'v2'"
        )
    if mode == "mirror" and version is not None:
        raise ValueError("mirror mode always exports to the latest version")
    log_dir = table.root / "_delta_log"
    # ONE export writer at a time — BOTH modes (round-8 review 6 +
    # round-8 advice): the mirror's crash-recovery unlink is only safe
    # when no concurrent writer can have just acknowledged a commit,
    # and a replace export racing a mirror mid-publish would rmtree
    # commits the mirror just acknowledged and interleave a
    # half-rebuilt log. The advisory flock lives at the TABLE ROOT
    # (not inside the log dir): _full_export rmtree's the log dir, and
    # a lockfile deleted while held would let the next writer lock a
    # fresh inode concurrently — the classic flock-on-replaced-file
    # hole.
    import fcntl

    lock_path = table.root / ".delta_export.lock"
    lock_fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
    try:
        try:
            fcntl.flock(lock_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            raise ValueError(
                f"table {table.name}: another Delta export holds the "
                f"lock — one export writer at a time"
            )
        v2 = checkpoint_format == "v2"
        if mode == "replace":
            return _full_export(
                table, version, change_data, v2,
                in_commit_timestamps, row_tracking,
            )
        marker = _read_marker(log_dir) if log_dir.exists() else None
        if marker is None:
            # no marker, or a torn one: restart with a full export —
            # claiming v2Checkpoint (and ICT / row tracking) up front
            # when requested, so the mirror's own checkpoints need no
            # later upgrade commit
            return _full_export(
                table, None, change_data, v2,
                in_commit_timestamps, row_tracking,
            )
        return _mirror_locked(
            table, log_dir, checkpoint_every, change_data,
            checkpoint_format, in_commit_timestamps, row_tracking,
        )
    finally:
        os.close(lock_fd)


def _mirror_locked(
    table: TxnTable,
    log_dir: Path,
    checkpoint_every: int = 10,
    change_data: bool = False,
    checkpoint_format: str = "classic",
    in_commit_timestamps: bool = False,
    row_tracking: bool = False,
) -> Path:
    # marker re-read UNDER the lock: decisions below must be based on
    # the acknowledged state no concurrent writer can move
    marker = _read_marker(log_dir)
    if marker is None:
        return _full_export(
            table, None, change_data, checkpoint_format == "v2",
            in_commit_timestamps, row_tracking,
        )
    base_txn = marker["txn_version"]
    delta_v = marker["delta_version"]
    table_id = marker["table_id"]
    cur = table.current_version()
    if cur <= base_txn:
        return log_dir  # already current: idempotent no-op
    if base_txn not in table._retained_versions() and base_txn != 0:
        # the marked version was vacuumed away: can't diff — restart,
        # carrying the requested feature set (plus any the old mirror
        # had already claimed one-way) into the fresh export
        return _full_export(
            table, None, change_data,
            checkpoint_format == "v2" or bool(marker.get("v2c")),
            in_commit_timestamps or bool(marker.get("ict")),
            row_tracking or bool(marker.get("rt")),
        )
    # CRASH RECOVERY (round-8 reviews 5+6): a crash between a commit's
    # publish and its marker write leaves exactly ONE unacknowledged
    # commit — at delta_v+1, because the marker follows every publish.
    # The retry would rebuild that version (with fresh timestamps) and
    # collide forever; remove the orphan, O(1), and resume from the
    # marker — the only state the protocol acknowledges.
    (log_dir / f"{delta_v + 1:020d}.json").unlink(missing_ok=True)
    now_ms = int(time.time() * 1000)
    marked = base_txn
    prev = table.manifest(base_txn)
    # exported DV state rides the marker: compliant engines key log
    # replay on (path, DV identity), so dropping/updating a vectored
    # file later must name the EXACT previously-published descriptor
    dv_descs = dict(marker.get("dv_descs") or {})
    dv_protocol_claimed = bool(marker.get("dv_protocol"))
    cdf = bool(change_data)
    cdf_claimed = bool(marker.get("cdf"))
    # v2Checkpoint is a one-way table feature: once published, the
    # protocol keeps claiming it (readers must still follow sidecars
    # in the history) even if a later mirror reverts to classic
    # checkpoint files
    v2c = bool(marker.get("v2c")) or checkpoint_format == "v2"
    v2c_claimed = bool(marker.get("v2c"))
    # ICT is one-way like v2Checkpoint: once a mirror stamped it, the
    # property is on and every later commit must carry a monotone
    # inCommitTimestamp — even if a later caller forgets the flag
    ict = bool(marker.get("ict")) or in_commit_timestamps
    ict_claimed = bool(marker.get("ict"))
    ict_last = int(marker.get("ict_last") or 0)
    ict_enablement = marker.get("ict_enablement")
    # ROW TRACKING (one-way like the others): the high-water mark
    # rides the marker; per-file (baseRowId, defaultRowCommitVersion)
    # recover from the PUBLISHED log itself — re-adds (DV updates)
    # must preserve them verbatim, the feature's stability contract
    rt = bool(marker.get("rt")) or row_tracking
    rt_claimed = bool(marker.get("rt"))
    rt_hwm = int(marker.get("rt_hwm", -1))
    rt_bases: dict[str, tuple[int, int]] = {}
    if rt_claimed:
        _meta_replay, prev_adds = _replay_log(str(table.root), None)
        for f, a in prev_adds.items():
            b = a.get("baseRowId")
            if b is not None:
                rt_bases[f] = (
                    int(b),
                    int(a.get("defaultRowCommitVersion") or 0),
                )
    for v in range(base_txn + 1, cur + 1):
        m = table.manifest(v)
        prev_files = set(prev["files"])
        cur_files = set(m["files"])
        added = [f for f in m["files"] if f not in prev_files]
        removed = [f for f in prev["files"] if f not in cur_files]
        # vector-state diff on the manifest's per-file VECTOR PATH
        # lists (vector parquets are immutable once written, so equal
        # lists ⇒ equal deleted-row sets) — no decode unless changed
        dvs_prev = prev.get("dvs") or {}
        dvs_cur = m.get("dvs") or {}
        dv_changed = [
            f
            for f in m["files"]
            if f in prev_files
            and (dvs_prev.get(f) or []) != (dvs_cur.get(f) or [])
        ]
        new_spec = m.get("partition_cols") or []
        old_spec = prev.get("partition_cols") or []
        spec_changed = new_spec != old_spec
        # a MEMBERSHIP change re-scopes EVERY published file: the
        # survivors' add actions were exported under the old spec and
        # their DATA FILES physically lack any column the old spec
        # path-encoded — no manifest check can prove them readable
        # under the new spec, so it is only mirrorable when the
        # version is a FULL REWRITE (what compact produces:
        # added == files); otherwise transient-skip / head-refuse,
        # like the vector window (round-8 reviews 4+5). A pure
        # REORDER ([a,b] → [b,a]) drops no column — it only re-emits
        # metaData, no rewrite required (round-8 review 6).
        try:
            if set(new_spec) != set(old_spec) and set(added) != set(
                m["files"]
            ):
                raise ValueError(
                    f"table {table.name}: partition spec changed at "
                    f"v{v} without a full rewrite — survivors' data "
                    f"files cannot be proven readable under the new "
                    f"spec; run compact() and mirror again"
                )
            _validate_exportable(
                table, m, m["files"] if spec_changed else added
            )
            # decode + pack vectors for exactly the files whose
            # vector state is new this version (fresh adds carrying
            # vectors, plus survivors whose vector list changed) —
            # INSIDE the try: an over-bound vector set at an
            # intermediate version transient-skips like any other
            # unexportable state (a following compact usually cures
            # it); at the head it refuses loudly
            need = set(f for f in added if dvs_cur.get(f)) | set(
                dv_changed
            )
            new_descs = (
                _export_dv_descriptors(
                    table, _collect_txn_dv_indexes(table, m, only=need)
                )
                if need
                else {}
            )
        except ValueError:
            if v == cur:
                raise
            continue  # hold ``prev`` at the last exportable version
        # pure rewrites (compact, DV consolidation) change files but
        # not logical rows — export them with dataChange=false, the
        # OPTIMIZE shape, so streaming consumers (delta-spark's and
        # this repo's delta_appends source alike) skip them instead
        # of REPROCESSING every rewritten row after each compaction
        try:
            rec = table.commit_record(v)
        except (OSError, ValueError):
            rec = {}  # checkpoint-folded record: assume data change
        op = rec.get("op")
        dc = op not in ("compact", "consolidate_dv")
        ict_ts = None
        if ict:
            # the ICT is the mirrored TxnTable commit's OWN time when
            # recorded (provenance-accurate history), monotonized
            # strictly increasing per the feature spec; wall clock
            # only when the record is gone (checkpoint-folded)
            try:
                base_ts = _to_epoch_ms(rec["ts_utc"])
            except (KeyError, TypeError, ValueError):
                base_ts = now_ms
            ict_ts = max(ict_last + 1, base_ts)
            if not ict_claimed and ict_enablement is None:
                # enabling mid-history: record the provenance pair
                # (first ICT version + its timestamp) the spec
                # requires when the feature is not creation-enabled
                ict_enablement = {
                    "version": delta_v + 1,
                    "timestamp": ict_ts,
                }
        actions = [_commit_info(now_ms, op, v, ict=ict_ts)]
        if (
            (new_descs and not dv_protocol_claimed)
            or cdf != cdf_claimed
            or v2c != v2c_claimed
            or ict != ict_claimed
            or rt != rt_claimed
        ):
            # first vectored commit / CDF transition / v2Checkpoint,
            # ICT or row-tracking enablement in this mirror: upgrade
            # the published protocol in-commit (Delta's own path)
            actions.append(
                _protocol_action(
                    dv_protocol_claimed or bool(new_descs), cdf, v2c,
                    ict, rt,
                )
            )
        if (
            m.get("schema") != prev.get("schema")
            or spec_changed
            or cdf != cdf_claimed
            or ict != ict_claimed
            or rt != rt_claimed
        ):
            # a CDF / ICT / row-tracking transition re-emits metaData:
            # the delta.enable* configuration is what compliant
            # readers key the feature on
            extra_conf = dict(
                _ict_configuration(ict, ict_enablement)
            )
            if rt:
                extra_conf["delta.enableRowTracking"] = "true"
            actions.append(
                _meta_action(
                    m, now_ms, table_id, cdf, extra_conf or None
                )
            )
        if rt and added and removed:
            # a COPY-ON-WRITE rewrite (compact, cow delete/merge)
            # moves surviving rows into new files — the rowTracking
            # contract requires their ids preserved, which delta-spark
            # does by MATERIALIZING the id columns into the rewritten
            # parquet; a zero-copy mirror cannot, and silently
            # assigning fresh ids would break every consumer keying on
            # them. Row-tracked mirrors therefore support the
            # merge-on-read family (append / DV delete / DV merge —
            # ids provably stable); rewrites refuse loudly.
            raise ValueError(
                f"table {table.name}: version {v} rewrites files "
                f"(adds AND removes) under row tracking — a zero-copy "
                f"mirror cannot preserve the moved rows' ids. Use "
                f"merge-on-read operations (delete_where/merge with "
                f"merge_on_read=True), or re-export with "
                f"mode='replace' (a fresh table identity signals the "
                f"id reset to consumers)"
            )
        rt_assigned = False

        def _fresh_base(f: str) -> tuple[int, int]:
            # fresh rows: ids start past the high-water mark; the
            # row commit version is THIS Delta commit
            nonlocal rt_hwm, rt_assigned
            n = int(m.get("stats", {}).get(f, {}).get("rows") or 0)
            base = rt_hwm + 1
            rt_hwm += n
            rt_assigned = True
            rt_bases[f] = (base, delta_v + 1)
            return rt_bases[f]

        def _base_of(f: str, fresh_ok: bool = True):
            if not rt:
                return None
            kept = rt_bases.get(f)
            if kept is not None:
                return kept  # re-add preserves ids verbatim
            return _fresh_base(f) if fresh_ok else None

        actions += [
            _remove_action(
                f, now_ms, dv_descs.get(f), dc,
                _partition_values_of(prev, f),
            )
            for f in removed
        ]
        names = _schema_names(m)
        if rt and not rt_claimed:
            # ENABLEMENT BACKFILL (delta-spark's own mechanism): the
            # already-published live files re-commit as
            # dataChange=false adds carrying their assigned baseRowId
            # — without it, pre-enablement rows would read NULL ids
            # forever. Files this commit re-adds anyway (dv_changed)
            # or adds fresh get their bases at those sites.
            backfill = [
                f
                for f in m["files"]
                if f not in set(added) | set(dv_changed)
            ]
            actions += [
                _add_action(
                    table, m, f, now_ms, names, dv_descs.get(f),
                    data_change=False, row_base=_base_of(f),
                )
                for f in backfill
            ]
        # the DV-update commit shape: remove naming the OLD vector +
        # re-add of the same path with the new one (or vector-free
        # when a restore cleared it) — row-tracking bases PRESERVED
        actions += [
            a
            for f in dv_changed
            for a in (
                _remove_action(
                    f, now_ms, dv_descs.get(f), dc,
                    _partition_values_of(m, f),
                ),
                _add_action(
                    table, m, f, now_ms, names, new_descs.get(f), dc,
                    row_base=_base_of(f),
                ),
            )
        ]
        actions += [
            _add_action(
                table, m, f, now_ms, names, new_descs.get(f), dc,
                row_base=_base_of(f),
            )
            for f in added
        ]
        if rt and rt_assigned:
            actions.append(_rt_domain_action(rt_hwm))
        if (
            cdf
            and dc
            and dv_changed
            and not removed
            and v == prev["version"] + 1
        ):
            # CHANGE DATA FILES (Delta's cdc actions): only DV-update
            # commits need them — their row-level delta is a vector
            # position diff no file-action derivation can see. Pure
            # add commits derive as inserts and full-file removes as
            # deletes under the protocol's own rule, so writing cdc
            # there would only duplicate data. The guard is EXACT,
            # not just minimal: cdc is authoritative (readers ignore
            # the commit's add/remove for CDC once present), and
            # read_changes(v-1, v) describes exactly ONE txn version
            # with no copy-on-write removals — a commit that FOLDS
            # transient-skipped versions (v > prev+1) or mixes in
            # removed files would get cdc content missing the folded
            # versions' inserts / the removed files' deletes (silent
            # CDC data loss). Those shapes fall back to file-action
            # derivation, which stays net-correct (a DV-update pair
            # derives as delete-all-old-live + insert-all-new-live in
            # engines without position diffing — fat but right).
            actions += _write_change_data(table, v, m)
        if len(actions) > 1:  # beyond the commitInfo provenance row
            for f in removed:
                dv_descs.pop(f, None)
            for f in list(need) + added:
                if f in new_descs:
                    dv_descs[f] = new_descs[f]
                else:
                    dv_descs.pop(f, None)
            dv_protocol_claimed = dv_protocol_claimed or bool(new_descs)
            cdf_claimed = cdf
            v2c_claimed = v2c
            if ict_ts is not None:
                ict_claimed = True
                ict_last = ict_ts
            if rt:
                rt_claimed = True
                for f in removed:
                    rt_bases.pop(f, None)
            delta_v += 1
            _write_commit(log_dir, delta_v, actions)
            # marker advances per PUBLISHED commit, right after it: a
            # mid-loop failure leaves marker and acknowledged commits
            # consistent (the single possible orphan is cleaned on the
            # next run — see recovery above), and action-less versions
            # don't pay an fsync (round-8 reviews 4+5)
            _write_marker(
                log_dir, v, delta_v, table_id, dv_descs,
                dv_protocol_claimed, cdf_claimed, v2c_claimed,
                ict_claimed, ict_last, ict_enablement,
                rt_claimed, rt_hwm,
            )
            marked = v
            if checkpoint_every and delta_v % checkpoint_every == 0:
                # the log state at delta_v IS manifest m: checkpoint
                # it so external engines (and expire_delta_log)
                # replay O(checkpoint + tail), not the whole history
                _write_delta_checkpoint(
                    table, log_dir, delta_v, m, table_id, dv_descs,
                    dv_protocol_claimed, now_ms, cdf_claimed,
                    v2c=(checkpoint_format == "v2" and v2c_claimed),
                    v2c_protocol=v2c_claimed,
                    ict=ict_claimed,
                    ict_enablement=ict_enablement,
                    rt_bases=rt_bases if rt_claimed else None,
                    rt_hwm=rt_hwm,
                )
        prev = m
    if marked != cur:
        # trailing no-op versions: record them once at the end
        # (tracked locally — re-reading the marker file here would
        # bypass _read_marker's torn-marker tolerance and crash if a
        # concurrent replace/vacuum removed the log; round-8 review 6)
        _write_marker(
            log_dir, cur, delta_v, table_id, dv_descs,
            dv_protocol_claimed, cdf_claimed, v2c_claimed,
            ict_claimed, ict_last, ict_enablement,
            rt_claimed, rt_hwm,
        )
    return log_dir


def _write_change_data(table: TxnTable, v: int, m: dict) -> list[dict]:
    """One TxnTable version's exact change rows written as Delta
    CHANGE DATA FILES under ``<root>/_change_data/`` (hive layout —
    cdc files follow data-file partitioning rules, so partition
    columns live in partitionValues, not the parquet) and returned as
    ``cdc`` actions. The change set comes from
    ``TxnTable.read_changes(include_deletes=True)`` restricted to
    this version — exact for the DV-update commits this is written
    for (vector position diffs + added-file inserts). ``cdc``
    actions carry ``dataChange=false`` per the protocol (readers of
    the DATA stream ignore them; CDC readers treat them as the
    commit's authoritative change content)."""
    ch = table.read_changes(v - 1, v, include_deletes=True).drop(
        "_commit_version"
    )
    pcols = m.get("partition_cols") or []
    sub = f"cdc-{uuid.uuid4().hex}"
    dest = table.root / "_change_data" / sub
    writer = ch.write.mode("error")
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(str(dest))
    actions = []
    for p in sorted(dest.rglob("*.parquet")):
        if p.name.startswith(("_", ".")):
            continue
        rel = str(p.relative_to(table.root))
        pv = {}
        for seg in p.relative_to(dest).parts[:-1]:
            if "=" in seg:
                k, _, raw = seg.partition("=")
                if k in pcols:
                    pv[k] = None if raw == _HIVE_NULL else unquote(raw)
        actions.append(
            {
                "cdc": {
                    "path": quote(rel, safe="/="),
                    "partitionValues": pv,
                    "size": p.stat().st_size,
                    "dataChange": False,
                }
            }
        )
    return actions


def _remove_action(
    f: str,
    now_ms: int,
    dv_desc: dict | None,
    data_change: bool = True,
    partition_values: dict | None = None,
) -> dict:
    r = {
        "path": quote(f, safe="/="),
        "deletionTimestamp": now_ms,
        "dataChange": data_change,
    }
    if partition_values is not None:
        # Delta's "extended file metadata" shape: carrying the
        # partition values lets CDC readers derive the removed file's
        # partition columns without the pre-version snapshot
        r["extendedFileMetadata"] = True
        r["partitionValues"] = partition_values
    if dv_desc:
        r["deletionVector"] = dv_desc
    return {"remove": r}


def _partition_values_of(m: dict, f: str) -> dict:
    """The add-action partitionValues dict for file ``f`` under
    manifest ``m`` (spec-visible columns only, HIVE null → None) —
    shared by add and remove emission so the two can't drift."""
    pcols = m.get("partition_cols") or []
    pv = {}
    for c, v in (m.get("partitions", {}).get(f) or {}).items():
        if c not in pcols:
            continue
        pv[c] = None if v in (None, _HIVE_NULL) else str(v)
    return pv


def _write_delta_checkpoint(
    table: TxnTable,
    log_dir: Path,
    delta_v: int,
    m: dict,
    table_id: str,
    dv_descs: dict,
    dv_protocol: bool,
    now_ms: int,
    cdf: bool = False,
    v2c: bool = False,
    v2c_protocol: bool | None = None,
    ict: bool = False,
    ict_enablement: dict | None = None,
    rt_bases: dict | None = None,
    rt_hwm: int = -1,
) -> None:
    """Write a parquet checkpoint of the log state at ``delta_v`` —
    CLASSIC single-part by default (one action per row: protocol +
    metaData + every live add, DV descriptors included), or the V2
    sidecar shape when ``v2c`` (UUID-named manifest + one
    ``_sidecars/`` parquet holding the adds) — plus the
    ``_last_checkpoint`` pointer: the layouts every long-lived Delta
    table gets from log cleanup, and the exact shapes
    :func:`_load_checkpoint` consumes. ``v2c`` picks the LAYOUT;
    ``v2c_protocol`` (default: follow ``v2c``) is whether the
    table's protocol claims the v2Checkpoint feature — a v2c-claimed
    history that reverts to classic checkpoint files must still
    record the claimed protocol in its checkpoint rows.
    External engines then replay O(checkpoint + tail) instead of the
    whole JSON history, and :func:`expire_delta_log` may drop the
    pre-checkpoint tail entirely. Remove tombstones are deliberately
    omitted: they exist for VACUUM bookkeeping, which stays the
    TxnTable's job on a mirror (documented divergence, not a replay
    correctness issue). Atomic publish: tmp write + rename (a torn
    checkpoint must never match the ``*.checkpoint*.parquet`` glob)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    schema = pa.schema(
        [
            (
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                        ("readerFeatures", pa.list_(pa.string())),
                        ("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        (
                            "format",
                            pa.struct(
                                [
                                    ("provider", pa.string()),
                                    (
                                        "options",
                                        pa.map_(pa.string(), pa.string()),
                                    ),
                                ]
                            ),
                        ),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        (
                            "configuration",
                            pa.map_(pa.string(), pa.string()),
                        ),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            (
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        (
                            "partitionValues",
                            pa.map_(
                                pa.string(),
                                pa.field("value", pa.string()),
                            ),
                        ),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                        ("deletionVector", dv_t),
                        # row-tracking ids (null on non-RT tables):
                        # the checkpoint must preserve them or a
                        # checkpoint-replayed snapshot loses every
                        # row's identity
                        ("baseRowId", pa.int64()),
                        ("defaultRowCommitVersion", pa.int64()),
                    ]
                ),
            ),
            (
                # the delta.rowTracking high-water-mark domain rides
                # the checkpoint too (the spec: checkpoints contain
                # all live domainMetadata); null on non-RT tables
                "domainMetadata",
                pa.struct(
                    [
                        ("domain", pa.string()),
                        ("configuration", pa.string()),
                        ("removed", pa.bool_()),
                    ]
                ),
            ),
        ]
    )
    rt = rt_bases is not None
    if v2c_protocol is None:
        v2c_protocol = v2c
    proto = _protocol_action(dv_protocol, cdf, v2c_protocol, ict, rt)[
        "protocol"
    ]
    names = _schema_names(m)
    extra_conf = dict(_ict_configuration(ict, ict_enablement))
    if rt:
        extra_conf["delta.enableRowTracking"] = "true"
    meta_row = _meta_action(
        m, now_ms, table_id, cdf, extra_conf or None
    )["metaData"]
    add_rows = []
    for f in m["files"]:
        # checkpoint file actions carry dataChange=false (delta-spark
        # canonicalizes on state reconstruction): a checkpoint is a
        # snapshot, not new data — CDC/stream consumers keying on
        # dataChange must not reprocess it
        a = _add_action(
            table, m, f, now_ms, names, dv_descs.get(f),
            data_change=False,
            row_base=(rt_bases or {}).get(f),
        )["add"]
        a.setdefault("stats", None)
        a.setdefault("deletionVector", None)
        a.setdefault("baseRowId", None)
        a.setdefault("defaultRowCommitVersion", None)
        add_rows.append({"add": a})
    domain_rows = (
        [{"domainMetadata": _rt_domain_action(rt_hwm)["domainMetadata"]}]
        if rt
        else []
    )
    if v2c:
        # V2 (sidecar) shape: the adds land in ONE parquet under
        # _delta_log/_sidecars/, and the UUID-named manifest holds
        # checkpointMetadata + protocol + metaData + the sidecar
        # pointer — the layout _load_v2_checkpoint consumes and
        # delta-spark's v2Checkpoint writers produce. Publish order
        # is sidecar → manifest → _last_checkpoint, each tmp+rename:
        # a torn write never leaves a manifest naming a missing
        # sidecar.
        sc_dir = log_dir / "_sidecars"
        sc_dir.mkdir(exist_ok=True)
        sc_name = f"{uuid.uuid4().hex}.parquet"
        sc_tmp = log_dir / f".tmp-{uuid.uuid4().hex}.parquet"
        pq.write_table(
            pa.Table.from_pylist(
                add_rows, schema=pa.schema([schema.field("add")])
            ),
            sc_tmp,
        )
        sc_tmp.replace(sc_dir / sc_name)
        sc_stat = (sc_dir / sc_name).stat()
        man_schema = pa.schema(
            [
                (
                    "checkpointMetadata",
                    pa.struct([("version", pa.int64())]),
                ),
                schema.field("protocol"),
                schema.field("metaData"),
                schema.field("domainMetadata"),
                (
                    "sidecar",
                    pa.struct(
                        [
                            ("path", pa.string()),
                            ("sizeInBytes", pa.int64()),
                            ("modificationTime", pa.int64()),
                        ]
                    ),
                ),
            ]
        )
        rows = [
            {"checkpointMetadata": {"version": delta_v}},
            {"protocol": proto},
            {"metaData": meta_row},
            *domain_rows,
            {
                "sidecar": {
                    "path": sc_name,
                    "sizeInBytes": sc_stat.st_size,
                    "modificationTime": int(sc_stat.st_mtime * 1000),
                }
            },
        ]
        dest = (
            log_dir
            / f"{delta_v:020d}.checkpoint.{uuid.uuid4().hex}.parquet"
        )
        tbl = pa.Table.from_pylist(rows, schema=man_schema)
    else:
        rows = [
            {"protocol": proto},
            {"metaData": meta_row},
        ] + domain_rows + add_rows
        dest = log_dir / f"{delta_v:020d}.checkpoint.parquet"
        tbl = pa.Table.from_pylist(rows, schema=schema)
    tmp = log_dir / f".tmp-{uuid.uuid4().hex}.parquet"
    pq.write_table(tbl, tmp)
    tmp.replace(dest)
    lc = log_dir / "_last_checkpoint"
    lc_tmp = log_dir / f".tmp-{uuid.uuid4().hex}"
    lc_tmp.write_text(
        json.dumps({"version": delta_v, "size": len(rows)})
    )
    lc_tmp.replace(lc)


def expire_delta_log(table: TxnTable) -> int:
    """Delta metadata retention for an exported/mirrored log: delete
    every commit json and checkpoint OLDER than the newest checkpoint
    (replay needs exactly that checkpoint plus the JSON tail after
    it). Time travel to an expired version then refuses loudly with
    the reader's existing history-truncated error — never a silent
    partial replay. Runs under the same one-writer export lock.
    Returns the number of files removed."""
    import fcntl

    log_dir = table.root / "_delta_log"
    if not log_dir.exists():
        return 0
    lock_fd = os.open(
        table.root / ".delta_export.lock", os.O_CREAT | os.O_RDWR
    )
    try:
        try:
            fcntl.flock(lock_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            raise ValueError(
                f"table {table.name}: another Delta export holds the "
                f"lock — one log writer at a time"
            )
        ckpts = [
            int(p.name.split(".", 1)[0])
            for p in log_dir.glob("*.checkpoint*.parquet")
            if p.name.split(".", 1)[0].isdigit()
        ]
        if not ckpts:
            return 0
        newest = max(ckpts)
        removed = 0
        for p in log_dir.glob("*.json"):
            if p.stem.isdigit() and int(p.stem) < newest:
                p.unlink()
                removed += 1
        for p in log_dir.glob("*.checkpoint*.parquet"):
            v = p.name.split(".", 1)[0]
            if v.isdigit() and int(v) < newest:
                p.unlink()
                removed += 1
        # V2 sidecars referenced only by the checkpoints just expired
        # are unreachable: keep exactly the files the RETAINED v2
        # manifests name, sweep the rest
        sc_dir = log_dir / "_sidecars"
        if sc_dir.exists():
            import pyarrow.parquet as _pq

            kept_sc: set[str] = set()
            for p in log_dir.glob("*.checkpoint*.parquet"):
                if len(p.name.split(".")) != 4:
                    continue  # classic shapes carry no sidecar rows
                names = set(_pq.read_schema(p).names)
                if "sidecar" not in names:
                    continue
                for row in _pq.read_table(
                    p, columns=["sidecar"]
                ).to_pylist():
                    sc = row.get("sidecar")
                    if sc and sc.get("path"):
                        kept_sc.add(Path(sc["path"]).name)
            for f in sc_dir.iterdir():
                if f.is_file() and f.name not in kept_sc:
                    f.unlink()
                    removed += 1
            if not any(sc_dir.iterdir()):
                sc_dir.rmdir()
        # change-data files referenced ONLY by the jsons just expired
        # are unreachable (checkpoints carry no cdc actions): sweep
        # everything the retained commits don't name
        cdc_dir = table.root / "_change_data"
        if cdc_dir.exists():
            kept: set[str] = set()
            for p in log_dir.glob("*.json"):
                if not p.stem.isdigit():
                    continue
                for line in p.read_text().splitlines():
                    if '"cdc"' not in line:
                        continue
                    action = json.loads(line)
                    if "cdc" in action:
                        kept.add(unquote(action["cdc"]["path"]))
            for f in sorted(cdc_dir.rglob("*")):
                if f.is_file() and str(
                    f.relative_to(table.root)
                ) not in kept:
                    f.unlink()
                    removed += 1
            for d in sorted(
                (d for d in cdc_dir.rglob("*") if d.is_dir()),
                key=lambda d: -len(d.parts),
            ):
                if not any(d.iterdir()):
                    d.rmdir()
            if not any(cdc_dir.iterdir()):
                cdc_dir.rmdir()
        return removed
    finally:
        os.close(lock_fd)


def _normalize_arrow_map(v):
    """pyarrow renders MAP columns as a list of (key, value) pairs (or
    key/value dicts, version-dependent); JSON actions carry plain
    dicts — normalize both to dict."""
    if v is None or isinstance(v, dict):
        return v
    out = {}
    for item in v:
        if isinstance(item, tuple):
            out[item[0]] = item[1]
        else:
            out[item["key"]] = item["value"]
    return out


#: driver-side bound on total decoded DV positions per read — the
#: positions frame is built on the driver (like the Iceberg
#: position-delete serialization's 10M bound); a foreign table with
#: more soft-deleted rows than this needs its writer to compact
_DV_POSITIONS_BOUND = 10_000_000


def _dv_positions_df(spark: SparkSession, path: str, dv_descs: dict):
    """Decode every kept add's deletionVector into ONE
    (_dv_file, _dv_row) frame for the position anti-join — the same
    MOR mechanism TxnTable's reader uses for its own vectors
    (txn.py read lineage), here fed from the public Delta DV format
    (see :mod:`.delta_dv`).

    Two decode strategies, picked by the descriptors' claimed Σ
    cardinality: up to ``_DV_POSITIONS_BOUND`` positions decode on
    the DRIVER (zero extra jobs, Arrow-batched localization — never
    a tuple pickle through Py4J); past it, the descriptor ROWS ship
    to executors and decode inside ``mapInPandas`` — the bound
    becomes per-task instead of per-table, so a 100-TB table with
    hundreds of millions of soft-deleted rows reads instead of
    refusing (round-11 verdict, What's missing #3)."""
    from interop_datalake_spark.lake.delta_dv import load_dv_row_indexes

    claimed = sum(
        int(d.get("cardinality") or 0) for d in dv_descs.values()
    )
    if claimed > _DV_POSITIONS_BOUND:
        return _dv_positions_df_distributed(spark, path, dv_descs)
    import numpy as np
    import pandas as pd

    files: list[str] = []
    chunks: list[np.ndarray] = []
    total = 0
    for f, desc in dv_descs.items():
        idxs = load_dv_row_indexes(path, desc)
        total += len(idxs)
        if total > _DV_POSITIONS_BOUND:
            # descriptors under-claimed cardinality: fall over to the
            # executor path instead of refusing (the driver frame
            # built so far is discarded — decode restarts distributed)
            return _dv_positions_df_distributed(spark, path, dv_descs)
        files.extend([f] * len(idxs))
        chunks.append(np.asarray(idxs, dtype=np.int64))
    pdf = pd.DataFrame(
        {
            "_dv_file": pd.Series(files, dtype="string"),
            "_dv_row": (
                np.concatenate(chunks)
                if chunks
                else np.empty(0, dtype=np.int64)
            ),
        }
    )
    return spark.createDataFrame(pdf)


def _dv_positions_df_distributed(
    spark: SparkSession, path: str, dv_descs: dict
):
    """Executor-side deletion-vector decode: one row per DESCRIPTOR
    (file, descriptor-json) fans out over tasks; each task decodes
    its descriptors with the same pure-Python :mod:`.delta_dv` reader
    and emits (_dv_file, _dv_row) Arrow batches. Driver memory stays
    O(descriptor count); position volume is bounded per task by the
    largest single vector, not the table total. Requires the table
    root to be executor-visible — true wherever the data files
    themselves are readable."""
    rows = [(f, json.dumps(d)) for f, d in dv_descs.items()]
    desc_df = spark.createDataFrame(
        rows, "_dv_file STRING, _desc STRING"
    ).repartition(min(len(rows), 64))

    def expand(batches):
        import numpy as np
        import pandas as pd

        from interop_datalake_spark.lake.delta_dv import (
            load_dv_row_indexes,
        )

        for pdf in batches:
            for f, dj in zip(pdf["_dv_file"], pdf["_desc"]):
                idxs = load_dv_row_indexes(path, json.loads(dj))
                yield pd.DataFrame(
                    {
                        "_dv_file": pd.Series(
                            [f] * len(idxs), dtype="object"
                        ),
                        "_dv_row": np.asarray(idxs, dtype=np.int64),
                    }
                )

    return desc_df.mapInPandas(
        expand, "_dv_file STRING, _dv_row BIGINT"
    )


def _with_row_lineage(fr: DataFrame, root_abs: Path) -> DataFrame:
    """Row lineage off a parquet scan, exactly as TxnTable's own MOR
    reader (txn.py): decoded root-relative path (matching the log's
    add keys) as ``_dv_file`` + position in file as ``_dv_row``. '+'
    is pre-escaped because url_decode form-decodes it."""
    dec = F.url_decode(
        F.replace(
            F.col("_metadata.file_path"), F.lit("+"), F.lit("%2B")
        )
    )
    return fr.select(
        "*",
        F.regexp_extract(
            dec, re.escape(str(root_abs)) + "/(.*)$", 1
        ).alias("_dv_file"),
        F.col("_metadata.row_index").alias("_dv_row"),
    )


def _normalize_add(a: dict) -> dict:
    """Shared post-arrow normalization for an ``add`` struct read
    from a checkpoint/sidecar parquet."""
    a["partitionValues"] = _normalize_arrow_map(
        a.get("partitionValues")
    )
    if not (a.get("deletionVector") or {}).get("storageType"):
        # arrow materializes the absent struct as a dict of Nones
        a["deletionVector"] = None
    return a


def _load_v2_checkpoint(
    log_dir: Path, ckpt_version: int, manifest: Path
):
    """Load a V2 (UUID-named) checkpoint: the manifest parquet holds
    checkpointMetadata / protocol / metaData / sidecar actions (file
    actions MAY also sit inline); each ``sidecar`` row names a
    parquet under ``_delta_log/_sidecars/`` carrying the add set.
    Refuses loudly on a version-mismatched checkpointMetadata or a
    missing sidecar — a partial read would silently drop files."""
    import pyarrow.parquet as pq

    meta = None
    protocol = None
    adds: dict[str, dict] = {}
    sidecars: list[str] = []
    names = set(pq.read_schema(manifest).names)
    cols = [
        c
        for c in (
            "checkpointMetadata", "sidecar", "add", "metaData",
            "protocol",
        )
        if c in names
    ]
    for row in pq.read_table(manifest, columns=cols).to_pylist():
        cm = row.get("checkpointMetadata")
        if cm and cm.get("version") is not None:
            if int(cm["version"]) != ckpt_version:
                raise ValueError(
                    f"V2 checkpoint {manifest.name} claims version "
                    f"{cm['version']} but is named for "
                    f"{ckpt_version} — corrupt or misplaced"
                )
        md = row.get("metaData")
        if md and md.get("schemaString"):
            md["partitionColumns"] = list(
                md.get("partitionColumns") or []
            )
            md["configuration"] = _normalize_arrow_map(
                md.get("configuration")
            )
            meta = md
        pr = row.get("protocol")
        if pr and pr.get("minReaderVersion") is not None:
            protocol = pr
        a = row.get("add")
        if a and a.get("path"):
            adds[unquote(a["path"])] = _normalize_add(a)
        sc = row.get("sidecar")
        if sc and sc.get("path"):
            sidecars.append(sc["path"])
    for rel in sidecars:
        if "://" in rel and not rel.startswith("file:"):
            raise NotImplementedError(
                f"sidecar {rel!r} lives on a non-file scheme"
            )
        p = Path(rel.replace("file://", "").replace("file:", ""))
        if not p.is_absolute():
            p = log_dir / "_sidecars" / rel
        if not p.exists():
            raise ValueError(
                f"V2 checkpoint v{ckpt_version} sidecar {rel} is "
                f"missing — a partial read would silently drop files"
            )
        snames = set(pq.read_schema(p).names)
        scols = [c for c in ("add",) if c in snames]
        if not scols:
            continue  # remove-only sidecar: tombstones, ignored
        for row in pq.read_table(p, columns=scols).to_pylist():
            a = row.get("add")
            if a and a.get("path"):
                adds[unquote(a["path"])] = _normalize_add(a)
    return meta, protocol, adds


def _load_checkpoint(log_dir: Path, ckpt_version: int):
    """Load a parquet CHECKPOINT — classic (single- or multi-part) or
    V2 (UUID-named manifest + ``_sidecars/`` parquet files): the live
    add set + metaData + protocol, via pyarrow (no SparkSession —
    :func:`delta_files` stays engine-free). Checkpoint `remove` rows
    are vacuum tombstones, not live-set members, and are ignored.

    Refuses loudly (round-8 review 3), never a silent partial table:

    - incomplete multi-part checkpoints (the filename encodes
      part/nParts; a partial copy would silently drop files);
    - V2 manifests whose sidecar files are missing, or whose
      checkpointMetadata names a different version;
    - classic checkpoint parquet with no ``add`` column at all (not
      an action layout). JSON-format V2 checkpoints are not
      discovered (parquet is what delta-spark writes); a log that has
      only those refuses with the history-truncated error."""
    import pyarrow.parquet as pq

    parts = sorted(
        log_dir.glob(f"{ckpt_version:020d}.checkpoint*.parquet")
    )
    seen_nparts: set[int] = set()
    part_ids: set[int] = set()
    classic: list[Path] = []
    v2: list[Path] = []
    for part in parts:
        toks = part.name.split(".")
        # classic: v.checkpoint.parquet | v.checkpoint.ppp.nnn.parquet
        # V2:      v.checkpoint.<uniqueStr>.parquet
        if len(toks) == 3:
            classic.append(part)
            continue
        if len(toks) == 5 and toks[2].isdigit() and toks[3].isdigit():
            part_ids.add(int(toks[2]))
            seen_nparts.add(int(toks[3]))
            classic.append(part)
            continue
        if len(toks) == 4:
            v2.append(part)
            continue
        raise NotImplementedError(
            f"checkpoint {part.name} has an unrecognized naming "
            f"shape — refusing rather than guessing its layout"
        )
    if v2 and not classic:
        # several V2 manifests at one version are equivalent states
        # written by racing engines — any one is complete
        return _load_v2_checkpoint(log_dir, ckpt_version, v2[0])
    parts = classic
    if seen_nparts:
        n = max(seen_nparts)
        if len(seen_nparts) != 1 or part_ids != set(range(1, n + 1)):
            raise ValueError(
                f"multi-part checkpoint v{ckpt_version} is incomplete: "
                f"have parts {sorted(part_ids)} of {sorted(seen_nparts)} "
                f"— a partial read would silently drop files"
            )
    meta = None
    protocol = None
    adds: dict[str, dict] = {}
    for part in parts:
        names = set(pq.read_schema(part).names)
        if "add" not in names:
            raise NotImplementedError(
                f"checkpoint {part.name} has no 'add' column — not a "
                f"classic action-per-row checkpoint layout"
            )
        if {"checkpointMetadata", "sidecar"} & names:
            raise NotImplementedError(
                f"checkpoint {part.name} carries V2 checkpoint "
                f"columns (sidecar-based); not supported"
            )
        # project only the action columns we replay — large-table
        # checkpoints carry wide remove/txn/stats_parsed columns
        cols = [
            c for c in ("add", "metaData", "protocol") if c in names
        ]
        tbl = pq.read_table(part, columns=cols)
        for row in tbl.to_pylist():
            md = row.get("metaData")
            if md and md.get("schemaString"):
                md["partitionColumns"] = list(
                    md.get("partitionColumns") or []
                )
                md["configuration"] = _normalize_arrow_map(
                    md.get("configuration")
                )
                meta = md
            pr = row.get("protocol")
            if pr and pr.get("minReaderVersion") is not None:
                protocol = pr
            a = row.get("add")
            if a and a.get("path"):
                adds[unquote(a["path"])] = _normalize_add(a)
    return meta, protocol, adds


def _replay_log(path: str, version: int | None):
    """Resolve the snapshot at ``version`` (default latest): start
    from the newest usable parquet CHECKPOINT ≤ target whose JSON
    chain to the target is complete (Delta's own replay rule), else a
    full JSON replay from version 0. Returns (metaData, adds) where
    adds maps DECODED relative path → its latest add action."""
    log_dir = Path(path) / "_delta_log"
    json_commits = {
        int(p.stem): p
        for p in log_dir.glob("*.json")
        if p.stem.isdigit()
    }
    ckpt_versions = sorted(
        {
            int(p.name.split(".", 1)[0])
            for p in log_dir.glob("*.checkpoint*.parquet")
            if p.name.split(".", 1)[0].isdigit()
        }
    )
    all_versions = set(json_commits) | set(ckpt_versions)
    if not all_versions:
        raise FileNotFoundError(f"no Delta commit json under {log_dir}")
    target = max(all_versions) if version is None else version
    if version is not None and version not in all_versions:
        hint = (
            " (history truncated before the earliest retained "
            "checkpoint)"
            if version < max(all_versions)
            else ""
        )
        raise ValueError(
            f"Delta version {version} not present under {log_dir}{hint}"
        )

    def chain_ok(start: int) -> bool:
        return all(v in json_commits for v in range(start, target + 1))

    chosen = next(
        (
            c
            for c in sorted(
                (c for c in ckpt_versions if c <= target), reverse=True
            )
            if chain_ok(c + 1)
        ),
        None,
    )
    if chosen is None and not chain_ok(0):
        raise ValueError(
            f"Delta log at {log_dir}: history truncated — no complete "
            f"JSON chain from version 0 to {target} and no usable "
            f"checkpoint parquet at or before it"
        )
    if chosen is not None:
        meta, protocol, adds = _load_checkpoint(log_dir, chosen)
        start = chosen + 1
    else:
        meta, protocol, adds = None, None, {}
        start = 0
    for v in range(start, target + 1):
        try:
            text = json_commits[v].read_text()
        except FileNotFoundError:
            # a writer replaced the log or recovered an orphan between
            # our listing and this read — a clear retryable error, not
            # a raw crash mid-replay (round-8 review 6)
            raise ValueError(
                f"Delta log at {log_dir} changed concurrently during "
                f"replay (commit v{v} vanished); retry the read"
            )
        for line in text.splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "metaData" in action:
                meta = action["metaData"]
            elif "protocol" in action:
                protocol = action["protocol"]
            elif "add" in action:
                a = action["add"]
                # protocol paths are URL-encoded; key and resolve by
                # the DECODED on-disk path so add/remove pairs match
                # regardless of each writer's encoding choices
                adds[unquote(a["path"])] = a
            elif "remove" in action:
                from interop_datalake_spark.lake.delta_dv import (
                    dv_unique_id,
                )

                r = action["remove"]
                p = unquote(r["path"])
                cur = adds.get(p)
                rid = dv_unique_id(r.get("deletionVector"))
                # Delta's reconciliation (delta-spark's
                # InMemoryLogReplay) keys the live set on
                # (path, dvUniqueId): a remove cancels only the add
                # carrying the SAME vector id, where "no DV" (None)
                # matches "no DV". This makes replay order-insensitive
                # within a version — the DV-introduction shape may
                # list add(path, new DV) BEFORE remove(path, no DV)
                # for the same path in one commit, and a path-keyed
                # wildcard pop would tombstone the live file. A
                # remove naming a vector the current add does not
                # carry is a no-op tombstone.
                if cur is not None and rid == dv_unique_id(
                    cur.get("deletionVector")
                ):
                    adds.pop(p)
    if meta is None:
        raise ValueError(f"no metaData action in Delta log {log_dir}")
    _check_reader_features(meta, protocol)
    return meta, adds


#: reader features this replay handles correctly: timestampNtz is a
#: plain type, vacuumProtocolCheck constrains writers only, and
#: deletionVectors is implemented (MOR position anti-join via
#: delta_dv decode) — any OTHER
#: feature (typeWidening…) could change
#: how the data must be read and is refused loudly. columnMapping is
#: safe because both published modes are implemented — 'name' via
#: _physical_schema's physicalName renames, 'id' via parquet
#: field-id resolution (Spark's fieldId read path); unknown future
#: modes still refuse in _check_reader_features.
_SAFE_READER_FEATURES = {
    "timestampNtz",
    "vacuumProtocolCheck",
    "deletionVectors",
    "columnMapping",
    "v2Checkpoint",  # _load_v2_checkpoint follows the sidecars
}


def _physical_schema(st: StructType, with_field_ids: bool = False):
    """The PHYSICAL twin of a column-mapped logical schema: every
    field (recursively — nested struct fields are renamed in the
    parquet too) takes its ``delta.columnMapping.physicalName``
    metadata, falling back to the logical name. With
    ``with_field_ids`` (the ``id``-mode resolution rule) each field
    also carries its ``delta.columnMapping.id`` as
    ``parquet.field.id`` StructField metadata — the key Spark's
    parquet reader matches columns by under
    ``spark.sql.parquet.fieldId.read.enabled``; name mode must NOT
    attach them (Spark refuses id-bearing request schemas while that
    conf is off). Returns ``(physical StructType, {top-level
    logical → physical})``. The read path scans with physical names
    and then casts each top-level column to its logical type (struct
    casts rename nested fields positionally), so a mapped table
    reads back fully logical."""
    from pyspark.sql.types import (
        ArrayType,
        MapType,
        StructField,
    )

    def conv_dt(dt):
        if isinstance(dt, StructType):
            return StructType([conv_field(f) for f in dt.fields])
        if isinstance(dt, ArrayType):
            return ArrayType(conv_dt(dt.elementType), dt.containsNull)
        if isinstance(dt, MapType):
            return MapType(
                conv_dt(dt.keyType),
                conv_dt(dt.valueType),
                dt.valueContainsNull,
            )
        return dt

    def conv_field(f: StructField) -> StructField:
        md = f.metadata or {}
        phys = md.get("delta.columnMapping.physicalName") or f.name
        fid = md.get("delta.columnMapping.id")
        out_md = (
            {"parquet.field.id": int(fid)}
            if with_field_ids and fid is not None
            else {}
        )
        return StructField(phys, conv_dt(f.dataType), f.nullable, out_md)

    phys_st = StructType([conv_field(f) for f in st.fields])
    phys_of = {
        f.name: pf.name for f, pf in zip(st.fields, phys_st.fields)
    }
    return phys_st, phys_of


def _check_reader_features(meta: dict, protocol: dict | None) -> None:
    """Silently misreading a feature-bearing table is the worst
    failure mode (round-8 review 3): column mapping renames physical
    parquet columns, so reading by logical names yields all-NULL
    columns with no error. ``name`` mode resolves by the
    schemaString's per-field ``delta.columnMapping.physicalName``
    metadata; ``id`` mode resolves strictly by parquet FIELD ID —
    the read path carries each field's ``delta.columnMapping.id`` as
    ``parquet.field.id`` schema metadata and enables
    ``spark.sql.parquet.fieldId.read.enabled``, so Spark's parquet
    reader matches columns by id regardless of their physical names
    (see :func:`_physical_schema`). Unknown future modes refuse."""
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode"
    )
    if mode and mode not in ("none", "name", "id"):
        raise NotImplementedError(
            f"delta.columnMapping.mode={mode!r}: only 'name' "
            f"(physicalName metadata) and 'id' (parquet field-id) "
            f"resolution are implemented"
        )
    if mode == "id":
        # a field with no recorded id can't resolve by id; Spark's
        # fieldId reader would silently fall back to NAME matching
        # for it — exactly the wrong-column read this gate exists to
        # prevent. The spec requires ids on EVERY field of a mapped
        # table — nested struct fields included (they resolve by id
        # in the parquet too) — so a missing one anywhere in the
        # tree is corrupt metadata: refuse.
        missing: list[str] = []

        def walk_type(t, name):
            # descend through array/map wrappers: struct fields nested
            # inside them resolve by id too (Spark's fieldId reader
            # handles them — probed empirically against pyarrow-written
            # field ids on list elements and map values), so their ids
            # are load-bearing and must be present
            if not isinstance(t, dict):
                return
            kind = t.get("type")
            if kind == "struct":
                walk(t["fields"], name + ".")
            elif kind == "array":
                walk_type(t.get("elementType"), name + ".element")
            elif kind == "map":
                walk_type(t.get("keyType"), name + ".key")
                walk_type(t.get("valueType"), name + ".value")

        def walk(fields, prefix):
            for f in fields:
                name = f"{prefix}{f['name']}"
                if (f.get("metadata") or {}).get(
                    "delta.columnMapping.id"
                ) is None:
                    missing.append(name)
                walk_type(f.get("type"), name)

        walk(json.loads(meta["schemaString"])["fields"], "")
        if missing:
            raise ValueError(
                f"delta.columnMapping.mode='id' but field(s) "
                f"{missing} carry no delta.columnMapping.id — "
                f"corrupt mapping metadata; refusing rather than "
                f"matching by name"
            )
    if protocol:
        feats = set(protocol.get("readerFeatures") or [])
        unsupported = feats - _SAFE_READER_FEATURES
        if unsupported:
            raise NotImplementedError(
                f"table requires reader features {sorted(unsupported)} "
                f"this replay does not implement"
            )


def _stat_le(a, b) -> bool:
    """Conservative bound compare for stats JSON values: numeric when
    both coerce, else string order (matching the exporter's recorded
    encodings and delta-spark's typed JSON)."""
    try:
        return float(a) <= float(b)
    except (TypeError, ValueError):
        return str(a) <= str(b)


def _filter_values(want) -> list:
    """One normalization for a partition_filter value spec, shared by
    pruning AND the residual filter so the two can never drift
    (round-8 review 3)."""
    return list(want) if isinstance(want, (list, tuple, set)) else [want]


def _canon_partition_value(v):
    """Delta partitionValues are strings in the writers' canonical
    rendering — notably lowercase booleans ('true'/'false'), which
    Python's str() would miss ('True')."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _prune_adds(
    adds: dict[str, dict],
    key_range=None,
    partition_filter: dict | None = None,
) -> list[str]:
    from interop_datalake_spark.lake.txn import _normalize_key_ranges

    files = list(adds)
    if partition_filter:
        for c, want in partition_filter.items():
            wants = {
                _canon_partition_value(w) for w in _filter_values(want)
            }
            # pruning may only drop files it can PROVE are out of
            # range (txn.py's resolve_files invariant): an add whose
            # partitionValues lack the column — unpartitioned table,
            # data column, or an older partition spec — is KEPT and
            # the residual row filter decides (round-8 review 3)
            files = [
                f
                for f in files
                if c not in (adds[f].get("partitionValues") or {})
                or (adds[f]["partitionValues"] or {}).get(c) in wants
            ]
    for col, lo, hi in _normalize_key_ranges(key_range):
        kept = []
        for f in files:
            raw = adds[f].get("stats")
            mn = mx = None
            if raw:
                try:
                    s = json.loads(raw)
                    mn = (s.get("minValues") or {}).get(col)
                    mx = (s.get("maxValues") or {}).get(col)
                except (ValueError, AttributeError):
                    pass  # unparseable stats: conservatively keep
            if (
                mn is None
                or mx is None
                or (_stat_le(mn, hi) and _stat_le(lo, mx))
            ):
                kept.append(f)
        files = kept
    return files


def delta_files(
    path: str,
    version: int | None = None,
    key_range=None,
    partition_filter: dict | None = None,
) -> list[str]:
    """The decoded relative data paths a :func:`read_delta` with these
    predicates opens — the log's own pruning made observable (the
    ``resolve_files`` analog for external Delta tables):
    ``partition_filter={col: value_or_list}`` matches add
    partitionValues (adds that don't record the column are
    conservatively kept — the resolve_files invariant: only drop what
    is PROVEN out of range); ``key_range=(col, lo, hi)`` — or a LIST
    of such tuples, intersecting, same spelling as
    ``TxnTable.read`` — skips files whose recorded add-stats min/max
    don't intersect (stats-less or unparseable adds kept). This is
    what makes the reader credible at scale: a point read over a
    clustered exported table plans ~one file, not the whole add
    set. Predicates name LOGICAL columns; under
    ``columnMapping=name`` they are translated to the physical names
    the add stats / partitionValues are keyed by."""
    meta, adds = _replay_log(path, version)
    st = StructType.fromJson(json.loads(meta["schemaString"]))
    _, phys_of = _mapping_ctx(meta, st)
    key_range, partition_filter = _map_predicates(
        phys_of, key_range, partition_filter
    )
    return _prune_adds(adds, key_range, partition_filter)


def _mapping_ctx(meta: dict, st: StructType, spark=None):
    """(physical schema, {logical → physical}) for the table — the
    identity pair unless the table is column-mapped. For ``id`` mode
    the physical schema's fields carry ``parquet.field.id`` metadata
    and, when a session is given, ``spark.sql.parquet.fieldId.read.
    enabled`` is switched on so the scan resolves columns strictly by
    id. The conf stays on FOR THE REST OF THE SESSION — flipping it
    back before the lazy scan executes would silently restore name
    matching (Spark reads the conf at execution, not plan, time).
    Known side effect: the flip is inert for request schemas without
    ``parquet.field.id`` metadata (Spark keeps name matching there),
    but a later unrelated ``spark.read.schema(...)`` whose
    user-supplied schema DOES carry field-id metadata will resolve by
    id instead of name from then on. Callers who need the old
    behavior back can reset the conf themselves once every id-mapped
    DataFrame from this reader has been fully consumed."""
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode"
    )
    if mode in ("name", "id"):
        if mode == "id" and spark is not None:
            spark.conf.set(
                "spark.sql.parquet.fieldId.read.enabled", "true"
            )
        return _physical_schema(st, with_field_ids=(mode == "id"))
    return st, {f.name: f.name for f in st.fields}


def _map_predicates(
    phys_of: dict, key_range, partition_filter: dict | None
):
    """Translate caller predicates (logical names) to the physical
    names pruning compares against (add stats / partitionValues are
    physically keyed under column mapping)."""
    from interop_datalake_spark.lake.txn import _normalize_key_ranges

    mapped_kr = [
        (phys_of.get(col, col), lo, hi)
        for col, lo, hi in _normalize_key_ranges(key_range)
    ] or None
    mapped_pf = (
        {phys_of.get(c, c): v for c, v in partition_filter.items()}
        if partition_filter
        else None
    )
    return mapped_kr, mapped_pf


def _to_epoch_ms(ts) -> int:
    """A TIMESTAMP AS OF argument → epoch millis: datetime (naive =
    UTC, the repo's session convention), ISO-8601 string, or raw
    epoch millis int."""
    from datetime import datetime, timezone

    if isinstance(ts, (int, float)):
        return int(ts)
    if isinstance(ts, str):
        ts = datetime.fromisoformat(ts)
    if isinstance(ts, datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        return int(ts.timestamp() * 1000)
    raise TypeError(f"unsupported timestamp {ts!r}")


def _delta_commit_history(path: str) -> list[tuple[int, int]]:
    """``[(version, monotonized_ts_ms), …]`` ascending over the
    RETAINED commit jsons — per-commit timestamps from ``commitInfo``
    when present, else the commit file's mtime, monotonized ascending
    exactly like delta-spark's history reconstruction (file mtimes can
    go backwards after copies; an out-of-order stamp must not make a
    later version resolve earlier). Shared by :func:`delta_version_at`
    and the change feed's ``from_timestamp`` resolution so the two
    can never drift."""
    log_dir = Path(path) / "_delta_log"
    json_commits = {
        int(p.stem): p
        for p in log_dir.glob("*.json")
        if p.stem.isdigit()
    }
    if not json_commits:
        raise FileNotFoundError(f"no Delta commit json under {log_dir}")
    history: list[tuple[int, int]] = []
    prev_ts = None
    for v in sorted(json_commits):
        parsed = parse_cdc_commit(json_commits[v].read_text())
        t = parsed["ts_ms"]
        if t is None:
            t = int(json_commits[v].stat().st_mtime * 1000)
        if prev_ts is not None and t < prev_ts:
            t = prev_ts  # monotonize (delta-spark's rule)
        prev_ts = t
        history.append((v, t))
    return history


def delta_version_at(path: str, timestamp) -> int:
    """Delta ``TIMESTAMP AS OF`` resolution: the LAST version whose
    commit timestamp is ≤ the requested instant. Per-commit
    timestamps come from ``commitInfo`` when present, else the commit
    file's mtime — and are MONOTONIZED ascending exactly like
    delta-spark's history reconstruction (file mtimes can go
    backwards after copies; an out-of-order stamp must not make a
    later version resolve earlier). Refuses an instant before the
    earliest RETAINED commit (expired history can't prove which
    version held) and after the latest (the caller probably wants
    plain latest — being implicit about that hides clock skew
    bugs)."""
    history = _delta_commit_history(path)
    want = _to_epoch_ms(timestamp)
    out = None
    for v, t in history:
        if t <= want:
            out = v
    latest_ts = history[-1][1]
    log_dir = Path(path) / "_delta_log"
    if out is None:
        raise ValueError(
            f"timestamp {timestamp!r} is before the earliest retained "
            f"commit of {log_dir} — history was expired or the table "
            f"is newer than the instant"
        )
    if want > latest_ts:
        # delta-spark's guard: an instant past the newest commit
        # resolves loudly, not silently to "latest"
        raise ValueError(
            f"timestamp {timestamp!r} is after the latest commit "
            f"({latest_ts} ms); read the table without time travel "
            f"for the current snapshot"
        )
    return out


def delta_history(spark: SparkSession, path: str) -> DataFrame:
    """DESCRIBE HISTORY over a foreign ``_delta_log`` — one row per
    RETAINED commit json, newest first (delta-spark's ordering): the
    provenance ``commitInfo`` fields plus per-commit action counts.
    The TxnTable sibling of :meth:`TxnTable.history_df
    <interop_datalake_spark.lake.txn.TxnTable.history_df>`, completing
    the audit surface the file-level ``delta_files`` observable
    started.

    ``timestamp`` is the AUTHORITATIVE commit time — the monotonized
    value time travel resolves by (``inCommitTimestamp`` preferred,
    then ``commitInfo.timestamp``, then file mtime) — while
    ``in_commit_timestamp`` carries the raw ICT stamp (NULL on
    non-ICT commits) so audits can see which regime each commit is
    in. Driver work is O(retained commits) json parses — metadata
    scale, the same bound as log replay; no data files open."""
    from datetime import datetime, timezone

    log_dir = Path(path) / "_delta_log"
    json_commits = {
        int(p.stem): p
        for p in log_dir.glob("*.json")
        if p.stem.isdigit()
    }
    if not json_commits:
        raise FileNotFoundError(f"no Delta commit json under {log_dir}")
    mono_ts = dict(_delta_commit_history(path))
    rows = []
    for v in sorted(json_commits, reverse=True):
        ci = {}
        n_add = n_remove = n_cdc = 0
        for line in json_commits[v].read_text().splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "commitInfo" in action:
                ci = action["commitInfo"]
            elif "add" in action:
                n_add += 1
            elif "remove" in action:
                n_remove += 1
            elif "cdc" in action:
                n_cdc += 1
        params = ci.get("operationParameters") or {}
        txn_v = params.get("txnVersion")
        ict = ci.get("inCommitTimestamp")
        rows.append(
            (
                v,
                datetime.fromtimestamp(
                    mono_ts[v] / 1000, tz=timezone.utc
                ),
                ci.get("operation"),
                ci.get("engineInfo"),
                int(txn_v) if txn_v is not None else None,
                int(ict) if ict is not None else None,
                n_add,
                n_remove,
                n_cdc,
            )
        )
    return spark.createDataFrame(
        rows,
        "version BIGINT, timestamp TIMESTAMP, operation STRING, "
        "engine_info STRING, txn_version BIGINT, "
        "in_commit_timestamp BIGINT, n_adds INT, n_removes INT, "
        "n_cdc INT",
    )


def read_delta(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    key_range=None,
    partition_filter: dict | None = None,
    timestamp=None,
    with_row_tracking: bool = False,
) -> DataFrame:
    """Read a Delta table by replaying its JSON transaction log — no
    delta-spark needed. ``version`` is Delta's ``VERSION AS OF``
    (default: latest). Supports add/remove replay keyed on
    (path, dvUniqueId) per Delta's reconciliation — order-insensitive
    within a version — last-metaData-wins schema/partition resolution,
    per-file partition-value injection cast to the schema's types,
    and manifest-level data skipping via ``key_range`` /
    ``partition_filter`` (see :func:`delta_files`; residual row
    filters still apply — pruning drops files, not rows).

    Replay starts from the newest usable parquet CHECKPOINT (single-
    or multi-part) when the JSON chain alone can't reach the target —
    the layout every long-lived Delta table has after log cleanup.
    Adds carrying ``deletionVector`` (the default-on shape modern
    Delta writers produce) are read merge-on-read: each vector is
    decoded from the public format (:mod:`.delta_dv` — inline Z85,
    relative UUID-named file, or absolute path) and applied as a
    position anti-join on ``_metadata.row_index``, the same MOR
    mechanism TxnTable's own reader uses. ``columnMapping=name``
    tables read back fully LOGICAL: the scan uses the physical names
    from the schemaString's per-field metadata (nested fields too),
    predicates/pruning translate logical → physical, and the result
    is renamed/cast to the logical schema. Refuses loudly (never
    silently wrong): truncated logs with no usable checkpoint,
    and unknown DV storage types / corrupt vectors (CRC). DV sets
    past the driver-side decode bound decode on EXECUTORS instead
    (mapInPandas over descriptor rows — per-task bound, no refusal).
    Column-mapped tables read under BOTH modes: ``name`` resolves by
    physicalName metadata, ``id`` strictly by parquet field id
    (Spark's fieldId read path — NOTE: reading an id-mapped table
    enables ``spark.sql.parquet.fieldId.read.enabled`` for the REST
    of the session, see :func:`_mapping_ctx` for why and what it
    affects). ``timestamp`` is
    Delta's ``TIMESTAMP AS OF`` (datetime / ISO string / epoch
    millis; mutually exclusive with ``version``) — resolved via
    :func:`delta_version_at`.

    ``with_row_tracking=True`` projects the ROW TRACKING metadata
    columns ``_row_id`` / ``_row_commit_version`` (the
    ``rowTracking`` writer feature this repo's mirror stamps with
    ``export_delta_log(row_tracking=True)``): a row's id is its
    file's ``baseRowId`` + its physical position, its commit version
    the file's ``defaultRowCommitVersion`` — both stable across DV
    deletes and re-adds by the feature's preservation contract.
    Files without a ``baseRowId`` (pre-enablement, never backfilled)
    read NULL ids."""
    if timestamp is not None:
        if version is not None:
            raise ValueError(
                "pass either version or timestamp, not both"
            )
        version = delta_version_at(path, timestamp)
    meta, adds = _replay_log(path, version)
    st = StructType.fromJson(json.loads(meta["schemaString"]))
    rt = with_row_tracking
    if rt:
        clash = {f.name for f in st.fields} & {
            "_row_id", "_row_commit_version",
        }
        if clash:
            raise ValueError(
                f"table columns {sorted(clash)} collide with the "
                f"row-tracking metadata columns — rename upstream"
            )
    phys_st, phys_of = _mapping_ctx(meta, st, spark)
    logical_of = {p: l for l, p in phys_of.items()}
    kr_phys, pf_phys = _map_predicates(
        phys_of, key_range, partition_filter
    )
    keep = set(_prune_adds(adds, kr_phys, pf_phys))
    adds = {f: a for f, a in adds.items() if f in keep}
    # partitionColumns are logical names in the spec, but tolerate a
    # writer that recorded physical ones (map back); partitionValues
    # keys are PHYSICAL under column mapping
    pcols = [
        logical_of.get(c, c)
        for c in (meta.get("partitionColumns") or [])
    ]
    ptypes = {
        f.name: f.dataType.simpleString()
        for f in st.fields
        if f.name in pcols
    }
    data_fields = [
        (lf, pf)
        for lf, pf in zip(st.fields, phys_st.fields)
        if lf.name not in pcols
    ]
    data_schema = StructType([pf for _, pf in data_fields])
    mapped = any(lf.name != pf.name or lf.dataType != pf.dataType
                 for lf, pf in data_fields)
    if not adds:
        empty_st = st
        if rt:
            from pyspark.sql.types import LongType, StructField

            empty_st = StructType(
                st.fields
                + [
                    StructField("_row_id", LongType()),
                    StructField("_row_commit_version", LongType()),
                ]
            )
        return spark.createDataFrame([], empty_st)
    # group files by their partition-value tuple: each group reads
    # once and injects its literals (combos are bounded by the
    # partition cardinality, never per-file frames)
    groups: dict[tuple, list[str]] = {}
    for f, a in adds.items():
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(phys_of.get(c, c)) for c in pcols)
        groups.setdefault(key, []).append(f)
    dv_descs = {
        f: a["deletionVector"]
        for f, a in adds.items()
        if a.get("deletionVector")
    }
    # decode vectors BEFORE planning any scan: an unknown storage
    # type / corrupt vector fails fast, driver-side, zero jobs
    pos = _dv_positions_df(spark, path, dv_descs) if dv_descs else None
    frames = []
    dv_frames = []
    root_abs = Path(path).resolve()
    for key, files in groups.items():
        splits = (
            ([f for f in files if f not in dv_descs], False),
            ([f for f in files if f in dv_descs], True),
        )
        for sel, vectored in splits:
            if not sel:
                continue
            fr = spark.read.schema(data_schema).parquet(
                *[str(Path(path) / f) for f in sel]
            )
            if vectored or rt:
                # row tracking shares the MOR lineage plumbing: ids
                # are baseRowId + physical position, so EVERY split
                # needs (file, position) when projecting them
                fr = _with_row_lineage(fr, root_abs)
            if mapped:
                # physical → logical rename AFTER the lineage select
                # (the _metadata pseudo-column is only reachable from
                # the scan relation); the cast renames nested struct
                # fields positionally, so deep physical names
                # disappear too
                keep_extra = (
                    ["_dv_file", "_dv_row"]
                    if vectored or rt
                    else []
                )
                fr = fr.select(
                    *[
                        F.col(pf.name)
                        .cast(lf.dataType)
                        .alias(lf.name)
                        for lf, pf in data_fields
                    ],
                    *keep_extra,
                )
            for c, v in zip(pcols, key):
                fr = fr.withColumn(
                    c,
                    (F.lit(None) if v is None else F.lit(v)).cast(
                        ptypes.get(c, "string")
                    ),
                )
            (dv_frames if vectored else frames).append(fr)
    if dv_frames:
        vec = dv_frames[0]
        for fr in dv_frames[1:]:
            vec = vec.unionByName(fr)
        vec = vec.join(pos, ["_dv_file", "_dv_row"], "left_anti")
        if not rt:
            vec = vec.drop("_dv_file", "_dv_row")
        frames.append(vec)
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    keep_cols = [f.name for f in st.fields]
    if rt:
        # per-file (baseRowId, defaultRowCommitVersion) as a
        # broadcast map — bounded by file count, the MOR pattern.
        # Survivors of a DV anti-join keep their PHYSICAL positions,
        # so ids stay stable under merge-on-read deletes.
        base_rows = [
            (
                f,
                int(a["baseRowId"])
                if a.get("baseRowId") is not None
                else None,
                int(a["defaultRowCommitVersion"])
                if a.get("defaultRowCommitVersion") is not None
                else None,
            )
            for f, a in adds.items()
        ]
        bmap = spark.createDataFrame(
            base_rows, "_dv_file STRING, _rt_base BIGINT, _rt_dcv BIGINT"
        )
        out = (
            out.join(F.broadcast(bmap), "_dv_file", "left")
            .withColumn(
                "_row_id", F.col("_rt_base") + F.col("_dv_row")
            )
            .withColumn("_row_commit_version", F.col("_rt_dcv"))
            .drop("_rt_base", "_rt_dcv", "_dv_file", "_dv_row")
        )
        keep_cols += ["_row_id", "_row_commit_version"]
    out = out.select(*keep_cols)
    # residual row filters: pruning dropped whole files; rows inside
    # kept files must still match the predicates. Same normalization
    # helpers as the pruning side, so the two can never drift.
    from interop_datalake_spark.lake.txn import _normalize_key_ranges

    for col, lo, hi in _normalize_key_ranges(key_range):
        out = out.filter(F.col(col).between(lo, hi))
    if partition_filter:
        for c, want in partition_filter.items():
            vals = [
                _canon_partition_value(w) for w in _filter_values(want)
            ]
            cond = F.col(c).cast("string").isin(
                [v for v in vals if v is not None]
            )
            if any(v is None for v in vals):
                cond = cond | F.col(c).isNull()
            out = out.filter(cond)
    return out


def parse_cdc_commit(text: str) -> dict:
    """One commit json's CDC-relevant actions, the SINGLE parse rule
    batch (:func:`read_delta_changes`) and streaming
    (``streaming/delta_source.py`` delta_cdc) CDC share so the two
    can never drift on identical commits: ``{"ts_ms": commitInfo
    timestamp or None, "cdc": [cdc actions], "adds": {decoded path →
    add}, "removes": {decoded path → remove}, "metas": [metaData],
    "protocols": [protocol]}``. Only ``dataChange=true`` file actions
    count (OPTIMIZE rewrites are no change)."""
    out = {
        "ts_ms": None,
        "cdc": [],
        "adds": {},
        "removes": {},
        "metas": [],
        "protocols": [],
    }
    for line in text.splitlines():
        if not line.strip():
            continue
        action = json.loads(line)
        if "commitInfo" in action:
            # in-commit timestamps (the inCommitTimestamp writer
            # feature): when present, it is THE authoritative commit
            # time — monotone by protocol, immune to file copies —
            # and delta-spark's time travel prefers it over the
            # wall-clock `timestamp` field
            ict = action["commitInfo"].get("inCommitTimestamp")
            t = (
                int(ict)
                if ict is not None
                else action["commitInfo"].get("timestamp")
            )
            if t is not None:
                out["ts_ms"] = int(t)
        elif "cdc" in action:
            out["cdc"].append(action["cdc"])
        elif "add" in action:
            a = action["add"]
            if a.get("dataChange", True):
                out["adds"][unquote(a["path"])] = a
        elif "remove" in action:
            r = action["remove"]
            if r.get("dataChange", True):
                out["removes"][unquote(r["path"])] = r
        elif "metaData" in action:
            out["metas"].append(action["metaData"])
        elif "protocol" in action:
            out["protocols"].append(action["protocol"])
    return out


def read_delta_changes(
    spark: SparkSession,
    path: str,
    from_version: int | None = None,
    to_version: int | None = None,
    from_timestamp=None,
    to_timestamp=None,
) -> DataFrame:
    """Delta CHANGE DATA FEED read over a foreign ``_delta_log`` —
    the ``table_changes()`` / ``readChangeFeed`` analog, and the
    Delta sibling of :func:`~interop_datalake_spark.lake.
    iceberg_interop.read_iceberg_changes` and
    ``TxnTable.read_changes(include_deletes=True)``: the rows changed
    by the commits in ``(from_version, to_version]`` (default
    ``to_version``: latest), tagged ``_change_type`` /
    ``_commit_version`` / ``_commit_timestamp``.

    Per-commit semantics follow the protocol's Change Data Files
    rule (delta PROTOCOL.md):

    - a commit carrying ``cdc`` actions is AUTHORITATIVE: its change
      data is exactly the referenced ``_change_data`` parquet files
      (each row already carries ``_change_type`` — insert /
      update_preimage / update_postimage / delete), and the commit's
      add/remove actions are ignored for CDC purposes;
    - otherwise the change set derives from the file actions, the
      same derivation delta-spark's CDCReader applies: ``add`` with
      ``dataChange=true`` emits the file's live rows as ``insert``
      (merge-on-read if the add carries a deletionVector); ``remove``
      with ``dataChange=true`` emits the file's rows live at removal
      (its named vector applied) as ``delete``; and the DV-update
      pair — remove(path, old DV) + add(path, new DV), the mirror's
      own DELETE shape — emits exactly the position DIFF: rows in
      new∖old as ``delete``, rows in old∖new (a restore) as
      ``insert``. ``dataChange=false`` rewrites (OPTIMIZE) emit
      nothing.

    ``_commit_timestamp`` comes from the commit's ``commitInfo``
    timestamp when present, else the commit file's mtime — Delta's
    own in-commit-timestamp fallback order.

    Column-mapped tables read under both modes (``name`` /``id``),
    with the same physical→logical rename pass as the snapshot
    reader. Refuses loudly (never a wrong row): expired in-window
    commit jsons, a partitioned remove without recorded
    ``partitionValues``, and DV decode past the driver bound."""
    log_dir = Path(path) / "_delta_log"
    json_commits = {
        int(p.stem): p
        for p in log_dir.glob("*.json")
        if p.stem.isdigit()
    }
    if not json_commits:
        raise FileNotFoundError(f"no Delta commit json under {log_dir}")
    # timestamp bounds (Delta's startingTimestamp/endingTimestamp):
    # the START includes the FIRST commit stamped at-or-after the
    # instant (delta-spark's startingTimestamp rule — a commit at
    # exactly the instant is IN), so it resolves to (that version)-1
    # in this function's exclusive-from spelling, with a floor of -1
    # when the instant predates the earliest retained commit
    # (delta-spark resolves to version 0 there). An instant past the
    # newest commit refuses loudly (delta-spark's
    # timestampGreaterThanLatestCommit). The END resolves to the
    # version at the instant inclusively (endingTimestamp). Version
    # args take the same (from, to] spelling directly.
    if from_timestamp is not None:
        if from_version is not None:
            raise ValueError(
                "pass either from_version or from_timestamp, not both"
            )
        history = _delta_commit_history(path)
        want = _to_epoch_ms(from_timestamp)
        if want > history[-1][1]:
            raise ValueError(
                f"from_timestamp {from_timestamp!r} is after the "
                f"latest commit ({history[-1][1]} ms); no changes "
                f"exist at or past it"
            )
        from_version = next(
            v for v, t in history if t >= want
        ) - 1
    if to_timestamp is not None:
        if to_version is not None:
            raise ValueError(
                "pass either to_version or to_timestamp, not both"
            )
        to_version = delta_version_at(path, to_timestamp)
    if from_version is None:
        raise ValueError(
            "read_delta_changes needs from_version or from_timestamp "
            "(-1 = the whole retained history)"
        )
    to = max(json_commits) if to_version is None else to_version
    if from_version > to:
        raise ValueError(
            f"from_version {from_version} is past to_version {to}"
        )
    missing = [
        v for v in range(from_version + 1, to + 1)
        if v not in json_commits
    ]
    if missing:
        raise ValueError(
            f"commit json for version(s) {missing} gone — history "
            f"was expired by log cleanup; a change feed over them "
            f"cannot be reconstructed (read full snapshots instead)"
        )
    # schema + feature gate at the window head (checks reader
    # features; last metaData wins — schema-on-read null-fills older
    # files exactly like the snapshot reader)
    meta, _ = _replay_log(path, to)
    st = StructType.fromJson(json.loads(meta["schemaString"]))
    # column mapping (name AND id modes): scan by the physical
    # schema, rename/cast back to logical after — the same pass the
    # snapshot reader applies. partitionValues and partitionColumns
    # are PHYSICALLY keyed in mapped logs; cdc files' _change_type
    # column is a protocol column and is never mapped.
    phys_st, phys_of = _mapping_ctx(meta, st, spark)
    logical_of = {p: l for l, p in phys_of.items()}
    pcols = [
        logical_of.get(c, c)
        for c in (meta.get("partitionColumns") or [])
    ]
    ptypes = {
        f.name: f.dataType.simpleString()
        for f in st.fields
        if f.name in pcols
    }
    data_fields = [
        (lf, pf)
        for lf, pf in zip(st.fields, phys_st.fields)
        if lf.name not in pcols
    ]
    data_schema = StructType([pf for _, pf in data_fields])
    mapped = any(
        lf.name != pf.name or lf.dataType != pf.dataType
        for lf, pf in data_fields
    )
    from pyspark.sql.types import StringType, StructField

    cdc_schema = StructType(
        data_schema.fields + [StructField("_change_type", StringType())]
    )
    root_abs = Path(path).resolve()

    def _scan(files_pv: dict, schema, lineage: bool):
        """files_pv: {relpath: partitionValues dict (physically
        keyed)} → one frame per partition-value tuple (never per
        file), partition columns injected as typed literals under
        their LOGICAL names, physical data columns renamed back."""
        groups: dict[tuple, list[str]] = {}
        for f, pv in files_pv.items():
            key = tuple(
                (pv or {}).get(phys_of.get(c, c)) for c in pcols
            )
            groups.setdefault(key, []).append(f)
        frames = []
        for key, files in groups.items():
            fr = spark.read.schema(schema).parquet(
                *[str(Path(path) / f) for f in files]
            )
            if lineage:
                fr = _with_row_lineage(fr, root_abs)
            if mapped:
                extras = [
                    c
                    for c in ("_change_type", "_dv_file", "_dv_row")
                    if c in fr.columns
                ]
                fr = fr.select(
                    *[
                        F.col(pf.name).cast(lf.dataType).alias(lf.name)
                        for lf, pf in data_fields
                    ],
                    *extras,
                )
            for c, v in zip(pcols, key):
                fr = fr.withColumn(
                    c,
                    (F.lit(None) if v is None else F.lit(v)).cast(
                        ptypes.get(c, "string")
                    ),
                )
            frames.append(fr)
        return frames

    def _union(frames):
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        return out

    from interop_datalake_spark.lake.delta_dv import load_dv_row_indexes

    decoded_positions = 0

    def _positions(desc: dict | None):
        nonlocal decoded_positions
        import numpy as np

        if not desc:
            return np.empty(0, dtype=np.int64)
        idxs = load_dv_row_indexes(path, desc)
        decoded_positions += len(idxs)
        if decoded_positions > _DV_POSITIONS_BOUND:
            raise ValueError(
                f"deletion vectors in the change window decode to "
                f"more than {_DV_POSITIONS_BOUND} positions — narrow "
                f"the version range"
            )
        return np.asarray(sorted(idxs), dtype=np.int64)

    def _remove_pv(r: dict, p: str) -> dict:
        pv = r.get("partitionValues")
        if pcols and pv is None:
            raise ValueError(
                f"remove action for {p} records no partitionValues "
                f"(no extended file metadata) on a partitioned "
                f"table — its deleted rows' partition columns cannot "
                f"be reconstructed"
            )
        return pv or {}

    tagged: list[DataFrame] = []
    for v in range(from_version + 1, to + 1):
        parsed = parse_cdc_commit(json_commits[v].read_text())
        cdc, adds, removes = (
            parsed["cdc"], parsed["adds"], parsed["removes"],
        )
        ts_ms = parsed["ts_ms"]
        if ts_ms is None:
            ts_ms = int(json_commits[v].stat().st_mtime * 1000)
        frames: list[DataFrame] = []
        if cdc:
            frames += _scan(
                {
                    unquote(c["path"]): c.get("partitionValues") or {}
                    for c in cdc
                },
                cdc_schema,
                lineage=False,
            )
        else:
            paired = set(adds) & set(removes)
            pure_adds = {f: a for f, a in adds.items() if f not in paired}
            pure_removes = {
                f: r for f, r in removes.items() if f not in paired
            }
            for src, ctype, dv_key in (
                (pure_adds, "insert", "add"),
                (pure_removes, "delete", "remove"),
            ):
                plain = {
                    f: (
                        a.get("partitionValues") or {}
                        if dv_key == "add"
                        else _remove_pv(a, f)
                    )
                    for f, a in src.items()
                    if not a.get("deletionVector")
                }
                vectored = {
                    f: a for f, a in src.items()
                    if a.get("deletionVector")
                }
                if plain:
                    frames += [
                        fr.withColumn("_change_type", F.lit(ctype))
                        for fr in _scan(plain, data_schema, False)
                    ]
                if vectored:
                    pos = _dv_positions_df(
                        spark,
                        path,
                        {
                            f: a["deletionVector"]
                            for f, a in vectored.items()
                        },
                    )
                    fr = _union(
                        _scan(
                            {
                                f: (
                                    a.get("partitionValues") or {}
                                    if dv_key == "add"
                                    else _remove_pv(a, f)
                                )
                                for f, a in vectored.items()
                            },
                            data_schema,
                            lineage=True,
                        )
                    )
                    frames.append(
                        fr.join(
                            pos, ["_dv_file", "_dv_row"], "left_anti"
                        )
                        .drop("_dv_file", "_dv_row")
                        .withColumn("_change_type", F.lit(ctype))
                    )
            if paired:
                import numpy as np
                import pandas as pd

                pf, pr, pt = [], [], []
                for f in paired:
                    old = _positions(
                        removes[f].get("deletionVector")
                    )
                    new = _positions(adds[f].get("deletionVector"))
                    dels = np.setdiff1d(new, old)
                    ress = np.setdiff1d(old, new)
                    pf += [f] * (len(dels) + len(ress))
                    pr.append(dels)
                    pr.append(ress)
                    pt += ["delete"] * len(dels) + ["insert"] * len(ress)
                # a pair whose position diff is empty (notably a
                # no-vector remove+add of the same file) changed no
                # rows: scan only files that contribute positions —
                # an all-empty commit emits nothing (the delta_cdc
                # stream applies the same skip; the two must match)
                touched = sorted(set(pf))
                if touched:
                    pos_df = spark.createDataFrame(
                        pd.DataFrame(
                            {
                                "_dv_file": pd.Series(
                                    pf, dtype="string"
                                ),
                                "_dv_row": np.concatenate(pr),
                                "_change_type": pd.Series(
                                    pt, dtype="string"
                                ),
                            }
                        )
                    )
                    fr = _union(
                        _scan(
                            {
                                f: adds[f].get("partitionValues") or {}
                                for f in touched
                            },
                            data_schema,
                            lineage=True,
                        )
                    )
                    frames.append(
                        fr.join(
                            pos_df, ["_dv_file", "_dv_row"], "inner"
                        ).drop("_dv_file", "_dv_row")
                    )
        for fr in frames:
            tagged.append(
                fr.withColumn(
                    "_commit_version", F.lit(v).cast("bigint")
                ).withColumn(
                    "_commit_timestamp",
                    F.timestamp_millis(F.lit(ts_ms)),
                )
            )
    out_cols = [f.name for f in st.fields] + [
        "_change_type",
        "_commit_version",
        "_commit_timestamp",
    ]
    if not tagged:
        from pyspark.sql.types import (
            LongType,
            StringType,
            TimestampType,
        )

        empty = StructType(
            st.fields
            + [
                StructField("_change_type", StringType()),
                StructField("_commit_version", LongType()),
                StructField("_commit_timestamp", TimestampType()),
            ]
        )
        return spark.createDataFrame([], empty)
    return _union([fr.select(*out_cols) for fr in tagged])
