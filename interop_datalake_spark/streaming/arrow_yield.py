"""Vectorized ``read()`` path for the Python DataSource streaming
sources (txn_source.py, iceberg_source.py).

PySpark 4.1.2's ``DataSourceStreamReader.read`` accepts
``Iterator[pyarrow.RecordBatch]`` and passes the batches straight
through to the JVM Arrow stream (``plan_data_source_read.py:
records_to_arrow_batches`` — only column count and name presence are
validated, the batch is NOT reordered or converted). Yielding
per-row Python tuples therefore re-assembles every streamed row in
Python for nothing — the exact row-at-a-time anti-pattern the repo
bans in scan hot paths (round-10 verdict, the one weak flag). This
module is the fix: one parquet file → Arrow record batches matching
the DECLARED Spark schema exactly (field order AND arrow types from
``to_arrow_schema``, the same call the worker's tuple path uses), with
per-slice constant columns (partition values, the commit/snapshot tag)
appended as repeated scalars and schema-on-read columns NULL-filled —
no per-row Python anywhere.
"""

from __future__ import annotations

from typing import Iterator

#: rows per yielded RecordBatch — bounds executor memory per batch the
#: same way spark.sql.execution.arrow.maxRecordsPerBatch does for the
#: built-in sources (iter_batches streams row groups, so peak memory is
#: max(row group, this) per column, not the whole file)
BATCH_ROWS = 1 << 16


def arrow_batches(
    path: str,
    declared_struct,
    constants: dict,
    batch_size: int = BATCH_ROWS,
    keep_positions=None,
    drop_positions=None,
) -> Iterator:
    """Yield ``pyarrow.RecordBatch`` objects for the parquet file at
    ``path``, shaped exactly like ``declared_struct`` (the source's
    declared Spark schema, a ``StructType``).

    ``constants`` maps column name → per-slice Python value (identity
    partition values from the manifest, ``_commit_version`` /
    ``_snapshot_id``); those columns come from the slice, NEVER from
    the file — the Iceberg spec's Column Projection rule, and the
    TxnTable layout where partition columns live in the path. Declared
    columns in neither the file nor ``constants`` yield NULL (the
    schema-on-read rule the batch readers apply: columns added after a
    file was written are absent from its footer).

    ``keep_positions`` / ``drop_positions`` (mutually exclusive,
    sorted int64 arrays of FILE row indexes) restrict the yield to /
    away from those rows — the vectorized executor-side form of the
    batch readers' deletion-vector position joins (``iter_batches``
    streams the file in order, so each batch's global row range is
    the running offset).

    Runs on executors inside the Python DataSource worker: imports stay
    local, and ``to_arrow_schema`` is the worker's own converter so the
    produced arrow types (e.g. ``timestamp[us, tz=UTC]`` for Spark
    TIMESTAMP) are byte-identical to what the tuple path would have
    produced.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    if keep_positions is not None and drop_positions is not None:
        raise ValueError(
            "keep_positions and drop_positions are mutually exclusive"
        )
    positions = (
        keep_positions if keep_positions is not None else drop_positions
    )
    if positions is not None:
        positions = np.asarray(sorted(positions), dtype=np.int64)
    offset = 0
    target = to_arrow_schema(declared_struct)
    pf = pq.ParquetFile(path)
    avail = set(pf.schema_arrow.names)
    present = [
        f.name
        for f in target
        if f.name in avail and f.name not in constants
    ]
    # materialize the constant scalars once per slice, typed to the
    # declared arrow type (pa.scalar converts date/datetime/Decimal;
    # naive datetimes read as UTC wall time, matching the tuple path
    # under the repo's UTC session convention)
    scalars = {}
    for f in target:
        if f.name in constants:
            v = constants[f.name]
            scalars[f.name] = (
                None if v is None else pa.scalar(v, type=f.type)
            )
    for rb in pf.iter_batches(batch_size=batch_size, columns=present):
        n = rb.num_rows
        mask = None
        if positions is not None:
            in_batch = np.isin(
                np.arange(offset, offset + n, dtype=np.int64),
                positions,
                assume_unique=True,
            )
            offset += n
            mask = in_batch if keep_positions is not None else ~in_batch
            if not mask.any():
                continue
        if n == 0:
            continue
        names = rb.schema.names
        arrays = []
        for f in target:
            if f.name in constants:
                s = scalars[f.name]
                arr = (
                    pa.nulls(n, f.type)
                    if s is None
                    else pa.repeat(s, n)
                )
            elif f.name in avail:
                col = rb.column(names.index(f.name))
                arr = (
                    col if col.type == f.type else col.cast(f.type)
                )
            else:
                arr = pa.nulls(n, f.type)
            arrays.append(arr)
        out = pa.RecordBatch.from_arrays(arrays, schema=target)
        if mask is not None:
            out = out.filter(pa.array(mask))
        yield out
