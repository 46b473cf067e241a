"""Merged query catalog: every implemented operator from SURVEY.md §2
appears here once, as a (queries, oracle_sql) pair consumed by
``__spark_entry__.py``.
"""

from __future__ import annotations

from interop_datalake_spark.catalog import (
    advanced,
    events_analytics,
    lake_ops,
    llm_ops,
    python_surface,
    relational,
    reshape,
    sampling,
    scalar,
    setops,
    streaming_ops,
    text_ops,
    tpch_extra,
    windows,
)

_MODULES = [
    relational,
    lake_ops,
    windows,
    setops,
    scalar,
    llm_ops,
    text_ops,
    streaming_ops,
    python_surface,
    advanced,
    tpch_extra,
    reshape,
    sampling,
    events_analytics,
]


#: session settings every catalog query depends on, applied defensively
#: at call time because the driver invokes queries() with ITS OWN
#: SparkSession (no DatalakeSession defaults):
#: - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which the
#:   reader otherwise rejects (sources/tables.py converts ns→µs)
#: - UTC: window/date_trunc alignment must match the DuckDB oracle
#: All three are runtime-settable confs.
REQUIRED_RUNTIME_CONF = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def _with_required_conf(fn):
    def inner(spark, sf_dir):
        for k, v in REQUIRED_RUNTIME_CONF.items():
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # non-settable in some harness: proceed, query may still work
        return fn(spark, sf_dir)

    inner.__name__ = getattr(fn, "__name__", "query")
    inner.__doc__ = fn.__doc__
    return inner


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update({name: _with_required_conf(fn) for name, fn in m.QUERIES.items()})
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
