"""Merged query catalog: every implemented operator from SURVEY.md §2
appears here once, as a (queries, oracle_sql) pair consumed by
``__spark_entry__.py``.
"""

from __future__ import annotations

from interop_datalake_spark.catalog import (
    advanced,
    lake_ops,
    llm_ops,
    python_surface,
    relational,
    scalar,
    setops,
    streaming_ops,
    text_ops,
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
]


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
