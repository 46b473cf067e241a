"""Skew-mitigation operators: salted joins and bucketed co-location.

**Salted join** — when one join key dominates (a mega-tenant, a
boilerplate document hash), a plain shuffle join puts that key's entire
volume on one task. Salting splits the hot side's rows across
``n_salts`` sub-keys and replicates the other side once per salt, so
the hot key spreads over n tasks. AQE's skew-join handles moderate skew
automatically (session default ``spark.sql.adaptive.skewJoin``); salting
is the explicit tool for extreme keys AQE can't split (e.g. a single
key larger than an executor).

**Bucketed tables** — pre-shuffling both fact tables into the same
bucket layout on the join key removes the shuffle from every subsequent
join on that key (tests/test_bucketing.py proves the Exchange-free
plan). At 100 TB this converts the recurring orders⋈lineitem shuffle
into a one-time layout cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is hot.

    ``skewed`` gets a random-but-deterministic salt from a row hash;
    ``other`` is replicated n_salts× via explode (fine when ``other`` is
    the smaller side — the usual shape: huge skewed fact vs moderate
    dimension that is still too big to broadcast).
    """
    salted_l = skewed.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), n_salts)
    )
    salted_r = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_l.join(salted_r, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort_col: str | None = None,
) -> None:
    """Persist a bucketed (and optionally sorted) copy of ``df`` so
    future joins/aggs on ``bucket_col`` skip their shuffle."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
