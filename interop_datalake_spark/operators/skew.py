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


def salted_agg(
    df: DataFrame,
    group_col: str,
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial-aggregate by
    (key, salt), then final-aggregate by key. Spark already does map-side
    partial aggregation, but a single hot key still funnels ALL its
    partial rows to one reducer; salting bounds any reducer's input to
    ~1/n_salts of the hot key.

    ``aggs`` maps output names to re-aggregatable partial expressions —
    supported: sum, count, min, max (avg = sum/count at the caller).
    """
    import re

    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), n_salts))
    partial = salted.groupBy(group_col, "_salt").agg(
        *[c.alias(f"_p_{name}") for name, c in aggs.items()]
    )
    finals = []
    for name, col in aggs.items():
        expr = col._jc.toString() if hasattr(col, "_jc") else ""
        # counts re-aggregate as SUM of partial counts; everything else
        # re-applies its own combiner (sum/min/max are associative)
        if re.match(r"^count", expr, re.IGNORECASE):
            finals.append(F.sum(f"_p_{name}").alias(name))
        elif expr.lower().startswith("min"):
            finals.append(F.min(f"_p_{name}").alias(name))
        elif expr.lower().startswith("max"):
            finals.append(F.max(f"_p_{name}").alias(name))
        else:
            finals.append(F.sum(f"_p_{name}").alias(name))
    return partial.groupBy(group_col).agg(*finals)


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
