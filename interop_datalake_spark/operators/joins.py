"""Join operators Spark lacks as built-ins: as-of and bounded range.

Scale design notes:

**as-of join** — "for each left row, the latest right row with
``right.ts <= left.ts`` per key". The naive plan (theta join on
``key = key AND r.ts <= l.ts`` + max) explodes quadratically per key.
This implementation uses the union trick instead: tag both sides, union
them, shuffle ONCE on the key, sort within partitions by (key, ts), and
carry the most recent right-side values forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.
Cost is one shuffle + one sort — the same as a sort-merge join — and it
never materializes a pair set. This is the standard large-scale as-of
strategy (same shape as Flink's event-time temporal join).

**range join** — pairs within a bounded time distance. An unbounded
inequality join is a cross product per key; bucketing both sides to
``floor(ts / width)`` and equi-joining on (key, bucket) ∪ (key, bucket+1)
bounds each probe to two buckets, turning the theta join into an
equi-join Catalyst can hash/sort-merge. The residual distance predicate
filters inside the bucket pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, append the most recent right row's
    ``right_values`` (as ``<col><suffix>``) with right.ts <= left.ts;
    NULLs when no prior right row exists (left-outer as-of).

    Ties on timestamp: the right row sorts before the left row with the
    same ts (``is_left`` ascending False→True), so an exactly-equal
    right timestamp IS visible to the left row (<=, not <).

    The right-side payload travels as ONE struct column (non-null for
    every right row, null for left placeholder rows), carried forward
    with a single ``last(ignorenulls=True)``. Per-column lasts would
    skip genuinely-NULL right values and stitch different output
    columns from different right rows; NULL fields inside the struct
    are preserved, and every output column comes from the same (most
    recent) right row.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rv_type = StructType(
        [StructField(v, right.schema[v].dataType, True) for v in right_values]
    )

    l_tag = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_is_left", F.lit(1))
        .withColumn("_rv", F.lit(None).cast(rv_type))
    )

    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(v) for v in right_values]).alias("_rv"),
    )
    # align columns: right side lacks the left payload
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))
    unioned = r_tag.select(*l_tag.columns).unionByName(l_tag)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_rv_last", F.last("_rv", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        "*",
        *[
            F.col(f"_rv_last.{v}").alias(f"{v}{suffix}")
            for v in right_values
        ],
    )
    return out.drop("_ts", "_is_left", "_rv", "_rv_last")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    max_distance_seconds: float,
    extra_condition: Column | None = None,
) -> DataFrame:
    """Equi-key pairs with ``0 <= right.ts - left.ts <= max_distance``,
    planned as a bucketed equi-join (see module docstring)."""
    keys = [on] if isinstance(on, str) else list(on)
    width = float(max_distance_seconds)

    lb = left.withColumn(
        "_lbucket", F.floor(F.unix_micros(F.col(left_ts)) / F.lit(width * 1e6))
    )
    rb = right.withColumn(
        "_rbucket", F.floor(F.unix_micros(F.col(right_ts)) / F.lit(width * 1e6))
    )
    # a right row at distance <= width lives in the same or next bucket
    cond = F.lit(True)
    for k in keys:
        cond = cond & (lb[k] == rb[k])
    bucket_cond = (rb["_rbucket"] == lb["_lbucket"]) | (
        rb["_rbucket"] == lb["_lbucket"] + 1
    )
    dist = (
        F.unix_micros(rb[right_ts]).cast("double")
        - F.unix_micros(lb[left_ts]).cast("double")
    ) / 1e6
    residual = (dist >= 0) & (dist <= width)
    full = cond & bucket_cond & residual
    if extra_condition is not None:
        full = full & extra_condition
    out = lb.join(rb, full).drop("_lbucket", "_rbucket")
    for k in keys:  # keep one copy of each equi-key (the left one)
        out = out.drop(rb[k])
    return out
