"""Top-k operators.

Global top-k: ``df.orderBy(...).limit(k)`` — Catalyst rewrites to
TakeOrderedAndProject (per-partition local top-k, merge of k·P rows),
no global sort at any scale.

Per-group top-k: window ``row_number() <= k`` — one shuffle on the
group key; the ranking runs sorted-within-partition, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """k best rows per group, rank exposed as ``rank_col`` (1-based)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
