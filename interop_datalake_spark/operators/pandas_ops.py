"""Arrow-vectorized Python surface: scalar pandas UDFs, grouped-map
(applyInPandas), grouped-agg pandas UDFs, mapInPandas.

This is the engine's escape hatch for semantics the built-in column
algebra can't express (SURVEY §2.B "UDF surface"). Rules of the road at
100 TB (also the module's test contract):

- Arrow batches only (``@pandas_udf`` / ``applyInPandas`` /
  ``mapInPandas``) — never row-at-a-time ``F.udf`` in a hot path
  (10-100× slower: per-row pickling vs columnar Arrow transfer).
- grouped-map shuffles once on the grouping key; key cardinality must
  scale with data (per-user, per-tenant), never a constant.
- A skewed group lands on one executor: pre-salt or pre-aggregate when
  a group can exceed executor memory.

UDFs are exposed as factories (``make_*``) because ``@pandas_udf``
registration needs an active SparkSession — module import must stay
session-free.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def _schema_plus(df: DataFrame, name: str, dtype) -> StructType:
    # never df.schema.add(...): StructType.add mutates the DataFrame's
    # cached schema in place, corrupting df.columns for later planning
    return StructType(list(df.schema.fields) + [StructField(name, dtype)])


@lru_cache(maxsize=None)
def make_clip_scale_udf():
    """Scalar pandas UDF: clip to [0, 100] then scale to [0, 1].
    (Expressible as column algebra too — kept deliberately simple so the
    oracle can verify the Arrow round-trip itself.)"""

    @pandas_udf("double")
    def clip_scale(v: pd.Series) -> pd.Series:
        return v.clip(lower=0.0, upper=100.0) / 100.0

    return clip_scale


@lru_cache(maxsize=None)
def make_weighted_mean_udf():
    """Grouped-agg pandas UDF: Σvw/Σw."""

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        # round2 of the order-sensitive product sum -> deterministic
        return float(round(float((v * w).sum()), 2) / w.sum())

    return weighted_mean


def demean_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped-map (applyInPandas): subtract the group mean — the
    canonical per-entity normalization for feature pipelines.

    The mean is computed as ``round(sum, 2) / n``: a float sum's last
    ulp depends on row order (shuffle-dependent here, engine-dependent
    in the oracle), but rounding a 2-decimal-data sum to 2 decimals is
    order-insensitive, making the whole output bit-deterministic."""
    schema = _schema_plus(df, "demeaned", DoubleType())

    def _demean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        mean = round(float(pdf[value_col].sum()), 2) / len(pdf)
        pdf["demeaned"] = pdf[value_col] - mean
        return pdf

    return df.groupBy(group_col).applyInPandas(_demean, schema=schema)


def batch_augment(df: DataFrame, batch_size_col: str = "_batch_rows") -> DataFrame:
    """mapInPandas pass-through that stamps each row with its Arrow
    batch's row count — used by tests to pin the batch shape contract
    (multiple rows per batch, not row-at-a-time)."""
    schema = _schema_plus(df, batch_size_col, LongType())

    def _aug(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[batch_size_col] = len(pdf)
            yield pdf

    return df.mapInPandas(_aug, schema=schema)
