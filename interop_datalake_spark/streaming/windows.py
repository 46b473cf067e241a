"""Event-time windowing operators — one code path for batch AND
Structured Streaming.

Every operator takes a DataFrame that may be a batch frame or a
``readStream`` frame; ``F.window`` / ``F.session_window`` /
``dropDuplicates*`` behave identically, so the driver's DuckDB oracle
checks the batch twin while the streaming tests (tests/test_streaming.py)
run the same functions under ``trigger(availableNow=True)`` with
watermarks. This mirrors the reference's push-batch model (its closest
streaming analog is the ``publishFHIRR4`` batch API — SURVEY §1.4).

Scale notes: windowed aggregation state is keyed by (key, window) and
pruned by the watermark; a 100 TB/day stream shards state across
executors by the groupBy key. Late data beyond the watermark is
dropped deterministically. Stream-static joins broadcast the static dim
per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    # watermarks only apply to streaming frames; on batch they are a no-op
    # but Spark still validates the column, so gate on isStreaming
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows; emits window_start/window_end."""
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), duration), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide windows)."""
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), duration, slide), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Dynamic-length sessions: a session closes after ``gap`` of
    inactivity; window end = last event + gap."""
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap), *group_cols)
        .agg(*aggs)
        .withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )


def streaming_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Drop duplicate events by key. Streaming + watermark → bounded
    state via ``dropDuplicatesWithinWatermark``; batch → plain
    ``dropDuplicates`` (unbounded state is fine in batch)."""
    if df.isStreaming and watermark and ts_col:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return df.dropDuplicates(key_cols)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay_seconds: int,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join bounded by an event-time interval:
    matches right rows with ``left_ts <= right_ts <= left_ts + delay``.

    The watermarks + the two-sided time bound are what make the state
    prunable: each side buffers only rows younger than
    watermark + delay, so state is O(rate × window), independent of
    stream history. Works identically on batch frames (the interval
    predicate alone), which is how the oracle checks it.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= lw[left_ts])
        & (
            rw[right_ts]
            <= lw[left_ts] + F.expr(f"INTERVAL {max_delay_seconds} SECONDS")
        )
    )
    return lw.join(rw, cond, how).drop(rw[on])


def stream_static_join(
    stream: DataFrame, static_dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Enrich a stream against a static dimension table. The static side
    is broadcast per micro-batch (it is re-read each batch, so slowly
    changing dims pick up updates)."""
    return stream.join(F.broadcast(static_dim), on, how)
