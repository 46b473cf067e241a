"""True Structured Streaming runs of the streaming/windows.py operators
(readStream + watermark + availableNow trigger + memory sink), asserted
against their own batch twins — proving the one-code-path design."""

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.sources.tables import load_table
from interop_datalake_spark.streaming.windows import (
    session_window_agg,
    streaming_dedup,
    tumbling_window_agg,
)


@pytest.fixture(scope="module")
def event_stream_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as a parquet directory a file stream can tail
    (testdata is a single file; streams read directories)."""
    d = str(tmp_path_factory.mktemp("stream_src"))
    load_table(spark, sf_dir, "events").limit(2000).repartition(4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_matches_batch(spark, event_stream_dir):
    batch_src = spark.read.parquet(event_stream_dir)
    stream_src = spark.readStream.schema(batch_src.schema).parquet(event_stream_dir)

    def q(df):
        return tumbling_window_agg(
            df,
            "ts",
            "1 hour",
            ["event_type"],
            [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tot")],
            watermark="2 hours",
        )

    got = _run_stream(spark, q(stream_src), "t_tumble")
    cols = ["window_start", "event_type", "n", "tot"]
    assert _rows(got, cols) == _rows(q(batch_src), cols)
    assert len(_rows(got, cols)) > 0


def test_streaming_session_matches_batch(spark, event_stream_dir):
    batch_src = spark.read.parquet(event_stream_dir)
    stream_src = spark.readStream.schema(batch_src.schema).parquet(event_stream_dir)

    def q(df):
        return session_window_agg(
            df,
            "ts",
            "30 minutes",
            ["user_id"],
            [F.count("*").alias("n")],
            watermark="2 hours",
        )

    got = _run_stream(spark, q(stream_src), "t_session")
    cols = ["user_id", "session_start", "session_end", "n"]
    assert _rows(got, cols) == _rows(q(batch_src), cols)


def test_stream_stream_interval_join_matches_batch(spark, event_stream_dir):
    batch_src = spark.read.parquet(event_stream_dir)
    stream_src = spark.readStream.schema(batch_src.schema).parquet(event_stream_dir)
    from interop_datalake_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    def q(src):
        purchases = src.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("pid"), F.col("ts").alias("pts")
        )
        errors = src.filter(F.col("event_type") == "error").select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("eid"),
            F.col("ts").alias("ets"),
        )
        return stream_stream_interval_join(
            purchases, errors, "user_id", "pts", "ets", 7200, watermark="4 hours"
        ).select("user_id", "pid", "eid")

    got = (
        q(stream_src)
        .writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    got.awaitTermination(180)
    result = spark.table("t_ssjoin")
    want = q(batch_src)
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, want.collect()))
    assert result.count() > 0


def test_streaming_dedup_bounded_state(spark, event_stream_dir):
    batch_src = spark.read.parquet(event_stream_dir)
    stream_src = spark.readStream.schema(batch_src.schema).parquet(event_stream_dir)
    deduped = streaming_dedup(
        stream_src, ["user_id", "event_type"], ts_col="ts", watermark="1 day"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_dedup")
    expected = batch_src.select("user_id", "event_type").distinct().count()
    assert got.count() == expected
    # each key appears exactly once
    assert got.groupBy("user_id", "event_type").count().filter("count > 1").count() == 0


def test_stream_stream_left_outer_join_emits_unmatched(spark, event_stream_dir):
    """Left-outer interval join under a real stream: inner matches are
    all present and identical to batch; unmatched-left rows emit with
    NULL right ids once the watermark passes their join window (the
    final micro-batch's watermark cannot clear the tail of the data,
    so the streamed outer set sits between the batch inner and batch
    outer sets — both bounds asserted)."""
    from interop_datalake_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    batch_src = spark.read.parquet(event_stream_dir)
    stream_src = spark.readStream.schema(batch_src.schema).parquet(event_stream_dir)

    def q(src, how):
        purchases = src.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("pid"), F.col("ts").alias("pts")
        )
        errors = src.filter(F.col("event_type") == "error").select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("eid"),
            F.col("ts").alias("ets"),
        )
        return stream_stream_interval_join(
            purchases, errors, "user_id", "pts", "ets", 7200,
            watermark="4 hours", how=how,
        ).select("user_id", "pid", "eid")

    h = (
        q(stream_src, "left_outer")
        .writeStream.format("memory")
        .queryName("t_ssoj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    h.awaitTermination(180)
    got = {tuple(r) for r in spark.table("t_ssoj").collect()}
    inner = {tuple(r) for r in q(batch_src, "inner").collect()}
    outer = {tuple(r) for r in q(batch_src, "left_outer").collect()}
    assert inner <= got <= outer
    unmatched = {t for t in got if t[2] is None}
    assert unmatched, "no outer rows emitted — watermark never released state"
