"""Sources/sinks coverage: dynamic partition overwrite, bronze JSON
scan with corrupt-record capture, streaming foreachBatch sink."""

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.publish import (
    overwrite_tenant_partition,
    publish_binary,
)
from interop_datalake_spark.lake.retrieve import retrieve_binary_batch
from interop_datalake_spark.session import DatalakeSession
from interop_datalake_spark.sources.tables import load_table, read_json_documents

BIN_SCHEMA = "resource_id STRING, content_type STRING, resource_json STRING"


def test_overwrite_partition_touches_one_tenant(spark, tmp_path):
    session = DatalakeSession(lake_root=str(tmp_path / "lake"), spark=spark)
    publish_binary(
        session, "tenantA",
        spark.createDataFrame([("a1", "pdf", "{}"), ("a2", "pdf", "{}")], BIN_SCHEMA),
    )
    publish_binary(
        session, "tenantB",
        spark.createDataFrame([("b1", "mp4", "{}")], BIN_SCHEMA),
    )
    # replace tenantA's partition with a single corrected row
    replacement = spark.createDataFrame([("a9", "pdf", '{"fixed":true}')], BIN_SCHEMA)
    n = overwrite_tenant_partition(session, "ehr_binary", "tenantA", replacement)
    assert n == 1
    a = retrieve_binary_batch(session, "tenantA", ["a1", "a2", "a9"])
    assert sorted(r["resource_id"] for r in a.collect()) == ["a9"]
    b = retrieve_binary_batch(session, "tenantB", ["b1"])
    assert [r["resource_id"] for r in b.collect()] == ["b1"]  # untouched


def test_json_scan_bronze_fidelity(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"resourceType":"Patient","id":"p1"}\n'
        '{"resourceType":"Location","id":"l1"}\n'
        "this is not json at all\n"
    )
    df = read_json_documents(
        spark, str(p), schema="resourceType STRING, id STRING"
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert sorted(r["id"] for r in good) == ["l1", "p1"]
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def test_streaming_foreach_batch_sink(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    events = load_table(spark, sf_dir, "events").limit(1000)
    events.repartition(2).write.parquet(src)
    batch_src = spark.read.parquet(src)

    def sink(batch_df, batch_id):
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out)
        )

    q = (
        spark.readStream.schema(batch_src.schema)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    written = spark.read.parquet(out)
    assert written.count() == 1000
    assert "batch_id" in written.columns
