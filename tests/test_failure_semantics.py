"""Write-failure semantics: a mid-write abort must leave no partial
table state visible. The reference pins upload retry/failure behavior
(``OCIClientTest.kt:201-222``, ``DatalakePublishServiceTest.kt:127-162``)
per object; our analog is the Spark commit protocol for ``publish_*``
(task outputs invisible until job commit) and the staged partition swap
for ``merge_by_key`` (live table untouched until the staging write has
fully succeeded)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from interop_datalake_spark.lake.maintenance import merge_by_key
from interop_datalake_spark.lake.publish import publish_fhir_r4
from interop_datalake_spark.lake.retrieve import retrieve_fhir
from interop_datalake_spark.session import DatalakeSession

FHIR_SCHEMA = "resource_type STRING, resource_id STRING, resource_json STRING"


@pytest.fixture()
def session(spark, tmp_path):
    return DatalakeSession(lake_root=str(tmp_path / "lake"), spark=spark)


def _poison(col):
    """A column whose evaluation raises for rows marked '__BOOM__' —
    injects a task failure mid-job, after other tasks may have
    finished their writes."""

    @F.udf(returnType=StringType())
    def boom(v):
        if v == "__BOOM__":
            raise RuntimeError("injected mid-write failure")
        return v

    return boom(col)


def _seed(session, spark):
    base = spark.createDataFrame(
        [("Location", "a", '{"v":1}'), ("Location", "b", '{"v":1}')],
        FHIR_SCHEMA,
    )
    publish_fhir_r4(session, "t1", base)
    return {
        r["resource_id"]: r["resource_json"]
        for r in retrieve_fhir(session, "t1", "Location").collect()
    }


def test_publish_abort_leaves_no_partial_rows(session, spark):
    before = _seed(session, spark)

    bad = spark.createDataFrame(
        [("Location", "c", "{}"), ("Location", "d", "__BOOM__"),
         ("Location", "e", "{}"), ("Location", "f", "{}")],
        FHIR_SCHEMA,
    ).repartition(4).withColumn("resource_json", _poison(F.col("resource_json")))

    with pytest.raises(Exception):
        publish_fhir_r4(session, "t1", bad)

    after = {
        r["resource_id"]: r["resource_json"]
        for r in retrieve_fhir(session, "t1", "Location").collect()
    }
    assert after == before, "aborted publish leaked partial rows"


def test_merge_abort_during_staging_leaves_table_intact(spark, tmp_path):
    # merge_by_key stages against the Hive layout (non-ACID path)
    session = DatalakeSession(
        lake_root=str(tmp_path / "hive_lake"), spark=spark, acid=False
    )
    before = _seed(session, spark)
    cols = retrieve_fhir(session, "t1", "Location").columns

    def updates_df(rows):
        return (
            spark.createDataFrame(rows, FHIR_SCHEMA)
            .withColumn("fhir_tenant_id", F.lit("t1"))
            .withColumn("_date", F.current_date())
            .select(*cols)
        )

    bad = updates_df(
        [("location", "a", "__BOOM__"), ("location", "c", '{"v":9}')]
    ).withColumn("resource_json", _poison(F.col("resource_json")))

    with pytest.raises(Exception):
        merge_by_key(
            session, "ehr", bad,
            key_cols=["resource_type", "fhir_tenant_id", "resource_id"],
            partition_cols=["resource_type", "fhir_tenant_id", "_date"],
        )

    after = {
        r["resource_id"]: r["resource_json"]
        for r in retrieve_fhir(session, "t1", "Location").collect()
    }
    assert after == before, "aborted merge mutated the live table"

    # stale staging from the crash must not poison the next merge
    good = updates_df([("location", "a", '{"v":2}'), ("location", "c", '{"v":1}')])
    merge_by_key(
        session, "ehr", good,
        key_cols=["resource_type", "fhir_tenant_id", "resource_id"],
        partition_cols=["resource_type", "fhir_tenant_id", "_date"],
    )
    final = {
        r["resource_id"]: r["resource_json"]
        for r in retrieve_fhir(session, "t1", "Location").collect()
    }
    assert final == {"a": '{"v":2}', "b": '{"v":1}', "c": '{"v":1}'}


def test_merge_recovers_interrupted_swap_backup(spark, tmp_path):
    """Crash between backup-rename and stage-rename leaves the live
    partition dir missing and only the __pre_merge backup on disk.
    The NEXT merge must restore the backup BEFORE computing the merged
    result — not silently recompute without those rows and destroy
    the backup (the old lazy-delete behavior lost them permanently)."""
    from pathlib import Path

    session = DatalakeSession(
        lake_root=str(tmp_path / "hive_lake"), spark=spark, acid=False
    )
    before = _seed(session, spark)  # Location a, b for t1
    cols = retrieve_fhir(session, "t1", "Location").columns

    # simulate the interrupted swap: live partition dir → __pre_merge
    part_dirs = [
        p
        for p in Path(session.table_path("ehr")).rglob("_date=*")
        if p.is_dir()
    ]
    assert part_dirs, "expected a published partition dir"
    live = part_dirs[0]
    live.rename(live.with_name(live.name + "__pre_merge"))

    updates = (
        spark.createDataFrame([("location", "c", '{"v":1}')], FHIR_SCHEMA)
        .withColumn("fhir_tenant_id", F.lit("t1"))
        .withColumn("_date", F.current_date())
        .select(*cols)
    )
    merge_by_key(
        session, "ehr", updates,
        key_cols=["resource_type", "fhir_tenant_id", "resource_id"],
        partition_cols=["resource_type", "fhir_tenant_id", "_date"],
    )
    after = {
        r["resource_id"]: r["resource_json"]
        for r in retrieve_fhir(session, "t1", "Location").collect()
    }
    assert after == {**before, "c": '{"v":1}'}, (
        "pre-merge rows from the interrupted partition were lost"
    )
