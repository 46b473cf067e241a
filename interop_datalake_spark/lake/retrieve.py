"""Keyed lake reads — the reference's retrieve surface on Spark.

Reference parity (``DatalakeRetrieveService.kt``):
- R10 ``retrieveBinaryData(tenantId, resourceId)`` (:33-39): point
  lookup by composite key; missing → None (test :43-53).
- R8 ``retrieveBinaryData(urls)`` (:18-23): batch lookup; missing keys
  absent from the result (drop-missing, test :125-151) ≡ semi-join.
- R11 ``objectExists``/``binaryExists`` (:44-52): existence predicate.

Scale design: every lookup filters on the partition column
(``fhir_tenant_id``) FIRST so Catalyst prunes to one Hive partition
before the id predicate is pushed into the parquet scan — a point read
touches one partition's footers, not the table (SURVEY §7 "point-read
latency"). Batch lookup is an IN-list (broadcastable literal set) —
one pruned scan for N keys, not N scans.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from interop_datalake_spark.lake.publish import BINARY_TABLE, FHIR_TABLE
from interop_datalake_spark.session import DatalakeSession


def _read(session: DatalakeSession, table: str) -> DataFrame | None:
    """Missing table/path → None, mirroring 404→null (``OCIClient.kt:182-186``)."""
    try:
        return session.read_table(table)
    except AnalysisException:
        return None


def retrieve_binary(
    session: DatalakeSession, tenant_id: str, resource_id: str
) -> Row | None:
    """Point read by (tenant, id); None when absent."""
    df = _read(session, BINARY_TABLE)
    if df is None:
        return None
    return (
        df.filter(F.col("fhir_tenant_id") == tenant_id)  # partition prune
        .filter(F.col("resource_id") == resource_id)
        .head()
    )


def retrieve_binary_batch(
    session: DatalakeSession, tenant_id: str, resource_ids: Iterable[str]
) -> DataFrame:
    """Batch point lookup; rows for missing ids are simply absent
    (drop-missing semantics, ``DatalakeRetrieveServiceTest.kt:125-151``)."""
    ids = list(resource_ids)
    df = _read(session, BINARY_TABLE)
    if df is None or not ids:
        schema = "fhir_tenant_id STRING, resource_id STRING, content_type STRING, resource_json STRING"
        return session.spark.createDataFrame([], schema)
    return df.filter(F.col("fhir_tenant_id") == tenant_id).filter(
        F.col("resource_id").isin(ids)
    )


def retrieve_binary_by_urls(
    session: DatalakeSession, urls: Iterable[str]
) -> DataFrame:
    """URL-keyed batch lookup — the reference's actual R8 signature
    (``retrieveBinaryData(urls: List<URI>)``): parse each object URL to
    its (tenant, id) key via the R14 template, drop malformed URLs
    (``OCIClientTest.kt:244-254`` → None, no read), drop missing keys
    (``DatalakeRetrieveServiceTest.kt:125-151``). Returns matched rows
    with their originating ``url`` column."""
    from interop_datalake_spark.functions.uris import parse_object_url

    url_list = [u for u in urls if u]
    df = _read(session, BINARY_TABLE)
    if df is None or not url_list:
        schema = (
            "url STRING, fhir_tenant_id STRING, resource_id STRING,"
            " content_type STRING, resource_json STRING"
        )
        return session.spark.createDataFrame([], schema)
    keys = (
        session.spark.createDataFrame([(u,) for u in url_list], "url STRING")
        .withColumn("_parsed", parse_object_url("url"))
        .filter(F.col("_parsed").isNotNull())  # malformed URL → dropped
        .withColumn(
            "fhir_tenant_id",
            F.regexp_extract(
                F.col("_parsed")["path"],
                r"ehr/Binary/fhir_tenant_id=([^/]+)/(.+)\.json",
                1,
            ),
        )
        .withColumn(
            "resource_id",
            F.regexp_extract(
                F.col("_parsed")["path"],
                r"ehr/Binary/fhir_tenant_id=([^/]+)/(.+)\.json",
                2,
            ),
        )
        .filter(F.col("resource_id") != "")  # non-Binary path shape → dropped
        .select("url", "fhir_tenant_id", "resource_id")
    )
    # key set is small (an API batch): broadcast it against the pruned scan
    return df.join(F.broadcast(keys), ["fhir_tenant_id", "resource_id"])


def binary_exists(session: DatalakeSession, tenant_id: str, resource_id: str) -> bool:
    """Existence check ≡ HEAD status==200 (``OCIClient.kt:231-247``)."""
    df = _read(session, BINARY_TABLE)
    if df is None:
        return False
    return bool(
        df.filter(F.col("fhir_tenant_id") == tenant_id)
        .filter(F.col("resource_id") == resource_id)
        .head(1)
    )


def retrieve_fhir(
    session: DatalakeSession,
    tenant_id: str,
    resource_type: str,
    resource_id: str | None = None,
) -> DataFrame:
    """Pruned scan of one (type, tenant) partition subtree, optionally
    narrowed to a single resource — the read-side twin of
    ``publish_fhir_r4``'s layout (``DatalakePublishService.kt:68-73``)."""
    df = _read(session, FHIR_TABLE)
    if df is None:
        schema = (
            "resource_id STRING, resource_json STRING, resource_type STRING,"
            " fhir_tenant_id STRING, _date DATE"
        )
        return session.spark.createDataFrame([], schema)
    out = df.filter(
        (F.col("resource_type") == resource_type.lower())
        & (F.col("fhir_tenant_id") == tenant_id)
    )
    if resource_id is not None:
        out = out.filter(F.col("resource_id") == resource_id)
    return out
