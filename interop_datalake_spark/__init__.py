"""interop_datalake_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference client
library ``The-Ronin-Project/interop-datalake`` (a JVM data-lake
publish/point-retrieve client), re-expressed Spark-first, plus the
relational / streaming / LLM-data-pipeline operator surface a
100 TB-scale lakehouse needs.

Layout
------
- ``session``    : DatalakeSession — SparkSession factory + lake config
                   (reference: ``DatalakeSpringConfig.kt``, ``OCIClient.kt:28-59``)
- ``lake``       : partitioned publish, keyed retrieve, existence checks,
                   path/URL templating, compaction
                   (reference: ``DatalakePublishService.kt``, ``DatalakeRetrieveService.kt``)
- ``functions``  : scalar column-function surface — HL7 MSH-9 extraction,
                   URI parsing, text stats, vector math, JSON access
                   (reference: ``hl7/HL7Utils.kt``, ``oci/client/OCIClient.kt:252-256``)
- ``operators``  : relational operators — joins (broadcast/semi/anti/range/as-of),
                   aggregations (rollup/cube/grouping sets), windows, set ops, top-k
- ``llm``        : LLM-training-data pipeline ops — exact/near dedup
                   (MinHash-LSH, SimHash, n-gram Jaccard), embedding similarity search
- ``multimodal`` : opaque binary columns + typed metadata, decode/feature plumbing
- ``streaming``  : Structured Streaming windows/sessionization/dedup + batch twins

Everything takes and returns DataFrames; no driver-side collects inside
operators. Designed for Hive-partitioned lake tables keyed by
``(resource_type, fhir_tenant_id, _date)`` like the reference's bronze
layout (``DatalakePublishService.kt:68-73``).
"""

from interop_datalake_spark.session import DatalakeSession

__all__ = ["DatalakeSession"]
__version__ = "0.1.0"
