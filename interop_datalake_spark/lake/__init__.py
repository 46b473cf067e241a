from interop_datalake_spark.lake.publish import (
    publish_binary,
    publish_fhir_r4,
    publish_raw_data,
)
from interop_datalake_spark.lake.retrieve import (
    binary_exists,
    retrieve_binary,
    retrieve_binary_batch,
    retrieve_fhir,
)
from interop_datalake_spark.lake.maintenance import compact_table

__all__ = [
    "publish_fhir_r4",
    "publish_binary",
    "publish_raw_data",
    "retrieve_binary",
    "retrieve_binary_batch",
    "retrieve_fhir",
    "binary_exists",
    "compact_table",
]
