from interop_datalake_spark.functions.hl7 import get_msh9
from interop_datalake_spark.functions.uris import (
    binary_file_path,
    datalake_full_url,
    fhir_file_path,
    parse_object_url,
)
from interop_datalake_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "get_msh9",
    "binary_file_path",
    "datalake_full_url",
    "fhir_file_path",
    "parse_object_url",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
