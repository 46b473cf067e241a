"""Silver layer: typed field extraction from bronze FHIR JSON.

SURVEY §1.4 / §7 "hard parts": FHIR's recursive types cannot be a total
StructType, so bronze keeps ``resource_json STRING`` for fidelity and
silver projects *curated per-resource-type schemas* on demand. Two
paths, both JVM-side:

- :func:`extract_fields` — ``get_json_object`` per JSONPath: best for a
  handful of scalar fields (each path is an independent expression the
  optimizer can prune).
- :func:`to_silver` — ``from_json`` with an explicit partial schema:
  best when many fields are needed at once (single parse per document);
  unknown/extra JSON fields are simply ignored, missing ones are NULL —
  exactly the schema-on-read evolution story a 100 TB bronze zone needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: curated partial schemas for common FHIR R4 resource types — only the
#: analytics-relevant scalars; the full document stays in bronze
SILVER_SCHEMAS = {
    "patient": "id STRING, gender STRING, birthDate STRING, active BOOLEAN",
    "observation": "id STRING, status STRING, valueQuantity STRUCT<value: DOUBLE, unit: STRING>",
    "documentreference": "id STRING, status STRING, description STRING",
    "binary": "id STRING, contentType STRING",
}


def extract_fields(
    bronze: DataFrame, paths: dict[str, str], json_col: str = "resource_json"
) -> DataFrame:
    """Append one column per ``{out_name: '$.json.path'}`` entry."""
    out = bronze
    for name, path in paths.items():
        out = out.withColumn(name, F.get_json_object(F.col(json_col), path))
    return out


def to_silver(
    bronze: DataFrame,
    resource_type: str,
    json_col: str = "resource_json",
    schema: str | None = None,
) -> DataFrame:
    """Parse the JSON column once with the resource type's curated
    schema; emits ``silver`` struct columns next to the bronze keys."""
    ddl = schema or SILVER_SCHEMAS[resource_type.lower()]
    parsed = bronze.withColumn("_doc", F.from_json(F.col(json_col), ddl))
    return parsed.select("*", "_doc.*").drop("_doc")
