from interop_datalake_spark.plans.inspect import (
    explain_str,
    has_broadcast_hash_join,
    has_cartesian_product,
    has_pushed_filters,
    has_take_ordered,
    pruned_read_schema,
)

__all__ = [
    "explain_str",
    "has_broadcast_hash_join",
    "has_cartesian_product",
    "has_pushed_filters",
    "has_take_ordered",
    "pruned_read_schema",
]
