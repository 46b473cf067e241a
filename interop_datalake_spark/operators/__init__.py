from interop_datalake_spark.operators.joins import asof_join, range_join
from interop_datalake_spark.operators.topk import top_k_per_group

__all__ = ["asof_join", "range_join", "top_k_per_group"]
