"""Vector math over ARRAY<FLOAT/DOUBLE> columns — JVM-side, no UDFs.

Built on ``zip_with`` + ``aggregate`` so similarity scans stay inside
whole-stage codegen. At 100 TB these feed the brute-force and
LSH-bucketed ANN paths in ``llm.similarity``; keeping the inner product
as column algebra (not a Python UDF) is what makes the cross-join
prune + top-k plan viable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as DOUBLE (accumulate in double regardless of input width)."""
    prods = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _col(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) ∈ [-1,1]; NULL when either norm is zero (try_divide —
    ANSI mode would otherwise raise on divide-by-zero)."""
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))
