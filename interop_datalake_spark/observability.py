"""Observability — the engine analog of the reference's Datadog
``@Trace`` annotations + structured logging (R18:
``DatalakePublishService.kt:49,99,168``, ``OCIClient.kt:139,166``).

Two primitives:

- :func:`traced` — decorator stamping wall-time + outcome structured
  log records around an operator call (the ``@Trace`` analog). Logging
  only; never alters the result.
- :func:`with_metrics` — attach a named ``Observation`` to a DataFrame
  so row counts / sums ride the SAME job that executes the query (no
  second pass — this is how ``publish_fhir_r4`` counts dropped rows).

At cluster scale these feed whatever sink the deployment uses
(Prometheus JMX, Datadog spark integration); here they land in the
standard ``logging`` tree where tests can assert them.
"""

from __future__ import annotations

import functools
import logging
import time
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Observation

logger = logging.getLogger("interop_datalake_spark")


def traced(op_name: str | None = None) -> Callable:
    """Decorator: structured duration/outcome logging around an operator."""

    def deco(fn: Callable) -> Callable:
        name = op_name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            try:
                result = fn(*args, **kwargs)
            except Exception as exc:
                logger.info(
                    "op=%s status=error duration_ms=%.1f error=%s",
                    name,
                    (time.perf_counter() - t0) * 1000,
                    type(exc).__name__,
                )
                raise
            logger.info(
                "op=%s status=ok duration_ms=%.1f",
                name,
                (time.perf_counter() - t0) * 1000,
            )
            return result

        return wrapper

    return deco


def with_metrics(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach observed metrics to ``df``; read ``obs.get`` after the
    next action. One pass — the metrics ride the query's own job."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
