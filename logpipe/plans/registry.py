"""Query/oracle registry machinery shared by the gate modules.

The registry is ONE ordered dict: modules register gates in import
order (logpipe.plans.driver_queries imports the gate modules in the
canonical order, so the driver's 50-query correctness window sees the
same sequence the single-file layout had). ``register`` is the normal
path; the attach-below pattern (``_REGISTRY[name] = (fn, sql)``) lets
a gate attach an oracle built AFTER registration (builder-dependent
SQL) — both mutate this module's shared dict.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")
