"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in logpipe/plans/driver_queries.py; this module
stays a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make `import logpipe` work regardless of the harness's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse->enrich->route pipeline over sf0.001 events,
    returning per-sink routed-row counts + byte sums (SURVEY.md §3.1)."""
    from logpipe.plans.driver_queries import flagship_route_counts

    return flagship_route_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from logpipe.plans import driver_queries

    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    from logpipe.plans import driver_queries

    return driver_queries.oracle_sql()
