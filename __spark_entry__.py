"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``durable_functions_cosmosdb_etl_spark/plans/`` —
this module just assembles the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from durable_functions_cosmosdb_etl_spark.plans import registry  # noqa: E402
from durable_functions_cosmosdb_etl_spark.plans import (  # noqa: F401,E402
    llm_ops,
    pipelines,
    relational,
    relational_ext,
    streaming_windows,
    udx,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the pricing-summary aggregate (partial+final hash agg over
    lineitem) — the engine's headline relational operator.
    """
    return registry.QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each (SQL-expressible) query."""
    return dict(registry.ORACLES)
