"""Query registry: every engine capability is a named (spark, sf_dir) →
DataFrame callable, optionally paired with an ANSI-SQL DuckDB oracle.

This is the judge-facing surface: ``__spark_entry__.queries()`` /
``oracle_sql()`` are assembled from these dicts. Aliasing rule: every
computed column is aliased identically in the Spark plan and the oracle
SQL (driver compares by sorted column name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` → driver does rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
