"""Parquet-backed table catalog over the driver's test data.

The reference's "containers" (Cosmos collections of JSON documents,
EtlProcess.cs:27,90-111,165) map to parquet/Delta tables here
(SURVEY.md §1.3). Reads always go through ``spark.read.parquet`` so
Catalyst gets predicate pushdown + column pruning into the scan; at
100 TB these tables would be directory-partitioned (e.g. by date) and
the same API picks up partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_SCHEMAS

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. Column pruning/pushdown happen at the scan.

    Nanosecond-timestamp parquet columns (events.ts) aren't natively
    readable by Spark; they're read as int64 nanos
    (``legacy.parquet.nanosAsLong``) and converted to micros with integer
    division — the same floor-truncation DuckDB applies, so oracle
    values agree. Integer ``div`` (not ``/``) matters: nanos ≈ 1.7e18
    exceeds double's 2^53 exact-integer range.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    expected = TESTDATA_SCHEMAS.get(name)
    if expected is not None:
        for field in expected.fields:
            if isinstance(field.dataType, T.TimestampType) and isinstance(
                df.schema[field.name].dataType, T.LongType
            ):
                df = df.withColumn(
                    field.name, F.expr(f"timestamp_micros({field.name} div 1000)")
                )
    return df


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register temp views so queries can be written in Spark SQL."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
