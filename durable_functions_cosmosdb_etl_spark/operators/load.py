"""Load stage (reference operator O6): surrogate keys + partitioned write.

The reference's ``SaveDocumentsAsync`` (/root/reference/EtlProcess.cs:
163-179) overwrites each row's id with a fresh Guid (:174) and writes
row-at-a-time to the ``extracted`` container partitioned by
``/LogicalPartition`` (:165). Spark-native: one ``withColumn`` + one
bulk partitioned write — vectorized, no per-row I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.generator import _deterministic_uuid


def assign_surrogate_keys(df: DataFrame, deterministic: bool = False) -> DataFrame:
    """item.Id = Guid.NewGuid() per row (EtlProcess.cs:174).

    ``deterministic=True`` derives the uuid-shaped key from existing
    columns (md5 of the row's id+name) for golden tests.
    """
    if deterministic:
        key = _deterministic_uuid(F.concat_ws("|", F.col("id"), F.col("name")))
    else:
        key = F.uuid()
    return df.withColumn("id", key)


def save_documents(
    df: DataFrame,
    path: str,
    partition_by: str = "logical_partition",
    mode: str = "append",
) -> None:
    """Bulk write to the staging table, partitioned by the logical key.

    Directory-partitioning on ``logical_partition`` mirrors the Cosmos
    partition key (EtlProcess.cs:165) and buys partition pruning for
    every downstream query that filters on it. At 100 TB you'd also
    bucket high-cardinality join keys; the logical key here is
    low-cardinality (3 values) so plain hive-style partitioning is right.
    """
    df.write.mode(mode).partitionBy(partition_by).parquet(path)
