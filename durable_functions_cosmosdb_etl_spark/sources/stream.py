"""Change-feed-analog streaming source (reference operator O7).

The reference consumes a Cosmos change feed in capped micro-batches
(``MaxItemsPerInvocation=10``, /root/reference/EtlProcess.cs:183-187)
with consumer progress in a lease container (:184-185). The Spark-native
equivalent is a file-source ``readStream`` over a staging directory:

- ``maxFilesPerTrigger`` plays ``MaxItemsPerInvocation`` (declarative
  rate limiting — replaces the reference's ``Task.Delay(100)`` throttle,
  EtlProcess.cs:204, operator O10).
- the checkpoint location plays the ``transformsLease`` container.
- at-least-once redelivery + idempotent upsert sink → effectively-once,
  same end state the reference reaches via upsert on ``/id``
  (EtlProcess.cs:188).

In production against Cosmos the same pipeline binds to the public
``cosmos.oltp.changeFeed`` format string; the source is an interface
seam (SURVEY.md §4.3), not a hard dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_staging_stream(
    spark: SparkSession,
    staging_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = 1,
    fmt: str = "parquet",
) -> DataFrame:
    """readStream over the staging dir with capped micro-batches."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(staging_dir)
