"""Synthetic sample-document generator (reference operator O12).

Re-expresses the reference's HTTP generator endpoint
(``GenerateSampleDocumentList``, /root/reference/EtlProcess.cs:211-243)
as a distributed ``spark.range`` expression pipeline: fresh/deterministic
id, stringified "now" date (:231), ``Done="true"`` boolean-as-string
(:232), sequential description (:233), ``Item_{yyyyMMhhmm}_{i}`` name
(:234), constant ``Pr`` (:235), round-robin logical partition
``chr(65 + i % 3)`` (:236).

Scale note: ``spark.range(n)`` is an embarrassingly parallel source with
no shuffle; generating 10^12 rows is just more partitions. The only
nondeterminism (uuid, now) is injectable for oracle/golden tests
(SURVEY.md §4.2).
"""

from __future__ import annotations

import random
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _deterministic_uuid(col):
    """uuid-shaped deterministic id from an md5 of the input column."""
    h = F.md5(col.cast("string"))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def generate_sample_items(
    spark: SparkSession,
    count: int | None = None,
    clock: datetime | None = None,
    deterministic_ids: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate `count` SampleItem rows (reference EtlProcess.cs:227-239).

    ``count=None`` mirrors the reference's default: uniform random 10-200
    (EtlProcess.cs:223-225). ``clock`` fixes the generation timestamp for
    deterministic tests; ``deterministic_ids`` replaces ``uuid()`` with an
    md5-derived uuid-shaped id so golden tests can hash-match.
    """
    if count is None:
        count = random.randint(10, 200)  # rnd.Next(10, 200), EtlProcess.cs:224
    now = clock if clock is not None else datetime.now()
    date_str = now.strftime("%m/%d/%Y %H:%M:%S")  # DateTime.Now.ToString(), :231
    name_stamp = now.strftime("%Y%m%H%M")  # "yyyyMMhhmm" format, :234

    rng = spark.range(1, count + 1, numPartitions=num_partitions or 8)
    i = F.col("id")
    id_col = _deterministic_uuid(i) if deterministic_ids else F.uuid()
    return rng.select(
        id_col.alias("id"),  # Guid.NewGuid(), :230
        F.lit(date_str).alias("date"),
        F.format_string("Sample item #%d of %d generated", i, F.lit(count)).alias(
            "desc"
        ),  # :233
        F.lit("true").alias("done"),  # :232
        F.format_string(f"Item_{name_stamp}_%d", i).alias("name"),  # :234
        F.lit("Additional field info").alias("pr"),  # :235
        F.concat(F.lit("Partition_"), F.char(F.lit(65) + i % 3)).alias(
            "logical_partition"
        ),  # (char)(65 + i % 3), :236
    )
