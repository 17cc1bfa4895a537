"""Sinks: append, key-idempotent upsert, and the run-audit table.

Reference operators O11 (upsert to ``transformed`` keyed on ``/id``,
/root/reference/EtlProcess.cs:188-206) and O4 (append an
``OrchestrationRun`` audit row, EtlProcess.cs:120-130).

Upsert strategy: plain parquet has no MERGE, so the upsert sink keeps
one subdirectory per micro-batch and resolves last-writer-wins by
(key, batch_id) at read time via ``latest_view``. With Delta/Iceberg in
production the same call becomes a real ``MERGE INTO`` — the interface
is the seam, mirroring how the reference gets idempotency from Cosmos
upsert-on-partition-key. Re-delivered batches overwrite their own
subdirectory (idempotent by construction), which is exactly the
effectively-once contract the reference approximates (SURVEY.md §3 EP2).
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import ORCHESTRATION_RUN_SCHEMA


def append(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def upsert_batch(df: DataFrame, table_dir: str, batch_id: int | str) -> None:
    """Idempotent per-batch write: batch re-delivery overwrites itself.

    ``foreachBatch`` hands the same batch_id on retry; overwrite-by-batch
    makes the sink idempotent (exactly-once end state) without a
    transaction log.
    """
    out = os.path.join(table_dir, f"batch_id={batch_id}")
    df.write.mode("overwrite").parquet(out)


def latest_view(
    spark: SparkSession, table_dir: str, key: str = "id", version_col: str = "batch_id"
) -> DataFrame:
    """Resolve upserts: latest batch wins per key.

    One shuffle on the key — the same cost a MERGE pays. At scale the
    window runs per key-partition; no global sort.
    """
    df = spark.read.option("basePath", table_dir).parquet(table_dir)
    w = Window.partitionBy(key).orderBy(F.col(version_col).cast("long").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def audit_run(
    spark: SparkSession,
    audit_dir: str,
    start_time: datetime,
    end_time: datetime,
    succeeded: bool,
    additional_info: str = "",
    forced_lease: bool = False,
    worker: str = "spark-driver",
) -> None:
    """Append one OrchestrationRun row (EtlProcess.cs:120-130).

    duration = (end - start).TotalSeconds (EtlProcess.cs:125). Tiny
    single-row append — the one place driver-side data is fine.
    """
    row = [
        (
            str(uuid.uuid4()),
            start_time,
            end_time,
            (end_time - start_time).total_seconds(),
            forced_lease,
            succeeded,
            worker,
            additional_info,
        )
    ]
    spark.createDataFrame(row, schema=ORCHESTRATION_RUN_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(audit_dir)
