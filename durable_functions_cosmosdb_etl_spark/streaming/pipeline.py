"""Incremental transform pipeline — Structured Streaming analog of EP2.

The reference's change-feed consumer (/root/reference/EtlProcess.cs:
183-209) maps 1:1 onto a file-source micro-batch stream:

| reference                          | here                               |
|------------------------------------|------------------------------------|
| CosmosDBTrigger on `extracted`     | readStream over the staging dir    |
| MaxItemsPerInvocation=10 (:186)    | maxFilesPerTrigger                 |
| transformsLease container (:184)   | checkpointLocation                 |
| per-invocation batchGuid (:194)    | foreachBatch's batch_id            |
| 100 ms/doc throttle (:204)         | trigger pacing (declarative)       |
| upsert on /id → effectively-once   | idempotent per-batch overwrite     |

Exactly-once end state: foreachBatch may re-deliver a batch after
failure, but ``upsert_batch`` writes to a batch-keyed subdirectory with
overwrite, so re-delivery replaces rather than duplicates — strictly
stronger than the reference's at-least-once upsert.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import SparkSession

from ..operators.transform import transform_items
from ..schemas import SAMPLE_ITEM_SCHEMA
from ..sinks.writers import upsert_batch
from ..sources.containers import Container
from ..sources.stream import read_staging_stream


def run_incremental_transform(
    spark: SparkSession,
    staging_dir: "str | Container",
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = 1,
    clock: datetime | None = None,
    available_now: bool | None = None,
    processing_time: str | None = None,
    sink: str = "batch_dirs",
    maintenance_every: int | None = None,
    compact_min_delta: float = 0.25,
):
    """Consume staged SampleItem files incrementally; transform; upsert.

    Trigger modes (operator O1, the reference's scheduled trigger,
    /root/reference/EtlProcess.cs:23 TimerTrigger ``0 */2 * * * *``):

    - ``available_now=True`` (the default when no ``processing_time`` is
      given): drain the backlog in capped micro-batches, then stop — the
      scheduled-batch analog (each cron firing is one drain).
    - ``processing_time="2 minutes"`` (implies ``available_now=False``;
      passing both explicitly is a contradiction and raises):
      a resident query that fires a micro-batch on the reference's exact
      cadence — ``Trigger.ProcessingTime`` IS the in-engine cron: the
      interval clock replaces the external scheduler, and the streaming
      checkpoint replaces the lease (a single resident query cannot
      overlap itself, which is all the reference's lease exists to
      prevent; see operators/lease.py for the multi-submitter case).
    - neither: run continuously as fast as batches complete.

    Sink modes (operator O11, the upsert-on-/id sink,
    /root/reference/EtlProcess.cs:188-206):

    - ``sink="batch_dirs"`` (default): batch-keyed overwrite dirs +
      ``latest_view`` read-time resolution — zero write amplification,
      read pays the per-key window.
    - ``sink="logtable"``: transactional MERGE into a
      :class:`~..sinks.logtable.LogTable` keyed on ``id`` — the stored
      table always holds one row per key, readers get snapshot
      isolation and time travel across micro-batches. Batch redelivery
      re-merges identical content: idempotent in state (a no-op
      version), matching the batch_dirs contract.
    - ``sink="logtable_deferred"``: merge-on-READ ingest —
      ``upsert_deferred`` appends each batch as delta units (commit
      cost = the batch, regardless of table size; the eager MERGE's
      per-batch bucket rewrite was the measured streaming bottleneck,
      SCALE.md §2b — measured 2.5× over eager at full key spread),
      readers resolve latest-per-key lazily, and ``compact()`` folds
      deltas back. **This is the recommended sink for write-heavy
      feeds** (high-frequency batches against a large stored table);
      use eager ``logtable`` only when every reader must see a
      merge-free base table at all times.

    ``maintenance_every=N`` (logtable sinks only): every N micro-batches
    the processor runs maintenance — ``checkpoint_log()`` always
    (bounds log replay to O(commits since checkpoint); an unbounded
    feed otherwise grows open cost linearly with age), and
    ``compact()`` only when the standing merge-on-read debt
    (``delta_fraction()``, driver arithmetic over logged footer stats)
    has reached ``compact_min_delta`` of the live rows. The
    delta-mass gate is what makes the cadence scale: compacting on a
    fixed batch count re-pays the whole-table write amplification the
    deferral saved once the table outgrows the batch (measured at 1M
    docs, SCALE.md §2b), while a fraction trigger compacts less often
    exactly as the table grows. ``compact_min_delta=0`` restores
    unconditional compaction. A separate maintenance job calling
    compact/checkpoint_log/vacuum under the writer lease is the
    off-hot-path equivalent.
    """
    if available_now is None:
        available_now = processing_time is None
    elif available_now and processing_time is not None:
        raise ValueError(
            "available_now=True and processing_time are mutually "
            "exclusive trigger modes"
        )
    if sink not in ("batch_dirs", "logtable", "logtable_deferred"):
        raise ValueError(f"unknown sink mode: {sink!r}")
    if isinstance(staging_dir, Container):
        # Connector path: cosmos.oltp.changeFeed (EtlProcess.cs:183-189)
        # — or any Container backend — through the seam's read_stream.
        stream = staging_dir.read_stream(spark, max_files_per_trigger)
    else:
        stream = read_staging_stream(
            spark, staging_dir, SAMPLE_ITEM_SCHEMA, max_files_per_trigger
        )

    table = None
    if sink in ("logtable", "logtable_deferred"):
        from ..sinks.logtable import LogTable

        table = LogTable(spark, out_dir, key="id")

    n_batches = [0]

    def process(batch_df, batch_id: int) -> None:
        out = transform_items(batch_df, batch_id=str(batch_id), clock=clock)
        if table is not None:
            if table.version() < 0:
                table.create(out)
            elif sink == "logtable_deferred":
                table.upsert_deferred(out)
            else:
                table.upsert(out)
            n_batches[0] += 1
            if maintenance_every and n_batches[0] % maintenance_every == 0:
                if table.delta_fraction() >= compact_min_delta:
                    table.compact()
                table.checkpoint_log()
        else:
            upsert_batch(out, out_dir, batch_id)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q


def streaming_tumbling_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    watermark: str = "10 minutes",
    window: str = "1 hour",
):
    """Event-time tumbling aggregation with a watermark (late-data drop).

    Append-mode to a parquet sink: a window emits exactly once, when the
    watermark passes its end — the state-eviction contract that bounds
    streaming state at scale (state size = open windows, not history).
    Runs one availableNow drain; call repeatedly with the same
    checkpoint to advance through arriving files.
    """
    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_dedup(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    schema,
    watermark: str = "30 minutes",
    query_name: str = "stream_dedup",
):
    """Stateful streaming dedup: dropDuplicatesWithinWatermark on event_id.

    The streaming analog of the reference's upsert-idempotency — state
    for an id is kept only within the watermark horizon, so memory is
    bounded by (arrival rate × watermark), not by history.
    """
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    deduped = src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
