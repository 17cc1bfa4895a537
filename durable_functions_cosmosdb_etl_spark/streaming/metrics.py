"""Per-micro-batch metrics capture — the streaming half of operator O4.

The reference appends an ``OrchestrationRun`` audit row per run with a
computed duration (/root/reference/EtlProcess.cs:120-130); its streaming
analog (SURVEY.md §2.1 O4) is ``StreamingQueryListener``: Spark calls
back with per-batch progress (rows, rates, stage durations), which this
module lands in the same kind of append-only parquet audit table as
``sinks.writers.audit_run``.

Design: the listener only BUFFERS (a thread-safe list append) —
callbacks run on Spark's listener-bus thread, where launching jobs is a
deadlock-shaped anti-pattern — and ``flush()`` appends the buffered
rows from the caller's thread after ``awaitTermination``. One tiny row
per micro-batch: O(batches), the same driver-side cost class as the
run-audit row and the lease file.
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener

BATCH_METRIC_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("query_name", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_second", T.DoubleType()),
        T.StructField("processed_rows_per_second", T.DoubleType()),
        T.StructField("trigger_ms", T.LongType()),
        T.StructField("event_timestamp", T.StringType()),
    ]
)


class BatchMetricsListener(StreamingQueryListener):
    """Buffers one metrics row per completed micro-batch.

    Attach with ``spark.streams.addListener(listener)`` before starting
    the query; call :meth:`flush` after the query finishes to append the
    rows to a parquet audit table (and clear the buffer). ``rows`` is
    also directly inspectable for in-process monitoring/tests.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.rows: list[tuple] = []

    # -- listener-bus callbacks (no Spark calls here) ------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = (
            str(p.id),
            p.name,
            int(p.batchId),
            int(p.numInputRows),
            float(p.inputRowsPerSecond or 0.0),
            float(p.processedRowsPerSecond or 0.0),
            int((p.durationMs or {}).get("triggerExecution", 0)),
            p.timestamp,
        )
        with self._lock:
            self.rows.append(row)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- main-thread side ----------------------------------------------

    def snapshot(self) -> list[tuple]:
        with self._lock:
            return list(self.rows)

    def flush(self, spark: SparkSession, metrics_dir: str) -> int:
        """Append buffered rows to the parquet metrics table; returns the
        number of rows written. Call from the main thread (NOT a
        callback) once the query has terminated.

        Written driver-side with pyarrow (round 8, same fix as
        ``audit_run``): a list-backed ``createDataFrame`` launches a
        pickled-Python Spark job per flush — several seconds for a
        handful of scalar rows; the direct write is ~ms and lands via
        dot-prefixed tmp + rename so readers never see a partial file.
        ``spark`` stays in the signature as the reader seam."""
        import os
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        with self._lock:
            rows, self.rows = self.rows, []
        if rows:
            cols = list(zip(*rows))
            table = pa.table(
                {
                    "query_id": pa.array(cols[0], pa.string()),
                    "query_name": pa.array(cols[1], pa.string()),
                    "batch_id": pa.array(cols[2], pa.int64()),
                    "num_input_rows": pa.array(cols[3], pa.int64()),
                    "input_rows_per_second": pa.array(cols[4], pa.float64()),
                    "processed_rows_per_second": pa.array(
                        cols[5], pa.float64()
                    ),
                    "trigger_ms": pa.array(cols[6], pa.int64()),
                    "event_timestamp": pa.array(cols[7], pa.string()),
                }
            )
            os.makedirs(metrics_dir, exist_ok=True)
            name = f"part-{_uuid.uuid4().hex}.parquet"
            tmp = os.path.join(metrics_dir, f".{name}.tmp")
            pq.write_table(table, tmp)
            os.rename(tmp, os.path.join(metrics_dir, name))
        return len(rows)
