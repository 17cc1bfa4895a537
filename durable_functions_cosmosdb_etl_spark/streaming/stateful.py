"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only cross-batch state is the change-feed checkpoint
(/root/reference/EtlProcess.cs:184-185) — consumer *position*, no user
state. This module provides the engine's arbitrary-stateful surface
(SURVEY.md §2.2 "Streaming: stateful ops"): per-key state that survives
micro-batch boundaries via the state store, the building block for
running aggregates, session tracking, or anomaly flags that built-in
windowed aggs can't express.

Scale posture: state is partitioned by the grouping key across the
cluster (one state-store shard per shuffle partition); each executor
holds only its keys' state, checkpointed incrementally. A GroupState
timeout (`GroupStateTimeout.EventTimeTimeout` + watermark) would bound
state for abandoned keys — not enabled here because the demo drains
bounded backlogs.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql import types as T

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _update_running_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this batch's rows for one user into persistent (n, cents).

    Value sums are kept in integer cents so state totals are exact and
    associative across arbitrary batch splits (same rationale as
    functions/fixedpoint.py).
    """
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += int(len(pdf))
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value_cents": [cents],
        }
    )


class RunningTotalsProcessor(StatefulProcessor):
    """transformWithState processor: per-user (n, cents) running totals.

    The Spark 4 arbitrary-state API (successor to
    applyInPandasWithState): state is declared as named typed handles
    (ValueState here; ListState/MapState/timers available), the
    processor sees Arrow row batches per key, and the state store
    supports TTL natively. Same semantics as _update_running_totals
    above — both are provided so either API surface is covered.
    """

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, cents = (
            self._totals.get() if self._totals.exists() else (0, 0)
        )
        for pdf in rows:
            n += int(len(pdf))
            cents += int(
                pdf["value"].mul(100).round().astype("int64").sum()
            )
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value_cents": [cents],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def streaming_running_totals_tws(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
):
    """streaming_running_totals, rebuilt on transformWithStateInPandas.

    Requires the RocksDB state-store provider (the only provider
    implementing the new API's column families) AND the protobuf
    package (the Python↔JVM state-server protocol) — protobuf is not
    installed in this container, so the accompanying test self-skips
    here; the code path is exercised on any standard Spark 4 install.
    """
    from pyspark.sql import functions as F

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    proc = RunningTotalsProcessor()
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

    def sink(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_running_totals(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
):
    """Per-user running (count, value-cents) totals across micro-batches.

    Each micro-batch emits the *updated* totals for users seen in that
    batch (output mode "update"); totals accumulate in the state store,
    so a user's row after batch k reflects all events in batches ≤ k.
    Updates land in ``out_dir`` via foreachBatch append stamped with
    batch_id (the memory sink cannot resume from a checkpoint; a real
    deployment appends to a log table exactly like this and reads the
    latest row per key).
    """
    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = (
        src.groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

    def sink(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
