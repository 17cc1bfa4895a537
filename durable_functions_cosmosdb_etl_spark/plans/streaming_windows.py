"""Event-time window queries (streaming semantics, batch-checkable).

The reference's only stream is the change feed (no event time,
EtlProcess.cs:183-187); the engine adds real event-time windowing
(SURVEY.md §2.2 streaming rows). These queries compute the SAME
tumbling/sliding/session aggregations a Structured Streaming query
produces after watermark close — expressed over the batch `events`
table so the driver can oracle-check them. The live `readStream`
counterparts (with watermarks/checkpoints) are exercised in
tests/test_streaming.py over the identical logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.fixedpoint import fixed, unfixed
from ..sources.tables import load_table
from .registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "window_tumbling",
    extra=True,
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
           event_type, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type.

    Streaming form: ``readStream.withWatermark("ts", "10 minutes")
    .groupBy(window("ts", "1 hour"), "event_type")`` — identical
    aggregation, incremental state. Scale: pre-shuffle partial
    aggregation makes shuffle volume O(windows × types), not O(events).
    """
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            unfixed(F.sum(fixed("value"))).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "window_sliding",
    extra=True,
    oracle="""
    WITH starts AS (
        SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP)
                   AS window_start, value FROM events
        UNION ALL
        SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP)
                   - INTERVAL 30 MINUTE, value FROM events)
    SELECT window_start, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value
    FROM starts GROUP BY window_start
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): each event lands in 2
    windows. Spark expands via the `window` generator; the oracle
    reproduces the expansion with two shifted time_buckets."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            unfixed(F.sum(fixed("value"))).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@query(
    "window_tumbling_sliding",
    oracle="""
    SELECT 'tumbling' AS kind,
           CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP)
               AS window_start,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'sliding', window_start, count(*),
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
    FROM (
        SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP)
                   AS window_start, value FROM events
        UNION ALL
        SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP)
                   - INTERVAL 30 MINUTE, value FROM events)
    GROUP BY window_start
    """,
)
def window_tumbling_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (1 h) and sliding (1 h size / 30 min slide) event-time
    windows in one tagged result — both via the `window` generator the
    streaming engine uses; each event lands in one tumbling and two
    sliding windows. Consolidates the former window_tumbling /
    window_sliding entries (kept as extras; the live readStream
    counterparts with watermarks run in tests/test_streaming.py).
    Scale: map-side partial aggregation keeps shuffle volume
    O(windows), not O(events).
    """
    e = _events(spark, sf_dir)
    tumbling = (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            unfixed(F.sum(fixed("value"))).alias("total_value"),
        )
        .select(
            F.lit("tumbling").alias("kind"),
            F.col("w.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )
    sliding = (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            unfixed(F.sum(fixed("value"))).alias("total_value"),
        )
        .select(
            F.lit("sliding").alias("kind"),
            F.col("w.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )
    return tumbling.union(sliding)


@query(
    "window_session",
    oracle="""
    WITH x AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                     OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events),
    y AS (
        SELECT user_id, ts, value,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM x)
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value
    FROM y GROUP BY user_id, grp
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute inactivity gap) per user.

    Spark's `session_window` merges events closer than the gap; the
    oracle is the classic gaps-and-islands rewrite (lag + running break
    count). Streaming form adds `withWatermark` for state eviction.
    """
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            unfixed(F.sum(fixed("value"))).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
