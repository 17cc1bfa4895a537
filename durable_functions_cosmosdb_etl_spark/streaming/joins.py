"""Stream-stream interval join (event-time correlated streams).

Absent from the reference (its change feed is a single stream;
SURVEY.md §2.2 streaming rows). The canonical attribution shape: join
each purchase to the same user's clicks in the preceding interval.

State bounds at scale: BOTH sides carry watermarks and the join
condition bounds event-time distance, so Spark evicts buffered rows
older than (watermark − interval) per side. State size is
O(arrival rate × (watermark + interval)) per key shard — independent of
stream length. Without the time-range condition the join would buffer
both streams forever.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def streaming_click_attribution(
    spark: SparkSession,
    clicks_dir: str,
    purchases_dir: str,
    schema: T.StructType,
    watermark: str = "30 minutes",
    attribution_window: str = "INTERVAL 30 MINUTES",
    query_name: str = "attribution",
):
    """purchases ⋈ clicks on user within a trailing attribution window.

    Inner stream-stream join in append mode: a pair emits once both
    sides have passed the watermark gate. One drain (availableNow) over
    the file backlogs; the memory sink holds the emitted pairs.
    """
    clicks = (
        spark.readStream.schema(schema)
        .parquet(clicks_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(purchases_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"""
            p_user = c_user
            AND click_ts >= purchase_ts - {attribution_window}
            AND click_ts <= purchase_ts
            """
        ),
        "inner",
    ).select(
        "purchase_id", F.col("p_user").alias("user_id"), "purchase_ts",
        "click_id", "click_ts",
    )
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
