"""Streaming jobs: watermarked session windows and per-cell tumbling rollups
over an arriving image/event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def streaming_sessionize(
    spark: SparkSession, input_dir: str, gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap sessionization as a streaming query (W1 ≡ session_window):
    one row per (user, session) with event count and bounds."""
    s = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return (
        s.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("start"), F.col("sw.end").alias("end"), "n_events")
    )


def streaming_cell_rollup(
    spark: SparkSession, input_dir: str, window: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling-window per-user value rollup — the streaming analogue of the
    per-cell aggregation (cells ≡ group keys, windows ≡ granule epochs)."""
    s = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return (
        s.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select("user_id", F.col("w.start").alias("w_start"), "n_events", "sum_value")
    )


def streaming_dedup(
    spark: SparkSession, input_dir: str, watermark: str = "1 day"
) -> DataFrame:
    """Streaming exact dedup: first occurrence wins within the watermark
    horizon (dropDuplicatesWithinWatermark ≡ the batch hash-groupBy dedup,
    with state bounded by the watermark — the streaming twin of
    dedup_exact)."""
    s = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    keyed = s.select(
        "event_id", "ts", "user_id", "event_type",
        F.xxhash64("event_type", "props").alias("content_hash"),
    )
    return (
        keyed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def run_to_memory(df: DataFrame, name: str, mode: str = "complete"):
    """Drain all available input (availableNow) into a memory sink; returns
    the finished query. Test/driver helper. Non-aggregating streams (e.g.
    dedup) require append mode."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
