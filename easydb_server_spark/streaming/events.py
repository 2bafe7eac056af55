"""Streaming event pipelines: file-source NDJSON → windowed aggs.

Design (pyspark Structured Streaming):

- source: ``readStream.schema(...).json(dir)`` — new files appear, the
  micro-batch planner picks them up; at scale this is a cloud-storage
  landing zone with file-notification mode.
- event time: ``ts`` column + ``withWatermark`` so state for closed
  windows is dropped (bounded state at 100 TB/day ingest).
- sinks: tests use ``trigger(availableNow=True)`` + memory sink;
  production uses parquet/Kafka with checkpointing.

The aggregation bodies are the *same expressions* as the batch
operators in queries/timeseries.py — one definition of correctness,
two execution modes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events_ndjson(spark: SparkSession, input_dir: str) -> DataFrame:
    """NDJSON directory → unbounded events DataFrame."""
    return spark.readStream.schema(EVENT_SCHEMA).json(input_dir)


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def sessionized(events: DataFrame, gap: str = "5 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Session windows per user (stateful streaming aggregation)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def stream_stream_join(
    views: DataFrame,
    purchases: DataFrame,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each view event joined to the same
    user's purchase events landing within ``max_delay`` after it.

    Both sides carry watermarks and the join condition bounds event
    time in BOTH directions, so Spark's state store evicts buffered
    rows once they can no longer match — the requirement for a
    stream-stream join to run indefinitely at 100 TB/day (an unbounded
    join condition would accumulate state forever).
    """
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    return v.join(
        p,
        F.expr(
            f"v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + INTERVAL {max_delay}"
        ),
    )


def run_to_memory(stream_df: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drain all available input into an in-memory table (tests/demo)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
