"""Structured Streaming conformance queries.

These run a REAL streaming execution (readStream over the events
parquet, availableNow trigger, memory sink) and return the final
result DataFrame — oracled by the same ANSI SQL as the batch
time-series operators, proving batch/stream semantic equivalence
(the whole point of reusing one expression for both modes).
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from easydb_server_spark.queries.timeseries import (
    ORACLE_TS_SESSION,
    ORACLE_TS_SLIDING,
    ORACLE_TS_TUMBLING,
)
from easydb_server_spark.streaming.events import run_to_memory


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from easydb_server_spark.queries._util import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # streaming state-store partition count is fixed per query at start;
    # a vanilla (driver-built) session defaults to 200 — far too many
    # tasks for this source, and unlike batch, AQE can't coalesce them
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_event_ts(src)


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window counts == batch ts_tumbling oracle."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").cast("string").alias("window_start"), "event_type", "n", "total")
    )
    name = f"stream_tumbling_{int(time.time() * 1000)}"
    run_to_memory(agg, name, output_mode="complete")
    return spark.table(name).orderBy("window_start", "event_type")


ORACLE_STREAM_TUMBLING = ORACLE_TS_TUMBLING


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding windows (2h size / 1h slide, overlapping
    state) == batch ts_sliding oracle."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").cast("string").alias("window_start"), "n", "sum_value")
    )
    name = f"stream_sliding_{int(time.time() * 1000)}"
    run_to_memory(agg, name, output_mode="complete")
    return spark.table(name).orderBy("window_start")


ORACLE_STREAM_SLIDING = ORACLE_TS_SLIDING


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (stateful) == batch gaps-and-islands
    oracle."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.col("w.start").cast("string").alias("session_start"),
            "n_events",
            "session_value",
        )
    )
    name = f"stream_session_{int(time.time() * 1000)}"
    run_to_memory(agg, name, output_mode="complete")
    return spark.table(name).orderBy("user_id", "session_start")


ORACLE_STREAM_SESSION = ORACLE_TS_SESSION


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming event dedup: ``dropDuplicates`` keyed on (user_id,
    event_type, 1h event-time window) with a watermark — the standard
    at-most-once-per-key-per-window ingestion guard for training-data
    event feeds. The window struct carries event-time metadata, so the
    dedup state for a window evicts once the watermark passes it —
    bounded state at unbounded ingest. A single availableNow pass over
    the bounded table equals the batch DISTINCT oracle."""
    src = _events_stream(spark, sf_dir)
    dedup = (
        src.withWatermark("ts", "2 hours")
        .withColumn("w", F.window("ts", "1 hour"))
        .dropDuplicates(["user_id", "event_type", "w"])
        .select(
            "user_id",
            "event_type",
            F.col("w.start").cast("string").alias("window_start"),
        )
    )
    name = f"stream_dedup_{int(time.time() * 1000)}"
    run_to_memory(dedup, name, output_mode="append")
    return spark.table(name).orderBy("user_id", "event_type", "window_start")


ORACLE_STREAM_DEDUP = """
SELECT DISTINCT user_id, event_type,
       CAST(time_bucket(INTERVAL 1 HOUR, ts) AS VARCHAR) AS window_start
FROM events
ORDER BY user_id, event_type, window_start
"""


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join run as a real streaming job: each
    view joined to the same user's purchases within 6 hours after it.
    Both sides watermarked (≥ the join delay) and the condition bounds
    event time in both directions, so buffered rows evict once they
    can no longer match — bounded state at unbounded ingest. A single
    availableNow pass equals the batch interval join oracle."""
    from easydb_server_spark.streaming.events import stream_stream_join

    src = _events_stream(spark, sf_dir)
    joined = stream_stream_join(
        src.where(F.col("event_type") == "view"),
        src.where(F.col("event_type") == "purchase"),
        max_delay="6 hours",
        watermark="7 hours",
    ).select("v_id", "p_id", F.col("v_user").alias("user_id"))
    name = f"stream_join_{int(time.time() * 1000)}"
    run_to_memory(joined, name, output_mode="append")
    return spark.table(name).orderBy("v_id", "p_id")


ORACLE_STREAM_JOIN = """
SELECT v.event_id AS v_id, p.event_id AS p_id, v.user_id
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 6 HOUR
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
ORDER BY v_id, p_id
"""


def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): funnel
    detection, run as a real streaming job. No SQL oracle by
    construction — the sequential reset semantics aren't
    ANSI-expressible; correctness evidence is the batch↔stream
    equivalence test (tests/test_stateful.py) and the unit suite for
    the state machine."""
    from easydb_server_spark.operators.stateful import funnel_detection_stream

    out = funnel_detection_stream(_events_stream(spark, sf_dir), timeout_s=3 * 86400)
    name = f"stream_funnel_{int(time.time() * 1000)}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("user_id", "signup_ts")
