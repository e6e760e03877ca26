"""Streaming over the events table: tumbling windows, watermarks, sessions.

The reference's only streaming surface is the heartbeat event plane
(`JobEventRunning`, `pkg/executor/constants.go:66-72`) consumed by polling
waiters (`cmd/bacalhau/docker_run.go:60-139`). The Spark-first engine
promotes it to Structured Streaming: readStream over the event log,
watermarked windowed aggregates, memory/foreachBatch sinks. Q28's contract:
the streaming aggregate must equal the batch aggregate over the same data
(tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table

# ts declared bigint: the fixture stores TIMESTAMP(NANOS), read as raw nanos
# (legacy nanosAsLong, see catalog.py) and rebuilt as a µs timestamp below.
EVENTS_SCHEMA = ("event_id bigint, ts bigint, user_id bigint, "
                 "event_type string, value double, props string")


def q28_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling-window aggregate (Q28), batch form. Epoch-aligned
    buckets (session TZ pinned UTC) so the oracle's time_bucket matches."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 3).alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "c", "s")
        .orderBy("ws", "event_type")
    )


def stream_tumbling_window(spark: SparkSession, sf_dir: str,
                           watermark: str = "2 hours") -> DataFrame:
    """The same aggregate through readStream (file source) with a watermark.
    Late rows beyond the watermark are dropped — the policy surface the
    batch query doesn't need. Returns the streaming DataFrame; callers
    attach a sink (tests use a memory sink in complete mode)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file stream source monitors a *directory*; the fixture is a single
    # file, so stream the parent dir with a glob (the production shape is an
    # append-only event-log directory anyway).
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 3).alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "c", "s")
    )


def run_stream_to_memory(spark: SparkSession, sf_dir: str,
                         table_name: str = "stream_q28",
                         timeout_sec: int = 120) -> DataFrame:
    """Run the streaming aggregate to completion over the (finite) fixture
    dir and return the materialized result for batch comparison."""
    q = (
        stream_tumbling_window(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
    return spark.table(table_name).orderBy("ws", "event_type")


def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window batch aggregate (1 h window, 30 min slide) — each event
    lands in two windows."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("c"))
        .select(F.col("w.start").alias("ws"), "event_type", "c")
        .orderBy("ws", "event_type")
    )


QUERIES = {
    "q28_tumbling_window": (
        q28_tumbling_window,
        "SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type, "
        "COUNT(*) AS c, ROUND(SUM(value), 3) AS s "
        "FROM events GROUP BY 1, 2 ORDER BY ws, event_type",
    ),
    "nd_sliding_window": (
        sliding_window,
        "SELECT ws, event_type, COUNT(*) AS c FROM ("
        "SELECT time_bucket(INTERVAL '30 minutes', ts) AS b0, ts, event_type "
        "FROM events) t "
        "CROSS JOIN LATERAL (SELECT unnest([b0, b0 - INTERVAL '30 minutes']) AS ws) w "
        "GROUP BY ws, event_type ORDER BY ws, event_type",
    ),
}
