"""Structured-Streaming counterparts of the batch aggregations (SURVEY §2.F6).

The reference processes summary statistics in batch steps; a
streaming-first engine must express the same windowed aggregations
over an unbounded source. This module provides a watermarked
tumbling-window aggregation over a file stream and an
``availableNow`` runner that drains the current files and returns the
result as a batch DataFrame (which makes the operator oracle-checkable:
with a complete drain, streaming and batch semantics coincide).

Scale notes: file-stream → watermark 1h → tumbling window per
(user_id, window) is a streaming state store keyed by a
high-cardinality composite; sums use decimal to stay merge-exact
across micro-batches; at cluster scale the same plan runs continuous
with checkpointing — the query shape is identical.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(38,6)"
WINDOW_US = 86_400_000_000  # 1 day tumbling windows (epoch-aligned)


def windowed_event_agg(stream: DataFrame) -> DataFrame:
    """Tumbling 1-day window count + exact sum per user over a stream.

    ``ts`` arrives as nanosecond longs (see sources/readers.py); the
    event time is reconstructed for watermarking, while the emitted
    window key is the epoch-µs window start (oracle-friendly integer).
    """
    with_time = stream.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )
    return (
        with_time.withWatermark("event_time", "1 hour")
        .groupBy(
            F.window("event_time", "1 day").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_keys(stream: DataFrame) -> DataFrame:
    """Stateful streaming dedup on the natural key.

    Implemented as a keyed aggregation (min arrival id + duplicate
    count) rather than dropDuplicates: the kept row is then
    deterministic (lowest event_id) regardless of partition/task
    ordering — required for the oracle and the right semantics for a
    lineage-preserving dedup anyway.
    """
    return (
        stream.withColumn("pos", F.expr("ts div 1000"))
        .groupBy("user_id", "event_type", "pos")
        .agg(
            F.min("event_id").alias("first_event_id"),
            F.count("*").alias("n_dups"),
        )
    )


def run_dedup_available_now(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_dedup"
) -> DataFrame:
    """Drain the events file-stream through the stateful dedup."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    out = dedup_keys(stream)
    checkpoint = tempfile.mkdtemp(prefix="gentropy_spark_ckpt_")
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def run_available_now(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_window_agg"
) -> DataFrame:
    """Drain the events file-stream with trigger(availableNow) and
    return the windowed aggregate as a batch DataFrame."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # File-stream basePath must be a directory; select the single table
    # via a glob filter (same listing the batch reader would do).
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    out = windowed_event_agg(stream)
    checkpoint = tempfile.mkdtemp(prefix="gentropy_spark_ckpt_")
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
