"""Structured Streaming surface (engine addition — the reference is a batch
CLI with no streaming, SURVEY.md section 2.9).

The same tumbling-window aggregation as queries.q_events_window, expressed
as a streaming plan over a file source: watermarked event-time windows,
integer-unit value sums. In production the source is Kafka/Iceberg CDC; the
sandbox drives it with availableNow over the events parquet, which replays
the table through the streaming engine (incremental state store, same
result as batch — asserted in tests/test_streaming.py)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DataFrame: 1-hour tumbling windows per event_type."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # parquet carries TIMESTAMP_NTZ; watermarks need TIMESTAMP (session is
    # pinned UTC, so the instant is unchanged)
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        src.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(round(value * 10000.0) AS BIGINT)")).alias("value_e4"),
        )
        .select(
            F.expr("CAST(unix_timestamp(window.start) AS BIGINT)").alias("bucket"),
            "event_type",
            "n",
            "value_e4",
        )
    )


def run_stream_to_memory(spark: SparkSession, sf_dir: str, name: str = "events_out") -> DataFrame:
    """Drive the stream to completion with availableNow; returns the result
    as a batch DataFrame from the memory sink."""
    q = (
        events_stream_window(spark, sf_dir)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")
