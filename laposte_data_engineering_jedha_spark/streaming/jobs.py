"""Structured Streaming jobs over the `events` table.

The aggregation logic is built once against a generic DataFrame, so the
SAME plan runs (a) in batch mode for the DuckDB oracle gate and (b) under
`readStream` with a watermark for the streaming tests — the recommended
Spark pattern for keeping batch and streaming semantics provably aligned.

Scale notes: tumbling-window counts are a streaming state store keyed by
(window, event_type) — bounded by watermark expiry; sessionization's
streaming twin would use `applyInPandasWithState` keyed by user_id (the
batch window-function version lives in queries/llmops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import EVENTS_SCHEMA

WINDOW = "5 minutes"
WATERMARK = "10 minutes"


def tumbling_counts(events: DataFrame, with_watermark: bool = False) -> DataFrame:
    """Per-(5-min window, event_type) count + exact decimal value sum.

    Works unchanged on batch and streaming inputs. The window start is
    emitted as epoch seconds (a BIGINT) so results are timezone-agnostic;
    the value sum aggregates DECIMAL(18,4) internally (exact, order-free —
    double summation would be partition-order dependent) and casts to
    double at the end.
    """
    src = events.withWatermark("ts", WATERMARK) if with_watermark else events
    return (
        src.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet directory.

    `maxFilesPerTrigger=1` keeps micro-batches small; on a cluster this
    source is swapped for Kafka with identical downstream plan.
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )


def run_tumbling_counts_available_now(
    spark: SparkSession, events_dir: str, query_name: str = "tumbling_counts"
) -> DataFrame:
    """Drive the streaming job to completion with the availableNow trigger
    into a memory sink; returns the final result as a batch DataFrame."""
    stream = tumbling_counts(read_events_stream(spark, events_dir), with_watermark=True)
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
