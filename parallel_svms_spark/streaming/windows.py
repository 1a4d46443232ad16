"""Structured Streaming twins of the batch event operators (SURVEY §7.9
optional surface — the reference has no streaming; E6's tumbling window
gets a streaming twin with watermarking for late data).

The batch operator and the streaming twin share the same groupBy
(F.window) expression — Catalyst compiles the same logical aggregation
either way; only the source/sink and the watermark differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def stream_events_from_dir(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream (for tests/local: parquet dir; in production
    the same pipeline reads kafka — only this function changes)."""
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def windowed_counts(stream: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts with late-data watermark. State is
    bounded: watermark age × (n_types × windows/hour) rows."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 6).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"),
                "event_type", "n_events", "value_sum")
    )


def run_stream_to_memory(agg: DataFrame, query_name: str = "stream_out",
                         output_mode: str = "append"):
    """Drive a bounded file-stream to completion synchronously (test
    harness: memory sink + processAllAvailable)."""
    q = (agg.writeStream.outputMode(output_mode)
         .format("memory").queryName(query_name).start())
    q.processAllAvailable()
    q.stop()
    return query_name
