"""Structured Streaming operators — event-time windows, sessionization,
streaming dedup.

The reference has NO streaming engine: it approximates streams with polling
jobs, table-change triggers, and the LAST keyword
(reference: mindsdb/interfaces/jobs/README.md:1-60,
triggers_controller.py:13-88, last_query.py:21-120). This module is the
genuinely-new capability: the same aggregations the batch probes compute
(P27 tumbling buckets, P28 sessionization) expressed as incremental
streaming plans with watermarked state.

All helpers take/return DataFrames so batch and streaming share operator
code; `run_available_now` drains a file-backed stream deterministically for
tests and backfills (the streaming equivalent of a batch run).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

col = F.col


def stream_from_parquet(
    spark: SparkSession,
    directory: str,
    schema,
    max_files_per_trigger: int | None = None,
    path_glob: str | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory (new files = new data).
    ``path_glob`` restricts to matching files — the file-stream source
    requires a directory basePath, so streaming one table out of a shared
    directory is directory + glob."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.parquet(directory)


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window aggregation with late-data watermark —
    the streaming form of probe P27."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.groupBy(F.window(col(ts_col), window_size).alias("w"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv")
    ).select(col("w.start").alias("h"), "event_type", "n", "sv")


def sliding_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.groupBy(F.window(col(ts_col), window_size, slide).alias("w"), "event_type").agg(
        F.count("*").alias("n")
    ).select(col("w.start").alias("ws"), col("w.end").alias("we"), "event_type", "n")


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per key — the streaming generalization of
    probe P28's lag-based session flag."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.groupBy(F.session_window(col(ts_col), gap).alias("s"), key).agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sv")
    ).select(
        col(key),
        col("s.start").alias("session_start"),
        col("s.end").alias("session_end"),
        "n_events",
        "sv",
    )


def streaming_dedup(events: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-key streaming dedup with bounded state."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.dropDuplicates(keys)


def run_available_now(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Drain a (bounded) stream with the available-now trigger into an
    in-memory sink and return the materialized result."""
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
