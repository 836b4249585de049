"""Watermarked tumbling-window aggregation over the change stream
(SURVEY.md §2.9 / A7's streaming form: time-bucketed counts with
late-data handling).

The reference buckets trials per month with $dateToString + $group
(st_trial_analytics.py:346-370) on data at rest. The streaming engine
computes the same shape incrementally: tumbling ``window(warc_ts)``
counts with a watermark bounding how long state waits for out-of-order
events (the generator emits up to ``max_lag_s`` of lag). Append mode
emits each window exactly once, when the watermark passes its end —
so downstream consumers (a parquet/lake sink) see finalized,
immutable rows, matching the exactly-once posture of the MERGE path.

State size is O(open windows x groups), independent of stream length —
the property that keeps this runnable against an unbounded 10^10-event
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_trials_etl_spark.cdc.stream import TRANSPORT_SCHEMA


def windowed_op_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "2 hours",
    time_col: str = "warc_ts",
) -> DataFrame:
    """Per-window, per-op counts + distinct-url sketch. Works on both
    streaming and batch DataFrames (the test uses the batch run as the
    oracle for the streamed, finalized windows)."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(
            F.window(F.col(time_col), window_duration).alias("w"),
            F.col("op"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.approx_count_distinct("url").alias("approx_urls"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "cnt",
            "approx_urls",
        )
    )


def run_windowed_counts(
    spark: SparkSession,
    log_dir: str,
    checkpoint_dir: str,
    query_name: str = "windowed_counts",
    window_duration: str = "10 minutes",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 2,
) -> DataFrame:
    """Stream the WAL dir through the windowed aggregation into an
    in-memory sink (append mode: finalized windows only) and return the
    emitted rows. Multiple micro-batches advance the watermark so
    earlier windows finalize during the run."""
    source = (
        spark.readStream.schema(TRANSPORT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("basePath", log_dir)
        .parquet(log_dir)
    )
    agg = windowed_op_counts(source, window_duration, watermark)
    query = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(query_name)


def sessionized_host_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    time_col: str = "warc_ts",
) -> DataFrame:
    """Per-host activity sessions via NATIVE session windows
    (``F.session_window``): a session extends while events keep arriving
    within ``gap`` and closes after that much quiet. Unlike the
    fixed-size ``window()`` aggregation above, session-window state
    merges adjacent windows as late events bridge them — the streaming
    twin of the batch gap-sessionization operator
    (operators/events_ops.py::q_w4_sessionize, which computes the same
    concept with lag+cumsum on data at rest). Works on both streaming
    and batch frames; state is O(open sessions), watermark-bounded."""
    host = F.regexp_extract("url", r"https?://([^/]+)/", 1)
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(
            F.session_window(F.col(time_col), gap).alias("w"),
            host.alias("host"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "host",
            "cnt",
        )
    )


def run_sessionized_counts(
    spark: SparkSession,
    log_dir: str,
    checkpoint_dir: str,
    query_name: str = "session_counts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 2,
) -> DataFrame:
    """Stream the WAL dir through the session-window aggregation
    (append mode: only sessions finalized by the watermark emit)."""
    source = (
        spark.readStream.schema(TRANSPORT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("basePath", log_dir)
        .parquet(log_dir)
    )
    agg = sessionized_host_counts(source, gap, watermark)
    query = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(query_name)
