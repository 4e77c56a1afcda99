"""Structured Streaming surface for event tables.

The reference has no streaming operators (its "incremental" Cobweb is
order-dependent sequential insertion — SURVEY §2.5), so batch + checkpoint
is the faithful execution model for the KG pipeline. This module covers the
stream-ingest side a production deployment needs anyway: the same windowed
aggregations as `q_events_hourly`, expressed over `readStream` with an
event-time watermark, so late events are handled and state is bounded.

`Trigger.AvailableNow` gives exactly-once batch-equivalent semantics:
tests assert stream output == the batch groupBy on the same files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over an events parquet directory (at cluster
    scale: Kafka or an Iceberg streaming read — same downstream plan)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window per event_type with a late-data
    watermark; works identically on a batch or streaming DataFrame."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def run_stream_available_now(result: DataFrame, query_name: str,
                             checkpoint_dir: str, timeout_sec: int = 120,
                             output_mode: str = "complete"):
    """Drain all available input into an in-memory sink (exactly-once),
    return the completed StreamingQuery.

    Raises TimeoutError if the drain does not finish within
    ``timeout_sec`` — a partial memory table must never be mistaken for
    the full result.

    ``output_mode`` caveat: the default ``complete`` keeps ALL window
    state for the lifetime of the query (the watermark never drops
    anything) — correct and bounded for an AvailableNow drain over a
    finite input, which is what this helper is for. A long-running
    24/7 deployment should instead write ``append`` mode to a real sink:
    with the watermark from ``windowed_event_counts``, each window is
    emitted once finalized and its state is evicted, keeping state
    bounded by (watermark horizon / window size).
    """
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"stream {query_name!r} did not drain within {timeout_sec}s; "
            "memory table would be partial"
        )
    return q
