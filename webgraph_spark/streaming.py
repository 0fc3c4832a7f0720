"""Structured Streaming surface: incremental graph ingest + windowed
event aggregation.

The reference is a static-graph engine (no streaming exists there —
SURVEY.md §2.2); this module is the engine-side extension a continuously
crawled link graph needs, built on the standard Structured Streaming
primitives:

  * stream_edges / start_incremental_degrees: file-source edge stream
    folded into a degree table via foreachBatch. Each micro-batch's
    partial counts land in an append-only `batch_id=N` partition
    (dynamic overwrite per batch id -> IDEMPOTENT under foreachBatch's
    at-least-once retries; no read-modify-write of a live table, which
    is also the object-store-safe shape — on Iceberg this becomes a
    MERGE INTO). `read_degrees` folds the log at read time with one
    partial+final hash aggregation.
  * stream_events_hourly: watermarked 1-hour tumbling-window
    aggregation in APPEND mode — a window is emitted exactly once,
    when the event-time watermark passes its end (late data inside the
    watermark still lands in its window; later data is dropped). The
    batch twin is the `events_window` contract query.

Both run with `trigger(availableNow=True)` in tests: process everything
pending, then stop — restart-safe through the stream checkpoint, which
is exactly the backfill-then-incremental operating mode of a 100 TB
ingest (each restart picks up only new files; state lives in the
checkpoint, not the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long"
EVENT_SCHEMA = "ts timestamp, event_type string, value double"


def stream_edges(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source edge stream: every parquet file that appears under
    input_dir is processed exactly once (tracked in the checkpoint)."""
    return spark.readStream.schema(EDGE_SCHEMA).parquet(input_dir)


def start_incremental_degrees(
    spark: SparkSession, input_dir: str, log_dir: str, checkpoint_dir: str
):
    """Fold an edge stream into an out-degree table, incrementally.

    Returns the StreamingQuery (availableNow trigger: drains pending
    input, then finishes). Per batch: one map-side-combined groupBy of
    ONLY the new edges; the write is `log_dir/batch_id=N` overwrite, so
    a retried batch replaces itself instead of double counting.
    """

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("src")
            .agg(F.count("*").alias("outdeg"))
            .write.mode("overwrite")
            .parquet(f"{log_dir}/batch_id={batch_id}")
        )

    return (
        stream_edges(spark, input_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_degrees(spark: SparkSession, log_dir: str) -> DataFrame:
    """Current degrees = fold of all batch partials (one partial+final
    hash agg; the per-batch partitions prune on batch_id if filtered)."""
    return (
        spark.read.option("basePath", log_dir)
        .parquet(f"{log_dir}/batch_id=*")
        .groupBy("src")
        .agg(F.sum("outdeg").alias("outdeg"))
    )


def stream_events_hourly(
    spark: SparkSession, input_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation (streaming twin of the
    `events_window` contract query): 1-hour event-time windows, late
    rows within `watermark` still counted, older rows dropped."""
    ev = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_ts"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def start_events_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
):
    """APPEND-mode sink: each window row is written exactly once, when
    the watermark passes the window end — the exactly-once finalized
    shape a downstream consumer (or Iceberg table) wants."""
    return (
        stream_events_hourly(spark, input_dir, watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
