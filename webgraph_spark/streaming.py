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


# ---------------------------------------------------------------------------
# custom stateful operator: gap-based sessionization (applyInPandasWithState)
# ---------------------------------------------------------------------------

SESSION_SCHEMA = (
    "event_type string, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
_SESSION_STATE_SCHEMA = "start long, last long, n long, s double"


def _sessionize(gap_seconds: int):
    """Builds the per-key stateful kernel for applyInPandasWithState.

    State = the one OPEN session per key as epoch-micros ints (start,
    last, n, sum). Each trigger receives only that key's NEW rows
    (Arrow batches); the kernel sorts them by event time, splits on
    gaps > gap_seconds, emits every CLOSED session, and parks the last
    one in state with an event-time timeout at last + gap: when the
    watermark passes that point, Spark calls the kernel once more with
    state.hasTimedOut and the final session is emitted. Out-of-order
    rows inside the watermark are handled by the sort; older rows are
    dropped upstream by the watermark itself.
    """
    import pandas as pd

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state):
        rows = []
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )
            return
        for pdf in pdf_iter:
            rows.append(pdf[["ts", "value"]])
        if not rows:
            return
        ev = pd.concat(rows).sort_values("ts")
        ts = ev["ts"].astype("int64") // 1000  # ns -> epoch micros
        val = ev["value"].to_numpy()
        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
        out = []
        for t, v in zip(ts.to_numpy(), val):
            if start is None:
                start, last, n, s = int(t), int(t), 1, float(v)
            elif int(t) - last > gap_us:
                out.append((start, last, n, s))
                start, last, n, s = int(t), int(t), 1, float(v)
            else:
                last, n, s = max(last, int(t)), n + 1, s + float(v)
        state.update((start, last, n, s))
        state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "event_type": key[0],
                    "session_start": [pd.Timestamp(a, unit="us") for a, _, _, _ in out],
                    "session_end": [pd.Timestamp(b, unit="us") for _, b, _, _ in out],
                    "n_events": [c for _, _, c, _ in out],
                    "sum_value": [d for _, _, _, d in out],
                }
            )

    return fn


def stream_event_sessions(
    spark: SparkSession,
    input_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions per event_type — the custom stateful operator
    the built-in windowed aggregates can't express (a session's extent
    depends on the DATA, not a fixed grid). Built on
    applyInPandasWithState with event-time timeouts: state is one open
    session per key, closed sessions stream out exactly once.

    Scale shape: state is O(#keys), not O(#events); each trigger moves
    one Arrow batch per key partition through the Python worker, and
    the shuffle is the same hash(event_type) exchange a groupBy costs.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_seconds = int(pd_interval_seconds(gap))
    ev = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _sessionize(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def pd_interval_seconds(interval: str) -> float:
    """'30 minutes' / '2 hours' / '45 seconds' -> seconds."""
    n, unit = interval.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return float(n) * mult


def start_sessions_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
):
    return (
        stream_event_sessions(spark, input_dir, gap, watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# batch twin of the sessionizer (exactly oracle-checkable)
# ---------------------------------------------------------------------------


def batch_event_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Gap-based sessions over a STATIC events table — the exact batch
    semantics the streaming stateful operator converges to once every
    session has timed out. All-JVM: lag window flags gap breaks, a
    running sum numbers sessions, one aggregation folds them.

    keys: the session grouping (default per event_type; keys=
    ("user_id",) is the classic per-user shape, whose cardinality
    scales with the data — the window parallelizes across keys). Used
    as contract queries so the session semantics are
    DuckDB-oracle-checked exactly.
    """
    from pyspark.sql import Window

    # compare in exact epoch MICROS on both engines: the testdata ts
    # have microsecond parts, and a seconds cast (Spark truncates,
    # DuckDB's epoch() keeps fractions) would silently desync the oracle
    gap_us = int(pd_interval_seconds(gap)) * 1_000_000
    w = Window.partitionBy(*keys).orderBy("ts")
    # ts may be TIMESTAMP_NTZ (parquet); unix_micros needs TIMESTAMP.
    # The cast's session-timezone offset is a CONSTANT, which cancels
    # in the gap subtraction — only differences matter here.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = events.withColumn(
        "_brk",
        (us - F.lag(us).over(w) > gap_us).cast("int"),
    ).withColumn(
        "_sid",
        F.sum(F.coalesce(F.col("_brk"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy(*keys, "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .drop("_sid")
    )


def event_sessions_sql(
    gap: str = "30 minutes", keys: tuple[str, ...] = ("event_type",)
) -> str:
    """DuckDB twin of batch_event_sessions (identical gap/session ids)."""
    gap_us = int(pd_interval_seconds(gap)) * 1_000_000
    kl = ", ".join(keys)
    return f"""
WITH flagged AS (
  SELECT ts, {kl}, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY {kl} ORDER BY ts)
), numbered AS (
  SELECT *, sum(brk) OVER (PARTITION BY {kl} ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT {kl}, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM numbered GROUP BY {kl}, sid
"""
