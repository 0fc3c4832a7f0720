"""Structured Streaming surface: incremental degree ingest (foreachBatch
idempotent fold) and watermarked windowed event aggregation (append
mode), both driven with availableNow triggers against file sources."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from webgraph_spark.streaming import (
    read_degrees,
    start_events_stream,
    start_incremental_degrees,
)


def _write_edges(spark, path, rows):
    spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst"])).coalesce(
        1
    ).write.mode("append").parquet(path)


@pytest.mark.slow
def test_incremental_degrees_match_batch(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    log_dir = str(tmp_path / "log")
    ckpt = str(tmp_path / "ck")

    _write_edges(spark, src_dir, [(0, 1), (0, 2), (1, 2)])
    q = start_incremental_degrees(spark, src_dir, log_dir, ckpt)
    q.awaitTermination(120)
    got = {r.src: r.outdeg for r in read_degrees(spark, log_dir).collect()}
    assert got == {0: 2, 1: 1}

    # second wave of files: only the NEW edges are processed (the
    # checkpoint remembers the first wave), counts accumulate
    _write_edges(spark, src_dir, [(0, 3), (2, 0), (2, 1)])
    q2 = start_incremental_degrees(spark, src_dir, log_dir, ckpt)
    q2.awaitTermination(120)
    got = {r.src: r.outdeg for r in read_degrees(spark, log_dir).collect()}
    assert got == {0: 3, 1: 1, 2: 2}


@pytest.mark.slow
def test_windowed_events_append_with_watermark(spark, tmp_path):
    src_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ck")

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def ev(minute, typ, val):
        return (t0 + dt.timedelta(minutes=minute), typ, float(val))

    rows = [ev(5, "a", 1.0), ev(20, "a", 2.0), ev(40, "b", 3.0)]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "event_type", "value"])
    ).coalesce(1).write.mode("append").parquet(src_dir)
    q = start_events_stream(spark, src_dir, out_dir, ckpt, watermark="1 hour")
    q.awaitTermination(120)
    # watermark hasn't passed the 10:00 window end yet -> nothing final
    first = spark.read.schema(
        "hour_ts timestamp, event_type string, n_events long, sum_value double"
    ).parquet(out_dir)
    assert first.count() == 0

    # an event far enough ahead advances the watermark past 11:00,
    # finalizing the 10:00 windows (exactly-once append)
    spark.createDataFrame(
        pd.DataFrame([ev(240, "a", 9.0)], columns=["ts", "event_type", "value"])
    ).coalesce(1).write.mode("append").parquet(src_dir)
    q2 = start_events_stream(spark, src_dir, out_dir, ckpt, watermark="1 hour")
    q2.awaitTermination(120)
    got = {
        (r.hour_ts, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        (t0, "a"): (2, 3.0),
        (t0, "b"): (1, 3.0),
    }


@pytest.mark.slow
def test_stateful_sessions(spark, tmp_path):
    """applyInPandasWithState sessionization: gap-splitting inside one
    batch emits closed sessions immediately; the open tail session is
    parked in state and emitted by event-time TIMEOUT once a later wave
    advances the watermark past last_ts + gap."""
    from webgraph_spark.streaming import start_sessions_stream

    src_dir = str(tmp_path / "sev")
    out_dir = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sck")
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def ev(minute, typ, val):
        return (t0 + dt.timedelta(minutes=minute), typ, float(val))

    # key 'a': two sessions split by a 60-min gap (gap=30m);
    # key 'b': one session
    wave1 = [
        ev(0, "a", 1.0), ev(10, "a", 2.0),          # session A1 0..10
        ev(70, "a", 4.0), ev(80, "a", 8.0),         # session A2 70..80 (open)
        ev(5, "b", 16.0),                           # session B1 (open)
    ]
    spark.createDataFrame(
        pd.DataFrame(wave1, columns=["ts", "event_type", "value"])
    ).coalesce(1).write.mode("append").parquet(src_dir)
    q = start_sessions_stream(
        spark, src_dir, out_dir, ckpt, gap="30 minutes", watermark="1 hour"
    )
    q.awaitTermination(180)
    schema = (
        "event_type string, session_start timestamp, session_end timestamp, "
        "n_events long, sum_value double"
    )
    first = {
        (r.event_type, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in spark.read.schema(schema).parquet(out_dir).collect()
    }
    # A1 closed by the in-batch gap split; A2/B1 still open in state
    assert first == {
        ("a", t0, t0 + dt.timedelta(minutes=10)): (2, 3.0),
    }

    # wave 2: far-future rows push the watermark (wm = max_ts - 1h)
    # beyond 80m + 30m, timing out A2 and B1
    wave2 = [ev(300, "c", 1.0)]
    spark.createDataFrame(
        pd.DataFrame(wave2, columns=["ts", "event_type", "value"])
    ).coalesce(1).write.mode("append").parquet(src_dir)
    q2 = start_sessions_stream(
        spark, src_dir, out_dir, ckpt, gap="30 minutes", watermark="1 hour"
    )
    q2.awaitTermination(180)
    got = {
        (r.event_type, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[("a", t0 + dt.timedelta(minutes=70),
                t0 + dt.timedelta(minutes=80))] == (2, 12.0)
    assert got[("b", t0 + dt.timedelta(minutes=5),
                t0 + dt.timedelta(minutes=5))] == (1, 16.0)
    assert ("a", t0, t0 + dt.timedelta(minutes=10)) in got
