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
