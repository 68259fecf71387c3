"""Structured Streaming: edge-batch ingest, incremental degree state,
sessionization (batch twin as oracle)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_project_spark.streaming.edge_stream import (
    incremental_degrees,
    sessionize_events,
    stream_edge_batches,
)


def _write_batch(spark, path, rows, ts_base="2024-01-01 00:00:"):
    pdf = pd.DataFrame(rows, columns=["src", "dst", "kind", "sec"])
    pdf["event_ts"] = pd.to_datetime(ts_base + "00") + pd.to_timedelta(pdf.pop("sec"), unit="s")
    spark.createDataFrame(pdf).write.mode("append").parquet(path)


def test_stream_edge_rate_windows(spark, tmp_path):
    in_dir = str(tmp_path / "edges_in")
    _write_batch(
        spark,
        in_dir,
        [("a", "b", "import", 5), ("a", "c", "import", 20), ("b", "c", "requires", 70)],
    )
    q = (
        stream_edge_batches(spark, in_dir)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("edge_rates")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT window.start AS ws, kind, n_edges FROM edge_rates").collect()
        got = {(str(r["ws"])[14:16], r["kind"]): r["n_edges"] for r in out}
        assert got == {("00", "import"): 2, ("01", "requires"): 1}
    finally:
        q.stop()


def test_incremental_degree_state(spark, tmp_path):
    in_dir = str(tmp_path / "edges_in2")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, in_dir, [("a", "b", "import", 1), ("a", "c", "import", 2), ("b", "c", "import", 3)])
    q = incremental_degrees(spark, in_dir, state, ckpt)
    q.awaitTermination()
    from pagerank_project_spark.streaming.edge_stream import read_degree_state

    got = {r["src"]: r["outdeg"] for r in read_degree_state(spark, state).collect()}
    assert got == {"a": 2, "b": 1}

    # second batch folds into existing state (new query, same checkpoint)
    _write_batch(spark, in_dir, [("a", "d", "import", 9), ("c", "a", "import", 10)])
    q2 = incremental_degrees(spark, in_dir, state, ckpt)
    q2.awaitTermination()
    got = {r["src"]: r["outdeg"] for r in read_degree_state(spark, state).collect()}
    assert got == {"a": 3, "b": 1, "c": 1}


def test_sessionize_events_oracle(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = sessionize_events(ev, gap_minutes=30)
    pdf = ev.select("user_id", "ts", "value").toPandas().sort_values(["user_id", "ts"])
    exp_sessions = 0
    exp_events = 0
    for _, g in pdf.groupby("user_id"):
        gaps = g["ts"].diff().dt.total_seconds().fillna(0)
        exp_sessions += int((gaps > 1800).sum()) + 1
        exp_events += len(g)
    assert out.count() == exp_sessions
    assert out.agg(F.sum("n_events")).first()[0] == exp_events


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: sessions closed by a gap are
    emitted; open sessions persist in state across micro-batches."""
    from pagerank_project_spark.streaming.edge_stream import sessionize_stream

    in_dir = str(tmp_path / "events_in")
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:10:00", "2024-01-01 02:00:00",
                 "2024-01-01 00:00:00", "2024-01-01 00:05:00"]
            ),
            "value": [1.0, 2.0, 4.0, 8.0, 16.0],
        }
    )
    spark.createDataFrame(pdf).write.mode("append").parquet(in_dir)
    q = (
        sessionize_stream(spark, in_dir, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("closed_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM closed_sessions").collect()
    # only user 1's first session closed (the 02:00 event is > 30min later);
    # user 2's session and user 1's second remain open in state
    assert len(rows) == 1
    r = rows[0]
    assert (r["user_id"], r["n_events"], r["total_value"]) == (1, 2, 3.0)
    assert str(r["session_start"]).startswith("2024-01-01 00:00")
