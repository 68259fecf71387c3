"""Structured Streaming ingest of link-graph edge batches.

The reference is purely batch (one CSV, one process — SURVEY.md §2.5);
this module is the engine's forward path for continuously-arriving edges
(e.g. new commits landing in the source-code table):

- ``stream_edge_batches``: ``readStream`` over a directory that receives
  edge-batch parquet files ``(src, dst, kind, event_ts)``; watermarked
  sliding-window edge-arrival rates (late data tolerated up to the
  watermark).
- ``incremental_degrees``: ``foreachBatch`` maintenance of a persistent
  out-degree table — the streaming analogue of op-7 (pagerank.py:50-61):
  each micro-batch's per-src counts are merged into a parquet state table
  (idempotent overwrite-by-union; exactly-once per epoch id).
- ``sessionize_events``: stateful custom operator on the driver `events`
  table shape via ``applyInPandasWithState`` — demonstrates the
  arbitrary-stateful path (timeout-based session close).

All tests drive these with file sources + ``processAllAvailable()`` (the
sandbox has no Kafka; on a cluster the source swaps to kafka/iceberg CDC
with no operator change).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EDGE_BATCH_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("event_ts", T.TimestampType(), False),
    ]
)


def stream_edge_batches(spark: SparkSession, in_dir: str) -> DataFrame:
    """File-source stream of edge batches → watermarked per-minute edge
    counts by kind (append-mode friendly: watermark closes windows)."""
    edges = spark.readStream.schema(EDGE_BATCH_SCHEMA).parquet(in_dir)
    return (
        edges.withWatermark("event_ts", "2 minutes")
        .groupBy(F.window("event_ts", "1 minute"), "kind")
        .agg(F.count("*").alias("n_edges"), F.approx_count_distinct("src").alias("approx_srcs"))
    )


def incremental_degrees(spark: SparkSession, in_dir: str, state_dir: str, checkpoint_dir: str):
    """foreachBatch merge: per-micro-batch out-degree deltas folded into a
    parquet state table. Returns the StreamingQuery (caller stops it).

    Exactly-once: the additive merge alone is NOT idempotent — if a
    micro-batch is replayed after a crash between the state swap and the
    streaming checkpoint commit, its deltas would double-count. The last
    applied epoch_id therefore travels INSIDE each snapshot (an
    underscore-prefixed sidecar, invisible to the parquet reader) and
    replayed batches with epoch_id ≤ last_applied are skipped."""
    os.makedirs(state_dir, exist_ok=True)
    edges = spark.readStream.schema(EDGE_BATCH_SCHEMA).parquet(in_dir)

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        import json
        import shutil

        cur_path = os.path.join(state_dir, "current")
        marker = os.path.join(cur_path, "_epoch_id.json")
        if os.path.exists(marker):
            with open(marker) as f:
                if epoch_id <= json.load(f)["last_applied_epoch"]:
                    return  # replayed batch — already folded into the state
        delta = batch_df.groupBy("src").agg(F.count("*").alias("outdeg"))
        if os.path.exists(cur_path):
            cur = batch_df.sparkSession.read.parquet(cur_path)
            merged = (
                cur.unionByName(delta)
                .groupBy("src")
                .agg(F.sum("outdeg").alias("outdeg"))
            )
        else:
            merged = delta
        tmp = os.path.join(state_dir, f"epoch={epoch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_epoch_id.json"), "w") as f:
            json.dump({"last_applied_epoch": epoch_id}, f)
        # atomic swap: the new snapshot (data + epoch marker) becomes current
        if os.path.exists(cur_path):
            shutil.rmtree(cur_path)
        os.rename(tmp, cur_path)

    return (
        edges.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


SESSION_OUT_SCHEMA = "user_id long, session_start timestamp, n_events long, total_value double"
SESSION_STATE_SCHEMA = "start long, last long, n long, v double"


def sessionize_stream(spark: SparkSession, in_dir: str, gap_minutes: int = 30):
    """STREAMING sessionization — the arbitrary-stateful custom operator
    path (``applyInPandasWithState``), the engine's template for operators
    Structured Streaming's built-ins can't express.

    State per user: (session_start, last_event, n_events, total_value) as
    epoch seconds. A micro-batch's events are folded in event-time order;
    an event more than ``gap`` after the previous one CLOSES the running
    session (emitted downstream) and opens a new one. Open sessions stay
    in state across micro-batches — deterministic under availableNow
    replays of the same file set (no processing-time timeouts).

    Returns the closed-sessions streaming DataFrame (SESSION_OUT_SCHEMA);
    the batch twin ``sessionize_events`` is the oracle in tests.
    """
    import pandas as pd

    gap = gap_minutes * 60

    def fn(key, pdf_iter, state):
        user_id = key[0]
        if state.exists:
            start, last, n, v = state.get
        else:
            start = last = None
            n, v = 0, 0.0
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts")
            for ts, val in zip(pdf["ts"], pdf["value"]):
                sec = int(pd.Timestamp(ts).timestamp())
                if last is not None and sec - last > gap:
                    out.append((user_id, pd.Timestamp(start, unit="s"), n, round(v, 4)))
                    start, n, v = sec, 0, 0.0
                if start is None:
                    start = sec
                last = sec
                n += 1
                v += float(val)
        state.update((start, last, n, v))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "session_start", "n_events", "total_value"])

    events = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(in_dir)
    )
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def sessionize_events(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization (window/lag/cumsum) — the non-streaming twin of
    the stateful operator, used for oracle comparison in tests."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # ts may be TIMESTAMP_NTZ (no direct →long cast under ANSI); go via
    # session-TZ timestamp (session is pinned to UTC)
    sec = F.col("ts").cast("timestamp").cast("long")
    prev_sec = F.lag("ts").over(w).cast("timestamp").cast("long")
    gap = F.when(sec - prev_sec > gap_minutes * 60, 1).otherwise(0)
    sess = F.sum(gap).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        events.withColumn("_sess", sess)
        .groupBy("user_id", "_sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .drop("_sess")
    )
