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


DEGREE_STATE_BUCKETS = 32


def _bucket_current_version(bdir: str) -> int | None:
    """Epoch number of a bucket's live snapshot (None = bucket empty).
    The CURRENT pointer file is updated by atomic rename, so a reader or
    a replayed batch never sees a half-written snapshot."""
    cur = os.path.join(bdir, "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        return int(f.read().strip().lstrip("v"))


def _merge_degree_batch(
    batch_df: DataFrame, epoch_id: int, state_dir: str, lineage: str,
    n_buckets: int = DEGREE_STATE_BUCKETS,
) -> None:
    """Fold one micro-batch's per-src out-degree deltas into the bucketed
    state. Partitioned MERGE: only the src hash-buckets the batch touches
    are read and rewritten — bytes rewritten scale with the DELTA's key
    spread, not with the accumulated state (the round-2 design note).

    Crash-/replay-safety, without any atomic multi-file commit primitive:
    - Each bucket holds versioned snapshot dirs ``v<epoch>`` plus a
      CURRENT pointer file swapped via ``os.replace`` (atomic on POSIX).
      A crash mid-write leaves the old snapshot live; a crash after the
      swap but before old-version cleanup leaves garbage that is swept
      the next time the bucket is touched. At no instant is the only
      copy of a bucket's state mid-delete (the round-2 rmtree+rename
      window is gone).
    - Idempotency is PER BUCKET: the pointer's version IS the last epoch
      applied to that bucket, so a replayed epoch that crashed after
      updating some buckets skips exactly those and applies the rest.
    - Epoch ids are only monotone within one streaming-checkpoint
      lineage; ``_meta.json`` records the lineage and a fresh lineage
      (new checkpoint dir ⇒ the file source re-reads EVERYTHING) resets
      the state instead of mis-comparing epoch ids across lineages."""
    import json
    import shutil

    meta_path = os.path.join(state_dir, "_meta.json")
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if meta is not None and meta["lineage"] != lineage:
        # new checkpoint lineage: epoch ids restarted from 0 and the source
        # replays all input — rebuild from scratch (idempotent by construction)
        for name in os.listdir(state_dir):
            p = os.path.join(state_dir, name)
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        meta = None
    if meta is not None and epoch_id <= meta["last_applied_epoch"]:
        return  # replayed batch — already fully folded into the state

    spark = batch_df.sparkSession
    delta = (
        batch_df.groupBy("src")
        .agg(F.count("*").alias("outdeg"))
        .withColumn("bucket", F.pmod(F.xxhash64("src"), F.lit(n_buckets)).cast("int"))
        .persist()
    )
    touched = sorted(r["bucket"] for r in delta.select("bucket").distinct().collect())
    # per-bucket idempotency: skip buckets this (replayed) epoch already hit
    todo = []
    for b in touched:
        bdir = os.path.join(state_dir, f"bucket={b:03d}")
        v = _bucket_current_version(bdir)
        if v is None or v < epoch_id:
            todo.append(b)
    if todo:
        olds = []
        for b in todo:
            bdir = os.path.join(state_dir, f"bucket={b:03d}")
            v = _bucket_current_version(bdir)
            if v is not None:
                olds.append(
                    spark.read.parquet(os.path.join(bdir, f"v{v:09d}"))
                    .withColumn("bucket", F.lit(b))
                )
        parts = olds + [delta.filter(F.col("bucket").isin([int(b) for b in todo]))]
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        merged = merged.groupBy("bucket", "src").agg(F.sum("outdeg").alias("outdeg"))
        tmp_root = os.path.join(state_dir, f"_tmp_epoch_{epoch_id}")
        # ONE job writes every touched bucket's new snapshot under tmp
        merged.write.mode("overwrite").partitionBy("bucket").parquet(tmp_root)
        for b in todo:
            bdir = os.path.join(state_dir, f"bucket={b:03d}")
            os.makedirs(bdir, exist_ok=True)
            src_dir = os.path.join(tmp_root, f"bucket={b}")
            if not os.path.exists(src_dir):
                os.makedirs(src_dir)  # delta rows all zero? keep an empty snapshot
            os.rename(src_dir, os.path.join(bdir, f"v{epoch_id:09d}"))
            ptr_tmp = os.path.join(bdir, "CURRENT.tmp")
            with open(ptr_tmp, "w") as f:
                f.write(f"v{epoch_id:09d}")
            os.replace(ptr_tmp, os.path.join(bdir, "CURRENT"))  # atomic swap
            # old snapshot (and any garbage from crashed epochs) swept only
            # AFTER the pointer moved — a crash never orphans the live copy
            for name in os.listdir(bdir):
                if name.startswith("v") and name != f"v{epoch_id:09d}":
                    shutil.rmtree(os.path.join(bdir, name), ignore_errors=True)
        shutil.rmtree(tmp_root, ignore_errors=True)
    delta.unpersist()
    meta_tmp = meta_path + ".tmp"
    with open(meta_tmp, "w") as f:
        json.dump(
            {"lineage": lineage, "last_applied_epoch": epoch_id, "n_buckets": n_buckets}, f
        )
    os.replace(meta_tmp, meta_path)


def read_degree_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Union of every bucket's live snapshot → (src, outdeg)."""
    paths = []
    for name in sorted(os.listdir(state_dir)):
        bdir = os.path.join(state_dir, name)
        if not name.startswith("bucket="):
            continue
        v = _bucket_current_version(bdir)
        if v is not None:
            p = os.path.join(bdir, f"v{v:09d}")
            if os.listdir(p):  # skip empty snapshots (no parquet footers)
                paths.append(p)
    if not paths:
        return spark.createDataFrame([], "src string, outdeg long")
    return spark.read.parquet(*paths)


def incremental_degrees(spark: SparkSession, in_dir: str, state_dir: str, checkpoint_dir: str):
    """foreachBatch maintenance of a persistent out-degree table — the
    streaming analogue of op-7 (reference pagerank.py:50-61). Returns the
    StreamingQuery (caller stops it). State layout, exactly-once and
    partitioned-MERGE semantics: see ``_merge_degree_batch``. Read the
    state back with ``read_degree_state``."""
    os.makedirs(state_dir, exist_ok=True)
    edges = spark.readStream.schema(EDGE_BATCH_SCHEMA).parquet(in_dir)
    lineage = os.path.abspath(checkpoint_dir)

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        _merge_degree_batch(batch_df, epoch_id, state_dir, lineage)

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
