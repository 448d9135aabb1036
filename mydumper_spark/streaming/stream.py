"""Streaming operators (SURVEY §2.8 ST1-ST7).

Reference model: mydumper pushes finished files over a size-prefixed stdout
protocol (/root/reference/src/mydumper/mydumper_stream.c:80-157); myloader
consumes them as they arrive so restore overlaps dump
(src/myloader/myloader_stream.c), with out-of-order .sql/.dat pairing and a
periodically-flushed partial manifest.

Spark-first: the transport is a landing directory + Structured Streaming.
- ST1 producer  → micro-batched writes into the landing dir (files are the
  protocol; atomic rename replaces the length-prefix framing)
- ST2 consumer  → ``readStream`` file source with ``maxFilesPerTrigger``
  (backpressure = ST6) routing each batch through ``foreachBatch``
- ST3 pairing   → unnecessary by construction: a parquet file is
  self-contained (schema travels with data), which is the design point of
  using a columnar container instead of .sql/.dat pairs
- ST4 manifest  → partial manifest rewritten every batch
- ST5 snapshots → ``Trigger.ProcessingTime`` periodic re-dump ring
- ST7 watermark/session windows → genuinely new surface (absent in the
  reference), exposed via sessionize_stream
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mydumper_spark.sinks.manifest import Manifest, write_manifest


def stream_dump(
    df: DataFrame, landing_dir: str, checkpoint_dir: str, trigger_once: bool = True
) -> StreamingQuery | None:
    """ST1: producer side. For a static source this is a plain partitioned
    write (micro-batch of one); for a streaming df it is writeStream into
    the landing dir."""
    if not df.isStreaming:
        df.write.mode("append").parquet(landing_dir)
        return None
    w = (
        df.writeStream.format("parquet")
        .option("path", landing_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_restore(
    spark: SparkSession,
    landing_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema,
    max_files_per_trigger: int = 16,
    available_now: bool = True,
) -> StreamingQuery:
    """ST2 + ST4 + ST6: consume the landing dir as files arrive, append to
    the target, and refresh a partial manifest every batch.

    ``maxFilesPerTrigger`` is the backpressure knob (the reference pauses
    producer threads on disk limits, mydumper_start_dump.c:123-210; a pull
    consumer needs no pause protocol)."""
    manifest = Manifest()

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        # IDEMPOTENT on micro-batch replay: foreachBatch is at-least-once
        # (a crash between the write's commit and the checkpoint record
        # re-delivers the batch), so each batch owns a deterministic
        # partition dir and a replay OVERWRITES its own output instead of
        # appending duplicates. The batch column doubles as ingest
        # lineage; the manifest records the logical schema without it.
        batch.write.mode("overwrite").parquet(
            os.path.join(target_dir, f"batch={batch_id}"))
        manifest.tables.clear()
        loaded = batch.sparkSession.read.parquet(target_dir).drop("batch")
        manifest.add_table(loaded, os.path.basename(target_dir.rstrip("/")), target_dir)
        write_manifest(manifest, target_dir, partial=True)  # ST4

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )
    w = reader.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def snapshot_dump(
    df: DataFrame,
    ring_root: str,
    snapshot_count: int = 2,
    state_file: str | None = None,
) -> str:
    """ST5 daemon-mode snapshot ring: write into ``ring_root/{0..n-1}``
    round-robin and repoint LAST_DUMP, exactly the reference's daemon layout
    (/root/reference/src/mydumper/mydumper_daemon_thread.c:33-146). The
    caller (or a scheduler) provides the cadence; Delta time-travel would
    subsume this where Delta is available."""
    state_file = state_file or os.path.join(ring_root, ".ring_state")
    idx = 0
    if os.path.exists(state_file):
        with open(state_file) as f:
            idx = (int(f.read().strip() or 0) + 1) % snapshot_count
    slot = os.path.join(ring_root, str(idx))
    df.write.mode("overwrite").parquet(slot)
    os.makedirs(ring_root, exist_ok=True)
    with open(state_file, "w") as f:
        f.write(str(idx))
    link = os.path.join(ring_root, "LAST_DUMP")
    if os.path.islink(link) or os.path.exists(link):
        os.remove(link)
    # symlink target relative to the LINK'S directory, not the CWD: a
    # relative ring_root would otherwise produce ring/LAST_DUMP →
    # ring/ring/0 (dangling); the bare slot index is correct from any CWD
    os.symlink(str(idx), link)
    return slot


def sessionize_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """ST7: watermarked session windows over an event stream — the operator
    surface the reference lacks entirely. Works on both streaming and static
    DataFrames (session_window is available in batch too)."""
    return (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    ).groupBy(
        F.col(user_col), F.session_window(F.col(ts_col), gap)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "10 minutes",
    right_suffix: str = "_r",
) -> DataFrame:
    """Watermarked stream-stream interval join: right rows that arrive in
    ``[left_ts, left_ts + max_delay]`` per key — the continuous form of
    operators/rangejoin.py (click→conversion attribution on a live stream).

    Both sides carry a watermark and the join condition bounds both event
    times, which is exactly what lets Spark expire join state: buffered rows
    older than watermark + max_delay are dropped, so state is
    O(rate × window), not unbounded. Works on static frames too (same plan
    minus the state manager)."""
    r = right
    for c in [*on, right_ts]:
        r = r.withColumnRenamed(c, f"{c}{right_suffix}")
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(f"{right_ts}{right_suffix}", watermark)
    rts = F.col(f"{right_ts}{right_suffix}")
    cond = rts.between(
        F.col(left_ts), F.col(left_ts) + F.expr(f"INTERVAL {max_delay}")
    )
    for k in on:
        cond = cond & (F.col(k) == F.col(f"{k}{right_suffix}"))
    return left.join(r, cond)
