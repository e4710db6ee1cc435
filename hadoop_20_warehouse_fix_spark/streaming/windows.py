"""Streaming operators: file source, windowed aggregation, watermarks,
sessionization, custom stateful processing, demux sink.

Design notes (100 TB / always-on):
- The file source tracks seen files in the checkpoint log; with
  ``maxFilesPerTrigger`` it paces backfill. Same landing-dir contract the
  reference's warehouse used, minus the cron-driven batch re-runs.
- Watermarks bound state: every windowed agg here requires one, so state
  store size is (windows in flight x keys), not unbounded.
- All aggregations are built-in (JVM) expressions; the only Python hop is
  ``applyInPandasWithState`` for genuinely custom state machines.
- Sinks: parquet/foreachBatch are exactly-once (file-sink commit log /
  idempotent batch writes keyed by batchId).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
)


def stream_events(
    spark: SparkSession,
    landing_dir: str,
    schema: str | T.StructType = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a landing directory of parquet files —
    the warehouse ingest pattern as an incremental source."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(landing_dir)


def tumbling_agg(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Tumbling-window aggregation with a late-data watermark. Works on
    batch DataFrames too (window() is a plain expression) — the driver's
    oracle checks use that equivalence."""
    win = F.window(F.col(ts_col), window_size)
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    out = events.groupBy(win, *(group_cols or [])).agg(
        *(aggs or [F.count("*").alias("cnt")])
    )
    return out.select(
        F.col("window.start").alias("win_start"),
        F.col("window.end").alias("win_end"),
        *[c for c in out.columns if c != "window"],
    )


def sliding_agg(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    aggs: list | None = None,
) -> DataFrame:
    """Sliding (hopping) window: each event lands in size/slide windows."""
    win = F.window(F.col(ts_col), window_size, slide)
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    out = events.groupBy(win).agg(*(aggs or [F.count("*").alias("cnt")]))
    # Both bounds, mirroring tumbling_agg: sliding windows overlap, so
    # win_start alone cannot reconstruct the extent downstream.
    return out.select(
        F.col("window.start").alias("win_start"),
        F.col("window.end").alias("win_end"),
        *[c for c in out.columns if c != "window"],
    )


def session_agg(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Gap-based session windows (per key): a session extends while the
    next event arrives within ``gap``; closes otherwise."""
    win = F.session_window(F.col(ts_col), gap)
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    out = events.groupBy(*(key_cols or ["user_id"]), win).agg(
        *(aggs or [F.count("*").alias("cnt")])
    )
    return out.select(
        *[c for c in out.columns if c != "session_window"],
        F.col("session_window.start").alias("sess_start"),
    )


def stateful_running_agg(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running (count, sum) maintained across micro-batches — the shape of
    any bespoke state machine the built-in windows can't express.
    State is a 2-tuple per key; watermark/timeout policy NoTimeout keeps
    it alive for the stream's lifetime (bound keys at 100 TB — use
    timeouts for open-ended key spaces)."""
    out_schema = f"{key_col} bigint, cnt bigint, total double"
    state_schema = "cnt bigint, total double"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((cnt, total))
        yield pd.DataFrame({key_col: [key[0]], "cnt": [cnt], "total": [total]})

    return events.select(key_col, value_col).groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    sdf: DataFrame,
    checkpoint_dir: str,
    query_name: str = "q",
    output_mode: str = "complete",
) -> DataFrame:
    """Drain everything currently in the source (availableNow trigger)
    into an in-memory table and return it as a batch DataFrame — the
    test/backfill harness for any streaming plan."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(query_name)


def stream_demux(
    sdf: DataFrame,
    path: str,
    partition_col: str,
    checkpoint_dir: str,
) -> None:
    """Streaming MultipleOutputFormat (SURVEY §2.1 demux sink): route each
    micro-batch's rows into per-value directories via partitionBy inside
    foreachBatch — ACTUALLY idempotent per batchId: each batch writes
    under a ``_batch_id=<id>`` sub-partition with DYNAMIC partition
    overwrite, so a batch replayed after a crash-before-checkpoint
    rewrites exactly its own partitions instead of appending duplicates
    (a blind append only claims exactly-once). Top-level layout stays
    ``<partition_col>=<value>/`` — partition-pruned consumers are
    unaffected and projections never see ``_batch_id`` unless asked."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col, "_batch_id")
            .parquet(path)
        )

    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
