"""Windowed-time queries over ``events`` (SURVEY.md §2.10 extension).

The same ``tumbling_agg``/``sliding_agg``/``session_agg`` operators run
unchanged on a live ``readStream`` (tests/test_streaming.py drives that
path with watermarks + availableNow); here they run in batch mode so the
driver's DuckDB oracle can check the window semantics value-for-value.

Window starts are projected as epoch seconds (bigint) so hashing is
byte-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.catalog import epoch_seconds, load_table, stream_table
from hadoop_20_warehouse_fix_spark.queries import query
from hadoop_20_warehouse_fix_spark.scratch import scratch_dir
from hadoop_20_warehouse_fix_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg


@query(
    "events_tumbling_hourly",
    headline=True,
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start,
           event_type,
           count(*)                 AS cnt,
           round(sum(value), 2)     AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows × event_type: count + sum(value).

    100 TB: partial agg on (window, type) — low cardinality per hour, so
    shuffle volume is windows×types, independent of event count. The
    streaming run adds a 2 h watermark bounding state to ~2 windows."""
    ev = load_table(spark, sf_dir, "events")
    out = tumbling_agg(
        ev,
        window_size="1 hour",
        group_cols=["event_type"],
        aggs=[F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    return out.select(
        epoch_seconds("win_start").alias("win_start"), "event_type", "cnt", "sum_value"
    )


@query(
    "events_sliding_counts",
    oracle="""
    SELECT win_start, count(*) AS cnt
    FROM (
        SELECT unnest([b, b - 1800]) AS win_start
        FROM (SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS b FROM events)
    )
    GROUP BY win_start
    """,
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window, 30-min hop: every event lands in exactly
    size/slide = 2 windows (the oracle unnests both window starts).

    100 TB: sliding windows multiply shuffle rows by size/slide — keep
    that ratio small; the agg itself stays map-side-partial."""
    ev = load_table(spark, sf_dir, "events")
    out = sliding_agg(ev, window_size="1 hour", slide="30 minutes")
    return out.select(epoch_seconds("win_start").alias("win_start"), "cnt")


@query(
    "events_json_props",
    headline=True,
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           sum(CAST(props->>'k' AS BIGINT)) AS sum_k,
           max(CAST(props->>'k' AS BIGINT)) AS max_k
    FROM events
    WHERE CAST(props->>'k' AS BIGINT) >= 10
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload extraction: parse the JSON ``props``
    column into a typed struct and aggregate a nested field — the
    SURVEY §1.2 RecordIO analog (nested records with codegen'd ser/de;
    reference: src/core/org/apache/hadoop/record/Record.java, compiler
    rcc.jj) re-expressed as from_json + StructType DDL.

    100 TB: from_json is JVM-side (Jackson inside codegen, no Python);
    the filter on the extracted field prunes before the tiny
    per-event-type aggregation. Malformed rows null out (PERMISSIVE) —
    the bad-record-skipping posture of SkipBadRecords.java:51.

    Physical note (round 14): the JSON parse is the expensive per-row
    work and the events table can arrive as ONE split — measured at
    sf0.1, the scan+parse stage was a single 0.55 s task on a 32-core
    box; fan_out_small_scan moves the parse onto every core (0.95 s ->
    0.68 s end-to-end). No-op at scale where the scan splits naturally
    (the k >= 10 filter is on the PARSED field, so no parquet pushdown
    is lost to the exchange)."""
    from hadoop_20_warehouse_fix_spark.catalog import fan_out_small_scan

    ev = fan_out_small_scan(load_table(spark, sf_dir, "events"))
    parsed = ev.select(
        "event_type", F.from_json("props", "k bigint").getField("k").alias("k")
    )
    return (
        parsed.filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "events_sessionized",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 600
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
           count(*)                              AS cnt
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap — the
    oracle recomputes sessions via the classic lag/cumulative-sum
    sessionization, proving Spark's session_window merge semantics.

    Boundary semantics (round-9 organic replay catch): Spark's
    ``session_window`` MERGES an event landing at exactly
    ``last_ts + gap`` (the window end is inclusive for the merge —
    pytest-pinned), so the oracle's split condition is strictly
    ``gap > 600``. The original ``>= 600`` oracle agreed on every
    shipped testdata (microsecond timestamps never tie the boundary)
    and diverged only on a second-granularity organic corpus — 25
    exact-gap pairs out of 200k events split by the oracle and merged
    by Spark.

    100 TB: sessionization shuffles once on user_id; Spark merges
    sessions inside the state store (streaming) or sort-merge (batch)."""
    ev = load_table(spark, sf_dir, "events")
    out = session_agg(ev, gap="10 minutes", key_cols=["user_id"])
    return out.select(
        "user_id", epoch_seconds("sess_start").alias("sess_start"), "cnt"
    )


@query(
    "events_stream_tumbling",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start,
           event_type,
           count(*)                 AS cnt,
           round(sum(value), 2)     AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window aggregation run as an ACTUAL Structured
    Streaming query (readStream file source -> watermark -> windowed agg
    -> availableNow drain into a memory sink), not the batch-equivalent
    expression. Same oracle as events_tumbling_hourly: a drained stream
    must produce exactly the batch answer — the streaming/batch
    unification guarantee the engine relies on for backfills."""
    import uuid

    from hadoop_20_warehouse_fix_spark.streaming.windows import run_available_now

    # stream_table derives the declared schema from the file itself and
    # normalizes ts to TimestampType — the round-2 wrong answers came
    # from a hand-declared `ts bigint` schema that silently misread the
    # regenerated micros encoding as raw integers.
    sdf = stream_table(spark, sf_dir, "events")
    out = tumbling_agg(
        sdf,
        window_size="1 hour",
        watermark="2 hours",
        group_cols=["event_type"],
        aggs=[F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    res = run_available_now(
        out,
        scratch_dir(prefix="stream_tumbling_ckpt_"),
        query_name="stream_tumbling_" + uuid.uuid4().hex[:8],
        output_mode="complete",
    )
    return res.select(
        epoch_seconds("win_start").alias("win_start"), "event_type", "cnt", "sum_value"
    )


@query(
    "events_stream_stateful",
    oracle="""
    SELECT user_id, count(*) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value
    FROM events GROUP BY user_id
    """,
)
def events_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator under the oracle gate:
    per-user running (count, sum) via ``applyInPandasWithState``,
    drained with availableNow — one micro-batch, so the final state
    equals a batch GROUP BY exactly. Values ride as integer cents so
    the Python-side accumulation is order-independent and the DuckDB
    comparison is exact."""
    import uuid

    from hadoop_20_warehouse_fix_spark.streaming.windows import (
        run_available_now,
        stateful_running_agg,
    )

    sdf = stream_table(spark, sf_dir, "events")
    cents = sdf.select(
        "user_id", F.round(F.col("value") * 100).cast("long").cast("double").alias("value")
    )
    out = stateful_running_agg(cents, key_col="user_id", value_col="value")
    res = run_available_now(
        out,
        scratch_dir(prefix="stream_stateful_ckpt_"),
        query_name="stream_stateful_" + uuid.uuid4().hex[:8],
        output_mode="update",
    )
    return res.select(
        "user_id", "cnt", (F.col("total") / 100.0).alias("total_value")
    )


@query(
    "events_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup-on-ingest: ``dropDuplicates`` over the file
    stream's state store (the exactly-once ingest guard a warehouse puts
    in front of at-least-once deliveries), drained with availableNow —
    the retained KEYS must equal batch DISTINCT exactly. Keys only in
    the driver-visible output because which duplicate row survives is
    arrival-order dependent; the key set is deterministic.

    100 TB: dedup state is one entry per distinct key — bound it with a
    watermark (dropDuplicatesWithinWatermark) on event-time keys; here
    the key domain (user x type) is small and the drain is one batch."""
    import uuid

    from hadoop_20_warehouse_fix_spark.streaming.windows import run_available_now

    sdf = stream_table(spark, sf_dir, "events")
    deduped = sdf.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])
    res = run_available_now(
        deduped,
        scratch_dir(prefix="stream_dedup_ckpt_"),
        query_name="stream_dedup_" + uuid.uuid4().hex[:8],
        output_mode="append",
    )
    return res.select("user_id", "event_type")


@query(
    "events_stream_join",
    oracle="""
    SELECT p.user_id,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_s,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_s,
           CAST(round(p.value, 2) AS DOUBLE) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
    """,
)
def events_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join with event-time bounds: purchases joined
    to the same user's clicks from the preceding 10 minutes, both sides
    real file streams with watermarks (state eviction — the mechanism
    that makes an unbounded two-stream join runnable), drained with
    availableNow. The drained result must equal the batch interval join
    exactly — oracle replays it as plain SQL.

    100 TB: watermark bounds each side's state to the interval window;
    the join itself shuffles both streams on user_id once."""
    import uuid

    from hadoop_20_warehouse_fix_spark.streaming.windows import run_available_now

    def stream_side(etype: str):
        sdf = stream_table(spark, sf_dir, "events")
        return sdf.filter(F.col("event_type") == etype).withWatermark("ts", "30 minutes")

    p = stream_side("purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    c = stream_side("click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        "inner",
    )
    res = run_available_now(
        joined,
        scratch_dir(prefix="stream_join_ckpt_"),
        query_name="stream_join_" + uuid.uuid4().hex[:8],
        output_mode="append",
    )
    return res.select(
        F.col("p_user").alias("user_id"),
        epoch_seconds("p_ts").alias("purchase_s"),
        epoch_seconds("c_ts").alias("click_s"),
        F.round("p_value", 2).alias("purchase_value"),
    )


@query(
    "events_stream_dedup_watermarked",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def events_stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` evicts dedup keys once the
    watermark passes their event time — the production form of
    events_stream_dedup for open-ended key domains, where an unbounded
    state store would eventually OOM (state is keys-per-watermark-window
    instead of all-keys-ever). Drained with availableNow in one batch:
    every row is within the watermark of every other, so the retained
    key set must equal batch DISTINCT exactly — same oracle as the
    unbounded variant, different (100 TB-safe) state contract."""
    import uuid

    from hadoop_20_warehouse_fix_spark.streaming.windows import run_available_now

    sdf = stream_table(spark, sf_dir, "events")
    deduped = (
        sdf.select("user_id", "event_type", "ts")
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    res = run_available_now(
        deduped,
        scratch_dir(prefix="stream_dedup_wm_ckpt_"),
        query_name="stream_dedup_wm_" + uuid.uuid4().hex[:8],
        output_mode="append",
    )
    return res.select("user_id", "event_type")


@query(
    "stream_demux_roundtrip",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(round(value, 2) AS DOUBLE) AS value,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
    FROM events
    """,
)
def stream_demux_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming demux sink round-trip: the events stream routed into
    per-event-type directories via foreachBatch + partitionBy (the
    MultipleOutputFormat analog as a STREAMING sink, idempotent per
    batchId), then read back whole — delivery must be lossless,
    value-for-value. Partition-pruned consumers read one event_type
    directory without touching the rest; at 100 TB that layout is the
    difference between a full scan and a 1/N scan per consumer."""
    from hadoop_20_warehouse_fix_spark.streaming.windows import stream_demux

    base = scratch_dir(prefix="stream_demux_rt_")
    sdf = stream_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value"), "ts"
    )
    stream_demux(sdf, base + "/out", "event_type", base + "/ckpt")
    back = spark.read.parquet(base + "/out")
    return back.select(
        "event_id", "user_id", "event_type", "value", epoch_seconds("ts").alias("ts_s")
    )


@query(
    "events_stream_sessionized",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 600
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
           count(*)                              AS cnt
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def events_stream_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization as an ACTUAL streaming query: the
    session_window state-store merge path (sessions extend/merge as
    events arrive), drained with availableNow in complete mode — the
    drained stream must equal batch sessionization exactly, same oracle
    as events_sessionized. Completes the §2.10 claim that every window
    family (tumbling/sliding/session) runs on the real streaming
    engine, not just as batch-equivalent expressions."""
    import uuid

    from hadoop_20_warehouse_fix_spark.streaming.windows import (
        run_available_now,
        session_agg,
    )

    sdf = stream_table(spark, sf_dir, "events")
    out = session_agg(sdf, gap="10 minutes", key_cols=["user_id"])
    res = run_available_now(
        out,
        scratch_dir(prefix="stream_sess_ckpt_"),
        query_name="stream_sess_" + uuid.uuid4().hex[:8],
        output_mode="complete",
    )
    return res.select(
        "user_id", epoch_seconds("sess_start").alias("sess_start"), "cnt"
    )


@query(
    "events_stream_sliding",
    oracle="""
    SELECT win_start, count(*) AS cnt
    FROM (
        SELECT unnest([b, b - 1800]) AS win_start
        FROM (SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS b FROM events)
    )
    GROUP BY win_start
    """,
)
def events_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows on the REAL streaming engine — with
    this, all three window families (tumbling, sliding, session) have a
    drained-stream twin proving stream ≡ batch under the same oracle as
    their batch forms. Each event updates size/slide = 2 window states;
    the watermark bounds how many windows stay open."""
    import uuid

    from hadoop_20_warehouse_fix_spark.streaming.windows import (
        run_available_now,
        sliding_agg,
    )

    sdf = stream_table(spark, sf_dir, "events")
    out = sliding_agg(sdf, window_size="1 hour", slide="30 minutes", watermark="2 hours")
    res = run_available_now(
        out,
        scratch_dir(prefix="stream_sliding_ckpt_"),
        query_name="stream_sliding_" + uuid.uuid4().hex[:8],
        output_mode="complete",
    )
    return res.select(epoch_seconds("win_start").alias("win_start"), "cnt")
