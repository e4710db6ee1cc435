"""Structured Streaming surface (SURVEY.md §2.10).

The reference is a pure batch engine: its warehouse ingested logs as
periodically-landed HDFS files and re-ran batch jobs (§2.10 — "streaming"
there meant subprocess pipes, §2.9). The idiomatic Spark upgrade of that
landing-directory pattern is the Structured Streaming file source over
the same directory — identical data layout, incremental execution,
exactly-once file sinks. Declared an engine extension, not a
reference-parity item.
"""

from hadoop_20_warehouse_fix_spark.streaming.ingest import (  # noqa: F401
    stream_dedup_ingest,
    stream_keyed_upsert_ingest,
    stream_media_dedup_ingest,
)
from hadoop_20_warehouse_fix_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_agg,
    stream_demux,
    stream_events,
    run_available_now,
    stateful_running_agg,
    tumbling_agg,
)
