"""Testdata-schema canary (round-2 post-mortem, VERDICT item 3).

The driver regenerated events.parquet between rounds 1 and 2
(TIMESTAMP(NANOS) -> TIMESTAMP(MICROS, isAdjustedToUTC=false)) and the
breakage surfaced late, in the bench and the judge's re-run, instead of
in a test. This file makes the NEXT silent regeneration fail in seconds
with a readable diff:

- every catalog table must open and present exactly the pinned logical
  schema (the engine's contract type, after catalog normalization);
- events.ts specifically must normalize to TimestampType whatever the
  physical encoding is;
- the events epoch math must not depend on the process timezone (a
  vanilla driver session inherits the JVM default tz — round-2 VERDICT
  item 7).
"""

from __future__ import annotations

import os
import subprocess
import sys

from tests.conftest import REPO_ROOT, SF_SMOKE

# The engine's logical contract per table — what every query is written
# against. Physical parquet changes that normalize to this are fine;
# anything else should fail HERE, not in a headline query.
EXPECTED_SCHEMAS = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


def test_every_table_matches_pinned_schema(spark):
    from hadoop_20_warehouse_fix_spark.catalog import TABLES, load_table

    assert sorted(TABLES) == sorted(EXPECTED_SCHEMAS), "catalog TABLES drifted"
    diffs = []
    for name in TABLES:
        got = load_table(spark, SF_SMOKE, name).dtypes
        want = EXPECTED_SCHEMAS[name]
        if got != want:
            diffs.append(f"{name}:\n  got : {got}\n  want: {want}")
    assert not diffs, "testdata schema drift (driver regenerated parquet?):\n" + "\n".join(diffs)


def test_events_ts_is_timestamp_on_vanilla_session(spark):
    """The choke-point guarantee, independent of build_session confs:
    even a bare session must see TimestampType after load_table."""
    from pyspark.sql import types as T

    from hadoop_20_warehouse_fix_spark.catalog import load_table, stream_table

    ev = load_table(spark, SF_SMOKE, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType), ev.schema["ts"]
    sev = stream_table(spark, SF_SMOKE, "events")
    assert isinstance(sev.schema["ts"].dataType, T.TimestampType), sev.schema["ts"]
    assert sev.isStreaming


def test_epoch_math_is_timezone_independent():
    """Run the headline window query under TZ=America/New_York in a
    fresh process (the JVM captures the default tz at startup, so an
    in-process TZ flip proves nothing) with a VANILLA session, and
    compare against the DuckDB oracle. Guards the naive-vs-instant
    equivalence every events oracle relies on (round-2 VERDICT item 7)."""
    script = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hadoop_20_warehouse_fix_spark.queries import load_all
from tests.oracle import compare
spec = load_all()["events_tumbling_hourly"]
problems = compare(spec.fn(spark, {sf!r}), spec.oracle, {sf!r})
spark.stop()
assert not problems, problems
print("TZ-OK")
""".format(repo=REPO_ROOT, sf=SF_SMOKE)
    env = dict(os.environ, TZ="America/New_York")
    # A pre-set JAVA_TOOL_OPTIONS could pin user.timezone; make the JVM
    # pick the tz up from the environment we control.
    env.pop("JAVA_TOOL_OPTIONS", None)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO_ROOT,
    )
    assert proc.returncode == 0 and "TZ-OK" in proc.stdout, (
        f"rc={proc.returncode}\nstdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-2000:]}"
    )


def test_stream_table_reads_both_physical_layouts(spark, tmp_path):
    """stream_table must drain the same rows whether the table is a
    single parquet FILE (current driver layout) or a DIRECTORY of part
    files (the other layout parquet writers produce) — the glob-filter
    form matched only leaf file names and silently streamed zero rows
    from a directory-shaped table."""
    import shutil

    from hadoop_20_warehouse_fix_spark.catalog import load_table, stream_table
    from tests.conftest import SF_CORRECT

    base = str(tmp_path / "sfdir")
    os.makedirs(base)
    # directory-shaped copy of events
    load_table(spark, SF_CORRECT, "events").repartition(3).write.parquet(
        f"{base}/events.parquet"
    )
    n_batch = spark.read.parquet(f"{base}/events.parquet").count()

    sdf = stream_table(spark, base, "events")
    q = (
        sdf.writeStream.format("memory")
        .queryName("stream_layout_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_stream = spark.table("stream_layout_probe").count()
    assert n_stream == n_batch > 0
    shutil.rmtree(base)
