"""Script-UDF surface (SURVEY.md §2.9) — the Hadoop Streaming analog.

Reference semantics reproduced
(``X/streaming/src/java/org/apache/hadoop/streaming/``):
- Rows flow to a forked executable as ``k <sep> v`` lines on stdin and
  come back on stdout (``PipeMapRed.java:168-314`` fork + pump threads)
  → ``rdd.pipe`` (Spark's exact analog: one subprocess per partition,
  line streams both ways).
- Separator and key-field count are configurable
  (``stream.map.output.field.separator`` /
  ``stream.num.map.output.key.fields``, ``PipeMapper.java:73-75``):
  the output line is split at the Nth separator into (key, value).
- Non-zero subprocess exit fails the task (``PipeMapRed.java:124``,
  ``waitOutputThreads:289-314``) → ``checkCode=True``.
- Reducer-side scripts see a KEY-SORTED, KEY-CONTIGUOUS stream (the
  framework's sort-shuffle guarantee) → ``pipe_grouped`` repartitions on
  the key and sorts within partitions before piping, so a script like
  ``uniq -c`` works unchanged (the reference's test fixtures ``TrApp`` /
  ``UniqApp`` / ``ValueCountReduce`` drive the same contract, SURVEY §5).
- ChainMapper (``M/lib/ChainMapper.java:90`` — mapper pipeline in one
  task, no intermediate I/O) → ``chain`` (Catalyst collapses adjacent
  projections into one WholeStageCodegen span — same zero-I/O property).

Scale notes: ``pipe`` exists for legacy-script reuse; it is the slow
path (per-row text serialization + a subprocess per partition). New
per-row logic belongs in built-in functions or Arrow-batched pandas
UDFs. The subprocess count equals partition count — at 1000 executors
that is one fork per task, the same process model the reference ran.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _to_lines(df: DataFrame, sep: str) -> "DataFrame":
    cols = [F.col(c).cast("string") for c in df.columns]
    return df.select(F.concat_ws(sep, *cols).alias("line"))


def _parse_kv(line: str, sep: str, num_key_fields: int) -> tuple[str, str]:
    parts = line.split(sep)
    return sep.join(parts[:num_key_fields]), sep.join(parts[num_key_fields:])


def pipe(
    df: DataFrame,
    cmd: str,
    sep: str = "\t",
    num_key_fields: int = 1,
    env: dict[str, str] | None = None,
    check_code: bool = True,
    key_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """Map-side script: every row (all columns joined by ``sep``) is a
    stdin line; each stdout line is split at the ``num_key_fields``-th
    separator into (key, value). 0..n output lines per input line — the
    UDTF shape of the reference's Mapper contract."""
    spark = df.sparkSession
    lines = _to_lines(df, sep).rdd.map(lambda r: r.line)
    piped = lines.pipe(cmd, env=env or {}, checkCode=check_code)
    out = piped.map(lambda ln: _parse_kv(ln, sep, num_key_fields))
    return spark.createDataFrame(out, schema=f"{key_name} string, {value_name} string")


def pipe_grouped(
    df: DataFrame,
    key_cols: list[str],
    cmd: str,
    sep: str = "\t",
    num_key_fields: int = 1,
    num_partitions: int | None = None,
    env: dict[str, str] | None = None,
    check_code: bool = True,
    key_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """Reduce-side script: repartition on ``key_cols`` + sort within
    partitions, so the subprocess sees each key's rows contiguous and
    sorted — the sort-shuffle contract a streaming reducer relied on.
    The key columns are placed first on each line."""
    ordered = df.select(*key_cols, *[c for c in df.columns if c not in key_cols])
    if num_partitions is not None:
        ordered = ordered.repartition(num_partitions, *key_cols)
    else:
        ordered = ordered.repartition(*key_cols)
    ordered = ordered.sortWithinPartitions(*key_cols)
    spark = df.sparkSession
    lines = _to_lines(ordered, sep).rdd.map(lambda r: r.line)
    piped = lines.pipe(cmd, env=env or {}, checkCode=check_code)
    out = piped.map(lambda ln: _parse_kv(ln, sep, num_key_fields))
    return spark.createDataFrame(out, schema=f"{key_name} string, {value_name} string")


def pipe_tagged(
    sources: list[DataFrame],
    cmd: str,
    sep: str = "\t",
    num_key_fields: int = 1,
    env: dict[str, str] | None = None,
    check_code: bool = True,
    key_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """Hive-streaming ``-inputtagged`` variant (reference:
    contrib/hive-streaming StreamJob.java — each input path's rows are
    tagged with the source index so one script can merge N inputs):
    every row is prefixed with its source's position in ``sources``
    before piping, i.e. the script sees ``tag <sep> col1 <sep> ...``
    lines. Tagging is one ``lit(i)`` column per source + unionByName —
    zero extra shuffles; the union preserves per-source partitioning."""
    tagged = [
        _to_lines(src, sep).select(
            F.concat_ws(sep, F.lit(str(i)), F.col("line")).alias("line")
        )
        for i, src in enumerate(sources)
    ]
    merged = tagged[0]
    for t in tagged[1:]:
        merged = merged.unionByName(t)
    spark = merged.sparkSession
    lines = merged.rdd.map(lambda r: r.line)
    piped = lines.pipe(cmd, env=env or {}, checkCode=check_code)
    out = piped.map(lambda ln: _parse_kv(ln, sep, num_key_fields))
    return spark.createDataFrame(out, schema=f"{key_name} string, {value_name} string")


def chain(df: DataFrame, *stages: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """ChainMapper: a pipeline of row-level transforms fused into one
    task with no intermediate materialization. Each stage is df→df;
    adjacent narrow stages collapse into a single codegen'd projection."""
    for stage in stages:
        df = stage(df)
    return df
