"""Script-UDF (Hadoop Streaming analog) queries — SURVEY.md §2.9.

The reference's streaming tests drive a char-translating filter (TrApp)
and a per-key counting reducer (UniqApp/ValueCountReduce) through the
``k <tab> v`` line protocol (`X/streaming/src/java/org/apache/hadoop/
streaming/PipeMapRed.java:168-314`; test fixtures listed in SURVEY §5).
These queries run the same two contracts through ``rdd.pipe`` against
portable commands, oracle-checked: the map-side script against a pure
SQL projection, the reduce-side script against a GROUP BY — proving the
line protocol round-trips values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_20_warehouse_fix_spark.catalog import load_table
from hadoop_20_warehouse_fix_spark.operators.pipe import pipe, pipe_grouped
from hadoop_20_warehouse_fix_spark.queries import query

# ValueCountReduce analog: per-key count over a key-sorted stdin stream
# (python one-liner instead of the reference's UniqApp.java — same
# contract: input arrives key-contiguous, emit "key \t count").
_UNIQ_COUNT = (
    "python3 -c \"import sys, itertools; "
    "[print(k + chr(9) + str(sum(1 for _ in g))) "
    "for k, g in itertools.groupby(l.rstrip(chr(10)).split(chr(9), 1)[0] for l in sys.stdin)]\""
)


@query(
    "pipe_tr_upper",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS key, upper(lang) AS value
    FROM documents
    """,
)
def pipe_tr_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side script UDF (TrApp analog): (doc_id, lang) rows flow to
    ``tr a-z A-Z`` as tab-separated lines and come back split at the
    first tab. Oracle = the equivalent SQL projection — proves the
    stdin/stdout line protocol preserves every row and field."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return pipe(docs, "tr a-z A-Z")


@query(
    "pipe_uniq_count",
    oracle="""
    SELECT lang AS key, CAST(count(*) AS VARCHAR) AS value
    FROM documents
    GROUP BY lang
    """,
)
def pipe_uniq_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reduce-side script UDF (UniqApp/ValueCountReduce analog): rows
    repartitioned+sorted on the key so the subprocess sees each key
    contiguous (the reference's sort-shuffle guarantee), then a uniq -c
    style counter runs per partition. Hash partitioning puts each key in
    exactly one partition, so per-partition counts ARE global counts —
    oracle = GROUP BY."""
    docs = load_table(spark, sf_dir, "documents").select("lang")
    return pipe_grouped(docs, ["lang"], _UNIQ_COUNT, num_partitions=8)


@query(
    "pipe_chain_stages",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS key,
           translate(upper(lang), 'AEIOU', '_____') AS value
    FROM documents
    """,
)
def pipe_chain_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChainMapper as a driver-visible query: two script stages fused
    back-to-back (uppercase, then vowel-mask) with no intermediate
    materialization — the reference's ChainMapper.java contract. Each
    stage is a full stdin/stdout subprocess round trip; the oracle
    replays the composition as one SQL projection, proving both hops
    preserved every row and field."""
    from hadoop_20_warehouse_fix_spark.operators.pipe import chain, pipe

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return chain(
        docs,
        lambda d: pipe(d, "tr a-z A-Z"),
        lambda d: pipe(d, "tr AEIOU _"),
    )


@query(
    "pipe_tagged_merge",
    oracle="""
    SELECT '0' AS key, CAST(doc_id AS VARCHAR) || chr(9) || lang AS value
    FROM documents
    UNION ALL
    SELECT '1' AS key, CAST(doc_id AS VARCHAR) || chr(9) || source AS value
    FROM documents
    """,
)
def pipe_tagged_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged multi-source script (hive-streaming ``-inputtagged``): two
    inputs prefixed with their source index flow through ONE passthrough
    script; the script (and the oracle) see ``tag \\t original-line``.
    Proves the tagging union preserves every row of every source with
    its provenance — the merge-join-in-a-script pattern the reference's
    contrib/hive-streaming ran."""
    from hadoop_20_warehouse_fix_spark.operators.pipe import pipe_tagged

    docs = load_table(spark, sf_dir, "documents")
    return pipe_tagged(
        [docs.select("doc_id", "lang"), docs.select("doc_id", "source")],
        "cat",
    )
