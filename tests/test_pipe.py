"""Streaming script-UDF tests — the reference's streaming corpus
(TestStreaming / TestStreamAggregate / TestStreamReduceNone with TrApp /
UniqApp / ValueCountReduce fixtures; SURVEY.md §5.1). We drive the same
contracts with portable shell/python one-liners."""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.operators.pipe import chain, pipe, pipe_grouped, pipe_tagged

# ValueCountReduce analog: per-key count over a key-sorted stdin stream.
UNIQ_COUNT = (
    "python3 -c \"import sys, itertools; "
    "[print(k + chr(9) + str(sum(1 for _ in g))) "
    "for k, g in itertools.groupby(l.rstrip(chr(10)).split(chr(9), 1)[0] for l in sys.stdin)]\""
)


def test_pipe_cat_identity(spark):
    df = spark.createDataFrame([("a", "1"), ("b", "2")], ["k", "v"])
    out = {(r.key, r.value) for r in pipe(df, "cat").collect()}
    assert out == {("a", "1"), ("b", "2")}


def test_pipe_tr_uppercase(spark):
    # TrApp analog: a char-translating filter.
    df = spark.createDataFrame([("ab", "x"), ("cd", "y")], ["k", "v"])
    out = {(r.key, r.value) for r in pipe(df, "tr a-z A-Z").collect()}
    assert out == {("AB", "X"), ("CD", "Y")}


def test_pipe_num_key_fields(spark):
    # stream.num.map.output.key.fields=2: key = first two fields.
    df = spark.createDataFrame([("a", "b", "c", "d")], ["f0", "f1", "f2", "f3"])
    r = pipe(df, "cat", num_key_fields=2).collect()[0]
    assert r.key == "a\tb" and r.value == "c\td"


def test_pipe_grouped_uniq_count(spark):
    # Reducer contract: each key contiguous + sorted → uniq-style count.
    rows = [("a",)] * 3 + [("b",)] * 2 + [("c",)] * 4
    df = spark.createDataFrame(rows, ["k"])
    got = {(r.key, r.value) for r in pipe_grouped(df, ["k"], UNIQ_COUNT, num_partitions=2).collect()}
    assert got == {("a", "3"), ("b", "2"), ("c", "4")}


def test_pipe_nonzero_exit_fails(spark):
    # PipeMapRed.java:124 — non-zero subprocess exit fails the job.
    df = spark.createDataFrame([("x",)], ["k"])
    # Assert the SPECIFIC failure (subprocess exit status surfaced), not
    # any Exception — pytest.raises(Exception) would also pass on an
    # unrelated plan-construction error and never pin the contract.
    with pytest.raises(Exception, match=r"(?i)exit|status|code 1"):
        pipe(df, "sh -c 'exit 1'").collect()


def test_pipe_tagged_two_sources(spark):
    # Hive-streaming -inputtagged: the script sees each line prefixed
    # with its source index and can merge/diff the inputs. The test
    # script swaps tag 0 -> "left", 1 -> "right" and echoes key\tvalue.
    left = spark.createDataFrame([("a", "1"), ("b", "2")], ["k", "v"])
    right = spark.createDataFrame([("a", "9")], ["k", "v"])
    script = (
        "python3 -c \"import sys; "
        "[print(('left' if t == '0' else 'right') + chr(9) + rest.rstrip(chr(10))) "
        "for t, rest in (l.split(chr(9), 1) for l in sys.stdin)]\""
    )
    got = {(r.key, r.value) for r in pipe_tagged([left, right], script).collect()}
    assert got == {("left", "a\t1"), ("left", "b\t2"), ("right", "a\t9")}


def test_chain_fuses_stages(spark):
    df = spark.range(10)
    out = chain(
        df,
        lambda d: d.withColumn("a", F.col("id") * 2),
        lambda d: d.withColumn("b", F.col("a") + 1),
        lambda d: d.filter(F.col("b") > 5),
    )
    assert out.count() == 7
    # One fused WholeStageCodegen span, no exchange between stages.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
