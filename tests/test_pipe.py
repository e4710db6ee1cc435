"""Streaming script-UDF tests — the reference's streaming corpus
(TestStreaming / TestStreamAggregate / TestStreamReduceNone with TrApp /
UniqApp / ValueCountReduce fixtures; SURVEY.md §5.1). We drive the same
contracts with portable shell/python one-liners."""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.operators.pipe import (
    chain,
    pipe,
    pipe_grouped,
    pipe_skip_bad,
    pipe_tagged,
)

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


# Crashes (exit 1) the moment a line containing POISON is read; upcases
# everything else. Deterministic per line — the SkipBadRecords contract.
POISON_UPPER = (
    "python3 -c \"import sys; "
    "[sys.exit(1) if 'POISON' in l else print(l.rstrip(chr(10)).upper() + chr(9) + 'ok') "
    "for l in sys.stdin]\""
)

# Per-key count over a key-sorted stream that crashes on key 'bad' —
# the reduce-side skip-GROUPS fixture. Stateful across a group's lines,
# so it doubles as the chunk-boundary-never-splits-a-group detector.
GROUP_COUNT_CRASH = (
    "python3 -c \"import sys, itertools; "
    "[sys.exit(1) if k == 'bad' else print(k + chr(9) + str(sum(1 for _ in g))) "
    "for k, g in itertools.groupby(l.rstrip(chr(10)).split(chr(9), 1)[0] for l in sys.stdin)]\""
)


def test_pipe_skip_bad_clean_input_equals_pipe(spark):
    # No failures → identical contract to pipe(); skipped is empty.
    df = spark.createDataFrame([("ab", "x"), ("cd", "y")], ["k", "v"])
    out, skipped = pipe_skip_bad(df, "tr a-z A-Z")
    assert {(r.key, r.value) for r in out.collect()} == {("AB", "X"), ("CD", "Y")}
    assert skipped.count() == 0


def test_pipe_skip_bad_isolates_single_poison_record(spark):
    # max_skip_records=1: bisection narrows to EXACTLY the poison lines;
    # every innocent line's output survives. chunk_size=4 forces multiple
    # subprocess invocations per partition.
    rows = [(f"r{i:02d}",) for i in range(20)]
    rows[7] = ("POISONa",)
    rows[13] = ("POISONb",)
    df = spark.createDataFrame(rows, ["k"]).coalesce(2)
    out, skipped = pipe_skip_bad(df, POISON_UPPER, max_skip_records=1, chunk_size=4)
    assert {r.line for r in skipped.collect()} == {"POISONa", "POISONb"}
    expect = {f"R{i:02d}" for i in range(20) if i not in (7, 13)}
    assert {r.key for r in out.collect()} == expect


def test_pipe_skip_bad_range_is_bounded_not_exact(spark):
    # max_skip_records=4: the narrowed range may take innocent neighbors
    # with it (the reference's documented data-loss contract), but it is
    # bounded, contains the poison, and output ∪ skipped covers the input.
    rows = [(f"r{i:02d}",) for i in range(16)]
    rows[5] = ("POISON",)
    df = spark.createDataFrame(rows, ["k"]).coalesce(1)
    out, skipped = pipe_skip_bad(df, POISON_UPPER, max_skip_records=4, chunk_size=16)
    skipped_lines = {r.line for r in skipped.collect()}
    assert "POISON" in skipped_lines
    assert len(skipped_lines) <= 4
    got = {r.key for r in out.collect()}
    assert got == {r[0].upper() for r in rows if r[0] not in skipped_lines}


def test_pipe_skip_bad_groups_skips_whole_group(spark):
    # Reduce-side semantics: the skip unit is a key-GROUP. chunk_size=3
    # is smaller than the group sizes, so exact per-key counts also prove
    # chunks flush only at group boundaries (the counting script is
    # stateful within a group — a split group would undercount).
    rows = [("a",)] * 4 + [("bad",)] * 3 + [("c",)] * 5
    df = spark.createDataFrame(rows, ["k"])
    out, skipped = pipe_skip_bad(
        df, GROUP_COUNT_CRASH, max_skip_records=1, chunk_size=3, group_key_cols=["k"]
    )
    assert {(r.key, r.value) for r in out.collect()} == {("a", "4"), ("c", "5")}
    assert [r.line for r in skipped.collect()] == ["bad"] * 3


def test_pipe_skip_bad_preserves_blank_output_lines(spark):
    # Round-6 review: a script that legitimately emits blank lines must
    # keep them (pipe()/rdd.pipe keep every stdout line; only the single
    # trailing newline is framing). The script prints one blank line
    # after each record — output rows double, half of them empty-key.
    script = (
        "python3 -c \"import sys; "
        "[print(l.rstrip(chr(10)) + chr(10)) for l in sys.stdin]\""
    )
    df = spark.createDataFrame([("a",), ("b",)], ["k"]).coalesce(1)
    out, skipped = pipe_skip_bad(df, script)
    got = [r.key for r in out.collect()]
    assert sorted(got) == ["", "", "a", "b"]
    assert skipped.count() == 0


def test_pipe_skip_bad_rejects_bad_budget(spark):
    df = spark.createDataFrame([("x",)], ["k"])
    with pytest.raises(ValueError, match="max_skip_records"):
        pipe_skip_bad(df, "cat", max_skip_records=0)


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
