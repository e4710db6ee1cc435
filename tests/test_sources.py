"""Tests for sources/readers — the reference's InputFormat corpus
(TestTextInputFormat, TestSequenceFileInputFilter, TestConstructQuery,
SkipBadRecords semantics; SURVEY.md §2.1/§2.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.sources.readers import (
    badrecords_safe_udf,
    jdbc_select_query,
    read_csv,
    read_kv_text,
    read_text,
    scan_time_filters,
)


def test_read_text_lines(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("one\ntwo\nthree\n")
    assert {r.value for r in read_text(spark, str(p)).collect()} == {"one", "two", "three"}


def test_read_kv_text_first_sep_split(spark, tmp_path):
    # KeyValueLineRecordReader: split at FIRST sep; value keeps later seps;
    # a line with no sep is all-key, empty value.
    p = tmp_path / "kv.txt"
    p.write_text("a\tb\tc\nnokey\nk2\tv2\n")
    rows = {r.key: r.value for r in read_kv_text(spark, str(p)).collect()}
    assert rows == {"a": "b\tc", "nokey": "", "k2": "v2"}


def test_read_csv_permissive_corrupt_record(spark, tmp_path):
    # SkipBadRecords analog for parse errors: malformed rows are captured
    # in _corrupt_record, not fatal.
    p = tmp_path / "d.csv"
    p.write_text("1,x\n2,y\nBAD_ROW_NO_COMMA_INT,z\n")
    # cache(): Spark disallows querying only _corrupt_record on the raw scan
    df = read_csv(spark, str(p), schema="a int, b string, _corrupt_record string").cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2 and bad.count() == 1


def test_scan_time_filters(spark):
    # RegexFilter:103 / PercentFilter:146 semantics as pushed predicates.
    df = spark.range(100).withColumnRenamed("id", "k")
    assert scan_time_filters(df, "k", percent_mod=10).count() == 10
    assert scan_time_filters(df, "k", regex="^1.$").count() == 10
    assert scan_time_filters(df, "k", regex="^1.$", percent_mod=10).count() == 1


def test_jdbc_select_query_construction():
    # TestConstructQuery analog (DBInputFormat.getSelectQuery:87).
    q = jdbc_select_query("t", ["a", "b"], conditions="a > 1", order_by="b")
    assert q == "SELECT a, b FROM t WHERE a > 1 ORDER BY b"
    assert jdbc_select_query("t", ["a"]) == "SELECT a FROM t"


def test_badrecords_safe_udf(spark):
    safe = badrecords_safe_udf(lambda s: 100 // int(s), "int")
    df = spark.createDataFrame([("5",), ("0",), ("x",), ("4",)], ["s"])
    out = df.select(safe("s").alias("v"))
    assert out.filter(F.col("v").isNotNull()).count() == 2
    assert out.filter(F.col("v").isNull()).count() == 2
