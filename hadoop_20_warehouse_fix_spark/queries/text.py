"""Text / selection queries — field selection and regex ops (SURVEY.md
§2.2), wordcount + inverted index (§2.9 index contrib), and the text-
analysis extension pack (lang-id, quality, token stats, fingerprints)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.catalog import load_table
from hadoop_20_warehouse_fix_spark.operators.fieldspec import field_select
from hadoop_20_warehouse_fix_spark.queries import query


@query(
    "field_selection_cut",
    oracle="""
    WITH lines AS (
      SELECT concat_ws(CHR(9), CAST(s_suppkey AS VARCHAR), s_name,
                       CAST(s_nationkey AS VARCHAR), CAST(s_acctbal AS VARCHAR)) AS line
      FROM supplier
    ), split_lines AS (SELECT string_split(line, CHR(9)) AS f FROM lines)
    SELECT concat_ws(CHR(9), f[3], f[1]) AS key,
           array_to_string(f[2:], CHR(9)) AS value
    FROM split_lines
    """,
)
def field_selection_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field selection ("cut") — FieldSelectionMapReduce
    (``M/lib/FieldSelectionMapReduce.java:64``; spec parse
    ``extractFields:182``). Spec ``"2,0:1-"`` → key = fields 2,0;
    value = fields 1..end, tab-separated. Compiles to split/slice/join
    Column exprs — no UDF, narrow op, codegen'd."""
    supp = load_table(spark, sf_dir, "supplier").select(
        F.concat_ws(
            "\t",
            F.col("s_suppkey").cast("string"),
            F.col("s_name"),
            F.col("s_nationkey").cast("string"),
            F.col("s_acctbal").cast("string"),
        ).alias("line")
    )
    return field_select(supp, "line", "2,0:1-", sep="\t")


@query(
    "text_wordcount",
    headline=True,
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordCount (``E/WordCount.java:17``, TokenCountMapper
    ``M/lib/TokenCountMapper.java:38``): tokenize → explode → count.
    Map-side partial agg makes shuffle volume O(vocabulary), not
    O(tokens) — the same reason the reference ran a combiner."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_grep_topk",
    oracle="""
    SELECT match, count(*) AS n
    FROM (SELECT unnest(regexp_extract_all(text, '[a-z]*a[a-z]*')) AS match FROM documents)
    WHERE match <> ''
    GROUP BY match
    ORDER BY n DESC, match
    LIMIT 20
    """,
)
def text_grep_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep (``E/Grep.java:34``: RegexMapper extract + count, then job 2
    sorts by count desc). The reference needed two MR jobs and a single
    reducer; here extract → explode → count → TakeOrdered in one plan."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.regexp_extract_all(F.col("text"), F.lit("[a-z]*a[a-z]*"), 0)).alias("match"))
        .filter(F.col("match") != "")
        .groupBy("match")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("match"))
        .limit(20)
    )


@query(
    "text_inverted_index",
    oracle="""
    SELECT word,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           count(*) AS n_occurrences
    FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the index contrib
    (``X/index/.../IndexUpdateMapper.java:39``: doc → (term, op) →
    sharded index via combiner/reducer). Relational form: doc→term
    explode, per-term document frequency + occurrence count. The shard
    distribution policy maps to hash partitioning on term."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
    )
