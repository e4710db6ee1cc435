"""Driver-gated source/sink round-trip queries (SURVEY.md §2.1/§2.6).

These prove the binary-ingest bridge under the driver's oracle gate:
the bytes that leave the engine through a legacy sink come back intact
through the matching reader.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.catalog import load_table
from hadoop_20_warehouse_fix_spark.queries import query


@query("seqfile_roundtrip", oracle="SELECT doc_id, text FROM documents")
def seqfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL SequenceFile round-trip under the oracle gate: write the
    documents table to an actual Hadoop SequenceFile (sync markers,
    Writable KV records — reference SequenceFile.java:186), read it back
    via ``sc.sequenceFile``, and prove byte-perfect delivery of every
    row against the source-of-truth Parquet. This is the migration path
    a reference-warehouse user hits first (SURVEY §1.3); steady-state
    storage remains Parquet (sequence_to_parquet).

    Scale: one pickle-boundary pass per record — a one-time ingest cost,
    parallel in both directions (splittable files, one writer/reader per
    partition)."""
    from hadoop_20_warehouse_fix_spark.sources.readers import read_sequence_file
    from hadoop_20_warehouse_fix_spark.sources.writers import write_sequence_file

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = tempfile.mkdtemp(prefix="seqfile_rt_") + "/seq"
    write_sequence_file(docs, path, "doc_id", "text")
    back = read_sequence_file(spark, path, "LongWritable", "Text", "doc_id", "text")
    return back.select(F.col("doc_id").cast("bigint").alias("doc_id"), "text")


@query(
    "split_train_val_test",
    oracle="""
    WITH coined AS (
      SELECT doc_id,
             list_sum(list_transform(generate_series(1, 8),
               i -> (strpos('0123456789abcdef',
                            substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
                    * power(16, 8 - i))) / 4294967296.0 AS u
      FROM documents
    )
    SELECT CASE WHEN u < 0.98 THEN 'train'
                WHEN u < 0.99 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs
    FROM coined GROUP BY 1
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/val/test split by content-addressed
    md5 coin (sources.readers.assign_split): the same document lands in
    the same split on every rerun, engine, and incremental load — the
    anti-leakage property. Oracle replays the coin and thresholds
    exactly; output is the per-split census."""
    from hadoop_20_warehouse_fix_spark.sources.readers import assign_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        assign_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
