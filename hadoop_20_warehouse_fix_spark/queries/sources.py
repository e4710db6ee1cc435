"""Driver-gated source/sink round-trip queries (SURVEY.md §2.1/§2.6).

These prove the binary-ingest bridge under the driver's oracle gate:
the bytes that leave the engine through a legacy sink come back intact
through the matching reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.catalog import load_table
from hadoop_20_warehouse_fix_spark.scratch import scratch_dir
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
    path = scratch_dir(prefix="seqfile_rt_") + "/seq"
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


@query(
    "kvtext_roundtrip",
    oracle="SELECT CAST(doc_id AS VARCHAR) AS key, text AS value FROM documents",
)
def kvtext_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KV-text round-trip (TextOutputFormat -> KeyValueTextInputFormat):
    write `key \\t value` lines, split them back at the first separator —
    the reference's default text interchange, proven lossless on real
    data under the oracle gate."""
    from hadoop_20_warehouse_fix_spark.sources.readers import read_kv_text
    from hadoop_20_warehouse_fix_spark.sources.writers import write_kv_text

    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir(prefix="kvtext_rt_") + "/kv"
    write_kv_text(docs, path, "doc_id", "text")
    return read_kv_text(spark, path)


@query(
    "xml_records_roundtrip",
    oracle="SELECT doc_id, text FROM documents",
)
def xml_records_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML record scan round-trip (StreamXmlRecordReader): wrap each
    document as `<rec id="N">text</rec>`, write as text, re-frame the
    records with the begin/end-tag reader, parse id and body back out.
    Oracle checks every document survives framing exactly."""
    from hadoop_20_warehouse_fix_spark.sources.readers import read_xml_records

    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir(prefix="xml_rt_") + "/xml"
    docs.select(
        F.concat(
            F.lit('<rec id="'), F.col("doc_id").cast("string"), F.lit('">'),
            F.col("text"), F.lit("</rec>"),
        ).alias("value")
    ).write.mode("overwrite").text(path)
    recs = read_xml_records(spark, path, "rec")
    return recs.select(
        F.regexp_extract("record", r'<rec id="(\d+)">', 1).cast("bigint").alias("doc_id"),
        F.regexp_extract("record", r'<rec id="\d+">(.*)</rec>', 1).alias("text"),
    )


@query(
    "demux_partitioned_roundtrip",
    oracle="""
    SELECT CAST(doc_id % 8 AS BIGINT) AS part, count(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def demux_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demux sink round-trip (MultipleOutputFormat): route rows into one
    directory per derived key, read the partitioned layout back, census
    per partition — proving the demux delivered every row to the right
    leaf."""
    from hadoop_20_warehouse_fix_spark.sources.writers import write_partitioned

    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir(prefix="demux_rt_") + "/parts"
    write_partitioned(docs, path, F.pmod(F.col("doc_id"), F.lit(8)), "part")
    back = spark.read.parquet(path)
    return back.groupBy(F.col("part").cast("bigint").alias("part")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@query(
    "jdbc_roundtrip",
    oracle="SELECT doc_id, text FROM documents",
)
def jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC sink + scan round-trip (DBOutputFormat/DBInputFormat)
    against the embedded Derby that ships with Spark: batched INSERTs
    out, partitioned range SELECTs back. Oracle checks byte-perfect
    delivery both ways."""
    import uuid

    from hadoop_20_warehouse_fix_spark.sources.readers import read_jdbc
    from hadoop_20_warehouse_fix_spark.sources.writers import write_jdbc

    url = f"jdbc:derby:memory:h20wf_q_{uuid.uuid4().hex[:12]};create=true"
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    write_jdbc(docs, url, "docs", mode="overwrite", **drv)
    back = read_jdbc(
        spark, url, "docs",
        partition_column="doc_id", lower_bound=0, upper_bound=100000, num_partitions=4,
        **drv,
    )
    return back.select(F.col("doc_id").cast("bigint").alias("doc_id"), "text")


@query(
    "compact_roundtrip",
    oracle="SELECT doc_id, text FROM documents",
)
def compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip (CombineFileInputFormat/HAR
    analog): scatter the table into many small files, compact to few
    large ones, read back — content identical, file count reduced
    (count asserted in tests/test_sinks.py; content under the oracle
    gate here)."""
    from hadoop_20_warehouse_fix_spark.sources.writers import compact

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = scratch_dir(prefix="compact_rt_")
    src, dst = base + "/small", base + "/compacted"
    docs.repartition(16).write.mode("overwrite").parquet(src)
    compact(spark, src, dst, target_file_mb=512)
    return spark.read.parquet(dst)


@query(
    "multi_sink_census",
    oracle="""
    SELECT 'even' AS sink, count(*) AS n_rows FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT 'odd' AS sink, count(*) AS n_rows FROM documents WHERE doc_id % 2 = 1
    """,
)
def multi_sink_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultipleOutputs round-trip: ONE pass over the source feeds two
    named sinks (even/odd doc_ids); the written sinks are read back and
    censused — proving the single-read multi-write contract delivered
    every row to exactly one sink."""
    from hadoop_20_warehouse_fix_spark.sources.writers import multi_sink, write_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = scratch_dir(prefix="multisink_rt_")
    multi_sink(
        docs,
        {
            "even": (F.pmod(F.col("doc_id"), F.lit(2)) == 0,
                     lambda d: write_table(d, base + "/even")),
            "odd": (F.pmod(F.col("doc_id"), F.lit(2)) == 1,
                    lambda d: write_table(d, base + "/odd")),
        },
    )
    even = spark.read.parquet(base + "/even").agg(F.count(F.lit(1)).alias("n_rows")).select(
        F.lit("even").alias("sink"), "n_rows"
    )
    odd = spark.read.parquet(base + "/odd").agg(F.count(F.lit(1)).alias("n_rows")).select(
        F.lit("odd").alias("sink"), "n_rows"
    )
    return even.unionByName(odd)


@query(
    "compressed_text_roundtrip",
    oracle="SELECT CAST(doc_id AS VARCHAR) AS key, text AS value FROM documents",
)
def compressed_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-text ingest round-trip: KV lines written with the gzip
    codec, read back through the SAME codec-detecting text scan as plain
    files (LineRecordReader.java:76-88's extension-based detection is
    Hadoop behavior Spark inherits; the reference's Lzma/SimpleSeekable
    additions — SimpleSeekableFormat.java:45, LzmaCodec.java:38 — exist
    to make compressed TEXT seekable/splittable).

    MIGRATION (closes SURVEY §1.3): this engine does not port the FB
    seekable container. Gzip text is one-split-per-file here — the same
    practical granularity the reference got, with parallelism from file
    count (the demux/compact sinks control file sizing). The ROLE of
    SimpleSeekableFormat (splittable compressed storage) is filled by
    zstd Parquet — the engine-wide default sink (session.py) — which is
    splittable at row-group boundaries and out-compresses LZMA-on-text;
    bzip2 remains the only natively splittable text codec if raw text is
    mandatory. Compressed text is an INGEST EDGE format: land it, read
    it once, convert to Parquet (sources/readers.py:sequence_to_parquet
    is the same playbook for SequenceFiles)."""
    from hadoop_20_warehouse_fix_spark.sources.readers import read_kv_text
    from hadoop_20_warehouse_fix_spark.sources.writers import write_kv_text

    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir(prefix="gztext_rt_") + "/kv"
    write_kv_text(docs, path, "doc_id", "text", compression="gzip")
    return read_kv_text(spark, path)


@query(
    "mapfile_sorted_roundtrip",
    oracle="SELECT doc_id, text FROM documents",
)
def mapfile_sorted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted+indexed sink round-trip (MapFileOutputFormat analog,
    reference MapFile.java): write globally range-partitioned files
    sorted on doc_id with parquet min/max row-group stats as the sparse
    index and a bloom filter on the key (BloomMapFile's negative-lookup
    guard), read the directory back whole — delivery must be lossless.
    The index actually works: a point-lookup filter on doc_id prunes to
    one file via the range layout + row-group stats (asserted in
    tests/test_sinks.py); here the oracle proves content fidelity."""
    from hadoop_20_warehouse_fix_spark.sources.writers import write_sorted

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = scratch_dir(prefix="mapfile_rt_") + "/sorted"
    write_sorted(docs, path, ["doc_id"], num_files=4, bloom_cols=["doc_id"])
    return spark.read.parquet(path)


@query(
    "nline_scan_roundtrip",
    oracle="SELECT CAST(doc_id AS VARCHAR) AS key, text AS value FROM documents",
)
def nline_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-line scan round-trip (NLineInputFormat,
    M/lib/NLineInputFormat.java:59): KV lines written once, read back
    with a bounded number of lines per task — the per-task
    parameterization the reference used to meter expensive map UDFs.
    Content must survive the repartition byte-for-byte; the partition
    arithmetic itself (ceil(lines/N) tasks) is asserted in
    tests/test_sources.py."""
    from hadoop_20_warehouse_fix_spark.sources.readers import (
        read_text_nlines,
        split_first_sep,
    )
    from hadoop_20_warehouse_fix_spark.sources.writers import write_kv_text

    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir(prefix="nline_rt_") + "/kv"
    write_kv_text(docs, path, "doc_id", "text")
    lines = read_text_nlines(spark, path, lines_per_task=100)
    key_expr, value_expr = split_first_sep(F.col("value"), "\t")
    return lines.select(key_expr.alias("key"), value_expr.alias("value"))


@query(
    "badrecords_skip_scan",
    oracle="""
    SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
    """,
)
def badrecords_skip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-record skipping at the scan (SkipBadRecords.java:51 posture):
    the query writes a KV-text file where every 50th record is CORRUPTED
    (non-numeric key), reads it back through the PERMISSIVE typed-CSV
    parser — malformed rows surface as NULL-key rows instead of failing
    the job — and returns only the clean records. The oracle is the
    clean subset; equality proves corruption neither kills the scan nor
    leaks mangled rows into the result. The kept-vs-skipped counts are
    the observable the reference exposed as counters
    (tests/test_sources.py asserts the corrupt-row count)."""
    from hadoop_20_warehouse_fix_spark.sources.readers import read_csv
    from hadoop_20_warehouse_fix_spark.sources.writers import write_kv_text

    docs = load_table(spark, sf_dir, "documents")
    mangled = docs.select(
        F.when(F.col("doc_id") % 50 == 0, F.concat(F.lit("BAD_"), F.col("doc_id")))
        .otherwise(F.col("doc_id").cast("string"))
        .alias("k"),
        "text",
    )
    path = scratch_dir(prefix="badrec_rt_") + "/kv"
    write_kv_text(mangled, path, "k", "text")
    parsed = read_csv(
        spark, path, schema="doc_id bigint, text string", sep="\t", permissive=True
    )
    return parsed.filter(F.col("doc_id").isNotNull()).select("doc_id", "text")


@query(
    "schema_evolution_roundtrip",
    oracle="""
    SELECT doc_id, text,
           CASE WHEN doc_id % 2 = 1 THEN lang END AS lang
    FROM documents
    """,
)
def schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the storage layer: an old-schema batch
    (doc_id, text) and a new-schema batch (doc_id, text, lang) land in
    the same table directory; a mergeSchema read returns the union
    schema with NULLs where the old files lack the column — the
    add-a-column migration every long-lived warehouse table goes
    through (the reference's Writable world had NO story for this
    beyond rewriting; Parquet's self-describing footers give it for
    free). Producers may only ADD nullable columns — renames/type
    changes still need a rewrite, same as the reference."""
    from hadoop_20_warehouse_fix_spark.sources.writers import write_table

    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir(prefix="schema_evo_") + "/t"
    write_table(docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text"), path, mode="append")
    write_table(
        docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text", "lang"),
        path,
        mode="append",
    )
    return spark.read.option("mergeSchema", "true").parquet(path).select(
        "doc_id", "text", "lang"
    )
