"""Multimodal plumbing queries (extension pack): binary payload columns
with typed metadata, Arrow-batched feature extraction. Codec calls are
stubbed (no image/audio libs in this container — see
functions.multimodal); the Spark-side schema/batch/partitioning plumbing
is real and oracle-checked where the fake extractor is SQL-expressible."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.catalog import load_table
from hadoop_20_warehouse_fix_spark.functions.multimodal import documents_as_media, extract_features
from hadoop_20_warehouse_fix_spark.queries import query


@query(
    "mm_feature_extract",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(length(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction over binary payloads via
    ``mapInPandas`` (Arrow batches — never per-row Python). The
    deterministic fake extractor stands in for decode+embed; the oracle
    checks the part DuckDB can see (payload byte length per media row,
    ASCII text ⇒ chars == bytes), proving ids/partitioning/batching
    deliver every row exactly once."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return extract_features(media).select("media_id", "n_bytes")


@query(
    "mm_feature_vectors",
    oracle="""
    WITH lo AS (
      SELECT doc_id,
             list_transform(string_split(text, ''), ch -> ord(ch)) AS b
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(len(b) AS BIGINT) AS n_bytes,
           CAST(COALESCE(list_sum(b), 0) % 1000000007 AS BIGINT) AS byte_checksum,
           concat_ws(',',
             COALESCE(list_sum(list_transform(generate_series(1, len(b), 8), j -> b[j])), 0) % 997,
             COALESCE(list_sum(list_transform(generate_series(2, len(b), 8), j -> b[j])), 0) % 997,
             COALESCE(list_sum(list_transform(generate_series(3, len(b), 8), j -> b[j])), 0) % 997,
             COALESCE(list_sum(list_transform(generate_series(4, len(b), 8), j -> b[j])), 0) % 997,
             COALESCE(list_sum(list_transform(generate_series(5, len(b), 8), j -> b[j])), 0) % 997,
             COALESCE(list_sum(list_transform(generate_series(6, len(b), 8), j -> b[j])), 0) % 997,
             COALESCE(list_sum(list_transform(generate_series(7, len(b), 8), j -> b[j])), 0) % 997,
             COALESCE(list_sum(list_transform(generate_series(8, len(b), 8), j -> b[j])), 0) % 997
           ) AS features_fp
    FROM lo
    """,
)
def mm_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fake-feature output (byte checksum + 8-dim stride-sum
    vector) under a FULL oracle gate: the deterministic fake extractor
    is arithmetic over the payload bytes (ASCII text ⇒ chars == bytes),
    so DuckDB recomputes every feature — per-batch Arrow delivery,
    ids, and the vector math all verified value-for-value.

    The raw ``array<double>`` column is not canonicalizable by the
    driver's row-sorter (lists are unhashable), so the driver-visible
    projection carries a deterministic fingerprint of the vector instead
    — the feature values are exact small integers (mod 997), so the
    bigint-cast concat is byte-stable."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        "byte_checksum",
        F.concat_ws(
            ",", F.transform("features", lambda x: x.cast("bigint").cast("string"))
        ).alias("features_fp"),
    )


@query(
    "mm_resize_batch",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
           CAST(16 AS INT) AS n_bytes
    FROM documents
    """,
)
def mm_resize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched resize: real nearest-neighbor pixels for decodable
    payloads (PPM/BMP — tests/test_similarity.py), deterministic
    byte-resampler fallback otherwise. The documents-as-media corpus is
    text (not decodable), so every row takes the fallback: exactly one
    output row per media_id with the fixed 32x32//64-byte payload — the
    oracle checks that delivery contract; pixel math is pytest-gated."""
    from hadoop_20_warehouse_fix_spark.functions.multimodal import documents_as_media, resize_batch

    # decode=False: this corpus is text-as-bytes BY CONSTRUCTION, so the
    # query opts out of magic sniffing — a document that happened to
    # start with a parseable 'P6' header must not flip onto the pixel
    # path and break the fixed-n_bytes delivery oracle. The pixel path
    # itself is exercised on real images in tests.
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    out = resize_batch(media, 32, 32, decode=False)
    return out.select("media_id", "width", "height", F.length("payload").alias("n_bytes"))


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id AS media_id, unnest(range(4)) AS frame_idx
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (UDTF shape: 1 blob -> 4 frames). The frame ids
    per media are exactly 0..3 — oracle checks the explosion shape; the
    frame payload determinism is asserted in tests."""
    from hadoop_20_warehouse_fix_spark.functions.multimodal import documents_as_media, sample_frames

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, 4).select("media_id", "frame_idx")
