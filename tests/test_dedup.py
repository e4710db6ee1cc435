"""Dedup extension tests: approximate variants validated against the
exact variant (recall/precision), SimHash invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.catalog import load_table
from hadoop_20_warehouse_fix_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_bands,
    simhash_pairs,
)
from tests.conftest import SF_CORRECT


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_minhash_lsh_recall_precision(spark):
    docs = load_table(spark, SF_CORRECT, "documents")
    exact = _pairs(ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5))
    approx = _pairs(
        minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=60, bands=20, threshold=0.5)
    )
    assert exact, "testdata should contain planted near-dup pairs"
    # Exact-verified candidates ⇒ no false positives, ever.
    assert approx <= exact
    # Banding S-curve: recall near 1 for the planted high-jaccard pairs.
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} below bound ({len(approx)}/{len(exact)})"


def test_simhash_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "totally different words here")],
        ["doc_id", "text"],
    )
    bands = {r.id: (r.band0, r.band1, r.band2, r.band3) for r in simhash_bands(df, "doc_id", "text").collect()}
    assert bands[1] == bands[2]
    assert bands[1] != bands[3]
    pairs = {(r.id_a, r.id_b, r.hamming) for r in simhash_pairs(df, "doc_id", "text").collect()}
    assert (1, 2, 0) in pairs


def test_simhash_near_dup_small_hamming(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "completely unrelated content about databases")],
        ["doc_id", "text"],
    )
    got = {(r.id_a, r.id_b) for r in simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()}
    assert (1, 2) in got
    assert (1, 3) not in got
