"""Similarity-search tests: LSH ANN recall vs brute force; multimodal
plumbing determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.catalog import load_table
from hadoop_20_warehouse_fix_spark.functions.multimodal import documents_as_media, extract_features
from hadoop_20_warehouse_fix_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from tests.conftest import SF_CORRECT


def test_lsh_ann_recall_vs_brute_force(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()}
    # 2 planes → 4 buckets: ~1/4 corpus per query, decent recall for a
    # recall-floor assertion (4 planes is the latency-lean setting).
    approx = {(r.query_id, r.neighbor_id) for r in lsh_topk(emb, queries, k=5, n_planes=2, dim=64).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"ANN recall suspiciously low: {recall}"
    # Every query must still get k results (buckets are never empty here).
    per_query = {}
    for q, _ in approx:
        per_query[q] = per_query.get(q, 0) + 1
    assert all(v == 5 for v in per_query.values())


def test_ivf_ann_recall_vs_brute_force(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # Deterministic (seeded codebook, fixed data): 0.58 at sf0.01.
    # Uniform-random synthetic embeddings are ANN-adversarial (neighbors
    # barely closer than random), so this is a floor, not a ceiling.
    assert recall >= 0.5, f"IVF recall regressed: {recall}"
    # Determinism: the seeded codebook must give identical results on re-run.
    rerun = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=4).collect()
    }
    assert approx == rerun


def test_multimodal_fake_features_deterministic(spark):
    media = documents_as_media(load_table(spark, SF_CORRECT, "documents").limit(50))
    a = {r.media_id: (r.n_bytes, r.byte_checksum, tuple(r.features)) for r in extract_features(media).collect()}
    b = {r.media_id: (r.n_bytes, r.byte_checksum, tuple(r.features)) for r in extract_features(media).collect()}
    assert a == b
    assert all(len(v[2]) == 8 for v in a.values())
    assert all(v[0] > 0 for v in a.values())


def test_numpy_brute_force_matches_jvm(spark):
    from hadoop_20_warehouse_fix_spark.operators.similarity import brute_force_topk_np

    emb = load_table(spark, SF_CORRECT, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    jvm = {
        (r.query_id, r.neighbor_id, r.rank): r.cosine
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    np_ = {
        (r.query_id, r.neighbor_id, r.rank): r.cosine
        for r in brute_force_topk_np(emb, queries, k=5).collect()
    }
    assert set(jvm) == set(np_)
    for key, c in jvm.items():
        assert abs(np_[key] - c) < 1e-6


def test_zero_vector_does_not_crash_or_rank(spark):
    """ANSI division by a zero norm must not fail the job; degenerate
    vectors rank last (NULL cosine) and never appear in top-k."""
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0]), (3, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = brute_force_topk(df, df, k=2).collect()
    assert all(r.neighbor_id != 2 or r.cosine is None for r in out)
    # queries with zero norm return no meaningful matches but don't crash
    assert {r.query_id for r in out} >= {0, 1, 3}


def test_multimodal_resize_and_frames_deterministic(spark):
    from hadoop_20_warehouse_fix_spark.functions.multimodal import (
        documents_as_media,
        resize_batch,
        sample_frames,
    )

    media = documents_as_media(load_table(spark, SF_CORRECT, "documents").limit(30))
    r1 = {r.media_id: bytes(r.payload) for r in resize_batch(media, 32, 32).collect()}
    r2 = {r.media_id: bytes(r.payload) for r in resize_batch(media, 32, 32).collect()}
    assert r1 == r2
    assert all(len(p) == 32 * 32 // 64 for p in r1.values())
    f1 = {(r.media_id, r.frame_idx): bytes(r.frame) for r in sample_frames(media, 4).collect()}
    assert len(f1) == 30 * 4
    f2 = {(r.media_id, r.frame_idx): bytes(r.frame) for r in sample_frames(media, 4).collect()}
    assert f1 == f2
