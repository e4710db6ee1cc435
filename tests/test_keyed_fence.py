"""Commit-point lease fencing (round-13, from round-12 ADVICE medium).

A writer that legitimately outlives ``lock_ttl_sec`` (large COW
backfill, slow compaction) has its lease broken and re-issued to a
successor. Before this round the zombie's in-flight commit
(``_swap_buckets`` / ``_marker_publish`` / delta rename) proceeded
anyway — exactly the interleaved-write corruption the lock exists to
prevent. Now every commit point re-verifies the lock token immediately
before mutating shared state and aborts loudly on mismatch.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

import hadoop_20_warehouse_fix_spark.sources.keyed as K


@pytest.fixture()
def table(spark):
    # rename protocol: these pins assert rename-era commit points (the
    # delta-dir rename IS the commit, so an aborted batch leaves NO seq
    # dir). Marker fencing — where the _COMMITTED/manifest PUT commits
    # — is pinned separately below.
    tmp = tempfile.mkdtemp(prefix="keyed_fence_")
    path = f"{tmp}/tab"
    base = spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"), F.lit("base").alias("tag")
    )
    K.write_keyed_table(base, path, ["k"], num_buckets=4, commit="rename")
    yield path
    shutil.rmtree(tmp, ignore_errors=True)


def _usurp(path: str) -> None:
    """Simulate a successor writer taking over after a TTL break: the
    lock file now carries a DIFFERENT token."""
    lock = os.path.join(path, K._WRITER_LOCK)
    with open(lock, "w") as f:
        json.dump(
            {"host": "successor", "pid": 4242, "token": "f" * 32,
             "acquired_unix": time.time()},
            f,
        )


def test_mor_commit_aborts_when_lease_lost(spark, table, monkeypatch):
    """The delta commit fences: lease usurped mid-job → abort BEFORE
    the _COMMITTED/rename, no delta lands, feed stays empty."""
    real = K._read_seq_hwm

    def usurp_then(spark_, path_):
        _usurp(table)
        return real(spark_, path_)

    monkeypatch.setattr(K, "_read_seq_hwm", usurp_then)
    batch = spark.createDataFrame([(1, -9, "z")], "k long, v long, tag string")
    with pytest.raises(K.KeyedTableLockedError, match="lease lost before commit"):
        K.upsert_keyed_table(spark, table, batch, mode="mor")
    monkeypatch.undo()
    os.remove(os.path.join(table, K._WRITER_LOCK))  # clear the usurper
    assert not os.path.exists(os.path.join(table, K._DELTA_DIR, "seq=1")), \
        "zombie's delta must not commit"
    tab = K.read_keyed_table(spark, table)
    assert tab.filter(F.col("k") == 1).first().v == 2, "old value intact"
    assert K.read_keyed_changes(spark, table).count() == 0


def test_cow_swap_aborts_when_lease_lost(spark, table, monkeypatch):
    """The bucket swap fences at entry: the staged merge never swaps in
    and every bucket keeps its pre-batch contents."""
    real = K._write_layout

    def usurp_then(df, dest, n_parts, meta):
        out = real(df, dest, n_parts, meta)
        _usurp(table)
        return out

    monkeypatch.setattr(K, "_write_layout", usurp_then)
    batch = spark.createDataFrame([(1, -9, "z")], "k long, v long, tag string")
    with pytest.raises(K.KeyedTableLockedError, match="lease lost before commit"):
        K.upsert_keyed_table(spark, table, batch, mode="cow")
    monkeypatch.undo()
    os.remove(os.path.join(table, K._WRITER_LOCK))
    tab = K.read_keyed_table(spark, table)
    assert tab.count() == 1_000
    assert tab.filter(F.col("k") == 1).first().v == 2


def test_fence_noop_without_registered_lease(spark, table):
    """A process that never took the lease (fresh path, recovery
    helpers) is not fenced — and a NORMAL write still succeeds and
    deregisters its lease afterward."""
    K._fence_lease(spark, table)  # no lease registered → no-op
    batch = spark.createDataFrame([(1, -9, "z")], "k long, v long, tag string")
    K.upsert_keyed_table(spark, table, batch, mode="mor")
    assert not any(p == table for p, _ in K._ACTIVE_LEASES)
    assert K.read_keyed_table(spark, table).filter(F.col("k") == 1).first().v == -9


def test_marker_publish_fences_manifest_put(spark, monkeypatch):
    """Marker protocol: the manifest PUT is the commit — a usurped
    lease aborts before it, so readers keep resolving the old commit."""
    tmp = tempfile.mkdtemp(prefix="keyed_fence_mk_")
    path = f"{tmp}/tab"
    try:
        base = spark.range(100).select(
            F.col("id").alias("k"), F.lit(0).alias("v"), F.lit("m").alias("tag")
        )
        K.write_keyed_table(base, path, ["k"], num_buckets=2, commit="marker")
        cm_before = K._current_commit(spark, path)

        real = K._write_layout

        def usurp_then(df, dest, n_parts, meta):
            out = real(df, dest, n_parts, meta)
            _usurp(path)
            return out

        monkeypatch.setattr(K, "_write_layout", usurp_then)
        batch = spark.createDataFrame([(1, -9, "z")], "k long, v long, tag string")
        with pytest.raises(K.KeyedTableLockedError, match="lease lost before commit"):
            K.upsert_keyed_table(spark, path, batch, mode="cow")
        monkeypatch.undo()
        os.remove(os.path.join(path, K._WRITER_LOCK))
        assert K._current_commit(spark, path)["n"] == cm_before["n"]
        assert K.read_keyed_table(spark, path).filter(F.col("k") == 1).first().v == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_marker_mor_commit_fences_before_committed_mark(spark, monkeypatch):
    """Marker protocol (the round-14 default): the MOR commit point is
    the _COMMITTED marker write. A usurped lease aborts before it — the
    staged seq dir may remain on disk but carries no marker, readers
    and the change feed ignore it, and the recovery sweep GCs it."""
    tmp = tempfile.mkdtemp(prefix="keyed_fence_mm_")
    path = f"{tmp}/tab"
    try:
        base = spark.range(500).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
            F.lit("base").alias("tag"),
        )
        K.write_keyed_table(base, path, ["k"], num_buckets=4)  # marker default
        assert K.read_keyed_meta(spark, path)["commit"] == "marker"
        real = K._read_seq_hwm

        def usurp_then(spark_, path_):
            _usurp(path)
            return real(spark_, path_)

        monkeypatch.setattr(K, "_read_seq_hwm", usurp_then)
        batch = spark.createDataFrame([(1, -9, "z")], "k long, v long, tag string")
        with pytest.raises(K.KeyedTableLockedError, match="lease lost before commit"):
            K.upsert_keyed_table(spark, path, batch, mode="mor")
        monkeypatch.undo()
        os.remove(os.path.join(path, K._WRITER_LOCK))
        seq1 = os.path.join(path, K._DELTA_DIR, "seq=1")
        if os.path.isdir(seq1):  # staged remnant must be UNCOMMITTED
            assert not os.path.exists(os.path.join(seq1, K._COMMITTED_MARK))
        tab = K.read_keyed_table(spark, path)
        assert tab.filter(F.col("k") == 1).first().v == 2, "old value intact"
        assert K.read_keyed_changes(spark, path).count() == 0
        swept = K.recover_keyed_table(spark, path)
        assert not os.path.exists(seq1), swept
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
