"""Keyed-table COW upsert/delete (round 11): override semantics at the
storage layer, with ONLY the touched hash-bucket directories rewritten."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.sources.keyed import (
    BUCKET_COL,
    compact_keyed_table,
    delete_from_keyed_table,
    read_keyed_meta,
    read_keyed_table,
    upsert_keyed_table,
    write_keyed_table,
)


def _bucket_files(path: str) -> dict[str, set[tuple[str, float, int]]]:
    """bucket dir -> {(file, mtime, size)} — physical identity probe."""
    out: dict[str, set] = {}
    for d in os.listdir(path):
        if not d.startswith(f"{BUCKET_COL}="):
            continue
        full = os.path.join(path, d)
        out[d] = {
            (f, os.path.getmtime(os.path.join(full, f)), os.path.getsize(os.path.join(full, f)))
            for f in os.listdir(full)
            if not f.startswith((".", "_"))
        }
    return out


@pytest.fixture()
def keyed(spark):
    # PINNED to the rename protocol: this file is the rename-era pin
    # set — kb=<b> partition dirs on disk, plain-parquet base interop,
    # _old.kb swap physics. The default flipped to commit='marker' in
    # round 14 (verdict #7); the marker twin pins live in
    # test_keyed_marker.py / test_keyed_atomic.py / test_keyed_snapshot.py.
    tmp = tempfile.mkdtemp(prefix="keyed_")
    path = f"{tmp}/tab"
    base = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"), F.lit("base").alias("tag")
    )
    write_keyed_table(base, path, ["k"], num_buckets=16, commit="rename")
    yield path
    shutil.rmtree(tmp, ignore_errors=True)


def test_upsert_override_semantics_and_cow(spark, keyed):
    before = _bucket_files(keyed)
    updates = spark.range(100).select(
        (F.col("id") * 101).alias("k"),  # 0..9999 hits existing, >9999 inserts
        F.lit(-1).cast("long").alias("v"),
        F.lit("upd").alias("tag"),
    )
    diag = upsert_keyed_table(spark, keyed, updates)
    got = {(r.k, r.v, r.tag) for r in read_keyed_table(spark, keyed).collect()}
    want = {(k, 2 * k, "base") for k in range(10_000) if k % 101 != 0} | {
        (i * 101, -1, "upd") for i in range(100)
    }
    assert got == want
    # COW: every untouched bucket's files are physically identical
    after = _bucket_files(keyed)
    touched = {f"{BUCKET_COL}={b}" for b in diag["touched_buckets"]}
    assert 0 < len(touched) <= 16 and diag["batch_rows"] == 100
    for d, files in before.items():
        if d not in touched:
            assert after[d] == files, f"untouched bucket {d} was rewritten"


def test_delete_and_new_bucket_insert(spark, keyed):
    # delete every key divisible by 7
    keys = spark.range(10_000).filter(F.col("id") % 7 == 0).select(F.col("id").alias("k"))
    diag = delete_from_keyed_table(spark, keyed, keys)
    assert diag["batch_rows"] == len([k for k in range(10_000) if k % 7 == 0])
    left = read_keyed_table(spark, keyed)
    assert left.count() == 10_000 - diag["batch_rows"]
    assert left.filter(F.col("k") % 7 == 0).count() == 0
    # duplicate delete keys are fine (assume_unique defaults True there)
    delete_from_keyed_table(spark, keyed, keys.union(keys))


def test_batch_validation(spark, keyed):
    dup = spark.createDataFrame(
        [(1, 0, "a"), (1, 1, "b")], "k long, v long, tag string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_keyed_table(spark, keyed, dup)
    with pytest.raises(ValueError, match="columns"):
        upsert_keyed_table(spark, keyed, dup.select("k", "v"))
    with pytest.raises(ValueError, match="lacks key columns"):
        delete_from_keyed_table(spark, keyed, dup.select(F.col("v").alias("x")))
    with pytest.raises(ValueError, match="not a keyed table"):
        read_keyed_meta(spark, "/tmp/definitely_not_a_keyed_table")
    # assume_unique skips the check and last..well, arbitrary row wins is
    # NOT promised — the flag is for pre-proven batches; just assert it runs
    upsert_keyed_table(
        spark, keyed, dup.dropDuplicates(["k"]), assume_unique=True
    )


def test_composite_keys_and_meta(spark):
    tmp = tempfile.mkdtemp(prefix="keyed_comp_")
    path = f"{tmp}/tab"
    try:
        df = spark.range(1_000).select(
            (F.col("id") % 50).alias("a"),
            (F.col("id") / 50).cast("long").alias("b"),
            F.col("id").alias("v"),
        )
        write_keyed_table(df, path, ["a", "b"], num_buckets=8)
        meta = read_keyed_meta(spark, path)
        assert meta["key_cols"] == ["a", "b"] and meta["num_buckets"] == 8
        ups = spark.createDataFrame([(3, 2, -7)], "a long, b long, v long")
        upsert_keyed_table(spark, path, ups)
        tab = read_keyed_table(spark, path)
        assert tab.filter((F.col("a") == 3) & (F.col("b") == 2)).first().v == -7
        assert tab.count() == 1_000
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_touched_read_prunes_directories(spark, keyed):
    """Behavioral partition-pruning proof: a kb.isin filter only ever
    opens files under the matching bucket dirs."""
    few = [0, 3]
    files = {
        r.f
        for r in spark.read.parquet(keyed)
        .filter(F.col(BUCKET_COL).isin(few))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert files
    for f in files:
        assert any(f"{BUCKET_COL}={b}/" in f for b in few), f


def _ups(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v long, tag string")


def test_mor_upsert_is_append_only_and_resolves(spark, keyed):
    before = _bucket_files(keyed)
    d1 = upsert_keyed_table(spark, keyed, _ups(spark, [(5, -5, "m1"), (20_001, 1, "m1")]), mode="mor")
    d2 = upsert_keyed_table(spark, keyed, _ups(spark, [(5, -55, "m2")]), mode="mor")
    assert (d1["seq"], d2["seq"]) == (1, 2)
    # base files byte-identical: MOR writes never touch them
    assert _bucket_files(keyed) == before
    assert os.path.isdir(f"{keyed}/_delta/seq=1") and os.path.isdir(f"{keyed}/_delta/seq=2")
    tab = read_keyed_table(spark, keyed)
    assert tab.count() == 10_001  # one insert
    got = {(r.k, r.v, r.tag) for r in tab.filter(F.col("k").isin(5, 20_001, 7)).collect()}
    assert got == {(5, -55, "m2"), (20_001, 1, "m1"), (7, 14, "base")}  # latest seq wins
    # a plain parquet read sees only the base — the documented contract
    assert spark.read.parquet(keyed).count() == 10_000


def test_mor_delete_tombstone_then_compact_physical(spark, keyed):
    upsert_keyed_table(spark, keyed, _ups(spark, [(3, -3, "m")]), mode="mor")
    delete_from_keyed_table(
        spark, keyed, spark.createDataFrame([(3,), (8,)], "k long"), mode="mor"
    )
    tab = read_keyed_table(spark, keyed)
    assert tab.count() == 9_998  # 3 (overridden then tombstoned) and 8 gone
    assert tab.filter(F.col("k").isin(3, 8)).count() == 0
    want_rows = {tuple(r) for r in tab.collect()}  # BEFORE compact drops the delta files
    before = _bucket_files(keyed)
    diag = compact_keyed_table(spark, keyed)
    assert diag["deltas_folded"] == 2 and diag["touched_buckets"]
    assert not os.path.exists(f"{keyed}/_delta")
    after_tab = read_keyed_table(spark, keyed)
    assert {tuple(r) for r in after_tab.collect()} == want_rows
    # tombstoned keys physically gone from the base scan
    assert spark.read.parquet(keyed).filter(F.col("k").isin(3, 8)).count() == 0
    # compaction itself is COW: untouched buckets keep their files
    after = _bucket_files(keyed)
    touched = {f"{BUCKET_COL}={b}" for b in diag["touched_buckets"]}
    for d, files in before.items():
        if d not in touched:
            assert after[d] == files, f"untouched bucket {d} rewritten by compact"
    # idempotence of the fold: a second compact is a no-op
    assert compact_keyed_table(spark, keyed) == {"touched_buckets": [], "deltas_folded": 0}


def test_cow_refused_while_deltas_pending(spark, keyed):
    upsert_keyed_table(spark, keyed, _ups(spark, [(1, 0, "m")]), mode="mor")
    with pytest.raises(ValueError, match="pending MOR deltas"):
        upsert_keyed_table(spark, keyed, _ups(spark, [(2, 0, "c")]), mode="cow")
    with pytest.raises(ValueError, match="pending MOR deltas"):
        delete_from_keyed_table(spark, keyed, spark.createDataFrame([(2,)], "k long"))
    compact_keyed_table(spark, keyed)
    upsert_keyed_table(spark, keyed, _ups(spark, [(2, -2, "c")]), mode="cow")
    assert read_keyed_table(spark, keyed).filter("k = 2").first().v == -2
    with pytest.raises(ValueError, match="mode"):
        upsert_keyed_table(spark, keyed, _ups(spark, [(9, 0, "x")]), mode="merge")


def test_range_layout_keeps_local_batches_local(spark):
    """The COW quadrant fix: a key-local batch on a range layout touches
    ONE bucket dir of many (hash scatters the same batch everywhere —
    the SCALING.md r11 birthday-math finding)."""
    tmp = tempfile.mkdtemp(prefix="keyed_range_")
    path = f"{tmp}/tab"
    try:
        base = spark.range(100_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v"), F.lit("base").alias("tag")
        )
        write_keyed_table(base, path, ["k"], layout="range", range_step=10_000)
        assert read_keyed_meta(spark, path)["layout"] == "range"
        # backfill one "day": keys 30_000..30_099
        ups = spark.range(30_000, 30_100).select(
            F.col("id").alias("k"), F.lit(-1).cast("long").alias("v"), F.lit("fix").alias("tag")
        )
        diag = upsert_keyed_table(spark, path, ups)
        assert diag["touched_buckets"] == [3] and diag["untouched_buckets"] == 9
        tab = read_keyed_table(spark, path)
        assert tab.filter("tag = 'fix'").count() == 100 and tab.count() == 100_000
        with pytest.raises(ValueError, match="range_step"):
            write_keyed_table(base, f"{tmp}/bad", ["k"], layout="range")
        with pytest.raises(ValueError, match="layout"):
            write_keyed_table(base, f"{tmp}/bad2", ["k"], layout="zorder")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_keyed_upsert_ingest_cdc(spark, tmp_path):
    """CDC drain onto a keyed table: two landing files become two
    micro-batches (maxFilesPerTrigger=1); later batch overrides the
    earlier one's key, deletes tombstone, compact_every bounds the
    pending deltas, and re-draining the same checkpoint is a no-op."""
    from hadoop_20_warehouse_fix_spark.streaming import stream_keyed_upsert_ingest

    path = str(tmp_path / "tab")
    base = spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"), F.lit("base").alias("tag")
    )
    write_keyed_table(base, path, ["k"], num_buckets=8)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    b1 = spark.createDataFrame(
        [(1, -1, "b1", "upsert"), (2, -2, "b1", "upsert"), (3, 0, "b1", "delete")],
        "k long, v long, tag string, op string",
    )
    b2 = spark.createDataFrame(
        [(1, -11, "b2", "upsert"), (2000, 1, "b2", "upsert")],
        "k long, v long, tag string, op string",
    )
    b1.coalesce(1).write.parquet(f"{landing}/f1")
    b2.coalesce(1).write.parquet(f"{landing}/f2")

    def drain():
        sdf = (
            spark.readStream.schema("k long, v long, tag string, op string")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(landing)
        )
        stream_keyed_upsert_ingest(
            sdf, path, str(tmp_path / "ckpt"), op_col="op", compact_every=3
        )

    drain()
    tab = read_keyed_table(spark, path)
    assert tab.count() == 1_000  # -1 delete +1 insert
    got = {(r.k, r.v, r.tag) for r in tab.filter(F.col("k").isin(1, 2, 3, 2000)).collect()}
    # file order within a directory listing is deterministic here
    # (f1 < f2); key 1 must carry the LATER batch's value
    assert got == {(1, -11, "b2"), (2, -2, "b1"), (2000, 1, "b2")}
    # re-drain with the same checkpoint: Spark replays nothing new and
    # the table is unchanged
    drain()
    assert {(r.k, r.v, r.tag) for r in read_keyed_table(spark, path).filter(
        F.col("k").isin(1, 2, 3, 2000)
    ).collect()} == got


def test_cdc_compact_manifest_pruned_read_composition(spark, tmp_path):
    """The round-11 storage seams composed end-to-end: a range-keyed
    table takes a CDC stream (upserts + a tombstone), in-stream
    compaction folds it into the base via COW swaps, the stats
    manifest refreshes incrementally over exactly the swapped bucket
    dirs, and a manifest-pruned range read returns the post-CDC truth
    while skipping most files."""
    from hadoop_20_warehouse_fix_spark.sources.manifest import (
        manifest_kept_files,
        read_pruned,
        refresh_file_stats_manifest,
        write_file_stats_manifest,
    )
    from hadoop_20_warehouse_fix_spark.streaming import stream_keyed_upsert_ingest

    path = str(tmp_path / "ts")
    base = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"), F.lit("base").alias("tag")
    )
    write_keyed_table(base, path, ["k"], layout="range", range_step=10_000)
    mpath = write_file_stats_manifest(spark, path, cols=["k", "v"])

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    spark.createDataFrame(
        [(35_000, -1, "fix", "upsert"), (35_001, -1, "fix", "upsert"), (35_002, 0, "", "delete")],
        "k long, v long, tag string, op string",
    ).coalesce(1).write.parquet(f"{landing}/f1")
    sdf = (
        spark.readStream.schema("k long, v long, tag string, op string")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    stream_keyed_upsert_ingest(sdf, path, str(tmp_path / "ckpt"), op_col="op", compact_every=1)
    assert not os.path.exists(f"{path}/_delta")  # compacted in-stream

    diag = refresh_file_stats_manifest(spark, path)
    # only the one swapped bucket dir (kb=3) changed files
    assert diag["removed"] >= 1 and diag["added"] >= 1 and diag["added"] <= 4

    got = read_pruned(spark, path, {"k": (34_990, 35_010)})
    want = {
        (k, -1 if k in (35_000, 35_001) else k % 97,
         "fix" if k in (35_000, 35_001) else "base")
        for k in range(34_990, 35_011)
        if k != 35_002  # tombstoned
    }
    assert {(r.k, r.v, r.tag) for r in got.select("k", "v", "tag").collect()} == want
    kept, total = manifest_kept_files(spark, mpath, {"k": (34_990, 35_010)})
    assert 0 < len(kept) < total  # the range layout made the skip real


def test_compact_refresh_manifest_flag(spark, tmp_path):
    """compact_keyed_table(refresh_manifest=True) runs the incremental
    manifest refresh over exactly the swapped files when a manifest
    exists, and is a silent no-op when none does."""
    from hadoop_20_warehouse_fix_spark.sources.manifest import (
        read_pruned,
        write_file_stats_manifest,
    )

    path = str(tmp_path / "tab")
    df = spark.range(1_000).select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    write_keyed_table(df, path, ["k"], num_buckets=4)
    ups = spark.createDataFrame([(5, -1)], "k long, v long")
    upsert_keyed_table(spark, path, ups, mode="mor")
    diag = compact_keyed_table(spark, path, refresh_manifest=True)
    assert "manifest" not in diag  # no manifest on the table: no-op
    write_file_stats_manifest(spark, path, cols=["v"])
    upsert_keyed_table(spark, path, spark.createDataFrame([(6, -2)], "k long, v long"), mode="mor")
    diag = compact_keyed_table(spark, path, refresh_manifest=True)
    assert diag["manifest"]["added"] >= 1 and diag["manifest"]["removed"] >= 1
    got = read_pruned(spark, path, {"v": (-2, -1)})
    assert {(r.k, r.v) for r in got.select("k", "v").collect()} == {(5, -1), (6, -2)}


def test_mor_idempotency_key_replay(spark, keyed):
    ups = _ups(spark, [(10, -10, "m")])
    d1 = upsert_keyed_table(spark, keyed, ups, mode="mor", idempotency_key="batch-7")
    d2 = upsert_keyed_table(
        spark, keyed, _ups(spark, [(10, -999, "SHOULD-NOT-LAND")]),
        mode="mor", idempotency_key="batch-7",
    )
    assert "replayed" not in d1 and d2["replayed"] and d2["seq"] == d1["seq"]
    assert read_keyed_table(spark, keyed).filter("k = 10").first().v == -10
    with pytest.raises(ValueError, match="MOR-delta contract"):
        upsert_keyed_table(spark, keyed, ups, idempotency_key="batch-8")
    # round 13: the replay ledger SURVIVES a default compaction (the
    # ingest markers ride into _feed_archive), so a post-compaction
    # replay is detected physically, not just value-idempotent
    compact_keyed_table(spark, keyed)
    d3 = upsert_keyed_table(spark, keyed, ups, mode="mor", idempotency_key="batch-7")
    assert d3.get("replayed") is True and d3["seq"] == d1["seq"]
    assert read_keyed_table(spark, keyed).filter("k = 10").first().v == -10
    # with retention OFF the markers fold away and the replay lands as
    # a NEW delta — value-idempotent (same rows), the pre-r13 seam
    compact_keyed_table(spark, keyed, retain_generations=0)
    d4 = upsert_keyed_table(spark, keyed, ups, mode="mor", idempotency_key="batch-7")
    assert "replayed" not in d4
    assert read_keyed_table(spark, keyed).filter("k = 10").first().v == -10


def test_swap_crash_recovery_never_loses_a_bucket(spark, keyed):
    """Round-11 review (most severe): a crash between rename-aside and
    swap-in leaves _old.kb.<b> as the bucket's ONLY copy; both the
    explicit recovery sweep and the next write must RESTORE it, never
    delete it as leftover."""
    from hadoop_20_warehouse_fix_spark.sources.keyed import recover_keyed_table

    want = {tuple(r) for r in read_keyed_table(spark, keyed).collect()}
    # simulate the crash window: live dir renamed aside, swap-in never
    # happened (pick any populated bucket)
    b = next(int(d.split("=")[1]) for d in os.listdir(keyed) if d.startswith("kb="))
    os.rename(f"{keyed}/kb={b}", f"{keyed}/_old.kb.{b}")
    assert spark.read.parquet(keyed).count() < 10_000  # reads silently miss it
    diag = recover_keyed_table(spark, keyed)
    assert diag["restored"] == [b] and diag["dropped"] == []
    assert {tuple(r) for r in read_keyed_table(spark, keyed).collect()} == want
    # and the in-write recovery path: crash again, then upsert INTO the
    # crashed bucket — _swap_buckets must restore before swapping
    os.rename(f"{keyed}/kb={b}", f"{keyed}/_old.kb.{b}")
    victim_key = spark.read.parquet(f"{keyed}/_old.kb.{b}").first().k
    ups = _ups(spark, [(int(victim_key), -77, "fixed")])
    upsert_keyed_table(spark, keyed, ups)
    got = {tuple(r) for r in read_keyed_table(spark, keyed).collect()}
    assert (victim_key, -77, "fixed") in got and len(got) == 10_000
    # a superseded leftover (live present) is dropped, not restored
    os.makedirs(f"{keyed}/_old.kb.{b}")
    diag = recover_keyed_table(spark, keyed)
    assert diag["dropped"] == [b] and not os.path.exists(f"{keyed}/_old.kb.{b}")


def test_delete_everything_keeps_table_readable(spark):
    """Round-11 review: an all-rows delete removes every bucket dir —
    the table must stay readable (schema from meta) and writable."""
    tmp = tempfile.mkdtemp(prefix="keyed_empty_")
    path = f"{tmp}/tab"
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        write_keyed_table(df, path, ["k"], num_buckets=4)
        delete_from_keyed_table(spark, path, df.select("k"))
        out = read_keyed_table(spark, path)
        assert out.count() == 0 and out.columns == ["k", "v"]
        # MOR ops on the empty table work too (base schema from meta)
        delete_from_keyed_table(spark, path, df.select("k"), mode="mor")
        upsert_keyed_table(
            spark, path, spark.createDataFrame([(9, "z")], "k long, v string"), mode="mor"
        )
        assert [tuple(r) for r in read_keyed_table(spark, path).collect()] == [(9, "z")]
        compact_keyed_table(spark, path)
        assert [tuple(r) for r in read_keyed_table(spark, path).collect()] == [(9, "z")]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_cow_broadcast_cap_falls_back_to_shuffle(spark, keyed, monkeypatch):
    """Round-11 review: past the key cap the COW anti-join must run as
    a plain shuffle (a forced broadcast of a huge backfill fails where
    the shuffle succeeds) — rows identical either way."""
    import hadoop_20_warehouse_fix_spark.sources.keyed as K

    monkeypatch.setattr(K, "COW_BROADCAST_KEY_ROWS", 1)
    ups = _ups(spark, [(11, -11, "s"), (12, -12, "s"), (20_002, 1, "s")])
    upsert_keyed_table(spark, keyed, ups)
    got = {
        (r.k, r.v, r.tag)
        for r in read_keyed_table(spark, keyed).filter(F.col("k").isin(11, 12, 20_002)).collect()
    }
    assert got == {(11, -11, "s"), (12, -12, "s"), (20_002, 1, "s")}


def test_stream_namespace_isolates_checkpoints(spark, tmp_path):
    """Round-11 review: a second pipeline (fresh checkpoint, batch ids
    restart at 0) writing the same table must NOT be swallowed as a
    replay of the first pipeline's batch 0."""
    from hadoop_20_warehouse_fix_spark.sources.keyed import _delta_seq_dirs
    from hadoop_20_warehouse_fix_spark.streaming import stream_keyed_upsert_ingest

    path = str(tmp_path / "tab")
    write_keyed_table(
        spark.createDataFrame([(1, 0)], "k long, v long"), path, ["k"], num_buckets=4
    )
    land1, land2 = str(tmp_path / "l1"), str(tmp_path / "l2")
    spark.createDataFrame([(10, 1)], "k long, v long").coalesce(1).write.parquet(land1)
    spark.createDataFrame([(20, 2)], "k long, v long").coalesce(1).write.parquet(land2)
    for i, land in enumerate((land1, land2)):
        sdf = spark.readStream.schema("k long, v long").parquet(land)
        stream_keyed_upsert_ingest(sdf, path, str(tmp_path / f"ckpt{i}"))
    assert len(_delta_seq_dirs(spark, path)) == 2  # neither swallowed
    assert {tuple(r) for r in read_keyed_table(spark, path).collect()} == {
        (1, 0), (10, 1), (20, 2),
    }


def test_sort_cols_preserved_through_cow_and_compact(spark, tmp_path):
    """sort_cols orders rows within every bucket file (row-group
    min/max pruning on the sort key) — and the order must survive COW
    rewrites AND compaction, not just the initial load."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "tab")
    df = spark.range(40_000).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("ts"),
        F.lit("x").alias("tag"),
    )
    write_keyed_table(df, path, ["k"], num_buckets=4, sort_cols=["ts"])

    def assert_sorted_files():
        for d in os.listdir(path):
            if not d.startswith(f"{BUCKET_COL}="):
                continue
            for f in os.listdir(os.path.join(path, d)):
                if not f.endswith(".parquet"):
                    continue
                ts = pq.read_table(os.path.join(path, d, f), columns=["ts"])["ts"].to_pylist()
                assert ts == sorted(ts), f"{d}/{f} not ts-sorted"

    assert_sorted_files()
    ups = spark.createDataFrame([(5, 12345, "u"), (17, 1, "u")], "k long, ts long, tag string")
    upsert_keyed_table(spark, path, ups)  # COW rewrite of touched buckets
    assert_sorted_files()
    upsert_keyed_table(
        spark, path,
        spark.createDataFrame([(6, 99, "m")], "k long, ts long, tag string"),
        mode="mor",
    )
    compact_keyed_table(spark, path)
    assert_sorted_files()
    assert read_keyed_table(spark, path).count() == 40_000
    with pytest.raises(ValueError, match="sort columns"):
        write_keyed_table(df, str(tmp_path / "bad"), ["k"], sort_cols=["nope"])


def test_lookup_keys_point_reads(spark, keyed):
    """MapFile.get() analog: literal keys resolve driver-side to bucket
    dirs, honor pending MOR overrides and tombstones, and miss cleanly."""
    from hadoop_20_warehouse_fix_spark.sources.keyed import lookup_keys

    upsert_keyed_table(spark, keyed, _ups(spark, [(42, -42, "m")]), mode="mor")
    delete_from_keyed_table(
        spark, keyed, spark.createDataFrame([(43,)], "k long"), mode="mor"
    )
    got = {(r.k, r.v, r.tag) for r in lookup_keys(spark, keyed, [42, 43, 44, 99_999]).collect()}
    assert got == {(42, -42, "m"), (44, 88, "base")}  # 43 tombstoned, 99999 absent
    # DataFrame form agrees
    kdf = spark.createDataFrame([(42,), (43,), (44,)], "k long")
    got_df = {(r.k, r.v, r.tag) for r in lookup_keys(spark, keyed, kdf).collect()}
    assert got_df == {(42, -42, "m"), (44, 88, "base")}
    assert lookup_keys(spark, keyed, []).count() == 0
    import pytest as _pt

    with _pt.raises(ValueError, match="max_literal_keys"):
        lookup_keys(spark, keyed, list(range(50)), max_literal_keys=10)
    with _pt.raises(ValueError, match="component"):
        lookup_keys(spark, keyed, [(1, 2)])
    with _pt.raises(ValueError, match="lacks key columns"):
        lookup_keys(spark, keyed, kdf.withColumnRenamed("k", "x"))


def test_lookup_keys_prunes_directories_range_layout(spark, tmp_path):
    """On a range layout with no deltas, a literal lookup must only
    open files under the keys' bucket dirs (behavioral pruning proof,
    driver-side bucket math incl. the div-vs-floor negative edge)."""
    from hadoop_20_warehouse_fix_spark.sources.keyed import lookup_keys

    path = str(tmp_path / "tab")
    df = spark.range(-5_000, 45_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    # rename protocol: the kb=<b> path assertion below is its layout
    write_keyed_table(
        df, path, ["k"], layout="range", range_step=10_000, commit="rename"
    )
    out = lookup_keys(spark, path, [-4_999, 12_345])
    assert {(r.k, r.v) for r in out.collect()} == {(-4_999, -14_997), (12_345, 37_035)}
    files = {
        r.f for r in out.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files and all("/kb=0/" in f or "/kb=1/" in f for f in files), files
    # composite-key literal form on a hash layout
    path2 = str(tmp_path / "tab2")
    df2 = spark.range(1_000).select(
        (F.col("id") % 10).alias("a"), (F.col("id") / 10).cast("long").alias("b"),
        F.col("id").alias("v"),
    )
    write_keyed_table(df2, path2, ["a", "b"], num_buckets=8)
    got = lookup_keys(spark, path2, [(3, 7), (9, 99)]).collect()
    assert {(r.a, r.b, r.v) for r in got} == {(3, 7, 73), (9, 99, 999)}


def test_lookup_keys_casts_to_table_key_types(spark, tmp_path):
    """Second-pass review pin: xxhash64 is TYPE-sensitive — an
    int-keyed table probed with long keys hashes to the wrong bucket
    and silently reports the key absent. Both key forms must cast to
    the table's key schema first."""
    from hadoop_20_warehouse_fix_spark.sources.keyed import lookup_keys

    path = str(tmp_path / "tab")
    df = spark.range(1_000).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_keyed_table(df, path, ["k"], num_buckets=16)
    got = lookup_keys(spark, path, [42, 999])  # python ints -> long by default
    assert {(r.k, r.v) for r in got.collect()} == {(42, 84), (999, 1998)}
    kdf = spark.createDataFrame([(42,)], "k long")  # deliberately long-typed
    assert [(r.k, r.v) for r in lookup_keys(spark, path, kdf).collect()] == [(42, 84)]


def test_manifest_refresh_crash_recovery(spark, tmp_path):
    """Second-pass review pin: a crash between the refresh's two swap
    renames leaves __next complete and the live dir missing — the next
    refresh must recover by ONE rename, not a full rebuild."""
    from hadoop_20_warehouse_fix_spark.sources.manifest import (
        refresh_file_stats_manifest,
        write_file_stats_manifest,
    )

    path = str(tmp_path / "t")
    spark.range(1_000).select((F.col("id") % 50).alias("v")).coalesce(2).write.parquet(path)
    mpath = write_file_stats_manifest(spark, path)
    # need one real refresh first so file sets match the manifest
    spark.range(10).select((F.col("id") + 500).alias("v")).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    refresh_file_stats_manifest(spark, path)
    # simulate the crash window: live renamed away, __next holds the
    # complete manifest
    os.rename(mpath, f"{mpath}__next")
    diag = refresh_file_stats_manifest(spark, path)
    assert diag == {"added": 0, "removed": 0, "kept": 3, "total": 3}  # recovered, no rebuild
    assert os.path.isdir(mpath) and not os.path.exists(f"{mpath}__next")


def test_read_plan_shapes(spark, keyed):
    """Plan discipline: with no deltas the keyed read is ONE file scan
    and ZERO exchanges (a plain base scan, no resolution machinery);
    with pending deltas the broadcast path adds no base shuffle —
    exchanges stay zero, the only join is the broadcast anti."""
    from hadoop_20_warehouse_fix_spark.plans.inspect import plan_summary

    s = plan_summary(read_keyed_table(spark, keyed))
    assert s.num_file_scans == 1 and s.num_exchanges == 0 and s.num_broadcast_joins == 0
    upsert_keyed_table(spark, keyed, _ups(spark, [(1, -1, "m")]), mode="mor")
    s2 = plan_summary(read_keyed_table(spark, keyed))
    # base anti-join must be BROADCAST (an SMJ would mean the base got
    # shuffled); the only exchanges allowed are the two DELTA-sized
    # ones (distinct keys + winner resolution)
    assert s2.num_broadcast_joins >= 1 and s2.num_sortmerge_joins == 0
    assert s2.num_exchanges <= 2, "extra exchange implies the base was shuffled"


def test_initial_load_uniqueness_and_reserved_col(spark):
    tmp = tempfile.mkdtemp(prefix="keyed_uni_")
    try:
        dup = spark.createDataFrame([(1, "x"), (1, "y")], "k long, v string")
        with pytest.raises(ValueError, match="duplicate keys"):
            write_keyed_table(dup, f"{tmp}/t1", ["k"])
        bad = dup.withColumnRenamed("v", BUCKET_COL)
        with pytest.raises(ValueError, match="reserved"):
            write_keyed_table(bad, f"{tmp}/t2", ["k"])
        with pytest.raises(ValueError, match="not in DataFrame"):
            write_keyed_table(dup, f"{tmp}/t3", ["zzz"])
        # NULL key components can never be overridden or deleted
        # (anti-joins never equi-match NULL) — refused up front
        nullk = spark.createDataFrame([(1, "x"), (None, "y")], "k long, v string")
        with pytest.raises(ValueError, match="NULL key"):
            write_keyed_table(nullk, f"{tmp}/t4", ["k"])
        # range layout demands an integral leading key (a string would
        # CAST to NULL and land in a hive-default bucket)
        skey = spark.createDataFrame([("a", 1)], "k string, v long")
        with pytest.raises(ValueError, match="integral leading key"):
            write_keyed_table(skey, f"{tmp}/t5", ["k"], layout="range", range_step=10)
        # 'seq' collides with the MOR delta partition column
        seqcol = spark.createDataFrame([(1, 2)], "k long, seq long")
        with pytest.raises(ValueError, match="reserved"):
            write_keyed_table(seqcol, f"{tmp}/t6", ["k"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_hash_layout_refuses_nonpositive_buckets(spark):
    # num_buckets=0 would make pmod(xxhash64, 0) NULL — every row in a
    # __HIVE_DEFAULT_PARTITION__ dir the swap machinery never touches
    # (round-11 ADVICE #1).
    df = spark.createDataFrame([(1, "x")], "k long, v string")
    tmp = tempfile.mkdtemp(prefix="keyed_nb_")
    try:
        with pytest.raises(ValueError, match="num_buckets >= 1"):
            write_keyed_table(df, f"{tmp}/t", ["k"], num_buckets=0)
        with pytest.raises(ValueError, match="num_buckets >= 1"):
            write_keyed_table(df, f"{tmp}/t", ["k"], num_buckets=-3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_mor_append_recovers_crashed_cow_swap_first(spark, keyed):
    # Round-11 ADVICE #2: a bucket stranded at _old.kb.<b> by a crashed
    # COW swap must be restored by the NEXT writer, whichever kind. A
    # MOR append that skipped the sweep would leave base∪delta reads
    # silently missing the bucket until a COW batch or compaction ran.
    some = os.path.join(keyed, f"{BUCKET_COL}=3")
    stranded = os.path.join(keyed, f"_old.{BUCKET_COL}.3")
    os.rename(some, stranded)  # simulate the crash window
    # round 13: READERS now fall back to the stranded aside (snapshot
    # probe in _base_df) — the crash window no longer loses rows even
    # before a writer sweeps
    assert read_keyed_table(spark, keyed).count() == 10_000
    batch = spark.createDataFrame([(20_001, 42, "new")], "k long, v long, tag string")
    upsert_keyed_table(spark, keyed, batch, mode="mor")
    assert not os.path.exists(stranded)  # the WRITER still sweeps it
    assert read_keyed_table(spark, keyed).count() == 10_001


def test_registered_storage_queries_plan_shapes(spark):
    """The round-12 registered storage queries keep the storage layer's
    plan discipline at the registered scale: the MOR-resolved read
    behind keyed_upsert_mor_read never shuffles the base (broadcast
    anti only, delta-sized exchanges), and manifest_pruned_read's scan
    enumerates only manifest-kept files."""
    from hadoop_20_warehouse_fix_spark.plans.inspect import plan_summary
    from hadoop_20_warehouse_fix_spark.queries import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    df = reg["keyed_upsert_mor_read"].fn(spark, sf)
    s = plan_summary(df)
    assert s.num_broadcast_joins >= 1 and s.num_sortmerge_joins == 0
    assert s.num_exchanges <= 2, "extra exchange implies the base was shuffled"

    # sf0.01 for the pruned read: the registered box predicate is
    # empty at sf0.001 (orderkeys stop at ~1500), which would collapse
    # the plan to a LocalTableScan and pin nothing
    pruned = reg["manifest_pruned_read"].fn(spark, "/root/testdata/sf0.01")
    # the kept-file scan is a single parquet scan, no exchange
    s2 = plan_summary(pruned)
    assert s2.num_file_scans == 1 and s2.num_exchanges == 0
    assert pruned.count() > 0


def test_writer_lease_refuses_second_writer_and_recovers_stale(spark, keyed):
    """Round-12 brief #3: keyed tables are single-writer by contract —
    a live lease makes a second writer REFUSE with a clear error; a
    stale lease (crashed holder, past TTL) is broken and the write
    proceeds; a completed write leaves no lease behind."""
    import json
    import time

    from hadoop_20_warehouse_fix_spark.sources.keyed import (
        KeyedTableLockedError,
        _WRITER_LOCK,
    )

    lock = os.path.join(keyed, _WRITER_LOCK)
    batch = spark.createDataFrame([(1, -5, "w")], "k long, v long, tag string")

    # simulate a live concurrent writer
    with open(lock, "w") as f:
        json.dump({"host": "other", "pid": 999, "acquired_unix": time.time()}, f)
    with pytest.raises(KeyedTableLockedError, match="locked by another writer"):
        upsert_keyed_table(spark, keyed, batch, mode="mor")
    with pytest.raises(KeyedTableLockedError):
        upsert_keyed_table(spark, keyed, batch, mode="cow")
    with pytest.raises(KeyedTableLockedError):
        compact_keyed_table(spark, keyed)
    with pytest.raises(KeyedTableLockedError):
        delete_from_keyed_table(spark, keyed, batch.select("k"), mode="mor")
    base = spark.range(5).select(F.col("id").alias("k"), F.lit(0).alias("v"), F.lit("x").alias("tag"))
    with pytest.raises(KeyedTableLockedError):
        write_keyed_table(base, keyed, ["k"], num_buckets=4)

    # stale lease: holder presumed crashed once past the TTL
    old = time.time() - 120
    os.utime(lock, (old, old))
    out = upsert_keyed_table(spark, keyed, batch, mode="mor", lock_ttl_sec=60)
    assert out["mode"] == "mor"
    assert not os.path.exists(lock), "lease must be released after the write"
    assert read_keyed_table(spark, keyed).filter("k = 1").first().v == -5


def test_initial_load_keeps_root_and_replaces_state(spark, keyed):
    """Round-12: the initial load writes via _staging + rename-in, so a
    re-load of an existing table replaces buckets/deltas/meta without
    deleting the root dir (where the writer lease lives)."""
    batch = spark.createDataFrame([(7, 0, "d")], "k long, v long, tag string")
    upsert_keyed_table(spark, keyed, batch, mode="mor")  # pending delta
    fresh = spark.range(100).select(
        F.col("id").alias("kk"), (F.col("id") + 1).alias("vv")
    )
    write_keyed_table(fresh, keyed, ["kk"], num_buckets=4)
    got = read_keyed_table(spark, keyed)
    assert got.columns == ["kk", "vv"] and got.count() == 100
    assert not os.path.exists(os.path.join(keyed, "_delta")), "old deltas cleared"
    assert not os.path.exists(os.path.join(keyed, "_staging"))


def test_apply_changes_mixed_batch_single_delta(spark, keyed):
    """Round-12 brief #5: a mixed CDC batch (upserts + tombstones)
    lands as ONE delta seq dir; the resolved read honors both; empty
    batches commit nothing; duplicate / NULL / delete+upsert-of-one-key
    batches refuse; replay by idempotency key is a no-op."""
    from hadoop_20_warehouse_fix_spark.sources.keyed import (
        _delta_seq_dirs,
        apply_changes_keyed_table,
    )

    chg = spark.createDataFrame(
        [(1, 111, "u", None), (2, None, None, "delete"), (20_001, 5, "new", "upsert")],
        "k long, v long, tag string, op string",
    )
    out = apply_changes_keyed_table(spark, keyed, chg, op_col="op")
    assert (out["rows"], out["deletes"], out["upserts"]) == (3, 1, 2)
    assert len(_delta_seq_dirs(spark, keyed)) == 1, "one mixed delta, not two"
    got = {r.k: (r.v, r.tag) for r in read_keyed_table(spark, keyed).filter(
        F.col("k").isin(1, 2, 20_001)).collect()}
    assert got == {1: (111, "u"), 20_001: (5, "new")}
    assert read_keyed_table(spark, keyed).count() == 10_000  # -1 del +1 ins

    # replay: same idempotency key is swallowed
    first = apply_changes_keyed_table(
        spark, keyed, chg, op_col="op", idempotency_key="cdc-b7"
    )
    again = apply_changes_keyed_table(
        spark, keyed, chg, op_col="op", idempotency_key="cdc-b7"
    )
    assert again.get("replayed") and again["seq"] == first["seq"]
    assert len(_delta_seq_dirs(spark, keyed)) == 2

    # empty batch: no delta written
    none = apply_changes_keyed_table(spark, keyed, chg.limit(0), op_col="op")
    assert none["rows"] == 0 and none["seq"] is None
    assert len(_delta_seq_dirs(spark, keyed)) == 2

    # the three refusals
    dup = spark.createDataFrame(
        [(9, 1, "a", None), (9, None, None, "delete")],
        "k long, v long, tag string, op string",
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        apply_changes_keyed_table(spark, keyed, dup, op_col="op")
    nullk = spark.createDataFrame(
        [(None, 1, "a", None)], "k long, v long, tag string, op string"
    )
    with pytest.raises(ValueError, match="NULL key"):
        apply_changes_keyed_table(spark, keyed, nullk, op_col="op")
    with pytest.raises(ValueError, match="change batch columns"):
        apply_changes_keyed_table(spark, keyed, chg.drop("tag"), op_col="op")

    # without op_col: pure upsert, still one aggregate + one write
    ups = spark.createDataFrame([(3, 333, "x")], "k long, v long, tag string")
    out2 = apply_changes_keyed_table(spark, keyed, ups)
    assert out2["deletes"] == 0 and out2["upserts"] == 1
    assert read_keyed_table(spark, keyed).filter("k = 3").first().v == 333


def test_read_keyed_changes_feed(spark, keyed):
    """Round-12 change feed: committed deltas since a checkpointed seq,
    resolved (net per key) or raw (audit log); compaction retires the
    window and a stale checkpoint raises toward re-sync."""
    from hadoop_20_warehouse_fix_spark.sources.keyed import (
        apply_changes_keyed_table,
        read_keyed_changes,
    )

    assert read_keyed_changes(spark, keyed).count() == 0  # no deltas yet
    upsert_keyed_table(
        spark, keyed,
        spark.createDataFrame([(1, 10, "a"), (2, 20, "a")], "k long, v long, tag string"),
        mode="mor",
    )
    chg = spark.createDataFrame(
        [(1, 11, "b", None), (3, None, None, "delete")],
        "k long, v long, tag string, op string",
    )
    apply_changes_keyed_table(spark, keyed, chg, op_col="op")

    raw = read_keyed_changes(spark, keyed, resolve=False)
    assert raw.count() == 4
    assert set(raw.columns) == {"k", "v", "tag", "_change_op", "_seq"}

    net = {r.k: (r.v, r._change_op, r._seq)
           for r in read_keyed_changes(spark, keyed).collect()}
    assert net == {1: (11, "upsert", 2), 2: (20, "upsert", 1), 3: (None, "delete", 2)}

    # consumer checkpointed seq 1: only the second batch comes back
    late = {r.k for r in read_keyed_changes(spark, keyed, since_seq=1).collect()}
    assert late == {1, 3}
    # checkpoint at head: empty feed, schema intact
    head = read_keyed_changes(spark, keyed, since_seq=2)
    assert head.count() == 0 and "_change_op" in head.columns

    # retention OFF (pre-r13 semantics): folding drops the history —
    # seq numbering stays monotonic (the hwm file), a head checkpoint
    # stays valid, a stale one raises toward re-sync instead of
    # silently aliasing post-compaction batches. (With the default
    # retain_generations=1 the archive would SERVE the stale
    # checkpoint instead — pinned in tests/test_keyed_retention.py.)
    compact_keyed_table(spark, keyed, retain_generations=0)
    assert read_keyed_changes(spark, keyed, since_seq=2).count() == 0
    with pytest.raises(ValueError, match="compacted into the base"):
        read_keyed_changes(spark, keyed, since_seq=0)
    upsert_keyed_table(
        spark, keyed,
        spark.createDataFrame([(9, 99, "c")], "k long, v long, tag string"),
        mode="mor",
    )
    nxt = read_keyed_changes(spark, keyed, since_seq=2).collect()
    assert len(nxt) == 1 and nxt[0]._seq == 3, "seq continues past compaction"
    with pytest.raises(ValueError, match="compacted into the base"):
        read_keyed_changes(spark, keyed, since_seq=1)


def test_legacy_unmarked_delta_dirs_stay_visible(spark, keyed):
    """Round-12 review: pre-round-12 rename-protocol tables carry no
    _COMMITTED markers (the rename WAS the commit) — their pending
    deltas must stay visible, and the next append must take a fresh
    seq instead of renaming onto the legacy dir."""
    from hadoop_20_warehouse_fix_spark.sources.keyed import _COMMITTED_MARK

    upsert_keyed_table(spark, keyed, _ups(spark, [(1, -1, "legacy")]), mode="mor")
    marker = os.path.join(keyed, "_delta", "seq=1", _COMMITTED_MARK)
    os.remove(marker)  # simulate the old on-disk format
    assert read_keyed_table(spark, keyed).filter("k = 1").first().v == -1
    out = upsert_keyed_table(spark, keyed, _ups(spark, [(2, -2, "new")]), mode="mor")
    assert out["seq"] == 2, "legacy dir counted; its seq not reused"
    got = read_keyed_table(spark, keyed)
    assert got.filter("k = 1").first().v == -1 and got.filter("k = 2").first().v == -2
    assert compact_keyed_table(spark, keyed)["deltas_folded"] == 2


def test_change_feed_empty_window_column_order(spark, tmp_path):
    """The empty-window frame must match the non-empty frame's column
    order (round-12 review: a positional union across feed polls would
    misalign when the key column is not the leading data column)."""
    from hadoop_20_warehouse_fix_spark.sources.keyed import (
        read_keyed_changes,
        write_keyed_table,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(10, 1), (20, 2)], "v long, k long")  # key NOT leading
    write_keyed_table(df, path, ["k"], num_buckets=2)
    empty = read_keyed_changes(spark, path)
    upsert_keyed_table(spark, path, spark.createDataFrame([(11, 1)], "v long, k long"), mode="mor")
    full = read_keyed_changes(spark, path)
    assert empty.columns == full.columns == ["k", "v", "_change_op", "_seq"]
    raw_empty_cols = read_keyed_changes(spark, path, since_seq=1, resolve=False).columns
    raw_cols = read_keyed_changes(spark, path, resolve=False).columns
    assert raw_empty_cols == raw_cols == ["v", "k", "_change_op", "_seq"]


def test_cow_refuses_null_bucket_rows_even_assume_unique(spark, tmp_path):
    """Second review pass: on a range layout a NULL leading key under
    assume_unique used to slip past the key checks into a bucket id of
    NULL — collect_set dropped it from `touched` and the row silently
    vanished into a staging dir the swap never moves. Refuse loudly."""
    path = str(tmp_path / "t")
    df = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    write_keyed_table(df, path, ["k"], layout="range", range_step=10)
    bad = spark.createDataFrame([(None, 5), (3, 7)], "k long, v long")
    with pytest.raises(ValueError, match="NULL"):
        upsert_keyed_table(spark, path, bad, assume_unique=True)
    with pytest.raises(ValueError, match="NULL"):
        upsert_keyed_table(spark, path, bad)  # checked path still refuses
    assert read_keyed_table(spark, path).count() == 100


def test_rename_reload_keeps_hwm_and_feed_contract(spark, keyed):
    """A rename-protocol re-load keeps seq numbering monotonic (hwm
    survives, delta_floor retires the old generation's pending deltas)
    so change-feed checkpoints from before the re-load raise toward
    re-sync instead of aliasing."""
    from hadoop_20_warehouse_fix_spark.sources.keyed import read_keyed_changes

    upsert_keyed_table(spark, keyed, _ups(spark, [(1, -1, "d1")]), mode="mor")
    upsert_keyed_table(spark, keyed, _ups(spark, [(2, -2, "d2")]), mode="mor")
    fresh = spark.range(10).select(
        F.col("id").alias("k"), F.lit(0).alias("v"), F.lit("g2").alias("tag")
    )
    write_keyed_table(fresh, keyed, ["k"], num_buckets=2)
    assert read_keyed_table(spark, keyed).count() == 10
    out = upsert_keyed_table(spark, keyed, _ups(spark, [(5, 55, "n")]), mode="mor")
    assert out["seq"] == 3, "seqs continue past the retired generation"
    nxt = read_keyed_changes(spark, keyed, since_seq=2).collect()
    assert len(nxt) == 1 and nxt[0]._seq == 3
    with pytest.raises(ValueError, match="compacted into the base"):
        read_keyed_changes(spark, keyed, since_seq=1)


def test_schema_evolution_additive_mor(spark, keyed):
    """Round-12 schema evolution: a MOR batch carries a NEW column —
    the schema evolves atomically before the delta commits, old rows
    read the column as NULL (explicit-schema readers), compaction folds
    the evolved schema into the touched buckets, COW batches then carry
    the full evolved set, and the change feed sees the column."""
    from hadoop_20_warehouse_fix_spark.sources.keyed import (
        apply_changes_keyed_table,
        read_keyed_changes,
    )

    wide = spark.createDataFrame(
        [(1, 111, "e", 0.5), (20_001, 1, "ins", 0.9)],
        "k long, v long, tag string, score double",
    )
    # refused without the flag...
    with pytest.raises(ValueError, match="evolve_schema"):
        apply_changes_keyed_table(spark, keyed, wide)
    with pytest.raises(ValueError, match="MOR contract"):
        upsert_keyed_table(spark, keyed, wide, mode="cow", evolve_schema=True)
    # ...and additive-only: dropping an existing column stays an error
    with pytest.raises(ValueError, match="ADDITIVE"):
        apply_changes_keyed_table(
            spark, keyed, wide.drop("tag"), evolve_schema=True
        )
    out = apply_changes_keyed_table(spark, keyed, wide, evolve_schema=True)
    assert out["upserts"] == 2
    meta = read_keyed_meta(spark, keyed)
    assert meta["data_cols"] == ["k", "v", "tag", "score"]
    tab = read_keyed_table(spark, keyed)
    assert tab.columns == ["k", "v", "tag", "score"]
    got = {r.k: (r.v, r.score) for r in tab.filter(F.col("k").isin(1, 2, 20_001)).collect()}
    assert got == {1: (111, 0.5), 2: (4, None), 20_001: (1, 0.9)}
    # the feed carries the evolved column too
    feed = {r.k: r.score for r in read_keyed_changes(spark, keyed).collect()}
    assert feed == {1: 0.5, 20_001: 0.9}
    # compaction folds the evolved schema into the base
    compact_keyed_table(spark, keyed)
    base_only = read_keyed_table(spark, keyed)
    assert base_only.filter("k = 1").first().score == 0.5
    assert base_only.count() == 10_001
    # lookups resolve evolved + old rows
    from hadoop_20_warehouse_fix_spark.sources.keyed import lookup_keys

    look = {r.k: r.score for r in lookup_keys(spark, keyed, [1, 2]).collect()}
    assert look == {1: 0.5, 2: None}
    # COW now requires (and writes) the full evolved set
    cow = spark.createDataFrame([(2, 222, "c", 1.5)], "k long, v long, tag string, score double")
    upsert_keyed_table(spark, keyed, cow, mode="cow")
    assert read_keyed_table(spark, keyed).filter("k = 2").first().score == 1.5


def test_schema_evolution_crash_window_reads_null(spark, keyed, monkeypatch):
    """Crash between the meta evolution and the delta commit: the
    evolved column exists and reads NULL everywhere — never a broken
    read; the retried batch lands normally."""
    from hadoop_20_warehouse_fix_spark.sources import keyed as K
    from hadoop_20_warehouse_fix_spark.sources.keyed import (
        apply_changes_keyed_table,
    )

    wide = spark.createDataFrame([(3, 333, "e", 7)], "k long, v long, tag string, n int")
    real = K._commit_delta

    def boom(*a, **kw):
        raise RuntimeError("crash after evolve, before delta")

    monkeypatch.setattr(K, "_commit_delta", boom)
    with pytest.raises(RuntimeError):
        apply_changes_keyed_table(spark, keyed, wide, evolve_schema=True)
    tab = read_keyed_table(spark, keyed)
    assert "n" in tab.columns and tab.filter("n is not null").count() == 0
    monkeypatch.setattr(K, "_commit_delta", real)
    apply_changes_keyed_table(spark, keyed, wide, evolve_schema=True)
    assert read_keyed_table(spark, keyed).filter("k = 3").first().n == 7


def test_stream_ingest_sequence_col_coalesces_files(spark, tmp_path):
    """Round-13 micro-batch coalescing: maxFilesPerTrigger=4 folds four
    landing files into ONE micro-batch whose keys collide across files;
    sequence_col resolves latest-change-per-key (Delta's SEQUENCE BY)
    before the append, so the uniqueness contract holds and the final
    table equals the sequential application of the four files."""
    from hadoop_20_warehouse_fix_spark.streaming import stream_keyed_upsert_ingest

    path = str(tmp_path / "tab")
    base = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"), F.lit("base").alias("tag")
    )
    write_keyed_table(base, path, ["k"], num_buckets=4)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    # key 1 is touched by THREE files (upsert, delete, re-upsert);
    # key 2 by two (upsert then delete) — only sequence order decides
    files = [
        [(1, -1, "f0", "upsert", 0), (2, -2, "f0", "upsert", 0)],
        [(1, 0, "f1", "delete", 1), (3, -3, "f1", "upsert", 1)],
        [(1, -111, "f2", "upsert", 2), (2, 0, "f2", "delete", 2)],
        [(4, -4, "f3", "upsert", 3)],
    ]
    for i, rows in enumerate(files):
        spark.createDataFrame(
            rows, "k long, v long, tag string, op string, cdc_seq long"
        ).coalesce(1).write.parquet(f"{landing}/f{i}")

    sdf = (
        spark.readStream.schema("k long, v long, tag string, op string, cdc_seq long")
        .option("maxFilesPerTrigger", 4)
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    stream_keyed_upsert_ingest(
        sdf, path, str(tmp_path / "ckpt"), op_col="op", sequence_col="cdc_seq"
    )
    tab = read_keyed_table(spark, path)
    got = {(r.k, r.v, r.tag) for r in tab.filter(F.col("k").isin(1, 2, 3, 4)).collect()}
    # k=1 re-upserted after its delete; k=2 deleted last; 3,4 inserted
    assert got == {(1, -111, "f2"), (3, -3, "f1"), (4, -4, "f3")}
    # keys 1-4 all pre-exist in the 100-row base; only k=2 ends deleted
    assert tab.count() == 99


def test_stream_ingest_without_sequence_col_refuses_cross_file_dupes(spark, tmp_path):
    """Without sequence_col the one-op-per-key contract stays enforced:
    coalescing files that touch the same key fails loudly instead of
    picking an arbitrary winner."""
    from hadoop_20_warehouse_fix_spark.streaming import stream_keyed_upsert_ingest

    path = str(tmp_path / "tab")
    base = spark.range(10).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v"), F.lit("b").alias("tag")
    )
    write_keyed_table(base, path, ["k"], num_buckets=2)
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i in range(2):
        spark.createDataFrame(
            [(1, -i, f"f{i}", "upsert")], "k long, v long, tag string, op string"
        ).coalesce(1).write.parquet(f"{landing}/f{i}")
    sdf = (
        spark.readStream.schema("k long, v long, tag string, op string")
        .option("maxFilesPerTrigger", 2)
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    import pyspark.errors

    with pytest.raises(pyspark.errors.exceptions.captured.StreamingQueryException,
                       match="duplicate keys"):
        stream_keyed_upsert_ingest(sdf, path, str(tmp_path / "ckpt"), op_col="op")
