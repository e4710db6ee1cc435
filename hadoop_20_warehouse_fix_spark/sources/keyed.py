"""Keyed tables: bucket-pruned copy-on-write upsert / delete (round 11).

The reference's mutable-state story is MapFile merge — rewrite the
sorted file with the new keys folded in (``C/io/MapFile.java``), and
the engine already exposes that semantics relationally as
``operators.joins.override_join`` (rightmost wins). What a 100 TB
warehouse needs on top is the STORAGE form: apply a small batch of
upserts/deletes to a huge table without rewriting the table.

Layout: plain parquet partitioned by a derived hash bucket
``kb = pmod(xxhash64(key_cols), num_buckets)`` — one directory per
bucket, Spark partition pruning on ``kb`` is directory pruning. An
upsert batch touches ``|distinct kb(updates)| ≤ num_buckets`` buckets;
copy-on-write rewrites ONLY those directories and leaves every other
file physically untouched (pytest pins untouched-file identity). At
100 TB / 4096 buckets, a point-update batch rewrites ~1/4096th of the
table per touched bucket, not the table.

Crash story (same honesty as ``dedup.minhash_state_compact``): the
swap is per-bucket rename-aside — merged data lands in a hidden
``_staging`` dir, then per bucket: live dir → ``_old.kb=<b>``, staged
dir → live, delete old. No multi-bucket transaction exists on a plain
filesystem: a crash mid-swap leaves SOME buckets new and some old
(readers never see a half-bucket — renames are atomic per directory on
HDFS/local — but cross-bucket consistency needs the recovery sweep:
``_staging``/``_old.*`` present ⇒ finish or roll back by rename).
Engines that need multi-writer transactions layer a log on top
(Delta/Iceberg); this is the bucket-granular COW those logs commit.

Key uniqueness is the table's contract (it is a keyed table): the
initial write and every batch refuse duplicate keys unless the caller
passes ``assume_unique=True`` (bulk loads that already proved it — the
check is one groupBy over the written side, cheap for batches, a full
pass for the initial load).
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "kb"
_META = "_keyed_meta.json"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    fs, hpath, jvm = _fs(spark, f"{path}/{_META}")
    out = fs.create(hpath, True)
    out.write(bytearray(json.dumps(meta).encode()))
    out.close()


def read_keyed_meta(spark: SparkSession, path: str) -> dict:
    fs, hpath, jvm = _fs(spark, f"{path}/{_META}")
    if not fs.exists(hpath):
        raise ValueError(f"{path!r} is not a keyed table (no {_META})")
    stream = fs.open(hpath)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode())


def _bucket_expr(key_cols: Sequence[str], num_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(num_buckets)).cast("int")


def _check_unique(df: DataFrame, key_cols: Sequence[str], what: str) -> None:
    dup = df.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError(
            f"{what} has duplicate keys on {list(key_cols)} — a keyed table is "
            "key-unique by contract; dedupe first (exact_dedup_rows / override_join) "
            "or pass assume_unique=True if uniqueness is already proven"
        )


def write_keyed_table(
    df: DataFrame,
    path: str,
    key_cols: Sequence[str],
    num_buckets: int = 64,
    assume_unique: bool = False,
) -> None:
    """Initial load of a keyed table: hash-bucket directory layout +
    layout metadata, so every later batch derives the same bucketing."""
    key_cols = list(key_cols)
    missing = [c for c in key_cols if c not in df.columns]
    if missing:
        raise ValueError(f"key columns {missing} not in DataFrame")
    if BUCKET_COL in df.columns:
        raise ValueError(f"{BUCKET_COL!r} is reserved for the bucket layout")
    if not assume_unique:
        _check_unique(df, key_cols, "initial load")
    spark = df.sparkSession
    out = df.withColumn(BUCKET_COL, _bucket_expr(key_cols, num_buckets))
    # One shuffle keyed exactly like the layout: each writer task owns
    # whole buckets, so a bucket directory is ~one file, not one file
    # per (task, bucket) pair.
    (
        out.repartition(num_buckets, BUCKET_COL)
        .write.partitionBy(BUCKET_COL)
        .mode("overwrite")
        .parquet(path)
    )
    _write_meta(
        spark,
        path,
        {"key_cols": key_cols, "num_buckets": num_buckets, "data_cols": [c for c in df.columns]},
    )


def read_keyed_table(spark: SparkSession, path: str) -> DataFrame:
    """The table's data columns (the bucket column stays internal)."""
    meta = read_keyed_meta(spark, path)
    return spark.read.parquet(path).select(*meta["data_cols"])


def _swap_buckets(spark: SparkSession, path: str, staging: str, buckets: list[int]) -> None:
    fs, root, jvm = _fs(spark, path)
    Path = jvm.org.apache.hadoop.fs.Path
    for b in buckets:
        live = Path(f"{path}/{BUCKET_COL}={b}")
        staged = Path(f"{staging}/{BUCKET_COL}={b}")
        old = Path(f"{path}/_old.{BUCKET_COL}={b}")
        if fs.exists(old):
            fs.delete(old, True)  # leftover from a crashed prior swap
        had_live = fs.exists(live)
        if had_live:
            if not fs.rename(live, old):
                raise IOError(f"rename-aside failed for bucket {b}")
        if fs.exists(staged):  # a bucket can be all-deletes → no staged dir
            if not fs.rename(staged, live):
                raise IOError(f"staging swap-in failed for bucket {b}")
        if had_live:
            fs.delete(old, True)
    fs.delete(Path(staging), True)


def _apply_batch(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    delete: bool,
    assume_unique: bool,
) -> dict:
    meta = read_keyed_meta(spark, path)
    key_cols, n, data_cols = meta["key_cols"], meta["num_buckets"], meta["data_cols"]
    if delete:
        missing = [c for c in key_cols if c not in batch.columns]
        if missing:
            raise ValueError(f"delete batch lacks key columns {missing}")
        batch = batch.select(*key_cols)
    else:
        if sorted(batch.columns) != sorted(data_cols):
            raise ValueError(
                f"update batch columns {sorted(batch.columns)} != table columns "
                f"{sorted(data_cols)} — a keyed upsert replaces whole rows"
            )
        batch = batch.select(*data_cols)
    if not assume_unique:
        _check_unique(batch, key_cols, "batch")
    batch = batch.withColumn(BUCKET_COL, _bucket_expr(key_cols, n)).persist()
    try:
        touched = sorted(r[BUCKET_COL] for r in batch.select(BUCKET_COL).distinct().collect())
        if not touched:
            return {"touched_buckets": [], "batch_rows": 0, "survivor_rows": 0}
        # Partition-pruned read of ONLY the touched bucket dirs (the
        # isin filter is a directory filter — plan pytest-pinned).
        old = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin([int(b) for b in touched]))
        survivors = old.join(
            F.broadcast(batch.select(*key_cols)), on=key_cols, how="left_anti"
        )
        merged = survivors if delete else survivors.unionByName(batch)
        staging = f"{path}/_staging"
        fs, _, jvm = _fs(spark, staging)
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
        (
            merged.repartition(len(touched), BUCKET_COL)
            .write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(staging)
        )
        batch_rows = batch.count()
        _swap_buckets(spark, path, staging, [int(b) for b in touched])
        return {
            "touched_buckets": [int(b) for b in touched],
            "untouched_buckets": n - len(touched),
            "batch_rows": batch_rows,
        }
    finally:
        batch.unpersist()


def upsert_keyed_table(
    spark: SparkSession, path: str, updates: DataFrame, assume_unique: bool = False
) -> dict:
    """Override-join semantics at the storage layer: rows whose keys
    appear in ``updates`` are replaced, new keys are inserted, and only
    the hash buckets containing an updated key are rewritten. Returns
    ``{touched_buckets, untouched_buckets, batch_rows}``."""
    return _apply_batch(spark, path, updates, delete=False, assume_unique=assume_unique)


def delete_from_keyed_table(
    spark: SparkSession, path: str, keys: DataFrame, assume_unique: bool = True
) -> dict:
    """Physical key deletion, same bucket-pruned COW path (duplicate
    keys in a delete batch are harmless, so uniqueness defaults off)."""
    return _apply_batch(spark, path, keys, delete=True, assume_unique=assume_unique)
