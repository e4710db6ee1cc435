"""Synthetic data generators (SURVEY.md §2.1) + sort self-validation
(SURVEY.md §5.3).

Reference analogs:
- TeraGen (``E/terasort/TeraGen.java:60``): 100-byte records — 10-byte
  key, 90-byte value — deterministic per row index. Here: seeded
  xxhash64-derived hex key + padded value from ``spark.range`` (pure
  JVM expressions; distributed, no driver data).
- RandomTextWriter (``E/RandomTextWriter.java:82``): random word
  sequences → seeded word picks from a fixed vocabulary.
- RandomWriter (``E/RandomWriter.java:85``): random KV bytes → seeded
  binary from hash chains.
- SortValidator (``src/test/.../SortValidator.java:54``): proves a sort
  without re-sorting — (a) record count preserved, (b) keys
  non-decreasing across the whole output, (c) an order-INDEPENDENT
  XOR checksum of records matches input (``RecordStatsChecker``
  :93-97,160-184). ``sort_validate`` reproduces all three as one
  aggregate pass per side (bit_xor of row hashes).

All generators are deterministic in (n, seed) — rerunning yields
byte-identical tables (the reference seeded per-task RNGs the same way).
At 100 TB: ``spark.range`` parallelizes by numSlices; no stage depends
on data volume at the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = (
    "diurnalness,habitudinal,eructation,schoolmasterism,rabbeting,whittawer,"
    "plebeianism,cromlech,sombreroed,funambulative,hoove,oblongly,phyllary,"
    "unfulminated,dishpan,haply,intuition,sleetiness,cuneiform,plugged"
).split(",")


def teragen(spark: SparkSession, n: int, seed: int = 0, num_partitions: int | None = None) -> DataFrame:
    """n rows of (key string[20-hex], value string[90]) — deterministic,
    uniformly distributed keys (hash of row index), TeraSort's input
    contract in DataFrame form."""
    rng = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    key = F.lpad(F.hex(F.xxhash64(F.col("id"), F.lit(seed))), 20, "0")
    filler = F.rpad(F.hex(F.xxhash64(F.col("id"), F.lit(seed + 1))), 90, "A")
    return rng.select(key.alias("key"), filler.alias("value"))


def random_text(spark: SparkSession, n_rows: int, words_per_row: int = 10, seed: int = 0, num_partitions: int | None = None) -> DataFrame:
    """RandomTextWriter: rows of space-joined vocabulary words, chosen by
    seeded hash — same distributional shape (zipf-less uniform picks)."""
    rng = spark.range(0, n_rows, 1, num_partitions) if num_partitions else spark.range(n_rows)
    words = F.array(*[F.lit(w) for w in _WORDS])
    picks = [
        F.element_at(words, (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + i)), F.lit(len(_WORDS))) + 1).cast("int"))
        for i in range(words_per_row)
    ]
    return rng.select(F.concat_ws(" ", *picks).alias("text"))


def random_kv_binary(spark: SparkSession, n: int, value_len: int = 64, seed: int = 0) -> DataFrame:
    """RandomWriter: (long key, binary value) with seeded content."""
    rng = spark.range(n)
    val = F.unhex(F.rpad(F.hex(F.xxhash64(F.col("id"), F.lit(seed))), value_len * 2, "0"))
    return rng.select(F.xxhash64(F.col("id"), F.lit(seed + 7)).alias("key"), val.alias("value"))


def sort_validate(
    df_in: DataFrame, df_out: DataFrame, key_col: str, file_order: bool = False
) -> dict[str, bool]:
    """SortValidator's three checks, order-independently, in two
    aggregate passes (no re-sort, no collect of data rows):

    - counts_match: |in| == |out|
    - checksum_match: XOR of xxhash64(full row) identical both sides
      (content preserved regardless of order)
    - globally_sorted: the output's OWN row order (partition order +
      within-partition order, captured via spark_partition_id +
      monotonically_increasing_id) is non-decreasing on the key. Checked
      as (a) per-partition lag violations and (b) partition boundary
      order (max of partition i ≤ min of partition i+1) — no global
      window, so the check itself scales (the reference validated the
      same way: per-file order maps + a boundary-order reduce,
      ``TeraValidate.java:52``).

    ``file_order=True`` is for validating a sorted table READ BACK from
    disk: Spark schedules scan partitions by split size, not by file
    name, so the partition-order check above false-negatives on any
    multi-file read even when the files are perfectly sorted (measured
    round 4 on a 128-file TeraSort output — both across partitions AND
    at file seams inside one partition, since a FilePartition packs
    small files in size order too). In this mode the boundary check
    runs at FILE granularity ordered by ``input_file_name()`` — exactly
    TeraValidate's contract (per-input order + filename-ordered
    boundary records, ``TeraValidate.java:52``) — and the within check
    groups by (file, scan partition). An intra-file disorder that
    straddles a split boundary of one oversized file is the one case
    neither granularity sees (TeraValidate had the same blind spot
    between its map inputs).
    """
    cols_in = sorted(df_in.columns)
    cols_out = sorted(df_out.columns)
    xor_in, cnt_in = _xor_count(df_in, cols_in)
    xor_out, cnt_out = _xor_count(df_out, cols_out)

    from pyspark.sql import Window

    # _p (scan partition id) orders rows WITHIN a task correctly in
    # both modes; _b is the boundary-check grouping — the file name in
    # file_order mode (lexicographic part-NNNNN order == write order),
    # else the partition id itself. monotonically_increasing_id is NOT
    # position-ordered across two splits of one file, so the within
    # check must never be windowed by file. The two checks scan
    # SEPARATE slim projections: riding the ~100-byte file-path string
    # through the 100M-row window sort blew task memory on the round-4
    # TeraSort validation, while the boundary pass needs only (key,
    # group) and map-side-combines to one row per group before any
    # shuffle.
    # In file_order mode the within check groups by (file, partition):
    # a scan partition PACKS several small files in split-size order, so
    # keys legitimately jump backward at each file seam inside one
    # partition (measured: 52 false violations on a 128-file TeraSort
    # read-back). The file rides as an 8-byte hash — only the grouping
    # matters here, never inter-file order, which the boundary check
    # owns at name granularity.
    group = [F.xxhash64(F.input_file_name()).alias("_fh")] if file_order else []
    tagged = df_out.select(
        F.col(key_col).alias("_k"),
        *group,
        F.spark_partition_id().alias("_p"),
        F.monotonically_increasing_id().alias("_m"),
    )
    w = Window.partitionBy(*(["_fh"] if file_order else []), "_p").orderBy("_m")
    within_violations = (
        tagged.withColumn("_prev", F.lag("_k").over(w))
        .filter(F.col("_prev").isNotNull() & (F.col("_prev") > F.col("_k")))
        .count()
    )
    bounds_tagged = df_out.select(
        F.col(key_col).alias("_k"),
        (F.input_file_name() if file_order else F.spark_partition_id()).alias("_b"),
    )
    bounds = bounds_tagged.groupBy("_b").agg(F.min("_k").alias("_lo"), F.max("_k").alias("_hi"))
    # Unpartitioned window is SAFE here (Spark's WindowExec warning
    # notwithstanding): `bounds` is one row per file/partition — P rows,
    # bounded by layout, not by data volume. Same class as prefix_sum's
    # P-row offset scan.
    wb = Window.orderBy("_b")
    cross_violations = (
        bounds.withColumn("_prev_hi", F.lag("_hi").over(wb))
        .filter(F.col("_prev_hi").isNotNull() & (F.col("_prev_hi") > F.col("_lo")))
        .count()
    )
    return {
        "counts_match": cnt_in == cnt_out,
        "checksum_match": xor_in == xor_out,
        "globally_sorted": within_violations == 0 and cross_violations == 0,
    }


def _xor_count(df: DataFrame, cols: list[str]) -> tuple[int, int]:
    row = df.agg(
        F.bit_xor(F.xxhash64(*[F.col(c).cast("string") for c in cols])).alias("x"),
        F.count(F.lit(1)).alias("c"),
    ).collect()[0]
    return row.x, row.c
