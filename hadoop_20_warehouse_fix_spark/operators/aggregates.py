"""Aggregation framework (SURVEY.md §2.4).

The reference's declarative aggregate framework
(``M/lib/aggregate/ValueAggregatorJob.java:81``) registers typed
descriptors — LongValueSum, DoubleValueSum, LongValueMin/Max,
StringValueMin/Max, UniqValueCount, ValueHistogram
(``ValueAggregatorBaseDescriptor.java:94-113``) — and runs them through
mapper → combiner (partial) → reducer (final). Spark's HashAggregate does
partial/final automatically; this module provides the descriptor report
shapes.

Scale: every helper here is a pure ``groupBy().agg()`` — map-side
partial aggregation bounds shuffle volume by (groups × partitions), and
the approx variants (``approx_count_distinct`` HLL,
``percentile_approx``) are the declared 100 TB-scale analogs of the
reference's capped/exact implementations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Descriptor-name → aggregate expression builder, mirroring the 8
# registered types in ValueAggregatorBaseDescriptor.java:94-113.
DESCRIPTORS = {
    "LongValueSum": lambda c: F.sum(F.col(c).cast("long")),
    "DoubleValueSum": lambda c: F.sum(F.col(c).cast("double")),
    "LongValueMax": lambda c: F.max(F.col(c).cast("long")),
    "LongValueMin": lambda c: F.min(F.col(c).cast("long")),
    "StringValueMax": lambda c: F.max(F.col(c).cast("string")),
    "StringValueMin": lambda c: F.min(F.col(c).cast("string")),
    "ValueCount": lambda c: F.count(F.col(c)),
    "UniqValueCount": lambda c: F.count_distinct(F.col(c)),
}


def profile_columns(df: DataFrame, cols: Sequence[tuple[str, bool]]) -> DataFrame:
    """One-pass table profile (the ANALYZE/statistics report): per
    column, row count, filled count, exact distinct count, min and max
    (stringified; numeric columns rounded to 4) in long format
    ``(col_name, n_rows, n_filled, n_distinct, min_v, max_v)``.
    ``cols`` = (column, is_numeric) pairs.

    Physical form (measured — SCALING.md round 4): unpivot FIRST via a
    ``stack`` generator in the scan stage (one narrow
    (col_name, val_num, val_str) tuple per profiled column per row),
    then TWO grouped aggregations: stage 1 dedupes to the distinct
    (col_name, value) pairs while summing row/filled counts — its agg
    buffers are all longs/doubles, so the heavy |rows|x|cols| stage
    stays in HashAggregate (string min/max buffers would force a
    SortAggregate fallback: measured 3.6x slower); stage 2 derives
    distinct counts and min/max over the ~sum-of-cardinalities
    survivors. One scan of the source, shuffle bounded by the sum of
    column cardinalities. Distinct/filled counts use the injective
    string rendering; min/max keep numeric ordering through the typed
    val_num lane. On an EMPTY input this returns 0 rows (no groups).
    The one-pass many-metrics shape is the reference's counters
    framework (many metrics, one job — ``M/Counters.java``)."""
    entries = []
    for c, numeric in cols:
        vnum = f"CAST({c} AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        entries.append(f"'{c}', {vnum}, CAST({c} AS STRING)")
    unp = df.selectExpr(
        f"stack({len(cols)}, {', '.join(entries)}) AS (col_name, val_num, val_str)"
    )
    per_value = unp.groupBy("col_name", "val_str").agg(
        F.count(F.lit(1)).alias("c"), F.min("val_num").alias("vn")
    )
    numeric_names = [c for c, n in cols if n]
    is_num = F.col("col_name").isin(numeric_names)
    return per_value.groupBy("col_name").agg(
        F.sum("c").alias("n_rows"),
        F.sum(F.when(F.col("val_str").isNotNull(), F.col("c")).otherwise(F.lit(0))).alias(
            "n_filled"
        ),
        F.count("val_str").alias("n_distinct"),
        F.when(is_num, F.round(F.min("vn"), 4).cast("string"))
        .otherwise(F.min("val_str"))
        .alias("min_v"),
        F.when(is_num, F.round(F.max("vn"), 4).cast("string"))
        .otherwise(F.max("val_str"))
        .alias("max_v"),
    )


def value_aggregate(
    df: DataFrame,
    descriptors: Sequence[tuple[str, str, str]],
) -> DataFrame:
    """Aggregate-framework job: each descriptor ``(type, id, column)``
    yields one ``(id, value)`` output row, like the reference's
    ``"LongValueSum:record_count" → value`` pairs (generateEntry,
    ``ValueAggregatorBaseDescriptor.java:84-90``).

    Values are cast to string (the reference emitted Text); each
    descriptor is a scalar aggregation, all computed in ONE pass via a
    single agg + unpivot-style stack (one job, matching the reference)."""
    aggs = []
    for i, (dtype, _agg_id, column) in enumerate(descriptors):
        if dtype not in DESCRIPTORS:
            raise ValueError(f"unknown descriptor type {dtype!r}; known: {sorted(DESCRIPTORS)}")
        aggs.append(DESCRIPTORS[dtype](column).cast("string").alias(f"_a{i}"))
    one = df.agg(*aggs)
    stack_args: list[Column] = []
    for i, (dtype, agg_id, _column) in enumerate(descriptors):
        stack_args.append(F.lit(f"{dtype}:{agg_id}"))
        stack_args.append(F.col(f"_a{i}"))
    return one.select(F.stack(F.lit(len(descriptors)), *stack_args).alias("id", "value"))


def histogram_report(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    approx: bool = False,
    round_digits: int = 4,
) -> DataFrame:
    """ValueHistogram report tuple (``ValueHistogram.java:78-134``):
    per-group count, min, median, max, mean, stddev (population).

    ``approx=True`` swaps exact median for ``percentile_approx`` — the
    scale path (exact median needs a full sort of each group's values;
    approx is a fixed-size sketch merged map-side)."""
    v = F.col(value_col)
    median = (
        F.percentile_approx(v, 0.5) if approx else F.expr(f"percentile({value_col}, 0.5)")
    )
    return df.groupBy(*group_cols).agg(
        F.count(v).alias("n_values"),
        F.round(F.min(v), round_digits).alias("min_value"),
        F.round(median, round_digits).alias("median_value"),
        F.round(F.max(v), round_digits).alias("max_value"),
        F.round(F.avg(v), round_digits).alias("mean_value"),
        F.round(F.stddev_pop(v), round_digits).alias("stddev_value"),
    )


def uniq_count(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    cap: int | None = None,
    approx: bool = False,
) -> DataFrame:
    """UniqValueCount (``UniqValueCount.java:30``): distinct-value count
    per group. The reference CAPS the tracked set at ``maxNumItems``
    (cap logic :81-86) — counts saturate at the cap; ``least(count, cap)``
    reproduces that saturation exactly. ``approx=True`` is the HLL
    100 TB-scale analog (sketches merge map-side; exact distinct shuffles
    every distinct value)."""
    v = F.col(value_col)
    cnt = F.approx_count_distinct(v) if approx else F.count_distinct(v)
    if cap is not None:
        cnt = F.least(cnt, F.lit(cap))
    return df.groupBy(*group_cols).agg(cnt.cast("long").alias("uniq_count"))


# ---- Skew tools (100 TB path) -------------------------------------------
#
# The reference had no skew mitigation beyond speculative execution; at
# warehouse scale a hot key turns one reducer into the job's critical
# path. Two standard remedies, both pure DataFrame:

_SALTED_MERGERS = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_two_phase_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt for HOT KEYS:
    phase 1 groups on (keys, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers — phase 2 merges the bounded partials on
    the true keys.

    ``aggs``: output_name -> (column, fn) with fn in sum/count/min/max
    (the decomposable descriptors; avg = sum+count then divide at the
    caller). Results are EXACTLY equal to a direct groupBy — asserted by
    the oracle of the query that drives this.

    Spark's map-side partial aggregation already bounds skew for most
    aggs; the explicit salt matters when per-partition group counts
    explode past ``spark.sql.aggregate`` hash capacity or a single
    reduce-side group dominates (e.g. 3-key rollups over billions of
    rows). The salt is deterministic (pmod of xxhash64 over ALL columns)
    so reruns partition identically."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    phase1_aggs = []
    for name, (col, fn) in aggs.items():
        if fn not in _SALTED_MERGERS:
            raise ValueError(f"non-decomposable agg {fn!r}; known: {sorted(_SALTED_MERGERS)}")
        partial = F.count(F.col(col)) if fn == "count" else getattr(F, fn)(F.col(col))
        phase1_aggs.append(partial.alias(f"_p_{name}"))
    phase1 = df.withColumn("_salt", salt).groupBy(*group_cols, "_salt").agg(*phase1_aggs)
    phase2_aggs = [
        _SALTED_MERGERS[fn](F.col(f"_p_{name}")).alias(name) for name, (_c, fn) in aggs.items()
    ]
    return phase1.groupBy(*group_cols).agg(*phase2_aggs)


def count_min_sketch(
    df: DataFrame, col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Count-min sketch of a column's frequency distribution: ``depth``
    seeded hash rows × ``width`` buckets, each cell the count of items
    hashing there. Returns (d, bucket, cnt) — ``depth × width`` rows
    REGARDLESS of item cardinality: the fixed-size summary that answers
    frequency queries over 100 TB streams where exact per-item counts
    (shuffle O(distinct items)) don't fit.

    Estimate = min over d of cell(d, hash_d(item)) — never
    underestimates (collisions only add); overestimate is bounded by
    eN/width with probability 1-(1/2)^depth (Cormode & Muthukrishnan,
    J.Algorithms'05)."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(F.xxhash64(F.col(col), F.lit(d)), F.lit(width)).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db")
    ).select("db.d", "db.bucket")
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_lookup(sketch: DataFrame, items: DataFrame, col: str, width: int = 1024, depth: int = 4) -> DataFrame:
    """Estimated frequency for each item: join the item's ``depth``
    probe positions against the sketch, take the min. The sketch is
    depth×width rows — broadcast — so lookups never shuffle the items.

    LEFT join + coalesce(0): the materialized sketch only stores
    non-empty cells, so an item probing an empty cell must see count 0
    (an inner join would silently drop the item — or overestimate by
    taking the min over only its non-empty cells)."""
    probes = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(F.xxhash64(F.col(col), F.lit(d)), F.lit(width)).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db"),
    ).select(col, "db.d", "db.bucket")
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def md5_bucket(col: Column | str, d: int, width: int) -> Column:
    """Engine-agnostic CMS probe position: first 32 md5 bits of
    ``value|depth`` mod width — replayable in any engine with md5
    (DuckDB oracle does), unlike xxhash64."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col(col) if isinstance(col, str) else col, F.lit(str(d)))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def count_min_sketch_md5(df: DataFrame, col: str, width: int = 1024, depth: int = 4) -> DataFrame:
    """count_min_sketch with md5 probe positions — identical structure
    and guarantees, engine-agnostic cell layout (the reproducible-sketch
    contract: any engine can rebuild or query the same sketch)."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), md5_bucket(col, d, width).alias("bucket"))
                    for d in range(depth)
                ]
            )
        ).alias("db")
    ).select("db.d", "db.bucket")
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_lookup_md5(
    sketch: DataFrame, items: DataFrame, col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """cms_lookup against an md5-positioned sketch (left join +
    coalesce(0), same empty-cell semantics)."""
    probes = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), md5_bucket(col, d, width).alias("bucket"))
                    for d in range(depth)
                ]
            )
        ).alias("db"),
    ).select(col, "db.d", "db.bucket")
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def kmv_distinct(
    df: DataFrame, group_cols: list[str], col: str, k: int = 256
) -> DataFrame:
    """K-minimum-values distinct-count sketch: hash each value to a
    uniform coin u = md5_32(value)/2^32 in [0,1); the k-th smallest
    DISTINCT u per group estimates the cardinality as (k-1)/u_k
    (Bar-Yossef et al., RANDOM'02 — public). Unlike HLL the estimator
    is a pure deterministic function of the data given md5, so the
    DuckDB oracle reproduces it EXACTLY — a reproducible approximate
    sketch (std error ~ 1/sqrt(k) ≈ 6%% at k=256).

    Physical form here: distinct coins -> per-group ordered row_number
    -> the rn==k row. That is sort-based (shuffle of distinct coins);
    the streaming form keeps a fixed k-size heap per group — same
    answer, O(k) state, the 100 TB merge path (like the reference's
    capped UniqValueCount, SURVEY §2.4, but with a principled
    estimator). Groups with fewer than k distinct values emit no row
    (their exact distinct count is below sketch resolution — count them
    exactly)."""
    from pyspark.sql import Window

    u = (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(float(1 << 32))
    ).alias("u")
    coins = df.select(*group_cols, u).distinct()
    w = Window.partitionBy(*group_cols).orderBy("u")
    return (
        coins.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == k)
        .select(
            *group_cols,
            F.floor(F.lit(k - 1) / F.col("u")).cast("long").alias("est_distinct"),
        )
    )
