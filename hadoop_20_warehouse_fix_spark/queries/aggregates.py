"""Aggregation queries (SURVEY.md §2.4) — the reference's aggregate
framework descriptor types, histogram report, capped distinct, plus the
grouping-set capabilities Spark adds for free."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.catalog import load_table
from hadoop_20_warehouse_fix_spark.operators.aggregates import (
    histogram_report,
    uniq_count,
    value_aggregate,
)
from hadoop_20_warehouse_fix_spark.queries import query


@query(
    "agg_value_framework",
    oracle="""
    SELECT 'LongValueSum:qty' AS id, CAST(sum(CAST(trunc(l_quantity) AS BIGINT)) AS VARCHAR) AS value FROM lineitem
    UNION ALL
    SELECT 'ValueCount:rows', CAST(count(l_orderkey) AS VARCHAR) FROM lineitem
    UNION ALL
    SELECT 'LongValueMax:qty', CAST(max(CAST(trunc(l_quantity) AS BIGINT)) AS VARCHAR) FROM lineitem
    UNION ALL
    SELECT 'LongValueMin:qty', CAST(min(CAST(trunc(l_quantity) AS BIGINT)) AS VARCHAR) FROM lineitem
    UNION ALL
    SELECT 'StringValueMax:rflag', CAST(max(l_returnflag) AS VARCHAR) FROM lineitem
    UNION ALL
    SELECT 'StringValueMin:rflag', CAST(min(l_returnflag) AS VARCHAR) FROM lineitem
    UNION ALL
    SELECT 'UniqValueCount:parts', CAST(count(DISTINCT l_partkey) AS VARCHAR) FROM lineitem
    """,
)
def agg_value_framework(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-framework job (``ValueAggregatorJob.java:81``): declared
    descriptors → one pass → (id, value) report rows, ids formatted
    ``"Type:name"`` exactly like ``generateEntry``
    (``ValueAggregatorBaseDescriptor.java:84-90``). All descriptors
    compute in a single agg (one job), values emitted as strings (the
    reference emitted Text).

    Long coercion is TRUNCATION toward zero on both sides (Spark
    cast(double as long) ↔ DuckDB trunc()): the previous oracle used
    FLOOR, which agrees only on non-negative values — a latent mismatch
    on any column with negative fractional values."""
    li = load_table(spark, sf_dir, "lineitem")
    return value_aggregate(
        li,
        [
            ("LongValueSum", "qty", "l_quantity"),
            ("ValueCount", "rows", "l_orderkey"),
            ("LongValueMax", "qty", "l_quantity"),
            ("LongValueMin", "qty", "l_quantity"),
            ("StringValueMax", "rflag", "l_returnflag"),
            ("StringValueMin", "rflag", "l_returnflag"),
            ("UniqValueCount", "parts", "l_partkey"),
        ],
    )


@query(
    "agg_histogram_report",
    oracle="""
    SELECT l_returnflag,
           count(l_quantity)                  AS n_values,
           round(min(l_quantity), 4)          AS min_value,
           round(median(l_quantity), 4)       AS median_value,
           round(max(l_quantity), 4)          AS max_value,
           round(avg(l_quantity), 4)          AS mean_value,
           round(stddev_pop(l_quantity), 4)   AS stddev_value
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_histogram_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ValueHistogram report (``ValueHistogram.java:78-134``): per-group
    count/min/median/max/mean/stddev. Exact median here (correctness
    scale); ``histogram_report(approx=True)`` is the sketch-based
    100 TB path."""
    return histogram_report(
        load_table(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_quantity", approx=False
    )


@query(
    "agg_uniq_capped",
    oracle="""
    SELECT l_returnflag, least(count(DISTINCT l_partkey), 1000) AS uniq_count
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_uniq_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped distinct count — UniqValueCount's ``maxNumItems`` cap
    (``UniqValueCount.java:81-86``): the tracked set stops growing at the
    cap, so the reported count saturates; ``least(count_distinct, cap)``
    reproduces that exactly (SURVEY §4 divergence note #3)."""
    return uniq_count(load_table(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_partkey", cap=1000)


def agg_uniq_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct — the declared 100 TB-scale analog of UniqValueCount
    (SURVEY §4 note #3). Sketches merge map-side; shuffle volume is
    O(groups × sketch size) instead of O(distinct values). HLL estimates
    are engine-specific, so this operator is pytest-covered (accuracy
    bounds in tests/test_operators.py) rather than driver-registered; the
    exact-replayable KMV sibling ``agg_uniq_kmv`` carries the oracle
    burden — the same exact/approx split as the reference's
    UniqValueCount cap (``UniqValueCount.java:30``)."""
    return uniq_count(
        load_table(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_partkey", approx=True
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — absent from the reference (SURVEY §2.4: 'no
    grouping sets / rollup / cube'); engine capability via Spark. Partial
    aggregation applies per grouping set, so shuffle stays bounded by
    output cardinality."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_open,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_filled
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) — the reference's multi-output demux
    idiom flattened into columns; Spark ``pivot`` with explicit value
    list (no extra pass to discover values — required at scale)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


@query(
    "agg_monte_carlo_pi",
    oracle="""
    WITH halton AS (
      SELECT i,
             -- base-2 radical inverse of i (van der Corput), 20 bits
             (SELECT sum( ((i >> b) & 1) / CAST(power(2, b + 1) AS DOUBLE) ) FROM range(20) t(b)) AS x,
             -- base-3 radical inverse of i
             (SELECT sum( (CAST(floor(i / power(3, b)) AS BIGINT) % 3) / power(3, b + 1) ) FROM range(13) t(b)) AS y
      FROM range(100000) r(i)
    )
    SELECT count(*) FILTER (WHERE (x - 0.5) * (x - 0.5) + (y - 0.5) * (y - 0.5) <= 0.25) AS n_inside,
           count(*) AS n_total
    FROM halton
    """,
)
def agg_monte_carlo_pi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PiEstimator (``E/PiEstimator.java:66``): deterministic Halton
    sequence points, count inside/outside the unit circle. Generated
    distributively with ``spark.range`` (the reference used one map per
    sample shard); the radical-inverse expressions are pure SQL — no UDF,
    fully codegen'd."""
    n = 100_000
    pts = spark.range(n).withColumnRenamed("id", "i")
    x = sum(
        (F.shiftright(F.col("i"), b).bitwiseAND(F.lit(1))) / F.lit(float(2 ** (b + 1)))
        for b in range(20)
    )
    y = sum(
        (F.floor(F.col("i") / F.lit(float(3**b))).cast("long") % 3) / F.lit(float(3 ** (b + 1)))
        for b in range(13)
    )
    pts = pts.select(x.alias("x"), y.alias("y"))
    inside = (F.col("x") - 0.5) ** 2 + (F.col("y") - 0.5) ** 2 <= 0.25
    return pts.agg(
        F.count(F.when(inside, 1)).alias("n_inside"), F.count(F.lit(1)).alias("n_total")
    )


@query(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS revenue,
           count(l_extendedprice) AS n_items,
           CAST(round(min(l_extendedprice), 2) AS DOUBLE) AS min_price,
           CAST(round(max(l_extendedprice), 2) AS DOUBLE) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed low-cardinality rollup (3 distinct return flags over every
    lineitem row) via explicit SALTED two-phase aggregation: phase 1
    groups on (flag, salt-of-row) so each hot flag spreads across 32
    reducers, phase 2 merges partials per flag. Oracle = plain GROUP BY,
    proving salting is result-invariant. Exact integer-cents sum — the
    salted regrouping changes double summation order, so cents keep the
    comparison order-independent."""
    from hadoop_20_warehouse_fix_spark.operators.aggregates import salted_two_phase_agg

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "cents", F.round(F.col("l_extendedprice") * 100).cast("long")
    )
    out = salted_two_phase_agg(
        li,
        ["l_returnflag"],
        {
            "cents_sum": ("cents", "sum"),
            "n_items": ("l_extendedprice", "count"),
            "min_price": ("l_extendedprice", "min"),
            "max_price": ("l_extendedprice", "max"),
        },
        salt_buckets=32,
    )
    return out.select(
        "l_returnflag",
        (F.col("cents_sum") / 100.0).alias("revenue"),
        "n_items",
        F.round("min_price", 2).cast("double").alias("min_price"),
        F.round("max_price", 2).cast("double").alias("max_price"),
    )


def agg_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via count-min sketch: a 4x4096 counter summary of
    the corpus word stream (fixed size regardless of vocabulary — the
    100 TB frequency-query structure), probed for the exact top-20
    words. CMS never under-counts; over-count bounded by eN/width.
    xxhash64-based → no cross-engine oracle, so this operator is
    pytest-covered (never-undercount + bounded-error asserted against
    exact counts in tests/test_operators.py) rather than
    driver-registered; the md5-positioned sibling
    ``agg_heavy_hitters_cms_md5`` carries the exact-replay oracle."""
    from hadoop_20_warehouse_fix_spark.operators.aggregates import cms_lookup, count_min_sketch

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    sketch = count_min_sketch(words, "word", width=4096, depth=4)
    top = (
        words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word")).limit(20).select("word")
    )
    return cms_lookup(sketch, top, "word", width=4096, depth=4)


_HEX8 = (
    "list_sum(list_transform(generate_series(1, 8), "
    "i -> (strpos('0123456789abcdef', substr({h}, i, 1)) - 1) * power(16, 8 - i)))"
)


def _cms_md5_oracle(width: int = 4096, depth: int = 4, topn: int = 20) -> str:
    """Replay the md5-positioned CMS in SQL: rebuild the probed cells
    from the raw stream, then min over depths per top word."""
    def bucket(expr: str, d: int) -> str:
        h = f"md5({expr} || '|' || '{d}')"
        return f"CAST({_HEX8.format(h=h)} % {width} AS BIGINT)"

    cell_union = "\n      UNION ALL ".join(
        f"SELECT {d} AS d, {bucket('word', d)} AS bucket FROM words" for d in range(depth)
    )
    probe_union = "\n      UNION ALL ".join(
        f"SELECT word, {d} AS d, {bucket('word', d)} AS bucket FROM top" for d in range(depth)
    )
    return f"""
    WITH words AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                w -> w <> '')) AS word
      FROM documents
    ), top AS (
      SELECT word FROM words GROUP BY word
      ORDER BY count(*) DESC, word LIMIT {topn}
    ), cells AS (
      SELECT d, bucket, count(*) AS cnt FROM (
      {cell_union}
      ) GROUP BY d, bucket
    ), probes AS (
      {probe_union}
    )
    SELECT p.word, CAST(min(COALESCE(c.cnt, 0)) AS BIGINT) AS est_count
    FROM probes p LEFT JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
    GROUP BY p.word
    """


@query("agg_heavy_hitters_cms_md5", oracle=_cms_md5_oracle())
def agg_heavy_hitters_cms_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the md5-positioned count-min sketch — identical
    structure and error bounds to agg_heavy_hitters_cms, but the probe
    positions are engine-agnostic, so the DuckDB oracle rebuilds the
    sketch from the raw stream and reproduces every estimate EXACTLY
    (the reproducible-sketch contract; the xxhash64 form stays as the
    faster JVM-only variant)."""
    from hadoop_20_warehouse_fix_spark.operators.aggregates import (
        cms_lookup_md5,
        count_min_sketch_md5,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    sketch = count_min_sketch_md5(words, "word", width=4096, depth=4)
    top = (
        words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word")).limit(20).select("word")
    )
    return cms_lookup_md5(sketch, top, "word", width=4096, depth=4)


@query(
    "agg_uniq_kmv",
    oracle="""
    WITH coins AS (
      SELECT DISTINCT l_returnflag,
             list_sum(list_transform(generate_series(1, 8),
               i -> (strpos('0123456789abcdef',
                            substr(md5(CAST(l_partkey AS VARCHAR)), i, 1)) - 1)
                    * power(16, 8 - i))) / 4294967296.0 AS u
      FROM lineitem
    ), ranked AS (
      SELECT l_returnflag, u,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY u) AS rn
      FROM coins
    )
    SELECT l_returnflag, CAST(floor(255 / u) AS BIGINT) AS est_distinct
    FROM ranked WHERE rn = 256
    """,
)
def agg_uniq_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct partkeys per returnflag via the K-minimum-values sketch
    (k=256, ~6%% std error) — the REPRODUCIBLE approximate distinct
    count: unlike HLL (engine-specific, rows-only agg_uniq_approx), the
    KMV estimator is a deterministic function of the data given md5, so
    the oracle replays it exactly. Accuracy vs exact counts asserted in
    tests/test_operators.py."""
    from hadoop_20_warehouse_fix_spark.operators.aggregates import kmv_distinct

    return kmv_distinct(
        load_table(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_partkey", k=256
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form cube/rollup specialize):
    per-flag, per-status, and per-pair aggregates in ONE pass — each
    grouping set gets its own partial aggregation, shuffle bounded by
    total output cardinality."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, both linear-interpolation on the sorted
    set) — the warehouse summary-stats staple.

    100 TB: exact percentiles sort each group's values; for hot paths at
    scale swap to approx_percentile (t-digest-style sketch, mergeable,
    one pass) and accept the documented rank-error bound — the same
    exact/approx split as agg_uniq_capped vs agg_uniq_approx."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.expr(
        "percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D, 0.99D))"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("p"))
        .select(
            "l_returnflag",
            F.round(F.col("p")[0], 4).alias("p25"),
            F.round(F.col("p")[1], 4).alias("p50"),
            F.round(F.col("p")[2], 4).alias("p75"),
            F.round(F.col("p")[3], 4).alias("p99"),
        )
    )


@query(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           round(avg(l_extendedprice), 4)              AS mean_price,
           round(stddev_samp(l_extendedprice), 4)      AS sd_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
           round(corr(l_quantity, l_discount), 6)      AS corr_qty_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group (stddev / covariance /
    correlation) — single-pass mergeable moment aggregates (Welford-
    style partial states), so they combine map-side and scale like any
    sum: shuffle is one state per (group, agg). Rounded on both sides —
    the engines' merge orders differ in the last ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg("l_extendedprice"), 4).alias("mean_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("corr_qty_disc"),
    )


@query(
    "profile_table",
    oracle="""
    SELECT 'l_quantity' AS col_name, count(*) AS n_rows, count(l_quantity) AS n_filled,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(round(min(l_quantity), 4) AS VARCHAR) AS min_v,
           CAST(round(max(l_quantity), 4) AS VARCHAR) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*), count(l_discount), count(DISTINCT l_discount),
           CAST(round(min(l_discount), 4) AS VARCHAR),
           CAST(round(max(l_discount), 4) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*), count(l_returnflag), count(DISTINCT l_returnflag),
           CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', count(*), count(l_shipdate), count(DISTINCT l_shipdate),
           CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR)
    FROM lineitem
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the ANALYZE/statistics pass a warehouse runs
    before planning and data-quality review): per-column row count,
    filled count, exact distinct count, min and max — stringified into
    one long-format report.

    Physical form: ONE scan of lineitem (plan-shape-asserted in
    tests/test_plans.py) via ``operators.aggregates.profile_columns`` —
    unpivot first, then a two-stage aggregation whose heavy stage keeps
    HashAggregate-able buffers. Candidate plans and honest measurements
    (plus the two local-bench traps the first measurement fell into) are
    recorded in SCALING.md round 4: 0.91 s at sf0.1 vs 0.83 s for one
    pruned scan per column and 3.3-3.6 s for the naive one-pass forms;
    local parity with the per-column form, strictly better at 100 TB
    (one shuffle bounded by sum-of-cardinalities instead of 4 scan
    passes + 4 shuffle rounds). The one-pass many-metrics shape is the
    reference's counters framework (many metrics, one job —
    ``Counters.java``). Degenerate-input note: on an EMPTY table this
    returns 0 rows (no groups), where the per-column-agg form returned
    one all-zero row per column. Swap count_distinct for
    approx_count_distinct when exactness isn't required — the same
    exact/approx split as agg_uniq_capped vs agg_uniq_approx."""
    from hadoop_20_warehouse_fix_spark.operators.aggregates import profile_columns

    li = load_table(spark, sf_dir, "lineitem")
    return profile_columns(
        li,
        [("l_quantity", True), ("l_discount", True), ("l_returnflag", False), ("l_shipdate", False)],
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT o_orderstatus,
           (min(struct_pack(p := o_totalprice, k := o_orderkey))).k AS cheapest_order,
           (max(struct_pack(p := o_totalprice, k := o_orderkey))).k AS priciest_order,
           CAST(round(min(o_totalprice), 2) AS DOUBLE) AS min_price,
           CAST(round(max(o_totalprice), 2) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax aggregates (which ROW holds the extreme, not just
    the extreme value). Single-pass mergeable state (value,
    ordering-key) per group — no window, no self-join, the common
    replacement for the 'top-1 per group via row_number' anti-pattern.

    Round 8: expressed as min/max over a (price, orderkey) STRUCT
    (lexicographic, both engines) instead of bare ``min_by``/``max_by``
    — the 10× key-shifted replay manufactured exact price ties and
    caught the bare form's tie being engine-order dependent (Spark and
    DuckDB returned different orderkeys; SCALING.md r8). The struct
    form pins the tie: smallest orderkey among the cheapest, largest
    among the priciest — same plan shape, now total-order
    deterministic at ANY scale."""
    o = load_table(spark, sf_dir, "orders")
    pk = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return o.groupBy("o_orderstatus").agg(
        F.min(pk)["k"].alias("cheapest_order"),
        F.max(pk)["k"].alias("priciest_order"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
