"""Join queries (SURVEY.md §2.3) — every join family the reference
supports, keyed to its testdata-equivalent shape (FIXTURES.md F3:
orders ⋈ customer ⋈ nation chain with partial key overlap)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.catalog import load_table
from hadoop_20_warehouse_fix_spark.operators.joins import (
    anti_join,
    broadcast_join,
    n_way_equi_join,
    override_join,
    semi_join,
    tagged_cogroup,
)
from hadoop_20_warehouse_fix_spark.queries import query


def _per_nation_sources(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Three co-keyed sources on nationkey — the CompositeInputFormat
    setup (i-th split of each table joined on the shared key)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 3000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"), F.col("n_name").alias("nation_name")
    )
    return cust, supp, nat


@query(
    "join_inner_nway",
    oracle="""
    SELECT c.nationkey, c.n_customers, s.n_suppliers, n.nation_name
    FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers FROM customer GROUP BY 1) c
    JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers FROM supplier
          WHERE s_acctbal > 3000 GROUP BY 1) s USING (nationkey)
    JOIN (SELECT n_nationkey AS nationkey, n_name AS nation_name FROM nation) n USING (nationkey)
    """,
)
def join_inner_nway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way inner equi-join on a shared key — CompositeInputFormat
    ``inner(tbl,tbl,tbl)`` (``M/join/InnerJoinRecordReader.java:30``: emit
    only keys present in EVERY source). One shared hash partitioning on
    nationkey across the join fold; tiny sides become broadcasts under AQE."""
    cust, supp, nat = _per_nation_sources(spark, sf_dir)
    return n_way_equi_join([cust, supp, nat], on="nationkey", how="inner")


@query(
    "join_full_outer",
    oracle="""
    SELECT nationkey, n_customers, n_suppliers
    FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers FROM customer
          WHERE c_acctbal > 9000 GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers FROM supplier
          WHERE s_acctbal > 3000 GROUP BY 1) s USING (nationkey)
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join — ``M/join/OuterJoinRecordReader.java:80``: emit a
    per-key tuple with present slots filled, absent slots NULL
    (TupleWritable presence bits → nullable columns)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 3000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return n_way_equi_join([cust, supp], on="nationkey", how="full_outer")


@query(
    "join_override",
    oracle="""
    SELECT COALESCE(c.custkey, b.custkey, a.custkey) AS custkey,
           COALESCE(c.segment, b.segment, a.segment) AS segment
    FROM      (SELECT c_custkey AS custkey, c_mktsegment AS segment FROM customer) a
    FULL OUTER JOIN (SELECT c_custkey AS custkey, 'HIGH_BALANCE' AS segment FROM customer
                     WHERE c_acctbal > 5000) b ON a.custkey = b.custkey
    FULL OUTER JOIN (SELECT c_custkey AS custkey, 'BUILDING_VIP' AS segment FROM customer
                     WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 8000) c
                ON COALESCE(a.custkey, b.custkey) = c.custkey
    """,
)
def join_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Override join — ``M/join/OverrideRecordReader.java``: value from
    the RIGHTMOST source that has the key wins (precedence/upsert).
    Implemented as a presence-gated coalesce-fold over full-outer joins
    sharing one key partitioning (operators.joins.override_join)."""
    customer = load_table(spark, sf_dir, "customer")
    base = customer.select(F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment"))
    high = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey"), F.lit("HIGH_BALANCE").alias("segment")
    )
    vip = customer.filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 8000)).select(
        F.col("c_custkey").alias("custkey"), F.lit("BUILDING_VIP").alias("segment")
    )
    return override_join([base, high, vip], on="custkey", value_cols=["segment"])


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — absent from the reference (hand-written
    tagged reducers only, SURVEY §2.3); engine capability via Spark.
    Semi joins ship only the key column of the right side — at 100 TB the
    probe side never materializes payload columns."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return semi_join(cust, urgent, on="c_custkey").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — engine capability via Spark."""
    cust = load_table(spark, sf_dir, "customer")
    finished = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join(cust, finished, on="c_custkey").select("c_custkey", "c_name")


@query(
    "join_cross_per_key",
    oracle="""
    SELECT c_custkey, s_suppkey, c_nationkey AS nationkey
    FROM customer JOIN supplier ON c_nationkey = s_nationkey
    WHERE c_acctbal > 9500
    """,
)
def join_cross_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key cross product — ``M/join/JoinRecordReader.java:75-83``
    (JoinDelegationIterator emits all combinations of per-source value
    lists for each key). In Spark this is just the join output on a
    non-unique key."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9500)
    supp = load_table(spark, sf_dir, "supplier")
    return cust.join(supp, F.col("c_nationkey") == F.col("s_nationkey")).select(
        "c_custkey", "s_suppkey", F.col("c_nationkey").alias("nationkey")
    )


@query(
    "join_broadcast_dim",
    oracle="""
    SELECT p_brand, count(*) AS n_items, round(sum(l_extendedprice), 2) AS brand_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    headline=True,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast (map-side hash) join — the DistributedCache idiom
    (``C/filecache/DistributedCache.java:115``): ship the small dim to
    every task; the fact table never shuffles. ``F.broadcast`` forces
    BroadcastHashJoinExec; at 100 TB this is THE join strategy for
    bounded dims."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        broadcast_join(li, part, on=F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("brand_revenue"),
        )
    )


@query(
    "join_tagged_cogroup",
    oracle="""
    SELECT c_custkey AS custkey, count(*) AS n_orders, max(o_totalprice) AS max_price
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    HAVING count(*) >= 12
    """,
)
def join_tagged_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reduce-side tagged join with user combine() — the data_join
    contrib (``DataJoinMapperBase.java:45``, ``DataJoinReducerBase.java:47``:
    tag by source, shuffle on key, user code combines the per-tag groups).
    Spark analog: ``cogroup().applyInPandas`` — the combine_fn sees both
    sides' rows for one key, exactly like the reference's reducer.

    The demo combine keeps customers with >= 12 orders (an arbitrary
    user-defined filter no built-in join mode expresses directly)."""

    def combine(key, cust_pdf: pd.DataFrame, orders_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cust_pdf) and len(orders_pdf) >= 12:
            return pd.DataFrame(
                {
                    "custkey": pd.Series([key[0]], dtype="int64"),
                    "n_orders": pd.Series([len(orders_pdf)], dtype="int64"),
                    "max_price": pd.Series([orders_pdf["o_totalprice"].max()], dtype="float64"),
                }
            )
        return pd.DataFrame(
            {
                "custkey": pd.Series([], dtype="int64"),
                "n_orders": pd.Series([], dtype="int64"),
                "max_price": pd.Series([], dtype="float64"),
            }
        )

    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"), "c_name")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"), "o_totalprice")
    return tagged_cogroup(cust, orders, on="k", combine_fn=combine, schema="custkey long, n_orders long, max_price double")


@query(
    "join_asof_last_click",
    oracle="""
    SELECT a.event_id, a.user_id, a.ts,
           CAST(round(a.value, 2) AS DOUBLE) AS purchase_value,
           b.ts AS click_ts,
           CAST(round(b.value, 2) AS DOUBLE) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
    ON a.user_id = b.user_id AND b.ts <= a.ts
    """,
)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each purchase event paired with the same
    user's most recent click at or before it — MapFile.getClosest
    (``C/io/MapFile.java:539``) semantics lifted to a distributed join;
    SURVEY §2.3 lists as-of as an engine addition the reference could
    only hand-write as a secondary-sort reducer. Union+window physical
    form: ONE shuffle on user_id, no candidate-pair explosion. Oracle =
    DuckDB's native ASOF LEFT JOIN."""
    from hadoop_20_warehouse_fix_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.round("value", 2).alias("click_value"),
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["click_ts", "click_value"],
        how="left",
    )


@query(
    "join_asof_bucketed",
    oracle="""
    SELECT a.event_id, a.user_id, a.ts,
           CAST(round(a.value, 2) AS DOUBLE) AS purchase_value,
           b.ts AS click_ts,
           CAST(round(b.value, 2) AS DOUBLE) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
    ON a.user_id = b.user_id AND b.ts <= a.ts
    """,
)
def join_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME backward as-of contract as join_asof_last_click (same
    DuckDB ASOF oracle), through the skew-resistant two-pass form:
    ``asof_join_bucketed`` partitions on (user_id, hour bucket) so a
    hot user's history spreads across tasks instead of serializing in
    one per-key window — measured 3.5x on a 50%-hot-key 10M x 1M corpus
    (SCALING.md round 4). The join key is ``unix_micros(ts)``: lossless
    for TimestampType (micros physical), so bucket arithmetic cannot
    perturb the at-or-before semantics the oracle checks."""
    from hadoop_20_warehouse_fix_spark.operators.joins import asof_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    ets = F.unix_micros(F.col("ts").cast("timestamp"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("purchase_value"),
        ets.alias("_ets"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.round("value", 2).alias("click_value"),
        ets.alias("_ets"),
    )
    return asof_join_bucketed(
        purchases,
        clicks,
        on="user_id",
        left_ts="_ets",
        right_ts="_ets",
        right_value_cols=["click_ts", "click_value"],
        bucket_width=3_600 * 1_000_000,  # one hour of micros
        how="left",
    ).drop("_ets")


@query(
    "join_range_bands",
    oracle="""
    SELECT b.band, count(*) AS n_orders,
           CAST(round(sum(o.o_totalprice), 2) AS DOUBLE) AS revenue
    FROM orders o
    JOIN (VALUES ('small', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
                 ('large', 150000.0, 300000.0), ('jumbo', 300000.0, 1000000.0))
         b(band, lo, hi)
    ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: orders matched to price bands by
    ``lo <= o_totalprice < hi`` — a theta join the reference cannot
    express (SURVEY §2.3 'not present'). The band side is broadcast, so
    the fact side never shuffles for the join; the only exchange is the
    per-band aggregation."""
    from hadoop_20_warehouse_fix_spark.operators.joins import range_band_join

    bands = spark.createDataFrame(
        [("small", 0.0, 50000.0), ("mid", 50000.0, 150000.0),
         ("large", 150000.0, 300000.0), ("jumbo", 300000.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        range_band_join(orders, bands, "o_totalprice")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).cast("double").alias("revenue"),
        )
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free sort-merge join over co-bucketed tables — the
    reference's map-side merge join (CompositeInputFormat: i-th split of
    each pre-partitioned table joined without shuffle) reproduced with
    Spark bucketing physics: both sides bucketed+sorted on the join key
    into 8 buckets, so SortMergeJoin reads buckets pairwise with ZERO
    exchange (asserted in tests/test_plans.py); the only shuffle in the
    plan is the final segment rollup. The merge hint pins SMJ so the
    demonstration doesn't degrade to broadcast at bench scale."""
    import os

    from hadoop_20_warehouse_fix_spark.sources.writers import write_bucketed

    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), "h20wf_bucketed")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed(
        orders, f"orders_bkt_{tag}", ["o_custkey"], num_buckets=8,
        path=os.path.join(base, f"orders_bkt_{tag}"),
    )
    write_bucketed(
        cust, f"cust_bkt_{tag}", ["c_custkey"], num_buckets=8,
        path=os.path.join(base, f"cust_bkt_{tag}"),
    )
    o = spark.table(f"orders_bkt_{tag}")
    c = spark.table(f"cust_bkt_{tag}")
    j = o.hint("merge").join(c, o["o_custkey"] == c["c_custkey"])
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double") / 100.0).alias(
            "revenue"
        ),
    )


@query(
    "join_asof_next_click",
    oracle="""
    SELECT a.event_id, a.user_id,
           CAST(floor(epoch(a.ts)) AS BIGINT) AS purchase_s,
           (SELECT CAST(floor(epoch(min(b.ts))) AS BIGINT) FROM events b
             WHERE b.event_type = 'click' AND b.user_id = a.user_id
               AND b.ts >= a.ts) AS next_click_s,
           CAST(round(a.value, 2) AS DOUBLE) AS purchase_value
    FROM events a WHERE a.event_type = 'purchase'
    """,
)
def join_asof_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase matched to the same user's
    FIRST click at-or-after it (follow-up attribution — the mirror of
    join_asof_last_click). Same union+window physics, descending scan:
    one shuffle on user_id, no candidate-pair materialization; the
    oracle recomputes the minimum qualifying timestamp per purchase."""
    from hadoop_20_warehouse_fix_spark.catalog import epoch_seconds
    from hadoop_20_warehouse_fix_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["click_ts"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        epoch_seconds("ts").alias("purchase_s"),
        epoch_seconds("click_ts").alias("next_click_s"),
        "purchase_value",
    )
