"""Driver-gated queries for the plan-layer machinery: the JobControl
DAG runner and observe-counters (SURVEY.md §2.9 / §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.catalog import load_table
from hadoop_20_warehouse_fix_spark.queries import query


@query(
    "plan_dag_pipeline",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_customers,
           CAST(sum(o.n_orders) AS BIGINT) AS total_orders
    FROM customer c
    JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def plan_dag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step JobControl-style DAG (``M/jobcontrol/JobControl.java:40``):
    step A aggregates per-customer order counts; step B (depending on A)
    joins customers and rolls up per market segment. run_dag enforces
    the dependency order and passes step A's result to B — the
    materialization-barrier pipeline shape; the oracle checks the fused
    equivalent."""
    from hadoop_20_warehouse_fix_spark.plans.jobcontrol import SUCCESS, Step, run_dag

    def step_a(_results: dict) -> DataFrame:
        return (
            load_table(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n_orders"))
        )

    def step_b(results: dict) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer")
        return (
            cust.join(results["orders_per_cust"], cust["c_custkey"] == F.col("o_custkey"))
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                F.sum("n_orders").alias("total_orders"),
            )
        )

    states = run_dag(
        [Step("orders_per_cust", step_a), Step("segment_rollup", step_b, deps=["orders_per_cust"])]
    )
    assert all(s == SUCCESS for s in states.values()), states
    return run_dag.last_results["segment_rollup"]


@query(
    "plan_observed_counters",
    oracle="""
    SELECT count(*) AS input_records,
           count(*) FILTER (WHERE l_quantity >= 25) AS large_qty
    FROM lineitem
    """,
)
def plan_observed_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counters (MAP_INPUT_RECORDS-style) via ``df.observe``: metric
    expressions ride the scan with zero extra passes; the collected
    observation is returned as a one-row DataFrame and checked against
    SQL — proving the counters equal a dedicated aggregation without
    costing one."""
    from hadoop_20_warehouse_fix_spark.plans.counters import observed

    li = load_table(spark, sf_dir, "lineitem")
    df, obs = observed(
        li,
        input_records=F.count(F.lit(1)),
        large_qty=F.count(F.when(F.col("l_quantity") >= 25, 1)),
    )
    df.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(int(m["input_records"]), int(m["large_qty"]))],
        "input_records bigint, large_qty bigint",
    )
