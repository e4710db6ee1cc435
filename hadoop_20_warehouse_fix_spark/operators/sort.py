"""Sort / limit / top-k / secondary-sort operators (SURVEY.md §2.5, §2.6).

Reference mechanisms and their Spark physics:
- Total-order sort (``M/lib/TotalOrderPartitioner.java:41`` + InputSampler
  ``:314``): sample keys → range-partition → per-partition sort. Spark's
  ``orderBy`` does exactly this internally (RangePartitioner reservoir
  sampling), so ``total_order_sort`` is declarative.
- Secondary sort (``E/SecondarySort.java:51``: FirstPartitioner +
  grouping comparator): partition by k1, stream values ordered by k2.
  Spark analogs: window functions, or per-group sorted arrays.
- Top-k (``E/Grep.java:61-80`` sort-by-count-desc + single reducer):
  ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — per-partition
  heaps, no global sort materialization. The reference needed a
  1-reducer job for this; Spark's version is scale-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def total_order_sort(df: DataFrame, cols: Sequence[Column | str], num_partitions: int | None = None) -> DataFrame:
    """Globally ordered output across partitions. ``orderBy`` range
    partitions on sampled split points — the TotalOrderPartitioner +
    InputSampler pipeline as one declarative op."""
    if num_partitions is not None:
        return df.repartitionByRange(num_partitions, *cols).sortWithinPartitions(*cols)
    return df.orderBy(*cols)


def with_global_rank(df: DataFrame, cols: Sequence[Column | str], rank_name: str = "rank") -> DataFrame:
    """Attach a 1-based global rank in sort order — turns ordering into
    checkable data (the SortValidator idea: prove global order by
    content, ``SortValidator.java:93-97``).

    Note: a single-direction global row_number needs one ordered pass; at
    100 TB prefer ``zipWithIndex``-free alternatives (rank ranges per
    partition via partition-level offsets). Used here at correctness
    scale; ranks per group use ``top_k_per_group``."""
    w = Window.orderBy(*cols)
    return df.withColumn(rank_name, F.row_number().over(w))


def top_k(df: DataFrame, order_cols: Sequence[Column], k: int) -> DataFrame:
    """Global top-k: TakeOrderedAndProject (per-partition heap + merge of
    k-row heads — shuffle volume k×partitions, not the full data)."""
    return df.orderBy(*order_cols).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_name: str = "rn",
) -> DataFrame:
    """Top-k within each group via ranked window — the secondary-sort
    idiom (partition by k1, order by k2) with a rank cutoff."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_name, F.row_number().over(w)).filter(F.col(rank_name) <= k)


def grouped_ordered_list(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_name: str = "values",
) -> DataFrame:
    """Secondary sort as data: per group, the list of values in
    ``order_col`` order — what the reference's reducer saw as its ordered
    values iterator (``M/ReduceTask.java:226``).

    Implementation: collect (order, value) structs, ``sort_array`` (struct
    ordering is field-order lexicographic), project the value — all
    JVM-side; no Python, no per-group shuffle beyond the groupBy."""
    pair = F.struct(F.col(order_col).alias("_o"), F.col(value_col).alias("_v"))
    return df.groupBy(*group_cols).agg(
        F.transform(F.sort_array(F.collect_list(pair)), lambda s: s["_v"]).alias(out_name)
    )
