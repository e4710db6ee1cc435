"""PySpark-native analytics engine with the capabilities of the
``jchen123/hadoop-20-warehouse-fix`` reference (Facebook's Hadoop 0.20
warehouse fork — see SURVEY.md).

The reference is a MapReduce + HDFS substrate; its query capabilities
(sort-shuffle dataflow, relational operator library, script UDFs, storage
formats, job DAG control) are re-expressed here as a thin, idiomatic
PySpark layer: DataFrame/SQL declarative plans optimized by Catalyst,
Parquet storage, Structured Streaming for streams, plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal plumbing).

Design rules (enforced throughout):
- DataFrame, never RDD (exception: ``pipe`` — the Hadoop Streaming analog).
- No ``collect()`` in any operator path; everything stays distributed.
- Built-in ``pyspark.sql.functions`` in hot paths; Pandas UDFs only where
  built-ins genuinely cannot express the semantics.
- Designed for 100 TB: broadcast-able dims are broadcast, aggregations are
  partial-aggregated map-side (automatic), sorts are range-partitioned,
  approximate variants (HLL, percentile_approx, LSH) are first-class.
"""

from hadoop_20_warehouse_fix_spark.session import build_session
from hadoop_20_warehouse_fix_spark.catalog import TABLES, load_table, register_tables

__all__ = ["build_session", "TABLES", "load_table", "register_tables"]
__version__ = "0.1.0"
