"""Table catalog over the driver's Parquet testdata layout.

The reference has no catalog — "schema" is whatever Writable classes a
JobConf declares (SURVEY.md §1.1). Here the catalog is explicit: one
Parquet file (or directory) per table under a scale-factor directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor (region
# and nation are bounded by geography, not data volume). At 100 TB these
# stay broadcast-joinable; customer/supplier/part grow with SF and are
# left to AQE's size-based broadcast decision.
ALWAYS_BROADCAST = {"region", "nation"}


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Make TIMESTAMP(NANOS) parquet columns readable on ANY session.

    ``spark.sql.legacy.parquet.nanosAsLong`` is a runtime-settable SQL
    conf; callers may hand us a vanilla SparkSession (the driver harness
    does), so the catalog sets it itself rather than relying on
    build_session. Safe to call repeatedly; swallow failures so a
    session that forbids the conf still works for nanos-free tables."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Columnar Parquet scan: Catalyst prunes
    columns and pushes predicates down to the reader for free.

    events.ts is stored as TIMESTAMP(NANOS); Spark reads it as long
    nanos (``spark.sql.legacy.parquet.nanosAsLong``, set here at runtime
    so even an externally built session works) and we normalize to a
    microsecond timestamp — one cast at the scan, JVM-side."""
    ensure_nanos_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # Integer division: `/` would divide as double and round on the
        # half-microsecond, off-by-1µs vs engines that truncate (DuckDB).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register every table as a temp view so SQL-form queries work."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
