"""Shared fixtures: one SparkSession per test session, sf dirs."""

from __future__ import annotations

import os
import sys
import time

# Pin the PROCESS timezone before any Spark session exists: PySpark's
# TimestampType.fromInternal converts via datetime.fromtimestamp (OS
# local tz), so collected timestamp columns — hence every oracle
# comparison that returns one raw — are tz-dependent. The engine's own
# epoch math is proven tz-independent by the TZ=America/New_York
# subprocess test; this pin makes the raw-timestamp comparisons
# portable too.
os.environ["TZ"] = "UTC"
time.tzset()

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from hadoop_20_warehouse_fix_spark.session import build_session

    spark = build_session(app_name="h20wf-tests", shuffle_partitions=8)
    yield spark
    spark.stop()
