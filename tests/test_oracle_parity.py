"""Run every registered query against its DuckDB oracle at sf0.01 —
the same check the driver's correctness gate performs."""

from __future__ import annotations

import pytest

from hadoop_20_warehouse_fix_spark.queries import load_all
from tests.conftest import SF_CORRECT
from tests.oracle import compare

REGISTRY = load_all()
WITH_ORACLE = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_CORRECT)
    problems = compare(df, spec.oracle, SF_CORRECT)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.columns) > 0
