"""Driver-contract smoke: entry() runs and returns rows with a schema."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_runs(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0


def test_contract_shapes(spark):
    qs = e.queries()
    oracles = e.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
