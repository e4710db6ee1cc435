"""Query registry — the driver-facing inventory of implemented operators.

Every operator claimed in SURVEY.md §2 is present here as a named query
over the testdata tables, with (where SQL-expressible) a DuckDB oracle
string whose column names match the Spark result exactly.

Float discipline: aggregate outputs that sum doubles are rounded (both
sides, same digits) so the order-insensitive value hash is stable across
Spark's and DuckDB's different summation orders.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Register a query. ``oracle`` is DuckDB SQL over the pre-registered
    views (region nation customer supplier part orders lineitem events
    documents embeddings) producing identical column names."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: registration)."""
    from hadoop_20_warehouse_fix_spark.queries import (  # noqa: F401
        aggregates,
        corpus,
        dedup,
        joins,
        multimodal,
        pipes,
        plans,
        relational,
        similarity,
        sorts,
        sources,
        storage,
        streaming,
        text,
        tpch_extra,
    )

    return REGISTRY
