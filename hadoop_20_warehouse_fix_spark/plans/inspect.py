"""Physical-plan introspection — the engine's ".explain discipline".

Everything the build optimizes for at 100 TB is visible in the executed
plan string: pushed filters, pruned read schemas, broadcast vs
sort-merge exchanges, whole-stage codegen spans. ``plan_summary`` parses
those signals so tests can ASSERT plan shape (filter pushed down, no
exchange on a bucketed join, join strategy chosen) instead of eyeballing
``.explain`` output.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    text: str
    num_exchanges: int
    num_broadcast_joins: int
    num_sortmerge_joins: int
    codegen_spans: int
    pushed_filters: list[str]
    read_schemas: list[str]

    def scans_only_columns(self, *cols: str) -> bool:
        """True if every file scan reads a subset of ``cols`` — column
        pruning proof."""
        want = set(cols)
        for schema in self.read_schemas:
            got = set(re.findall(r"(\w+):", schema))
            if not got <= want:
                return False
        return True


def plan_summary(df: DataFrame) -> PlanSummary:
    text = df._jdf.queryExecution().executedPlan().toString()
    return PlanSummary(
        text=text,
        num_exchanges=len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", text)),
        num_broadcast_joins=text.count("BroadcastHashJoin"),
        num_sortmerge_joins=text.count("SortMergeJoin"),
        # codegen spans print as "WholeStageCodegen (n)" in formatted mode
        # and "*(n)" in the simple plan string
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", text))),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", text),
    )
