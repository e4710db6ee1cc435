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
    num_file_scans: int
    codegen_spans: int
    pushed_filters: list[str]
    read_schemas: list[str]
    #: When set (adaptive_final_summary), the node ids of the AQE FINAL
    #: plan tree — detail-section methods filter on it so initial-plan
    #: copies of the same operators don't double-report.
    node_ids: frozenset[str] | None = None

    def broadcast_inputs(self) -> list[set[str]]:
        """Column-name sets entering each BroadcastExchange — the bytes
        actually shipped to every executor. At 100 TB broadcast width is
        the first executor-OOM lever, so tests assert these sets carry
        only the join keys + projected columns."""
        out = []
        for m in re.finditer(r"\((\d+)\) BroadcastExchange\n(?:.*\n)*?Input \[\d+\]: \[([^\]]*)\]", self.text):
            if self.node_ids is not None and m.group(1) not in self.node_ids:
                continue
            out.append({c.strip().split("#")[0] for c in m.group(2).split(",") if c.strip()})
        return out

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
    qe = df._jdf.queryExecution()
    # The simple plan string truncates long field lists (PushedFilters
    # with >~5 entries lose their closing bracket); the formatted
    # explain prints them in full. Keep the simple string only for the
    # "*(n)" whole-stage-codegen span markers, which formatted omits.
    simple = qe.executedPlan().toString()
    formatted = df.sparkSession._jvm.PythonSQLUtils.explainString(qe, "formatted")
    return _summarize(simple, formatted)


def adaptive_final_summary(df: DataFrame) -> PlanSummary:
    """Summary of the AQE FINAL plan — the plan that actually ran.

    AQE's runtime rewrites (SMJ→BHJ conversion, AQEShuffleRead
    coalescing, skew splits) are invisible to :func:`plan_summary`,
    which sees the pre-execution AdaptiveSparkPlan. This executes the
    DataFrame's own QueryExecution JVM-side (``executedPlan().execute()
    .count()`` — per-partition longs only, no rows reach the driver) so
    AQE finalizes, then summarizes ONLY the ``== Final Plan ==`` section
    (the explain string echoes the Initial Plan afterwards; counting
    both would double every node). Round-10 verdict #3: pin these next
    to the static pins so runtime plan drift is also mechanical."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    txt = plan.toString()
    if "AdaptiveSparkPlan" in txt and "isFinalPlan=true" not in txt:
        plan.execute().count()
    simple = qe.executedPlan().toString()
    formatted = df.sparkSession._jvm.PythonSQLUtils.explainString(qe, "formatted")
    if "== Final Plan ==" not in formatted:
        # No adaptive wrapper anywhere in the plan: static IS final.
        return _summarize(simple, formatted)
    # Formatted explain prints the final tree, then the initial tree,
    # then ONE detail section per node id covering BOTH trees — so
    # counting detail headers (what _summarize does) double-counts
    # every node, and slicing the text at "== Initial Plan ==" drops
    # the detail sections entirely (both found empirically, round 11).
    # Count node kinds from the FINAL tree lines, and join scan node
    # ids back to their detail blocks for PushedFilters / ReadSchema.
    # Scan tree lines may carry a catalog name between format and id
    # ("Scan parquet spark_catalog.default.t (1)") — the pattern must
    # not assume a single token (round-11 review).
    tree = formatted.split("== Final Plan ==", 1)[1].split("== Initial Plan ==", 1)[0]
    if "== Final Plan ==" in simple:
        simple_final = simple.split("== Final Plan ==", 1)[1].split("== Initial Plan ==", 1)[0]
    else:
        simple_final = simple
    scan_ids = set(re.findall(r"\bScan\b[^(\n]*\((\d+)\)", tree))
    pushed, schemas = [], []
    for block in formatted.split("\n\n"):
        m = re.match(r"\((\d+)\) Scan ", block.strip())
        if not m or m.group(1) not in scan_ids:
            continue
        pushed += re.findall(r"PushedFilters: \[([^\]]*)\]", block)
        schemas += re.findall(r"ReadSchema: struct<([^>]*)>", block)
    return PlanSummary(
        # FULL formatted text (tree + detail sections), not the sliced
        # tree: detail-driven methods (broadcast_inputs) need the
        # blocks and filter by node_ids instead (round-11 review — the
        # sliced form made broadcast_inputs() silently return []).
        text=formatted,
        # \bExchange skips BroadcastExchange (no word boundary mid-word)
        # and ShuffleQueryStage/AQEShuffleRead wrappers by name
        num_exchanges=len(re.findall(r"\bExchange \(\d+\)", tree)),
        num_broadcast_joins=len(re.findall(r"\bBroadcastHashJoin\b", tree)),
        num_sortmerge_joins=len(re.findall(r"\bSortMergeJoin\b", tree)),
        num_file_scans=len(re.findall(r"\bScan\b[^(\n]*\(\d+\)", tree)),
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", simple_final))),
        pushed_filters=pushed,
        read_schemas=schemas,
        node_ids=frozenset(re.findall(r"\((\d+)\)", tree)),
    )


def _summarize(simple: str, formatted: str) -> PlanSummary:
    return PlanSummary(
        text=formatted,
        # "(n) Exchange" = shuffle; BroadcastExchange is counted via joins
        num_exchanges=len(re.findall(r"\(\d+\) Exchange\b", formatted)),
        num_broadcast_joins=len(re.findall(r"\(\d+\) BroadcastHashJoin", formatted)),
        num_sortmerge_joins=len(re.findall(r"\(\d+\) SortMergeJoin", formatted)),
        # each "(n) Scan <format>" node = one pass over a source; a query
        # that re-reads the same fact table N times shows N scans here
        num_file_scans=len(re.findall(r"\(\d+\) Scan ", formatted)),
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", simple))),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", formatted),
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", formatted),
    )
