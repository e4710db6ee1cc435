"""Job-DAG controller (SURVEY.md §2.9).

The reference's JobControl (``M/jobcontrol/JobControl.java:40`` +
``Job.addDependingJob:249``) ran a set of MapReduce jobs respecting
dependencies, with states WAITING → READY → RUNNING → SUCCESS / FAILED /
DEPENDENT_FAILED. In Spark most "multi-job pipelines" collapse into ONE
lazy DataFrame DAG (Catalyst sees the whole thing); this controller
exists for the cases that genuinely need materialization barriers —
checkpoints to storage, iterative steps, side-effecting sinks.

Each Step's callable receives the dict of already-completed results
(name → return value) so downstream steps can consume upstream outputs.
Failure semantics match the reference: a failed step marks every
transitive dependent DEPENDENT_FAILED; independent branches keep running.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

WAITING, READY, RUNNING, SUCCESS, FAILED, DEPENDENT_FAILED = (
    "WAITING", "READY", "RUNNING", "SUCCESS", "FAILED", "DEPENDENT_FAILED",
)


@dataclass
class Step:
    name: str
    fn: Callable[[dict], object]
    deps: list[str] = field(default_factory=list)


def run_dag(steps: list[Step]) -> dict[str, str]:
    """Run steps in dependency order; return name → final state.
    Deterministic: ready steps execute in list order (the reference
    polled jobs in insertion order too)."""
    names = [s.name for s in steps]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate step names: {dupes} — the second would silently never run")
    by_name = {s.name: s for s in steps}
    for s in steps:
        for d in s.deps:
            if d not in by_name:
                raise ValueError(f"step {s.name!r} depends on unknown step {d!r}")
    states = {s.name: WAITING for s in steps}
    results: dict[str, object] = {}
    errors: dict[str, Exception] = {}

    def dependents_of(name: str) -> list[str]:
        return [s.name for s in steps if name in s.deps]

    def mark_dependent_failed(name: str) -> None:
        for dep in dependents_of(name):
            if states[dep] in (WAITING, READY):
                states[dep] = DEPENDENT_FAILED
                mark_dependent_failed(dep)

    progressed = True
    while progressed:
        progressed = False
        for s in steps:
            if states[s.name] != WAITING:
                continue
            if any(states[d] in (FAILED, DEPENDENT_FAILED) for d in s.deps):
                states[s.name] = DEPENDENT_FAILED
                mark_dependent_failed(s.name)
                progressed = True
                continue
            if all(states[d] == SUCCESS for d in s.deps):
                states[s.name] = RUNNING
                try:
                    results[s.name] = s.fn(results)
                    states[s.name] = SUCCESS
                except Exception as exc:  # noqa: BLE001 — reference records, not raises
                    states[s.name] = FAILED
                    errors[s.name] = exc
                    mark_dependent_failed(s.name)
                progressed = True
    if any(st == WAITING for st in states.values()):
        # No step progressed but some never became runnable: a
        # dependency cycle. Silent WAITING states would read as
        # "non-failed" to a caller checking only for FAILED.
        stuck = sorted(n for n, st in states.items() if st == WAITING)
        raise ValueError(f"dependency cycle — steps never became runnable: {stuck}")
    run_dag.last_results = results  # introspection for callers/tests
    run_dag.last_errors = errors
    return states
