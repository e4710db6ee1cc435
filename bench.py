"""Benchmark harness (driver contract): run headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; print ONE JSON line with per-query seconds.

Each query is forced through a noop-sink write (`format("noop")`): the
v2 write consumes EVERY output row and column, so the full plan
executes without shipping wide rows to the driver. A bare .count() is
NOT a valid forcing action — Catalyst prunes everything the count does
not need (a pure sort+project query collapses to a metadata row-count
with ReadSchema struct<>, and aggregate VALUES are dropped when only
the group count is consumed). Round 4 found sort_total_order timing a
no-op this way; SCALING.md records the discontinuity this fix creates
in cross-round totals.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _wait_for_quiet(
    threshold: float = 3.0, max_wait: float = 120.0, poll: float = 5.0
) -> dict:
    """Load gate (round-6 verdict: three consecutive rounds' bench
    deltas were ambient-load artifacts, not code). Wait until the 1-min
    loadavg drops below ``threshold`` or ``max_wait`` elapses, BEFORE
    any Spark work contributes our own threads to the number. The gate
    outcome is recorded in the payload so cross-round comparisons know
    whether the box was quiet."""
    t0 = time.monotonic()
    load = os.getloadavg()[0]
    while load >= threshold and time.monotonic() - t0 < max_wait:
        time.sleep(poll)
        load = os.getloadavg()[0]
    return {
        "threshold": threshold,
        "waited_sec": round(time.monotonic() - t0, 1),
        "load_at_start": round(load, 2),
        "satisfied": load < threshold,
    }


def _own_cpu_seconds() -> float | None:
    """Cumulative CPU seconds of this process AND its descendants (the
    py4j-spawned JVM is a live child, so RUSAGE_CHILDREN — reaped
    children only — would miss all executor work). Linux /proc walk;
    None where /proc is unavailable. Each live process contributes
    utime+stime PLUS cutime+cstime (CPU of its already-reaped children
    — round-8 ADVICE: omitting those undercounts our own finished
    Python workers and can false-positive the ambient caveat); reaped
    children are gone from /proc so the two terms never double-count.
    Descendants reparented to init before we walk remain invisible —
    a residual undercount the caveat wording acknowledges."""
    try:
        tick = os.sysconf("SC_CLK_TCK")
        stats = {}  # pid -> (ppid, utime+stime+cutime+cstime ticks)
        for entry in os.listdir("/proc"):
            if not entry.isdigit():
                continue
            try:
                with open(f"/proc/{entry}/stat") as fh:
                    raw = fh.read()
            except OSError:
                continue  # process exited mid-walk
            # field 2 (comm) may contain spaces; parse after the last ')'
            rest = raw.rsplit(")", 1)[1].split()
            cpu = int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
            stats[int(entry)] = (int(rest[1]), cpu)
        mine = {os.getpid()}
        grew = True
        while grew:  # transitive closure over the ppid tree
            grew = False
            for pid, (ppid, _) in stats.items():
                if ppid in mine and pid not in mine:
                    mine.add(pid)
                    grew = True
        return sum(stats[p][1] for p in mine if p in stats) / tick
    except Exception:  # noqa: BLE001 — diagnostics must never kill the bench
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    bench_t0 = time.monotonic()
    from hadoop_20_warehouse_fix_spark.queries import load_all
    from hadoop_20_warehouse_fix_spark.session import build_session

    registry = load_all()
    headline = {n: s for n, s in registry.items() if s.headline}

    # Gate on AMBIENT load (before the JVM spins up 32 executor
    # threads of our own): if the box never quiets within the budget,
    # proceed but mark the payload so the delta is read with the caveat.
    gate = _wait_for_quiet(
        threshold=float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "3.0")),
        max_wait=float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "120")),
    )

    spark = build_session(app_name="h20wf-bench")
    # Warm the JVM/codegen machinery once so per-query numbers measure
    # the queries, not session startup: parquet scan path, whole-stage
    # codegen compiler, shuffle exchange, window/sort, broadcast join,
    # and the interpreted higher-order-function evaluator.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    warm = spark.range(1000).select(
        F.col("id"), F.explode(F.transform(F.sequence(F.lit(0), F.lit(3)), lambda i: i + F.col("id"))).alias("x")
    )
    warm = warm.withColumn("r", F.row_number().over(Window.partitionBy(F.col("x") % 7).orderBy("id")))
    warm.groupBy((F.col("x") % 11).alias("k")).agg(F.count(F.lit(1)), F.min("id"), F.sum("x")).join(
        F.broadcast(spark.range(11).withColumnRenamed("id", "k")), "k"
    ).count()
    # JIT warmup iteration: run each headline query once at the smallest
    # available scale factor so the timed runs measure steady-state
    # execution, not one-time Janino compilation of each query's
    # generated classes (plan shape — hence generated code — is
    # identical across SFs; only the data volume differs).
    def force(df) -> None:
        """Execute the FULL plan: noop v2 write consumes every row/column."""
        df.write.mode("overwrite").format("noop").save()

    smallest = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(smallest) and os.path.realpath(smallest) != os.path.realpath(sf_dir):
        for name, spec in sorted(headline.items()):
            try:
                force(spec.fn(spark, smallest))
            except Exception:
                pass  # warmup is best-effort; the timed run will surface real failures
        spark.catalog.clearCache()  # drop warmup-persisted intermediates

    # Per-query fault isolation: one red query must cost ITS number, not
    # the whole bench (round 2 lost all perf signal to a single analysis
    # error). Failures go to stderr + an "errors" map; the JSON line
    # still prints for the survivors.
    #
    # Converged-min timing (round-6 brief #2): each query runs until two
    # CONSECUTIVE runs agree within 5% (max 4 runs), reporting the MIN —
    # a transient load spike / GC pause inflates one run, rarely two in
    # a row, so the converged min is the stable cross-round comparator
    # (rounds 3/5/6 all had uniformly inflated numbers from ambient
    # load on untouched plans). min-of-N is directly comparable to the
    # historical min_of_2 label; extra runs only fire when the first
    # two disagree.
    per_query: dict[str, float] = {}
    run_counts: dict[str, int] = {}
    errors: dict[str, str] = {}
    max_runs = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_RUNS", "4"))
    for name, spec in sorted(headline.items()):
        times: list[float] = []
        for _ in range(max_runs):
            t0 = time.perf_counter()
            try:
                force(spec.fn(spark, sf_dir))
                times.append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001 — keep benching survivors
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(json.dumps({"query": name, "err": errors[name]}), file=sys.stderr)
                break
            finally:
                # Queries that persist intermediates (corpus_clean) must not
                # leak cached partitions into the next run's memory budget.
                spark.catalog.clearCache()
            # 50 ms absolute floor: sub-second queries would otherwise
            # burn every retry chasing 5% of scheduler noise.
            tol = max(0.05 * min(times[-1], times[-2]) if len(times) >= 2 else 0, 0.05)
            if len(times) >= 2 and abs(times[-1] - times[-2]) <= tol:
                break
        # A query is either a survivor or an error, never both: a mid-
        # sequence failure must not leave a partial time in the map
        # (it would silently enter the cross-round total as a valid
        # measurement while also appearing under "errors").
        if times and name not in errors:
            per_query[name] = round(min(times), 3)
            run_counts[name] = len(times)

    # Amortized IVF (round-5 brief #6): the headline sim_ann_ivf_md5
    # number pays the codebook corpus pass on every run; production
    # builds the codebook once per corpus and serves query batches
    # against it (ivf_codebook split out for exactly this). Report the
    # steady-state number alongside, under its own key so "queries" and
    # "value" stay comparable across rounds.
    amortized: dict[str, float] = {}
    try:
        from pyspark.sql import functions as F  # noqa: F811

        from hadoop_20_warehouse_fix_spark.catalog import load_table
        from hadoop_20_warehouse_fix_spark.operators.similarity import (
            ivf_codebook,
            ivf_topk,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        cb = ivf_codebook(emb, n_centroids=16, codebook="sample_md5")  # paid once
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            force(
                ivf_topk(
                    emb,
                    emb.filter(F.col("vec_id") < 10),
                    k=5,
                    n_centroids=16,
                    nprobe=4,
                    precomputed_codebook=cb,
                )
            )
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        amortized["sim_ann_ivf_md5"] = round(min(times), 3)
    except Exception as exc:  # noqa: BLE001 — extra metric must not kill the bench
        print(json.dumps({"amortized_err": f"{type(exc).__name__}: {exc}"[:300]}), file=sys.stderr)

    # End-load accounting FIRST (round-7 verdict "what's wrong" #1: the
    # gate only checked load at START; r7's box went 2.88 -> 5.97 DURING
    # the run and the driver artifact read 25% above the same-code
    # quiet-box number). Estimate the bench's OWN average core usage
    # from the process tree's cumulative CPU over the bench wall,
    # subtract it from the end 1-min loadavg, and caveat when the
    # residual — other people's work — exceeds the gate threshold.
    # This runs BEFORE the fingerprint block (round-10 ADVICE): some
    # query builders execute real Spark jobs during construction
    # (persist/count/Observation barriers), so sampling load after them
    # would blame the timed section for the fingerprint block's work.
    own_cpu = _own_cpu_seconds()
    wall = time.monotonic() - bench_t0
    load_end_1min = os.getloadavg()[0]
    load_now = [round(x, 2) for x in os.getloadavg()]

    # Plan fingerprints (round 10): the same shape counts
    # tests/test_plans.py pins, captured from THIS run's build at THIS
    # SF, so every bench artifact carries its own load-vs-plan-drift
    # adjudication — a cross-round delta with identical fingerprints is
    # load by elimination. Two sets: "static" (pre-execution plan; note
    # some builders run real jobs during construction) and "final" (the
    # AQE runtime plan after a JVM-side forced execution — catches
    # SMJ→BHJ conversion / coalescing drift the static plan can't).
    # Both print as their OWN stdout lines below: round 10 appended them
    # to the payload line, pushing it past the driver's 2000-char tail
    # capture and leaving BENCH_r10.json unparseable.
    plan_fp: dict[str, dict[str, int]] = {}
    plan_fp_final: dict[str, dict[str, int]] = {}
    try:
        from hadoop_20_warehouse_fix_spark.plans.inspect import (
            adaptive_final_summary,
            plan_summary,
        )

        for name, spec in sorted(headline.items()):
            if name in errors:
                continue
            # ONE build per query: static summary first, then force the
            # SAME QueryExecution for the AQE final plan — builders that
            # run jobs during construction must not pay twice.
            df = spec.fn(spark, sf_dir)
            plan_fp[name] = _fingerprint(plan_summary(df))
            plan_fp_final[name] = _fingerprint(adaptive_final_summary(df))
            spark.catalog.clearCache()  # the fns persist intermediates
    except Exception as exc:  # noqa: BLE001 — extra metric must not kill the bench
        print(json.dumps({"plan_fp_err": f"{type(exc).__name__}: {exc}"[:300]}), file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf  # non-numeric suffix: report verbatim, never crash post-run
    payload = assemble_payload(
        per_query=per_query,
        sf_val=sf_val,
        load_now=load_now,
        gate=gate,
        own_cpu=own_cpu,
        wall=wall,
        load_end_1min=load_end_1min,
        amortized=amortized,
        errors=errors,
    )
    # Bulky diagnostics (fingerprints, run counts) go on their OWN line,
    # BEFORE the payload: the driver keeps only the last ~2000 chars of
    # output and parses the final JSON line, so the payload line must
    # stay small and last (round-10 "what's wrong" #1).
    print(
        json.dumps(
            {
                "bench_diagnostics": {
                    "runs": run_counts,
                    "plan_fingerprints": plan_fp,
                    "plan_fingerprints_final": plan_fp_final,
                }
            }
        )
    )
    line = json.dumps(payload)
    if len(line) > PAYLOAD_LINE_BUDGET:  # belt-and-braces: never ship a clipped payload
        payload.pop("caveat", None)
        payload["truncated"] = True
        line = json.dumps(payload)
    print(line)
    spark.stop()


#: Hard budget for the final stdout line. The driver records only the
#: last 2000 characters of bench output and parses the trailing JSON
#: line; Spark WARN lines may land between the diagnostics line and the
#: payload, so the payload itself must stay comfortably inside the
#: window (round-10 BENCH artifact was parsed:null from exactly this).
PAYLOAD_LINE_BUDGET = 1800


def _fingerprint(s) -> dict[str, int]:
    """Shape counts matching tests/test_plans.py pins exactly —
    including `pushed` (scans with non-empty PushedFilters), which the
    round-10 emission omitted (round-10 ADVICE: a pushed-filter
    regression was invisible to bench artifacts)."""
    return {
        "exchanges": s.num_exchanges,
        "broadcast_joins": s.num_broadcast_joins,
        "sortmerge_joins": s.num_sortmerge_joins,
        "file_scans": s.num_file_scans,
        "pushed": len([p for p in s.pushed_filters if p.strip()]),
    }


def assemble_payload(
    per_query: dict[str, float],
    sf_val: float | str,
    load_now: list[float],
    gate: dict,
    own_cpu: float | None,
    wall: float,
    load_end_1min: float,
    amortized: dict[str, float] | None = None,
    errors: dict[str, str] | None = None,
) -> dict:
    """Assemble the single driver-facing payload line (pure function so
    tests can pin its serialized size against PAYLOAD_LINE_BUDGET with a
    realistic 14-query map). Everything bulky (fingerprints, run counts)
    lives on the separate diagnostics line, not here."""
    payload: dict = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf_val,
        "timing": "min_converged_5pct_max4",
        # 1/5/15-min load averages at bench end: cross-round deltas are
        # only meaningful when load is comparable.
        "load": load_now,
        # Pre-session ambient-load gate outcome; when satisfied=false the
        # box never quieted and deltas carry the load caveat explicitly.
        "load_gate": gate,
    }
    if own_cpu is not None and wall > 0:
        own_avg_cores = round(own_cpu / wall, 2)
        ambient_end = round(max(0.0, load_end_1min - own_avg_cores), 2)
        payload["load_end"] = {
            "load_1min": round(load_end_1min, 2),
            "own_avg_cores": own_avg_cores,
            "ambient_estimate": ambient_end,
        }
        if gate["satisfied"] and ambient_end >= gate["threshold"]:
            payload["caveat"] = (
                f"box loaded up DURING the run: end 1-min loadavg {load_end_1min:.2f}"
                f" minus our own ~{own_avg_cores} avg cores leaves ambient "
                f"~{ambient_end} >= gate {gate['threshold']} — totals are "
                "load-confounded despite the satisfied start gate"
            )
    if not gate["satisfied"]:
        payload["caveat"] = (
            f"ambient 1-min loadavg {gate['load_at_start']} never dropped below "
            f"{gate['threshold']} within {gate['waited_sec']}s — numbers are "
            "load-confounded; compare only the converged-min structure, not totals"
        )
    if amortized:
        payload["amortized"] = amortized
    if errors:
        # Full messages already went to stderr per-query; the payload
        # carries a bounded digest so a many-failure run cannot blow the
        # line budget and take the survivors' numbers down with it.
        digest = {k: v[:80] for k, v in sorted(errors.items())[:8]}
        if len(errors) > 8:
            digest["..."] = f"+{len(errors) - 8} more (stderr has all)"
        payload["errors"] = digest
    return payload


if __name__ == "__main__":
    main()
