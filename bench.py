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

    # Plan fingerprints (round 10): the same shape counts
    # tests/test_plans.py pins, captured from THIS run's build at THIS
    # SF, so every bench artifact carries its own load-vs-plan-drift
    # adjudication — a cross-round delta with identical fingerprints is
    # load by elimination. Planning only (no execution); failures never
    # kill the bench.
    plan_fp: dict[str, dict[str, int]] = {}
    try:
        from hadoop_20_warehouse_fix_spark.plans.inspect import plan_summary

        for name, spec in sorted(headline.items()):
            if name in errors:
                continue
            s = plan_summary(spec.fn(spark, sf_dir))
            plan_fp[name] = {
                "exchanges": s.num_exchanges,
                "broadcast_joins": s.num_broadcast_joins,
                "sortmerge_joins": s.num_sortmerge_joins,
                "file_scans": s.num_file_scans,
            }
        spark.catalog.clearCache()  # the fns above persist intermediates
    except Exception as exc:  # noqa: BLE001 — extra metric must not kill the bench
        print(json.dumps({"plan_fp_err": f"{type(exc).__name__}: {exc}"[:300]}), file=sys.stderr)

    total = round(sum(per_query.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf  # non-numeric suffix: report verbatim, never crash post-run
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf_val,
        "timing": "min_converged_5pct_max4",
        # 1/5/15-min load averages at bench end: cross-round deltas are
        # only meaningful when load is comparable.
        "load": [round(x, 2) for x in os.getloadavg()],
        # Pre-session ambient-load gate outcome; when satisfied=false the
        # box never quieted and deltas carry the load caveat explicitly.
        "load_gate": gate,
        "runs": run_counts,
    }
    if plan_fp:
        payload["plan_fingerprints"] = plan_fp
    # End-load accounting (round-7 verdict "what's wrong" #1: the gate
    # only checked load at START; r7's box went 2.88 -> 5.97 DURING the
    # run and the driver artifact read 25% above the same-code quiet-box
    # number). Estimate the bench's OWN average core usage from the
    # process tree's cumulative CPU over the bench wall, subtract it
    # from the end 1-min loadavg, and caveat when the residual —
    # other people's work — exceeds the gate threshold.
    own_cpu = _own_cpu_seconds()
    wall = time.monotonic() - bench_t0
    load_end = os.getloadavg()[0]
    if own_cpu is not None and wall > 0:
        own_avg_cores = round(own_cpu / wall, 2)
        ambient_end = round(max(0.0, load_end - own_avg_cores), 2)
        payload["load_end"] = {
            "load_1min": round(load_end, 2),
            "own_avg_cores": own_avg_cores,
            "ambient_estimate": ambient_end,
        }
        if gate["satisfied"] and ambient_end >= gate["threshold"]:
            payload["caveat"] = (
                f"box loaded up DURING the run: end 1-min loadavg {load_end:.2f}"
                f" minus our own ~{own_avg_cores} avg cores leaves ambient "
                f"~{ambient_end} >= gate {gate['threshold']} — totals are "
                "load-confounded despite the satisfied start gate (own-cores "
                "excludes descendants reparented away before exit, so true "
                "ambient may be smaller)"
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
        payload["errors"] = errors
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
