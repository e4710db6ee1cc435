"""Tests for plans/ (JobControl DAG, observe counters, plan inspection)
and sources/generators (TeraGen/RandomTextWriter/SortValidator analogs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.plans import Step, observed, plan_summary, run_dag
from hadoop_20_warehouse_fix_spark.plans.jobcontrol import (
    DEPENDENT_FAILED,
    FAILED,
    SUCCESS,
)
from hadoop_20_warehouse_fix_spark.sources.generators import (
    random_text,
    sort_validate,
    teragen,
)

SF = "/root/testdata/sf0.001"


def test_run_dag_order_and_results():
    log = []
    states = run_dag(
        [
            Step("a", lambda r: log.append("a") or 1),
            Step("b", lambda r: log.append("b") or r["a"] + 1, deps=["a"]),
            Step("c", lambda r: log.append("c") or r["b"] * 10, deps=["b"]),
            Step("x", lambda r: log.append("x") or 99),  # independent branch
        ]
    )
    assert all(s == SUCCESS for s in states.values())
    assert log.index("a") < log.index("b") < log.index("c")
    assert run_dag.last_results["c"] == 20


def test_run_dag_dependent_failed():
    states = run_dag(
        [
            Step("a", lambda r: 1),
            Step("boom", lambda r: 1 / 0, deps=["a"]),
            Step("after", lambda r: 2, deps=["boom"]),
            Step("other", lambda r: 3, deps=["a"]),
        ]
    )
    assert states == {"a": SUCCESS, "boom": FAILED, "after": DEPENDENT_FAILED, "other": SUCCESS}
    assert isinstance(run_dag.last_errors["boom"], ZeroDivisionError)


def test_observed_counters(spark):
    df = spark.range(100).withColumn("bad", (F.col("id") % 10 == 0).cast("int"))
    df2, obs = observed(df, rows=F.count(F.lit(1)), bad=F.sum("bad"))
    df2.count()
    assert obs.get == {"rows": 100, "bad": 10}


def test_plan_summary_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") > 20)
        .select("l_orderkey", "l_quantity")
    )
    s = plan_summary(df)
    assert any("l_quantity" in p for p in s.pushed_filters)  # predicate reached the scan
    assert s.scans_only_columns("l_orderkey", "l_quantity")  # pruned read
    assert s.num_exchanges == 0 and s.codegen_spans >= 1


def test_plan_summary_broadcast_join(spark):
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    j = customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    s = plan_summary(j)
    assert s.num_broadcast_joins == 1 and s.num_sortmerge_joins == 0


def test_headline_query_plan_discipline(spark):
    # The scale contract for the flagship queries: predicates reach the
    # parquet scan, small dims broadcast (no shuffle for them).
    from hadoop_20_warehouse_fix_spark.queries import load_all

    reg = load_all()
    s1 = plan_summary(reg["q1_pricing_summary"].fn(spark, SF))
    assert any("l_shipdate" in p for p in s1.pushed_filters)
    s5 = plan_summary(reg["q5_local_supplier_volume"].fn(spark, SF))
    assert s5.num_broadcast_joins >= 2  # nation + region explicitly broadcast
    s6 = plan_summary(reg["q6_forecast_revenue"].fn(spark, SF))
    assert any("l_discount" in p for p in s6.pushed_filters)
    assert s6.scans_only_columns("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")


def test_broadcast_build_sides_are_pruned(spark):
    """Every BroadcastExchange ships ONLY the join key + projected
    columns — broadcast bytes are the first executor-OOM lever at
    100 TB, so an unpruned dim (part has 9 columns, nation 4) in the
    exchange is a plan bug even when results are correct."""
    from hadoop_20_warehouse_fix_spark.queries import load_all

    reg = load_all()
    s = plan_summary(reg["join_broadcast_dim"].fn(spark, SF))
    ins = s.broadcast_inputs()
    assert len(ins) == 1, s.text
    assert ins[0] <= {"p_partkey", "p_brand"}, ins

    # q5: which relations broadcast is an AQE size decision (at sf0.001
    # even pruned lineitem qualifies), but EVERY broadcast must be a
    # pruned projection: never a table's wide *_comment column, never
    # more than the handful of key/name/measure columns the query uses.
    s5 = plan_summary(reg["q5_local_supplier_volume"].fn(spark, SF))
    assert s5.broadcast_inputs(), "q5 must broadcast its dims"
    for cols in s5.broadcast_inputs():
        assert not any(c.endswith("_comment") for c in cols), cols
        assert len(cols) <= 5, cols


def test_lsh_broadcast_query_side_pruned(spark):
    """sim_ann_lsh broadcasts the query side: only (bucket, query_id,
    vector, norm) may cross the wire — never raw corpus columns."""
    from hadoop_20_warehouse_fix_spark.queries import load_all

    df = load_all()["sim_ann_lsh"].fn(spark, SF)
    ins = plan_summary(df).broadcast_inputs()
    assert ins, "expected a broadcast of the query side"
    for cols in ins:
        assert cols <= {"bucket", "query_id", "qv", "qn"}, cols


def test_profile_table_single_scan(spark):
    """profile_table must read the fact table exactly ONCE: all
    per-column stats come from a single aggregation over one scan (the
    multi-column exact distinct is planned via Expand), never one
    pruned scan per profiled column — at 100 TB a per-column re-scan
    multiplies the dominant IO cost by the column count."""
    from hadoop_20_warehouse_fix_spark.queries import load_all

    df = load_all()["profile_table"].fn(spark, SF)
    s = plan_summary(df)
    assert s.num_file_scans == 1, s.text
    # the one scan is still pruned to the 4 profiled columns
    assert s.scans_only_columns("l_quantity", "l_discount", "l_returnflag", "l_shipdate")


def test_no_registered_query_plans_row_python_or_cartesian(spark):
    """Global plan discipline over the ENTIRE registry: no registered
    query may plan a row-at-a-time Python UDF (BatchEvalPython — the
    100 TB throughput killer; Arrow-batched ArrowEvalPython/MapInPandas
    are the sanctioned Python paths), an unkeyed CartesianProduct, or a
    scan that reads a TPC-H ``*_comment`` column (the wide column no
    query uses — seeing one in a ReadSchema means column pruning broke).
    Checked at sf0.001 — plan shape is SF-invariant."""
    import re

    from hadoop_20_warehouse_fix_spark.queries import load_all

    bad = {}
    for name, spec in sorted(load_all().items()):
        qe = spec.fn(spark, SF)._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        hits = [m for m in ("BatchEvalPython", "CartesianProduct") if m in plan]
        formatted = spark._jvm.PythonSQLUtils.explainString(qe, "formatted")
        if any("_comment" in s for s in re.findall(r"ReadSchema: struct<([^>]*)>", formatted)):
            hits.append("scans *_comment column")
        if hits:
            bad[name] = hits
    assert not bad, bad


def test_teragen_deterministic_and_shaped(spark):
    a = teragen(spark, 1000, seed=5)
    b = teragen(spark, 1000, seed=5)
    assert a.schema == b.schema
    assert [r.key for r in a.orderBy("key").head(3)] == [r.key for r in b.orderBy("key").head(3)]
    row = a.head()
    assert len(row.key) == 20 and len(row.value) == 90
    # keys effectively unique at this n (uniform 80-bit space)
    assert a.select("key").distinct().count() == 1000


def test_random_text_deterministic(spark):
    t1 = random_text(spark, 50, words_per_row=5, seed=2).collect()
    t2 = random_text(spark, 50, words_per_row=5, seed=2).collect()
    assert t1 == t2
    assert all(len(r.text.split(" ")) == 5 for r in t1)


def test_sort_validate_catches_everything(spark):
    data = teragen(spark, 2000, seed=3)
    sorted_ok = data.orderBy("key")
    assert sort_validate(data, sorted_ok, "key") == {
        "counts_match": True,
        "checksum_match": True,
        "globally_sorted": True,
    }
    # dropped record → count + checksum fail
    broken = sorted_ok.limit(1999)
    v = sort_validate(data, broken, "key")
    assert not v["counts_match"] and not v["checksum_match"]
    # unsorted content (identity) → order check fails, checksum passes
    v2 = sort_validate(data, data.orderBy(F.col("value")), "key")
    assert v2["checksum_match"] and not v2["globally_sorted"]


def test_sort_validate_file_order_on_disk_table(spark, tmp_path):
    """Validating a sorted table READ BACK from parquet needs
    file_order=True: Spark orders scan partitions by split size, so the
    partition-granularity boundary check false-negatives on multi-file
    reads (caught live on a 128-file TeraSort output, round 4). File-
    name granularity must pass the genuinely sorted table and still
    fail a per-file-unsorted one."""
    from hadoop_20_warehouse_fix_spark.operators.sort import total_order_sort

    data = teragen(spark, 20000, seed=5)
    path = str(tmp_path / "sorted")
    # 64 files on a 32-thread session: the scan PACKS multiple files
    # per partition, exercising the file-seam case inside one partition
    # (the second false-negative mode the 100M run surfaced).
    total_order_sort(data, ["key"], num_partitions=64).write.parquet(path)
    v = sort_validate(data, spark.read.parquet(path), "key", file_order=True)
    assert v == {"counts_match": True, "checksum_match": True, "globally_sorted": True}

    # Range-partitioned by key but UNSORTED within each file: the
    # filename-boundary check alone can't see it — the within-partition
    # check must.
    bad = str(tmp_path / "bad")
    data.repartitionByRange(16, "key").write.parquet(bad)
    v_bad = sort_validate(data, spark.read.parquet(bad), "key", file_order=True)
    assert v_bad["checksum_match"] and not v_bad["globally_sorted"]


def test_blocked_cosine_pairs_no_cartesian(spark):
    # The exact embedding-pair join must run as the blocked-GEMM plan:
    # equality joins + groupBy only — never a cartesian/BNLJ, which is
    # the canonical 100x-scale-killer for an all-pairs self-join.
    from hadoop_20_warehouse_fix_spark.queries import load_all
    from tests.conftest import SF_CORRECT

    reg = load_all()
    df = reg["dedup_embedding_cosine"].fn(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blocked_cosine_pairs_equals_nested_loop(spark):
    # Blocked GEMM is a physical re-plan, not a semantic change: results
    # equal the reference nested-loop theta-join exactly (same rounding).
    from hadoop_20_warehouse_fix_spark.operators.similarity import (
        blocked_cosine_pairs,
        embedding_cosine_pairs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = sorted(map(tuple, blocked_cosine_pairs(emb, threshold=0.4, n_blocks=5).collect()))
    b = sorted(map(tuple, embedding_cosine_pairs(emb, threshold=0.4).collect()))
    assert a == b and len(a) > 0


def test_bucketed_join_no_shuffle(spark):
    from hadoop_20_warehouse_fix_spark.queries import load_all
    from tests.conftest import SF_CORRECT

    reg = load_all()
    s = plan_summary(reg["join_bucketed_colocated"].fn(spark, SF_CORRECT))
    # Co-bucketed SMJ: the join itself shuffles NOTHING; the only
    # exchange in the plan is the final aggregation.
    assert s.num_sortmerge_joins == 1
    assert s.num_exchanges <= 1


def test_terasort_scale_smoke(spark):
    """The reference's own benchmark shape (TeraGen -> total-order sort
    -> TeraValidate/SortValidator) at 1M rows (~100 MB of 100-byte
    records): global order, count, and order-independent checksum all
    hold through the sampled range partitioner."""
    from hadoop_20_warehouse_fix_spark.operators.sort import total_order_sort

    data = teragen(spark, 1_000_000, seed=11, num_partitions=32)
    out = total_order_sort(data, ["key"], num_partitions=32)
    v = sort_validate(data, out, "key")
    assert v == {"counts_match": True, "checksum_match": True, "globally_sorted": True}


def test_explode_does_not_reevaluate_computed_array(spark):
    """Regression guard for the InferFiltersFromGenerate exclusion
    (session.py): exploding a computed array must evaluate the
    expensive transform expression ONCE — with the rule active, inferred
    size()/isnotnull() filters re-inline it below the projection and the
    interpreted shingle transform runs 3x per row (measured 4x slower
    end-to-end at sf0.1)."""
    from hadoop_20_warehouse_fix_spark.catalog import load_table
    from hadoop_20_warehouse_fix_spark.operators.dedup import shingle_rows
    from tests.conftest import SF_CORRECT

    docs = load_table(spark, SF_CORRECT, "documents")
    plan = shingle_rows(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("array_distinct(transform(") <= 1, plan


def test_zorder_value_matches_python_reference(spark):
    from hadoop_20_warehouse_fix_spark.operators.sort import zorder_value

    df = spark.createDataFrame([(x, y) for x in range(8) for y in range(8)], "x long, y long")
    got = {(r.x, r.y): r.z for r in df.select("x", "y", zorder_value(["x", "y"], bits=3).alias("z")).collect()}

    def morton(x, y, bits=3):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == {(x, y): morton(x, y) for x in range(8) for y in range(8)}


def test_write_zordered_files_cover_disjoint_z_ranges(spark, tmp_path):
    from hadoop_20_warehouse_fix_spark.operators.sort import write_zordered, zorder_value

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_partkey")
    path = str(tmp_path / "zordered")
    write_zordered(li, path, ["l_orderkey", "l_partkey"], bits=16, num_files=6)
    back = spark.read.parquet(path).withColumn(
        "z", zorder_value(["l_orderkey", "l_partkey"], bits=16)
    ).withColumn("f", F.input_file_name())
    ranges = back.groupBy("f").agg(F.min("z").alias("lo"), F.max("z").alias("hi")).collect()
    ivs = sorted((r.lo, r.hi) for r in ranges)
    assert len(ivs) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ivs, ivs[1:]):
        assert hi1 <= lo2  # range partitioning on z => disjoint file intervals


def test_ann_headline_plan_survives_scale(spark):
    # The benched ANN path (sim_ann_ivf_md5) must stay sub-quadratic:
    # probe join is a broadcast equality join on cell id (corpus side
    # streams), no cartesian product, no sort-merge join of vectors.
    from hadoop_20_warehouse_fix_spark.queries import load_all

    df = load_all()["sim_ann_ivf_md5"].fn(spark, SF)
    s = plan_summary(df)
    assert "CartesianProduct" not in s.text and "BroadcastNestedLoopJoin" not in s.text
    assert s.num_broadcast_joins >= 1 and s.num_sortmerge_joins == 0


def test_random_kv_binary_deterministic_and_shaped(spark):
    """Round-9 COVERAGE audit: the one generator row without a named
    test. RandomWriter analog — seeded (long key, binary value) rows:
    deterministic per seed, value length honored, keys distinct."""
    from hadoop_20_warehouse_fix_spark.sources.generators import random_kv_binary

    a = random_kv_binary(spark, 200, value_len=32, seed=9).collect()
    b = random_kv_binary(spark, 200, value_len=32, seed=9).collect()
    assert [(r.key, bytes(r.value)) for r in a] == [(r.key, bytes(r.value)) for r in b]
    c = random_kv_binary(spark, 200, value_len=32, seed=10).collect()
    assert {r.key for r in a}.isdisjoint({r.key for r in c})
    assert all(len(r.value) == 32 for r in a)
    assert len({r.key for r in a}) == 200


# Round-10 brief #5: the physical-plan SHAPE of every bench headline
# query, pinned at the bench scale factor (sf0.1 — broadcast picks are
# planning-time size decisions, so the pin must live at the SF the
# bench runs). When a round's bench delta needs adjudicating (load vs
# plan drift), this test is the mechanical answer: green = the plans
# did not move, so the delta is load. A DELIBERATE plan change updates
# the pinned row in the same commit.
#
# exchanges = shuffle Exchange nodes; broadcast/sortmerge = join
# strategy counts; file_scans = source passes (a query re-reading its
# fact table N times shows N); pushed = scans with a non-empty
# PushedFilters list.
HEADLINE_PLAN_FINGERPRINTS = {
    "corpus_clean":             dict(exchanges=5, broadcast_joins=1, sortmerge_joins=0, file_scans=1, pushed=0),
    "dedup_ngram_jaccard":      dict(exchanges=3, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=0),
    # r14: exchanges 2 -> 3 — fan_out_small_scan before the JSON parse
    # (single-split events ran the 0.55 s parse on one task; no-op at
    # natural-split scale, no pushdown lost: the filter is post-parse).
    "events_json_props":        dict(exchanges=3, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=1),
    "events_tumbling_hourly":   dict(exchanges=1, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=1),
    "join_broadcast_dim":       dict(exchanges=1, broadcast_joins=1, sortmerge_joins=0, file_scans=2, pushed=2),
    # r14: the storage hot path joins the bench (brief #8). The read
    # after apply_changes is base ∪ one pending delta: 3 scans (base
    # dirs, delta, delta-bytes-gated broadcast keys), 1 broadcast
    # anti-join, 2 exchanges (winner max_by + union output).
    "keyed_cdc_apply":          dict(exchanges=2, broadcast_joins=1, sortmerge_joins=0, file_scans=3, pushed=1),
    "q10_returned_items":       dict(exchanges=1, broadcast_joins=3, sortmerge_joins=0, file_scans=4, pushed=4),
    "q1_pricing_summary":       dict(exchanges=2, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=1),
    "q3_shipping_priority":     dict(exchanges=1, broadcast_joins=2, sortmerge_joins=0, file_scans=3, pushed=3),
    "q5_local_supplier_volume": dict(exchanges=2, broadcast_joins=5, sortmerge_joins=0, file_scans=6, pushed=6),
    "q6_forecast_revenue":      dict(exchanges=1, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=1),
    "q9_product_type_profit":   dict(exchanges=2, broadcast_joins=4, sortmerge_joins=0, file_scans=5, pushed=5),
    # r14: exchanges 1 -> 2 — ivf_topk fans out a single-split corpus
    # scan (round-robin repartition) so the K-fold cell assignment +
    # candidate scoring use every core instead of one task (exec wall
    # 0.72 s -> 0.51 s at sf0.1); no-op exchange at real corpus scale.
    "sim_ann_ivf_md5":          dict(exchanges=2, broadcast_joins=1, sortmerge_joins=0, file_scans=2, pushed=2),
    "sort_total_order":         dict(exchanges=1, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=0),
    "text_wordcount":           dict(exchanges=1, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=0),
}


def test_headline_plan_fingerprints_pinned(spark):
    """Every bench headline query's plan fingerprint matches its pin —
    and the pin COVERS the headline set exactly, so adding a headline
    query without pinning it (or dropping one silently) fails here."""
    from hadoop_20_warehouse_fix_spark.queries import load_all

    reg = load_all()
    headline = {n: s for n, s in reg.items() if s.headline}
    assert set(headline) == set(HEADLINE_PLAN_FINGERPRINTS)
    spark.catalog.clearCache()  # a warm cache rewrites scans as InMemory
    got = {}
    for name, spec in sorted(headline.items()):
        s = plan_summary(spec.fn(spark, "/root/testdata/sf0.1"))
        got[name] = dict(
            exchanges=s.num_exchanges,
            broadcast_joins=s.num_broadcast_joins,
            sortmerge_joins=s.num_sortmerge_joins,
            file_scans=s.num_file_scans,
            pushed=len([p for p in s.pushed_filters if p.strip()]),
        )
    assert got == HEADLINE_PLAN_FINGERPRINTS
    spark.catalog.clearCache()  # the fns above persist intermediates


# Round-11 brief #3: the static pins above fingerprint the
# PRE-execution plan; AQE's runtime rewrites (SMJ→BHJ conversion,
# AQEShuffleRead coalescing, skew splits) are exactly the drift class
# the pins exist to catch and are invisible to them. These pin the AQE
# FINAL plan (adaptive_final_summary: JVM-side forced execution, then
# counts over the "== Final Plan ==" tree only). At sf0.1 today the
# final shapes equal the static ones except corpus_clean, whose
# persisted seam runs its exchanges during construction — the final
# tree shows only the 2 exchanges this QueryExecution itself ran.
HEADLINE_FINAL_PLAN_FINGERPRINTS = {
    "corpus_clean":             dict(exchanges=2, broadcast_joins=1, sortmerge_joins=0, file_scans=1, pushed=0),
    "dedup_ngram_jaccard":      dict(exchanges=3, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=0),
    # r14: exchanges 2 -> 3 — fan_out_small_scan before the JSON parse
    # (single-split events ran the 0.55 s parse on one task; no-op at
    # natural-split scale, no pushdown lost: the filter is post-parse).
    "events_json_props":        dict(exchanges=3, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=1),
    "events_tumbling_hourly":   dict(exchanges=1, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=1),
    "join_broadcast_dim":       dict(exchanges=1, broadcast_joins=1, sortmerge_joins=0, file_scans=2, pushed=2),
    "keyed_cdc_apply":          dict(exchanges=2, broadcast_joins=1, sortmerge_joins=0, file_scans=3, pushed=1),
    "q10_returned_items":       dict(exchanges=1, broadcast_joins=3, sortmerge_joins=0, file_scans=4, pushed=4),
    "q1_pricing_summary":       dict(exchanges=2, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=1),
    "q3_shipping_priority":     dict(exchanges=1, broadcast_joins=2, sortmerge_joins=0, file_scans=3, pushed=3),
    "q5_local_supplier_volume": dict(exchanges=2, broadcast_joins=5, sortmerge_joins=0, file_scans=6, pushed=6),
    "q6_forecast_revenue":      dict(exchanges=1, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=1),
    "q9_product_type_profit":   dict(exchanges=2, broadcast_joins=4, sortmerge_joins=0, file_scans=5, pushed=5),
    # r14: exchanges 1 -> 2 — ivf_topk fans out a single-split corpus
    # scan (round-robin repartition) so the K-fold cell assignment +
    # candidate scoring use every core instead of one task (exec wall
    # 0.72 s -> 0.51 s at sf0.1); no-op exchange at real corpus scale.
    "sim_ann_ivf_md5":          dict(exchanges=2, broadcast_joins=1, sortmerge_joins=0, file_scans=2, pushed=2),
    "sort_total_order":         dict(exchanges=1, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=0),
    "text_wordcount":           dict(exchanges=1, broadcast_joins=0, sortmerge_joins=0, file_scans=1, pushed=0),
}


def test_adaptive_final_summary_catalog_scans_and_broadcast_inputs(spark):
    """Round-11 review regressions: (1) the final-tree scan pattern must
    match CATALOG-table scan lines ('Scan parquet spark_catalog.default.t
    (1)') — the original single-token pattern silently reported 0 scans
    and empty pushed filters for every persisted-state probe plan; (2)
    broadcast_inputs() must keep working on an adaptive summary (full
    text retained, detail blocks filtered by final-plan node ids — the
    sliced-tree form returned [] vacuously)."""
    from hadoop_20_warehouse_fix_spark.plans.inspect import adaptive_final_summary

    spark.sql("DROP TABLE IF EXISTS afs_probe_t")
    try:
        spark.range(100).selectExpr("id", "id % 7 AS k").write.saveAsTable("afs_probe_t")
        df = spark.table("afs_probe_t").filter("k > 2").join(
            F.broadcast(spark.range(7).withColumnRenamed("id", "k")), "k"
        )
        s = adaptive_final_summary(df)
        assert s.num_file_scans == 1, s.text  # the catalog scan is seen
        assert s.pushed_filters and any("k" in p for p in s.pushed_filters)
        ins = s.broadcast_inputs()
        assert ins and all(cols <= {"k", "id"} for cols in ins), ins
        assert s.node_ids  # adaptive summaries carry their final ids
    finally:
        spark.sql("DROP TABLE IF EXISTS afs_probe_t")


def test_headline_final_plan_fingerprints_pinned(spark):
    """Every bench headline query's AQE-FINAL plan fingerprint matches
    its pin, with the same exact-coverage discipline as the static
    test. Executes each headline query once at sf0.1 (JVM-side RDD
    count — no rows reach the driver)."""
    from hadoop_20_warehouse_fix_spark.plans.inspect import adaptive_final_summary
    from hadoop_20_warehouse_fix_spark.queries import load_all

    reg = load_all()
    headline = {n: s for n, s in reg.items() if s.headline}
    assert set(headline) == set(HEADLINE_FINAL_PLAN_FINGERPRINTS)
    got = {}
    for name, spec in sorted(headline.items()):
        spark.catalog.clearCache()  # a warm cache rewrites scans as InMemory
        s = adaptive_final_summary(spec.fn(spark, "/root/testdata/sf0.1"))
        got[name] = dict(
            exchanges=s.num_exchanges,
            broadcast_joins=s.num_broadcast_joins,
            sortmerge_joins=s.num_sortmerge_joins,
            file_scans=s.num_file_scans,
            pushed=len([p for p in s.pushed_filters if p.strip()]),
        )
    assert got == HEADLINE_FINAL_PLAN_FINGERPRINTS
    spark.catalog.clearCache()  # the fns above persist intermediates
