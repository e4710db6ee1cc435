"""Context-window chunking tests: pinned examples + a hypothesis
property against an independent pure-Python reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.operators.chunking import chunk_documents


def _py_chunks(text, max_tokens, stride):
    """Independent reference: the textbook sliding-window loop."""
    ws = [w for w in (text or "").split() if w]
    if not ws:
        return []
    out, start = [], 0
    while True:
        out.append(ws[start : start + max_tokens])
        if start + max_tokens >= len(ws):
            break
        start += stride
    return out


def test_chunking_pinned_examples(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),  # 10 tokens
            (2, "x y z"),                # shorter than a window
            (3, ""),                     # empty -> no rows
            (4, None),                   # null -> no rows
        ],
        "doc_id long, text string",
    )
    # disjoint windows reconstruct the doc exactly
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk)
        for r in chunk_documents(docs, "doc_id", "text", max_tokens=4).collect()
    }
    assert got[(1, 0)] == (4, "a b c d")
    assert got[(1, 1)] == (4, "e f g h")
    assert got[(1, 2)] == (2, "i j")
    assert got[(2, 0)] == (3, "x y z")
    assert {k[0] for k in got} == {1, 2}  # empty/null docs vanish
    # overlapping windows: stride 2, max 4 over 10 tokens -> starts 0,2,4,6
    ov = {
        r.chunk_idx: r.chunk
        for r in chunk_documents(docs, "doc_id", "text", max_tokens=4, stride=2)
        .filter("doc_id = 1")
        .collect()
    }
    assert ov[0] == "a b c d" and ov[1] == "c d e f"
    assert ov[3] == "g h i j"  # the final window reaches the last token
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, "doc_id", "text", max_tokens=4, stride=5)
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(docs, "doc_id", "text", max_tokens=0)


def test_chunking_matches_python_reference_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None, derandomize=True)
    @given(
        n_tokens=st.integers(min_value=0, max_value=40),
        max_tokens=st.integers(min_value=1, max_value=12),
        stride_frac=st.integers(min_value=1, max_value=12),
    )
    def prop(n_tokens, max_tokens, stride_frac):
        stride = min(stride_frac, max_tokens)
        text = " ".join(f"t{i}" for i in range(n_tokens))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = sorted(
            (r.chunk_idx, r.chunk)
            for r in chunk_documents(
                df, "doc_id", "text", max_tokens=max_tokens, stride=stride
            ).collect()
        )
        want = [(i, " ".join(c)) for i, c in enumerate(_py_chunks(text, max_tokens, stride))]
        assert got == want

    prop()


def test_chunking_reconstruction_and_plan(spark):
    """Disjoint chunks concatenate back to the normalized document, and
    the plan is pure codegen — no Python boundary, no shuffle before
    the explode."""
    from hadoop_20_warehouse_fix_spark.catalog import load_table
    from tests.conftest import SF_CORRECT

    # filter (pushed to the scan), NOT limit — GlobalLimit would add
    # its own single-partition Exchange and pollute the plan assert
    docs = load_table(spark, SF_CORRECT, "documents").filter(F.col("doc_id") < 100)
    chunks = chunk_documents(docs, "doc_id", "text", max_tokens=7)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("chunk_idx", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("re")
        )
    )
    joined = docs.join(rebuilt, "doc_id").select(
        "doc_id",
        (F.array_join(F.filter(F.split("text", r"\s+"), lambda w: w != ""), " ") == F.col("re")).alias("ok"),
    )
    assert joined.filter("NOT ok").count() == 0
    plan = chunks._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # chunking itself never shuffles
    assert "InMemoryTableScan" in plan or "Scan" in plan


def test_chunk_documents_out_name_underscore_w(spark):
    """Second-pass review: out_name colliding with the refactor's old
    internal column name must still produce the text column."""
    from hadoop_20_warehouse_fix_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", max_tokens=3, stride=2, out_name="_w")
    rows = sorted(out.collect(), key=lambda r: r.chunk_idx)
    assert out.columns == ["doc_id", "chunk_idx", "n_tokens", "_w"]
    assert [r._w for r in rows] == ["a b c", "c d e"]
