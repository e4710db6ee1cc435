"""Context-window document chunking — long docs into training windows.

The packing side of shard prep exists (``operators/sort.pack_by_budget``
packs WHOLE docs to a token budget); this is its complement for docs
LONGER than the model context: split each document's token stream into
``max_tokens`` windows advancing by ``stride`` (overlapping when
stride < max_tokens — the standard long-document treatment so no
boundary-spanning text is lost to truncation).

Spark-first shape: everything is JVM column expressions — ``split``
tokenizes once per row, ``sequence`` enumerates window starts,
``transform`` + ``slice`` + ``array_join`` cut the windows, and ONE
``posexplode`` emits the rows. No Python boundary, no UDF, whole-stage
codegen end to end; output volume is input tokens × (max_tokens /
stride) in the overlapping case, so repartition AFTER chunking if the
windows feed a shuffle-heavy stage (the `sample_frames` discipline).

Reference lineage: the reference sliced oversized inputs at the
InputFormat layer (fixed-length splits / NLineInputFormat,
``/root/reference/src/mapred/org/apache/hadoop/mapred/lib/
NLineInputFormat.java``); here the slicing is token-aware and happens
as a relational operator instead of a file-format concern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 512,
    stride: int | None = None,
    min_tokens: int = 1,
    out_name: str = "chunk",
) -> DataFrame:
    """Split each doc's whitespace-token stream into windows of at most
    ``max_tokens`` tokens, window k starting at token ``k * stride``
    (stride defaults to ``max_tokens`` — disjoint windows that
    reconstruct the document exactly; smaller strides overlap).

    Coverage contract (pytest-pinned): every token of every doc with
    >= ``min_tokens`` tokens appears in at least one window, window
    count is ``ceil((n - max_tokens) / stride) + 1`` (min 1), and the
    FINAL window always reaches the last token. Docs with fewer than
    ``min_tokens`` tokens (including empty/null text) emit no rows —
    the gate semantics of every corpus operator here.

    Output: ``(id_col, chunk_idx, n_tokens, out_name)`` where
    ``chunk_idx`` is 0-based window order and ``n_tokens`` the
    window's actual token count (< max_tokens only for the last)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if stride is None:
        stride = max_tokens
    if not 1 <= stride <= max_tokens:
        raise ValueError(
            f"stride must be in [1, max_tokens], got {stride} (max_tokens={max_tokens})"
        )
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"), lambda w: w != ""
    )
    n = F.size(words)
    # smallest k with k*stride >= n - max_tokens, then +1 windows total
    n_chunks = F.greatest(F.ceil((n - F.lit(max_tokens)) / F.lit(stride)) + 1, F.lit(1))
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    chunks: Column = F.transform(
        starts, lambda s: F.slice(words, s + 1, max_tokens)  # slice is 1-based
    )
    return (
        df.filter(n >= min_tokens)
        .select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_idx", "_w"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("_w").alias("n_tokens"),
            F.array_join("_w", " ").alias(out_name),
        )
    )
