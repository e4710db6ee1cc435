"""Embedding column functions (training-data-pipeline extension pack):
unit normalization and int8 quantization — the storage/serving
preparation steps a 100 TB embedding corpus goes through before ANN
indexing or shipping to a feature store.

All pure built-in-expression compositions (JVM-side): per-row array
math with zero Python, zero shuffles — scan-fused at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def l2_norm_col(vec: Column) -> Column:
    """Sequential-fold L2 norm in double precision (cross-engine
    bit-stable; mirrors operators.similarity.dot)."""
    return F.sqrt(
        F.aggregate(
            vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def normalize_embedding(vec: Column) -> Column:
    """Unit-normalize; NULL for zero-norm vectors (same degenerate-input
    posture as cosine(): NULL propagates instead of Inf/NaN).

    WARNING — O(d^2) per row: the norm fold is captured inside the
    transform lambda, and HOFs are CodegenFallback (no subexpression
    elimination), so the d-element fold re-runs per element. Fine for
    one-off column use; hot paths must use the projection-barrier form
    (:func:`with_l2_norm` + :func:`unit_from_norm` — measured 3.7x
    at dim=64 on 2k rows, floor-inclusive; the per-row gap is ~d-fold)."""
    nrm = l2_norm_col(vec)
    return F.when(nrm != 0, F.transform(vec, lambda x: x.cast("double") / nrm))


def with_l2_norm(df: DataFrame, vec_col: str = "embedding", out: str = "nrm") -> DataFrame:
    """Materialize the L2 norm as a BOUND column in its own projection —
    the doc_shingle_sets barrier idiom: downstream lambdas reference the
    column (evaluated once per row), not the fold expression (which an
    inline form re-evaluates per element)."""
    return df.withColumn(out, l2_norm_col(F.col(vec_col)))


def unit_from_norm(vec: Column, nrm: Column) -> Column:
    """Unit vector from a pre-materialized norm column; NULL for
    zero-norm. One traversal per row."""
    return F.when(nrm != 0, F.transform(vec, lambda x: x.cast("double") / nrm))


def quantize_int8(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max(|x_i|)/127,
    code_i = round(x_i / scale) ∈ [-127, 127]. 4x smaller than float32
    (16x vs the float64 compute form) with reconstruction error
    ≤ scale/2 per element — the standard ANN-serving compression.

    Row-local arithmetic (no shuffle); codes ride as array<tinyint> and
    the scale as one double, so dequantization (code_i * scale) is also
    scan-fused. Zero vectors get scale 0 and all-zero codes.

    The amax fold is materialized as a bound column in its own
    projection BEFORE the quantizing transform references it —
    capturing the fold in the lambda would re-run it per element
    (O(d^2) per row; the langscore_struct / doc_shingle_sets trap)."""
    vec = F.col(vec_col)
    amax_expr = F.aggregate(
        vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    staged = df.select(F.col(id_col), vec.alias("_v"), amax_expr.alias("_amax"))
    amax = F.col("_amax")
    scale = amax / F.lit(127.0)
    codes = F.when(
        amax == 0, F.transform(F.col("_v"), lambda x: F.lit(0).cast("tinyint"))
    ).otherwise(
        F.transform(F.col("_v"), lambda x: F.round(x.cast("double") / scale).cast("tinyint"))
    )
    return staged.select(
        F.col(id_col),
        scale.alias("scale"),
        codes.alias("codes"),
    )


def dequantize_int8(codes_col: str = "codes", scale_col: str = "scale") -> Column:
    """Reconstruct approximate doubles: code_i * scale. Column
    expression over bound (codes, scale) columns — the per-element
    scale reference is a plain column lookup, not a fold."""
    return F.transform(F.col(codes_col), lambda c: c.cast("double") * F.col(scale_col))
