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
    posture as cosine(): NULL propagates instead of Inf/NaN)."""
    nrm = l2_norm_col(vec)
    return F.when(nrm != 0, F.transform(vec, lambda x: x.cast("double") / nrm))


def quantize_int8(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max(|x_i|)/127,
    code_i = round(x_i / scale) ∈ [-127, 127]. 4x smaller than float32
    (16x vs the float64 compute form) with reconstruction error
    ≤ scale/2 per element — the standard ANN-serving compression.

    Row-local arithmetic (no shuffle); codes ride as array<tinyint> and
    the scale as one double, so dequantization (code_i * scale) is also
    scan-fused. Zero vectors get scale 0 and all-zero codes."""
    vec = F.col(vec_col)
    amax = F.aggregate(
        vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = amax / F.lit(127.0)
    codes = F.when(amax == 0, F.transform(vec, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(vec, lambda x: F.round(x.cast("double") / scale).cast("tinyint"))
    )
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        codes.alias("codes"),
    )


def dequantize_int8(df: DataFrame, codes_col: str = "codes", scale_col: str = "scale") -> Column:
    """Reconstruct approximate doubles: code_i * scale."""
    return F.transform(F.col(codes_col), lambda c: c.cast("double") * F.col(scale_col))
