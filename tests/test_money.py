"""Exact integer-unit money arithmetic (functions/money.py).

Round-12 ADVICE: ``exact_units``' original ``trunc(x*scale + 0.5)``
rounded correctly only for non-negative inputs — Spark's double→long
cast truncates toward zero, so a negative money value came out one unit
high. Every then-current call site was non-negative, but the helper
reads as general-purpose; now it is.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.functions.money import (
    RADIX,
    exact_units,
    split_result,
    split_sum,
)


def test_exact_units_sign_aware(spark):
    vals = [1.01, -1.01, 0.0, -0.005, 2.675, -2.675, 123.45, -123.45,
            0.004, -0.004]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.u for r in df.select(exact_units("x").alias("u")).collect()]
    # nearest integer of 100*x (ties away from zero), exact on ±1-ulp
    # integer-valued-after-scaling inputs
    import math
    want = [
        int(math.floor(v * 100 + 0.5)) if v >= 0 else int(math.ceil(v * 100 - 0.5))
        for v in vals
    ]
    assert got == want, list(zip(vals, got, want))


def test_split_sum_negative_totals_recombine_exactly(spark):
    # mixed-sign units whose total is negative: hi carries the sign,
    # lo stays in [0, RADIX), recombination exact
    units = [-3, -RADIX - 1, RADIX + 7, -2 * RADIX, 5]
    df = spark.createDataFrame([(u,) for u in units], "u long")
    row = df.agg(*split_sum(F.col("u"), "m")).select(
        split_result("m", tens=0, round_digits=0).alias("tot")
    ).first()
    assert int(row.tot) == sum(units)
