"""Exact money aggregation without the decimal tax (round 12).

Round 11 converted the TPC-H-shaped money sums to DECIMAL(18,6)
chain-multiplies for exactness (half-cent rounding boundaries flip
under double summation order — caught by the 10x key-shifted sweep).
Correct, but Spark decimals wider than 18 digits leave the long-backed
fast path: every row pays a BigDecimal multiply+add in the aggregate,
and q1 — pure aggregation — regressed 1.73x (VERDICT r11).

Same exactness, integer arithmetic instead. Prices, discounts, taxes
and supply costs are exact 2-decimal inputs and quantities are whole
numbers, so every TPC-H money expression is an exact INTEGER in small
fixed-point units:

    cents   p = 100*price                          (exact long)
    n4      = p * (100 - d)                        (1e-4 units)
    n6      = n4 * (100 + t)                       (1e-6 units)

Per-row products stay under ~1.1e11 — far inside int64 — and each
measure is summed as an (hi, lo) split on a 1e6 radix: two plain long
sums in whole-stage codegen, overflow-safe past 1e12 rows per group
(~sf200k), recombined EXACTLY in decimal on the handful of post-
aggregate result rows only. Negative units (profit expressions) work
unchanged: ``pmod`` keeps lo in [0, radix) and hi carries the sign.

The DuckDB oracles keep their exact-DECIMAL formulations — the two
independent exact paths must agree bitwise, which is a stronger check
than sharing the arithmetic. Measured: q1 0.828 s (decimal) → 0.45-0.52
s quiet (this form) at sf0.1, even with r09's inexact double sums
(0.478 s).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Split radix: lo in [0, 1e6), hi = units div 1e6.
RADIX = 1_000_000


def exact_units(col: Column | str, scale: int = 100) -> Column:
    """Exact-decimal double → integer units (long), pure codegen.
    Sign-aware nearest rounding, not ``F.round`` — Spark's Round on
    doubles detours through BigDecimal per row; these inputs are
    integer-valued-after-scaling doubles (±1 ulp), where adding the
    half-unit TOWARD the value's sign and truncating lands on the same
    integer. (Round-12 ADVICE: the earlier unconditional ``+0.5`` form
    relied on double→long truncation toward zero, which came out one
    unit high on NEGATIVE values — every call site then was
    non-negative, but the helper reads as general-purpose and q9 reuses
    the idiom inline.)"""
    c = F.col(col) if isinstance(col, str) else col
    scaled = c * scale
    half = F.when(scaled < 0, F.lit(-0.5)).otherwise(F.lit(0.5))
    return (scaled + half).cast("long")


def split_sum(units: Column, name: str) -> list[Column]:
    """The two aggregate expressions (``_<name>_hi``, ``_<name>_lo``)
    summing an exact integer-unit column with int64 headroom past 1e12
    rows per group. Safe for negative units (hi carries the sign)."""
    lo = F.pmod(units, F.lit(RADIX))
    # (units - lo) is an exact multiple of RADIX and |units| <= ~1e11,
    # so the double division is exact before the long cast.
    hi = ((units - lo) / RADIX).cast("long")
    return [F.sum(hi).alias(f"_{name}_hi"), F.sum(lo).alias(f"_{name}_lo")]


def split_result(name: str, tens: int, round_digits: int = 2) -> Column:
    """Recombine a :func:`split_sum` pair into the rounded double total
    ``(hi*RADIX + lo) / 10^tens`` — decimal arithmetic on the tiny
    post-aggregate result only. The division's result scale (>= 6)
    covers the value's true scale, so it is exact; round is HALF_UP on
    decimals, matching DuckDB."""
    tot = F.col(f"_{name}_hi").cast("decimal(38,0)") * F.lit(RADIX) + F.col(
        f"_{name}_lo"
    )
    return (
        F.round(tot.cast("decimal(38,6)") / F.lit(10**tens), round_digits)
        .cast("double")
    )


def disc_price_units(
    price: str = "l_extendedprice", disc: str = "l_discount"
) -> Column:
    """``price * (1 - disc)`` in 1e-4 currency units (tens=4)."""
    return exact_units(price) * (F.lit(100) - exact_units(disc))


def charge_units(
    price: str = "l_extendedprice",
    disc: str = "l_discount",
    tax: str = "l_tax",
) -> Column:
    """``price * (1 - disc) * (1 + tax)`` in 1e-6 units (tens=6)."""
    return disc_price_units(price, disc) * (F.lit(100) + exact_units(tax))
