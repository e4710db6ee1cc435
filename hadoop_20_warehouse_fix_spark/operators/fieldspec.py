"""Field-selection ("cut") spec translator (SURVEY.md §2.2).

The reference's FieldSelectionMapReduce
(``M/lib/FieldSelectionMapReduce.java:64``) selects/reorders
separator-delimited fields by a spec string::

    keyFieldsSpec ":" valueFieldsSpec
    spec   := range ("," range)*
    range  := N | N-M | N- | -M        (0-based, inclusive, "N-" = to end)

e.g. ``"4,3,0-2:6,5-"`` → key = fields 4,3,0,1,2; value = fields 6,5..end.

Here the spec compiles to JVM-side Column expressions over
``split(line, sep)`` — no Python UDF, stays inside WholeStageCodegen.
Open-ended ranges use ``slice(arr, N+1, size)``; all selected fields are
re-joined with the separator, matching the reference's output format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _parse_ranges(spec: str) -> list[tuple[int, int | None]]:
    """Parse ``"4,3,0-2,6-"`` → [(4,4),(3,3),(0,2),(6,None)] (None = end)."""
    out: list[tuple[int, int | None]] = []
    if not spec:
        return out
    for piece in spec.split(","):
        piece = piece.strip()
        if "-" in piece:
            lo, hi = piece.split("-", 1)
            start = int(lo) if lo else 0
            end = int(hi) if hi else None
            out.append((start, end))
        else:
            out.append((int(piece), int(piece)))
    return out


def parse_spec(spec: str) -> tuple[list[tuple[int, int | None]], list[tuple[int, int | None]]]:
    """Split a full ``key:value`` spec (``parseOutputKeyValueSpec`` analog)."""
    if ":" in spec:
        key_part, value_part = spec.split(":", 1)
    else:
        key_part, value_part = spec, ""
    return _parse_ranges(key_part), _parse_ranges(value_part)


def _select_fields(arr: Column, ranges: list[tuple[int, int | None]], sep: str) -> Column:
    """Build the re-joined selection of fields from a split array."""
    pieces: list[Column] = []
    for start, end in ranges:
        if end is None:
            # slice() is 1-based; take from start to the end of the array.
            pieces.append(F.array_join(F.slice(arr, start + 1, F.greatest(F.size(arr) - start, F.lit(0))), sep))
        elif end == start:
            # F.get is 0-based and NULL-safe past the end (element_at
            # throws under ANSI mode when the line is short).
            pieces.append(F.coalesce(F.get(arr, start), F.lit("")))
        else:
            pieces.append(F.array_join(F.slice(arr, start + 1, end - start + 1), sep))
    if not pieces:
        return F.lit("")
    return F.concat_ws(sep, *pieces)


def field_select(
    df: DataFrame,
    line_col: str,
    spec: str,
    sep: str = "\t",
    key_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """Apply a field-selection spec to a delimited-line column, producing
    (key, value) string columns — the FieldSelection mapper's output.

    ``sep`` is treated as a LITERAL separator (the reference's
    FieldSelectionHelper splits on the literal string): it is
    regex-escaped before F.split, so '|' or '.' separators split on the
    character, matching the literal rejoin on the output side."""
    import re

    arr = F.split(F.col(line_col), re.escape(sep))
    key_ranges, value_ranges = parse_spec(spec)
    return df.select(
        _select_fields(arr, key_ranges, sep).alias(key_name),
        _select_fields(arr, value_ranges, sep).alias(value_name),
    )
