"""Unix-sort ``-k`` keyspec translator (SURVEY.md §2.6).

The reference's KeyFieldBasedComparator/Partitioner
(``M/lib/KeyFieldBasedComparator.java:46``, ``KeyFieldHelper.java:32-41``)
implement ``sort -k f[.c][,f[.c]][nr]`` over separator-delimited records.
Here a keyspec string compiles to a list of Column sort expressions —
JVM-side, usable with ``orderBy`` / ``repartitionByRange`` /
``sortWithinPartitions``.

Supported: 1-based field index, optional ``.c`` start-char offset
(1-based), single-field keys (``-k2,2``) and to-end-of-record keys
(``-k2``), flags ``n`` (numeric) and ``r`` (reverse). Multi-field spans
(``-k2,4``) are joined with the separator before comparison.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KEY_RE = re.compile(
    r"-k\s*(?P<f1>\d+)(?:\.(?P<c1>\d+))?(?P<flags1>[nr]*)"
    r"(?:,(?P<f2>\d+)(?:\.(?P<c2>\d+))?(?P<flags2>[nr]*))?"
)


@dataclass
class KeyPart:
    field_start: int  # 1-based
    field_end: int | None  # None = to end of record
    char_start: int  # 1-based within first field
    numeric: bool
    reverse: bool


def parse_keyspec(spec: str) -> list[KeyPart]:
    """Parse e.g. ``"-k2,2nr -k1.3,1"`` → [KeyPart(2,2,1,True,True), KeyPart(1,1,3,False,False)]."""
    parts: list[KeyPart] = []
    for m in _KEY_RE.finditer(spec):
        flags = (m.group("flags1") or "") + (m.group("flags2") or "")
        parts.append(
            KeyPart(
                field_start=int(m.group("f1")),
                field_end=int(m.group("f2")) if m.group("f2") else None,
                char_start=int(m.group("c1")) if m.group("c1") else 1,
                numeric="n" in flags,
                reverse="r" in flags,
            )
        )
    if not parts:
        raise ValueError(f"no -k keys found in keyspec: {spec!r}")
    return parts


def keyspec_columns(line_col: str | Column, spec: str, sep: str = "\t") -> list[Column]:
    """Compile a keyspec to orderBy-ready Column expressions.

    ``sep`` is literal (Unix ``sort -t`` semantics), so it is
    regex-escaped before F.split — '|' means the pipe character, not an
    empty regex alternation."""
    import re

    arr = F.split(F.col(line_col) if isinstance(line_col, str) else line_col, re.escape(sep))
    cols: list[Column] = []
    for p in parse_keyspec(spec):
        if p.field_end is not None and p.field_end == p.field_start:
            # 0-based F.get is NULL-safe for records with too few fields
            # (element_at throws under ANSI mode).
            key = F.get(arr, p.field_start - 1)
        elif p.field_end is None:
            key = F.array_join(
                F.slice(arr, p.field_start, F.greatest(F.size(arr) - p.field_start + 1, F.lit(0))), sep
            )
        else:
            key = F.array_join(F.slice(arr, p.field_start, p.field_end - p.field_start + 1), sep)
        if p.char_start > 1:
            key = F.substring(key, p.char_start, 1_000_000)
        if p.numeric:
            # try_cast: records with a missing or malformed numeric key
            # sort as NULL instead of failing the job (ANSI cast throws
            # on '' — found by the keyspec property test).
            key = key.try_cast("double")
        cols.append(key.desc() if p.reverse else key.asc())
    return cols


def keyfield_sort(df: DataFrame, line_col: str, spec: str, sep: str = "\t") -> DataFrame:
    """Globally sort delimited lines by a unix-sort keyspec.

    Spark's orderBy range-partitions on the same sort keys (sampled, the
    TotalOrderPartitioner analog) so output is globally ordered across
    partitions — scale-safe, no single-reducer bottleneck."""
    return df.orderBy(*keyspec_columns(line_col, spec, sep))
