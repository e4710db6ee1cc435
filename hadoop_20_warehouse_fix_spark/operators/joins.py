"""Join operators (SURVEY.md §2.3).

The reference offers two join families:
- map-side sorted-merge joins over co-partitioned inputs
  (``M/join/CompositeInputFormat.java:48`` — expression DSL
  ``inner(tbl(...),tbl(...))`` / ``outer(...)`` / ``override(...)``), and
- reduce-side tagged joins (``X/data_join/.../DataJoinReducerBase.java:47``).

In Spark both collapse to ``df.join`` — Catalyst picks broadcast /
shuffle-hash / sort-merge, and bucketed tables reproduce the
shuffle-free map-side-join physics (see ``sources.writers.write_bucketed``).
The only semantics Spark lacks natively is the **override join**
(``M/join/OverrideRecordReader.java``: emit the value from the RIGHTMOST
source that has the key), implemented here as a coalesce-fold.

Scale: ``override_join`` folds full-outer joins on the same key, so all
joins share one hash partitioning — Catalyst reuses the exchange, giving
n-way override in a single shuffle of each input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def n_way_equi_join(dfs: Sequence[DataFrame], on: str | Sequence[str], how: str = "inner") -> DataFrame:
    """N-way equi-join on a shared key — the CompositeInputFormat
    ``inner(...)``/``outer(...)`` expressions. All joins key on the same
    column(s) so the shuffle partitioning is reused across the fold."""
    if not dfs:
        raise ValueError("need at least one input")
    on = [on] if isinstance(on, str) else list(on)
    out = dfs[0]
    for right in dfs[1:]:
        out = out.join(right, on=on, how=how)
    return out


def override_join(
    dfs: Sequence[DataFrame],
    on: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Override join — rightmost source that has the key wins
    (``M/join/OverrideRecordReader.java``: precedence/upsert semantics).

    Each input must have column ``on`` plus ``value_cols``. Output has
    ``on`` + ``value_cols`` where each value comes from the last (highest
    index) input containing that key. NULL values in a present source
    still win — presence is per-key, matching TupleWritable presence bits.
    """
    if not dfs:
        raise ValueError("need at least one input")
    # Track per-source presence explicitly so a legitimately-NULL value in
    # a later source still overrides an earlier non-NULL one.
    tagged = [
        df.select(
            F.col(on),
            F.struct(*[F.col(c) for c in value_cols]).alias(f"_v{i}"),
            F.lit(True).alias(f"_p{i}"),
        )
        for i, df in enumerate(dfs)
    ]
    out = tagged[0]
    for right in tagged[1:]:
        out = out.join(right, on=on, how="full_outer")
    n = len(dfs)
    # Rightmost present source wins: coalesce in reverse index order over
    # presence-gated structs.
    winner = F.coalesce(
        *[F.when(F.col(f"_p{i}"), F.col(f"_v{i}")) for i in reversed(range(n))]
    )
    return out.select(F.col(on), *[winner[c].alias(c) for c in value_cols])


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """EXISTS — not expressible in the reference except as a hand-written
    tagged reducer; engine capability via Spark ``left_semi``."""
    return left.join(right, on=[on] if isinstance(on, str) else list(on), how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — via Spark ``left_anti``."""
    return left.join(right, on=[on] if isinstance(on, str) else list(on), how="left_anti")


def broadcast_join(big: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """Map-side hash join with an explicitly shipped small table — the
    DistributedCache idiom (``C/filecache/DistributedCache.java:115``).
    ``F.broadcast`` forces BroadcastHashJoinExec regardless of stats."""
    return big.join(F.broadcast(small), on=on, how=how)


def tagged_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str,
    combine_fn,
    schema,
):
    """Reduce-side tagged join with a user combine() — the data_join
    contrib (``DataJoinReducerBase.java:47``: regroup per source tag, then
    user code decides inner/outer/filter semantics per key).

    ``combine_fn(key_tuple, left_pdf, right_pdf) -> pandas.DataFrame``
    runs per key via ``cogroup().applyInPandas`` — Arrow-batched, stays
    distributed; the per-key group is the same unit the reference's
    reducer saw.
    """
    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(combine_fn, schema=schema)
    )
