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

from pyspark.sql import DataFrame, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the single closest right row
    within the same key group. ``direction="backward"`` (default) takes
    the greatest ``right_ts`` <= ``left_ts``; ``direction="forward"``
    takes the smallest ``right_ts`` >= ``left_ts``. Ties at equal
    timestamps match in both directions (inclusive).

    The reference's closest analog is ``MapFile.getClosest()``
    (``C/io/MapFile.java:539`` — binary search to the nearest key at or
    before a probe); SURVEY §2.3 lists as-of joins as an engine-level
    addition the reference could only hand-write as a reducer.

    Physical strategy — union + window, NOT a join: tag right rows with
    their value struct, union with left rows (right sorts before left at
    equal ts so <= holds), then one window per key ordered by ts takes
    ``last(value, ignorenulls)``. ONE shuffle on the key, no range
    explosion, no per-key driver work — the scalable form for billions
    of rows per side. A join-based formulation (non-equi ts predicate +
    row_number) shuffles both sides AND materializes every candidate
    pair; this form materializes only left+right rows once.

    Output: all left columns + ``right_value_cols`` (null where no
    earlier right row exists; ``how='inner'`` drops those rows).
    """
    keys = [on] if isinstance(on, str) else list(on)
    rv = F.struct(*[F.col(c) for c in right_value_cols]).alias("_rv")
    r = right.select(*keys, F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"), rv)
    l_cols = [c for c in left.columns]
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.struct(*[F.col(c) for c in l_cols]).alias("_lv"),
    )
    r = r.withColumn("_lv", F.lit(None).cast(l.schema["_lv"].dataType))
    # Forward = the same prefix scan run in DESCENDING ts order: the
    # last right row seen walking down from +inf to the left row's ts is
    # exactly the smallest right_ts >= left_ts. Right still sorts before
    # left at equal ts (_side asc), keeping both directions inclusive.
    order = [F.desc("_ts"), F.asc("_side")] if direction == "forward" else ["_ts", "_side"]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_match", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if how == "inner":
        # Presence of the match STRUCT (not of any one field) decides —
        # a matched right row whose value columns are all NULL still joins.
        matched = matched.filter(F.col("_match").isNotNull())
    return matched.select(
        *[F.col("_lv")[c].alias(c) for c in l_cols],
        *[F.col("_match")[c].alias(c) for c in right_value_cols],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    bucket_width: int,
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """Skew-resistant as-of join: same semantics as :func:`asof_join`
    (greatest ``right_ts`` <= ``left_ts`` per key for ``backward``,
    smallest >= for ``forward``, ties inclusive), but the per-key
    window is replaced by a two-pass scheme partitioned on
    ``(key, floor(ts / bucket_width))``.

    Why it exists: :func:`asof_join`'s single window per key puts a hot
    key's ENTIRE history through one task — measured 3.8x slower than
    the uniform-key regime at 10M x 1M rows with 50% of rows on one key
    (SCALING.md round 4). Here a hot key's rows spread across
    ``ts_domain / bucket_width`` tasks, so the straggler bound drops
    from |hot key| to |hot key| / n_buckets.

    Passes (one window each, both bounded):
    1. *Within-bucket*: union left+right partitioned by ``(key,
       bucket)`` — resolves every left row whose match lives in its own
       bucket (the common case when ``bucket_width`` is chosen near the
       median right-event spacing x a few).
    2. *Carry across buckets*: per-(key, bucket) right summaries
       (``max_by``/``min_by`` — one row per non-empty bucket) unioned
       with the distinct unresolved left buckets, windowed per key
       ordered by bucket id. Row count per key is bounded by the bucket
       count regardless of skew; at equal bucket the target sorts first
       so a same-bucket summary (which pass 1 already adjudicated
       exactly) is never visible.
    The carry then equality-joins back on ``(key, bucket)`` — pass 1's
    output is already hash-partitioned on that key, so only the small
    carry side moves.

    Requires a NUMERIC ts (epoch seconds/millis, etc.) for the bucket
    arithmetic — use :func:`asof_join` for arbitrary orderable types.
    Equal ``right_ts`` ties within a key pick an arbitrary right row in
    BOTH forms (callers with tie-sensitive data should disambiguate the
    ts). Result equality with :func:`asof_join` across bucket widths,
    directions, and skew is asserted in tests/test_operators.py.
    """
    keys = [on] if isinstance(on, str) else list(on)
    W = int(bucket_width)
    if W <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    forward = direction == "forward"

    rv = F.struct(*[F.col(c) for c in right_value_cols]).alias("_rv")
    bucket = lambda ts: F.floor(F.col(ts) / W).cast("long")  # noqa: E731
    r = right.select(
        *keys, F.col(right_ts).alias("_ts"), bucket(right_ts).alias("_b"), F.lit(0).alias("_side"), rv
    )
    l_cols = list(left.columns)
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        bucket(left_ts).alias("_b"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.struct(*[F.col(c) for c in l_cols]).alias("_lv"),
    )
    r = r.withColumn("_lv", F.lit(None).cast(l.schema["_lv"].dataType))

    # Pass 1 — within-bucket prefix scan (right before left at equal ts
    # keeps <= / >= inclusive, exactly as asof_join).
    order = [F.desc("_ts"), F.asc("_side")] if forward else [F.asc("_ts"), F.asc("_side")]
    w1 = (
        Window.partitionBy(*keys, "_b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bucket = (
        l.unionByName(r)
        .withColumn("_m1", F.last("_rv", ignorenulls=True).over(w1))
        .filter(F.col("_side") == 1)
        .drop("_side", "_rv")
    )

    # Pass 2 — carry the nearest out-of-bucket right value. Summaries:
    # the row pass 1 would have picked had the bucket boundary not cut
    # the scan (latest for backward, earliest for forward).
    pick = "max_by(_rv, _ts)" if not forward else "min_by(_rv, _ts)"
    rs = r.groupBy(*keys, "_b").agg(F.expr(pick).alias("_brv"), F.lit(1).alias("_bside"))
    need = (
        in_bucket.filter(F.col("_m1").isNull())
        .select(*keys, "_b")
        .distinct()
        .withColumn("_bside", F.lit(0))
        .withColumn("_brv", F.lit(None).cast(r.schema["_rv"].dataType))
    )
    # Target (_bside=0) sorts before the same-bucket summary (_bside=1)
    # in BOTH directions: last() over preceding rows sees strictly
    # earlier (backward) / later (forward) buckets only.
    border = [F.desc("_b"), F.asc("_bside")] if forward else [F.asc("_b"), F.asc("_bside")]
    w2 = (
        Window.partitionBy(*keys)
        .orderBy(*border)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        rs.unionByName(need)
        .withColumn("_carry", F.last("_brv", ignorenulls=True).over(w2))
        .filter(F.col("_bside") == 0)
        .select(*keys, "_b", "_carry")
    )

    matched = in_bucket.join(carry, on=[*keys, "_b"], how="left").withColumn(
        "_match", F.coalesce(F.col("_m1"), F.col("_carry"))
    )
    if how == "inner":
        matched = matched.filter(F.col("_match").isNotNull())
    return matched.select(
        *[F.col("_lv")[c].alias(c) for c in l_cols],
        *[F.col("_match")[c].alias(c) for c in right_value_cols],
    )


def range_band_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Band (range) join: each fact row matched to the band where
    ``lo <= value < hi``. The reference has no theta joins (SURVEY §2.3);
    Spark expresses them as non-equi join conditions.

    Scale: the band table is a handful of rows — broadcast, so the fact
    side never shuffles (BroadcastNestedLoopJoin over a tiny inner).
    For two BIG sides a range join needs bucketize-and-explode on range
    fragments; bands-vs-facts is the overwhelmingly common shape."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), on=cond, how="inner")


def range_fragment_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    fragment_width: int = 1000,
) -> DataFrame:
    """Big-big range join — the shape :func:`range_band_join`'s
    docstring defers to when the interval side is too large to
    broadcast (millions of IP ranges / genomic intervals / validity
    windows): a BroadcastNestedLoopJoin is |facts| x |bands|
    comparisons and a non-broadcast NLJ is a cartesian shuffle, both
    non-starters.

    Bucketize-and-explode: every band [lo, hi) explodes into the fixed-
    width fragments it overlaps (``floor(lo/W) .. floor((hi-1)/W)``),
    each fact maps to the ONE fragment containing its value, and the
    match becomes an EQUALITY join on fragment id + an exact residual
    filter. Each fact matches a band in exactly one fragment (its own),
    so no dedup pass is needed.

    Cost model: band-side rows multiply by ``ceil(span/W)`` (W too
    small => interval blowup), fragment fan-in grows with bands-per-
    fragment (W too large => per-key near-cartesian). Set W near the
    median band span; skewed giant bands explode into many fragments —
    bounded rows each — instead of melting one reducer. Measured in
    SCALING.md round 4 vs the broadcast form."""
    frag = F.floor(F.col(value_col) / fragment_width)
    f = facts.withColumn("_frag", frag.cast("long"))
    b = bands.withColumn(
        "_frag",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / fragment_width).cast("long"),
                F.floor((F.col(hi_col) - 1) / fragment_width).cast("long"),
            )
        ),
    )
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return f.join(b, on="_frag").filter(cond).drop("_frag")


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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-resistant equi join: LEFT rows get a deterministic salt in
    [0, salt_buckets); the (small-ish) RIGHT side is replicated once per
    salt value; the join keys on (key, salt), so a hot key's rows land on
    ``salt_buckets`` different reducers instead of one.

    Right-side cost is ``salt_buckets ×`` replication — use when the
    right side is too big to broadcast outright but a hot left key melts
    a single shuffle partition. (With AQE's skewedJoin enabled Spark
    splits skewed partitions adaptively at runtime; the explicit salt is
    the deterministic, planner-visible form, and works for aggregating
    joins where AQE's split cannot apply.)"""
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets))
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return l.join(r, on=keys + ["_salt"]).drop("_salt")


def estimate_key_skew(
    df: DataFrame, on: str | Sequence[str], fraction: float = 0.02, seed: int = 7
) -> float:
    """Approximate max single-key row share of ``df`` from one seeded
    sample job (the ``measured_strategy`` probe discipline: a scalar to
    the driver, never the rows). 0.5 means half of all rows carry one
    key — the planted-skew shape of SCALING.md r8's study. Returns 0.0
    for an empty sample (no evidence of skew)."""
    keys = [on] if isinstance(on, str) else list(on)
    s = df.select(*keys).sample(fraction=fraction, seed=seed)
    agg = s.groupBy(*keys).count().agg(
        F.max("count").alias("top"), F.sum("count").alias("n")
    ).first()
    if not agg or not agg.n:
        return 0.0
    return float(agg.top) / float(agg.n)


def choose_skew_join_strategy(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    broadcast_row_cap: int = 1_000_000,
    broadcast_byte_cap: int = 512 << 20,
    skew_share_threshold: float = 0.05,
    sample_fraction: float = 0.02,
) -> tuple[str, dict]:
    """Measured skew-join picker (round-8 study, SCALING.md r8 — the
    numbers, 10M-row left with a 50%-hot key joining 1M-row right,
    min of 2, noop-forced):

    - ``broadcast`` 0.72 s — wins outright whenever the right side fits
      (the study's 1M-row right is ~16 MB); probed by ONE count.
    - ``aqe_skew`` 1.38 s — a plain shuffle join with AQE's skew split
      beats explicit salting (2.03 s at 8 buckets, 2.96 s at 32) AND
      held up in the join→aggregate shape (2.48 s vs salted 3.18 s).
      CAVEAT the study surfaced: AQE's DEFAULTS never fired at this
      scale — the 50%-hot partition (~80 MB) sits under the 256 MB
      ``skewedPartitionThresholdInBytes``, so "AQE on" silently ran
      unsplit (3.02 s) until the threshold was tuned to 8 MB. At
      100 TB the hot partition dwarfs the default and AQE fires
      unaided; at dev scale, tune or salt.
    - ``salted`` — the deterministic, planner-visible fallback when AQE
      is off (or its thresholds can't be touched): still 1.5× better
      than the unsplit join at 8 buckets.
    - ``plain`` — no measured skew above ``skew_share_threshold``;
      salting would only pay replication cost.

    Returns (strategy, diagnostics) — diagnostics carries the probed
    right-side rows, the sampled max key share, and whether AQE skew
    handling is live in this session, so callers can log the decision.
    """
    spark = left.sparkSession
    n_right = right.count()
    diag: dict = {"right_rows": n_right}
    if n_right <= broadcast_row_cap:
        # A row cap alone is blind to WIDE rows (round-8 review: 1M
        # document/embedding rows are GBs, over the broadcast hard
        # limit where a shuffle join succeeds). Estimate bytes from a
        # bounded sample's JSON width — an overestimate, which errs
        # toward the safe (shuffle) side. Catalyst's sizeInBytes
        # statistic was tried here (round-8 verdict nit) and MEASURED
        # unsound in BOTH directions without CBO: a derived string
        # column carries a default ~20-byte width (understates wide
        # projections — the round-8 bug), and a selective Filter does
        # NOT shrink the stat (a 50-row filtered dimension reports the
        # full table's bytes and would wrongly veto its broadcast).
        # The 200-row sample job stays.
        sample = right.limit(min(n_right, 200) or 1)
        avg = (
            sample.select(
                F.avg(F.length(F.to_json(F.struct(*right.columns)))).alias("b")
            ).first().b
            or 0.0
        )
        diag["right_bytes_est"] = int(avg * n_right)
        if diag["right_bytes_est"] <= broadcast_byte_cap:
            return "broadcast", diag
    share = estimate_key_skew(left, on, fraction=sample_fraction)
    diag["max_key_share"] = round(share, 4)
    # Conf values are user-set strings: 'TRUE'/'True' are live AQE too
    # (round-8 ADVICE — the case-sensitive compare silently downgraded
    # to the salted strategy: correct rows, slower plan).
    aqe_live = (
        str(spark.conf.get("spark.sql.adaptive.enabled", "true")).lower() == "true"
        and str(spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true")).lower()
        == "true"
    )
    diag["aqe_skew_live"] = aqe_live
    if share >= skew_share_threshold:
        return ("aqe_skew" if aqe_live else "salted"), diag
    return "plain", diag


def skew_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    strategy: str = "auto",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi join with the measured skew policy applied
    (:func:`choose_skew_join_strategy`): same rows as a plain
    ``left.join(right, on)`` under EVERY strategy (pytest-pinned) —
    only the physical plan differs."""
    if strategy == "auto":
        strategy, _ = choose_skew_join_strategy(left, right, on)
    keys = [on] if isinstance(on, str) else list(on)
    if strategy == "broadcast":
        return left.join(F.broadcast(right), on=keys)
    if strategy == "salted":
        return salted_join(left, right, on, salt_buckets=salt_buckets)
    if strategy in ("plain", "aqe_skew"):
        # aqe_skew IS the plain join — the split happens at runtime;
        # the name records that the picker verified AQE is live.
        return left.join(right, on=keys)
    raise ValueError(f"unknown skew-join strategy {strategy!r}")


def key_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    max_keys: int = 4_000_000,
    on_overflow: str = "plain",
) -> DataFrame:
    """Semi-join reduction: ship the (filtered) dimension's DISTINCT join
    keys as a broadcast semi-filter on the fact BEFORE the join shuffle,
    so only fact rows that can match are ever shuffled.

    The 100 TB shape this exists for: fact is the scan-dominant side, dim
    is selectively filtered but its ROWS are too wide to broadcast whole
    (``broadcast_join`` would OOM executors), yet its distinct KEYS fit
    comfortably. A plain SMJ shuffles ALL fact rows; with a 1% selective
    dim filter, 99% of that shuffle is bytes moved to be discarded at the
    join. This is exactly the rewrite Spark's runtime bloom filter
    (``spark.sql.optimizer.runtime.bloomFilter.*``) injects adaptively —
    measured head-to-head in SCALING.md r11 — but the explicit form is
    exact (no false-positive pass-through), planner-visible, works below
    the injection thresholds, and survives persist()/checkpoint barriers
    that hide the creation-side filter from the optimizer rule.

    Reference analog: the join package's inner composite expression
    evaluates smallest-source keys first (``M/join/JoinRecordReader.java``)
    — the same "probe the cheap side, skip the expensive rows" physics,
    per-split instead of cluster-wide.

    Correctness: only ``inner`` and ``left_semi`` are accepted — for any
    fact-preserving join (left/full outer) dropping unmatched fact rows
    up front would change the result. The key set is probed with one
    bounded count (``LIMIT max_keys+1`` over the partial-agg distinct, an
    early-out job); past the cap, ``on_overflow`` picks ``"plain"`` (fall
    back to the unfiltered join — correct either way, pytest-pinned) or
    ``"raise"``. The dim side is evaluated twice (keys pass + join pass);
    that is two scans of the SMALL side bought against a fact-shuffle
    reduction proportional to dim selectivity — at 100 TB the trade is
    not close. Default cap 4M keys ≈ 32 MB of broadcast longs, inside
    the same budget ``choose_skew_join_strategy`` allows a build side.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"key_prefilter_join is only sound for inner/left_semi joins, got {how!r}"
        )
    if on_overflow not in ("plain", "raise"):
        raise ValueError(f"unknown on_overflow {on_overflow!r}")
    keys = [on] if isinstance(on, str) else list(on)
    key_set = dim.select(*keys).distinct()
    probed = key_set.limit(max_keys + 1).count()
    if probed > max_keys:
        if on_overflow == "raise":
            raise ValueError(
                f"dim has >{max_keys} distinct join keys — broadcasting the key set "
                "would blow the executor budget; raise max_keys or use the plain join"
            )
        return fact.join(dim, on=keys, how=how)
    reduced = fact.join(F.broadcast(key_set), on=keys, how="left_semi")
    if how == "left_semi":
        # The prefilter IS the semi join once the keys fit — done.
        return reduced
    return reduced.join(dim, on=keys, how=how)
