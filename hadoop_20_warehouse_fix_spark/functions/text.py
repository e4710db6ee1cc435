"""Text-analysis column functions (BASELINE.json extension pack):
language-ID heuristic, quality scoring, token counting, fingerprinting.

All hot-path functions are built-in-expression compositions (JVM-side,
codegen'd) — not UDFs — so they run at scan speed over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.operators.dedup import normalize_text, words_of

# Marker stopwords per language (small public high-frequency lists).
# Deterministic heuristic: score = number of token occurrences in the
# marker set; prediction = argmax with fixed priority on ties.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ein", "zu"),
    "es": ("el", "los", "que", "y", "en", "es", "una", "las"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans"),
}
LANG_PRIORITY = ("en", "de", "es", "fr")  # tie-break order (fixed)


def marker_count(text: Column, markers: tuple[str, ...]) -> Column:
    """Occurrences (not distinct) of marker tokens in the text."""
    return F.size(F.filter(words_of(text), lambda w: w.isin(*markers)))


def lang_id(text: Column) -> Column:
    """Predicted language code, or 'unknown' when no marker hits.
    n-gram-free stopword heuristic — deterministic and oracle-mirrorable;
    swap in a real model via pandas_udf where accuracy matters.

    Delegates the argmax/tie-break CASE chain to
    :func:`lang_from_scores` (single source of truth — the fused
    corpus_clean path shares it), composed over per-language
    ``marker_count`` HOFs. Hot paths should prefer the one-traversal
    :func:`langscore_struct` + :func:`lang_from_scores` layering."""
    return lang_from_scores(
        {lang: marker_count(text, LANG_MARKERS[lang]) for lang in LANG_PRIORITY}
    )


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words_of(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token count: word pieces + standalone punctuation
    (``\\w+|[^\\w\\s]`` occurrences) — the cheap proxy for LLM token
    budgeting over a corpus."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-word, non-space characters."""
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[\w\s]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, markers: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    n = ws_token_count(text)
    return F.when(n > 0, marker_count(text, markers) / n).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    words = words_of(text)
    n = F.size(words)
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length saturation × (1 − punct excess)
    × word-shape sanity. Deterministic arithmetic over the components —
    the standard cheap pre-filter before expensive model scoring.

    Delegates the arithmetic to :func:`quality_from_parts` (single
    source of truth shared with the fused corpus_clean path), composed
    over inline counting expressions. Hot paths should materialize the
    token array once and feed :func:`quality_from_parts` directly."""
    words = words_of(text)
    return quality_from_parts(
        F.size(words),
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)),
        F.length(text),
        F.length(F.regexp_replace(text, r"[\w\s]", "")),
    )


def langscore_struct(words: Column) -> Column:
    """Language-marker scoring over a BOUND token-array column: all four
    marker counts plus the total word length, as one struct.

    Why this exists next to :func:`lang_id`: hot paths materialize the
    token array once and score it here; the composed
    ``lang_id``+``quality_score`` form re-tokenizes per component.

    Physical form (round 14, measured at sf0.1, value-identical): four
    ``size(filter(words, isin))`` passes plus
    ``length(array_join(words, ''))``. This replaces the round-4
    single-pass ``F.aggregate`` with a struct accumulator — measured
    SLOWER despite walking once: every interpreted step allocated a
    fresh 5-field InternalRow per token, where filter+size keeps an int
    counter and array_join is one buffer append per token. Gate stage
    1.30 s -> 0.95 s (struct-aggregate -> this form); per-token
    allocation, not traversal count, is what dominates an interpreted
    HOF. ``words`` must be a materialized column (see
    :func:`~hadoop_20_warehouse_fix_spark.operators.dedup.doc_shingle_sets`
    for the projection-barrier idiom), not an inline ``split`` — an
    inline expression would be re-evaluated per lambda reference.

    NULL contract (round-14 ADVICE): ``words`` must be a NULL-free
    array, as ``split()`` always produces — ``array_join`` SKIPS NULL
    elements where the replaced ``F.aggregate`` form null-propagated,
    so an array with NULL tokens would score silently rather than
    yield a NULL struct field."""
    return F.struct(
        *[
            F.size(F.filter(words, lambda w: w.isin(*LANG_MARKERS[lang]))).alias(lang)
            for lang in LANG_PRIORITY
        ],
        F.length(F.array_join(words, "")).alias("sum_len"),
    )


def lang_from_scores(scores: dict[str, Column]) -> Column:
    """The :func:`lang_id` argmax/tie-break CASE chain over BOUND score
    columns — same prediction semantics, but each score is referenced
    as a cheap column instead of re-evaluating a marker-count HOF."""
    expr = F.lit("unknown")
    for lang in reversed(LANG_PRIORITY):
        cond = scores[lang] > 0
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            if LANG_PRIORITY.index(other) < LANG_PRIORITY.index(lang):
                cond = cond & (scores[lang] > scores[other])
            else:
                cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_from_parts(n_words: Column, sum_len: Column, n_chars: Column, n_punct: Column) -> Column:
    """:func:`quality_score`'s arithmetic over pre-computed counting
    columns (same operation order, so results are bit-identical)."""
    punct = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    wl = F.when(n_words > 0, sum_len / n_words).otherwise(F.lit(0.0))
    length_part = F.least(n_words / F.lit(50.0), F.lit(1.0))
    punct_part = F.greatest(F.lit(1.0) - punct * 4, F.lit(0.0))
    shape_part = F.when((wl >= 2.0) & (wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return length_part * punct_part * shape_part


def repetition_struct(words: Column) -> Column:
    """Gopher-style repetition signals (Rae et al. 2021, app. A1:
    repetitive documents are low-quality training data) as EXACT
    INTEGER counts — ``struct(n_words, n_distinct_words,
    top_word_count, n_bigrams, n_distinct_bigrams)``.

    Integer outputs on purpose: downstream ratio gates (top-word
    fraction > 1/5, duplicate-bigram fraction > 3/10) become integer
    cross-multiplications, exact in any engine — immune to the
    float round()-tie divergence (Spark half-up vs DuckDB half-even)
    the round-4 sf0.1 oracle sweep caught in window_distribution.

    top_word_count is a run-length fold over the sorted token array
    (max run = max frequency), not a per-distinct-token refilter — the
    fold is O(L log L) per doc vs O(d*L). All bound-column HOFs:
    scan-fused, zero shuffle, skew bounded by max doc length.
    ``words`` must be a materialized column (projection-barrier idiom,
    see langscore_struct)."""
    n = F.size(words)
    sw = F.array_sort(words)
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(a: Column, w: Column) -> Column:
        run = F.when(w.eqNullSafe(a["prev"]), a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            w.alias("prev"), run.alias("run"), F.greatest(a["best"], run).alias("best")
        )

    top = F.aggregate(sw, zero, step, lambda a: a["best"])
    tail_len = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(words, 1, tail_len),
        F.slice(words, 2, tail_len),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.struct(
        n.cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct_words"),
        top.cast("long").alias("top_word_count"),
        F.size(bigrams).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).cast("long").alias("n_distinct_bigrams"),
    )


def repetition_struct_pandas(words: Column) -> Column:
    """Arrow-batched alternate physical strategy for
    :func:`repetition_struct` — identical output contract (exact
    integer counts), pandas_udf transport instead of the interpreted
    JVM array-HOF fold.

    Exists because the fold is a CodegenFallback expression: if a
    profile ever shows it dominating a real ingest, this is the
    documented escape hatch. Measured head-to-head in SCALING.md round
    4 — the winner is corpus-dependent (Arrow ships every token string
    to Python, the fold never leaves the JVM), which is exactly why
    BOTH live behind one contract and an equality pytest, the same
    fold-vs-BLAS discipline as the IVF assignment paths."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # No type-hint signature: `from __future__ import annotations`
    # stringifies hints and the local `pd` alias can't be resolved by
    # pyspark's hint inspector — the explicit returnType carries the
    # struct schema instead.
    def _rep(ws_col):
        rows = []
        for ws in ws_col:
            if ws is None:
                rows.append((None, None, None, None, None))
                continue
            toks = list(ws)
            n = len(toks)
            if n:
                counts: dict[str, int] = {}
                for w in toks:
                    counts[w] = counts.get(w, 0) + 1
                nd, top = len(counts), max(counts.values())
            else:
                nd, top = 0, 0
            if n >= 2:
                bg = {f"{toks[i]} {toks[i + 1]}" for i in range(n - 1)}
                nb, ndb = n - 1, len(bg)
            else:
                nb, ndb = 0, 0
            rows.append((n, nd, top, nb, ndb))
        return pd.DataFrame(
            rows,
            columns=[
                "n_words", "n_distinct_words", "top_word_count",
                "n_bigrams", "n_distinct_bigrams",
            ],
        )

    rep = pandas_udf(
        _rep,
        returnType=(
            "n_words long, n_distinct_words long, top_word_count long,"
            " n_bigrams long, n_distinct_bigrams long"
        ),
    )
    return rep(words)


def md5_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 hex of normalized text (cross-engine
    stable — DuckDB md5 produces identical hex)."""
    return F.md5(normalize_text(text))


def rolling_fingerprint(text: Column, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over word-level hashes, mod a 30-bit
    prime: acc = (acc*base + wordhash) % mod. Order-sensitive (unlike
    md5-of-whole which is format-sensitive) — detects reorderings.
    Fold stays within signed-64 bounds (no ANSI overflow).

    Word hash = first 32 md5 bits (mod the prime) — engine-agnostic, so
    the fingerprint is reproducible in any system with md5 (the DuckDB
    oracle replays it bit-for-bit; xxhash64 would be Spark-only)."""
    word_h = lambda w: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long"), F.lit(mod)
    )
    return F.aggregate(
        words_of(text),
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * base + word_h(w), F.lit(mod)),
    )


# PII scrubbing (training-data preparation): conservative, deterministic
# regex redaction. Patterns stay in the common regex subset (character
# classes + quantifiers — no lookarounds), so Java (Spark) and RE2-style
# engines (DuckDB oracle) agree byte-for-byte.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IPV4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "PHONE": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
}


def redact_pii(text: Column, kinds: tuple[str, ...] = ("EMAIL", "IPV4", "PHONE")) -> Column:
    """Replace each PII match with ``<KIND>`` — the cheap deterministic
    scrub a corpus pass runs before anything else sees the text. Order
    matters (EMAIL before PHONE so digits inside addresses don't
    half-match); all JVM-side regexp_replace, scan-fused."""
    out = text
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind}>")
    return out


def pii_counts(text: Column) -> Column:
    """Struct of per-kind match counts — the audit metric (how much PII
    a corpus slice carries) without materializing the matches."""
    return F.struct(
        *[
            F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(kind.lower())
            for kind, pat in PII_PATTERNS.items()
        ]
    )
