"""Text / selection queries — field selection and regex ops (SURVEY.md
§2.2), wordcount + inverted index (§2.9 index contrib), and the text-
analysis extension pack (lang-id, quality, token stats, fingerprints)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_20_warehouse_fix_spark.catalog import load_table
from hadoop_20_warehouse_fix_spark.operators.fieldspec import field_select
from hadoop_20_warehouse_fix_spark.queries import query


@query(
    "field_selection_cut",
    oracle="""
    WITH lines AS (
      SELECT concat_ws(CHR(9), CAST(s_suppkey AS VARCHAR), s_name,
                       CAST(s_nationkey AS VARCHAR), CAST(s_acctbal AS VARCHAR)) AS line
      FROM supplier
    ), split_lines AS (SELECT string_split(line, CHR(9)) AS f FROM lines)
    SELECT concat_ws(CHR(9), f[3], f[1]) AS key,
           array_to_string(f[2:], CHR(9)) AS value
    FROM split_lines
    """,
)
def field_selection_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field selection ("cut") — FieldSelectionMapReduce
    (``M/lib/FieldSelectionMapReduce.java:64``; spec parse
    ``extractFields:182``). Spec ``"2,0:1-"`` → key = fields 2,0;
    value = fields 1..end, tab-separated. Compiles to split/slice/join
    Column exprs — no UDF, narrow op, codegen'd."""
    supp = load_table(spark, sf_dir, "supplier").select(
        F.concat_ws(
            "\t",
            F.col("s_suppkey").cast("string"),
            F.col("s_name"),
            F.col("s_nationkey").cast("string"),
            F.col("s_acctbal").cast("string"),
        ).alias("line")
    )
    return field_select(supp, "line", "2,0:1-", sep="\t")


@query(
    "text_wordcount",
    headline=True,
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordCount (``E/WordCount.java:17``, TokenCountMapper
    ``M/lib/TokenCountMapper.java:38``): tokenize → explode → count.
    Map-side partial agg makes shuffle volume O(vocabulary), not
    O(tokens) — the same reason the reference ran a combiner."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_grep_topk",
    oracle="""
    SELECT match, count(*) AS n
    FROM (SELECT unnest(regexp_extract_all(text, '[a-z]*a[a-z]*')) AS match FROM documents)
    WHERE match <> ''
    GROUP BY match
    ORDER BY n DESC, match
    LIMIT 20
    """,
)
def text_grep_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep (``E/Grep.java:34``: RegexMapper extract + count, then job 2
    sorts by count desc). The reference needed two MR jobs and a single
    reducer; here extract → explode → count → TakeOrdered in one plan."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.regexp_extract_all(F.col("text"), F.lit("[a-z]*a[a-z]*"), 0)).alias("match"))
        .filter(F.col("match") != "")
        .groupBy("match")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("match"))
        .limit(20)
    )


@query(
    "text_inverted_index",
    oracle="""
    SELECT word,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           count(*) AS n_occurrences
    FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the index contrib
    (``X/index/.../IndexUpdateMapper.java:39``: doc → (term, op) →
    sharded index via combiner/reducer). Relational form: doc→term
    explode, per-term document frequency + occurrence count. The shard
    distribution policy maps to hash partitioning on term."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
    )


# ---------------------------------------------------------------------------
# Text-analysis extension pack (BASELINE.json): lang-id, quality, token
# stats, fingerprints — all built-in-expression compositions (no UDFs).
# ---------------------------------------------------------------------------

from hadoop_20_warehouse_fix_spark.functions.text import (  # noqa: E402
    bpe_ish_token_count,
    md5_fingerprint,
    rolling_fingerprint,
    ws_token_count,
)

_WORDS_CTE = """
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS words
      FROM documents
    )
"""


@query(
    "text_lang_id",
    oracle=_WORDS_CTE
    + """
    , s AS (
      SELECT doc_id,
        len(list_filter(words, w -> w IN ('the','and','of','to','a','in','is','it')))       AS s_en,
        len(list_filter(words, w -> w IN ('der','die','und','das','nicht','ist','ein','zu'))) AS s_de,
        len(list_filter(words, w -> w IN ('el','los','que','y','en','es','una','las')))     AS s_es,
        len(list_filter(words, w -> w IN ('le','la','et','les','des','est','une','dans')))  AS s_fr
      FROM t)
    SELECT doc_id, CASE
      WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
      WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
      WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
      WHEN s_fr > 0 THEN 'fr'
      ELSE 'unknown' END AS pred_lang
    FROM s
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID — deterministic stopword-marker heuristic (argmax of
    marker-token occurrences, fixed priority tie-break; see
    functions.text.LANG_MARKERS). Pure column expressions → runs at scan
    speed; swap a model in via pandas_udf where accuracy matters.

    Physical form (round 15, value-identical, oracle-checked): the
    r14 corpus-gate layering — fan out a single-split scan, materialize
    the token array ONCE, score all four languages through
    ``langscore_struct``, then the argmax CASE chain reads the
    materialized struct fields. The composed ``lang_id`` form
    re-tokenized the raw text once per language (4 ``words_of`` HOFs,
    each re-run by every argmax reference); measured at sf0.1 this ran
    as ONE 0.28 s task. No filter references the derived columns, so no
    pushdown-duplication guard is needed (unlike corpus_clean)."""
    from hadoop_20_warehouse_fix_spark.catalog import fan_out_small_scan
    from hadoop_20_warehouse_fix_spark.functions.text import (
        LANG_PRIORITY,
        lang_from_scores,
        langscore_struct,
    )
    from hadoop_20_warehouse_fix_spark.operators.dedup import words_of

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    tokened = docs.select("doc_id", words_of(F.col("text")).alias("_w"))
    counted = tokened.select(
        "doc_id", langscore_struct(F.col("_w")).alias("ls")
    )
    scores = {lang: F.col("ls")[lang] for lang in LANG_PRIORITY}
    return counted.select(
        "doc_id", lang_from_scores(scores).alias("pred_lang")
    )


@query(
    "text_quality_score",
    oracle=_WORDS_CTE
    + """
    , c AS (
      SELECT doc_id,
        len(words) AS n_tokens,
        CASE WHEN length(text) > 0
             THEN length(regexp_replace(text, '[\\w\\s]', '', 'g')) * 1.0 / length(text)
             ELSE 0.0 END AS p_ratio,
        CASE WHEN len(words) > 0
             THEN list_sum(list_transform(words, w -> length(w))) * 1.0 / len(words)
             ELSE 0.0 END AS mwl
      FROM t)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(p_ratio, 6) AS punct_ratio,
           round(mwl, 4) AS mean_word_len,
           round(least(n_tokens / 50.0, 1.0)
                 * greatest(1.0 - p_ratio * 4, 0.0)
                 * (CASE WHEN mwl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END), 6) AS quality
    FROM c
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring — length saturation, punctuation excess, word-
    shape sanity (functions.text.quality_score). The cheap distributed
    pre-filter before model-based scoring in a training-data pipeline.

    Physical form (round 15, value-identical, oracle-checked): fan out
    the single-split scan, materialize the token array and the four
    counting columns ONCE, then derive every output from them through
    ``quality_from_parts`` (bit-identical arithmetic by construction —
    same operation order as ``quality_score``). The composed form
    re-tokenized the text per component (~5 ``words_of`` HOFs: token
    count, mean length twice inside quality, once standalone) and ran
    as ONE 0.43 s task at sf0.1. ``sum_len`` via
    ``length(array_join(_w, ''))`` ≡ the aggregate fold on split()'s
    NULL-free arrays (the langscore_struct NULL contract)."""
    from hadoop_20_warehouse_fix_spark.catalog import fan_out_small_scan
    from hadoop_20_warehouse_fix_spark.functions.text import quality_from_parts
    from hadoop_20_warehouse_fix_spark.operators.dedup import words_of

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    tokened = docs.select("doc_id", "text", words_of(F.col("text")).alias("_w"))
    counted = tokened.select(
        "doc_id",
        F.size("_w").alias("n"),
        F.length(F.array_join("_w", "")).alias("sum_len"),
        F.length("text").alias("n_chars"),
        F.length(F.regexp_replace("text", r"[\w\s]", "")).alias("n_punct"),
    )
    n, sum_len = F.col("n"), F.col("sum_len")
    n_chars, n_punct = F.col("n_chars"), F.col("n_punct")
    return counted.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)), 6
        ).alias("punct_ratio"),
        F.round(
            F.when(n > 0, sum_len / n).otherwise(F.lit(0.0)), 4
        ).alias("mean_word_len"),
        F.round(quality_from_parts(n, sum_len, n_chars, n_punct), 6).alias(
            "quality"
        ),
    )


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting — whitespace tokens and a BPE-ish piece count
    (word chunks + standalone punctuation), the cheap corpus token
    budget. Pure regexp expressions, codegen'd."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        ws_token_count(t).cast("long").alias("n_ws_tokens"),
        bpe_ish_token_count(t).cast("long").alias("n_bpe_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 hex over normalized text — cross-engine
    stable (identical hex in DuckDB), the join key for exact dedup and
    incremental-ingest change detection."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", md5_fingerprint(F.col("text")).alias("fingerprint"))


@query(
    "text_rolling_fingerprint",
    oracle=_WORDS_CTE
    + """
    SELECT doc_id,
           list_reduce(
             [CAST(0 AS BIGINT)] ||
             list_transform(words, w ->
               CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % 1000000007),
             (acc, h) -> (acc * 31 + h) % 1000000007) AS rolling_fp
    FROM t
    """,
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling (polynomial) hash over word hashes —
    detects reorderings md5-of-whole misses. md5-derived word hashes
    make it engine-agnostic: the DuckDB oracle replays the identical
    fold."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_fingerprint(F.col("text")).alias("rolling_fp"))


@query(
    "text_redact_pii",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IPV4>', 'g'),
                 '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]', '<PHONE>', 'g')) AS redacted_md5,
           CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text,
                 '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS BIGINT) AS n_ipv4
    FROM documents
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass (emails / IPv4s / phone-shaped digit runs →
    typed placeholders) + per-kind audit counts — the standard
    training-corpus hygiene step, entirely JVM-side regexp (scan-fused,
    zero shuffle). The redacted text is compared as md5 (long strings
    hash-stable); patterns use the regex subset both engines parse
    identically."""
    from hadoop_20_warehouse_fix_spark.functions.text import pii_counts, redact_pii

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.md5(redact_pii(t)).alias("redacted_md5"),
        pii_counts(t).getField("email").cast("long").alias("n_email"),
        pii_counts(t).getField("ipv4").cast("long").alias("n_ipv4"),
    )


@query(
    "text_bigram_topk",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS words
      FROM documents
    ), bg AS (
      SELECT unnest(list_transform(generate_series(1, greatest(len(words) - 1, 0)),
                                   i -> words[i] || ' ' || words[i+1])) AS bigram
      FROM w
    )
    SELECT bigram, n FROM (
      SELECT bigram, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, bigram) AS rk
      FROM bg GROUP BY bigram
    ) WHERE rk <= 20
    """,
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word bigrams across the corpus — the n-gram frequency pass
    (phrase mining / contamination screening) an LLM corpus audit runs.
    Tokenize once per doc, pair adjacent words via a zip_with over the
    array and its tail (no per-token self-join), explode, count with
    map-side partials (shuffle is O(bigram vocabulary)), deterministic
    TakeOrdered top-k (count desc, bigram asc)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    counted = (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # (n desc, bigram asc) is a unique total order, so orderBy+limit is
    # exactly the row_number()<=20 result — but it compiles to the
    # distributed TakeOrderedAndProject instead of an unpartitioned
    # window that would drag the whole bigram vocabulary onto one task.
    return (
        counted.orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
        .select("bigram", "n")
    )


@query(
    "text_repetition_stats",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS words
      FROM documents
    ), b AS (
      SELECT doc_id, words,
             list_transform(generate_series(1, greatest(len(words) - 1, 0)),
                            i -> words[i] || ' ' || words[i+1]) AS bigrams
      FROM w
    ), s AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct_words,
             CAST(COALESCE(list_max(list_transform(list_distinct(words),
                    d -> len(list_filter(words, x -> x = d)))), 0) AS BIGINT) AS top_word_count,
             CAST(len(bigrams) AS BIGINT) AS n_bigrams,
             CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct_bigrams
      FROM b
    )
    SELECT *,
           (top_word_count * 5 > n_words
            OR (n_bigrams - n_distinct_bigrams) * 10 > n_bigrams * 3) AS repetitive
    FROM s
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate (Rae et al. 2021 app. A1):
    per-doc exact counts — total/distinct words, most-frequent-word
    count (run-length fold over the sorted token array), total/distinct
    adjacent bigrams — plus the ``repetitive`` flag via INTEGER
    cross-multiplication (top-word fraction > 1/5 OR duplicate-bigram
    fraction > 3/10), so engines can never disagree on a float tie.
    The oracle recomputes top_word_count the O(d*L) way (per-distinct
    refilter) — agreement across the two algorithms is part of the
    check. Scan-fused per-row work, zero shuffle; at 100 TB this rides
    the same pass as the language/quality gates.

    Round 15: `fan_out_small_scan` — the run-length fold + bigram
    distinct are the heaviest per-row HOFs in the text pack and ran as
    ONE 0.50 s task on the single-split sf0.1 scan (31 cores idle);
    fanned: wall 0.64 -> 0.46 s (exec 0.50 -> 0.26), value-identical,
    no-op at natural-split scale."""
    from hadoop_20_warehouse_fix_spark.catalog import fan_out_small_scan
    from hadoop_20_warehouse_fix_spark.functions.text import repetition_struct
    from hadoop_20_warehouse_fix_spark.operators.dedup import words_of

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", words_of(F.col("text")).alias("words"))
    r = tok.select("doc_id", repetition_struct(F.col("words")).alias("r"))
    flat = r.select(
        "doc_id",
        *[F.col("r")[c].alias(c) for c in
          ("n_words", "n_distinct_words", "top_word_count", "n_bigrams", "n_distinct_bigrams")],
    )
    return flat.withColumn(
        "repetitive",
        (F.col("top_word_count") * 5 > F.col("n_words"))
        | ((F.col("n_bigrams") - F.col("n_distinct_bigrams")) * 10 > F.col("n_bigrams") * 3),
    )
