"""Text-analysis queries over `documents`, oracle-checked.

The oracle SQL re-implements the exact same algorithms in DuckDB
(same codepoint fold, same lexicons, same arithmetic order), so these
are checked value-exactly like every relational query — no weaker
rows-only fallback needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.operators.text import (
    LANG_LEXICONS,
    LANG_PRIORITY,
    TOKEN_REGEX,
    simhash16,
    text_profile,
    ws_tokens,
)
from parquet_to_sql_spark.queries.registry import query

# ---- shared DuckDB fragments -------------------------------------------
DUCK_FOLD = (
    "list_reduce(list_transform(string_split({s}, ''), "
    "c -> CAST(ascii(c) AS BIGINT)), (acc, x) -> (acc*31 + x) % 2147483647)"
)
DUCK_WORDS = "string_split_regex(trim(text), '\\s+')"


def _lex_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in LANG_LEXICONS[lang]) + "]"


def _duck_hits(lang: str) -> str:
    return (
        f"len(list_filter({_lex_list(lang)}, "
        f"w -> list_contains(string_split_regex(trim(lower(text)), '\\s+'), w)))"
    )


def _duck_lang_case() -> str:
    clauses = []
    for lang in LANG_PRIORITY:
        others = ", ".join(_duck_hits(o) for o in LANG_PRIORITY if o != lang)
        clauses.append(
            f"WHEN {_duck_hits(lang)} > 0 AND {_duck_hits(lang)} >= greatest({others}) "
            f"THEN '{lang}'"
        )
    return "CASE " + " ".join(clauses) + " ELSE 'unknown' END"


_ALL_STOP = sorted({w for lex in LANG_LEXICONS.values() for w in lex})
_ALL_STOP_LIST = "[" + ", ".join(f"'{w}'" for w in _ALL_STOP) + "]"

_DUCK_QUALITY = f"""
    CAST(0.4 AS DOUBLE) * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
  + CAST(0.4 AS DOUBLE) * least(
        CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             w -> list_contains({_ALL_STOP_LIST}, w))) AS DOUBLE)
        / greatest(CAST(len({DUCK_WORDS}) AS DOUBLE), 1.0) * 8.0, 1.0)
  + CAST(0.2 AS DOUBLE) * (1.0 - least(
        CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
        / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0))
"""


@query(
    "text_profile_documents",
    headline=True,
    tags=("text-analysis", "llm-pipeline"),
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS INT)                       AS n_chars,
           CAST(len({DUCK_WORDS}) AS INT)                  AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS INT) AS n_bpe_tokens,
           {_duck_lang_case()}                             AS lang_pred,
           {_DUCK_QUALITY}                                 AS quality,
           {DUCK_FOLD.format(s="text")}                    AS fingerprint
    FROM documents
    """,
)
def text_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full text-analysis profile: counts, language ID, quality score,
    rolling-hash fingerprint — one narrow projection, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return text_profile(docs, "doc_id", "text")


_SIMHASH_BITS = 16
_votes = ",\n           ".join(
    f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
    for i in range(_SIMHASH_BITS)
)
_recombine = " + ".join(
    f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(_SIMHASH_BITS)
)


@query(
    "text_simhash",
    tags=("text-analysis", "dedup", "llm-pipeline"),
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({DUCK_WORDS}) AS tok FROM documents
    ), hashed AS (
      SELECT doc_id, {DUCK_FOLD.format(s="tok")} AS h FROM tok
    ), votes AS (
      SELECT doc_id,
           {_votes}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({_recombine} AS BIGINT) AS simhash FROM votes
    """,
)
def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash sketch per document (explode + one groupBy)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash16(docs, "doc_id", "text")


@query(
    "text_lang_distribution",
    tags=("text-analysis",),
    oracle=f"""
    SELECT {_duck_lang_case()} AS lang_pred, COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang_pred
    """,
)
def text_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID rollup (heuristic lang vs corpus size)."""
    from parquet_to_sql_spark.operators.text import lang_id

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(lang_id(F.col("text")).alias("lang_pred"), "n_chars")
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "text_word_counts_top20",
    tags=("text-analysis", "explode"),
    oracle=f"""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest({DUCK_WORDS}) AS word FROM documents) t
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def text_word_counts_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical explode-groupBy-topk word count (LATERAL VIEW
    pattern); partial aggregation keeps the shuffle at vocabulary
    size, not token count."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(ws_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


_DUCK_GOPHER = f"""
    WITH staged AS (
      SELECT doc_id,
             text AS t,
             {DUCK_WORDS} AS w,
             string_split_regex(trim(lower(text)), '\\s+') AS lw,
             string_split(text, chr(10)) AS lines
      FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)),
                         (a, b) -> a + b) AS word_chars,
             CAST(len(regexp_extract_all(t, '#|\\.\\.\\.')) AS BIGINT) AS n_sym,
             CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]'))) AS BIGINT) AS n_bullet,
             CAST(len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) AS BIGINT) AS n_ellipsis,
             CAST(len(list_filter({{stops}}, s -> list_contains(lw, s))) AS BIGINT) AS stop_distinct,
             CAST(length(t) AS BIGINT) AS n_chars
      FROM staged
    )
    SELECT doc_id,
           n_words,
           (n_words >= 20 AND n_words <= 100000)        AS r_word_count,
           (n_chars >= 100)                             AS r_char_count,
           (3*n_words <= word_chars AND word_chars <= 10*n_words) AS r_mean_word_len,
           (10*n_sym <= n_words)                        AS r_symbol_ratio,
           (5*n_alpha >= 4*n_words)                     AS r_alpha_words,
           (10*n_bullet <= 3*n_lines)                   AS r_bullet_lines,
           (10*n_ellipsis <= 3*n_lines)                 AS r_ellipsis_lines,
           (stop_distinct >= 2)                         AS r_stopwords,
           (n_words >= 20 AND n_words <= 100000
            AND n_chars >= 100
            AND 3*n_words <= word_chars AND word_chars <= 10*n_words
            AND 10*n_sym <= n_words
            AND 5*n_alpha >= 4*n_words
            AND 10*n_bullet <= 3*n_lines
            AND 10*n_ellipsis <= 3*n_lines
            AND stop_distinct >= 2)                     AS passes
    FROM m
""".format(stops=_ALL_STOP_LIST)


@query(
    "text_gopher_rules",
    headline=True,
    tags=("text-analysis", "llm-pipeline", "quality-filter"),
    oracle=_DUCK_GOPHER,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style corpus quality filter: one boolean flag per rule
    (word/char counts, mean word length, symbol ratio, alpha-word
    ratio, bullet/ellipsis line ratios, stopword diversity) plus the
    AND verdict.  All bounds are cross-multiplied integer comparisons
    — no float anywhere — and the whole thing is one narrow staged
    projection (codegen, no shuffle)."""
    from parquet_to_sql_spark.operators.text import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    return gopher_rules(docs, "doc_id", "text")


@query(
    "text_top_terms_per_doc",
    tags=("text-analysis", "tfidf", "llm-pipeline"),
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest({DUCK_WORDS}) AS word FROM documents) t
      GROUP BY doc_id, word
    ), wdf AS (
      SELECT doc_id, word, tf,
             CAST(COUNT(*) OVER (PARTITION BY word) AS BIGINT) AS df
      FROM tf
    )
    SELECT doc_id, word, tf, df, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tf DESC, df ASC, word) AS rk
      FROM wdf
    ) WHERE rk <= 3
    """,
)
def text_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document — the TF-IDF shape with
    an EXACT ranking: order by (tf DESC, df ASC, word) instead of
    tf*log(N/df), which sorts identically for fixed tf (log is
    monotone in 1/df) while keeping every output an integer, hence
    value-exact cross-engine (float idf scores differ in last-ulp
    libm).  Plan: one explode + (doc,word) groupBy, then df via a
    word-partitioned window ON THE AGGREGATED relation (vocabulary-
    sized, not token-stream-sized), then a doc-partitioned top-k
    window.  No joins, no driver-side vocabulary."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(ws_tokens(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    wdf = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("word")))
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("tf").desc(), F.col("df").asc(), F.col("word")
        )
    )
    return wdf.withColumn("rk", rk).filter(F.col("rk") <= 3)


_DUCK_WORDS_VAR = DUCK_WORDS  # shared fragment — do not fork
_DUCK_5GRAMS = (
    "list_distinct(list_transform(range(1, len(w) - 3), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))"
)
_DUCK_FOLD_S = DUCK_FOLD.format(s="s")  # shared fragment — do not fork


@query(
    "text_contamination_check",
    tags=("text-analysis", "decontamination", "llm-pipeline"),
    oracle=f"""
    WITH w AS (SELECT doc_id, {_DUCK_WORDS_VAR} AS w FROM documents),
    g AS (SELECT doc_id, {_DUCK_5GRAMS} AS grams FROM w),
    sh AS (SELECT doc_id, CAST(len(grams) AS INT) AS n_shingles,
                  unnest(list_transform(grams, s -> {_DUCK_FOLD_S})) AS h
           FROM g),
    bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 7 = 0)
    SELECT sh.doc_id, n_shingles,
           CAST(COUNT(*) AS BIGINT) AS n_overlap,
           (COUNT(*) * 10 >= n_shingles) AS heavy
    FROM sh JOIN bench USING (h)
    WHERE sh.doc_id % 7 <> 0
    GROUP BY sh.doc_id, n_shingles
    """,
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    5-gram with a held-out benchmark set (here the doc_id % 7 == 0
    slice stands in for the benchmark corpus).  The standard
    train-set hygiene pass before an eval: overlap is computed on
    HASHED shingles (narrow join key), candidates via one equality
    join on the hash — inverted-index shape, same scale story as the
    n-gram dedup join, and the benchmark side is the small relation
    (broadcastable when the benchmark is a real eval set instead of
    1/7 of the corpus).  Output: contaminated doc, its shingle count,
    overlapping-shingle count, and a cross-multiplied >=10% flag (no
    float division)."""
    from parquet_to_sql_spark.functions.hashing import char_fold_hash, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.transform(
            word_shingles(ws_tokens(F.col("text")), 5), char_fold_hash
        ).alias("hs"),
    ).select(
        "doc_id",
        F.size("hs").cast("int").alias("n_shingles"),
        F.explode("hs").alias("h"),
    )
    bench = sh.filter(F.col("doc_id") % 7 == 0).select("h").distinct()
    return (
        sh.filter(F.col("doc_id") % 7 != 0)
        .join(bench, "h")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .withColumn("heavy", F.col("n_overlap") * 10 >= F.col("n_shingles"))
    )


@query(
    "text_repetition_ratios",
    tags=("text-analysis", "quality", "llm-pipeline"),
    oracle=f"""
    WITH w AS (SELECT doc_id, {_DUCK_WORDS_VAR} AS w FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
          FROM w WHERE len(w) >= 2),
    cnt AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT)   AS n_2grams,
           CAST(MAX(c) AS BIGINT)   AS top_2gram_n,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_2grams,
           (MAX(c) * 5 > SUM(c))    AS repetitive
    FROM cnt GROUP BY doc_id
    """,
)
def text_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition screen: per-document 2-gram totals, the
    most-repeated 2-gram's count, distinct-2-gram count, and a
    cross-multiplied >20% top-2-gram-fraction flag (integer compare,
    no float ratio).  Raw (non-distinct) 2-grams on purpose —
    repetition is exactly what array_distinct would erase.  Explode ->
    (doc, gram) count -> per-doc aggregate; both aggregations combine
    map-side."""
    docs = load_table(spark, sf_dir, "documents")
    w = ws_tokens(F.col("text"))
    grams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i.cast("int")),
                F.element_at(w, (i + 1).cast("int")),
            ),
        ),
    )
    cnt = (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_2grams"),
        F.max("c").alias("top_2gram_n"),
        F.count(F.lit(1)).alias("n_distinct_2grams"),
        (F.max("c") * 5 > F.sum("c")).alias("repetitive"),
    )


_WINNOW_K = 3  # words per shingle
_WINNOW_W = 4  # hashes per winnowing window

# positional (non-distinct) k-word shingles, DuckDB side
_DUCK_POS_SHINGLES = (
    "CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w)-1), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) "
    "ELSE CAST([] AS VARCHAR[]) END"
)


def duck_winnow_sel_ctes(source: str = "documents") -> str:
    """Winnowing CTE chain ending in ``sel(doc_id, hs, poss)`` — the
    per-document positional shingle hashes and the distinct selected
    positions — over any (doc_id, text) source; shared by the
    fingerprint listing and the overlap-pair oracles."""
    return f"""
    w AS (SELECT doc_id, {DUCK_WORDS} AS w FROM {source}),
    shp AS (SELECT doc_id, {_DUCK_POS_SHINGLES} AS sh FROM w),
    hsx AS (SELECT doc_id,
                   list_transform(sh, s -> {DUCK_FOLD.format(s="s")}) AS hs
            FROM shp),
    sel AS (
      SELECT doc_id, hs,
        list_distinct(list_transform(
          range(0, greatest(len(hs) - {_WINNOW_W - 1}, 1)),
          i -> list_max(list_transform(
                 range(1, least({_WINNOW_W}, len(hs)) + 1),
                 j -> CASE WHEN hs[i+j] = list_aggregate(
                        list_slice(hs, i+1, i + least({_WINNOW_W}, len(hs))),
                        'min')
                      THEN i+j ELSE 0 END))
        )) AS poss
      FROM hsx WHERE len(hs) >= 1
    )"""


@query(
    "text_winnowing_fingerprints",
    headline=True,
    tags=("text-analysis", "fingerprint", "dedup", "llm-pipeline", "scale-path"),
    oracle=f"""
    WITH {duck_winnow_sel_ctes()}
    SELECT doc_id, CAST(pos AS INT) AS pos, hs[pos] AS fp
    FROM (SELECT doc_id, hs, unnest(poss) AS pos FROM sel)
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (the MOSS local-similarity sketch) per
    document: hash positional 3-word shingles, slide a 4-hash window,
    keep each window's rightmost minimum.  Guarantees any shared run
    of >= 6 words yields an identical selected fingerprint — the
    passage-level overlap primitive whole-document sketches miss.
    Selection is entirely row-local Column arithmetic: ZERO shuffles,
    no UDFs; see operators.text.winnow_fingerprints."""
    from parquet_to_sql_spark.operators.text import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(
        docs, "doc_id", "text", k=_WINNOW_K, w=_WINNOW_W
    )


# Redaction patterns: character classes + bounded quantifiers only, so
# the same pattern text is valid and identical in Java regex (Spark)
# and RE2 (DuckDB).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@query(
    "text_pii_redaction",
    tags=("text-analysis", "pii", "regex", "llm-pipeline"),
    oracle=f"""
    WITH contaminated AS (
      SELECT doc_id,
             'contact user' || CAST(doc_id AS VARCHAR)
               || '@mail.example.com or +1-555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               || ' ' || text AS raw
      FROM documents
    ), redacted AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
             CAST(len(regexp_extract_all(raw, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones,
             regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                            '{_PHONE_RE}', '[PHONE]', 'g') AS clean
      FROM contaminated
    )
    SELECT doc_id, n_emails, n_phones,
           CAST(len(clean) AS BIGINT) AS clean_len,
           substring(clean, 1, 40) AS clean_head
    FROM redacted
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing, the compliance pass every training corpus runs
    before anything else: redact emails and phone numbers with anchored
    regexes and count what was removed per document.  The fixtures'
    synthetic text carries no PII, so a deterministic contaminated
    column (id-derived e-mail + phone prepended to the text) is built
    first — both engines build and then redact the identical string,
    making the whole redact-and-count path value-exact rather than
    vacuously zero.

    Everything is map-side JVM regex (regexp_count / regexp_replace,
    no UDF), so at 100 TB this is a pure scan-transform with full
    pushdown of any upstream filters; patterns are restricted to the
    Java∩RE2 common subset so one pattern string serves both
    engines."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" "),
        F.col("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(raw, F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(raw, F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.length(clean).cast("bigint").alias("clean_len"),
        F.substring(clean, 1, 40).alias("clean_head"),
    )


@query(
    "text_vocab_coverage",
    tags=("text-analysis", "tokenizer", "llm-pipeline"),
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok
        ORDER BY n DESC, tok LIMIT 1000
      )
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN vocab.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_in_vocab,
           CAST(SUM(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           (10 * SUM(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END) > COUNT(*))
             AS oov_heavy
    FROM tok LEFT JOIN vocab USING (tok)
    GROUP BY doc_id
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage audit — the tokenizer-prep step before
    training: build the corpus top-1000 token vocabulary
    (deterministic rank: count DESC, token), then measure each
    document's in-vocab / out-of-vocab token counts and a
    cross-multiplied >10%-OOV flag.  All integers, value-exact.

    Scale shape: vocabulary build is one token-count shuffle
    (map-side combined, vocabulary-sized output) + TakeOrdered; the
    coverage pass joins the token stream against the BROADCAST
    1000-row vocab — no second wide shuffle, and the per-doc aggregate
    combines map-side."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("tok")
    )
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(1000)
        .select("tok", F.lit(1).alias("_iv"))
    )
    joined = tok.join(F.broadcast(vocab), "tok", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_iv").isNotNull(), 1).otherwise(0)).alias("n_in_vocab"),
        F.sum(F.when(F.col("_iv").isNull(), 1).otherwise(0)).alias("n_oov"),
        (
            F.lit(10) * F.sum(F.when(F.col("_iv").isNull(), 1).otherwise(0))
            > F.count(F.lit(1))
        ).alias("oov_heavy"),
    )


_KW_TERMS = ("spark", "join", "window")


def _duck_tf(term: str) -> str:
    return (
        "len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        f"x -> x = '{term}'))"
    )


@query(
    "text_keyword_search",
    tags=("text-analysis", "retrieval", "llm-pipeline"),
    oracle=f"""
    WITH tf AS (
      SELECT doc_id,
             CAST({_duck_tf("spark")} AS INT)  AS tf_spark,
             CAST({_duck_tf("join")} AS INT)   AS tf_join,
             CAST({_duck_tf("window")} AS INT) AS tf_window
      FROM documents
    )
    SELECT doc_id, tf_spark, tf_join, tf_window,
           tf_spark + tf_join + tf_window AS score
    FROM tf
    WHERE tf_spark > 0 AND tf_join > 0 AND tf_window > 0
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def text_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) keyword retrieval ranked by total term
    frequency — the full-scan scoring shape.  Per-term tf is a
    row-local higher-order filter over the staged token array (one
    tokenization per row, zero Python), so the whole query is a single
    scan + TakeOrderedAndProject: each partition keeps its local
    top-20, the driver merges k*partitions rows.  At 100 TB the same
    plan holds (no shuffle of the corpus); when the query workload is
    many queries rather than one, the inverted-index build
    (explode + groupBy term) amortizes instead — that shape is
    exercised by the posting-list machinery in operators.dedup."""
    from parquet_to_sql_spark.operators.text import keyword_hits

    docs = load_table(spark, sf_dir, "documents")
    hit = keyword_hits(docs, "doc_id", "text", _KW_TERMS)
    return hit.orderBy(F.desc("score"), "doc_id").limit(20)


def _duck_bm25_term(t: str) -> str:
    """One term's exact-integer BM25 contribution (see
    operators.text.bm25_rational_scores for the derivation)."""
    return (
        f"(1000000::HUGEINT * (2*n_docs - 2*df_{t} + 1) * 44 * tf_{t} * total_tokens)"
        f" // ((2*df_{t} + 1)::HUGEINT"
        f" * (20*tf_{t}*total_tokens + 6*total_tokens + 18*dl*n_docs))"
    )


@query(
    "text_bm25_rational",
    tags=("text-analysis", "retrieval", "bm25", "llm-pipeline"),
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ), base AS (
      SELECT doc_id, len(w) AS dl,
             len(list_filter(w, x -> x = 'spark'))  AS tf_spark,
             len(list_filter(w, x -> x = 'join'))   AS tf_join,
             len(list_filter(w, x -> x = 'window')) AS tf_window
      FROM ws
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens,
             SUM(CASE WHEN tf_spark  > 0 THEN 1 ELSE 0 END) AS df_spark,
             SUM(CASE WHEN tf_join   > 0 THEN 1 ELSE 0 END) AS df_join,
             SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
      FROM base
    )
    SELECT doc_id,
           CAST({_duck_bm25_term("spark")} + {_duck_bm25_term("join")}
                + {_duck_bm25_term("window")} AS BIGINT) AS score_ppm
    FROM base CROSS JOIN stats
    WHERE tf_spark > 0 OR tf_join > 0 OR tf_window > 0
    ORDER BY score_ppm DESC, doc_id
    LIMIT 20
    """,
)
def text_bm25_rational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive (OR) BM25 ranked retrieval, value-exact in both
    engines: k1 = 6/5, b = 3/4, and the RSJ idf with the (monotone)
    log dropped make every term contribution one exact integer
    division — no ln(), no floats, no almost-equal comparisons (the
    cross-engine-exact BM25 formulation queued in round 3).

    Plan: one corpus scan aggregates (N, L, df_t) into a single
    broadcast row; a second scan scores row-locally and keeps the
    global top-20 via TakeOrderedAndProject (each partition retains
    its local top-k, the driver merges k * #partitions rows).  No
    corpus shuffle at any scale; see operators.text.bm25_* for the
    arithmetic derivation and DECIMAL(38,0) width argument."""
    from parquet_to_sql_spark.operators.text import (
        bm25_corpus_stats,
        bm25_doc_features,
        bm25_rational_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = bm25_doc_features(docs, "doc_id", "text", _KW_TERMS)
    stats = bm25_corpus_stats(feats, _KW_TERMS)
    scored = bm25_rational_scores(feats, _KW_TERMS, stats)
    return (
        scored.select("doc_id", "score_ppm")
        .orderBy(F.desc("score_ppm"), "doc_id")
        .limit(20)
    )


@query(
    "text_bpe_pair_merges",
    tags=("text-analysis", "tokenizer", "llm-pipeline"),
    oracle="""
    WITH w AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
      FROM documents
    ), v AS (
      SELECT word, COUNT(*) AS wc
      FROM w WHERE regexp_matches(word, '^[a-z]+$')
      GROUP BY word
    ), p AS (
      SELECT substr(v.word, CAST(t.i AS INT), 2) AS pair, v.wc
      FROM v, LATERAL (SELECT unnest(range(1, length(v.word))) AS i) t
    )
    SELECT pair, CAST(SUM(wc) AS BIGINT) AS merge_count
    FROM p GROUP BY pair
    ORDER BY merge_count DESC, pair
    LIMIT 20
    """,
)
def text_bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training iteration: count adjacent symbol pairs and
    rank merge candidates — the inner loop of distributed tokenizer
    training.  The scale trick is corpus->vocab compression FIRST
    (groupBy word, count): pair expansion then runs over the distinct
    vocabulary weighted by word counts, so a 100 TB corpus with a
    10M-type vocabulary does its per-character work on 10M rows, not
    10^12.  Both aggregations get map-side partial combine; the final
    top-20 is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("word")
    ).filter(F.col("word").rlike("^[a-z]+$"))
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    pairs = vocab.select(
        F.explode(
            F.expr(
                "CASE WHEN length(word) >= 2 "
                "THEN transform(sequence(1, length(word)-1), i -> substr(word, i, 2)) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("merge_count"))
        .orderBy(F.desc("merge_count"), "pair")
        .limit(20)
    )


@query(
    "text_rarity_score",
    tags=("text-analysis", "quality", "llm-pipeline"),
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), dfreq AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY tok
    ), j AS (
      SELECT t.doc_id, d.df FROM tok t JOIN dfreq d USING (tok)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST((1000000::HUGEINT * SUM(df)) // COUNT(*) AS BIGINT) AS mean_df_ppm
    FROM j GROUP BY doc_id
    """,
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-rarity quality signal: mean corpus document-frequency of
    a document's tokens (low = rare-token-heavy, often gibberish or
    highly specialized; high = boilerplate).  The float-free surprisal
    proxy for LM-quality filtering: mean df is carried as an exact
    ppm-scaled integer division, so no log-probabilities and no float
    discipline.  Scale shape: the df table is vocabulary-sized, built
    with an exact distinct aggregation, then broadcast back onto the
    token stream — the corpus-sized relation shuffles once (by doc for
    the final rollup), never by token."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("tok")
    )
    dfreq = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    j = tok.join(F.broadcast(dfreq), "tok")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * sum(df)) div count(1) AS BIGINT)"
        ).alias("mean_df_ppm"),
    )


@query(
    "dedup_segment_blocks",
    headline=True,
    tags=("dedup", "text-analysis", "llm-pipeline", "scale-path"),
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
      FROM documents
    ), segs AS (
      SELECT doc_id,
             {DUCK_FOLD.format(s="array_to_string(ws[(i*10+1):(i*10+10)], ' ')")} AS seg_hash
      FROM w, LATERAL (
        SELECT unnest(range(0, CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS i
      ) t
    ), occ AS (
      SELECT doc_id, seg_hash,
             COUNT(*) OVER (PARTITION BY seg_hash) AS n_occ
      FROM segs
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs,
           CAST(SUM(CASE WHEN n_occ >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs,
           (2 * SUM(CASE WHEN n_occ >= 3 THEN 1 ELSE 0 END) >= COUNT(*)) AS drop_heavy
    FROM occ GROUP BY doc_id
    """,
)
def dedup_segment_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicated-span removal, adapted to block granularity:
    split each document into non-overlapping 10-word segments, count
    corpus-wide occurrences of each segment hash, and flag documents
    where boilerplate segments (appearing >= 3 times corpus-wide)
    dominate.  Versus shingle/winnowing near-dup this is the EXACT
    span-dedup pass production corpus cleaning runs first: segments
    are non-overlapping so the exploded relation is ~n_words/10 rows
    (not n_words like shingles), the occurrence count is a window over
    one hash-partitioned shuffle (no join), and the doc rollup reuses
    the segment rows.  Word-hash composition (one fold per word) keeps
    map CPU linear in characters."""
    from parquet_to_sql_spark.functions.hashing import char_fold_hash

    docs = load_table(spark, sf_dir, "documents")
    # r14: the per-segment fold hash is the query's heaviest compute
    # and ran at the fixture scan's single-row-group width (0.48 s in
    # ONE task) — conditional rebalance, same rationale and A/B
    # discipline as text_bpe_encode (no-op on a wide 100 TB scan;
    # all downstream aggregates order-independent).
    from parquet_to_sql_spark.operators.text import rebalance_for_compute

    w = rebalance_for_compute(docs.select("doc_id", "text")).select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("ws")
    )
    segs = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, CAST(ceil(size(ws) / 10.0) AS INT) - 1), "
                "i -> array_join(slice(ws, i*10 + 1, 10), ' '))"
            )
        ).alias("seg"),
    ).select("doc_id", char_fold_hash(F.col("seg")).alias("seg_hash"))
    from pyspark.sql import Window

    occ = segs.withColumn(
        "n_occ", F.count(F.lit(1)).over(Window.partitionBy("seg_hash"))
    )
    dup = F.sum(F.when(F.col("n_occ") >= 3, 1).otherwise(0))
    return occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        dup.alias("n_dup_segs"),
        (F.lit(2) * dup >= F.count(F.lit(1))).alias("drop_heavy"),
    )


@query(
    "text_cooccurrence_pmi",
    tags=("text-analysis", "llm-pipeline"),
    oracle="""
    WITH dw AS (
      SELECT doc_id, unnest(list_distinct(list_filter(
               string_split_regex(trim(lower(text)), '\\s+'),
               x -> regexp_matches(x, '^[a-z]+$')))) AS w
      FROM documents
    ), cx AS (
      SELECT w, COUNT(*) AS c FROM dw GROUP BY w
    ), p AS (
      SELECT a.doc_id, a.w AS wa, b.w AS wb
      FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
    ), cxy AS (
      SELECT wa, wb, COUNT(*) AS cab FROM p GROUP BY wa, wb
    ), n AS (SELECT COUNT(*) AS nd FROM documents)
    SELECT wa, wb, CAST(cab AS BIGINT) AS n_both,
           CAST(ca.c AS BIGINT) AS n_a, CAST(cb.c AS BIGINT) AS n_b,
           CAST((1000000::HUGEINT * (SELECT nd FROM n) * cab) // (ca.c * cb.c) AS BIGINT)
             AS pmi_ppm
    FROM cxy JOIN cx ca ON ca.w = wa JOIN cx cb ON cb.w = wb
    WHERE cab >= 5
    ORDER BY pmi_ppm DESC, wa, wb
    LIMIT 30
    """,
)
def text_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level word co-occurrence with a pointwise-mutual-
    information ranking — the collocation-mining signal behind phrase
    detection — kept float-free by scoring PMI's monotone core
    N*c_xy/(c_x*c_y) as an exact ppm integer division (log is monotone,
    so the ranking is identical).  Scale shape: pair expansion is
    ROW-LOCAL over each doc's sorted distinct-word array (no self-join
    of the token relation), the pair relation aggregates with map-side
    combine, and the two unigram lookups broadcast the vocabulary-
    sized count table."""
    docs = load_table(spark, sf_dir, "documents")
    dw = docs.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(
                F.filter(
                    ws_tokens(F.lower(F.col("text"))),
                    lambda x: x.rlike("^[a-z]+$"),
                )
            )
        ).alias("aw"),
    )
    pairs = dw.select(
        F.explode(
            F.expr(
                "flatten(transform(aw, (x, i) -> "
                "transform(slice(aw, i + 2, size(aw)), y -> struct(x AS wa, y AS wb))))"
            )
        ).alias("p")
    ).select(F.col("p.wa").alias("wa"), F.col("p.wb").alias("wb"))
    cxy = pairs.groupBy("wa", "wb").agg(F.count(F.lit(1)).alias("cab"))
    cx = (
        dw.select(F.explode("aw").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    scored = (
        cxy.filter(F.col("cab") >= 5)
        .join(F.broadcast(cx.select(F.col("w").alias("wa"), F.col("c").alias("n_a"))), "wa")
        .join(F.broadcast(cx.select(F.col("w").alias("wb"), F.col("c").alias("n_b"))), "wb")
        .crossJoin(F.broadcast(nd))
        .select(
            "wa",
            "wb",
            F.col("cab").cast("long").alias("n_both"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * nd * cab) "
                "div (n_a * n_b) AS BIGINT)"
            ).alias("pmi_ppm"),
        )
    )
    return scored.orderBy(F.desc("pmi_ppm"), "wa", "wb").limit(30)


@query(
    "text_source_divergence_l1",
    tags=("text-analysis", "drift", "llm-pipeline"),
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), sc AS (
      SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok
    ), tot AS (
      SELECT tok, SUM(c) AS ct FROM sc GROUP BY tok
    ), ns AS (
      SELECT source, SUM(c) AS n_s FROM sc GROUP BY source
    ), nt AS (SELECT SUM(ct) AS n_t FROM tot),
    grid AS (
      SELECT ns.source, tot.tok, tot.ct, ns.n_s FROM ns CROSS JOIN tot
    ), j AS (
      SELECT g.source, g.n_s, g.ct, COALESCE(sc.c, 0) AS c
      FROM grid g LEFT JOIN sc ON sc.source = g.source AND sc.tok = g.tok
    )
    SELECT source,
           CAST(MIN(n_s) AS BIGINT) AS n_tokens,
           CAST(SUM(abs(c * (SELECT n_t FROM nt) - ct * n_s)) AS BIGINT) AS l1_num,
           CAST((1000000::HUGEINT * SUM(abs(c * (SELECT n_t FROM nt) - ct * n_s)))
                // (MIN(n_s)::HUGEINT * (SELECT n_t FROM nt)) AS BIGINT) AS l1_ppm
    FROM j GROUP BY source
    """,
)
def text_source_divergence_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit: exact L1 distance between each
    source's unigram distribution and the corpus distribution,
    cross-multiplied to a common integer denominator (|c_s*N - c*N_s|
    summed, then ppm-scaled by one integer division) — the float-free
    domain-shift detector that decides which sources need reweighting
    before training.  Scale shape: token counting is two map-side-
    combined aggregations; the comparison grid is vocabulary x
    sources — bounded by VOCABULARY (with the heavy-hitter pass as
    the production preconditioner for open vocabularies), never by
    corpus volume; the per-source totals broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(ws_tokens(F.lower(F.col("text")))).alias("tok")
    )
    sc_ = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    tot = sc_.groupBy("tok").agg(F.sum("c").alias("ct"))
    ns = sc_.groupBy("source").agg(F.sum("c").alias("n_s"))
    nt = tot.agg(F.sum("ct").alias("n_t"))
    grid = ns.crossJoin(F.broadcast(tot))
    j = grid.join(sc_, ["source", "tok"], "left").select(
        "source", "n_s", "ct", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    ).crossJoin(F.broadcast(nt))
    dev = F.abs(F.col("c") * F.col("n_t") - F.col("ct") * F.col("n_s"))
    return j.groupBy("source").agg(
        F.min("n_s").cast("long").alias("n_tokens"),
        F.sum(dev).cast("long").alias("l1_num"),
        # ppm numerator/denominator widened to DECIMAL(38,0): the 1e6
        # multiplier is the early int64 overflow (n_s*n_t beyond ~4.6e12
        # token-products); the final ppm itself is tiny
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * sum(abs(c * n_t - ct * n_s))) "
            "div (CAST(min(n_s) AS DECIMAL(38,0)) * min(n_t)) AS BIGINT)"
        ).alias("l1_ppm"),
    )


@query(
    "text_lang_confusion",
    tags=("text-analysis", "evaluation", "llm-pipeline"),
    oracle=f"""
    SELECT lang AS lang_true,
           {_duck_lang_case()} AS lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang_true, lang_pred
    """,
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation-as-a-query: the confusion matrix of the
    heuristic language identifier against the stored labels — the
    audit that decides whether a cheap row-local classifier is good
    enough to gate a corpus split.  One aggregation over row-local
    predictions: the matrix is (labels x labels)-bounded however
    large the corpus."""
    from parquet_to_sql_spark.operators.text import lang_id

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("lang_true"),
            lang_id(F.col("text")).alias("lang_pred"),
        )
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _duck_novelty_sh() -> str:
    """Hashed-shingle (doc, shingle) relation, DuckDB side — same
    composition as queries.dedup.duck_hashed_sh (which lives
    downstream of this module and cannot be imported here)."""
    from parquet_to_sql_spark.functions.hashing import (
        DUCK_WORD_HASHES,
        duck_hashed_word_shingles,
    )

    hw = DUCK_WORD_HASHES.format(words=DUCK_WORDS)
    return (
        f"SELECT doc_id AS doc, "
        f"unnest(list_distinct({duck_hashed_word_shingles(3)})) AS shingle "
        f"FROM (SELECT doc_id, {hw} AS hw FROM documents)"
    )


@query(
    "text_ngram_novelty",
    tags=("text-analysis", "dedup", "llm-pipeline", "scale-path"),
    oracle=f"""
    WITH sh0 AS ({_duck_novelty_sh()}),
    tot AS (SELECT doc, COUNT(*) AS n_sh FROM sh0 GROUP BY doc),
    firsts AS (SELECT shingle, MIN(doc) AS first_doc FROM sh0 GROUP BY shingle),
    novel AS (SELECT first_doc AS doc, COUNT(*) AS n_novel
              FROM firsts GROUP BY first_doc)
    SELECT t.doc AS doc_id,
           CAST(t.n_sh AS BIGINT) AS n_shingles,
           CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
           CAST((1000000::HUGEINT * COALESCE(n.n_novel, 0)) // t.n_sh AS BIGINT)
             AS novelty_ppm
    FROM tot t LEFT JOIN novel n USING (doc)
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order n-gram novelty: for each document, the fraction
    (exact ppm) of its distinct hashed 3-gram shingles that no
    earlier document (smaller doc_id) contains.  The redundancy-growth
    curve data curators watch: novelty collapsing toward 0 as a crawl
    grows means new data is re-crawling old content.  Scale shape:
    "first seen" is min(doc_id) per shingle — ONE keyed aggregation
    over the inverted index (map-side partial min), novel counts roll
    up by that min doc, and the join back to per-doc totals is
    doc-keyed; no window over corpus order, no pairwise work, nothing
    driver-side.  Documents shorter than 3 words have no shingles and
    are absent, like the rest of the shingle family.  The per-doc
    totals branch re-derives the shingle arrays rather than caching
    them (2 scans in the plan): materializing a corpus-sized exploded
    relation for exactly two consumers measured ~2x worse than the
    recompute in this engine (see the capped-postings A/B in
    ROUND_NOTES R2-28) and is a storage-memory tax at cluster scale."""
    from parquet_to_sql_spark.operators.dedup import hashed_shingle_arrays

    docs = load_table(spark, sf_dir, "documents")
    sh0 = hashed_shingle_arrays(docs, "doc_id", "text", 3)
    per_doc = sh0.select("doc", F.size("shs").alias("n_shingles")).where(
        F.col("n_shingles") > 0
    )
    sh = sh0.select("doc", F.explode("shs").alias("shingle"))
    firsts = sh.groupBy("shingle").agg(F.min("doc").alias("first_doc"))
    novel = firsts.groupBy("first_doc").agg(F.count(F.lit(1)).alias("n_novel"))
    return (
        per_doc.join(novel, per_doc.doc == novel.first_doc, "left")
        .select(
            F.col("doc").alias("doc_id"),
            F.col("n_shingles").cast("bigint").alias("n_shingles"),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint").alias("n_novel"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * coalesce(n_novel, 0))"
                " div n_shingles AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )


# model constants live with the shared operator (operators.text)
from parquet_to_sql_spark.operators.text import (  # noqa: E402
    CLS_BUCKETS as _CLS_BUCKETS,
    CLS_MIX as _CLS_MIX,
    CLS_WMOD as _CLS_WMOD,
    CLS_WSHIFT as _CLS_WSHIFT,
)


@query(
    "text_hash_feature_classify",
    tags=("text-analysis", "quality-filter", "llm-pipeline", "scale-path"),
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({DUCK_WORDS}) AS tok FROM documents
    ), b AS (
      SELECT doc_id,
             ({DUCK_FOLD.format(s="tok")}) % {_CLS_BUCKETS} AS bkt
      FROM tok
    ), wt AS (
      SELECT CAST(x AS BIGINT) AS bkt,
             ((x + 1) * {_CLS_MIX}) % {_CLS_WMOD} - {_CLS_WSHIFT} AS w
      FROM range({_CLS_BUCKETS}) t(x)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(w) AS BIGINT) AS score,
           (SUM(w) >= 0) AS keep
    FROM b JOIN wt USING (bkt)
    GROUP BY doc_id
    """,
)
def text_hash_feature_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear text classifier over hashing-trick features — the
    fastText-shaped quality/domain filter every corpus pipeline runs
    before training: token -> feature bucket (fold hash mod 256),
    bucket -> LEARNED weight looked up from a model relation, document
    score = sum of its token weights, keep = score >= 0.  The weights
    here are a deterministic integer surrogate model (Knuth
    multiplicative mix) so the oracle can rebuild them exactly; a real
    model swaps in a weights DataFrame of the same (bucket, w) shape.
    Scale shape: the model is vocabulary-bucket-sized (256 rows) and
    rides a BROADCAST hash join onto the token stream — the corpus
    never shuffles by token; the only corpus-sized exchange is the
    doc-keyed rollup, with map-side partial sums.  All-integer scores,
    no float discipline."""
    from parquet_to_sql_spark.operators.text import (
        hash_feature_scores,
        hash_feature_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    return hash_feature_scores(
        docs, "doc_id", "text", hash_feature_weights(spark)
    )


_BPE_TOP = 5


def _duck_bpe_encode_oracle() -> str:
    """Symbol sequences are encoded as chr(31)-wrapped strings
    ('<us>sym<us><us>sym<us>'), so a merge is ONE plain string replace
    whose search pattern is boundary-anchored on both sides — merged
    symbols stay atomic (no later merge can match inside one), and
    leftmost non-overlapping replace() equals the greedy left-to-right
    BPE scan in both engines."""
    seq = "chr(31) || array_to_string(string_split(word, ''), chr(31) || chr(31)) || chr(31)"
    for i in range(1, _BPE_TOP + 1):
        seq = (
            f"replace({seq}, "
            f"chr(31) || substr(ms[{i}], 1, 1) || chr(31) || chr(31) || substr(ms[{i}], 2, 1) || chr(31), "
            f"chr(31) || ms[{i}] || chr(31))"
        )
    return f"""
    WITH w AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
      FROM documents
    ), aw AS (
      SELECT doc_id, word FROM w WHERE regexp_matches(word, '^[a-z]+$')
    ), v AS (
      SELECT word, COUNT(*) AS wc FROM aw GROUP BY word
    ), p AS (
      SELECT substr(v.word, CAST(t.i AS INT), 2) AS pair, v.wc
      FROM v, LATERAL (SELECT unnest(range(1, length(v.word))) AS i) t
    ), top AS (
      SELECT pair, SUM(wc) AS mc FROM p GROUP BY pair
      ORDER BY mc DESC, pair LIMIT {_BPE_TOP}
    ), m AS (
      SELECT list(pair ORDER BY mc DESC, pair ASC) AS ms FROM top
    ), enc AS (
      SELECT doc_id,
             length(word) AS n_before,
             (length({seq}) - length(replace({seq}, chr(31), ''))) // 2 AS n_after
      FROM aw, m
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_before) AS BIGINT) AS n_sym_before,
           CAST(SUM(n_after) AS BIGINT) AS n_sym_after,
           CAST((1000000::HUGEINT * (SUM(n_before) - SUM(n_after)))
                // SUM(n_before) AS BIGINT) AS saved_ppm
    FROM enc GROUP BY doc_id
    """


@query(
    "text_bpe_encode",
    headline=True,
    tags=("text-analysis", "tokenizer", "llm-pipeline", "scale-path"),
    oracle=_duck_bpe_encode_oracle(),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other half of tokenizer training: APPLY the learned merges.
    Learns the top-5 BPE character-pair merges from the corpus (the
    text_bpe_pair_merges ranking), then greedily encodes every word
    and reports per-document symbol counts before/after and the exact
    ppm compression — the metric that says whether a tokenizer fits a
    corpus.  Merge application is pure string arithmetic: the symbol
    sequence rides a chr(31)-delimited encoding ('<us>a<us><us>b<us>')
    where one boundary-anchored replace() per merge equals the greedy
    left-to-right BPE scan (merged symbols are atomic because their
    interior has no double-separator), so the whole encode stage is
    row-local whole-stage codegen — no UDF, no shuffle.  Scale shape:
    merge learning compresses corpus -> vocabulary before any
    per-character work (same as text_bpe_pair_merges), the 5-merge
    table is ONE broadcast row (sanctioned 1-row attach), and the
    application pass shuffles only the doc-keyed rollup."""
    docs = load_table(spark, sf_dir, "documents")
    # Optimization r14 (guide §2.3): the encode branch applies the
    # 5-replace merge chain + symbol count to EVERY corpus word in the
    # stage that inherits the scan's parallelism — a single row group
    # at fixture scale, so the whole 0.9 s encode ran in ONE task.
    # One conditional round-robin shuffle of the narrow (doc_id, text)
    # input spreads it (skipped when the scan is already wide, so a
    # 100 TB scan pays nothing); results are identical — every
    # downstream aggregate is an order-independent count/sum.
    from parquet_to_sql_spark.operators.text import rebalance_for_compute

    aw = rebalance_for_compute(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("word")
    ).filter(F.col("word").rlike("^[a-z]+$"))
    vocab = aw.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    pairs = vocab.select(
        F.explode(
            F.expr(
                "CASE WHEN length(word) >= 2 "
                "THEN transform(sequence(1, length(word)-1), i -> substr(word, i, 2)) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("pair"),
        "wc",
    )
    top = (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("mc"))
        .orderBy(F.desc("mc"), "pair")
        .limit(_BPE_TOP)
    )
    # one ordered row: array_sort over struct(-mc, pair) = (mc DESC, pair ASC)
    merges = top.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct((-F.col("mc")).alias("nmc"), "pair"))),
            lambda s: s["pair"],
        ).alias("ms")
    )
    from parquet_to_sql_spark.operators.text import (
        bpe_merge_sequence,
        bpe_symbol_count,
    )

    # the merge chain is staged as a real column so codegen evaluates
    # the nested replaces ONCE per word (length + separator-strip both
    # consume it — unstaged, the chain would run twice per row)
    enc = (
        aw.crossJoin(F.broadcast(merges))
        .select(
            "doc_id",
            F.length("word").cast("long").alias("n_before"),
            bpe_merge_sequence(F.col("word"), F.col("ms"), _BPE_TOP).alias("_seq"),
        )
        .select(
            "doc_id",
            "n_before",
            bpe_symbol_count(F.col("_seq")).alias("n_after"),
        )
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("n_before").cast("bigint").alias("n_sym_before"),
        F.sum("n_after").cast("bigint").alias("n_sym_after"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * (sum(n_before) - sum(n_after)))"
            " div sum(n_before) AS BIGINT)"
        ).alias("saved_ppm"),
    )


_BPE_TRAIN_ITERS = 6


def _duck_bpe_train_ctes(n: int) -> str:
    """Shared oracle CTE chain for iterative BPE training: v0 is the
    chr(31)-encoded weighted vocabulary; each round i extracts adjacent
    symbol pairs from v{i-1} (p{i}), takes the deterministic argmax
    (t{i}: count DESC, left, right), and applies it (v{i}).  Mirrors
    operators.text.bpe_train_merges round for round."""
    us = "chr(31)"
    ctes = [
        f"""v0 AS (
      SELECT word, wc,
             {us} || array_to_string(string_split(word, ''), {us} || {us}) || {us} AS seq
      FROM (
        SELECT word, COUNT(*) AS wc
        FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
              FROM documents)
        WHERE regexp_matches(word, '^[a-z]+$')
        GROUP BY word))"""
    ]
    for i in range(1, n + 1):
        ctes.append(
            f"""p{i} AS (
      SELECT s.sym[t.j] AS l, s.sym[t.j + 1] AS r, s.wc
      FROM (SELECT wc, string_split(substr(seq, 2, length(seq) - 2), {us} || {us}) AS sym
            FROM v{i - 1}) s,
           LATERAL (SELECT unnest(range(1, len(s.sym))) AS j) t)"""
        )
        ctes.append(
            f"""t{i} AS (
      SELECT l, r, SUM(wc) AS mc FROM p{i} GROUP BY l, r
      ORDER BY mc DESC, l, r LIMIT 1)"""
        )
        ctes.append(
            f"""v{i} AS (
      SELECT v.word, v.wc,
             replace(v.seq, {us} || t.l || {us} || {us} || t.r || {us},
                     {us} || t.l || t.r || {us}) AS seq
      FROM v{i - 1} v, t{i} t)"""
        )
    return ",\n    ".join(ctes)


def _duck_bpe_train_oracle() -> str:
    steps = "\n      UNION ALL ".join(
        f"SELECT {i} AS step, l AS left_sym, r AS right_sym, "
        f"CAST(mc AS BIGINT) AS merge_count FROM t{i}"
        for i in range(1, _BPE_TRAIN_ITERS + 1)
    )
    return f"""
    WITH {_duck_bpe_train_ctes(_BPE_TRAIN_ITERS)}
    SELECT * FROM ({steps}) ORDER BY step
    """


@query(
    "text_bpe_train_merges",
    tags=("text-analysis", "tokenizer", "llm-pipeline", "scale-path"),
    oracle=_duck_bpe_train_oracle(),
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE multi-round BPE training: 6 iterations of "count adjacent
    symbol pairs, fuse the most frequent" over the weighted vocabulary
    — where rounds 2+ pair MERGED multi-char symbols, the capability
    the single-round text_bpe_pair_merges ranking demonstrates only
    the first step of.  Output is the learned merge table
    (step, left_sym, right_sym, merge_count) in training order,
    deterministic cross-engine via (count DESC, left, right)
    tie-breaks; the DuckDB oracle unrolls the identical 6 rounds as a
    CTE chain.  Scale shape (operators/text.py:bpe_train_merges):
    corpus->vocab compression first, then per round one vocab-sized
    pair explode + map-side-combined groupBy + TakeOrdered(1) + a
    ONE-ROW argmax collect applied as a literal replace — no joins,
    lineage kept flat by per-round localCheckpoint (the k-means
    iterative-training precedent)."""
    from parquet_to_sql_spark.operators.text import bpe_train_merges, ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    merges, _ = bpe_train_merges(vocab, _BPE_TRAIN_ITERS)
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, merge_count bigint"
    ).orderBy("step")


def _duck_bpe_encode_deep_oracle() -> str:
    n = _BPE_TRAIN_ITERS
    return f"""
    WITH {_duck_bpe_train_ctes(n)},
    encv AS (
      SELECT word,
             length(word) AS n_before,
             (length(seq) - length(replace(seq, chr(31), ''))) // 2 AS n_after
      FROM v{n}
    ), aw AS (
      SELECT source, word
      FROM (SELECT source,
                   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
            FROM documents)
      WHERE regexp_matches(word, '^[a-z]+$')
    ), j AS (
      SELECT a.source, e.n_before, e.n_after FROM aw a JOIN encv e USING (word)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_before) AS BIGINT) AS n_sym_before,
           CAST(SUM(n_after) AS BIGINT) AS n_sym_after,
           CAST((1000000::HUGEINT * (SUM(n_before) - SUM(n_after)))
                // SUM(n_before) AS BIGINT) AS saved_ppm
    FROM j GROUP BY source
    """


@query(
    "text_bpe_encode_deep",
    tags=("text-analysis", "tokenizer", "llm-pipeline", "scale-path"),
    oracle=_duck_bpe_encode_deep_oracle(),
)
def text_bpe_encode_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply with a GENERAL merge table: learns 6 merges by
    true iterative training (multi-symbol pairs included), then
    encodes the vocabulary with bpe_apply_merge_table — the
    parameterized-depth application operator, fed the trained table as
    literal arrays — and rolls per-source compression up through a
    word-keyed join.  Completes the tokenizer story end to end: train
    (this query's first half), apply-to-anything (the operator under
    test; depth bounded at BPE_MAX_MERGES with a documented cost
    model), measure (saved_ppm per source).  Scale shape: training and
    application both run on the VOCABULARY; the only corpus-sized
    exchanges are the word explode and the vocab join + source rollup.
    The oracle re-derives the identical table via the unrolled CTE
    chain and encodes with the same replace algebra."""
    from parquet_to_sql_spark.operators.text import (
        bpe_apply_merge_table,
        bpe_symbol_count,
        bpe_train_merges,
        bpe_word_to_sequence,
        ws_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    aw = docs.select(
        "source", F.explode(ws_tokens(F.lower(F.col("text")))).alias("word")
    ).filter(F.col("word").rlike("^[a-z]+$"))
    vocab = aw.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    merges, _ = bpe_train_merges(vocab, _BPE_TRAIN_ITERS)
    lefts = F.array(*[F.lit(l) for _, l, _r, _ in merges])
    rights = F.array(*[F.lit(r) for _, _l, r, _ in merges])
    stats = vocab.select(
        "word",
        F.length("word").cast("long").alias("n_before"),
        bpe_apply_merge_table(
            bpe_word_to_sequence(F.col("word")), lefts, rights, len(merges)
        ).alias("_seq"),
    ).select(
        "word", "n_before", bpe_symbol_count(F.col("_seq")).alias("n_after")
    )
    return aw.join(stats, "word").groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("n_before").cast("bigint").alias("n_sym_before"),
        F.sum("n_after").cast("bigint").alias("n_sym_after"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * (sum(n_before) - sum(n_after)))"
            " div sum(n_before) AS BIGINT)"
        ).alias("saved_ppm"),
    )


def _duck_zipf_sh() -> str:
    """Positional (non-distinct) hashed 3-gram stream, DuckDB side —
    same 31-ary word-hash composition as the dedup family, WITHOUT the
    per-doc distinct (Zipf counts occurrences, not containment)."""
    from parquet_to_sql_spark.functions.hashing import (
        DUCK_WORD_HASHES,
        duck_hashed_kgram_acc,
    )

    hw = DUCK_WORD_HASHES.format(words=DUCK_WORDS)
    return (
        f"SELECT {duck_hashed_kgram_acc(3)} AS shingle "
        f"FROM (SELECT {hw} AS hw FROM documents) t, "
        f"LATERAL (SELECT unnest(range(1, greatest(len(hw) - 1, 1))) AS i) u"
    )


@query(
    "text_zipf_histogram",
    tags=("text-analysis", "corpus-stats", "llm-pipeline"),
    oracle=f"""
    WITH sh AS ({_duck_zipf_sh()}),
    v AS (
      SELECT shingle, COUNT(*) AS freq FROM sh GROUP BY shingle
    ), b AS (
      SELECT length(bin(freq)) - 1 AS bucket, COUNT(*) AS n_types,
             SUM(freq) AS occ
      FROM v GROUP BY 1
    )
    SELECT CAST(bucket AS BIGINT) AS log2_freq,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(occ AS BIGINT) AS total_occurrences,
           CAST((1000000::HUGEINT * occ) // SUM(occ) OVER () AS BIGINT)
             AS occ_ppm
    FROM b
    """,
)
def text_zipf_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf curve audit as a log-log histogram over 3-gram types: how
    many distinct shingles fall in each power-of-two frequency band
    and what share of all occurrences that band carries — the
    corpus-shape diagnostic (natural language draws the straight Zipf
    line; boilerplate-heavy crawls bulge in the high buckets).
    Shingle granularity rather than unigrams because the type/token
    curve is where redundancy shows (and the fixtures' synthetic word
    vocabulary is a few dozen types — unigram buckets are degenerate).
    The trick is that the log-log view never needs a frequency RANK:
    bucketing by the frequency's most significant bit (engine-neutral
    length(bin(x)) - 1) turns the global-sort formulation into one
    more keyed aggregation, so the plan is explode -> type count ->
    <=64-row histogram; the normalizing window runs over that bounded
    histogram, never the corpus."""
    from parquet_to_sql_spark.functions.hashing import (
        shingle_hashes_from,
        word_hashes,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select(word_hashes(ws_tokens(F.col("text"))).alias("_hw"))
        .select(F.explode(shingle_hashes_from(F.col("_hw"), 3)).alias("shingle"))
    )
    v = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq"))
    b = v.groupBy(
        (F.length(F.bin(F.col("freq"))) - 1).cast("bigint").alias("log2_freq")
    ).agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("freq").alias("occ"),
    )
    return b.select(
        "log2_freq",
        F.col("n_types").cast("bigint").alias("n_types"),
        F.col("occ").cast("bigint").alias("total_occurrences"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * occ)"
            " div (SUM(occ) OVER ()) AS BIGINT)"
        ).alias("occ_ppm"),
    )


@query(
    "text_bigram_lm_scores",
    headline=True,
    tags=("text-analysis", "llm-pipeline", "quality-filter", "scale-path"),
    oracle=f"""
    WITH staged AS (
      SELECT doc_id, {DUCK_WORDS} AS w FROM documents
    ), big AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM staged, LATERAL unnest(range(1, len(w))) AS u(i)
    ), pairs AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
      FROM big GROUP BY w1, w2
    ), uni AS (
      SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM pairs GROUP BY w1
    ), model AS (
      SELECT w1, w2, CAST((1000000::HUGEINT * c2) // c1 AS BIGINT) AS ppm
      FROM pairs JOIN uni USING (w1)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(ppm)::HUGEINT // COUNT(*) AS BIGINT) AS mean_cond_ppm,
           CAST(MIN(ppm) AS BIGINT) AS min_cond_ppm
    FROM big JOIN model USING (w1, w2)
    GROUP BY doc_id
    """,
)
def text_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained word-BIGRAM language-model scoring — the
    all-integer stand-in for perplexity filtering (the classic
    quality screen: documents whose word transitions are improbable
    under the corpus's own statistics are boilerplate, spam, or
    garbled extraction).  The 'model' is the maximum-likelihood
    conditional p(w2|w1) in exact ppm integers
    (1,000,000 * c(w1,w2) div c(w1)); each document scores its mean
    and minimum transition probability over its own bigrams — low
    mean = globally unusual text, low min = at least one
    never-otherwise-seen transition.  Everything is integer
    arithmetic on counts, so the DuckDB oracle is value-exact; logs
    and floats never appear.

    Scale shape: the bigram relation is exploded once per consuming
    pass; pair counts exit via a MAP-SIDE-COMBINED aggregate (the
    exchange is pair-vocabulary-sized, not token-count-sized), the
    unigram table derives from the pair table (pair-cardinality
    input, NOT a second corpus pass), and the only corpus-scale
    exchange is the final score join, hash-partitioned on the pair
    key.  The model relation is vocabulary-squared-bounded —
    shuffle-joined, never broadcast (real vocabularies outgrow any
    broadcast threshold)."""
    docs = load_table(spark, sf_dir, "documents")
    # (r14 note — measured and REJECTED: rebalancing the narrow
    # corpus input before the bigram explode, the fix that won on
    # text_bpe_encode/dedup_segment_blocks, made THIS row 19% SLOWER
    # (interleaved A/B, plans/r14/AB_rebalance_rows.json): the
    # vocabulary-sized pair groupBy then runs its map-side combine on
    # 32 partitions instead of 1, emitting up to 32 partials per key —
    # the inflated combine exchange costs more than the serialized
    # explode saved.  Don't retry on map-side-combined high-
    # cardinality aggregates.)
    toks = docs.select("doc_id", ws_tokens(F.col("text")).alias("_t"))
    big = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("_t", 1, F.size("_t") - 1).alias("w1"),
                F.slice("_t", 2, F.size("_t") - 1).alias("w2"),
            )
        ).alias("pr"),
    ).select("doc_id", F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
    pairs = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    uni = pairs.groupBy("w1").agg(F.sum("c2").alias("c1"))
    model = pairs.join(uni, "w1").select(
        "w1",
        "w2",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * c2) div c1 AS BIGINT)"
        ).alias("ppm"),
    )
    return (
        big.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.expr(
                "CAST(CAST(SUM(ppm) AS DECIMAL(38,0)) div COUNT(*) AS BIGINT)"
            ).alias("mean_cond_ppm"),
            F.min("ppm").cast("bigint").alias("min_cond_ppm"),
        )
    )


# the stupid-backoff per-doc score relation, shared by the scores
# gate query and the CCNet-style bucketing compose below
_BACKOFF_ORACLE = f"""
    WITH staged AS (
      SELECT doc_id, {DUCK_WORDS} AS w FROM documents
    ), big AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM staged, LATERAL unnest(range(1, len(w))) AS u(i)
    ), tbig AS (
      SELECT * FROM big WHERE doc_id % 2 = 0
    ), pairs AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
      FROM tbig GROUP BY w1, w2
    ), ctx AS (
      SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM pairs GROUP BY w1
    ), bi_model AS (
      SELECT w1, w2, CAST((1000000::HUGEINT * c2) // c1 AS BIGINT) AS ppm2
      FROM pairs JOIN ctx USING (w1)
    ), ttok AS (
      SELECT unnest(w) AS wd FROM staged WHERE doc_id % 2 = 0
    ), uni AS (
      SELECT wd, CAST(COUNT(*) AS BIGINT) AS cu FROM ttok GROUP BY wd
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ttok
    ), uni_model AS (
      SELECT wd AS w2, CAST((400000::HUGEINT * cu) // n AS BIGINT) AS bo_ppm
      FROM uni, tot
    ), scored AS (
      SELECT b.doc_id,
             COALESCE(m.ppm2, u.bo_ppm, 0) AS score_ppm,
             CASE WHEN m.ppm2 IS NULL THEN 1 ELSE 0 END AS backed
      FROM big b
      LEFT JOIN bi_model m ON b.w1 = m.w1 AND b.w2 = m.w2
      LEFT JOIN uni_model u ON b.w2 = u.w2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(backed) AS BIGINT) AS n_backed_off,
           CAST(SUM(score_ppm)::HUGEINT // COUNT(*) AS BIGINT)
               AS mean_score_ppm,
           CAST(MIN(score_ppm) AS BIGINT) AS min_score_ppm
    FROM scored GROUP BY doc_id
    """


@query(
    "text_backoff_lm_scores",
    headline=True,
    tags=("text-analysis", "llm-pipeline", "quality-filter", "scale-path"),
    oracle=_BACKOFF_ORACLE,

)
def text_backoff_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STUPID-BACKOFF bigram language-model scoring (Brants et al.
    2007, the web-scale backoff the real perplexity screens —
    CCNet/Gopher — actually run): the model trains on a HELD-OUT
    split (even doc_ids — the realistic shape: CCNet trains on
    Wikipedia, scores the crawl) and scores EVERY document, so
    held-out documents genuinely contain unseen bigrams and exercise
    the backoff path (VERDICT r08 #4: the plain bigram LM, trained on
    what it scores, can never see an unseen transition).

    Score per bigram, all-integer ppm:
      seen (w1,w2) in model:  1,000,000 * c(w1,w2) div c(w1)
      unseen pair, seen w2:     400,000 * c(w2)   div N
          (stupid backoff's fixed alpha = 0.4, exact-integer form)
      unseen w2:              0  (the floor; out-of-vocabulary word)
    Per document: bigram count, how many backed off, mean and min
    score — low mean = globally unusual text, high backoff share =
    out-of-domain vocabulary.  Integer counts end to end, so the
    DuckDB oracle is value-exact; no logs, no floats.

    Scale shape: pair and unigram counts exit via map-side-combined
    aggregates (vocabulary-bounded exchanges); the context table
    derives from the pair table (no second corpus pass); the 1-row
    token total is broadcast; the two scoring joins are
    hash-partitioned corpus-scale exchanges against
    vocabulary-bounded models — shuffle-joined, never broadcast
    (real vocabularies outgrow any broadcast threshold; same
    documented call as text_bigram_lm_scores)."""
    docs = load_table(spark, sf_dir, "documents")
    # (r14 note — measured and REJECTED: the narrow-input rebalance
    # was 65% SLOWER here; same inflated-map-side-combine mechanism
    # as text_bigram_lm_scores, see the note there and
    # plans/r14/AB_rebalance_rows.json.)
    toks = docs.select("doc_id", ws_tokens(F.col("text")).alias("_t"))
    big = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("_t", 1, F.size("_t") - 1).alias("w1"),
                F.slice("_t", 2, F.size("_t") - 1).alias("w2"),
            )
        ).alias("pr"),
    ).select("doc_id", F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
    tbig = big.filter(F.col("doc_id") % 2 == 0)
    pairs = tbig.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx = pairs.groupBy("w1").agg(F.sum("c2").alias("c1"))
    bi_model = pairs.join(ctx, "w1").select(
        "w1",
        "w2",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * c2) div c1 AS BIGINT)"
        ).alias("ppm2"),
    )
    ttok = toks.filter(F.col("doc_id") % 2 == 0).select(
        F.explode("_t").alias("wd")
    )
    uni = ttok.groupBy("wd").agg(F.count(F.lit(1)).alias("cu"))
    # the token total derives from the VOCAB table (sum of counts),
    # not a second corpus pass — Spark reuses uni's shuffle exchange
    tot = uni.agg(F.sum("cu").alias("n"))
    uni_model = uni.crossJoin(F.broadcast(tot)).select(
        F.col("wd").alias("w2"),
        F.expr(
            "CAST((CAST(400000 AS DECIMAL(38,0)) * cu) div n AS BIGINT)"
        ).alias("bo_ppm"),
    )
    scored = (
        big.join(bi_model, ["w1", "w2"], "left")
        .join(uni_model, "w2", "left")
        .select(
            "doc_id",
            F.coalesce("ppm2", "bo_ppm", F.lit(0).cast("bigint")).alias(
                "score_ppm"
            ),
            F.when(F.col("ppm2").isNull(), 1).otherwise(0).alias("backed"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("backed").cast("bigint").alias("n_backed_off"),
        F.expr(
            "CAST(CAST(SUM(score_ppm) AS DECIMAL(38,0)) div COUNT(*) AS BIGINT)"
        ).alias("mean_score_ppm"),
        F.min("score_ppm").cast("bigint").alias("min_score_ppm"),
    )


@query(
    "text_rake_keyphrases",
    tags=("text-analysis", "llm-pipeline", "keyphrase", "scale-path"),
    oracle="""
    WITH phr0 AS (
      SELECT list_filter(
               list_transform(
                 string_split_regex(
                   array_to_string(
                     list_transform(
                       string_split_regex(trim(lower(text)), '\\s+'),
                       w -> CASE WHEN regexp_matches(w, '^[a-z]+$')
                                  AND NOT list_contains({stops}, w)
                             THEN w ELSE '|' END),
                     ' '),
                   ' *\\| *'),
                 p -> trim(p)),
               p -> p <> '') AS phrases
      FROM documents
    ), phr AS (
      SELECT unnest(phrases) AS phrase FROM phr0
    ), pw AS (
      SELECT phrase, unnest(string_split(phrase, ' ')) AS w,
             len(string_split(phrase, ' ')) AS plen
      FROM phr
    ), wstat AS (
      SELECT w,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS degree
      FROM pw GROUP BY w
    ), wscore AS (
      SELECT w, CAST((1000000::HUGEINT * degree) // freq AS BIGINT) AS wppm
      FROM wstat
    ), pcount AS (
      SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n FROM phr GROUP BY phrase
    ), pscore AS (
      SELECT d.phrase, CAST(SUM(s.wppm) AS BIGINT) AS score_ppm
      FROM (SELECT DISTINCT phrase FROM phr) d,
           LATERAL unnest(string_split(d.phrase, ' ')) AS t(w),
           wscore s
      WHERE s.w = t.w
      GROUP BY d.phrase
    )
    SELECT phrase, n, score_ppm
    FROM pscore JOIN pcount USING (phrase)
    ORDER BY score_ppm DESC, phrase LIMIT 20
    """.format(stops=_ALL_STOP_LIST),
)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level RAKE keyphrase extraction (Rose et al. 2010,
    public record): candidate phrases are maximal runs of
    non-stopword alphabetic tokens (stopwords and punctuation-bearing
    tokens are boundaries); each word scores degree/frequency over
    the candidate-phrase corpus (degree = total length of phrases
    containing it — co-occurrence weight); a phrase scores the sum of
    its words' scores.  The top-20 corpus keyphrases with occurrence
    counts.  All arithmetic is exact-ppm integers (per-word
    1,000,000*degree div freq, summed), so the oracle is value-exact
    — the boundary-mapping, the word statistics, and the scoring each
    break the hash if they diverge.

    Scale shape: phrase extraction is row-local expression algebra
    (map stopwords to '|', join, split — no UDF); word stats are one
    map-side-combined vocab-sized aggregate; phrase scoring joins the
    distinct-phrase word list to word scores hash-partitioned on the
    word, then rolls up per phrase; top-20 is TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))
    mapped = F.transform(
        toks,
        lambda w: F.when(
            w.rlike("^[a-z]+$") & ~w.isin(*_ALL_STOP), w
        ).otherwise(F.lit("|")),
    )
    phrases_arr = F.filter(
        F.transform(
            F.split(F.array_join(mapped, " "), r" *\| *"),
            lambda p: F.trim(p),
        ),
        lambda p: p != "",
    )
    phr = docs.select(F.explode(phrases_arr).alias("phrase"))
    pw = phr.select(
        "phrase",
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
    )
    wscore = (
        pw.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("degree"),
        )
        .select(
            "w",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * degree) div freq"
                " AS BIGINT)"
            ).alias("wppm"),
        )
    )
    pcount = phr.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    dwords = pcount.select(
        "phrase", F.explode(F.split(F.col("phrase"), " ")).alias("w")
    )
    pscore = (
        dwords.join(wscore, "w")
        .groupBy("phrase")
        .agg(F.sum("wppm").cast("bigint").alias("score_ppm"))
    )
    return (
        pscore.join(pcount, "phrase")
        .select("phrase", "n", "score_ppm")
        .orderBy(F.desc("score_ppm"), "phrase")
        .limit(20)
    )


@query(
    "pipeline_perplexity_buckets",
    tags=("text-analysis", "llm-pipeline", "quality-filter", "scale-path"),
    oracle=f"""
    WITH sc AS ({_BACKOFF_ORACLE}),
    persrc AS (
      SELECT s.doc_id, d.source, s.mean_score_ppm AS v, s.n_bigrams
      FROM sc s JOIN documents d USING (doc_id)
    ), hist AS (
      SELECT source, v, COUNT(*) AS w FROM persrc GROUP BY 1, 2
    ), cum AS (
      SELECT source, v,
             SUM(w) OVER (PARTITION BY source ORDER BY v) AS cum,
             SUM(w) OVER (PARTITION BY source) AS tot
      FROM hist
    ), b AS (
      SELECT source,
             MIN(CASE WHEN cum * 3 >= tot THEN v END) AS b1,
             MIN(CASE WHEN cum * 3 >= 2 * tot THEN v END) AS b2
      FROM cum GROUP BY source
    )
    SELECT p.source,
           CASE WHEN p.v >= b.b2 THEN 'head'
                WHEN p.v >= b.b1 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_bigrams) AS BIGINT) AS sum_bigrams,
           CAST(MIN(p.v) AS BIGINT) AS min_score_ppm,
           CAST(MAX(p.v) AS BIGINT) AS max_score_ppm
    FROM persrc p JOIN b USING (source)
    GROUP BY 1, 2
    """,
)
def pipeline_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-STYLE perplexity bucketing (Wenzek et al. 2020, public
    record): documents are LM-scored by the held-out stupid-backoff
    model (text_backoff_lm_scores — same relation, composed whole),
    then split per SOURCE into head / middle / tail terciles of the
    mean bigram score (high score = predictable text = head, the
    slice CCNet keeps; the per-source split is CCNet's per-language
    split in fixture terms).  Tercile boundaries are EXACT
    percentile_disc values from a per-source score histogram — no
    approximate quantiles — and each bucket reports doc count, bigram
    (token-proxy) budget, and its score range: the report a curation
    run uses to draw the keep line.

    Scale shape: scoring is the LM compose's vocabulary-bounded
    exchanges; bucketing adds ONE (source, score) map-side-combined
    histogram, a per-source prefix window over histogram rows (not
    corpus rows), a broadcast of the per-source boundary table, and a
    final per-(source, bucket) aggregate.  All-integer end to end."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sc = text_backoff_lm_scores(spark, sf_dir).select(
        "doc_id", F.col("mean_score_ppm").alias("v"), "n_bigrams"
    )
    # referenced by the boundary pass AND the final classify:
    # materialize the (doc-count-sized, 4 narrow columns) score
    # relation once so the whole LM chain doesn't replay twice
    persrc = sc.join(
        docs.select("doc_id", "source"), "doc_id"
    ).localCheckpoint()
    hist = persrc.groupBy("source", "v").agg(F.count(F.lit(1)).alias("w"))
    wcum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "v",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(wtot).alias("tot"),
    )
    b = cum.groupBy("source").agg(
        F.min(
            F.when(F.col("cum") * 3 >= F.col("tot"), F.col("v"))
        ).alias("b1"),
        F.min(
            F.when(F.col("cum") * 3 >= 2 * F.col("tot"), F.col("v"))
        ).alias("b2"),
    )
    return (
        persrc.join(F.broadcast(b), "source")
        .withColumn(
            "bucket",
            F.when(F.col("v") >= F.col("b2"), F.lit("head"))
            .when(F.col("v") >= F.col("b1"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("sum_bigrams"),
            F.min("v").cast("bigint").alias("min_score_ppm"),
            F.max("v").cast("bigint").alias("max_score_ppm"),
        )
    )


@query(
    "text_boilerplate_screen",
    tags=("text-analysis", "llm-pipeline", "curation", "scale-path"),
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, {DUCK_WORDS} AS words FROM documents
    ), lines AS (
      SELECT DISTINCT doc_id, source, line FROM (
        SELECT doc_id, source,
               'nav menu for ' || source AS line
        FROM w
        UNION ALL
        SELECT doc_id, source,
               array_to_string(list_slice(words, i * 8 + 1, i * 8 + 8), ' ')
                 AS line
        FROM w, LATERAL unnest(range((len(words) + 7) // 8)) AS u(i)
      )
    ), srctot AS (
      SELECT source, COUNT(DISTINCT doc_id) AS n_src_docs
      FROM documents GROUP BY source
    ), freq AS (
      SELECT source, line, COUNT(*) AS n_docs
      FROM lines GROUP BY 1, 2
    )
    SELECT f.source, f.line,
           CAST(f.n_docs AS BIGINT) AS n_docs,
           CAST(t.n_src_docs AS BIGINT) AS n_src_docs,
           CAST((1000000 * f.n_docs) // t.n_src_docs AS BIGINT)
             AS share_ppm
    FROM freq f JOIN srctot t USING (source)
    WHERE f.n_docs >= 3
      AND f.n_docs * 10 >= t.n_src_docs * 3
    """,
)
def text_boilerplate_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOILERPLATE detection — the template-removal screen (CCNet /
    content-extraction lineage) that catches nav menus, cookie
    banners, and footers: a line repeated across a large share of
    ONE source's documents is template, not content.  Documents are
    segmented into pseudo-lines (8-token chunks; the fixture text is
    single-line) plus one planted per-source nav line — the
    detector must surface exactly the planted template (random-salad
    chunks can't reach 30% document frequency), reported with
    per-source document frequency and exact ppm share.  A line is
    counted once per document (DISTINCT), so in-doc repetition can't
    fake cross-doc boilerplate.

    Scale shape: explode to (doc, line) -> DISTINCT at (source,
    line, doc) granularity -> ONE map-side-combined frequency count
    keyed by (source, line); source totals broadcast back at source
    granularity; the output is the boilerplate list (tiny), which
    the excision pass then applies row-locally exactly like
    dedup_exact_lines_apply.  At 100 TB, doc-frequency counting per
    source is how production template removal actually runs."""
    docs = load_table(spark, sf_dir, "documents")
    nav = F.concat(F.lit("nav menu for "), F.col("source"))
    staged = docs.select(
        "doc_id",
        "source",
        ws_tokens(F.col("text")).alias("_w"),
        nav.alias("_nav"),
    ).withColumn(
        "_idx",
        F.when(
            F.size("_w") > 0,
            F.sequence(
                F.lit(0).cast("bigint"),
                F.expr("CAST((size(_w) - 1) DIV 8 AS BIGINT)"),
            ),
        ).otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)")),
    )
    chunks = F.transform(
        F.col("_idx"),
        lambda i: F.array_join(
            F.slice(F.col("_w"), (i * 8 + 1).cast("int"), 8), " "
        ),
    )
    lines = staged.select(
        "doc_id",
        "source",
        F.explode(F.concat(F.array(F.col("_nav")), chunks)).alias("line"),
    ).distinct()
    srctot = docs.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_src_docs")
    )
    freq = lines.groupBy("source", "line").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        freq.join(F.broadcast(srctot), "source")
        .filter(
            (F.col("n_docs") >= 3)
            & (F.col("n_docs") * 10 >= F.col("n_src_docs") * 3)
        )
        .select(
            "source",
            "line",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_src_docs").cast("bigint").alias("n_src_docs"),
            F.expr(
                "CAST((1000000 * n_docs) DIV n_src_docs AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


@query(
    "text_boilerplate_excision_apply",
    tags=("text-analysis", "llm-pipeline", "curation", "scale-path"),
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, {DUCK_WORDS} AS words FROM documents
    ), inst AS (
      SELECT doc_id, source, 'nav menu for ' || source AS line FROM w
      UNION ALL
      SELECT doc_id, source,
             array_to_string(list_slice(words, i * 8 + 1, i * 8 + 8), ' ')
               AS line
      FROM w, LATERAL unnest(range((len(words) + 7) // 8)) AS u(i)
    ), srctot AS (
      SELECT source, COUNT(DISTINCT doc_id) AS n_src_docs
      FROM documents GROUP BY source
    ), freq AS (
      SELECT source, line, COUNT(*) AS n_docs
      FROM (SELECT DISTINCT doc_id, source, line FROM inst)
      GROUP BY 1, 2
    ), bp AS (
      SELECT f.source, f.line
      FROM freq f JOIN srctot t USING (source)
      WHERE f.n_docs >= 3 AND f.n_docs * 10 >= t.n_src_docs * 3
    ), marked AS (
      SELECT i.doc_id, i.line, b.line IS NULL AS keep
      FROM inst i LEFT JOIN bp b
        ON i.source = b.source AND i.line = b.line
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
             AS n_dropped,
           CAST(SUM(CASE WHEN keep THEN length(line) ELSE 0 END)
                + GREATEST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) - 1, 0)
                AS BIGINT) AS cleaned_chars
    FROM marked GROUP BY doc_id
    """,
)
def text_boilerplate_excision_apply(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """APPLY the boilerplate screen — the excision half of template
    removal: every instance of a line the per-source detector
    (text_boilerplate_screen, same thresholds) flagged as template is
    dropped from every document (ALL occurrences, unlike
    first-occurrence line dedup — boilerplate has no canonical keep),
    and each document reports kept/dropped line counts and its
    cleaned char size (kept line lengths + newline separators, the
    dedup_exact_lines_apply accounting).

    Scale shape: the template list is detector output — tiny (per-
    source frequent lines), so the apply is a BROADCAST left-anti
    flag against the line instances and one per-doc aggregate; the
    corpus text shuffles only doc-locally (explode + groupBy on
    doc_id), and at 100 TB the screen's frequency pass is the only
    corpus-keyed exchange in the pair."""
    docs = load_table(spark, sf_dir, "documents")
    nav = F.concat(F.lit("nav menu for "), F.col("source"))
    staged = docs.select(
        "doc_id",
        "source",
        ws_tokens(F.col("text")).alias("_w"),
        nav.alias("_nav"),
    ).withColumn(
        "_idx",
        F.when(
            F.size("_w") > 0,
            F.sequence(
                F.lit(0).cast("bigint"),
                F.expr("CAST((size(_w) - 1) DIV 8 AS BIGINT)"),
            ),
        ).otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)")),
    )
    chunks = F.transform(
        F.col("_idx"),
        lambda i: F.array_join(
            F.slice(F.col("_w"), (i * 8 + 1).cast("int"), 8), " "
        ),
    )
    inst = staged.select(
        "doc_id",
        "source",
        F.explode(F.concat(F.array(F.col("_nav")), chunks)).alias("line"),
    )
    bp = text_boilerplate_screen(spark, sf_dir).select(
        "source", "line", F.lit(1).alias("_bp")
    )
    marked = inst.join(F.broadcast(bp), ["source", "line"], "left")
    keep = F.col("_bp").isNull()
    return marked.groupBy("doc_id").agg(
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(keep, 0).otherwise(1)).cast("bigint").alias("n_dropped"),
        (
            F.sum(F.when(keep, F.length("line")).otherwise(0))
            + F.greatest(
                F.sum(F.when(keep, 1).otherwise(0)) - 1, F.lit(0)
            )
        ).cast("bigint").alias("cleaned_chars"),
    )


@query(
    "text_kneser_ney_scores",
    tags=("text-analysis", "llm-pipeline", "quality-filter", "scale-path"),
    oracle=f"""
    WITH staged AS (
      SELECT doc_id, {DUCK_WORDS} AS w FROM documents
    ), big AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM staged, LATERAL unnest(range(1, len(w))) AS u(i)
    ), tbig AS (
      SELECT * FROM big WHERE doc_id % 2 = 0
    ), pairs AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
      FROM tbig GROUP BY w1, w2
    ), ctx AS (
      SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS n1
      FROM pairs GROUP BY w1
    ), cont AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS nc FROM pairs GROUP BY w2
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS t FROM pairs
    ), scored AS (
      SELECT b.doc_id,
        CASE
          WHEN x.c1 IS NULL THEN
            (1000000::HUGEINT * COALESCE(n.nc, 0)) // t.t
          WHEN p.c2 IS NOT NULL THEN
            (1000000::HUGEINT * ((4 * p.c2 - 3) * t.t
                                 + 3 * x.n1 * COALESCE(n.nc, 0)))
              // (4::HUGEINT * x.c1 * t.t)
          ELSE
            (1000000::HUGEINT * (3 * x.n1 * COALESCE(n.nc, 0)))
              // (4::HUGEINT * x.c1 * t.t)
        END AS score_ppm,
        CASE WHEN x.c1 IS NULL THEN 1 ELSE 0 END AS no_ctx,
        CASE WHEN x.c1 IS NOT NULL AND p.c2 IS NULL THEN 1 ELSE 0 END
          AS backed
      FROM big b
      LEFT JOIN pairs p ON b.w1 = p.w1 AND b.w2 = p.w2
      LEFT JOIN ctx x ON b.w1 = x.w1
      LEFT JOIN cont n ON b.w2 = n.w2
      CROSS JOIN tot t
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(no_ctx) AS BIGINT) AS n_no_ctx,
           CAST(SUM(backed) AS BIGINT) AS n_backed_off,
           CAST(SUM(score_ppm)::HUGEINT // COUNT(*) AS BIGINT)
             AS mean_score_ppm
    FROM scored GROUP BY doc_id
    """,
)
def text_kneser_ney_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNESER-NEY bigram scoring in EXACT integers — the canonical
    smoothing (Kneser & Ney 1995; Chen & Goodman 1998's benchmark
    winner, public record) the stupid-backoff screen approximates:
    absolute discounting (d = 3/4, an exact rational) plus the
    CONTINUATION-count back-off — a word's back-off mass reflects how
    many distinct contexts it follows (nc), not its raw frequency,
    which is what makes KN beat naive interpolation on "San
    Francisco"-type collocations.  Trained on the held-out even-doc
    split and scoring every document (the backoff-LM convention), the
    per-bigram probability

        seen:      ((c2 - 3/4) + (3/4) n1 Pcont) / c1
        unseen:    ((3/4) n1 / c1) * Pcont          (Pcont = nc / T)
        no context: Pcont                           (unseen w2 -> 0)

    is carried as ONE exact integer division per branch (numerators
    cross-multiplied onto the common denominator 4*c1*T), so the
    oracle is value-exact with no floats anywhere.

    Scale shape: identical to the backoff LM — vocabulary-bounded
    model relations (pair counts, context totals + distinct-
    continuation counts in one aggregate, continuation counts), all
    shuffle-joined against the corpus bigrams (real vocabularies
    outgrow broadcast), one 1-row bigram-type total broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", ws_tokens(F.col("text")).alias("_t"))
    big = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("_t", 1, F.size("_t") - 1).alias("w1"),
                F.slice("_t", 2, F.size("_t") - 1).alias("w2"),
            )
        ).alias("pr"),
    ).select("doc_id", F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
    tbig = big.filter(F.col("doc_id") % 2 == 0)
    pairs = tbig.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx = pairs.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1")
    )
    cont = pairs.groupBy("w2").agg(F.count(F.lit(1)).alias("nc"))
    tot = pairs.agg(F.count(F.lit(1)).alias("t"))
    d38 = "CAST({} AS DECIMAL(38,0))"
    seen_num = (
        f"{d38.format('1000000')} * ((4 * c2 - 3) * t"
        " + 3 * n1 * COALESCE(nc, 0))"
    )
    back_num = f"{d38.format('1000000')} * (3 * n1 * COALESCE(nc, 0))"
    den = f"{d38.format('4')} * c1 * t"
    scored = (
        big.join(pairs, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.expr(
                f"""CASE
                  WHEN c1 IS NULL THEN
                    CAST(({d38.format('1000000')} * COALESCE(nc, 0))
                         div t AS BIGINT)
                  WHEN c2 IS NOT NULL THEN
                    CAST(({seen_num}) div ({den}) AS BIGINT)
                  ELSE
                    CAST(({back_num}) div ({den}) AS BIGINT)
                END"""
            ).alias("score_ppm"),
            F.when(F.col("c1").isNull(), 1).otherwise(0).alias("no_ctx"),
            F.when(
                F.col("c1").isNotNull() & F.col("c2").isNull(), 1
            ).otherwise(0).alias("backed"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("no_ctx").cast("bigint").alias("n_no_ctx"),
        F.sum("backed").cast("bigint").alias("n_backed_off"),
        F.expr(
            "CAST(CAST(SUM(score_ppm) AS DECIMAL(38,0)) div COUNT(*)"
            " AS BIGINT)"
        ).alias("mean_score_ppm"),
    )


_BPE_FULL_MERGES = 128  # full-vocabulary application depth (rank bound)


@query(
    "text_bpe_encode_full",
    headline=True,
    tags=("text-analysis", "tokenizer", "llm-pipeline", "scale-path"),
    oracle=f"""
    WITH aw AS (
      SELECT source, word
      FROM (SELECT source,
                   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
            FROM documents)
      WHERE regexp_matches(word, '^[a-z]+$')
    ), v AS (
      SELECT word, COUNT(*) AS wc FROM aw GROUP BY 1
    ), pr AS (
      SELECT substring(word, i, 1) AS l, substring(word, i + 1, 1) AS r,
             SUM(wc) AS c
      FROM v, LATERAL (SELECT unnest(range(1, length(word))) AS i) u
      GROUP BY 1, 2
    ), rk AS (
      SELECT l || chr(30) || r AS m,
             row_number() OVER (ORDER BY c DESC, l, r) AS rn
      FROM pr
    ), mt AS (
      SELECT list(m ORDER BY rn) AS merges
      FROM rk WHERE rn <= {_BPE_FULL_MERGES}
    ), encv AS (
      SELECT word, length(word) AS n_before,
             (length(seq) - length(replace(seq, chr(31), ''))) // 2 AS n_after
      FROM (
        SELECT word,
               list_reduce(
                 list_prepend(
                   chr(31) || array_to_string(string_split(word, ''),
                                              chr(31) || chr(31)) || chr(31),
                   merges),
                 (acc, m) -> replace(acc,
                   chr(31) || split_part(m, chr(30), 1) || chr(31)
                     || chr(31) || split_part(m, chr(30), 2) || chr(31),
                   chr(31) || split_part(m, chr(30), 1)
                     || split_part(m, chr(30), 2) || chr(31))
               ) AS seq
        FROM v, mt
      )
    ), j AS (
      SELECT a.source, e.n_before, e.n_after FROM aw a JOIN encv e USING (word)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_before) AS BIGINT) AS n_sym_before,
           CAST(SUM(n_after) AS BIGINT) AS n_sym_after,
           CAST((1000000::HUGEINT * (SUM(n_before) - SUM(n_after)))
                // SUM(n_before) AS BIGINT) AS saved_ppm,
           (SELECT CAST(len(merges) AS INT) FROM mt) AS n_merges
    FROM j GROUP BY source
    """,
)
def text_bpe_encode_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-VOCABULARY BPE application (VERDICT r09 #5): derives a
    128-merge rank table (the most frequent adjacent character pairs
    over the weighted vocabulary, ties (count DESC, l, r)) in one
    aggregation, then encodes every vocab word with
    bpe_apply_merges_hof — the merge table rides as a BROADCAST ARRAY
    and application is ONE higher-order `aggregate` whose lambda is
    the boundary-anchored replace, so expression depth stays O(1) at
    any table size (the chain operator's BPE_MAX_MERGES codegen bound
    does not apply; a 50k-merge production table builds the same
    1-node plan).  Per-source compression stats roll up through a
    word-keyed join, exactly like text_bpe_encode_deep.

    Scale shape: pair counting and application run on the VOCABULARY
    (type-level, not token-level); the rank window is a bounded
    unpartitioned window over <= 676 distinct character pairs
    (sanctioned 1-row-stats class); the merge table crosses the
    exchange once as a single broadcast row; corpus-sized relations
    appear only in the word explode and the final join + rollup.  Row
    cost is O(n_merges * word_len) — linear in token count x merge
    rounds (SCALING row).  The oracle re-derives the same table and
    applies it with DuckDB list_reduce over the same packed-merge
    strings."""
    from parquet_to_sql_spark.operators.text import (
        bpe_apply_merges_hof,
        bpe_pack_merge,
        bpe_symbol_count,
        bpe_word_to_sequence,
        ws_tokens,
    )
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    aw = docs.select(
        "source", F.explode(ws_tokens(F.lower(F.col("text")))).alias("word")
    ).filter(F.col("word").rlike("^[a-z]+$"))
    vocab = aw.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    pairs = (
        vocab.where(F.length("word") >= 2)
        .select(
            "wc",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> struct(substring(word, i, 1) AS l,"
                    "             substring(word, i + 1, 1) AS r))"
                )
            ).alias("_p"),
        )
        .groupBy("_p.l", "_p.r")
        .agg(F.sum("wc").alias("c"))
    )
    ranked = pairs.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.desc("c"), F.col("l"), F.col("r"))
        ),
    ).where(F.col("rn") <= _BPE_FULL_MERGES)
    ranked = ranked.withColumn("m", bpe_pack_merge(F.col("l"), F.col("r")))
    table = ranked.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(rn, m))), x -> x.m)"
        ).alias("merges")
    ).select("merges", F.size("merges").cast("int").alias("n_merges"))
    stats = (
        vocab.crossJoin(F.broadcast(table.select("merges")))
        .select(
            "word",
            F.length("word").cast("long").alias("n_before"),
            bpe_apply_merges_hof(
                bpe_word_to_sequence(F.col("word")), F.col("merges")
            ).alias("_seq"),
        )
        .select(
            "word", "n_before", bpe_symbol_count(F.col("_seq")).alias("n_after")
        )
    )
    return (
        aw.join(stats, "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_before").cast("bigint").alias("n_sym_before"),
            F.sum("n_after").cast("bigint").alias("n_sym_after"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0))"
                " * (sum(n_before) - sum(n_after)))"
                " div sum(n_before) AS BIGINT)"
            ).alias("saved_ppm"),
        )
        .crossJoin(F.broadcast(table.select("n_merges")))
    )


_KN3_ORACLE = f"""
    WITH staged AS (
      SELECT doc_id, {DUCK_WORDS} AS w FROM documents
    ), tri AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
      FROM staged, LATERAL unnest(range(1, len(w) - 1)) AS u(i)
    ), ttri AS (
      SELECT * FROM tri WHERE doc_id % 2 = 0
    ), c3t AS (
      SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c3
      FROM ttri GROUP BY w1, w2, w3
    ), ctx3 AS (
      SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c2ctx,
             CAST(COUNT(*) AS BIGINT) AS n3
      FROM c3t GROUP BY w1, w2
    ), m2t AS (
      SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS m2
      FROM c3t GROUP BY w2, w3
    ), mid AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS mctx,
             CAST(COUNT(DISTINCT w3) AS BIGINT) AS mn
      FROM c3t GROUP BY w2
    ), nct AS (
      SELECT w3, CAST(COUNT(*) AS BIGINT) AS nc FROM m2t GROUP BY w3
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS t FROM m2t
    ), scored AS (
      SELECT g.doc_id,
        CASE
          WHEN x.c2ctx IS NOT NULL AND p.c3 IS NOT NULL THEN
            (1000000::HUGEINT * ((4 * p.c3 - 3) * 4 * d.mctx * t.t
               + 3 * x.n3 * ((4 * m.m2 - 3) * t.t
                             + 3 * d.mn * COALESCE(n.nc, 0))))
              // (16::HUGEINT * x.c2ctx * d.mctx * t.t)
          WHEN x.c2ctx IS NOT NULL THEN
            (1000000::HUGEINT * (3 * x.n3
               * (GREATEST(4 * COALESCE(m.m2, 0) - 3, 0) * t.t
                  + 3 * d.mn * COALESCE(n.nc, 0))))
              // (16::HUGEINT * x.c2ctx * d.mctx * t.t)
          WHEN d.mctx IS NOT NULL THEN
            (1000000::HUGEINT * (GREATEST(4 * COALESCE(m.m2, 0) - 3, 0) * t.t
                                 + 3 * d.mn * COALESCE(n.nc, 0)))
              // (4::HUGEINT * d.mctx * t.t)
          ELSE
            (1000000::HUGEINT * COALESCE(n.nc, 0)) // t.t
        END AS score_ppm,
        CASE WHEN x.c2ctx IS NOT NULL AND p.c3 IS NOT NULL THEN 1 ELSE 0 END
          AS b_full,
        CASE WHEN x.c2ctx IS NOT NULL AND p.c3 IS NULL THEN 1 ELSE 0 END
          AS b_mid,
        CASE WHEN x.c2ctx IS NULL AND d.mctx IS NOT NULL THEN 1 ELSE 0 END
          AS b_ctx,
        CASE WHEN x.c2ctx IS NULL AND d.mctx IS NULL THEN 1 ELSE 0 END
          AS b_uni
      FROM tri g
      LEFT JOIN c3t p ON g.w1 = p.w1 AND g.w2 = p.w2 AND g.w3 = p.w3
      LEFT JOIN ctx3 x ON g.w1 = x.w1 AND g.w2 = x.w2
      LEFT JOIN m2t m ON g.w2 = m.w2 AND g.w3 = m.w3
      LEFT JOIN mid d ON g.w2 = d.w2
      LEFT JOIN nct n ON g.w3 = n.w3
      CROSS JOIN tot t
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(b_full) AS BIGINT) AS n_full,
           CAST(SUM(b_mid) AS BIGINT) AS n_mid_backed,
           CAST(SUM(b_ctx) AS BIGINT) AS n_ctx_backed,
           CAST(SUM(b_uni) AS BIGINT) AS n_unigram,
           CAST(SUM(score_ppm)::HUGEINT // COUNT(*) AS BIGINT)
             AS mean_score_ppm
    FROM scored GROUP BY doc_id
"""


@query(
    "text_kneser_ney_trigram",
    tags=("text-analysis", "llm-pipeline", "quality-filter", "scale-path"),
    oracle=_KN3_ORACLE,
)
def text_kneser_ney_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERPOLATED TRIGRAM Kneser-Ney in exact integers (VERDICT r09
    #7 — CCNet-grade perplexity screens use higher orders than the
    bigram query beside this one).  Chen & Goodman 1998's interpolated
    formulation with absolute discount d = 3/4 at both levels and
    CONTINUATION counts below the top:

        P3(w3|w1w2) = max(c3 - d, 0)/c2ctx + d*n3/c2ctx * P2(w3|w2)
        P2(w3|w2)   = max(m2 - d, 0)/mctx + d*mn/mctx * P1(w3)
        P1(w3)      = nc / T

    where c3/c2ctx/n3 are trigram counts and context totals, m2 =
    N1+(.w2w3) (distinct left-contexts of the pair), mctx = N1+(.w2.)
    (trigram TYPES through the middle word), mn = N1+(w2.) (distinct
    continuations in the middle model), nc = N1+(.w3) over pair
    types, T = total pair types.  Every per-trigram probability is
    carried as ONE exact integer division on the common denominator
    16*c2ctx*mctx*T (top two branches), 4*mctx*T (context-backed), or
    T (unigram) — no floats anywhere, so the oracle is value-exact.
    The four branches are reported per document (seen trigram /
    middle-model backoff / unseen trigram context / unseen middle
    word); the four-branch property test pins each against a
    fractions.Fraction sequential reference.

    Scale shape: identical to the bigram query — every model relation
    (c3t, ctx3, m2t, mid, nct) is TYPE-bounded (vocabulary-scale, not
    token-scale), shuffle-joined against the corpus trigrams (real
    vocabularies outgrow broadcast); the 1-row type total broadcasts.
    Numerators peak near 1e6*16*c3*mctx*T — at web scale move the ppm
    constant to ppb and the same DECIMAL(38,0)/HUGEINT algebra holds
    to ~1e9 types."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", ws_tokens(F.col("text")).alias("_t"))
    tri_len = F.greatest(F.size("_t") - 2, F.lit(0))  # <3-token docs: none
    tri = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("_t", 1, tri_len).alias("w1"),
                F.slice("_t", 2, tri_len).alias("w2"),
                F.slice("_t", 3, tri_len).alias("w3"),
            )
        ).alias("tr"),
    ).select(
        "doc_id",
        F.col("tr.w1").alias("w1"),
        F.col("tr.w2").alias("w2"),
        F.col("tr.w3").alias("w3"),
    )
    ttri = tri.filter(F.col("doc_id") % 2 == 0)
    c3t = ttri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c3"))
    ctx3 = c3t.groupBy("w1", "w2").agg(
        F.sum("c3").alias("c2ctx"), F.count(F.lit(1)).alias("n3")
    )
    m2t = c3t.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("m2"))
    mid = c3t.groupBy("w2").agg(
        F.count(F.lit(1)).alias("mctx"),
        F.countDistinct("w3").alias("mn"),
    )
    nct = m2t.groupBy("w3").agg(F.count(F.lit(1)).alias("nc"))
    tot = m2t.agg(F.count(F.lit(1)).alias("t"))
    d38 = "CAST({} AS DECIMAL(38,0))"
    scored = (
        tri.join(c3t, ["w1", "w2", "w3"], "left")
        .join(ctx3, ["w1", "w2"], "left")
        .join(m2t, ["w2", "w3"], "left")
        .join(mid, "w2", "left")
        .join(nct, "w3", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.expr(
                f"""CASE
                  WHEN c2ctx IS NOT NULL AND c3 IS NOT NULL THEN
                    CAST(({d38.format('1000000')}
                          * ((4 * c3 - 3) * 4 * mctx * t
                             + 3 * n3 * ((4 * m2 - 3) * t
                                         + 3 * mn * COALESCE(nc, 0))))
                         div ({d38.format('16')} * c2ctx * mctx * t)
                         AS BIGINT)
                  WHEN c2ctx IS NOT NULL THEN
                    CAST(({d38.format('1000000')}
                          * (3 * n3
                             * (GREATEST(4 * COALESCE(m2, 0) - 3, 0) * t
                                + 3 * mn * COALESCE(nc, 0))))
                         div ({d38.format('16')} * c2ctx * mctx * t)
                         AS BIGINT)
                  WHEN mctx IS NOT NULL THEN
                    CAST(({d38.format('1000000')}
                          * (GREATEST(4 * COALESCE(m2, 0) - 3, 0) * t
                             + 3 * mn * COALESCE(nc, 0)))
                         div ({d38.format('4')} * mctx * t) AS BIGINT)
                  ELSE
                    CAST(({d38.format('1000000')} * COALESCE(nc, 0))
                         div t AS BIGINT)
                END"""
            ).alias("score_ppm"),
            F.expr(
                "CASE WHEN c2ctx IS NOT NULL AND c3 IS NOT NULL"
                " THEN 1 ELSE 0 END"
            ).alias("b_full"),
            F.expr(
                "CASE WHEN c2ctx IS NOT NULL AND c3 IS NULL"
                " THEN 1 ELSE 0 END"
            ).alias("b_mid"),
            F.expr(
                "CASE WHEN c2ctx IS NULL AND mctx IS NOT NULL"
                " THEN 1 ELSE 0 END"
            ).alias("b_ctx"),
            F.expr(
                "CASE WHEN c2ctx IS NULL AND mctx IS NULL"
                " THEN 1 ELSE 0 END"
            ).alias("b_uni"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
        F.sum("b_full").cast("bigint").alias("n_full"),
        F.sum("b_mid").cast("bigint").alias("n_mid_backed"),
        F.sum("b_ctx").cast("bigint").alias("n_ctx_backed"),
        F.sum("b_uni").cast("bigint").alias("n_unigram"),
        F.expr(
            "CAST(CAST(sum(score_ppm) AS DECIMAL(38,0)) div count(1)"
            " AS BIGINT)"
        ).alias("mean_score_ppm"),
    )


@query(
    "pipeline_perplexity_trigram_buckets",
    tags=("text-analysis", "llm-pipeline", "quality-filter", "scale-path"),
    oracle=f"""
    WITH sc AS ({_KN3_ORACLE}),
    persrc AS (
      SELECT s.doc_id, d.source, s.mean_score_ppm AS v, s.n_trigrams
      FROM sc s JOIN documents d USING (doc_id)
    ), hist AS (
      SELECT source, v, COUNT(*) AS w FROM persrc GROUP BY 1, 2
    ), cum AS (
      SELECT source, v,
             SUM(w) OVER (PARTITION BY source ORDER BY v) AS cum,
             SUM(w) OVER (PARTITION BY source) AS tot
      FROM hist
    ), b AS (
      SELECT source,
             MIN(CASE WHEN cum * 3 >= tot THEN v END) AS b1,
             MIN(CASE WHEN cum * 3 >= 2 * tot THEN v END) AS b2
      FROM cum GROUP BY source
    )
    SELECT p.source,
           CASE WHEN p.v >= b.b2 THEN 'head'
                WHEN p.v >= b.b1 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_trigrams) AS BIGINT) AS sum_trigrams,
           CAST(MIN(p.v) AS BIGINT) AS min_score_ppm,
           CAST(MAX(p.v) AS BIGINT) AS max_score_ppm
    FROM persrc p JOIN b USING (source)
    GROUP BY 1, 2
    """,
)
def pipeline_perplexity_trigram_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet perplexity bucketing UPGRADED to the interpolated
    trigram Kneser-Ney model (VERDICT r10 "Next round" #6 — the
    bigram-model screen beside this one stays as the lighter tier;
    CCNet's production screen scores with a higher-order KN LM, and
    text_kneser_ney_trigram now provides exactly that in exact
    integers).  Same recipe: per-doc mean trigram score from the
    held-out (even doc_id) model, per-SOURCE head/middle/tail
    terciles via exact percentile boundaries over a (source, score)
    histogram, each bucket reporting doc count, trigram (token-proxy)
    budget, and score range.  The sequential-reference test recomputes
    the tercile boundaries from the raw per-doc scores in pure Python
    and pins the bucket memberships.

    Scale shape: scoring inherits the trigram query's type-bounded
    model exchanges (vocabulary-scale relations, corpus never
    broadcast); bucketing adds ONE map-side-combined histogram, a
    prefix window over HISTOGRAM rows, a broadcast boundary table,
    and the final per-(source, bucket) aggregate — identical to the
    bigram screen, so the upgrade costs only the deeper LM."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sc = text_kneser_ney_trigram(spark, sf_dir).select(
        "doc_id", F.col("mean_score_ppm").alias("v"), "n_trigrams"
    )
    persrc = sc.join(
        docs.select("doc_id", "source"), "doc_id"
    ).localCheckpoint()
    hist = persrc.groupBy("source", "v").agg(F.count(F.lit(1)).alias("w"))
    wcum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "v",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(wtot).alias("tot"),
    )
    b = cum.groupBy("source").agg(
        F.min(
            F.when(F.col("cum") * 3 >= F.col("tot"), F.col("v"))
        ).alias("b1"),
        F.min(
            F.when(F.col("cum") * 3 >= 2 * F.col("tot"), F.col("v"))
        ).alias("b2"),
    )
    return (
        persrc.join(F.broadcast(b), "source")
        .withColumn(
            "bucket",
            F.when(F.col("v") >= F.col("b2"), F.lit("head"))
            .when(F.col("v") >= F.col("b1"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_trigrams").cast("bigint").alias("sum_trigrams"),
            F.min("v").cast("bigint").alias("min_score_ppm"),
            F.max("v").cast("bigint").alias("max_score_ppm"),
        )
    )


_PTRON_EPOCHS = 3


def _duck_perceptron_oracle() -> str:
    """Unrolled batch-perceptron training (the _duck_bpe_train_ctes
    recipe): epoch 1 updates on every doc (margin 0 from w=0), each
    later epoch joins the previous weight relation, takes the
    misclassified slice, and folds its deltas in via UNION ALL."""
    parts = [f"""
    tok AS (
      SELECT doc_id, unnest({DUCK_WORDS}) AS tok FROM documents
    ), feats AS (
      SELECT doc_id, ({DUCK_FOLD.format(s="tok")}) % {_CLS_BUCKETS} AS bkt,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok GROUP BY 1, 2
    ), lab AS (
      SELECT doc_id, source,
             CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
      FROM documents
    ), w1 AS (
      SELECT f.bkt, CAST(SUM(l.y * f.cnt) AS BIGINT) AS w
      FROM feats f JOIN lab l USING (doc_id) GROUP BY 1
    ), b1 AS (
      SELECT CAST(SUM(y) AS BIGINT) AS b FROM lab
    )"""]
    for e in range(2, _PTRON_EPOCHS + 1):
        p = e - 1
        parts.append(f""",
    dot{e} AS (
      SELECT l.doc_id, l.y,
             COALESCE(SUM(f.cnt * w{p}.w), 0) + (SELECT b FROM b{p}) AS s
      FROM lab l
      LEFT JOIN feats f USING (doc_id)
      LEFT JOIN w{p} ON f.bkt = w{p}.bkt
      GROUP BY 1, 2
    ), mis{e} AS (
      SELECT doc_id, y FROM dot{e} WHERE y * s <= 0
    ), w{e} AS (
      SELECT bkt, CAST(SUM(w) AS BIGINT) AS w FROM (
        SELECT bkt, w FROM w{p}
        UNION ALL
        SELECT f.bkt, m.y * f.cnt
        FROM mis{e} m JOIN feats f USING (doc_id)
      ) GROUP BY 1
    ), b{e} AS (
      SELECT (SELECT b FROM b{p}) + COALESCE(CAST(SUM(y) AS BIGINT), 0) AS b
      FROM mis{e}
    )""")
    n = _PTRON_EPOCHS
    return f"""
    WITH {''.join(parts)},
    finaldot AS (
      SELECT l.doc_id, l.source, l.y,
             COALESCE(SUM(f.cnt * w{n}.w), 0) + (SELECT b FROM b{n}) AS s
      FROM lab l
      LEFT JOIN feats f USING (doc_id)
      LEFT JOIN w{n} ON f.bkt = w{n}.bkt
      GROUP BY 1, 2, 3
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN y = 1 AND s >= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN y = -1 AND s >= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN y = 1 AND s < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN y = -1 AND s < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS tn,
           CAST((1000000::HUGEINT
                 * SUM(CASE WHEN (y = 1) = (s >= 0) THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS accuracy_ppm
    FROM finaldot GROUP BY source
    """


@query(
    "text_perceptron_quality_train",
    tags=("text-analysis", "quality-filter", "llm-pipeline", "training",
          "scale-path"),
    oracle=_duck_perceptron_oracle(),
)
def text_perceptron_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier TRAINING in-engine — closes the loop that
    text_hash_feature_classify's surrogate weights left open: a batch
    perceptron (updates summed over ALL misclassified docs per epoch,
    so the result is partitioning-independent and integer-exact —
    the online variant is sequential by definition and has no honest
    distributed spelling) learns to predict lang='en' from hashed
    bag-of-words features (fold hash mod 256, the classifier family's
    bucket convention), then the LEARNED model is evaluated
    distributed: per-source confusion counts and accuracy.  The
    oracle re-derives the entire training trajectory (3 unrolled
    epochs of margin -> misclassified slice -> delta fold) plus the
    evaluation, so a wrong epoch-2 update is a value mismatch.

    Scale shape: per epoch ONE distributed pass — weights ride as a
    256-literal array (k-means-centroid-class bounded collect per
    epoch), margins are a map-side-combined doc rollup, the update
    aggregates only the misclassified slice; evaluation is one more
    pass.  Margin-0 docs count as misclassified (the w=0 first epoch
    updates on the whole corpus)."""
    from parquet_to_sql_spark.functions.hashing import char_fold_hash
    from parquet_to_sql_spark.operators.text import (
        CLS_BUCKETS,
        perceptron_train_batch,
        ws_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("tok")
    )
    feats = tok.select(
        "doc_id", (char_fold_hash(F.col("tok")) % CLS_BUCKETS).alias("bkt")
    ).groupBy("doc_id", "bkt").agg(F.count(F.lit(1)).alias("cnt"))
    labels = docs.select(
        "doc_id",
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(-1).alias("y"),
    )
    w, b, _hist = perceptron_train_batch(
        feats, labels.select("doc_id", "y"), CLS_BUCKETS, _PTRON_EPOCHS
    )
    warr = F.array(*[F.lit(int(x)).cast("long") for x in w])
    dots = (
        feats.withColumn("_w", F.element_at(warr, (F.col("bkt") + 1).cast("int")))
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("_w")).alias("_dot"))
    )
    scored = labels.join(dots, "doc_id", "left").select(
        "source",
        "y",
        (F.coalesce(F.col("_dot"), F.lit(0)) + F.lit(int(b))).alias("s"),
    )
    pred_pos = F.col("s") >= 0
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).cast("bigint").alias(
            "n_pos"
        ),
        F.sum(F.when((F.col("y") == 1) & pred_pos, 1).otherwise(0))
        .cast("bigint").alias("tp"),
        F.sum(F.when((F.col("y") == -1) & pred_pos, 1).otherwise(0))
        .cast("bigint").alias("fp"),
        F.sum(F.when((F.col("y") == 1) & ~pred_pos, 1).otherwise(0))
        .cast("bigint").alias("fn"),
        F.sum(F.when((F.col("y") == -1) & ~pred_pos, 1).otherwise(0))
        .cast("bigint").alias("tn"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * sum(CASE WHEN (y = 1) = (s >= 0) THEN 1 ELSE 0 END))"
            " div count(1) AS BIGINT)"
        ).alias("accuracy_ppm"),
    )


@query(
    "text_unicode_normalize",
    tags=("text-analysis", "llm-pipeline", "quality-filter"),
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(7 + doc_id % 3 AS BIGINT) AS len_raw,
           CAST(6 + doc_id % 3 AS BIGINT) AS len_nfc,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 7 ELSE 6 END
                + doc_id % 3 AS BIGINT) AS len_nfkc,
           TRUE AS changed_nfc,
           (doc_id % 2 = 0) AS nfkc_differs_from_nfc,
           CASE WHEN doc_id % 2 = 0 THEN 'compat' ELSE 'canonical' END
             AS widest_change
    FROM documents
    """,
)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNICODE NORMALIZATION screening — the canonicalization a
    corpus pipeline runs before ANY dedup or tokenization (the same
    visible text arrives from the web in decomposed, precomposed,
    ligated, and fullwidth spellings; unnormalized corpora leak
    near-duplicates past every exact screen): each document id
    becomes a string with a known normalization profile — a
    combining-acute 'e' + U+0301 that NFC must compose to one
    codepoint, plus (even ids) a COMPATIBILITY character — the
    U+FB01 'fi' ligature — that NFC must PRESERVE and NFKC must
    expand to two codepoints, plus doc_id%3 ASCII padding chars —
    and stdlib unicodedata.normalize produces the NFC/NFKC forms
    inside one Arrow stage.  Codepoint lengths and difference flags
    are fully determined by construction, so the oracle is pure
    arithmetic: a normalizer that skips composition, applies
    compatibility folding under NFC, or double-applies either is a
    value mismatch in the driver run.

    Scale shape: narrow Arrow map over one pruned column, no
    shuffle, no collect — normalization is embarrassingly parallel
    and this is its plumbing; Python is legitimate here because
    Spark has no built-in Unicode normalizer."""
    from typing import Iterator

    import pandas as pd

    def build_norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import unicodedata

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                pad = "x" * (did % 3)
                raw = "caf" + "e" + "́"  # 5 cp, NFC -> 4 cp
                if did % 2 == 0:
                    raw += "ﬁ"  # fi ligature: NFC keeps, NFKC -> 'fi'
                else:
                    raw += "y"
                raw += "z" + pad  # total 7 + did%3 codepoints
                nfc = unicodedata.normalize("NFC", raw)
                nfkc = unicodedata.normalize("NFKC", raw)
                rows.append(
                    (
                        did, len(raw), len(nfc), len(nfkc),
                        nfc != raw, nfkc != nfc,
                        "compat" if nfkc != nfc else "canonical",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "len_raw", "len_nfc", "len_nfkc",
                    "changed_nfc", "nfkc_differs_from_nfc",
                    "widest_change",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        build_norm,
        schema=(
            "doc_id long, len_raw long, len_nfc long, len_nfkc long, "
            "changed_nfc boolean, nfkc_differs_from_nfc boolean, "
            "widest_change string"
        ),
    )
