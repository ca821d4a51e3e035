"""Text-analysis operators over the ``documents`` table.

North-star training-data-pipeline text ops (BASELINE.json): quality
scoring, token counting (whitespace + BPE-ish regex), n-gram language-ID
heuristic, and content fingerprinting. All built-in string/array
expressions — no UDFs, fully codegen'd, trivially parallel at 100 TB (pure
map, no shuffle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e_commerce_click_stream_spark.io import spread, table
from e_commerce_click_stream_spark.operators.textops import (
    STOPWORDS_EN,
    ascii_fold,
    fingerprint,
    lower_folded,
    sql_ascii_fold,
    sql_lower_folded,
    tokens,
)
from e_commerce_click_stream_spark.plans.registry import register

_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
_SW_SPARK = ", ".join(f"'{w}'" for w in STOPWORDS_EN)

_QUALITY_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang, n_chars, text,
           string_split_regex(trim(text), '\\s+') AS t
    FROM documents
)
SELECT doc_id,
       lang,
       length(text) AS text_len,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_unique_tokens,
       round(len(list_distinct(t))::DOUBLE / len(t), 6) AS unique_ratio,
       round(list_sum(list_transform(t, x -> length(x)))::DOUBLE / len(t), 4)
           AS avg_token_len,
       len(list_filter(t, x -> list_contains([{_SW_SQL}], x))) AS stopword_hits,
       round(len(list_filter(t, x -> list_contains([{_SW_SQL}], x)))::DOUBLE
             / len(t), 6) AS stopword_ratio,
       (len(t) >= 5 AND len(list_distinct(t))::DOUBLE / len(t) > 0.3)
           AS passes_quality
FROM toks
"""


@register("doc_quality_scores", oracle=_QUALITY_SQL, headline=True, tags=("text", "quality"))
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token counts, uniqueness ratio, mean
    token length, English stopword ratio, and a boolean quality gate —
    the heuristics a pretraining filter applies before dedup."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", tokens().alias("t")
    )
    n = F.size("t")
    uniq = F.size(F.array_distinct(F.col("t")))
    tok_chars = F.aggregate(
        F.expr("transform(t, x -> length(x))"), F.lit(0), lambda acc, x: acc + x
    )
    sw_hits = F.expr(f"size(filter(t, x -> array_contains(array({_SW_SPARK}), x)))")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("text_len"),
        n.cast("long").alias("n_tokens"),
        uniq.cast("long").alias("n_unique_tokens"),
        F.round(uniq.cast("double") / n, 6).alias("unique_ratio"),
        F.round(tok_chars.cast("double") / n, 4).alias("avg_token_len"),
        sw_hits.cast("long").alias("stopword_hits"),
        F.round(sw_hits.cast("double") / n, 6).alias("stopword_ratio"),
        ((n >= 5) & (uniq.cast("double") / n > 0.3)).alias("passes_quality"),
    )


_TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_\\s]')) AS bpe_ish_tokens,
       cast(ceil(length(text) / 4.0) AS BIGINT) AS chars_div4_estimate
FROM documents
"""


@register("doc_token_counts", oracle=_TOKEN_COUNT_SQL, tags=("text", "tokens"))
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, BPE-ish regex pieces
    (word chunks + isolated punctuation), and the chars/4 estimate."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens()).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]"), F.lit(0))).cast("long").alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("chars_div4_estimate"),
    )


# language-ID heuristic: stopword hit counts per language, argmax with a
# deterministic tie order (en > de > fr > es > unknown)
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "que"),
}


def _hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"len(list_filter(t, x -> list_contains([{words}], x)))"


_LANG_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang, string_split_regex(trim(lower(translate(text, 'İΣ', 'iσ'))), '\\s+') AS t
    FROM documents
),
hits AS (
    SELECT doc_id, lang,
           {_hits_sql("en")} AS en_hits,
           {_hits_sql("de")} AS de_hits,
           {_hits_sql("fr")} AS fr_hits,
           {_hits_sql("es")} AS es_hits
    FROM toks
)
SELECT doc_id, lang AS lang_actual, en_hits, de_hits, fr_hits, es_hits,
       CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0 THEN 'unknown'
            WHEN en_hits >= greatest(de_hits, fr_hits, es_hits) THEN 'en'
            WHEN de_hits >= greatest(fr_hits, es_hits) THEN 'de'
            WHEN fr_hits >= es_hits THEN 'fr'
            ELSE 'es' END AS lang_guess
FROM hits
"""


@register("doc_language_id", oracle=_LANG_SQL, tags=("text", "langid"))
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic with deterministic argmax tie
    order, reported against the dataset's lang column."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        F.split(F.trim(lower_folded(F.col("text"))), r"\s+").alias("t"),
    )
    hit_cols = {}
    for lang, words in _LANG_MARKERS.items():
        arr = ", ".join(f"'{w}'" for w in words)
        hit_cols[lang] = F.expr(f"size(filter(t, x -> array_contains(array({arr}), x)))")
    hits = docs.select(
        "doc_id",
        "lang_actual",
        hit_cols["en"].cast("long").alias("en_hits"),
        hit_cols["de"].cast("long").alias("de_hits"),
        hit_cols["fr"].cast("long").alias("fr_hits"),
        hit_cols["es"].cast("long").alias("es_hits"),
    )
    guess = (
        F.when(F.greatest("en_hits", "de_hits", "fr_hits", "es_hits") == 0, "unknown")
        .when(F.col("en_hits") >= F.greatest("de_hits", "fr_hits", "es_hits"), "en")
        .when(F.col("de_hits") >= F.greatest("fr_hits", "es_hits"), "de")
        .when(F.col("fr_hits") >= F.col("es_hits"), "fr")
        .otherwise("es")
    )
    return hits.withColumn("lang_guess", guess)


_FP_SQL = """
SELECT doc_id,
       md5(lower(translate(regexp_replace(trim(text), '\\s+', ' ', 'g'), 'İΣ', 'iσ'))) AS content_fp,
       substr(md5(lower(translate(regexp_replace(trim(text), '\\s+', ' ', 'g'), 'İΣ', 'iσ'))), 1, 8)
           AS fp_prefix,
       source
FROM documents
"""


@register("doc_fingerprints", oracle=_FP_SQL, tags=("text", "fingerprint"))
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content md5 fingerprint + bucket prefix — the join key
    for cross-corpus exact dedup and provenance tracking."""
    docs = table(spark, sf_dir, "documents")
    fp = fingerprint()
    return docs.select(
        "doc_id",
        fp.alias("content_fp"),
        F.substring(fp, 1, 8).alias("fp_prefix"),
        "source",
    )


_SOURCE_STATS_SQL = """
SELECT source,
       lang,
       count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars,
       round(avg(len(string_split_regex(trim(text), '\\s+'))), 4) AS avg_tokens,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents
GROUP BY source, lang
"""


@register("corpus_source_stats", oracle=_SOURCE_STATS_SQL, tags=("text", "profile"))
def corpus_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile grouped by (source, lang) — the mix report a data
    pipeline emits before/after filtering."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(F.size(tokens())), 4).alias("avg_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


_ARRAY_FN_SQL = """
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
)
SELECT doc_id,
       t[1] AS first_token,
       t[len(t)] AS last_token,
       array_to_string(t[1:3], ' ') AS head3,
       list_sort(list_distinct(t))[1] AS min_token,
       list_contains(t, 'spark') AS has_spark,
       len(list_filter(t, x -> length(x) > 5)) AS long_tokens,
       list_position(t, 'the') AS the_pos
FROM toks
"""


@register("token_array_functions", oracle=_ARRAY_FN_SQL, tags=("array", "scalar"))
def token_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over token arrays: indexing, slicing,
    sort/distinct, membership, lambda filter, position (0 = absent,
    matching DuckDB list_position's NULL→coalesce below)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", tokens().alias("t"))
    return docs.select(
        "doc_id",
        F.element_at("t", 1).alias("first_token"),
        F.element_at("t", -1).alias("last_token"),
        F.array_join(F.slice("t", 1, 3), " ").alias("head3"),
        F.element_at(F.array_sort(F.array_distinct(F.col("t"))), 1).alias("min_token"),
        F.array_contains("t", "spark").alias("has_spark"),
        F.expr("size(filter(t, x -> length(x) > 5))").cast("long").alias("long_tokens"),
        F.array_position("t", "the").cast("long").alias("the_pos"),
    )


_LEVENSHTEIN_SQL = f"""
WITH sample AS (
    SELECT doc_id,
           substr(lower({sql_ascii_fold("trim(text)")}), 1, 40) AS head
    FROM documents WHERE doc_id % 10 = 0
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.head, b.head) AS edit_distance
FROM sample a JOIN sample b ON a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 20
"""


@register("dedup_levenshtein_sample", oracle=_LEVENSHTEIN_SQL, tags=("dedup", "editdist"))
def dedup_levenshtein_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs over bounded prefixes of a
    deterministic sample — the O(n·m) fuzzy-match primitive; at scale it
    runs only on candidate pairs from the LSH stages, never all-pairs.

    The heads are ASCII-folded BEFORE lower(): DuckDB levenshtein()
    counts BYTES where Spark counts CODEPOINTS ('中文字'↔'中国字' = 3 vs 1,
    probed r10), and lower() itself diverges on İ/Σ — a single-byte
    alphabet makes byte and codepoint distances provably identical and
    removes both exposures at once (r10 post-close finding, fixed r11)."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            F.substring(F.lower(ascii_fold(F.trim(F.col("text")))), 1, 40).alias("head"),
        )
    )
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("head").alias("ha"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("head").alias("hb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.levenshtein("ha", "hb").cast("long").alias("edit_distance"))
        .filter(F.col("edit_distance") <= 20)
    )


# ---------------------------------------------------------------------------
# sequence packing: bin documents into fixed token budgets for LLM training

SEQ_TOKEN_BUDGET = 2048

_PACK_SQL = f"""
WITH toks AS (
    SELECT doc_id, source,
           len(string_split_regex(trim(text), '\\s+')) AS n_tok
    FROM documents
),
cum AS (
    SELECT doc_id, source, n_tok,
           sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_tok
    FROM toks
)
SELECT source,
       floor((cum_tok - n_tok) / {SEQ_TOKEN_BUDGET})::BIGINT AS seq_id,
       count(*) AS n_docs,
       sum(n_tok)::BIGINT AS total_tokens,
       round(sum(n_tok) / {SEQ_TOKEN_BUDGET}.0, 4) AS fill_ratio
FROM cum
GROUP BY source, seq_id
"""


@register("doc_pack_sequences", oracle=_PACK_SQL, tags=("text", "packing", "window"))
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing for LLM training: documents are laid out in
    doc_id order within each source shard and assigned to the training
    sequence their cumulative token offset starts in (budget 2048). The
    running sum is windowed PER SOURCE, so at 100 TB each shard packs
    independently in parallel — no global ordering, no single-partition
    window. A document straddling a boundary stays in its starting
    sequence (offset packing), the standard approximation when exact
    first-fit isn't worth a sequential pass."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens()).cast("long").alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = docs.withColumn("cum_tok", F.sum("n_tok").over(w))
    seq_id = F.floor((F.col("cum_tok") - F.col("n_tok")) / SEQ_TOKEN_BUDGET)
    return (
        cum.groupBy("source", seq_id.alias("seq_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.sum("n_tok") / float(SEQ_TOKEN_BUDGET), 4).alias("fill_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style quality heuristics, Rae et al. 2021:
# "Scaling Language Models: ... Gopher", Appendix A quality filters)

_REP_SQL = """
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
grams AS (
    SELECT doc_id, t,
           [t[i] || ' ' || t[i+1] for i in range(1, len(t))] AS g2,
           [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
            for i in range(1, len(t) - 1)] AS g3
    FROM toks
),
stats AS (
    SELECT doc_id,
           len(t) AS n_words,
           list_max(list_transform(list_distinct(t),
                                   x -> len(list_filter(t, y -> y = x))))
               AS top_word_count,
           len(g2) AS n_bigrams,
           len(list_distinct(g2)) AS distinct_bigrams,
           list_max(list_transform(list_distinct(g2),
                                   x -> len(list_filter(g2, y -> y = x))))
               AS top_bigram_count,
           len(g3) AS n_trigrams,
           len(list_distinct(g3)) AS distinct_trigrams
    FROM grams
)
SELECT doc_id,
       n_words,
       round(top_word_count::DOUBLE / n_words, 6) AS top_word_frac,
       CASE WHEN n_bigrams > 0
            THEN round(1.0 - distinct_bigrams::DOUBLE / n_bigrams, 6) END
           AS dup_bigram_frac,
       CASE WHEN n_bigrams > 0
            THEN round(top_bigram_count::DOUBLE / n_bigrams, 6) END
           AS top_bigram_frac,
       CASE WHEN n_trigrams > 0
            THEN round(1.0 - distinct_trigrams::DOUBLE / n_trigrams, 6) END
           AS dup_trigram_frac,
       (round(top_word_count::DOUBLE / n_words, 6) <= 0.2
        AND coalesce(round(1.0 - distinct_trigrams::DOUBLE / n_trigrams, 6), 0.0)
            <= 0.3) AS passes_repetition
FROM stats
"""


@register("doc_repetition_stats", oracle=_REP_SQL, tags=("text", "quality", "repetition"))
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: most-common-word
    fraction, duplicate/top bigram fraction, duplicate trigram fraction,
    and the pass/fail gate (top word <= 20%, dup trigrams <= 30%).

    Entirely higher-order array expressions — a pure map with ZERO
    shuffles at any corpus size. The mode count is O(n·distinct) per
    document, bounded by document length; for book-length documents the
    explode → groupBy(doc_id, gram) → max formulation trades the
    quadratic-per-doc term for two key-local shuffles."""
    docs = table(spark, sf_dir, "documents").select("doc_id", tokens().alias("t"))
    g2 = F.when(
        F.size("t") >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
        ),
    ).otherwise(F.expr("array()"))
    g3 = F.when(
        F.size("t") >= 3,
        F.expr(
            "transform(sequence(1, size(t) - 2),"
            " i -> concat(element_at(t, i), ' ', element_at(t, i + 1),"
            "             ' ', element_at(t, i + 2)))"
        ),
    ).otherwise(F.expr("array()"))
    grams = docs.select("doc_id", "t", g2.alias("g2"), g3.alias("g3"))
    mode_count = lambda col: F.array_max(  # noqa: E731
        F.expr(f"transform(array_distinct({col}), x -> size(filter({col}, y -> y = x)))")
    )
    stats = grams.select(
        "doc_id",
        F.size("t").cast("long").alias("n_words"),
        mode_count("t").alias("top_word_count"),
        F.size("g2").alias("n_bigrams"),
        F.size(F.array_distinct("g2")).alias("distinct_bigrams"),
        mode_count("g2").alias("top_bigram_count"),
        F.size("g3").alias("n_trigrams"),
        F.size(F.array_distinct("g3")).alias("distinct_trigrams"),
    )
    top_word_frac = F.round(F.col("top_word_count").cast("double") / F.col("n_words"), 6)
    dup_bi = F.when(
        F.col("n_bigrams") > 0,
        F.round(1.0 - F.col("distinct_bigrams").cast("double") / F.col("n_bigrams"), 6),
    )
    top_bi = F.when(
        F.col("n_bigrams") > 0,
        F.round(F.col("top_bigram_count").cast("double") / F.col("n_bigrams"), 6),
    )
    dup_tri = F.when(
        F.col("n_trigrams") > 0,
        F.round(1.0 - F.col("distinct_trigrams").cast("double") / F.col("n_trigrams"), 6),
    )
    return stats.select(
        "doc_id",
        "n_words",
        top_word_frac.alias("top_word_frac"),
        dup_bi.alias("dup_bigram_frac"),
        top_bi.alias("top_bigram_frac"),
        dup_tri.alias("dup_trigram_frac"),
        ((top_word_frac <= 0.2) & (F.coalesce(dup_tri, F.lit(0.0)) <= 0.3)).alias(
            "passes_repetition"
        ),
    )


# ---------------------------------------------------------------------------
# PII detection + redaction
#
# The synthetic fixtures contain no PII-shaped strings (verified: zero
# digits or '@' in any document), so the op seeds one deterministic email
# and phone marker per document from doc_id before scrubbing — proving the
# detect → redact → fingerprint path end-to-end with non-degenerate counts.

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\d{3}-\\d{4}"

_PII_SQL = f"""
WITH seeded AS (
    SELECT doc_id,
           text || ' contact user' || doc_id || '@example.com or 555-'
                || lpad(cast(doc_id AS VARCHAR), 4, '0') AS aug
    FROM documents
),
scrub AS (
    SELECT doc_id, aug,
           len(regexp_extract_all(aug, '{_EMAIL_RE}')) AS emails_found,
           len(regexp_extract_all(aug, '{_PHONE_RE}')) AS phones_found,
           regexp_replace(regexp_replace(aug, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM seeded
)
SELECT doc_id, emails_found, phones_found,
       length(aug) - length(redacted) AS chars_removed,
       md5(redacted) AS redacted_fp
FROM scrub
"""


@register("doc_pii_scrub", oracle=_PII_SQL, tags=("text", "pii", "redaction"))
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection and redaction: count and replace email/phone-shaped
    substrings, reporting removed-char counts and an md5 fingerprint of
    the redacted text. Pure regexp column expressions (codegen, zero
    shuffles); the seeded markers exist because the fixtures carry no PII
    (see module comment) — on real corpora the seeding step disappears."""
    docs = table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0"),
    )
    seeded = docs.select("doc_id", aug.alias("aug"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("aug"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return seeded.select(
        "doc_id",
        F.regexp_count(F.col("aug"), F.lit(_EMAIL_RE)).cast("long").alias("emails_found"),
        F.regexp_count(F.col("aug"), F.lit(_PHONE_RE)).cast("long").alias("phones_found"),
        (F.length("aug") - F.length(redacted)).cast("long").alias("chars_removed"),
        F.md5(redacted).alias("redacted_fp"),
    )


# ---------------------------------------------------------------------------
# corpus-wide duplicated-passage fraction (exact-substring dedup signal at
# 8-gram granularity — the distributable core of Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better": instead of a
# suffix array, every rolling 8-gram is fingerprinted and a gram shared by
# >1 document marks its instances as duplicated text)

GRAM_N = 8

_CONTAM_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
grams AS (
    SELECT doc_id,
           unnest([md5(array_to_string(t[i:i + {GRAM_N - 1}], ' '))
                   for i in range(1, len(t) - {GRAM_N - 2})]) AS gh
    FROM toks
),
df AS (
    SELECT gh, count(DISTINCT doc_id) AS gdf FROM grams GROUP BY gh
)
SELECT g.doc_id,
       count(*) AS n_grams,
       sum(CASE WHEN df.gdf > 1 THEN 1 ELSE 0 END)::BIGINT AS shared_grams,
       round(sum(CASE WHEN df.gdf > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
           AS contamination,
       round(sum(CASE WHEN df.gdf > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
           > 0.5 AS mostly_duplicated
FROM grams g JOIN df USING (gh)
GROUP BY g.doc_id
"""


@register("doc_gram_contamination", oracle=_CONTAM_SQL, tags=("text", "dedup", "contamination"))
def doc_gram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-text fraction: the share of a document's
    rolling 8-gram fingerprints that also occur in some OTHER document —
    the gram-granular form of corpus-wide exact-substring dedup (docs
    shorter than 8 tokens emit no grams and no row, on both sides).

    Scale shape: explode to (doc, gram-md5), hash-agg document frequency
    per gram (md5 keys are uniform, partial agg shrinks hot grams
    map-side), join each gram instance to its single df row — fan-out is
    exactly 1, unlike a pair-generating self-join — then re-agg by doc.
    Three key-local shuffles, no pair explosion, at any corpus size.
    ``spread`` pre-splits the single local parquet file so the
    md5-per-gram stage parallelizes (no-op on a cluster where the scan
    arrives pre-split)."""
    docs = spread(table(spark, sf_dir, "documents")).select(
        "doc_id", tokens().alias("t")
    )
    gram_fp = F.when(
        F.size("t") >= GRAM_N,
        F.expr(
            f"transform(sequence(1, size(t) - {GRAM_N - 1}),"
            f" i -> md5(concat_ws(' ', slice(t, i, {GRAM_N}))))"
        ),
    ).otherwise(F.expr("array()"))
    grams = docs.select("doc_id", F.explode(gram_fp).alias("gh"))
    df = grams.groupBy("gh").agg(F.count_distinct("doc_id").alias("gdf"))
    shared = F.sum(F.when(F.col("gdf") > 1, 1).otherwise(0))
    return (
        grams.join(df, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            shared.alias("shared_grams"),
            F.round(shared.cast("double") / F.count("*"), 6).alias("contamination"),
            (F.round(shared.cast("double") / F.count("*"), 6) > 0.5).alias(
                "mostly_duplicated"
            ),
        )
    )


# ---------------------------------------------------------------------------
# vocabulary building + TF-IDF: the term-statistics pair every tokenizer /
# retrieval pipeline computes over a corpus

VOCAB_TOP = 50

_VOCAB_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM documents
),
stats AS (
    SELECT tok, count(*) AS term_freq, count(DISTINCT doc_id) AS doc_freq
    FROM toks GROUP BY tok
),
ranked AS (
    SELECT tok, term_freq, doc_freq,
           row_number() OVER (ORDER BY term_freq DESC, tok) AS vocab_rank,
           round(term_freq::DOUBLE / sum(term_freq) OVER (), 6) AS corpus_frac
    FROM stats
)
SELECT tok, term_freq, doc_freq, vocab_rank, corpus_frac
FROM ranked WHERE vocab_rank <= {VOCAB_TOP}
"""


@register("corpus_vocabulary", oracle=_VOCAB_SQL, tags=("text", "vocabulary"))
def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-style vocabulary build: corpus-wide term frequency,
    document frequency, deterministic rank (count desc, token asc), and
    each term's share of all tokens — truncated to the top VOCAB_TOP.

    Explode → one hash agg on token (md5-uniform enough for natural text;
    partial agg absorbs hot stopwords map-side). The global rank is a
    top-k over VOCABULARY cardinality, not corpus cardinality — vocab
    fits one partition at any corpus size (heaps via
    TakeOrderedAndProject would apply if it didn't)."""
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens()).alias("tok"))
    )
    stats = toks.groupBy("tok").agg(
        F.count("*").alias("term_freq"),
        F.count_distinct("doc_id").alias("doc_freq"),
    )
    total = F.sum("term_freq").over(Window.partitionBy())
    ranked = stats.select(
        "tok",
        "term_freq",
        "doc_freq",
        F.row_number()
        .over(Window.orderBy(F.desc("term_freq"), F.asc("tok")))
        .cast("long")
        .alias("vocab_rank"),
        F.round(F.col("term_freq").cast("double") / total, 6).alias("corpus_frac"),
    )
    return ranked.filter(F.col("vocab_rank") <= VOCAB_TOP)


# ---------------------------------------------------------------------------
# vocabulary-size calibration: token coverage / OOV rate at each candidate
# vocab size — the readout that picks a tokenizer's vocabulary budget
# (coverage saturates; the knee is the budget)

OOV_SIZES = (128, 256, 512, 1024, 2048, 4096, 8192)

_OOV_CURVE_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM documents WHERE text IS NOT NULL
),
stats AS (SELECT tok, count(*) AS term_freq FROM toks GROUP BY tok),
ranked AS (
    SELECT term_freq,
           row_number() OVER (ORDER BY term_freq DESC, tok) AS r,
           sum(term_freq) OVER (ORDER BY term_freq DESC, tok
                                ROWS UNBOUNDED PRECEDING) AS cum,
           sum(term_freq) OVER () AS total,
           count(*) OVER () AS n_types
    FROM stats
)
SELECT s.vocab_size,
       least(s.vocab_size, r.n_types)::BIGINT AS n_types_in_vocab,
       r.cum::BIGINT AS covered_tokens,
       round(r.cum::DOUBLE / r.total, 6) AS coverage_share,
       round(1.0 - r.cum::DOUBLE / r.total, 6) AS oov_rate
FROM (SELECT unnest([{", ".join(str(s) for s in OOV_SIZES)}]) AS vocab_size) s
JOIN ranked r ON r.r = least(s.vocab_size, r.n_types)
"""


@register("vocab_oov_curve", oracle=_OOV_CURVE_SQL, tags=("text", "vocabulary", "calibration"))
def vocab_oov_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token coverage and OOV rate at each candidate vocabulary size: rank
    the full vocabulary by frequency (corpus_vocabulary's order), take the
    running coverage, and read it off at each grid size — what fraction
    of all token OCCURRENCES a top-N vocab explains, and the OOV mass a
    model at that budget eats.

    Scale shape: one md5-uniform token agg (partial absorbs stopwords
    map-side), then every window runs over VOCABULARY cardinality — never
    corpus cardinality — and the grid lookup is an equi-join of a 7-row
    literal against the ranked vocab. Nothing here scales with corpus
    size except the one token agg."""
    toks = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(tokens()).alias("tok"))
    )
    stats = toks.groupBy("tok").agg(F.count("*").alias("term_freq"))
    ord_w = Window.orderBy(F.desc("term_freq"), F.asc("tok"))
    ranked = stats.select(
        "term_freq",
        F.row_number().over(ord_w).alias("r"),
        F.sum("term_freq")
        .over(ord_w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("term_freq").over(Window.partitionBy()).alias("total"),
        F.count("*").over(Window.partitionBy()).alias("n_types"),
    )
    sizes = spark.createDataFrame(
        [(s,) for s in OOV_SIZES], "vocab_size int"
    ).select(F.col("vocab_size").cast("long").alias("vocab_size"))
    return (
        F.broadcast(sizes)
        .join(ranked, F.col("r") == F.least(F.col("vocab_size"), F.col("n_types")))
        .select(
            "vocab_size",
            F.least(F.col("vocab_size"), F.col("n_types"))
            .cast("long")
            .alias("n_types_in_vocab"),
            F.col("cum").cast("long").alias("covered_tokens"),
            F.round(F.col("cum").cast("double") / F.col("total"), 6).alias(
                "coverage_share"
            ),
            F.round(1.0 - F.col("cum").cast("double") / F.col("total"), 6).alias(
                "oov_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# quality-filter calibration: docs/tokens retained at each candidate
# threshold over the uniqueness score — run BEFORE committing a corpus to
# a filter cut (doc_quality_scores emits the per-doc features; this sweeps
# the operating curve)

QUALITY_THRESHOLDS = tuple(round(0.05 * i, 2) for i in range(21))  # 0.00..1.00

_QUALITY_SWEEP_SQL = f"""
WITH scored AS (
    SELECT doc_id,
           string_split_regex(trim(text), '\\s+') AS t
    FROM documents WHERE text IS NOT NULL
),
feat AS (
    SELECT doc_id, len(t) AS n_tokens,
           round(len(list_distinct(t))::DOUBLE / len(t), 6) AS unique_ratio
    FROM scored
),
hist AS (
    SELECT unique_ratio, count(*) AS n_docs, sum(n_tokens) AS n_tokens
    FROM feat GROUP BY unique_ratio
),
tot AS (SELECT sum(n_docs) AS all_docs, sum(n_tokens) AS all_tokens FROM hist)
SELECT g.threshold,
       coalesce(sum(h.n_docs) FILTER (WHERE h.unique_ratio >= g.threshold), 0)::BIGINT
           AS docs_retained,
       round(coalesce(sum(h.n_docs) FILTER (WHERE h.unique_ratio >= g.threshold), 0)::DOUBLE
             / any_value(t.all_docs), 6) AS docs_share,
       coalesce(sum(h.n_tokens) FILTER (WHERE h.unique_ratio >= g.threshold), 0)::BIGINT
           AS tokens_retained,
       round(coalesce(sum(h.n_tokens) FILTER (WHERE h.unique_ratio >= g.threshold), 0)::DOUBLE
             / any_value(t.all_tokens), 6) AS tokens_share
FROM (SELECT unnest([{", ".join(f"{t:.2f}" for t in QUALITY_THRESHOLDS)}])::DOUBLE
          AS threshold) g  -- ::DOUBLE: bare 0.05 literals are DECIMAL(3,2)
CROSS JOIN hist h CROSS JOIN tot t
GROUP BY g.threshold
"""


@register("quality_threshold_sweep", oracle=_QUALITY_SWEEP_SQL,
          tags=("text", "quality", "calibration"))
def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating curve of the uniqueness quality gate: for each candidate
    threshold, how many documents and how many TOKENS survive the cut,
    absolute and as corpus shares — the calibration a pipeline runs
    before hard-coding a filter constant (cutting 2% of docs that carry
    20% of tokens is a different decision than the doc count suggests).

    Scale shape: per-doc scoring is a zero-shuffle array projection; the
    sweep aggregates a SCORE HISTOGRAM (≤ 10^6 + 1 distinct 6-decimal
    ratios, bounded regardless of corpus size), so the threshold grid
    joins against the histogram, never against documents."""
    feat = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", tokens().alias("t"))
        .select(
            F.size("t").alias("n_tokens"),
            F.round(
                F.size(F.array_distinct("t")).cast("double") / F.size("t"), 6
            ).alias("unique_ratio"),
        )
    )
    # grand totals as a window over the bounded histogram — NOT a second
    # aggregation branch, which would re-scan the corpus
    hist = (
        feat.groupBy("unique_ratio")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        .withColumn("all_docs", F.sum("n_docs").over(Window.partitionBy()))
        .withColumn("all_tokens", F.sum("n_tokens").over(Window.partitionBy()))
    )
    grid = spark.createDataFrame(
        [(t,) for t in QUALITY_THRESHOLDS], "threshold double"
    )
    kept = F.col("unique_ratio") >= F.col("threshold")
    return (
        hist.crossJoin(F.broadcast(grid))
        .groupBy("threshold")
        .agg(
            F.coalesce(F.sum(F.when(kept, F.col("n_docs"))), F.lit(0))
            .cast("long")
            .alias("docs_retained"),
            F.round(
                F.coalesce(F.sum(F.when(kept, F.col("n_docs"))), F.lit(0)).cast(
                    "double"
                )
                / F.first("all_docs"),
                6,
            ).alias("docs_share"),
            F.coalesce(F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias("tokens_retained"),
            F.round(
                F.coalesce(F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0)).cast(
                    "double"
                )
                / F.first("all_tokens"),
                6,
            ).alias("tokens_share"),
        )
    )


TFIDF_TOP = 3

_TFIDF_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM documents
),
tf AS (
    SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
),
df AS (
    SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.tok, tf.tf, df.df,
           round(tf.tf * ln(n.n_docs::DOUBLE / df.df), 6) AS tfidf
    FROM tf JOIN df USING (tok) CROSS JOIN n
)
SELECT doc_id, tok, tf, df, tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, tok) AS rk
      FROM scored)
WHERE rk <= {TFIDF_TOP}
"""


@register("tfidf_top_terms", oracle=_TFIDF_SQL, headline=True, tags=("text", "tfidf", "topk"))
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (ties broken by token): term
    frequency per (doc, token), document frequency per token, idf =
    ln(N/df) with N a 1-row broadcast scalar, then a per-doc
    WindowGroupLimit top-k — no global sort, no driver collection.

    Shuffle shape (r15): ONE corpus explode+agg builds tf, materialized
    once; df derives from tf — tf rows are unique per (doc, tok), so a
    plain count per token over tf IS count_distinct(doc_id) without
    either the second corpus pass or countDistinct's Expand + double
    exchange; the tf→df join is an equi-join on token with fan-out
    exactly 1; the final window re-hashes on doc_id only."""
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens()).alias("tok"))
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    # two consumers (df agg + join probe): materialize or the corpus
    # explode+agg replans per branch
    tf = tf.localCheckpoint(eager=True)
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = table(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    )
    return scored.withColumn("rk", rk).filter(F.col("rk") <= TFIDF_TOP).drop("rk")


# ---------------------------------------------------------------------------
# winnowing (Schleimer et al. 2003, MOSS): select the minimum gram hash in
# each sliding window of W consecutive hashes — a guaranteed-coverage
# fingerprint sample ~1/W the size of the full gram set

WINNOW_GRAM = 4
WINNOW_W = 4

_WINNOW_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
grams AS (
    SELECT doc_id,
           [md5(array_to_string(t[i:i + {WINNOW_GRAM - 1}], ' '))
            for i in range(1, len(t) - {WINNOW_GRAM - 2})] AS g
    FROM toks
    WHERE len(t) >= {WINNOW_GRAM}
),
winnowed AS (
    SELECT doc_id, len(g) AS n_grams,
           list_distinct([list_min(g[j:j + {WINNOW_W - 1}])
                          for j in range(1, len(g) - {WINNOW_W - 2})]) AS fps
    FROM grams
    WHERE len(g) >= {WINNOW_W}
)
SELECT doc_id, n_grams,
       len(fps) AS n_fingerprints,
       round(len(fps)::DOUBLE / n_grams, 6) AS density,
       list_min(fps) AS min_fingerprint
FROM winnowed
"""


@register("doc_winnowing_fingerprints", oracle=_WINNOW_SQL, tags=("text", "fingerprint", "winnowing"))
def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing: the minimum md5 gram-hash of every sliding
    window of 4 consecutive 4-gram hashes, deduplicated — guarantees any
    shared run of >= w+gram-1 tokens between two documents shares a
    fingerprint, at ~2/(w+1) the storage of the full gram set. Pure
    higher-order array expressions per document: zero shuffles at any
    corpus size (docs shorter than gram+w-1 tokens emit no row on either
    side)."""
    docs = spread(table(spark, sf_dir, "documents")).select(
        "doc_id", tokens().alias("t")
    )
    g = F.expr(
        f"transform(sequence(1, size(t) - {WINNOW_GRAM - 1}),"
        f" i -> md5(concat_ws(' ', slice(t, i, {WINNOW_GRAM}))))"
    )
    grams = docs.filter(F.size("t") >= WINNOW_GRAM).select(
        "doc_id", g.alias("g")
    )
    fps = F.array_distinct(
        F.expr(
            f"transform(sequence(1, size(g) - {WINNOW_W - 1}),"
            f" j -> array_min(slice(g, j, {WINNOW_W})))"
        )
    )
    winnowed = grams.filter(F.size("g") >= WINNOW_W).select(
        "doc_id", F.size("g").cast("long").alias("n_grams"), fps.alias("fps")
    )
    return winnowed.select(
        "doc_id",
        "n_grams",
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.round(F.size("fps").cast("double") / F.col("n_grams"), 6).alias("density"),
        F.array_min("fps").alias("min_fingerprint"),
    )


# ---------------------------------------------------------------------------
# unigram-LM scoring: per-document average negative log-likelihood under
# the corpus unigram distribution — the cheap stand-in for the KenLM
# perplexity filter a CCNet-style pipeline runs (Wenzek et al. 2020);
# high nll = tokens rare in this corpus = out-of-domain or noise

_UNIGRAM_NLL_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM documents
),
freq AS (
    SELECT tok, count(*) AS tf FROM toks GROUP BY tok
),
total AS (SELECT sum(tf) AS n FROM freq),
scored AS (
    SELECT t.doc_id, -ln(f.tf * 1.0 / tt.n) AS nll
    FROM toks t JOIN freq f ON f.tok = t.tok CROSS JOIN total tt
)
SELECT doc_id,
       count(*) AS n_tokens,
       round(avg(nll), 4) AS mean_nll,
       round(exp(avg(nll)), 4) AS unigram_ppl,
       round(max(nll), 6) AS max_token_nll
FROM scored
GROUP BY doc_id
"""


@register("doc_unigram_nll", oracle=_UNIGRAM_NLL_SQL, tags=("text", "quality", "lm"))
def doc_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean negative log-likelihood (and perplexity) under
    the corpus's own unigram distribution — the distributable core of an
    LM-perplexity quality filter: the model is a frequency table built in
    one hash agg, scoring is an equi-join on token (fan-out exactly 1)
    plus a per-doc aggregate. No trained artifact, no UDF, deterministic
    to 6 decimals."""
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens()).alias("tok"))
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    total = freq.agg(F.sum("tf").alias("n"))
    nll = -F.log(F.col("tf") * 1.0 / F.col("n"))
    scored = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", nll.alias("nll"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        # 4 decimals, not 6: round(avg(<double>), >4) flips its last
        # decimal between engines once groups grow (summation order) —
        # same fix as the bigram twin (ADVICE r6 / VERDICT r7 #4)
        F.round(F.avg("nll"), 4).alias("mean_nll"),
        F.round(F.exp(F.avg("nll")), 4).alias("unigram_ppl"),
        F.round(F.max("nll"), 6).alias("max_token_nll"),
    )


# ---------------------------------------------------------------------------
# training-mix construction: importance sampling + source rebalancing

_QWS_SQL = """
WITH t AS (
    SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
    FROM documents
)
SELECT doc_id, source,
       len(t) AS n_tokens,
       round(len(list_distinct(t))::DOUBLE / len(t), 6) AS keep_weight
FROM t
WHERE CAST(('0x' || substr(md5('qws:' || doc_id::VARCHAR), 1, 8)) AS UBIGINT)
      / 4294967296.0
      < len(list_distinct(t))::DOUBLE / len(t)
"""


@register("quality_weighted_sample", oracle=_QWS_SQL, tags=("sampling", "text", "quality"))
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling for training-mix construction:
    each document is kept with probability equal to its unique-token ratio
    (repetitive docs get down-sampled, diverse docs survive), decided by a
    deterministic md5-derived uniform instead of rand() — reruns and the
    DuckDB oracle see the identical sample. Zero shuffles: per-row
    expressions only, so it composes with any downstream pipeline stage.
    The md5-hex → integer uniform is exact in both engines (32 hex bits
    / 2^32), and the weight is an exact small-int division, so the
    keep/drop comparison is bit-identical cross-engine."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens().alias("t")
    )
    n = F.size("t")
    w = F.size(F.array_distinct(F.col("t"))).cast("double") / n
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("qws:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    return docs.filter(u < w).select(
        "doc_id",
        "source",
        n.cast("long").alias("n_tokens"),
        F.round(w, 6).alias("keep_weight"),
    )


_MIX_SQL = """
WITH s AS (
    SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source
),
tot AS (
    SELECT sum(n_docs)::DOUBLE AS total, count(*)::DOUBLE AS n_sources FROM s
)
SELECT source, n_docs,
       round(n_docs / total, 6) AS share,
       round(1.0 / n_sources, 6) AS target_share,
       round(least(1.0, (total / n_sources) / n_docs), 6) AS sampling_rate,
       CAST(floor(least(n_docs::DOUBLE, total / n_sources)) AS BIGINT)
           AS expected_docs
FROM s, tot
"""


@register("corpus_mix_plan", oracle=_MIX_SQL, tags=("sampling", "governance"))
def corpus_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-rebalancing plan for an equal-share training mix: per source,
    the current share, the equal target share, and the down-sampling rate
    that caps every source at total/n_sources docs (sources under the cap
    keep everything). One groupBy shuffle; the corpus-wide totals ride in
    as a broadcast 1-row aggregate (same shape as parts_above_avg_price),
    so no single-partition window. expected_docs = floor(min(n, target))
    — computed without an n·(target/n) product so there is no float
    roundoff at integer boundaries in either engine."""
    s = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    tot = s.agg(
        F.sum("n_docs").cast("double").alias("total"),
        F.count("*").cast("double").alias("n_sources"),
    )
    target = F.col("total") / F.col("n_sources")
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(F.col("n_docs") / F.col("total"), 6).alias("share"),
        F.round(F.lit(1.0) / F.col("n_sources"), 6).alias("target_share"),
        F.round(F.least(F.lit(1.0), target / F.col("n_docs")), 6).alias("sampling_rate"),
        F.floor(F.least(F.col("n_docs").cast("double"), target)).cast("bigint").alias(
            "expected_docs"
        ),
    )


# ---------------------------------------------------------------------------
# language-ID evaluation: confusion matrix of declared vs detected language

_LANG_CONFUSION_SQL = f"""
WITH ids AS ({_LANG_SQL})
SELECT lang_actual, lang_guess,
       count(*) AS n_docs,
       round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY lang_actual), 6)
           AS row_share
FROM ids
GROUP BY lang_actual, lang_guess
"""


@register("doc_language_confusion", oracle=_LANG_CONFUSION_SQL, tags=("text", "langid", "evaluation"))
def doc_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the dataset's declared language vs the
    marker-word detector (doc_language_id): per (actual, guess) cell,
    document count and row-normalized share — the evaluation a pipeline
    runs before trusting a cheap language filter to route corpus
    partitions. One agg shuffle + a per-row window share on the tiny
    |langs|² grid."""
    ids = doc_language_id(spark, sf_dir).select("lang_actual", "lang_guess")
    counts = ids.groupBy("lang_actual", "lang_guess").agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("lang_actual")
    return counts.select(
        "lang_actual",
        "lang_guess",
        "n_docs",
        F.round(F.col("n_docs") * 1.0 / F.sum("n_docs").over(w), 6).alias("row_share"),
    )


# ---------------------------------------------------------------------------
# passage-level dedup: remove corpus-duplicated passages and REWRITE the
# document — the CCNet/C4 boilerplate-removal step that operates below
# document granularity (doc_gram_contamination only measures; this cleans)

PASSAGE_TOKENS = 10

_PASSAGE_DEDUP_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
chunks AS (
    SELECT doc_id, s.i AS i,
           s.c AS chunk,
           md5(s.c) AS fp
    FROM (
        SELECT doc_id,
               unnest([{{'i': i,
                         'c': array_to_string(
                             t[i * {PASSAGE_TOKENS} + 1 : (i + 1) * {PASSAGE_TOKENS}],
                             ' ')}}
                       for i in range(0, cast(ceil(len(t) / {PASSAGE_TOKENS}.0) AS INT))]) AS s
        FROM toks)
),
df AS (SELECT fp, count(*) AS cnt FROM chunks GROUP BY fp)
SELECT c.doc_id,
       count(*) AS n_passages,
       sum(CASE WHEN df.cnt > 1 THEN 1 ELSE 0 END)::BIGINT AS removed_passages,
       length(coalesce(string_agg(CASE WHEN df.cnt = 1 THEN c.chunk END, ' '
                                  ORDER BY c.i), ''))::BIGINT AS kept_chars,
       md5(coalesce(string_agg(CASE WHEN df.cnt = 1 THEN c.chunk END, ' '
                               ORDER BY c.i), '')) AS cleaned_fp
FROM chunks c JOIN df USING (fp)
GROUP BY c.doc_id
"""


@register(
    "doc_passage_dedup",
    oracle=_PASSAGE_DEDUP_SQL,
    tags=("text", "dedup", "rewrite"),
)
def doc_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup with document REWRITE: split each document
    into consecutive 10-token passages, drop every passage whose md5
    occurs more than once corpus-wide (boilerplate / duplicated spans),
    and reassemble the surviving passages in order. Emits per-doc passage
    counts plus the cleaned text's length and fingerprint — the
    sub-document cleaning step (CCNet paragraph dedup / C4 line dedup)
    that document-level dedup cannot express.

    Scale shape (same discipline as doc_gram_contamination): zero-shuffle
    chunking via a sequence/slice projection, posexplode to
    (doc, idx, passage), hash-agg passage frequency on uniform md5 keys
    (partial agg shrinks hot boilerplate map-side), fan-out-exactly-1
    join back, then one re-agg by doc that rebuilds the text with
    sort_array over (idx, passage) structs — no pair explosion, three
    key-local shuffles at any corpus size."""
    docs = spread(table(spark, sf_dir, "documents")).select(
        "doc_id", tokens().alias("t")
    )
    chunk_arr = F.when(
        F.size("t") >= 1,
        F.expr(
            f"transform(sequence(0, int(ceil(size(t) / {PASSAGE_TOKENS}.0)) - 1),"
            f" i -> concat_ws(' ', slice(t, i * {PASSAGE_TOKENS} + 1, {PASSAGE_TOKENS})))"
        ),
    ).otherwise(F.expr("cast(array() AS array<string>)"))
    chunks = docs.select(
        "doc_id", F.posexplode(chunk_arr).alias("i", "chunk")
    ).withColumn("fp", F.md5("chunk"))
    df = chunks.groupBy("fp").agg(F.count("*").alias("cnt"))
    kept = F.array_sort(
        F.collect_list(
            F.when(F.col("cnt") == 1, F.struct(F.col("i"), F.col("chunk")))
        )
    )
    cleaned = F.concat_ws(" ", F.expr("transform(kept, s -> s.chunk)"))
    return (
        chunks.join(df, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_passages"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("removed_passages"),
            kept.alias("kept"),
        )
        .select(
            "doc_id",
            "n_passages",
            "removed_passages",
            F.length(cleaned).cast("long").alias("kept_chars"),
            F.md5(cleaned).alias("cleaned_fp"),
        )
    )


# ---------------------------------------------------------------------------
# line-level boilerplate scrub: the CCNet cleaning stage BELOW passage
# granularity — drop every line whose normalized text recurs across
# LINE_DF_DOCS or more distinct documents (nav bars, footers, cookie
# banners), plus whitespace-only lines, and REWRITE the document from the
# surviving original lines. doc_passage_dedup cleans repeated 10-token
# spans; this cleans the line-shaped boilerplate that never aligns with
# token-window boundaries.

LINE_DF_DOCS = 2  # a line in >= this many distinct docs is boilerplate

_LINE_SCRUB_NORM = sql_lower_folded(
    "trim(regexp_replace(s.l, '\\s+', ' ', 'g'))"
)

_LINE_SCRUB_SQL = f"""
WITH ls AS (
    SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
),
lines AS (
    SELECT doc_id, s.i AS i, s.l AS line,
           {_LINE_SCRUB_NORM} AS norm
    FROM (SELECT doc_id,
                 unnest([{{'i': i, 'l': ls[i + 1]}}
                         for i in range(0, len(ls))]) AS s
          FROM ls)
),
keyed AS (
    SELECT doc_id, i, line,
           CASE WHEN norm = '' THEN NULL ELSE md5(norm) END AS fp
    FROM lines
),
freq AS (
    SELECT fp, count(DISTINCT doc_id)::BIGINT AS ndocs
    FROM keyed WHERE fp IS NOT NULL GROUP BY fp
)
SELECT k.doc_id,
       count(*)::BIGINT AS n_lines,
       sum(CASE WHEN k.fp IS NULL THEN 1 ELSE 0 END)::BIGINT AS blank_lines,
       sum(CASE WHEN f.ndocs >= {LINE_DF_DOCS} THEN 1 ELSE 0 END)::BIGINT
           AS dropped_lines,
       sum(CASE WHEN k.fp IS NOT NULL AND f.ndocs < {LINE_DF_DOCS}
                THEN 1 ELSE 0 END)::BIGINT AS kept_lines,
       length(coalesce(string_agg(
           CASE WHEN k.fp IS NOT NULL AND f.ndocs < {LINE_DF_DOCS}
                THEN k.line END, chr(10) ORDER BY k.i), ''))::BIGINT
           AS kept_chars,
       md5(coalesce(string_agg(
           CASE WHEN k.fp IS NOT NULL AND f.ndocs < {LINE_DF_DOCS}
                THEN k.line END, chr(10) ORDER BY k.i), '')) AS cleaned_fp
FROM keyed k LEFT JOIN freq f USING (fp)
GROUP BY k.doc_id
"""


@register(
    "doc_line_boilerplate_scrub",
    oracle=_LINE_SCRUB_SQL,
    tags=("text", "dedup", "rewrite", "boilerplate"),
)
def doc_line_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line-level boilerplate removal with document REWRITE:
    split each document on newlines, normalize each line
    (whitespace-collapse + folded lowercase — the matching KEY only; the
    rewrite keeps original line text), drop every line whose normalized
    md5 occurs in >= LINE_DF_DOCS distinct documents plus all
    whitespace-only lines, and reassemble the survivors in order. Emits
    per-doc line counts (total / blank / dropped / kept) and the cleaned
    text's length + fingerprint.

    Scale shape (the doc_passage_dedup discipline at line granularity;
    r15 optimization pass, guide §2.3/§2.4): the exploded+normalized
    line relation is computed ONCE and checkpointed at the size-derived
    level (the r14 plan ran scan + explode + regex-normalize twice,
    once per side of the df join); the df agg runs over uniform md5
    keys as a plain min/max hash agg when LINE_DF_DOCS == 2 (ndocs < 2
    ⟺ min(doc_id) == max(doc_id) — countDistinct's Expand + double
    exchange removed; partial agg still collapses a million-doc footer
    map-side, and fan-out stays exactly 1 join row per line INSTANCE,
    so a hub line never explodes into candidate pairs), one join back,
    one re-agg by doc rebuilding the text via sort_array over
    (idx, line) structs — key-local shuffles at any corpus size, no
    doc×doc joins.

    Cross-engine notes: split keeps trailing empty fields in BOTH engines
    (probed); the normalization key uses the folded lowercase fragment
    (textops.sql_lower_folded) so İ/Σ boilerplate matches identically;
    NULL-text docs have no lines in either engine and drop from the
    output, mirroring doc_passage_dedup."""
    from e_commerce_click_stream_spark.operators.ckptlevel import (
        corpus_checkpoint_level,
        parquet_row_count,
    )

    # parsed-SQL projections/aggregates throughout (the Column chains
    # cost ~250 gateway roundtrips of plan construction per run); regex
    # backslashes doubled for the SQL string-literal unescape
    lines = (
        spread(table(spark, sf_dir, "documents"))
        .select("doc_id", F.posexplode(F.split("text", "\n", -1)).alias("i", "line"))
        .selectExpr(
            "doc_id", "i", "line",
            r"CASE WHEN lower(translate(trim(regexp_replace(line, '\\s+', ' ')),"
            r" 'İΣ', 'iσ')) != '' THEN"
            r" md5(lower(translate(trim(regexp_replace(line, '\\s+', ' ')),"
            r" 'İΣ', 'iσ'))) END AS fp",
        )
        .localCheckpoint(
            eager=True,
            storageLevel=corpus_checkpoint_level(
                spark, parquet_row_count(sf_dir, "documents") * 8192
            ),
        )
    )
    if LINE_DF_DOCS == 2:
        # min/max ≡ countDistinct REQUIRES doc_id non-null (min/max skip
        # NULLs where countDistinct counts rows): doc_id is the corpus
        # primary key, non-null at every scale factor — pinned by
        # tests/test_round16_ops.py::test_doc_id_nonnull_invariant
        freq = (
            lines.filter(F.col("fp").isNotNull())
            .groupBy("fp")
            .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        )
        boiler_sql = "_mn != _mx"  # ndocs >= 2
    else:  # pragma: no cover - general threshold fallback
        freq = (
            lines.filter(F.col("fp").isNotNull())
            .groupBy("fp")
            .agg(F.countDistinct("doc_id").alias("ndocs"))
        )
        boiler_sql = f"ndocs >= {LINE_DF_DOCS}"
    keep_sql = f"(fp IS NOT NULL AND NOT ({boiler_sql}))"
    cleaned_sql = r"concat_ws('\n', transform(kept, s -> s.line))"
    return (
        lines.join(freq, "fp", "left")
        .groupBy("doc_id")
        .agg(
            F.expr("count(*) AS n_lines"),
            F.expr("sum(CAST(fp IS NULL AS BIGINT)) AS blank_lines"),
            # NULL-safe: an all-blank doc misses the freq join on every
            # line and Spark's sum(all-NULL) is NULL where the oracle's
            # CASE sums 0
            F.expr(
                f"sum(coalesce(CAST({boiler_sql} AS BIGINT), 0))"
                " AS dropped_lines"
            ),
            F.expr(f"sum(CAST({keep_sql} AS BIGINT)) AS kept_lines"),
            F.expr(
                f"array_sort(collect_list(CASE WHEN {keep_sql}"
                " THEN struct(i, line) END)) AS kept"
            ),
        )
        .selectExpr(
            "doc_id",
            "n_lines",
            "blank_lines",
            "dropped_lines",
            "kept_lines",
            f"CAST(length({cleaned_sql}) AS BIGINT) AS kept_chars",
            f"md5({cleaned_sql}) AS cleaned_fp",
        )
    )


# ---------------------------------------------------------------------------
# exact substring-span dedup (the Lee et al. 2022 "ExactSubstr" class):
# find maximal runs of tokens whose every SPAN_GRAM-token window repeats
# verbatim elsewhere in the corpus, then REWRITE documents with those runs
# removed. doc_winnowing_fingerprints detects shared content; this one
# locates the exact repeated spans and cleans them. The suffix-array
# formulation of the paper is replaced by a distributed anchor-coverage
# one: a repeated span of length m >= K has all of its m-K+1 K-gram
# anchors duplicated, so the span set equals the interval-merge of the
# duplicated anchors — no suffix array, no doc×doc pairs. Because every
# anchor occurrence joins only its OWN hash row (fan-out exactly 1), a
# boilerplate "hub" span shared by a million documents costs one counter
# bump per occurrence, never a candidate explosion — the bounded-anchor
# property holds by construction rather than by a cap.

SPAN_GRAM = 8  # tokens per anchor; a repeated run must be >= this long

# Merged intervals of duplicated K-gram anchor starts. All intervals have
# the same length K, so anchor starts sorted per doc merge exactly when
# the gap to the previous start is < K (the sessionize gaps-and-islands
# shape) — prev_end is monotone, no running max needed.
_SPAN_ISLANDS_CTE = f"""
toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
    FROM documents WHERE text IS NOT NULL
),
grams AS (
    SELECT doc_id, s.p AS pos, s.fp AS fp
    FROM (
        SELECT doc_id,
               unnest([{{'p': i,
                         'fp': md5(array_to_string(t[i:i + {SPAN_GRAM - 1}], ' '))}}
                       for i in range(1, len(t) - {SPAN_GRAM - 2})]) AS s
        FROM toks WHERE len(t) >= {SPAN_GRAM})
),
dup AS (SELECT fp FROM grams GROUP BY fp HAVING count(*) > 1),
dstarts AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (fp)),
islands AS (
    SELECT doc_id, pos,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS island
    FROM (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         < {SPAN_GRAM} THEN 0 ELSE 1 END AS brk
        FROM dstarts)
),
spans AS (
    SELECT doc_id, island,
           min(pos)::BIGINT AS span_start,
           (max(pos) + {SPAN_GRAM - 1})::BIGINT AS span_end,
           count(*)::BIGINT AS n_anchors
    FROM islands GROUP BY doc_id, island
)
"""

_SUBSTRING_SPANS_SQL = f"""
WITH {_SPAN_ISLANDS_CTE}
SELECT s.doc_id, s.span_start, s.span_end,
       (s.span_end - s.span_start + 1)::BIGINT AS span_tokens,
       s.n_anchors,
       md5(array_to_string(t[s.span_start:s.span_end], ' ')) AS span_fp
FROM spans s JOIN toks USING (doc_id)
"""

_SUBSTRING_REWRITE_SQL = f"""
WITH {_SPAN_ISLANDS_CTE},
per_doc AS (
    SELECT doc_id, count(*)::BIGINT AS n_spans,
           sum(span_end - span_start + 1)::BIGINT AS dup_tokens,
           list({{'s': span_start, 'e': span_end}}) AS ivs
    FROM spans GROUP BY doc_id
),
rewritten AS (
    SELECT tk.doc_id,
           len(tk.t)::BIGINT AS n_tokens,
           coalesce(p.n_spans, 0)::BIGINT AS n_spans,
           coalesce(p.dup_tokens, 0)::BIGINT AS dup_tokens,
           coalesce(array_to_string(
               [tk.t[j] for j in range(1, len(tk.t) + 1)
                if len(list_filter(coalesce(p.ivs, []),
                                   iv -> iv.s <= j AND j <= iv.e)) = 0],
               ' '), '') AS cleaned  -- fully-covered doc: empty, not NULL
               -- (array_to_string([]) is NULL in DuckDB, '' in concat_ws)
    FROM toks tk LEFT JOIN per_doc p USING (doc_id)
)
SELECT doc_id, n_tokens, dup_tokens, n_spans,
       length(cleaned)::BIGINT AS kept_chars,
       md5(cleaned) AS cleaned_fp
FROM rewritten
"""


def _dup_anchor_spans(spark: SparkSession, sf_dir: str):
    """(tokenized docs, merged duplicated-anchor spans) shared by the
    substring-dedup queries. The tokenized relation feeds BOTH the
    anchor/island branch and each query's final span-text / rewrite
    join, so it is materialized once (the sign_docs convention) — the
    corpus is scanned and split-tokenized exactly once per query."""
    docs = (
        spread(table(spark, sf_dir, "documents"))
        .filter(F.col("text").isNotNull())
        .select("doc_id", tokens().alias("t"))
        .localCheckpoint(eager=True)
    )
    gram = F.expr(
        f"transform(sequence(1, size(t) - {SPAN_GRAM - 1}),"
        f" i -> struct(i AS p, md5(concat_ws(' ', slice(t, i, {SPAN_GRAM}))) AS fp))"
    )
    grams = (
        docs.filter(F.size("t") >= SPAN_GRAM)
        .select("doc_id", F.explode(gram).alias("g"))
        .selectExpr("doc_id", "g.p AS pos", "g.fp AS fp")
    )
    dup = grams.groupBy("fp").agg(F.expr("count(*) AS cnt")).filter("cnt > 1")
    dstarts = grams.join(dup.select("fp"), "fp").select("doc_id", "pos")
    # parsed-SQL window pair (the Column chains cost ~130 gateway
    # roundtrips of plan construction per call, x2 substring queries)
    spans = (
        dstarts.selectExpr(
            "doc_id", "pos",
            "CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)"
            f" < {SPAN_GRAM} THEN 0 ELSE 1 END AS brk",
        )
        .selectExpr(
            "doc_id", "pos",
            "sum(brk) OVER (PARTITION BY doc_id ORDER BY pos"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island",
        )
        .groupBy("doc_id", "island")
        .agg(
            F.expr("CAST(min(pos) AS BIGINT) AS span_start"),
            F.expr(f"CAST(max(pos) + {SPAN_GRAM - 1} AS BIGINT) AS span_end"),
            F.expr("count(*) AS n_anchors"),
        )
    )
    return docs, spans


@register("dedup_exact_substring_spans", oracle=_SUBSTRING_SPANS_SQL,
          tags=("text", "dedup", "substring", "spans"))
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locate every maximal corpus-repeated token span (>= SPAN_GRAM
    tokens): per span its doc, token range, anchor count, and the md5 of
    the exact repeated text. Overlapping repeats chain into ONE span via
    the interval merge (two anchors < K apart cannot break the run).

    Scale shape: |tokens| anchor rows, one md5-uniform hash agg for the
    duplicate test, one fan-out-1 join back, one doc-keyed window + agg —
    every shuffle is key-local, nothing is quadratic in docs sharing a
    span (reference has no sub-document operator; this extends
    doc_winnowing_fingerprints per SURVEY §2 LLM-pipeline scope)."""
    docs, spans = _dup_anchor_spans(spark, sf_dir)
    return spans.join(docs, "doc_id").selectExpr(
        "doc_id",
        "span_start",
        "span_end",
        "span_end - span_start + 1 AS span_tokens",
        "n_anchors",
        "md5(concat_ws(' ', slice(t, int(span_start),"
        " int(span_end - span_start + 1)))) AS span_fp",
    )


@register("doc_exact_substring_rewrite", oracle=_SUBSTRING_REWRITE_SQL,
          headline=True, tags=("text", "dedup", "substring", "rewrite"))
def doc_exact_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-redacted rewrite (same rewrite shape as ``doc_passage_dedup``):
    drop every token inside a corpus-repeated span and reassemble the
    survivors in order — the ExactSubstr cleaning step, hash-gated
    byte-for-byte via the cleaned text's fingerprint. Docs with no
    repeated span pass through verbatim (modulo whitespace
    normalization, as everywhere in this family).

    Scale shape: the span list per doc is collected AFTER interval
    merging (bounded by doc length / K, not by corpus size), and the
    rewrite is a zero-shuffle array projection per doc against its own
    merged spans."""
    docs, spans = _dup_anchor_spans(spark, sf_dir)
    per_doc = spans.groupBy("doc_id").agg(
        F.expr("count(*) AS n_spans"),
        F.expr("sum(span_end - span_start + 1) AS dup_tokens"),
        F.expr("collect_list(struct(span_start, span_end)) AS ivs"),
    )
    covered = (
        "filter(transform(t, (x, j) -> struct(x AS tok, j + 1 AS p)),"
        " s -> NOT exists(ivs_c, iv -> iv.span_start <= s.p AND s.p <= iv.span_end))"
    )
    return (
        docs.join(per_doc, "doc_id", "left")
        .selectExpr(
            "*",
            "coalesce(ivs, cast(array() AS"
            " array<struct<span_start:bigint,span_end:bigint>>)) AS ivs_c",
        )
        .selectExpr(
            "doc_id",
            "CAST(size(t) AS BIGINT) AS n_tokens",
            "CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens",
            "CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans",
            f"concat_ws(' ', transform({covered}, s -> s.tok)) AS cleaned",
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "dup_tokens",
            "n_spans",
            "CAST(length(cleaned) AS BIGINT) AS kept_chars",
            "md5(cleaned) AS cleaned_fp",
        )
    )


_SPAN_CLUSTERS_SQL = f"""
WITH {_SPAN_ISLANDS_CTE},
sp AS (
    SELECT s.doc_id,
           (s.span_end - s.span_start + 1)::BIGINT AS span_tokens,
           md5(array_to_string(t[s.span_start:s.span_end], ' ')) AS span_fp
    FROM spans s JOIN toks USING (doc_id)
)
SELECT span_fp,
       any_value(span_tokens) AS span_tokens,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_occurrences,
       (any_value(span_tokens) * count(*))::BIGINT AS dup_tokens_total
FROM sp GROUP BY span_fp
"""


@register("substring_span_clusters", oracle=_SPAN_CLUSTERS_SQL,
          tags=("text", "dedup", "substring", "governance"))
def substring_span_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster the maximal repeated spans by exact content — the
    boilerplate leaderboard: for each distinct span text, how many docs
    carry it, how many times it occurs, and the total token mass it
    duplicates. The governance readout that tells a pipeline WHAT the
    repeated content is (header/footer/license block) before
    doc_exact_substring_rewrite strips it. Spans whose merged extent is
    unique at full length still appear with n_occurrences = 1 (partial
    overlaps — the anchors repeat, the maximal extent doesn't; identical
    text always yields identical span_tokens, so any_value is exact).

    Scale shape: the span relation is bounded by corpus tokens / K; the
    cluster agg keys on md5(span text) — uniform, partial+final."""
    docs, spans = _dup_anchor_spans(spark, sf_dir)
    span_text = F.expr(
        "concat_ws(' ', slice(t, int(span_start), int(span_end - span_start + 1)))"
    )
    sp = spans.join(docs, "doc_id").select(
        "doc_id",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        F.md5(span_text).alias("span_fp"),
    )
    return sp.groupBy("span_fp").agg(
        F.any_value("span_tokens").alias("span_tokens"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_occurrences"),
        (F.any_value("span_tokens") * F.count("*")).alias("dup_tokens_total"),
    )


# ---------------------------------------------------------------------------
# feature hashing (hashing-trick TF vectors): fixed-width featurization with
# NO vocabulary pass — the streaming-friendly alternative to tfidf_top_terms

HASH_DIM = 32

# portable token bucket: two md5 hex chars -> int, identical in both engines
# multiplier must be coprime to HASH_DIM or the first char is dead:
# 256 % 32 == 0 would reduce the bucket to the second char alone,
# leaving only the 16 residues ascii hex chars can reach
_BUCKET_DUCK = f"(ascii(substr(md5(x), 1, 1)) * 101 + ascii(substr(md5(x), 2, 1))) % {HASH_DIM}"

_HASHED_TF_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           list_transform(string_split_regex(trim(text), '\\s+'),
                          x -> {_BUCKET_DUCK}) AS tb
    FROM documents
),
vec AS (
    SELECT doc_id,
           len(tb) AS n_tokens,
           list_transform(range(0, {HASH_DIM}),
                          b -> len(list_filter(tb, v -> v = b))) AS tfl
    FROM toks
)
SELECT doc_id,
       n_tokens,
       CASE WHEN n_tokens IS NULL THEN NULL
            ELSE array_to_string(list_transform(tfl, c -> c::VARCHAR), ',')
       END AS tf,
       len(list_filter(tfl, c -> c > 0)) AS nnz,
       round(sqrt(list_sum(list_transform(tfl, c -> (c * c)::DOUBLE))), 6) AS l2_norm
FROM vec
"""


@register("doc_hashed_tf_vectors", oracle=_HASHED_TF_SQL, tags=("text", "features", "hashing"))
def doc_hashed_tf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick term-frequency vectors: every token is bucketed by a
    portable md5-derived hash into a fixed HASH_DIM(=32)-wide vector — the
    vocabulary-free featurization (sklearn HashingVectorizer / Vowpal
    Wabbit) that needs no corpus-wide fit pass, so it runs identically
    over a stream, a new shard, or 100 TB without coordinating a
    dictionary. Emits the TF vector plus its sparsity and L2 norm.

    Scale shape: pure per-row projection — tokens are bucketed once
    (one md5 per token), the vector is a zero-shuffle higher-order
    fold; no join, no agg, no vocabulary broadcast.

    The tf vector is emitted as a comma-joined string, not a raw
    array: the driver's pandas-based value hasher cannot hash list
    cells (registry contract — no array/map/struct in output
    schemas; see tests/test_oracle_types.py)."""
    def _bucket(x):  # same formula as _BUCKET_DUCK, via the shared tokenizer
        h = F.md5(x)
        return (F.ascii(F.substring(h, 1, 1)) * 101 + F.ascii(F.substring(h, 2, 1))) % HASH_DIM

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.transform(tokens(), _bucket).alias("tb")
    )
    tf = F.expr(
        f"transform(sequence(0, {HASH_DIM - 1}),"
        " b -> cast(size(filter(tb, v -> v = b)) AS bigint))"
    )
    docs = docs.select("doc_id", F.size("tb").cast("long").alias("n_tokens"), tf.alias("tfl"))
    return docs.select(
        "doc_id",
        "n_tokens",
        # NULL-text rows carry a NULL vector on both engines: Spark's
        # array_join would render the all-NULL fold as '' while DuckDB
        # yields NULL — gate on n_tokens so the engines agree
        F.when(
            F.col("n_tokens").isNotNull(),
            F.array_join(F.transform(F.col("tfl"), lambda c: c.cast("string")), ","),
        ).alias("tf"),
        F.expr("cast(size(filter(tfl, c -> c > 0)) AS bigint)").alias("nnz"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("tfl"), lambda c: (c * c).cast("double")),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ),
            6,
        ).alias("l2_norm"),
    )


# ---------------------------------------------------------------------------
# BPE merge statistics: the pair-frequency count at the heart of tokenizer
# training — one merge iteration of byte-pair encoding, corpus-wide

BPE_TOP = 20

_BPE_SQL = f"""
WITH words AS (
    SELECT w, count(*) AS wc
    FROM (SELECT unnest(string_split_regex(trim(lower(translate(text, 'İΣ', 'iσ'))), '\\s+')) AS w
          FROM documents)
    WHERE length(w) >= 2
    GROUP BY w
),
pairs AS (
    SELECT p.a AS left_sym, p.b AS right_sym, wc
    FROM (SELECT wc,
                 unnest([{{'a': w[i:i], 'b': w[i+1:i+1]}}
                         for i in range(1, length(w))]) AS p
          FROM words)
),
counts AS (
    SELECT left_sym, right_sym, sum(wc)::BIGINT AS pair_count
    FROM pairs GROUP BY left_sym, right_sym
),
ranked AS (
    SELECT *, row_number() OVER (ORDER BY pair_count DESC, left_sym, right_sym)
               AS merge_rank
    FROM counts
)
SELECT merge_rank, left_sym, right_sym,
       left_sym || right_sym AS merged, pair_count
FROM ranked WHERE merge_rank <= {BPE_TOP}
"""


@register("bpe_merge_pairs", oracle=_BPE_SQL, tags=("text", "tokenizer", "bpe"))
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One byte-pair-encoding merge iteration over the corpus: count every
    adjacent character pair weighted by word frequency and rank the top
    candidates — the statistic a BPE tokenizer trainer recomputes per
    merge. Deterministic tiebreak (count desc, then pair) so the chosen
    merge is reproducible across runs and engines.

    Scale shape: the word-frequency agg collapses the corpus to its
    vocabulary BEFORE pair explosion (partial agg absorbs Zipf-hot words
    map-side), so pairs explode over |vocab| rows, not |corpus| tokens;
    then one pair agg and a top-K via a single-partition window over the
    ≤ |alphabet|² pair grid (tiny by construction — this is the one
    place a 1-partition sort is legitimate)."""
    words = (
        spread(table(spark, sf_dir, "documents"))
        .select(F.explode(F.split(F.trim(lower_folded(F.col("text"))), r"\s+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    pairs = words.select(
        "wc",
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))"
            )
        ).alias("p"),
    )
    counts = pairs.groupBy(
        F.col("p.a").alias("left_sym"), F.col("p.b").alias("right_sym")
    ).agg(F.sum("wc").alias("pair_count"))
    w = Window.orderBy(F.desc("pair_count"), "left_sym", "right_sym")
    return (
        counts.withColumn("merge_rank", F.row_number().over(w))
        .filter(F.col("merge_rank") <= BPE_TOP)
        .select(
            "merge_rank",
            "left_sym",
            "right_sym",
            F.concat("left_sym", "right_sym").alias("merged"),
            "pair_count",
        )
    )


# ---------------------------------------------------------------------------
# length-percentile gate: fit corpus-level clipping bounds, then filter —
# exact quantiles computed scale-safely over the DISCRETE token-count domain

LEN_P_LO = 0.05
LEN_P_HI = 0.95

_LEN_FILTER_SQL = f"""
WITH lens AS (
    -- coalesce: a NULL text must enter the histogram as length 0, not as
    -- a NULL group — Spark windows order NULLS FIRST, DuckDB NULLS LAST,
    -- so a NULL length group would land at opposite ends of the
    -- cumulative walk and shift the percentile bounds between engines
    SELECT doc_id, source,
           coalesce(len(string_split_regex(trim(text), '\\s+')), 0) AS n_tokens
    FROM documents
),
hist AS (SELECT n_tokens, count(*) AS n FROM lens GROUP BY n_tokens),
cum AS (
    SELECT n_tokens,
           sum(n) OVER (ORDER BY n_tokens) AS cum_n,
           sum(n) OVER () AS total
    FROM hist
),
bounds AS (
    SELECT min(CASE WHEN cum_n >= {LEN_P_LO} * total THEN n_tokens END) AS lo,
           min(CASE WHEN cum_n >= {LEN_P_HI} * total THEN n_tokens END) AS hi
    FROM cum
)
SELECT source,
       count(*) AS n_docs,
       sum(CASE WHEN n_tokens BETWEEN lo AND hi THEN 1 ELSE 0 END)::BIGINT AS kept,
       sum(CASE WHEN n_tokens < lo THEN 1 ELSE 0 END)::BIGINT AS too_short,
       sum(CASE WHEN n_tokens > hi THEN 1 ELSE 0 END)::BIGINT AS too_long,
       min(lo)::BIGINT AS p05_tokens,
       min(hi)::BIGINT AS p95_tokens
FROM lens, bounds
GROUP BY source
"""


@register("doc_length_percentile_filter", oracle=_LEN_FILTER_SQL, tags=("text", "quality", "quantile"))
def doc_length_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length gate: fit exact p05/p95 token-count bounds, then
    report per-source how many documents the filter keeps / drops on each
    side — the fit-then-filter pattern (length clipping) every
    pretraining corpus pass applies.

    Scale shape: the usual exact-percentile blocker (a global sort, or
    Spark's percentile agg collecting every value on one reducer) is
    sidestepped because token counts live in a small DISCRETE domain —
    the corpus collapses to a length HISTOGRAM first (one associative
    agg), the cumulative walk runs over the tiny grid in a
    single-partition window, and the two bounds ride back over the
    corpus as a 1-row broadcast. Exact quantiles, no global sort, at any
    corpus size."""
    lens = table(spark, sf_dir, "documents").select(
        "source",
        F.coalesce(F.size(tokens()), F.lit(0)).cast("long").alias("n_tokens"),
    )
    hist = lens.groupBy("n_tokens").agg(F.count("*").alias("n"))
    w_cum = Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = hist.select(
        "n_tokens",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("n").over(w_all).alias("total"),
    )
    bounds = cum.agg(
        F.min(F.when(F.col("cum_n") >= LEN_P_LO * F.col("total"), F.col("n_tokens"))).alias("lo"),
        F.min(F.when(F.col("cum_n") >= LEN_P_HI * F.col("total"), F.col("n_tokens"))).alias("hi"),
    )
    t = F.col("n_tokens")
    return (
        lens.join(F.broadcast(bounds))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(t.between(F.col("lo"), F.col("hi")), 1).otherwise(0)).alias("kept"),
            F.sum(F.when(t < F.col("lo"), 1).otherwise(0)).alias("too_short"),
            F.sum(F.when(t > F.col("hi"), 1).otherwise(0)).alias("too_long"),
            F.min("lo").alias("p05_tokens"),
            F.min("hi").alias("p95_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# bigram-LM scoring: the step up from doc_unigram_nll toward the KenLM
# perplexity filter (CCNet, Wenzek et al. 2020) — interpolated bigram
# conditional probabilities, still trained and applied wholly in-engine

BIGRAM_LAMBDA = 0.9  # weight on the bigram MLE; 1-λ backs off to unigram

_BIGRAM_NLL_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
uni AS (
    SELECT tok, count(*) AS tf
    FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
),
total AS (SELECT sum(tf)::DOUBLE AS n FROM uni),
bigrams AS (
    SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS big
    FROM toks WHERE len(t) >= 2
),
freq2 AS (
    SELECT big, count(*) AS c12 FROM bigrams GROUP BY big
),
marg AS (
    SELECT split_part(big, ' ', 1) AS w1, sum(c12) AS c1 FROM freq2 GROUP BY 1
),
probs AS (
    SELECT f.big, f.c12, m.c1
    FROM freq2 f JOIN marg m ON m.w1 = split_part(f.big, ' ', 1)
),
scored AS (
    SELECT b.doc_id,
           -ln({BIGRAM_LAMBDA} * (p.c12 * 1.0 / p.c1)
               + {1.0 - BIGRAM_LAMBDA} * (u.tf / tt.n)) AS nll
    FROM bigrams b
    JOIN probs p ON p.big = b.big
    JOIN uni u ON u.tok = split_part(b.big, ' ', 2)
    CROSS JOIN total tt
)
SELECT doc_id,
       count(*) AS n_bigrams,
       round(avg(nll), 4) AS mean_nll,
       round(exp(avg(nll)), 2) AS bigram_ppl,
       round(max(nll), 6) AS max_bigram_nll
FROM scored
GROUP BY doc_id
"""


@register("doc_bigram_nll", oracle=_BIGRAM_NLL_SQL, tags=("text", "quality", "lm"))
def doc_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under an interpolated bigram LM trained on
    the corpus itself: P(w2|w1) = λ·C(w1w2)/C(w1·) + (1−λ)·C(w2)/N. The
    whole filter — train + score — is three hash aggs and three equi-joins
    (bigram table, first-token marginal, unigram backoff), each fan-out
    exactly 1, so it distributes like any other join chain: no model
    artifact leaves the engine, no UDF runs. Tokens never contain
    whitespace (they come from a \\s+ split), so the 'w1 w2' composite
    key splits back losslessly on the single space."""
    toks = table(spark, sf_dir, "documents").select("doc_id", tokens().alias("t"))
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("tf"))
    )
    total = uni.agg(F.sum("tf").cast("double").alias("n"))
    bigrams = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(t) - 1), i -> concat_ws(' ', slice(t, i, 2)))")
        ).alias("big"),
    )
    freq2 = bigrams.groupBy("big").agg(F.count("*").alias("c12"))
    w1 = F.split(F.col("big"), " ").getItem(0)
    marg = freq2.groupBy(w1.alias("w1")).agg(F.sum("c12").alias("c1"))
    probs = freq2.withColumn("w1", w1).join(marg, "w1").select("big", "c12", "c1")
    p = (
        F.lit(BIGRAM_LAMBDA) * (F.col("c12") * 1.0 / F.col("c1"))
        + F.lit(1.0 - BIGRAM_LAMBDA) * (F.col("tf") / F.col("n"))
    )
    scored = (
        bigrams.join(probs, "big")
        .withColumn("tok", F.split(F.col("big"), " ").getItem(1))
        .join(uni, "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", (-F.log(p)).alias("nll"))
    )
    # avg(nll) sums irrational doubles, so its low decimals depend on
    # summation order (registry contract): the avg-derived gate columns round
    # to 4/2 decimals — the float64 accumulation error (~1e-12 at thousands
    # of bigrams/doc) is then ~7 orders below the rounding boundary. max(nll)
    # is order-independent (each nll is computed identically per row), so it
    # keeps 6 decimals.
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("nll"), 4).alias("mean_nll"),
        F.round(F.exp(F.avg("nll")), 2).alias("bigram_ppl"),
        F.round(F.max("nll"), 6).alias("max_bigram_nll"),
    )


# ---------------------------------------------------------------------------
# Kneser-Ney bigram scoring (r12): the smoothing KenLM actually ships —
# the model behind the CCNet perplexity filter (Wenzek et al. 2020) that
# doc_bigram_nll approximates with fixed-λ interpolation. Absolute
# discounting moves mass from observed bigrams to a CONTINUATION
# distribution (how many distinct contexts a word follows, not how often
# it occurs), which is what separates KN from every count-interpolation
# scheme. Trained and applied wholly in-engine:
#
#   P_KN(w2|w1) = (C(w1w2) − D)/C(w1·) + D·N1+(w1·)/C(w1·) · N1+(·w2)/N1+(··)
#
# with discount D = 0.75 (the textbook fixed-discount variant; KenLM's
# modified KN fits D per count bucket — a constant-swap away, not a
# shape change). Scoring the training corpus itself means every scored
# bigram has C ≥ 1, so max(C−D, 0) never clips. All four statistics —
# bigram counts, left-context totals, forward/backward continuation type
# counts, and the global type total — fold out of ONE bigram count table
# (three key-local aggs + a 1-row broadcast), never a second corpus scan.

KN_DISCOUNT = 0.75

_KN_BIGRAM_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
bigrams AS (
    SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS big
    FROM toks WHERE len(t) >= 2
),
freq2 AS (
    SELECT big, count(*) AS c12 FROM bigrams GROUP BY big
),
fwd AS (
    SELECT split_part(big, ' ', 1) AS w1, sum(c12) AS c1, count(*) AS n1f
    FROM freq2 GROUP BY 1
),
bwd AS (
    SELECT split_part(big, ' ', 2) AS w2, count(*) AS n1b
    FROM freq2 GROUP BY 1
),
types AS (SELECT count(*)::DOUBLE AS tt FROM freq2),
probs AS (
    SELECT f.big,
           ((f.c12 - {KN_DISCOUNT}) / m.c1
            + {KN_DISCOUNT} * m.n1f / m.c1 * (b.n1b / t.tt)) AS p
    FROM freq2 f
    JOIN fwd m ON m.w1 = split_part(f.big, ' ', 1)
    JOIN bwd b ON b.w2 = split_part(f.big, ' ', 2)
    CROSS JOIN types t
),
scored AS (
    SELECT bg.doc_id, -ln(p.p) AS nll
    FROM bigrams bg JOIN probs p ON p.big = bg.big
)
SELECT doc_id,
       count(*) AS n_bigrams,
       round(avg(nll), 4) AS mean_nll,
       round(exp(avg(nll)), 2) AS kn_ppl,
       round(max(nll), 6) AS max_kn_nll
FROM scored
GROUP BY doc_id
"""


@register("doc_kn_bigram_nll", oracle=_KN_BIGRAM_SQL, tags=("text", "quality", "lm"))
def doc_kn_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under an interpolated Kneser-Ney bigram
    LM trained on the corpus itself — the KenLM-style CCNet quality
    filter with its real smoothing (absolute discounting + continuation
    backoff), where doc_bigram_nll uses fixed-λ count interpolation.

    Scale shape: identical to doc_bigram_nll's — the corpus explodes to
    bigram instances ONCE (checkpointed; it feeds both the count table
    and the scoring join), the model is three hash aggs folded out of
    the bigram count table (fwd marginal+type count per w1, bwd type
    count per w2, 1-row global type total that broadcasts), and scoring
    is equi-joins with fan-out exactly 1 per bigram instance. No UDF,
    no model artifact leaves the engine. The arithmetic composes in the
    SAME textual order as the oracle so 6-decimal max-nll survives the
    cross-engine double comparison (the avg-derived columns round to
    4/2 per the registry contract)."""
    toks = table(spark, sf_dir, "documents").select("doc_id", tokens().alias("t"))
    bigrams = (
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> concat_ws(' ', slice(t, i, 2)))"
                )
            ).alias("big"),
        )
        .localCheckpoint(eager=True)
    )
    freq2 = bigrams.groupBy("big").agg(F.count("*").alias("c12"))
    w1 = F.split(F.col("big"), " ").getItem(0)
    w2 = F.split(F.col("big"), " ").getItem(1)
    fwd = freq2.groupBy(w1.alias("w1")).agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1f")
    )
    bwd = freq2.groupBy(w2.alias("w2")).agg(F.count("*").alias("n1b"))
    types = freq2.agg(F.count("*").cast("double").alias("tt"))
    p = (F.col("c12") - F.lit(KN_DISCOUNT)) / F.col("c1") + F.lit(
        KN_DISCOUNT
    ) * F.col("n1f") / F.col("c1") * (F.col("n1b") / F.col("tt"))
    probs = (
        freq2.withColumn("w1", w1)
        .withColumn("w2", w2)
        .join(fwd, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(types))
        .select("big", p.alias("p"))
    )
    scored = bigrams.join(probs, "big").select("doc_id", (-F.log("p")).alias("nll"))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("nll"), 4).alias("mean_nll"),
        F.round(F.exp(F.avg("nll")), 2).alias("kn_ppl"),
        F.round(F.max("nll"), 6).alias("max_kn_nll"),
    )


# ---------------------------------------------------------------------------
# retrieval chunking: overlapping fixed-token windows per document — the
# materialization step a RAG / retrieval-indexing pipeline runs before
# embedding; one output row per chunk

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks

_RAG_CHUNKS_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
starts AS (
    SELECT doc_id, t, unnest(range(1, len(t) + 1, {CHUNK_STRIDE})) AS start
    FROM toks WHERE len(t) > 0
)
SELECT doc_id,
       ((start - 1) / {CHUNK_STRIDE})::BIGINT AS chunk_id,
       start::BIGINT AS start_tok,
       least({CHUNK_TOKENS}, len(t) - start + 1)::BIGINT AS n_tokens,
       md5(array_to_string(list_slice(t, start, start + {CHUNK_TOKENS} - 1), ' '))
           AS chunk_fp
FROM starts
"""


@register("doc_rag_chunks", oracle=_RAG_CHUNKS_SQL, tags=("text", "chunking", "retrieval"))
def doc_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token chunks, stride 48) —
    the document→passage explosion a retrieval index builds before
    embedding each chunk. Pure per-row array expressions (sequence →
    explode → slice → md5): zero shuffles, fully codegen'd, and the
    chunk fingerprint makes the output joinable against a dedup or
    embedding stage without re-reading the text. Start offsets are
    1-based in both engines (Spark slice() and DuckDB list_slice() both
    clamp the final partial chunk)."""
    toks = table(spark, sf_dir, "documents").select("doc_id", tokens().alias("t"))
    starts = toks.filter(F.size("t") > 0).select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(1), F.size("t"), F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
        F.col("start").cast("bigint").alias("start_tok"),
        F.least(F.lit(CHUNK_TOKENS), F.size("t") - F.col("start") + 1)
        .cast("bigint")
        .alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.slice(F.col("t"), F.col("start"), CHUNK_TOKENS))).alias(
            "chunk_fp"
        ),
    )


# ---------------------------------------------------------------------------
# weighted reservoir sampling (Efraimidis & Spirakis 2006): top-k by
# u^(1/w) — equivalently the k SMALLEST exponential clocks -ln(u)/w —
# gives an exact weighted sample WITHOUT replacement in one distributed
# pass; the md5-uniform keeps it deterministic and oracle-reproducible

RESERVOIR_K = 5  # docs kept per source

_RESERVOIR_SQL = f"""
WITH t AS (
    SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
    FROM documents
),
keyed AS (
    SELECT doc_id, source,
           len(list_distinct(t))::DOUBLE / len(t) AS weight,
           round(-ln(CAST(CAST(('0x' || substr(md5('wrs:' || doc_id), 1, 15))
                          AS UBIGINT) AS BIGINT) / 1152921504606846976.0)
                 / (len(list_distinct(t))::DOUBLE / len(t)), 9) AS clock
    FROM t WHERE len(t) > 0
)
SELECT source, rank, doc_id,
       round(weight, 6) AS weight,
       clock
FROM (
    SELECT source, doc_id, weight, clock,
           row_number() OVER (PARTITION BY source
                              ORDER BY clock, doc_id) AS rank
    FROM keyed
)
WHERE rank <= {RESERVOIR_K}
"""


@register("weighted_reservoir_sample", oracle=_RESERVOIR_SQL, tags=("sampling", "text"))
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    per source, keep the 5 documents with the smallest exponential clock
    −ln(u)/w, where w is the unique-token quality weight and u a
    deterministic md5 uniform — inclusion probability proportional to
    weight, reproducible across reruns and engines. The one-pass,
    mergeable top-k is what makes weighted sampling work distributed:
    no global sort, no sequential reservoir state.

    Scale shape: per-group top-k via rank window — WindowGroupLimit
    prunes to ≤ k rows per source per partition BEFORE the shuffle, so
    shuffle volume is sources × k regardless of corpus size. The clock
    is rounded to 9 decimals on both engines before ranking (libm ln()
    may differ in the last ulp), with doc_id as total-order tiebreak."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens().alias("t")
    )
    n = F.size("t")
    w_q = F.size(F.array_distinct(F.col("t"))).cast("double") / n
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("wrs:"), F.col("doc_id").cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        / F.lit(1152921504606846976.0)
    )
    keyed = docs.filter(n > 0).select(
        "doc_id",
        "source",
        w_q.alias("weight"),
        F.round(-F.log(u) / w_q, 9).alias("clock"),
    )
    win = Window.partitionBy("source").orderBy("clock", "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= RESERVOIR_K)
        .select(
            "source",
            "rank",
            "doc_id",
            F.round("weight", 6).alias("weight"),
            "clock",
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing: regex detection report + redacting rewrite — the standard
# pre-training privacy stage (the pattern family the C4 / Dolma / RedPajama
# cleanup recipes apply before anything else touches the text). Unlike the
# early ``doc_pii_scrub`` demo above (which SEEDS synthetic markers and
# emits only fingerprints), these run on the corpus as-is: the report is
# the per-source intake-review artifact, the rewrite emits the full
# redacted text (hash-gated byte-for-byte), and IPv4 detection + staged
# ordering prevent octets double-counting as phone digits.

# One dialect-safe pattern set (Java regex on the Spark side, RE2 in
# DuckDB): character classes, bounded repeats, non-capturing groups and \b
# only — no backreferences or lookaround (RE2 has neither), identical
# leftmost-first alternation semantics in both engines.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = (
    r"(?:(?:\+?\d{1,2}[-. ])?(?:\(\d{3}\)[-. ]?|\d{3}[-. ]))?\d{3}[-. ]\d{4}"
)

# Staged scrubbing order is part of the contract: emails first, then IPs,
# then phones — phone counting/redaction runs on IP-redacted text so the
# dotted digit runs inside an IP can never double-count as a phone.
_PII_CTE = f"""
staged AS (
    SELECT doc_id, source, text,
           regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
    FROM documents
),
staged2 AS (
    SELECT doc_id, source, text, t1,
           regexp_replace(t1, '{PII_IP_RE}', '<IP>', 'g') AS t2
    FROM staged
),
scrubbed AS (
    SELECT doc_id, source,
           coalesce(len(regexp_extract_all(text, '{PII_EMAIL_RE}', 0)), 0)
               AS n_email,
           coalesce(len(regexp_extract_all(t1, '{PII_IP_RE}', 0)), 0) AS n_ip,
           coalesce(len(regexp_extract_all(t2, '{PII_PHONE_RE}', 0)), 0)
               AS n_phone,
           regexp_replace(t2, '{PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text
    FROM staged2
)"""

_PII_REPORT_SQL = f"""
WITH {_PII_CTE}
SELECT source,
       count(*) AS n_docs,
       sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END)::BIGINT AS email_docs,
       sum(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END)::BIGINT AS ip_docs,
       sum(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END)::BIGINT AS phone_docs,
       sum(n_email)::BIGINT AS email_hits,
       sum(n_ip)::BIGINT AS ip_hits,
       sum(n_phone)::BIGINT AS phone_hits,
       round(sum(CASE WHEN n_email + n_ip + n_phone > 0 THEN 1 ELSE 0 END)
             * 1.0 / count(*), 4) AS pii_doc_rate
FROM scrubbed
GROUP BY source
"""


def _pii_scrubbed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_email, n_ip, n_phone, clean_text) — the Spark
    twin of the staged CTE above, over the batch documents table."""
    return pii_scrub_df(
        table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )


def pii_scrub_df(docs: DataFrame) -> DataFrame:
    """The scrub transform itself: three chained regexp_replace
    projections, zero shuffles, counts taken at the same stage as the
    oracle so IP octets never count as phones. Takes any (doc_id, source,
    text) DataFrame — batch table or structured stream (stateless, so it
    composes with append mode unchanged)."""
    t1 = F.regexp_replace(F.col("text"), PII_EMAIL_RE, "<EMAIL>")
    staged = docs.withColumn("t1", t1).withColumn(
        "t2", F.regexp_replace(F.col("t1"), PII_IP_RE, "<IP>")
    )

    def n_hits(col: str, pat: str) -> F.Column:
        return F.coalesce(
            F.size(F.regexp_extract_all(F.col(col), F.lit(pat), F.lit(0))),
            F.lit(0),
        ).cast("long")

    return staged.select(
        "doc_id",
        "source",
        n_hits("text", PII_EMAIL_RE).alias("n_email"),
        n_hits("t1", PII_IP_RE).alias("n_ip"),
        n_hits("t2", PII_PHONE_RE).alias("n_phone"),
        F.regexp_replace(F.col("t2"), PII_PHONE_RE, "<PHONE>").alias("clean_text"),
    )


@register("pii_detection_report", oracle=_PII_REPORT_SQL,
          tags=("text", "pii", "governance", "quality"))
def pii_detection_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure report: how many documents (and total
    hits) contain email / IPv4 / phone patterns, plus the per-source PII
    document rate — the go/no-go signal a corpus intake review reads
    before licensing a source for training. Detection runs on the staged
    text (emails, then IPs, then phones) so the counts are exactly the
    redactions ``pii_redacted_docs`` would apply.

    Scale shape: pure per-row regex projections (JVM codegen, no UDF) into
    ONE partial+final agg keyed by source — shuffle rows = sources, not
    documents; NULL text contributes zero hits on both engines."""
    sc = _pii_scrubbed(spark, sf_dir)
    pii_doc = (F.col("n_email") + F.col("n_ip") + F.col("n_phone") > 0).cast("int")
    return sc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("n_email") > 0).cast("int")).alias("email_docs"),
        F.sum((F.col("n_ip") > 0).cast("int")).alias("ip_docs"),
        F.sum((F.col("n_phone") > 0).cast("int")).alias("phone_docs"),
        F.sum("n_email").alias("email_hits"),
        F.sum("n_ip").alias("ip_hits"),
        F.sum("n_phone").alias("phone_hits"),
        F.round(F.sum(pii_doc) * 1.0 / F.count("*"), 4).alias("pii_doc_rate"),
    )


_PII_REDACT_SQL = f"""
WITH {_PII_CTE}
SELECT doc_id, n_email, n_ip, n_phone, clean_text
FROM scrubbed
"""


@register("pii_redacted_docs", oracle=_PII_REDACT_SQL,
          tags=("text", "pii", "rewrite"))
def pii_redacted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redacting rewrite (same rewrite shape as ``doc_passage_dedup``):
    every document re-emitted with emails → <EMAIL>, IPv4s → <IP>, then
    phones → <PHONE> (staged in that order so IP octets can't be eaten as
    phone digits), alongside the per-stage hit counts. Clean documents
    pass through byte-identical — the gate hashes the full rewritten
    text, so unicode/whitespace preservation is value-verified, and NULL
    text stays NULL on both engines.

    Scale shape: three chained regexp_replace projections — zero
    shuffles, no UDF, trivially partition-parallel at any corpus size."""
    return _pii_scrubbed(spark, sf_dir).select(
        "doc_id", "n_email", "n_ip", "n_phone", "clean_text"
    )


# ---------------------------------------------------------------------------
# Unicode script / character-class profile: the charset-mix readout every
# multilingual corpus pipeline computes before language-ID can be trusted
# (fasttext lid mislabels transliterated text; a script histogram is the
# cheap prior). Classes are EXPLICIT codepoint ranges, not \p{Script=...}
# property names, because Java (Spark) and RE2 (DuckDB) bind property
# names to different Unicode versions — literal ranges are engine-exact.

_SCRIPT_CLASSES = (
    # (name, regex character class — identical syntax in Java and RE2)
    # Latin-1 letters minus U+00D7 (×) / U+00F7 (÷): those are
    # Script=Common math symbols, not Latin letters, and would inflate
    # latin_chars (and can flip dominant_script) for measurement-heavy text.
    ("latin", r"[A-Za-z\x{00C0}-\x{00D6}\x{00D8}-\x{00F6}\x{00F8}-\x{024F}]"),
    ("greek", r"[\x{0370}-\x{03FF}]"),
    ("cyrillic", r"[\x{0400}-\x{04FF}]"),
    ("cjk", r"[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]"),
    ("digit", r"[0-9]"),
)
# explicit whitespace class: Java's \s includes \x0B where RE2's does not
_SPACE_CLASS = r"[ \t\n\r\f]"


def _script_count_duck(cls: str) -> str:
    return f"length(text) - length(regexp_replace(text, '{cls}', '', 'g'))"


_SCRIPT_NONSPACE_DUCK = (
    f"length(regexp_replace(text, '{_SPACE_CLASS}', '', 'g'))"
)

_SCRIPT_OTHER_DUCK = (
    _SCRIPT_NONSPACE_DUCK
    + "".join(f" - ({_script_count_duck(cls)})" for _, cls in _SCRIPT_CLASSES)
)

_SCRIPT_DOMINANT_DUCK = (
    "CASE WHEN nonspace_chars > 0 THEN (list_min(["
    + ", ".join(
        f"{{'c': -{name}_chars, 'k': '{name}'}}" for name, _ in _SCRIPT_CLASSES
    )
    + ", {'c': -other_chars, 'k': 'other'}])).k END"
)

_SCRIPT_PROFILE_SQL = f"""
WITH counts AS (
    SELECT doc_id, lang,
           length(text) AS total_chars,
           {_SCRIPT_NONSPACE_DUCK} AS nonspace_chars,
           {", ".join(f"{_script_count_duck(cls)} AS {name}_chars" for name, cls in _SCRIPT_CLASSES)},
           {_SCRIPT_OTHER_DUCK} AS other_chars,
           NOT regexp_matches(text, '[^\\x00-\\x7F]') AS ascii_only
    FROM documents
)
SELECT doc_id, lang, total_chars, nonspace_chars,
       {", ".join(f"{name}_chars" for name, _ in _SCRIPT_CLASSES)},
       other_chars,
       CASE WHEN nonspace_chars > 0
            THEN round(latin_chars::DOUBLE / nonspace_chars, 6) END AS latin_frac,
       {_SCRIPT_DOMINANT_DUCK} AS dominant_script,
       ascii_only
FROM counts
"""


@register("doc_script_profile", oracle=_SCRIPT_PROFILE_SQL,
          tags=("text", "langid", "unicode"))
def doc_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-class histogram over explicit Unicode
    codepoint ranges (Latin incl. Latin-1/Extended-A/B, Greek, Cyrillic,
    kana+CJK-unified, ASCII digits), plus whitespace/other counts, the
    Latin fraction of non-space text, the dominant script (max count,
    alphabetical tiebreak via a min over (-count, name) structs —
    Spark least() / DuckDB list_min(), identical lexicographic struct
    comparison in both engines), and an ascii_only
    flag. NULL text yields NULL counts; docs with no non-space text get a
    NULL dominant script rather than an arbitrary all-zero tiebreak.

    Scale shape: pure zero-shuffle projection — each class count is one
    regexp_replace + two length() calls inside whole-stage codegen; no
    join, no agg, no UDF, trivially partition-parallel at 100 TB."""
    def cnt(cls: str) -> F.Column:
        return F.length("text") - F.length(F.regexp_replace("text", cls, ""))

    counts = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.length("text").alias("total_chars"),
        cnt(_SPACE_CLASS).alias("_sp"),
        *[cnt(cls).alias(f"{name}_chars") for name, cls in _SCRIPT_CLASSES],
        (~F.col("text").rlike(r"[^\x00-\x7F]")).alias("ascii_only"),
    )
    nonspace = (F.col("total_chars") - F.col("_sp")).alias("nonspace_chars")
    class_cols = [F.col(f"{name}_chars") for name, _ in _SCRIPT_CLASSES]
    other = F.col("total_chars") - F.col("_sp")
    for c in class_cols:
        other = other - c
    counts = counts.select(
        "doc_id", "lang", "total_chars", nonspace,
        *[f"{name}_chars" for name, _ in _SCRIPT_CLASSES],
        other.alias("other_chars"), "ascii_only",
    )
    dominant = F.when(
        F.col("nonspace_chars") > 0,
        F.least(
            *[
                F.struct((-F.col(f"{name}_chars")).alias("c"), F.lit(name).alias("k"))
                for name, _ in _SCRIPT_CLASSES
            ],
            F.struct((-F.col("other_chars")).alias("c"), F.lit("other").alias("k")),
        )["k"],
    )
    return counts.select(
        "doc_id", "lang", "total_chars", "nonspace_chars",
        *[f"{name}_chars" for name, _ in _SCRIPT_CLASSES],
        "other_chars",
        F.when(
            F.col("nonspace_chars") > 0,
            F.round(F.col("latin_chars").cast("double") / F.col("nonspace_chars"), 6),
        ).alias("latin_frac"),
        dominant.alias("dominant_script"),
        "ascii_only",
    )


# ---------------------------------------------------------------------------
# Train-vs-eval n-gram decontamination: the GPT-3/PaLM-style benchmark
# hygiene pass. Documents get the same deterministic md5-bucket split the
# leakage audit uses (train_eval_split_leakage, plans/dedup.py), the EVAL
# side's rolling 8-gram fingerprints form the contamination set, and every
# TRAIN document reports how many of its gram instances collide — the
# per-document evidence behind a drop/keep decontamination decision.
# Distinct from doc_gram_contamination (intra-corpus duplication, no
# split) and from train_eval_split_leakage (MinHash near-dup pairs at
# document granularity; this is exact overlap at gram granularity).

_DECONTAM_SQL = f"""
WITH docs AS (
    SELECT doc_id,
           string_split_regex(trim(text), '\\s+') AS t,
           CASE WHEN ascii(substr(md5(doc_id::VARCHAR), 1, 1)) % 10 < 2
                THEN 'eval' ELSE 'train' END AS split
    FROM documents
),
grams AS (
    SELECT doc_id, split,
           unnest([md5(array_to_string(t[i:i + {GRAM_N - 1}], ' '))
                   for i in range(1, len(t) - {GRAM_N - 2})]) AS gh
    FROM docs
),
eg AS (SELECT DISTINCT gh FROM grams WHERE split = 'eval'),
hits AS (
    SELECT g.doc_id,
           count(*) AS n_grams,
           sum(CASE WHEN eg.gh IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS eval_hit_grams
    FROM grams g LEFT JOIN eg ON g.gh = eg.gh
    WHERE g.split = 'train'
    GROUP BY g.doc_id
)
SELECT d.doc_id,
       coalesce(h.n_grams, 0)::BIGINT AS n_grams,
       coalesce(h.eval_hit_grams, 0)::BIGINT AS eval_hit_grams,
       CASE WHEN h.n_grams > 0
            THEN round(h.eval_hit_grams::DOUBLE / h.n_grams, 6) END
           AS eval_hit_frac,
       coalesce(h.eval_hit_grams, 0) > 0 AS contaminated
FROM docs d LEFT JOIN hits h USING (doc_id)
WHERE d.split = 'train'
"""


@register("eval_gram_decontamination", oracle=_DECONTAM_SQL,
          tags=("text", "dedup", "contamination", "leakage"))
def eval_gram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-TRAIN-document eval-set contamination report: rolling 8-gram
    md5 fingerprints (same gram machinery as doc_gram_contamination)
    joined against the distinct gram set of the deterministic eval split
    (same md5-bucket split as train_eval_split_leakage — reproducible
    across engines, runs, and partitionings). Every train doc appears,
    including sub-8-token docs with zero grams (kept, vacuously clean);
    ``contaminated`` marks docs a decontamination pass would drop.

    Scale shape: explode to (doc, gram-md5), distinct the eval side
    (hash-agg on uniform md5 keys), one equi-join on gh with fan-out
    exactly 1 per train gram instance (eg is distinct), re-agg by doc,
    then a left join back to the train doc list so gramless docs
    surface. The eval gram set is a small fraction of the corpus (20%
    of docs) and at production eval-suite sizes is broadcastable; no
    pair explosion at any corpus size."""
    split_of = F.when(
        F.ascii(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)) % 10 < 2,
        "eval",
    ).otherwise("train")
    docs = spread(table(spark, sf_dir, "documents")).select(
        "doc_id", tokens().alias("t"), split_of.alias("split")
    )
    gram_fp = F.when(
        F.size("t") >= GRAM_N,
        F.expr(
            f"transform(sequence(1, size(t) - {GRAM_N - 1}),"
            f" i -> md5(concat_ws(' ', slice(t, i, {GRAM_N}))))"
        ),
    ).otherwise(F.expr("array()"))
    # grams feeds BOTH the eval-side distinct and the train-side join;
    # checkpoint it once so the scan + tokenize + per-gram md5 stage is
    # not recomputed per branch (same shared-stage pattern as the
    # dedup_incremental_minhash shingle checkpoint in plans/dedup.py).
    grams = docs.select(
        "doc_id", "split", F.explode(gram_fp).alias("gh")
    ).localCheckpoint(eager=True)
    eg = grams.filter(F.col("split") == "eval").select("gh").distinct()
    hits = (
        grams.filter(F.col("split") == "train")
        .join(eg.withColumn("_hit", F.lit(1)), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0)).alias(
                "eval_hit_grams"
            ),
        )
    )
    train_docs = docs.filter(F.col("split") == "train").select("doc_id")
    return train_docs.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("eval_hit_grams", F.lit(0)).alias("eval_hit_grams"),
        F.when(
            F.col("n_grams") > 0,
            F.round(F.col("eval_hit_grams").cast("double") / F.col("n_grams"), 6),
        ).alias("eval_hit_frac"),
        (F.coalesce("eval_hit_grams", F.lit(0)) > 0).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# Model-based quality scoring: the "fasttext quality classifier" stage of
# a pretraining pipeline (CCNet / GPT-3 Common Crawl filtering) expressed
# as a broadcast-free linear model over hashing-trick features. The
# weights here are a deterministic md5-derived STUB (the container has no
# model artifacts); a real deployment swaps `weight-of-bucket` for a map
# literal / broadcast join against trained coefficients — the plan shape
# (zero-shuffle projection) is identical.

# integer weight(b) in [-100, 100] from the md5 of the seeded bucket id —
# the ascii-of-hex-char trick (operators/textops.py module contract).
# The PER-DOC SCORE IS KEPT AS AN EXACT INTEGER SUM: two earlier variants
# that emitted the rounded mean weight failed the gate on round-tie noise
# (the mean is a small-integer rational, so it lands on EXACT decimal
# halves where Spark's BigDecimal HALF_UP and DuckDB's float-path round()
# disagree by one ulp). Integers hash exactly; only the sigmoid — a
# transcendental that can never sit on a decimal half — is rounded.
_W_DUCK = (
    "(ascii(substr(md5('w:' || b::VARCHAR), 1, 1)) * 101"
    " + ascii(substr(md5('w:' || b::VARCHAR), 2, 1))) % 201 - 100"
)

_LINEAR_SCORE_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang,
           string_split_regex(trim(text), '\\s+') AS t
    FROM documents
),
scored AS (
    SELECT doc_id, lang,
           len(t) AS n_tokens,
           list_sum(list_transform(
               list_transform(t, x -> {_BUCKET_DUCK}),
               b -> {_W_DUCK}))::BIGINT AS weight_sum
    FROM toks
)
SELECT doc_id, lang, n_tokens,
       weight_sum,
       round(1.0 / (1.0 + exp(-(weight_sum / (100.0 * n_tokens)))), 6) AS prob,
       weight_sum >= 0 AS keep
FROM scored
"""


@register("doc_quality_linear_score", oracle=_LINEAR_SCORE_SQL,
          tags=("text", "quality", "features", "model"))
def doc_quality_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scoring over hashed-TF features: each
    token hashes into the doc_hashed_tf_vectors bucket space and picks up
    a deterministic md5-derived INTEGER weight in [-100, 100]; the doc's
    weight sum is the raw margin, squashed through a sigmoid (scaled by
    100 x n_tokens, i.e. the mean weight in [-1, 1]) into a keep
    probability. The margin stays an exact integer — the decision
    boundary (weight_sum >= 0) and the hash-gated value are immune to
    float accumulation and round-tie drift; only the transcendental
    sigmoid is rounded. NULL text yields NULL sum/prob/keep.

    Scale shape: pure zero-shuffle projection — two md5 calls per token
    inside whole-stage codegen, no vocabulary fit pass, no join, no UDF;
    swap-in of trained weights keeps the plan shape (a 2^k-entry map
    literal or broadcast) at any corpus size."""
    def _bucket(x):  # same formula as _BUCKET_DUCK
        h = F.md5(x)
        return (
            F.ascii(F.substring(h, 1, 1)) * 101 + F.ascii(F.substring(h, 2, 1))
        ) % HASH_DIM

    def _weight(b):  # same formula as _W_DUCK
        h = F.md5(F.concat(F.lit("w:"), b.cast("string")))
        return (
            F.ascii(F.substring(h, 1, 1)) * 101 + F.ascii(F.substring(h, 2, 1))
        ) % 201 - 100

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens().alias("t")
    )
    wts = F.transform(F.transform(F.col("t"), _bucket), _weight)
    wsum = F.aggregate(wts, F.lit(0), lambda acc, v: acc + v).cast("long")
    scored = docs.select(
        "doc_id", "lang", F.size("t").cast("long").alias("n_tokens"),
        wsum.alias("weight_sum"),
    )
    return scored.select(
        "doc_id", "lang", "n_tokens", "weight_sum",
        F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.col("weight_sum") / (100.0 * F.col("n_tokens"))))),
            6,
        ).alias("prob"),
        (F.col("weight_sum") >= 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# The canonical Gopher quality-rule battery (Rae et al. 2021, table A1):
# the published rule set most pretraining pipelines start from, applied
# per document. Complements doc_quality_scores (generic features) and
# doc_repetition_stats (repetition half of the Gopher rules): this is the
# structural half — word-count bounds, mean word length, symbol-to-word
# ratio, bullet/ellipsis line fractions, alphabetic-word fraction, and
# the required-stopword rule — each as its own flag so a tuner can see
# WHICH rule kills a document, plus the conjunction gate.

# the eight required words from the paper's "stop word" rule
_GOPHER_REQ_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_REQ_SQL = ", ".join(f"'{w}'" for w in _GOPHER_REQ_WORDS)

# line-level regexes with EXPLICIT whitespace classes (Java \s includes
# \x0B where RE2's does not — module convention, see _SPACE_CLASS), and
# \z instead of $ for the end anchor: Java's $ matches BEFORE a final
# line terminator (U+2028/U+2029/U+0085) where RE2's matches only at end
# of text; \z means end-of-text in both engines
_BULLET_RE = r"^[ \t]*[-*•]"
_ELLIPSIS_RE = r"(\.\.\.|…)[ \t\r]*\z"

def _gopher_sql(rel: str = "documents") -> str:
    """The committed Gopher battery, parameterized on the source relation
    so composed pipelines (corpus_curation_run) can run it over a CTE of
    scrubbed text; ``_gopher_sql()`` is byte-identical to the string the
    standalone query has always shipped."""
    return f"""
WITH toks AS (
    SELECT doc_id, text,
           string_split_regex(trim(text), '\\s+') AS t,
           string_split(text, chr(10)) AS lines
    FROM {rel}
),
m AS (
    SELECT doc_id,
           len(t) AS n_words,
           list_sum(list_transform(t, x -> length(x)))::DOUBLE / len(t)
               AS mean_wlen,
           (length(text) - length(replace(text, '#', ''))
            + (length(text) - length(replace(text, '...', ''))) // 3
            + length(text) - length(replace(text, '…', '')))::DOUBLE / len(t)
               AS sym_ratio,
           len(list_filter(lines, l -> regexp_matches(l, '{_BULLET_RE}')))::DOUBLE
               / len(lines) AS bullet_frac,
           len(list_filter(lines, l -> regexp_matches(l, '{_ELLIPSIS_RE}')))::DOUBLE
               / len(lines) AS ellipsis_frac,
           len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
               / len(t) AS alpha_frac,
           CASE WHEN t IS NOT NULL
                THEN len(list_filter([{_GOPHER_REQ_SQL}],
                                     w -> list_contains(t, w)))::BIGINT
           END AS req_sw_hits
    FROM toks
)
SELECT doc_id, n_words,
       round(mean_wlen, 4) AS mean_word_len,
       round(sym_ratio, 6) AS symbol_word_ratio,
       round(bullet_frac, 6) AS bullet_line_frac,
       round(ellipsis_frac, 6) AS ellipsis_line_frac,
       round(alpha_frac, 6) AS alpha_word_frac,
       req_sw_hits AS req_stopword_hits,
       (n_words >= 50 AND n_words <= 100000) AS words_in_range,
       (mean_wlen >= 3.0 AND mean_wlen <= 10.0) AS mean_len_ok,
       (sym_ratio <= 0.1) AS symbol_ok,
       (bullet_frac <= 0.9) AS bullet_ok,
       (ellipsis_frac <= 0.3) AS ellipsis_ok,
       (alpha_frac >= 0.8) AS alpha_ok,
       (req_sw_hits >= 2) AS stopword_ok,
       (n_words >= 50 AND n_words <= 100000
        AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
        AND sym_ratio <= 0.1 AND bullet_frac <= 0.9
        AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
        AND req_sw_hits >= 2) AS passes_gopher
FROM m
"""


_GOPHER_SQL = _gopher_sql()


@register("doc_gopher_quality_flags", oracle=_GOPHER_SQL,
          tags=("text", "quality", "gopher"))
def doc_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher structural quality rules (Rae et al. 2021):
    word-count bounds [50, 100k], mean word length in [3, 10], symbol-
    to-word ratio ('#', '...', '…') <= 0.1, bullet-started lines <= 90%,
    ellipsis-ended lines <= 30%, words-with-an-alphabetic-char >= 80%,
    and at least two of the paper's eight required English stopwords —
    one flag per rule plus the conjunction, so threshold tuning can see
    the marginal kill rate of each rule (the repetition half of the
    battery lives in doc_repetition_stats). NULL text propagates NULL
    metrics and a NULL gate (Spark 3+ size(NULL)=NULL semantics match
    the oracle); flags compare UNROUNDED doubles identically on both
    engines, with '...' counted before the lone-'…' pass the same
    non-overlapping left-to-right way via replace().

    Scale shape: pure zero-shuffle projection — token and line arrays
    stay inside one codegen stage, no join, no agg, no UDF; trivially
    partition-parallel at 100 TB."""
    return gopher_flags_df(table(spark, sf_dir, "documents"))


def gopher_flags_df(
    docs: DataFrame,
    keep_text: bool = False,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The rule battery itself over any (doc_id, text) DataFrame — batch
    table or structured stream (stateless projection, so it composes with
    append mode unchanged; streaming_quality_gate runs exactly this).
    ``keep_text=True`` threads the text column through so a downstream
    stage (the NB classifier's tokenize) can label AND tokenize in the
    same zero-shuffle projection instead of re-joining on doc_id;
    ``keep_cols`` threads further passthrough columns the same way
    (corpus_curation_run carries lang/source/token counts)."""
    passthrough = (["text"] if keep_text else []) + list(keep_cols)
    # Every projection is parsed SQL (selectExpr), not a Column chain:
    # this battery cost ~450 gateway roundtrips of plan construction per
    # call (x4 consumers in corpus_curation_run's timed path alone). The
    # parsed trees are identical; the rlike caution from the r12 Column
    # version still applies in SQL form — every regex backslash is
    # DOUBLED below ('\\t' in the SQL text) so the SQL string-literal
    # unescape hands the regex engine the same '\t' Column.rlike passed.
    docs = docs.selectExpr(
        "doc_id", "text", *keep_cols,
        r"split(trim(text), '\\s+') AS t",
        r"split(text, '\n') AS lines",
    )
    req_arr = ", ".join(f"'{w}'" for w in _GOPHER_REQ_WORDS)
    m = docs.selectExpr(
        "doc_id",
        *passthrough,
        "CAST(size(t) AS BIGINT) AS n_words",
        "CAST(aggregate(transform(t, x -> length(x)), 0, (acc, x) -> acc + x)"
        " AS DOUBLE) / size(t) AS mean_wlen",
        # '...' counted before the lone-'…' pass, non-overlapping
        # left-to-right via replace(), exactly as the oracle
        "CAST((length(text) - length(replace(text, '#', '')))"
        " + floor((length(text) - length(replace(text, '...', ''))) / 3)"
        " + (length(text) - length(replace(text, '…', '')))"
        " AS DOUBLE) / size(t) AS sym_ratio",
        r"CAST(size(filter(lines, l -> l RLIKE '^[ \\t]*[-*•]')) AS DOUBLE)"
        r" / size(lines) AS bullet_frac",
        r"CAST(size(filter(lines, l -> l RLIKE '(\\.\\.\\.|…)[ \\t\\r]*\\z'))"
        r" AS DOUBLE) / size(lines) AS ellipsis_frac",
        "CAST(size(filter(t, x -> x RLIKE '[a-zA-Z]')) AS DOUBLE)"
        " / size(t) AS alpha_frac",
        # NULL text must propagate a NULL hit count (filter over the
        # constant word array would silently turn NULL checks into 0)
        f"CASE WHEN t IS NOT NULL THEN CAST(size(filter(array({req_arr}),"
        f" w -> array_contains(t, w))) AS BIGINT) END AS req_sw_hits",
    )
    return m.selectExpr(
        "doc_id",
        *passthrough,
        "n_words",
        "round(mean_wlen, 4) AS mean_word_len",
        "round(sym_ratio, 6) AS symbol_word_ratio",
        "round(bullet_frac, 6) AS bullet_line_frac",
        "round(ellipsis_frac, 6) AS ellipsis_line_frac",
        "round(alpha_frac, 6) AS alpha_word_frac",
        "req_sw_hits AS req_stopword_hits",
        "n_words >= 50 AND n_words <= 100000 AS words_in_range",
        "mean_wlen >= 3.0D AND mean_wlen <= 10.0D AS mean_len_ok",
        "sym_ratio <= 0.1D AS symbol_ok",
        "bullet_frac <= 0.9D AS bullet_ok",
        "ellipsis_frac <= 0.3D AS ellipsis_ok",
        "alpha_frac >= 0.8D AS alpha_ok",
        "req_sw_hits >= 2 AS stopword_ok",
        "(n_words >= 50 AND n_words <= 100000)"
        " AND (mean_wlen >= 3.0D AND mean_wlen <= 10.0D)"
        " AND sym_ratio <= 0.1D AND bullet_frac <= 0.9D"
        " AND ellipsis_frac <= 0.3D AND alpha_frac >= 0.8D"
        " AND req_sw_hits >= 2 AS passes_gopher",
    )


# ---------------------------------------------------------------------------
# Token-budget mixing plan: the data-constrained-scaling readout (how many
# epochs of each source a target token budget implies, and what can't be
# met under a max-repeat cap — Muennighoff et al. 2023 found ~4 epochs of
# repetition roughly as good as fresh data, diminishing hard beyond).
# Completes the mixing story: corpus_mix_plan balances DOCUMENT counts,
# this one plans TOKENS against a budget with a repeat ceiling.

BUDGET_TOKEN_MULT = 2  # budget = 2x the corpus's total whitespace tokens
MAX_REPEAT_EPOCHS = 4  # repeat ceiling per source

_TOKEN_BUDGET_SQL = f"""
WITH per_src AS (
    SELECT source,
           count(*)::BIGINT AS n_docs,
           coalesce(sum(len(string_split_regex(trim(text), '\\s+'))), 0)::BIGINT
               AS tokens_available
    FROM documents
    GROUP BY source
),
tot AS (
    SELECT sum(tokens_available)::DOUBLE AS total_tokens,
           count(*)::DOUBLE AS n_sources
    FROM per_src
)
SELECT source, n_docs, tokens_available,
       round(tokens_available / total_tokens, 6) AS token_share,
       CAST(floor(total_tokens * {BUDGET_TOKEN_MULT} / n_sources) AS BIGINT)
           AS target_tokens,
       CASE WHEN tokens_available > 0
            THEN round(floor(total_tokens * {BUDGET_TOKEN_MULT} / n_sources)
                       / tokens_available, 6) END AS repeat_factor,
       least(tokens_available * {MAX_REPEAT_EPOCHS},
             CAST(floor(total_tokens * {BUDGET_TOKEN_MULT} / n_sources) AS BIGINT))
           AS planned_tokens,
       greatest(0, CAST(floor(total_tokens * {BUDGET_TOKEN_MULT} / n_sources) AS BIGINT)
                   - tokens_available * {MAX_REPEAT_EPOCHS}) AS unmet_tokens,
       (tokens_available * {MAX_REPEAT_EPOCHS}
        >= CAST(floor(total_tokens * {BUDGET_TOKEN_MULT} / n_sources) AS BIGINT))
           AS fully_satisfiable
FROM per_src, tot
"""


@register("corpus_token_budget_plan", oracle=_TOKEN_BUDGET_SQL,
          tags=("sampling", "governance", "mixing"))
def corpus_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-share token-budget plan per source: for a budget of
    BUDGET_TOKEN_MULT x the corpus's total whitespace tokens, each source
    owes budget/n_sources tokens; report the repeat factor (epochs) that
    implies, the planned tokens under a MAX_REPEAT_EPOCHS ceiling, and
    the unmet remainder a data-constrained run must source elsewhere.
    All boundary math is integer (target floor'd once to BIGINT, planned
    = min(4*available, target) as int min) so there is no float-product
    roundoff at epoch boundaries in either engine; a source whose docs
    are all NULL-text coalesces to 0 available tokens and surfaces its
    full target as unmet rather than NULLing out.

    Scale shape: one groupBy(source) shuffle over (source, token-count)
    pairs — the per-doc token count is computed in the scan projection;
    the corpus-wide totals ride in as a broadcast 1-row aggregate (same
    shape as corpus_mix_plan), so no single-partition window."""
    per_src = (
        table(spark, sf_dir, "documents")
        .select("source", F.size(tokens()).alias("doc_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum("doc_tokens"), F.lit(0)).cast("long").alias(
                "tokens_available"
            ),
        )
    )
    tot = per_src.agg(
        F.sum("tokens_available").cast("double").alias("total_tokens"),
        F.count("*").cast("double").alias("n_sources"),
    )
    target = F.floor(
        F.col("total_tokens") * BUDGET_TOKEN_MULT / F.col("n_sources")
    ).cast("bigint")
    capped = F.col("tokens_available") * MAX_REPEAT_EPOCHS
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens_available",
        F.round(F.col("tokens_available") / F.col("total_tokens"), 6).alias(
            "token_share"
        ),
        target.alias("target_tokens"),
        F.when(
            F.col("tokens_available") > 0,
            F.round(target.cast("double") / F.col("tokens_available"), 6),
        ).alias("repeat_factor"),
        F.least(capped, target).alias("planned_tokens"),
        F.greatest(F.lit(0).cast("bigint"), target - capped).alias("unmet_tokens"),
        (capped >= target).alias("fully_satisfiable"),
    )


# ---------------------------------------------------------------------------
# Iterative BPE merge TRAINING: bpe_merge_pairs above ranks the first
# iteration's candidates; this op runs the actual training loop — pick the
# most frequent adjacent symbol pair, merge it everywhere (leftmost
# non-overlapping, the published BPE semantics), recount, repeat. The
# symbol sequences are encoded as '|'-wrapped strings ('|a||b||c|') so the
# merge application is ONE sequential replace('|a||b|' -> '|ab|') — both
# engines' replace() scans leftmost and continues AFTER the replacement,
# which is exactly BPE's non-overlapping merge rule ('aaa' merges once).

BPE_TRAIN_ITERS = 4


def _bpe_train_ctes(n_iters: int) -> str:
    """The WITH-body of the training loop (w0/v0, then p{t}/t{t}/v{t} per
    round) — shared by the merge-table oracle and the apply-path oracle."""
    ctes = [
        """w0 AS (
    SELECT w, count(*)::BIGINT AS n
    FROM (SELECT unnest(string_split_regex(trim(lower(translate(text, 'İΣ', 'iσ'))), '\\s+')) AS w
          FROM documents)
    WHERE length(w) >= 2 AND NOT contains(w, '|')
    GROUP BY w
),
v0 AS (
    SELECT n,
           '|' || array_to_string([c FOR c IN string_split(w, '') IF c <> ''],
                                  '||') || '|' AS s
    FROM w0
)"""
    ]
    for t in range(1, n_iters + 1):
        ctes.append(f"""p{t} AS (
    SELECT pr.a AS lhs, pr.b AS rhs, sum(n)::BIGINT AS pair_count
    FROM (SELECT n,
                 unnest([{{'a': a[i], 'b': a[i+1]}} for i in range(1, len(a))]) AS pr
          FROM (SELECT n, string_split(substr(s, 2, length(s) - 2), '||') AS a
                FROM v{t - 1}))
    GROUP BY pr.a, pr.b
),
t{t} AS (
    SELECT lhs, rhs, pair_count FROM p{t}
    ORDER BY pair_count DESC, lhs, rhs LIMIT 1
),
v{t} AS (
    SELECT n, replace(s, '|' || t.lhs || '||' || t.rhs || '|',
                         '|' || t.lhs || t.rhs || '|') AS s
    FROM v{t - 1}, t{t} t
)""")
        # (v{t} is a 1-row cross join against the winning pair — broadcast)
    return ",\n".join(ctes)


_BPE_TRAIN_SQL = (
    "WITH "
    + _bpe_train_ctes(BPE_TRAIN_ITERS)
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {t} AS iter, lhs, rhs, lhs || rhs AS merged, pair_count FROM t{t}"
        for t in range(1, BPE_TRAIN_ITERS + 1)
    )
)


@register("bpe_train_merges", oracle=_BPE_TRAIN_SQL,
          tags=("text", "tokenizer", "bpe", "iterative"))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE training loop itself, 4 rounds: count adjacent symbol-pair
    frequencies over the word-frequency table, pick the argmax (count
    desc, then lexicographic — binary string order in both engines),
    apply the merge to every word via one sequential wrapped-string
    replace (leftmost non-overlapping = the published BPE merge rule),
    recount. Emits the learned merge table (iter, lhs, rhs, merged,
    pair_count) — the artifact a tokenizer ships. Words containing the
    '|' sentinel are excluded from training (deterministic, mirrored in
    the oracle); a vocabulary whose words all collapse to single symbols
    stops emitting rows rather than erroring (the pair explode guards
    size >= 2 — Spark's sequence(1, 0) raises where DuckDB's range is
    empty).

    Scale shape: the classic distributed BPE trainer — training state is
    the WORD-FREQUENCY table (bounded by unique words, not corpus size;
    one shuffle to build), each round is one pair-explode + hash agg, a
    1-row winner broadcast into the merge projection, and a checkpoint
    so round plans stay flat. Corpus text is scanned exactly once."""
    merges = _bpe_learned_merges(spark, sf_dir)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _bpe_learned_merges(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    """Run the training loop; one checkpointed 1-row winner DataFrame
    (iter, lhs, rhs, merged, pair_count) per round — shared by the merge
    table output (bpe_train_merges) and the apply path (bpe_segment_docs)."""
    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(lower_folded(F.col("text"))), r"\s+")).alias("w")
        )
        .filter((F.length("w") >= 2) & (~F.col("w").contains("|")))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    vocab = words.select(
        "n",
        F.concat(
            F.lit("|"), F.array_join(F.split("w", ""), "||"), F.lit("|")
        ).alias("s"),
    ).localCheckpoint(eager=True)

    merges = []
    for t in range(1, BPE_TRAIN_ITERS + 1):
        arr = F.split(F.expr("substring(s, 2, length(s) - 2)"), r"\|\|")
        pairs = (
            vocab.select("n", arr.alias("a"))
            .filter(F.size("a") >= 2)  # sequence(1, 0) raises on 1-symbol words
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(a) - 1),"
                        " i -> struct(element_at(a, i) AS lhs,"
                        "             element_at(a, i + 1) AS rhs))"
                    )
                ).alias("p"),
            )
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("n").alias("pair_count"))
        )
        top = (
            pairs.orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .localCheckpoint(eager=True)  # reused by the merge AND the output row
        )
        vocab = (
            vocab.crossJoin(F.broadcast(top.select("lhs", "rhs")))
            .select(
                "n",
                F.expr(
                    "replace(s, concat('|', lhs, '||', rhs, '|'),"
                    "           concat('|', lhs, rhs, '|'))"
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
        merges.append(
            top.select(
                F.lit(t).alias("iter"),
                "lhs",
                "rhs",
                F.concat("lhs", "rhs").alias("merged"),
                "pair_count",
            )
        )
    return merges


# ---------------------------------------------------------------------------
# Tokenizer APPLICATION: segment every document with the merges the trainer
# just learned — the inference half of the tokenizer story, and the readout
# (compression ratio) a tokenizer is actually judged by.


def _bpe_segment_sql(n_iters: int) -> str:
    def pat(t: int) -> tuple[str, str]:
        l, r = f"coalesce(m.l{t}, '')", f"coalesce(m.r{t}, '')"
        return (f"'|' || {l} || '||' || {r} || '|'", f"'|' || {l} || {r} || '|'")

    applied = "s"
    for t in range(1, n_iters + 1):
        search, repl = pat(t)
        applied = f"replace({applied}, {search}, {repl})"
    m_cols = ", ".join(
        f"(SELECT lhs FROM t{t}) AS l{t}, (SELECT rhs FROM t{t}) AS r{t}"
        for t in range(1, n_iters + 1)
    )
    syms = "(length(s2) - length(replace(s2, '||', ''))) // 2 + 1"
    return f"""WITH {_bpe_train_ctes(n_iters)},
m AS (SELECT {m_cols}),
wd AS (
    SELECT doc_id, w
    FROM (SELECT doc_id,
                 unnest(string_split_regex(trim(lower(translate(text, 'İΣ', 'iσ'))), '\\s+')) AS w
          FROM documents)
    WHERE length(w) >= 2 AND NOT contains(w, '|')
),
seg AS (
    SELECT doc_id, length(w)::BIGINT AS chars, {applied} AS s2
    FROM (SELECT doc_id, w,
                 '|' || array_to_string([c FOR c IN string_split(w, '') IF c <> ''],
                                        '||') || '|' AS s
          FROM wd), m
)
SELECT doc_id,
       count(*)::BIGINT AS n_words,
       sum(chars)::BIGINT AS chars_total,
       sum({syms})::BIGINT AS syms_total,
       round(sum(chars)::DOUBLE / sum({syms}), 6) AS compression_ratio
FROM seg
GROUP BY doc_id
"""


_BPE_SEGMENT_SQL = _bpe_segment_sql(BPE_TRAIN_ITERS)


@register("bpe_segment_docs", oracle=_BPE_SEGMENT_SQL,
          tags=("text", "tokenizer", "bpe"))
def bpe_segment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merges back to every document (train ->
    apply, the full tokenizer loop): each word is re-segmented by
    replaying the 4 merges IN TRAINING ORDER (the same sequential
    wrapped-string replace the trainer used, so segmentation is exactly
    the trained tokenizer's), then per document: word count, character
    total, post-merge symbol total, and the chars-per-symbol compression
    ratio — the metric a tokenizer is graded by. Rounds the trainer
    never filled (exhausted vocabulary) coalesce to a four-pipe pattern
    that cannot occur in wrapped strings, i.e. a no-op replace, on both
    engines.

    Scale shape: the learned merges pivot into ONE broadcast row
    (conditional agg over the 4 winner rows); segmentation is then a
    zero-shuffle projection over the exploded words and one groupBy(doc)
    re-agg — tokenizer inference at corpus scale with no Python and no
    per-row dictionary lookups."""
    merges = _bpe_learned_merges(spark, sf_dir)
    mtab = merges[0]
    for m in merges[1:]:
        mtab = mtab.unionByName(m)
    onerow = mtab.agg(
        *[
            F.max(F.when(F.col("iter") == t, F.col(c))).alias(f"{c[0]}{t}")
            for t in range(1, BPE_TRAIN_ITERS + 1)
            for c in ("lhs", "rhs")
        ]
    )
    words = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.trim(lower_folded(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter((F.length("w") >= 2) & (~F.col("w").contains("|")))
    )
    seg = words.select(
        "doc_id",
        F.length("w").cast("long").alias("chars"),
        F.concat(
            F.lit("|"), F.array_join(F.split("w", ""), "||"), F.lit("|")
        ).alias("s"),
    ).crossJoin(F.broadcast(onerow))
    applied = "s"
    for t in range(1, BPE_TRAIN_ITERS + 1):
        l, r = f"coalesce(l{t}, '')", f"coalesce(r{t}, '')"
        applied = (
            f"replace({applied}, concat('|', {l}, '||', {r}, '|'),"
            f" concat('|', {l}, {r}, '|'))"
        )
    seg = seg.select("doc_id", "chars", F.expr(applied).alias("s2"))
    syms = F.expr("(length(s2) - length(replace(s2, '||', ''))) div 2 + 1")
    return seg.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("chars").alias("chars_total"),
        F.sum(syms).alias("syms_total"),
        F.round(
            F.sum("chars").cast("double") / F.sum(syms), 6
        ).alias("compression_ratio"),
    )


# ---------------------------------------------------------------------------
# WordPiece merge TRAINING (r12): the THIRD tokenizer-trainer family next
# to BPE (greedy count argmax) and unigram-LM (EM prune). WordPiece
# (Schuster & Nakajima 2012; the BERT tokenizer) is BPE's loop with a
# LIKELIHOOD merge criterion — pick the pair maximizing
# count(ab) / (count(a) * count(b)) — and the ## continuation-prefix
# convention (word 'abc' seeds as [a, ##b, ##c]; merging (x, ##y) yields
# 'xy', merging (##x, ##y) yields '##xy', so non-initial symbols are
# ##-prefixed by construction at every round). The score is ONE IEEE
# division of two exactly-representable integers (pair_count and the
# int64 product of the symbol counts), so both engines rank winners on
# bit-identical doubles; all OUTPUT columns stay exact integers/strings.

WP_TRAIN_ITERS = 4


def _wp_train_ctes(n_iters: int) -> str:
    """WITH-body of the WordPiece loop (w0/v0, then p{t}/u{t}/t{t}/v{t}
    per round). Words containing the '|' sentinel OR '#' (which would
    collide with the ## continuation prefix) are excluded, mirrored in
    the Spark builder."""
    ctes = [
        """w0 AS (
    SELECT w, count(*)::BIGINT AS n
    FROM (SELECT unnest(string_split_regex(trim(lower(translate(text, 'İΣ', 'iσ'))), '\\s+')) AS w
          FROM documents)
    WHERE length(w) >= 2 AND NOT contains(w, '|') AND NOT contains(w, '#')
    GROUP BY w
),
v0 AS (
    SELECT n,
           '|' || a[1] || '||##' || array_to_string(a[2:], '||##') || '|' AS s
    FROM (SELECT n, [c FOR c IN string_split(w, '') IF c <> ''] AS a FROM w0)
)"""
    ]
    for t in range(1, n_iters + 1):
        ctes.append(f"""a{t} AS (
    SELECT n, string_split(substr(s, 2, length(s) - 2), '||') AS a FROM v{t - 1}
),
p{t} AS (
    SELECT pr.a AS lhs, pr.b AS rhs, sum(n)::BIGINT AS pair_count
    FROM (SELECT n,
                 unnest([{{'a': a[i], 'b': a[i+1]}} for i in range(1, len(a))]) AS pr
          FROM a{t})
    GROUP BY pr.a, pr.b
),
u{t} AS (
    SELECT sym, sum(n)::BIGINT AS c
    FROM (SELECT n, unnest(a) AS sym FROM a{t})
    GROUP BY sym
),
t{t} AS (
    SELECT p.lhs, p.rhs, p.pair_count, ua.c AS lhs_count, ub.c AS rhs_count
    FROM p{t} p
    JOIN u{t} ua ON ua.sym = p.lhs
    JOIN u{t} ub ON ub.sym = p.rhs
    ORDER BY CAST(p.pair_count AS DOUBLE) / CAST(ua.c * ub.c AS DOUBLE) DESC,
             p.lhs, p.rhs
    LIMIT 1
),
v{t} AS (
    SELECT n, replace(s, '|' || t.lhs || '||' || t.rhs || '|',
                         '|' || t.lhs || substr(t.rhs, 3) || '|') AS s
    FROM v{t - 1}, t{t} t
)""")
    return ",\n".join(ctes)


_WP_TRAIN_SQL = (
    "WITH "
    + _wp_train_ctes(WP_TRAIN_ITERS)
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {t} AS iter, lhs, rhs, lhs || substr(rhs, 3) AS merged,"
        f" pair_count, lhs_count, rhs_count FROM t{t}"
        for t in range(1, WP_TRAIN_ITERS + 1)
    )
)


@register("wordpiece_train_merges", oracle=_WP_TRAIN_SQL,
          tags=("text", "tokenizer", "wordpiece", "iterative"))
def wordpiece_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WordPiece training loop, 4 rounds: count adjacent symbol-pair
    AND per-symbol frequencies over the word-frequency table, pick the
    LIKELIHOOD argmax count(ab)/(count(a)*count(b)) (ties lexicographic),
    merge it everywhere (leftmost non-overlapping, the shared wrapped-
    string replace), recount. Emits the learned merge table (iter, lhs,
    rhs, merged, pair_count, lhs_count, rhs_count) — the denominators
    ride along so the readout stays all-integer (the score itself is
    derived, never stored).

    Distinct from bpe_train_merges in exactly the two ways WordPiece is
    distinct from BPE: the merge criterion (likelihood ratio, which
    prefers RELIABLE pairs over merely frequent ones) and the ##
    continuation convention (merged = lhs || substr(rhs, 3) — every
    non-initial symbol is ##-prefixed by construction, so rhs always
    carries the prefix and the merge strips it once).

    Scale shape: identical to the BPE trainer — training state is the
    word-frequency table, each round is one pair-explode agg + one
    symbol agg folded from the SAME exploded relation, two vocab-keyed
    joins onto the pair table, a 1-row winner broadcast into the merge
    projection, and a checkpoint so round plans stay flat. Cross-engine
    exactness: the ranking double is one division of two exact int64s
    (both < 2^53 at any per-symbol count a single corpus shard can
    produce; the count tables themselves are exact at any scale)."""
    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(lower_folded(F.col("text"))), r"\s+")).alias("w")
        )
        .filter(
            (F.length("w") >= 2)
            & (~F.col("w").contains("|"))
            & (~F.col("w").contains("#"))
        )
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    chars = F.split("w", "")
    vocab = words.select(
        "n",
        F.concat(
            F.lit("|"),
            F.element_at(chars, 1),
            F.lit("||##"),
            F.array_join(F.expr("slice(split(w, ''), 2, size(split(w, '')) - 1)"), "||##"),
            F.lit("|"),
        ).alias("s"),
    ).localCheckpoint(eager=True)

    out = None
    for t in range(1, WP_TRAIN_ITERS + 1):
        arr = F.split(F.expr("substring(s, 2, length(s) - 2)"), r"\|\|")
        syms = vocab.select("n", arr.alias("a")).localCheckpoint(eager=True)
        pairs = (
            syms.filter(F.size("a") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(a) - 1),"
                        " i -> struct(element_at(a, i) AS lhs,"
                        "             element_at(a, i + 1) AS rhs))"
                    )
                ).alias("p"),
            )
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("n").alias("pair_count"))
        )
        counts = (
            syms.select("n", F.explode("a").alias("sym"))
            .groupBy("sym")
            .agg(F.sum("n").alias("c"))
        )
        score = F.col("pair_count").cast("double") / (
            F.col("lhs_count") * F.col("rhs_count")
        ).cast("double")
        top = (
            pairs.join(
                counts.select(F.col("sym").alias("lhs"), F.col("c").alias("lhs_count")),
                "lhs",
            )
            .join(
                counts.select(F.col("sym").alias("rhs"), F.col("c").alias("rhs_count")),
                "rhs",
            )
            .orderBy(F.desc(score), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        vocab = (
            vocab.crossJoin(F.broadcast(top.select("lhs", "rhs")))
            .select(
                "n",
                F.expr(
                    "replace(s, concat('|', lhs, '||', rhs, '|'),"
                    "           concat('|', lhs, substring(rhs, 3), '|'))"
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
        row = top.select(
            F.lit(t).alias("iter"),
            "lhs",
            "rhs",
            F.concat("lhs", F.expr("substring(rhs, 3)")).alias("merged"),
            "pair_count",
            "lhs_count",
            "rhs_count",
        )
        out = row if out is None else out.unionByName(row)
    return out


def _wp_segment_sql(n_iters: int) -> str:
    """Apply-path oracle: replay the learned WordPiece merges in training
    order over every document's words — the wordpiece twin of
    _bpe_segment_sql (same wrapped-string replace, ## stripped once per
    merge; rounds the trainer never filled coalesce to a no-op pattern)."""
    applied = "s"
    for t in range(1, n_iters + 1):
        l, r = f"coalesce(m.l{t}, '')", f"coalesce(m.r{t}, '')"
        applied = (
            f"replace({applied}, '|' || {l} || '||' || {r} || '|',"
            f" '|' || {l} || substr({r}, 3) || '|')"
        )
    m_cols = ", ".join(
        f"(SELECT lhs FROM t{t}) AS l{t}, (SELECT rhs FROM t{t}) AS r{t}"
        for t in range(1, n_iters + 1)
    )
    syms = "(length(s2) - length(replace(s2, '||', ''))) // 2 + 1"
    return f"""WITH {_wp_train_ctes(n_iters)},
m AS (SELECT {m_cols}),
wd AS (
    SELECT doc_id, w
    FROM (SELECT doc_id,
                 unnest(string_split_regex(trim(lower(translate(text, 'İΣ', 'iσ'))), '\\s+')) AS w
          FROM documents)
    WHERE length(w) >= 2 AND NOT contains(w, '|') AND NOT contains(w, '#')
),
seg AS (
    SELECT doc_id, length(w)::BIGINT AS chars, {applied} AS s2
    FROM (SELECT doc_id, w,
                 '|' || a[1] || '||##' || array_to_string(a[2:], '||##') || '|' AS s
          FROM (SELECT doc_id, w,
                       [c FOR c IN string_split(w, '') IF c <> ''] AS a
                FROM wd)), m
)
SELECT doc_id,
       count(*)::BIGINT AS n_words,
       sum(chars)::BIGINT AS chars_total,
       sum({syms})::BIGINT AS syms_total,
       round(sum(chars)::DOUBLE / sum({syms}), 6) AS compression_ratio
FROM seg
GROUP BY doc_id
"""


_WP_SEGMENT_SQL = _wp_segment_sql(WP_TRAIN_ITERS)


@register("wordpiece_segment_docs", oracle=_WP_SEGMENT_SQL,
          tags=("text", "tokenizer", "wordpiece"))
def wordpiece_segment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned WordPiece merges back to every document — the
    inference half, completing train→apply for the THIRD tokenizer
    family (BPE and unigram-LM both already ship theirs). Each word is
    re-seeded with the ## continuation prefix and the 4 merges replay IN
    TRAINING ORDER (sequential wrapped-string replace, ## stripped once
    per merge — exactly the trainer's application), then per document:
    word count, character total, post-merge symbol total, and the
    chars-per-symbol compression ratio.

    Scale shape: identical to bpe_segment_docs — learned winners pivot
    into ONE broadcast row, segmentation is a zero-shuffle projection
    over the exploded words, one groupBy(doc) re-agg; no Python."""
    mtab = wordpiece_train_merges(spark, sf_dir)
    onerow = mtab.agg(
        *[
            F.max(F.when(F.col("iter") == t, F.col(c))).alias(f"{c[0]}{t}")
            for t in range(1, WP_TRAIN_ITERS + 1)
            for c in ("lhs", "rhs")
        ]
    )
    words = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.trim(lower_folded(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(
            (F.length("w") >= 2)
            & (~F.col("w").contains("|"))
            & (~F.col("w").contains("#"))
        )
    )
    seg = words.select(
        "doc_id",
        F.length("w").cast("long").alias("chars"),
        F.concat(
            F.lit("|"),
            F.expr("element_at(split(w, ''), 1)"),
            F.lit("||##"),
            F.array_join(F.expr("slice(split(w, ''), 2, size(split(w, '')) - 1)"), "||##"),
            F.lit("|"),
        ).alias("s"),
    ).crossJoin(F.broadcast(onerow))
    applied = "s"
    for t in range(1, WP_TRAIN_ITERS + 1):
        l, r = f"coalesce(l{t}, '')", f"coalesce(r{t}, '')"
        applied = (
            f"replace({applied}, concat('|', {l}, '||', {r}, '|'),"
            f" concat('|', {l}, substring({r}, 3), '|'))"
        )
    seg = seg.select("doc_id", "chars", F.expr(applied).alias("s2"))
    syms = F.expr("(length(s2) - length(replace(s2, '||', ''))) div 2 + 1")
    return seg.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("chars").alias("chars_total"),
        F.sum(syms).alias("syms_total"),
        F.round(
            F.sum("chars").cast("double") / F.sum(syms), 6
        ).alias("compression_ratio"),
    )


# ---------------------------------------------------------------------------
# Curriculum manifest: the training-order artifact for length-based
# curriculum learning (short -> long, the classic schedule) — every doc
# gets a decile PHASE from the exact corpus length distribution and a
# deterministic shuffle key; the trainer reads ORDER BY (phase,
# shuffle_key) and no global sort ever runs inside the engine.

CURRICULUM_PHASES = 10


_CURRICULUM_SQL = f"""
WITH lens AS (
    SELECT doc_id,
           coalesce(len(string_split_regex(trim(text), '\\s+')), 0)::BIGINT
               AS n_tokens
    FROM documents
),
hist AS (SELECT n_tokens, count(*) AS n FROM lens GROUP BY n_tokens),
cum AS (
    SELECT n_tokens,
           sum(n) OVER (ORDER BY n_tokens ROWS UNBOUNDED PRECEDING) AS cum_n,
           sum(n) OVER () AS total
    FROM hist
),
ph AS (
    SELECT n_tokens,
           ((cum_n * {CURRICULUM_PHASES} + total - 1) // total)::BIGINT AS phase
    FROM cum
)
SELECT l.doc_id, l.n_tokens, p.phase,
       md5('cur:' || l.doc_id) AS shuffle_key
FROM lens l JOIN ph p USING (n_tokens)
"""


@register("doc_curriculum_manifest", oracle=_CURRICULUM_SQL,
          tags=("text", "curriculum", "ordering"))
def doc_curriculum_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-curriculum training manifest: each document's phase is its
    decile in the EXACT corpus token-length distribution (equal-length
    docs always share a phase — the cumulative walk assigns the decile
    per distinct length, integer ceiling math so boundaries are exact),
    plus a deterministic md5 shuffle key for within-phase order. The
    trainer consumes ORDER BY (phase, shuffle_key); the engine never
    globally sorts anything — ordering is the SINK's concern, the
    manifest just carries the keys.

    Scale shape: same exact-quantile trick as
    doc_length_percentile_filter — the corpus collapses to a length
    histogram (one associative agg), the cumulative walk runs on the
    tiny distinct-length grid, and phases ride back over the corpus via
    a broadcast equi-join on length. Zero corpus-sized sorts or windows
    at any scale."""
    lens = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.size(tokens()), F.lit(0)).cast("long").alias("n_tokens"),
    )
    hist = lens.groupBy("n_tokens").agg(F.count("*").alias("n"))
    ph = hist.select(
        "n_tokens",
        F.expr(
            f"(sum(n) OVER (ORDER BY n_tokens ROWS BETWEEN UNBOUNDED PRECEDING"
            f" AND CURRENT ROW) * {CURRICULUM_PHASES}"
            f" + sum(n) OVER () - 1) div sum(n) OVER ()"
        ).cast("bigint").alias("phase"),
    )
    return lens.join(F.broadcast(ph), "n_tokens").select(
        "doc_id",
        "n_tokens",
        "phase",
        F.md5(F.concat(F.lit("cur:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )


# ---------------------------------------------------------------------------
# Source novelty: which sources contribute content nobody else has — the
# data-acquisition readout (pay for the feed whose grams are exclusive,
# not the one that mirrors what the corpus already holds). Gram machinery
# shared with the contamination family (rolling GRAM_N-token md5s).

_NOVELTY_SQL = f"""
WITH docs AS (
    SELECT source, string_split_regex(trim(text), '\\s+') AS t
    FROM documents WHERE text IS NOT NULL
),
sg AS (
    SELECT DISTINCT source, gh FROM (
        SELECT source,
               unnest([md5(array_to_string(t[i:i + {GRAM_N - 1}], ' '))
                       for i in range(1, len(t) - {GRAM_N - 2})]) AS gh
        FROM docs)
),
gc AS (
    SELECT gh, count(*)::BIGINT AS n_sources FROM sg GROUP BY gh
),
tot AS (SELECT count(*)::DOUBLE AS total_grams FROM gc)
SELECT s.source,
       count(*)::BIGINT AS distinct_grams,
       sum(CASE WHEN g.n_sources = 1 THEN 1 ELSE 0 END)::BIGINT
           AS exclusive_grams,
       round(sum(CASE WHEN g.n_sources = 1 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS exclusivity,
       round(count(*) / total_grams, 6) AS corpus_share
FROM sg s JOIN gc g ON g.gh = s.gh, tot
GROUP BY s.source, total_grams
"""


@register("source_ngram_novelty", oracle=_NOVELTY_SQL,
          tags=("text", "governance", "acquisition"))
def source_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source content novelty over rolling GRAM_N-token fingerprints:
    how many distinct grams the source holds, how many exist in NO other
    source (exclusive), the exclusivity ratio, and the source's share of
    the corpus's distinct grams — the evidence for which feeds to keep
    paying for and which merely mirror existing content. Shares the
    contamination family's gram machinery; NULL-text docs contribute
    nothing.

    Scale shape: one (source, gram) distinct (md5 keys, uniform — the
    only corpus-sized shuffle), a gram-grain count that reuses the same
    hash key, a co-keyed equi-join back, and a sources-grain agg with
    the 1-row total broadcast; fan-out is exactly 1 per (source, gram)
    pair, never n²."""
    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    ).select("source", tokens().alias("t"))
    gram_fp = F.when(
        F.size("t") >= GRAM_N,
        F.expr(
            f"transform(sequence(1, size(t) - {GRAM_N - 1}),"
            f" i -> md5(concat_ws(' ', slice(t, i, {GRAM_N}))))"
        ),
    ).otherwise(F.expr("array()"))
    sg = (
        docs.select("source", F.explode(gram_fp).alias("gh"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds the gram counts AND the join
    )
    gc = sg.groupBy("gh").agg(F.count("*").alias("n_sources"))
    tot = gc.agg(F.count("*").cast("double").alias("total_grams"))
    excl = F.sum(F.when(F.col("n_sources") == 1, 1).otherwise(0))
    return (
        sg.join(gc, "gh")
        .groupBy("source")
        .agg(
            F.count("*").alias("distinct_grams"),
            excl.cast("bigint").alias("exclusive_grams"),
            F.round(excl * 1.0 / F.count("*"), 6).alias("exclusivity"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "distinct_grams",
            "exclusive_grams",
            "exclusivity",
            F.round(F.col("distinct_grams") / F.col("total_grams"), 6).alias(
                "corpus_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# BM25 inverted-index retrieval — the LEXICAL twin of ann_cosine_topk.
# The corpus side of RAG is covered (chunks, embeddings, IVF); this is the
# standard hybrid-retrieval baseline every training-data search stack ships
# next to ANN: build a postings relation (term -> doc, tf), score a
# deterministic query-by-example set with BM25 (k1=1.2, b=0.75), top-k per
# query via rank pushdown. Exact arithmetic everywhere integers allow:
# tf/df/dl/N are integers, every per-term contribution is micro-rounded to
# BIGINT before the sum (integer addition is order-free, so the score hash
# can never drift on summation order), and only the final readability
# column divides back to a double.

from e_commerce_click_stream_spark.plans.similarity import (  # noqa: E402
    _TOPK_SQL,
    N_QUERIES,
    TOP_K,
    ann_cosine_topk,
)

BM25_K1 = 1.2
BM25_B = 0.75
_BM25_B1 = 1.0 - BM25_B          # precomputed so both engines share literals
_BM25_K1P1 = BM25_K1 + 1.0
BM25_TOP_K = 10                  # retrieval depth per query
BM25_QUERY_TERMS = 8             # rarest-df terms kept per query doc
_BM25_SCALE = 1_000_000          # micro-units for the order-free integer sum

# Shared CTE prefix: postings (tf per doc-term), document lengths carried
# through the explode (dl computed BEFORE the explode — no extra shuffle),
# document frequency, and the 1-row corpus scalars. ``docs_pred``
# restricts the scored corpus (the erasure oracle appends the NOT-is_new
# split); default "" keeps the full-corpus oracle byte-identical.
def _bm25_core_sql(docs_pred: str = "") -> str:
    return f"""
docs AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS ts
    FROM documents
    WHERE text IS NOT NULL AND trim(text) <> ''{docs_pred}
),
toked AS (
    SELECT doc_id, ts, len(ts)::BIGINT AS dl FROM docs WHERE len(ts) > 0
),
toks AS (
    SELECT doc_id, dl, unnest(ts) AS tok FROM toked
),
tf AS (
    SELECT doc_id, tok, count(*)::BIGINT AS tf, max(dl) AS dl
    FROM toks GROUP BY doc_id, tok
),
dfrel AS (
    SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok
),
scal AS (
    SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_len FROM toked
),
qt AS (
    SELECT q.doc_id AS query_id, q.tok, d.df,
           row_number() OVER (PARTITION BY q.doc_id
                              ORDER BY d.df ASC, q.tok ASC) AS r
    FROM tf q JOIN dfrel d ON d.tok = q.tok
    WHERE q.doc_id < {N_QUERIES} AND d.df >= 2
),
qterms AS (
    SELECT query_id, tok, df FROM qt WHERE r <= {BM25_QUERY_TERMS}
),
cands AS (
    SELECT qterms.query_id, tf.doc_id,
           floor(ln(1 + (s.n_docs - qterms.df + 0.5) / (qterms.df + 0.5))
                 * (tf.tf * {_BM25_K1P1})
                 / (tf.tf + {BM25_K1} * ({_BM25_B1} + {BM25_B} * (tf.dl * s.n_docs / s.total_len)))
                 * {_BM25_SCALE} + 0.5)::BIGINT AS contrib
    FROM tf JOIN qterms ON qterms.tok = tf.tok, scal s
    WHERE tf.doc_id != qterms.query_id
),
scored AS (
    SELECT query_id, doc_id, count(*)::BIGINT AS n_terms,
           sum(contrib)::BIGINT AS score_micro
    FROM cands GROUP BY query_id, doc_id
),
bm_ranked AS (
    SELECT query_id, doc_id, n_terms, score_micro,
           round(score_micro / {_BM25_SCALE}.0, 6) AS bm25,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score_micro DESC, doc_id ASC) AS rank
    FROM scored
)"""


_BM25_CORE_SQL = _bm25_core_sql()

_BM25_TOPK_SQL = f"""
WITH {_BM25_CORE_SQL}
SELECT query_id, doc_id, n_terms, score_micro, bm25, rank::BIGINT AS rank
FROM bm_ranked WHERE rank <= {BM25_TOP_K}
"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, n_terms, score_micro) — the BM25 candidate scores
    shared by the retrieval top-k and the overlap readout."""
    # parsed-SQL projections (the Column chains cost ~1.2k gateway
    # roundtrips of plan construction per run; D-suffixed literals keep
    # every float a DOUBLE exactly as F.lit built them)
    toked = (
        table(spark, sf_dir, "documents")
        .filter("text IS NOT NULL AND trim(text) != ''")
        .selectExpr(
            "doc_id",
            r"filter(split(trim(text), '\\s+'), t -> t != '') AS ts",
        )
        .filter("size(ts) > 0")
        .selectExpr("doc_id", "CAST(size(ts) AS BIGINT) AS dl", "ts")
    )
    toks = toked.select("doc_id", "dl", F.explode("ts").alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(
        F.expr("count(*) AS tf"), F.expr("max(dl) AS dl")
    )
    # tf feeds three consumers (df counts, query-term selection, candidate
    # scoring) — materialize once or the explode+agg recompiles per branch
    tf = tf.localCheckpoint(eager=True)
    # df is only ever consumed for terms that occur in a query document
    # (qt joins it against the broadcast query postings below): restrict
    # the agg to those postings with a broadcast semi-join BEFORE the
    # exchange instead of aggregating the full vocabulary. The df values
    # that survive are computed over exactly the same posting rows, so
    # every downstream number is unchanged; the exchange shrinks from
    # |vocabulary| keys to |query vocabulary| keys (guide §2.3 — shuffle
    # fewer bytes; at corpus scale the full-vocab agg was the dominant
    # non-probe shuffle of this query). The broadcast list is the raw
    # query postings — no distinct: a semi-join only tests existence,
    # and skipping the dedup exchange beat paying it (A/B 2.30→2.15 s).
    qtoks = tf.filter(F.col("doc_id") < N_QUERIES).select("tok")
    dfrel = (
        tf.join(F.broadcast(qtoks), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.expr("count(*) AS df"))
    )
    # corpus scalars from the CHECKPOINTED postings, never a second
    # scan+retokenize of the corpus (every toked doc has >= 1 posting, so
    # the doc set and dl values are identical); partial agg collapses the
    # per-doc rollup to unique doc_ids map-side
    scal = (
        tf.groupBy("doc_id")
        .agg(F.expr("max(dl) AS dl"))
        .agg(F.expr("count(*) AS n_docs"), F.expr("sum(dl) AS total_len"))
    )
    qt = (
        dfrel.filter(F.col("df") >= 2)
        .join(
            F.broadcast(
                tf.filter(F.col("doc_id") < N_QUERIES).select(
                    F.col("doc_id").alias("query_id"), "tok"
                )
            ),
            "tok",
        )
        .selectExpr(
            "query_id", "tok", "df",
            "row_number() OVER (PARTITION BY query_id"
            " ORDER BY df ASC, tok ASC) AS r",
        )
        .filter(F.col("r") <= BM25_QUERY_TERMS)
        .select("query_id", "tok", "df")
    )
    cands = (
        tf.join(F.broadcast(qt), "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .crossJoin(F.broadcast(scal))
    )
    # floor(idf * (tf * (k1+1)) / denom * SCALE + 0.5): literals are
    # str(float)-interpolated (shortest-roundtrip) so the parsed doubles
    # are bit-identical to the F.lit values
    contrib_sql = (
        f"CAST(floor(ln(1 + (n_docs - df + 0.5D) / (df + 0.5D))"
        f" * (tf * {_BM25_K1P1}D)"
        f" / (tf + {BM25_K1}D * ({_BM25_B1}D + {BM25_B}D"
        f" * (dl * n_docs / total_len)))"
        f" * {_BM25_SCALE} + 0.5D) AS BIGINT) AS contrib"
    )
    return cands.selectExpr("query_id", "doc_id", contrib_sql).groupBy(
        "query_id", "doc_id"
    ).agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_terms"),
        F.expr("sum(contrib) AS score_micro"),
    )


def _bm25_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bm25_scored(spark, sf_dir).selectExpr(
        "query_id",
        "doc_id",
        "n_terms",
        "score_micro",
        f"round(score_micro / {float(_BM25_SCALE)}D, 6) AS bm25",
        "CAST(row_number() OVER (PARTITION BY query_id"
        " ORDER BY score_micro DESC, doc_id ASC) AS BIGINT) AS rank",
    )


@register("bm25_topk_retrieval", oracle=_BM25_TOPK_SQL, headline=True,
          tags=("text", "retrieval", "bm25", "topk"))
def bm25_topk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (k1=1.2, b=0.75): the query set is
    query-by-example — each doc_id < N_QUERIES retrieves with its
    BM25_QUERY_TERMS rarest corpus terms (df ascending, token tiebreak;
    hapax terms that could only retrieve the query doc itself are skipped
    via df >= 2), self-matches excluded, top BM25_TOP_K docs per query by
    score with a doc_id tiebreak.

    Exactness: every per-term contribution is micro-rounded to BIGINT
    (floor(w*1e6+0.5)) before summing, so the per-pair score is an
    order-free integer sum — the one pattern that hash-matches across
    engines regardless of reduction order; only the readability column
    divides back to a double.

    Scale shape: doc length is computed BEFORE the token explode and rides
    through it (no per-doc length join); the postings build is ONE hash
    agg on (doc, term); df is a second agg over postings (vocabulary
    cardinality, not corpus); the corpus scalars are a 1-row broadcast;
    query terms are Q x M rows broadcast into the postings scan — the
    postings relation never shuffles for the probe (an inverted-index
    lookup without building the index, exactly how a bucketed postings
    table would serve it); per-query top-k is rank-pushdown
    (WindowGroupLimit heaps), never a global sort."""
    return _bm25_ranked(spark, sf_dir).filter(F.col("rank") <= BM25_TOP_K)


_BM25_ANN_OVERLAP_SQL = f"""
WITH {_BM25_CORE_SQL},
bm AS (
    SELECT query_id, doc_id FROM bm_ranked WHERE rank <= {TOP_K}
),
ann AS ({_TOPK_SQL}),
bmc AS (SELECT query_id, count(*)::BIGINT AS n_bm25 FROM bm GROUP BY query_id),
annc AS (SELECT query_id, count(*)::BIGINT AS n_ann FROM ann GROUP BY query_id),
ov AS (
    SELECT b.query_id, count(*)::BIGINT AS n_overlap
    FROM bm b JOIN ann a ON a.query_id = b.query_id AND a.neighbor_id = b.doc_id
    GROUP BY b.query_id
),
ids AS (
    SELECT DISTINCT query_id FROM (
        SELECT query_id FROM bmc UNION ALL SELECT query_id FROM annc
    ) u
)
SELECT i.query_id,
       coalesce(bmc.n_bm25, 0)::BIGINT AS n_bm25,
       coalesce(annc.n_ann, 0)::BIGINT AS n_ann,
       coalesce(ov.n_overlap, 0)::BIGINT AS n_overlap,
       round(coalesce(ov.n_overlap, 0)
             / (coalesce(bmc.n_bm25, 0) + coalesce(annc.n_ann, 0)
                - coalesce(ov.n_overlap, 0)), 6) AS jaccard
FROM ids i
LEFT JOIN bmc ON bmc.query_id = i.query_id
LEFT JOIN annc ON annc.query_id = i.query_id
LEFT JOIN ov ON ov.query_id = i.query_id
"""


@register("bm25_vs_ann_overlap", oracle=_BM25_ANN_OVERLAP_SQL,
          tags=("text", "retrieval", "bm25", "self-grading"))
def bm25_vs_ann_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval self-grading readout: per query, how much of the
    lexical BM25 top-{TOP_K} agrees with the dense ann_cosine_topk
    top-{TOP_K} (same query ids: doc_id == vec_id < N_QUERIES, both sides
    exclude self). Low jaccard is EXPECTED on decorrelated fixtures — the
    readout's job is to quantify the lexical/dense complementarity a
    hybrid retriever banks on, the same artifact-vs-oracle style as
    ann_recall_eval.

    Scale shape: both top-k relations are <= N_QUERIES * k rows; every
    join here is a broadcast onto the tiny id grid (union-derived, so no
    full-outer shuffle join appears)."""
    bm = (
        _bm25_ranked(spark, sf_dir)
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "doc_id")
        .localCheckpoint(eager=True)  # feeds the count agg AND the overlap join
    )
    ann = (
        ann_cosine_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    bmc = bm.groupBy("query_id").agg(F.count("*").alias("n_bm25"))
    annc = ann.groupBy("query_id").agg(F.count("*").alias("n_ann"))
    ov = (
        bm.join(
            F.broadcast(ann),
            (bm["query_id"] == ann["query_id"]) & (bm["doc_id"] == ann["neighbor_id"]),
        )
        .select(bm["query_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    ids = (
        bmc.select("query_id").unionByName(annc.select("query_id")).distinct()
    )
    n_bm25 = F.coalesce(F.col("n_bm25"), F.lit(0)).cast("long")
    n_ann = F.coalesce(F.col("n_ann"), F.lit(0)).cast("long")
    n_ov = F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long")
    return (
        ids.join(F.broadcast(bmc), "query_id", "left")
        .join(F.broadcast(annc), "query_id", "left")
        .join(F.broadcast(ov), "query_id", "left")
        .select(
            "query_id",
            n_bm25.alias("n_bm25"),
            n_ann.alias("n_ann"),
            n_ov.alias("n_overlap"),
            F.round(n_ov / (n_bm25 + n_ann - n_ov), 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer step (the SentencePiece direction) — the OTHER
# canonical tokenizer family next to BPE: seed a candidate piece vocabulary
# from substring frequencies, Viterbi-segment every word under the current
# piece costs (E-step), re-estimate piece probabilities from the weighted
# segmentation counts (M-step), emit the vocabulary with trained probs and
# the prune verdict. One full EM round with a fixed, deterministic
# recurrence so the whole loop is value-hash-gatable like bpe_train_merges.

UNI_MAX_WORD = 12    # words longer than this are excluded from training
UNI_MAX_PIECE = 4    # seed pieces are substrings of length 1..4
UNI_VOCAB = 48       # multi-char pieces kept (all single chars always kept)
_UNI_SCALE = 1_000_000  # micro-units: piece costs are BIGINT, sums exact

# Viterbi DP state per (word, position): a SINGLE STRING
# 'lpad(cost,13,0) || " " || seg' so the per-position argmin is a plain
# min(string) — (cost asc, seg asc) by construction, portable across
# engines (no struct aggregates, which force SortAggregate in Spark and
# are unsupported as DuckDB arg-min keys). The tie-break is the
# deterministic PER-POSITION rule all three implementations (builder,
# oracle, test reference) share — not a claim of a globally
# lexicographic-minimal segmentation.


def _unigram_seed_ctes() -> str:
    """WITH-body: word-frequency table, substring seed counts, kept vocab
    with micro-costs. Shared by the trainer oracle."""
    return f"""uw AS MATERIALIZED (
    SELECT w AS word, count(*)::BIGINT AS freq
    FROM (SELECT unnest(string_split_regex(trim(lower(translate(text, 'İΣ', 'iσ'))), '\\s+')) AS w
          FROM documents)
    WHERE length(w) BETWEEN 1 AND {UNI_MAX_WORD}
    GROUP BY w
),
usubs AS (
    SELECT piece, sum(freq)::BIGINT AS seed_freq
    FROM (SELECT freq,
                 unnest(flatten(list_transform(range(1, length(word)::BIGINT + 1),
                     i -> list_transform(range(1, least({UNI_MAX_PIECE}, length(word) - i + 1)::BIGINT + 1),
                         k -> substr(word, i::INT, k::INT))))) AS piece
          FROM uw)
    GROUP BY piece
),
umulti AS (
    SELECT piece, seed_freq,
           row_number() OVER (ORDER BY seed_freq DESC, piece ASC) AS rnk
    FROM usubs WHERE length(piece) > 1
),
ukept AS (
    SELECT piece, seed_freq FROM usubs WHERE length(piece) = 1
    UNION ALL
    SELECT piece, seed_freq FROM umulti WHERE rnk <= {UNI_VOCAB}
),
utot AS (SELECT sum(seed_freq)::BIGINT AS total FROM ukept),
uvocab AS MATERIALIZED (
    SELECT k.piece, k.seed_freq,
           floor(-ln(k.seed_freq / t.total) * {_UNI_SCALE} + 0.5)::BIGINT
               AS cost_micro
    FROM ukept k, utot t
)"""


def _unigram_dp_ctes(
    vocab: str = "uvocab", pfx: str = "ub", cand: str = "uc", fin_name: str = "ufin"
) -> str:
    """WITH-body fragments for the unrolled Viterbi DP: {pfx}0..{pfx}{L},
    then {fin_name} (each word's state at its own length). Parameterized
    (r11) so the round-2 EM oracle can unroll a SECOND DP over the
    re-estimated vocabulary in the same WITH chain; the defaults generate
    the round-1 text BYTE-IDENTICALLY (pinned in tests), so the composed
    r10 train/segment oracles are unchanged."""
    ctes = [
        f"""{pfx}0 AS (
    SELECT word, freq, '{'0' * 13}' || ' ' AS st FROM uw
)"""
    ]
    for i in range(1, UNI_MAX_WORD + 1):
        branches = []
        for k in range(1, min(UNI_MAX_PIECE, i) + 1):
            branches.append(f"""    SELECT b.word, b.freq,
           (substr(b.st, 1, 13)::BIGINT + v.cost_micro) AS nc,
           CASE WHEN substr(b.st, 15) = '' THEN v.piece
                ELSE substr(b.st, 15) || ' ' || v.piece END AS seg
    FROM {pfx}{i - k} b JOIN {vocab} v ON v.piece = substr(b.word, {i - k + 1}, {k})
    WHERE length(b.word) >= {i}""")
        ctes.append(f"""{cand}{i} AS (
{(chr(10) + '    UNION ALL' + chr(10)).join(branches)}
),
{pfx}{i} AS MATERIALIZED (
    SELECT word, max(freq) AS freq,
           min(lpad(nc::VARCHAR, 13, '0') || ' ' || seg) AS st
    FROM {cand}{i} GROUP BY word
)""")
    fin = "\nUNION ALL\n".join(
        f"    SELECT word, freq, st FROM {pfx}{i} WHERE length(word) = {i}"
        for i in range(1, UNI_MAX_WORD + 1)
    )
    ctes.append(f"""{fin_name} AS MATERIALIZED (
{fin}
)""")
    return ",\n".join(ctes)


_UNIGRAM_TRAIN_SQL = f"""
WITH {_unigram_seed_ctes()},
{_unigram_dp_ctes()},
uused AS (
    SELECT piece, sum(freq)::BIGINT AS used_count
    FROM (SELECT freq, unnest(string_split(substr(st, 15), ' ')) AS piece
          FROM ufin)
    GROUP BY piece
),
uusedtot AS (SELECT sum(used_count)::BIGINT AS t FROM uused)
SELECT v.piece,
       length(v.piece)::BIGINT AS piece_len,
       v.seed_freq,
       v.cost_micro AS seed_cost_micro,
       coalesce(u.used_count, 0)::BIGINT AS used_count,
       round(coalesce(u.used_count, 0) / t.t, 6) AS new_prob,
       (length(v.piece) = 1 OR coalesce(u.used_count, 0) > 0) AS kept
FROM uvocab v
LEFT JOIN uused u ON u.piece = v.piece, uusedtot t
"""


def _unigram_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        table(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.trim(lower_folded(F.col("text"))), r"\s+")).alias("w")
        )
        .filter(
            (F.length("w") >= 1) & (F.length("w") <= UNI_MAX_WORD)
        )
        .groupBy(F.col("w").alias("word"))
        .agg(F.count("*").alias("freq"))
    )
    return w.localCheckpoint(eager=True)  # feeds the seed explode AND ub0


def _unigram_vocab(words: DataFrame) -> DataFrame:
    subs = (
        words.select(
            "freq",
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(1, length(word)), i -> "
                    f"transform(sequence(1, least({UNI_MAX_PIECE}, length(word) - i + 1)), "
                    f"k -> substring(word, i, k))))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("seed_freq"))
    )
    multi = subs.filter(F.length("piece") > 1).withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("seed_freq"), F.asc("piece"))),
    )
    kept = subs.filter(F.length("piece") == 1).unionByName(
        multi.filter(F.col("rnk") <= UNI_VOCAB).drop("rnk")
    )
    tot = kept.agg(F.sum("seed_freq").alias("total"))
    cost = F.floor(
        -F.log(F.col("seed_freq") / F.col("total")) * F.lit(_UNI_SCALE) + F.lit(0.5)
    ).cast("long")
    return (
        kept.crossJoin(F.broadcast(tot))
        .select("piece", "seed_freq", cost.alias("cost_micro"))
        .localCheckpoint(eager=True)  # joined by every DP round + the output
    )


def _unigram_viterbi(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """The unrolled forward Viterbi DP: (word, freq, st) per training word,
    where st = zero-padded total cost || ' ' || best segmentation. Shared
    by the trainer (M-step input) and the apply path
    (unigram_lm_segment_docs) so the recurrence exists exactly once."""
    best: dict[int, DataFrame] = {
        0: words.select("word", "freq", F.lit("0" * 13 + " ").alias("st"))
    }
    for i in range(1, UNI_MAX_WORD + 1):
        branches = []
        for k in range(1, min(UNI_MAX_PIECE, i) + 1):
            branches.append(
                best[i - k]
                .filter(F.length("word") >= i)
                .select(
                    "word",
                    "freq",
                    "st",
                    F.expr(f"substring(word, {i - k + 1}, {k})").alias("piece"),
                )
            )
        cand = branches[0]
        for b in branches[1:]:
            cand = cand.unionByName(b)
        joined = cand.join(F.broadcast(vocab.select("piece", "cost_micro")), "piece")
        nc = F.substring("st", 1, 13).cast("long") + F.col("cost_micro")
        seg = F.substring("st", 15, 10_000)
        nseg = F.when(seg == "", F.col("piece")).otherwise(
            F.concat(seg, F.lit(" "), F.col("piece"))
        )
        nst = F.concat(F.lpad(nc.cast("string"), 13, "0"), F.lit(" "), nseg)
        best[i] = (
            joined.select("word", "freq", nst.alias("nst"))
            .groupBy("word")
            .agg(F.max("freq").alias("freq"), F.min("nst").alias("st"))
            .localCheckpoint(eager=True)
        )
    fin = None
    for i in range(1, UNI_MAX_WORD + 1):
        part = best[i].filter(F.length("word") == i)
        fin = part if fin is None else fin.unionByName(part)
    return fin


@register("unigram_lm_train", oracle=_UNIGRAM_TRAIN_SQL,
          tags=("text", "tokenizer", "unigram", "iterative"))
def unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (SentencePiece direction), one full
    EM round with a fixed deterministic recurrence: seed pieces = all
    substrings of length 1..{UNI_MAX_PIECE} of the (lowercased,
    length<= {UNI_MAX_WORD}) training words, weighted by word frequency;
    keep every single-char piece plus the top {UNI_VOCAB} multi-char
    pieces (freq desc, piece asc); piece cost = -ln(freq/total) in
    integer micro-units. E-step: exact Viterbi best segmentation per
    word under those costs (forward DP over positions, transitions =
    pieces of length 1..4 ending at the position; per-position argmin by
    (cost, seg) via a zero-padded min(string) — no struct aggregates).
    Single-char coverage guarantees every word segments. M-step:
    frequency-weighted piece usage over the Viterbi segmentations
    re-estimates probabilities; unused multi-char pieces get prob 0 and
    kept=false — the prune verdict. Emits one row per vocab piece.

    Cross-engine exactness: costs are BIGINT micro-units (the DP
    compares exact integers, never floats), the DP state is a single
    string so min() is portable, and only the final re-estimated
    probability divides back to a rounded double.

    Scale shape: training state is the word-frequency table (bounded by
    unique words, not corpus size — one shuffle to build, checkpointed);
    the vocabulary (checkpointed, <= singles + {UNI_VOCAB} rows)
    BROADCASTS into every DP round, so each of the {UNI_MAX_WORD} rounds
    is explode + broadcast-join + one hash agg on word; corpus text is
    scanned exactly once."""
    words = _unigram_words(spark, sf_dir)
    vocab = _unigram_vocab(words)
    fin = _unigram_viterbi(words, vocab)
    used = (
        fin.select(
            "freq",
            F.explode(F.split(F.substring("st", 15, 10_000), " ")).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("used_count"))
    )
    usedtot = used.agg(F.sum("used_count").alias("t"))
    n_used = F.coalesce(F.col("used_count"), F.lit(0)).cast("long")
    return (
        vocab.join(F.broadcast(used), "piece", "left")
        .crossJoin(F.broadcast(usedtot))
        .select(
            "piece",
            F.length("piece").cast("long").alias("piece_len"),
            "seed_freq",
            F.col("cost_micro").alias("seed_cost_micro"),
            n_used.alias("used_count"),
            F.round(n_used / F.col("t"), 6).alias("new_prob"),
            ((F.length("piece") == 1) | (n_used > 0)).alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM apply path: segment every document with the trained vocabulary
# (the tokenizer's inference half, completing the train+apply loop the BPE
# family already has).

_UNIGRAM_SEGMENT_SQL = f"""
WITH {_unigram_seed_ctes()},
{_unigram_dp_ctes()},
wseg AS MATERIALIZED (
    SELECT word,
           len(string_split(substr(st, 15), ' '))::BIGINT AS n_pieces,
           substr(st, 1, 13)::BIGINT AS cost_micro
    FROM ufin
),
dt AS (
    SELECT doc_id, w
    FROM (SELECT doc_id,
                 unnest(string_split_regex(trim(lower(translate(text, 'İΣ', 'iσ'))), '\\s+')) AS w
          FROM documents)
    WHERE length(w) >= 1
)
SELECT d.doc_id,
       count(*) FILTER (WHERE length(d.w) BETWEEN 1 AND {UNI_MAX_WORD})::BIGINT
           AS n_words,
       count(*) FILTER (WHERE length(d.w) > {UNI_MAX_WORD})::BIGINT AS oov_words,
       coalesce(sum(s.n_pieces), 0)::BIGINT AS n_pieces,
       coalesce(sum(s.cost_micro), 0)::BIGINT AS total_cost_micro,
       CASE WHEN count(*) FILTER (WHERE length(d.w) BETWEEN 1 AND {UNI_MAX_WORD}) > 0
            THEN round(coalesce(sum(s.n_pieces), 0)
                       / count(*) FILTER (WHERE length(d.w) BETWEEN 1 AND {UNI_MAX_WORD}), 6)
       END AS pieces_per_word
FROM dt d LEFT JOIN wseg s ON s.word = d.w
GROUP BY d.doc_id
"""


@register("unigram_lm_segment_docs", oracle=_UNIGRAM_SEGMENT_SQL,
          tags=("text", "tokenizer", "unigram"))
def unigram_lm_segment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained unigram-LM vocabulary to every document: each
    trainable word (lowercased, length <= {UNI_MAX_WORD}) carries its
    Viterbi piece count and integer micro-cost from the SHARED DP
    (_unigram_viterbi — the recurrence exists once for train and apply);
    per doc: trainable word count, over-length OOV count, total pieces,
    exact total cost, and the pieces-per-word fertility — the number a
    tokenizer choice is judged by. Per-occurrence semantics: a word
    appearing three times contributes its pieces three times.

    Cross-engine exactness: piece counts and costs are integers; only
    the final fertility divides to a rounded double (NULL when a doc has
    no trainable words).

    Scale shape: the per-WORD segmentation table is vocabulary-sized
    (unique words), built once and joined to the per-occurrence token
    stream on the word key; the doc-grain agg is one shuffle. The
    document text is scanned once for the token stream (the word table's
    scan is shared with the trainer's via the checkpoint)."""
    words = _unigram_words(spark, sf_dir)
    vocab = _unigram_vocab(words)
    wseg = _unigram_viterbi(words, vocab).select(
        "word",
        F.size(F.split(F.substring("st", 15, 10_000), " ")).cast("long").alias(
            "n_pieces"
        ),
        F.substring("st", 1, 13).cast("long").alias("cost_micro"),
    )
    dt = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.trim(lower_folded(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.length("w") >= 1)
    )
    trainable = F.when(
        (F.length("w") >= 1) & (F.length("w") <= UNI_MAX_WORD), 1
    ).otherwise(0)
    oov = F.when(F.length("w") > UNI_MAX_WORD, 1).otherwise(0)
    joined = dt.join(wseg, dt["w"] == wseg["word"], "left")
    n_words = F.sum(trainable).cast("long")
    return joined.groupBy("doc_id").agg(
        n_words.alias("n_words"),
        F.sum(oov).cast("long").alias("oov_words"),
        F.coalesce(F.sum("n_pieces"), F.lit(0)).cast("long").alias("n_pieces"),
        F.coalesce(F.sum("cost_micro"), F.lit(0)).cast("long").alias(
            "total_cost_micro"
        ),
        F.when(
            n_words > 0,
            F.round(F.coalesce(F.sum("n_pieces"), F.lit(0)) / n_words, 6),
        ).alias("pieces_per_word"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval fusion: reciprocal-rank fusion of the lexical (BM25) and
# dense (cosine) top-k lists — the standard way production search stacks
# combine the two retrievers this engine now ships side by side.

RRF_K = 60  # the canonical RRF dampening constant

_RRF_SQL = f"""
WITH {_BM25_CORE_SQL},
bm AS (
    SELECT query_id, doc_id, rank FROM bm_ranked WHERE rank <= {BM25_TOP_K}
),
ann AS ({_TOPK_SQL}),
pairs AS (
    SELECT DISTINCT query_id, doc_id FROM (
        SELECT query_id, doc_id FROM bm
        UNION ALL
        SELECT query_id, neighbor_id AS doc_id FROM ann
    ) u
),
fused AS (
    SELECT p.query_id, p.doc_id,
           b.rank::BIGINT AS bm25_rank,
           a.rank::BIGINT AS ann_rank,
           round(coalesce(1.0 / ({RRF_K} + b.rank), 0)
                 + coalesce(1.0 / ({RRF_K} + a.rank), 0), 6) AS rrf_score
    FROM pairs p
    LEFT JOIN bm b ON b.query_id = p.query_id AND b.doc_id = p.doc_id
    LEFT JOIN ann a ON a.query_id = p.query_id AND a.neighbor_id = p.doc_id
)
SELECT query_id, doc_id, bm25_rank, ann_rank, rrf_score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY rrf_score DESC, doc_id ASC)::BIGINT AS fused_rank
FROM fused
"""


@register("hybrid_rrf_fusion", oracle=_RRF_SQL,
          tags=("text", "retrieval", "hybrid", "self-grading"))
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion over the two retrievers: every (query, doc)
    pair surfaced by EITHER the BM25 top-{BM25_TOP_K} or the dense cosine
    top-k gets rrf = sum over lists of 1/({RRF_K} + rank) (absent list
    contributes 0), re-ranked per query by (rrf desc, doc_id) — the
    k={RRF_K} formulation every hybrid search stack ships. The raw
    per-list ranks ride along so the fused order is auditable against
    its inputs.

    Exactness: each addend is the same two-double sum on both engines
    (identical rank integers, identical literals — no reduction-order
    class since a pair has at most two addends).

    Scale shape: both input lists are <= N_QUERIES x k rows; the pair
    grid is union + distinct over them, and both rank lookups broadcast
    back onto it — no shuffle join; the final per-query re-rank is a
    window over <= 15 rows per query."""
    bm = (
        _bm25_ranked(spark, sf_dir)
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("query_id", "doc_id", F.col("rank").alias("bm25_rank"))
        .localCheckpoint(eager=True)
    )
    ann = (
        ann_cosine_topk(spark, sf_dir)
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("ann_rank"),
        )
        .localCheckpoint(eager=True)
    )
    pairs = (
        bm.select("query_id", "doc_id")
        .unionByName(ann.select("query_id", "doc_id"))
        .distinct()
    )
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("bm25_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("ann_rank")), F.lit(0.0)),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        pairs.join(F.broadcast(bm), ["query_id", "doc_id"], "left")
        .join(F.broadcast(ann), ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "doc_id",
            "bm25_rank",
            "ann_rank",
            rrf.alias("rrf_score"),
        )
        .withColumn("fused_rank", F.row_number().over(w).cast("long"))
    )


# ---------------------------------------------------------------------------
# stored BM25 postings index — the retrieval family's production shape,
# completing the build/probe split the way the MinHash band store (r7/r8)
# and the stored IVF index (r8) were completed. bm25_topk_retrieval pays a
# full corpus tokenize+aggregate on every run; a deployment indexes once,
# probes per batch, and APPENDS new documents (df and the corpus scalars
# are mergeable counts). Both queries share the one-pass oracle: the
# stored paths must produce bit-identical top-k rows.


def _bm25_store_location(sf_dir: str) -> tuple[str, str]:
    from e_commerce_click_stream_spark.operators.storelock import store_location

    return store_location("bm25", sf_dir)


def _bm25_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ts) with the EXACT tokenization of _bm25_scored — one
    definition so the store build and the one-pass scorer can't drift."""
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select("doc_id", F.filter(tokens(), lambda t: t != "").alias("ts"))
        .filter(F.size("ts") > 0)
    )


def _bm25_docs_with_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, is_new, ts) with _bm25_docs' EXACT tokenization plus the
    shared ingest-split flag, checkpointed — ONE definition for every op
    that builds the old half and folds the new batch in (append,
    compact), so the two halves' tokenization can't drift."""
    from e_commerce_click_stream_spark.plans.dedup import is_new_source

    return spread(
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select(
            "doc_id",
            is_new_source().alias("is_new"),
            F.filter(tokens(), lambda t: t != "").alias("ts"),
        )
        .filter(F.size("ts") > 0)
    ).localCheckpoint(eager=True)


def _bm25_store_build(spark: SparkSession, sf_dir: str, index_dir: str, prefix: str) -> None:
    from e_commerce_click_stream_spark.operators.bm25_index import build_postings_index
    from e_commerce_click_stream_spark.operators.storelock import (
        acquire_build_lock,
        downgrade_to_shared,
    )

    acquire_build_lock(index_dir)
    build_postings_index(
        spread(_bm25_docs(spark, sf_dir)), prefix, location=index_dir
    )
    downgrade_to_shared(index_dir)


def _bm25_probe(spark: SparkSession, prefix: str) -> DataFrame:
    from e_commerce_click_stream_spark.operators.bm25_index import probe_postings_index

    return probe_postings_index(
        spark, prefix,
        n_queries=N_QUERIES, query_terms=BM25_QUERY_TERMS, top_k=BM25_TOP_K,
        k1=BM25_K1, b=BM25_B, scale=_BM25_SCALE,
    )


@register("bm25_stored_probe_only", oracle=_BM25_TOPK_SQL, headline=True,
          tags=("text", "retrieval", "bm25", "stored-index", "bench"))
def bm25_stored_probe_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARM-STORE BM25 retrieval: reuse the persisted postings index if
    this session already built it (build only on a cold start) and score
    the query-by-example set purely from the store — zero corpus
    tokenization at probe time. This is what a production user pays per
    retrieval batch once the index is amortized; shares
    bm25_topk_retrieval's oracle, so the green row proves the stored
    path's top-k is bit-identical to the one-pass scorer.

    Store shapes (operators/bm25_index.py): postings + terms tables are
    hash-bucketed AND sorted on tok, so query-term selection is a
    bucket-local join with NO Exchange on either side; the query docs'
    own tf rows reach the postings scan as a pushed doc_id filter; the
    <= N_QUERIES x BM25_QUERY_TERMS selected terms broadcast into the
    candidate scan, so the corpus-sized postings relation never
    shuffles; corpus scalars ride a 1-row broadcast. The probe's only
    shuffles are the tiny query-term window and the per-(query, doc)
    score aggregation + rank."""
    from e_commerce_click_stream_spark.operators.bm25_index import postings_table_names
    from e_commerce_click_stream_spark.operators.storelock import acquire_read_lock

    index_dir, prefix = _bm25_store_location(sf_dir)
    post_t, _, _ = postings_table_names(prefix)
    if not spark.catalog.tableExists(post_t):
        _bm25_store_build(spark, sf_dir, index_dir, prefix)
    else:
        acquire_read_lock(index_dir)
    return _bm25_probe(spark, prefix)


@register("bm25_stored_append", oracle=_BM25_TOPK_SQL,
          tags=("text", "retrieval", "bm25", "stored-index", "incremental"))
def bm25_stored_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental postings maintenance, driver-proven: build the index
    from the already-indexed corpus half (sources below NEW_SRC_MIN — the
    same ingest split the dedup stores use), APPEND the incoming batch,
    then probe. Sharing the full-corpus oracle makes the merge semantics
    the theorem under test: postings of new doc_ids append disjointly in
    the bucket layout, df merges as a per-tok sum, the corpus scalars add
    — so the post-append store must be indistinguishable from a full
    rebuild, down to every micro-rounded score.

    Scale shape: the append tokenizes ONLY the batch; the df merge is one
    key-local agg over |stored terms| + |batch terms| rows and the
    scalar merge is 1+1 rows. Nothing corpus-sized recomputes."""
    from e_commerce_click_stream_spark.operators.bm25_index import (
        append_to_postings_index,
        build_postings_index,
    )
    from e_commerce_click_stream_spark.operators.storelock import (
        acquire_build_lock,
        downgrade_to_shared,
    )

    index_dir, prefix = _bm25_store_location(sf_dir)
    docs = _bm25_docs_with_flag(spark, sf_dir)

    acquire_build_lock(index_dir)
    build_postings_index(
        docs.filter(~F.col("is_new")).select("doc_id", "ts"), prefix,
        location=index_dir,
    )
    append_to_postings_index(
        spark, docs.filter("is_new").select("doc_id", "ts"), prefix,
        location=index_dir,
    )
    downgrade_to_shared(index_dir)
    return _bm25_probe(spark, prefix)


# ---------------------------------------------------------------------------
# Unigram-LM second EM round (r11): SentencePiece trains by ITERATED
# prune-and-reestimate, and one round leaves the re-estimated
# probabilities untested — round 2 closes that fidelity gap. The round-2
# vocabulary is exactly the pieces the round-1 Viterbi USED (every word's
# round-1 segmentation survives, so single-char coverage is inherited by
# construction, never re-asserted); their costs re-estimate from the
# frequency-weighted usage counts; a SECOND unrolled Viterbi under the
# new costs yields the round-2 usage and prune verdict. Same exactness
# discipline: integer micro-costs, string-state DP, one rounded readout.

_UNIGRAM_TRAIN2_SQL = f"""
WITH {_unigram_seed_ctes()},
{_unigram_dp_ctes()},
uused AS (
    SELECT piece, sum(freq)::BIGINT AS used_count
    FROM (SELECT freq, unnest(string_split(substr(st, 15), ' ')) AS piece
          FROM ufin)
    GROUP BY piece
),
uusedtot AS (SELECT sum(used_count)::BIGINT AS t FROM uused),
vvocab AS MATERIALIZED (
    SELECT u.piece, u.used_count,
           floor(-ln(u.used_count / t.t) * {_UNI_SCALE} + 0.5)::BIGINT
               AS cost_micro
    FROM uused u, uusedtot t
),
{_unigram_dp_ctes(vocab="vvocab", pfx="vb", cand="vc", fin_name="vfin")},
vused AS (
    SELECT piece, sum(freq)::BIGINT AS used2
    FROM (SELECT freq, unnest(string_split(substr(st, 15), ' ')) AS piece
          FROM vfin)
    GROUP BY piece
),
vusedtot AS (SELECT sum(used2)::BIGINT AS t FROM vused)
SELECT v.piece,
       length(v.piece)::BIGINT AS piece_len,
       v.used_count AS r1_used_count,
       v.cost_micro AS r2_cost_micro,
       coalesce(u.used2, 0)::BIGINT AS r2_used_count,
       round(coalesce(u.used2, 0) / t.t, 6) AS r2_prob,
       (length(v.piece) = 1 OR coalesce(u.used2, 0) > 0) AS kept
FROM vvocab v
LEFT JOIN vused u ON u.piece = v.piece, vusedtot t
"""


def _unigram_used(fin: DataFrame) -> DataFrame:
    """Frequency-weighted piece usage over a Viterbi output — the M-step
    aggregation, shared by round 1, round 2, and the round-2 vocabulary
    derivation so the usage semantics exist once."""
    return (
        fin.select(
            "freq",
            F.explode(F.split(F.substring("st", 15, 10_000), " ")).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("used_count"))
    )


@register("unigram_lm_train_round2", oracle=_UNIGRAM_TRAIN2_SQL,
          tags=("text", "tokenizer", "unigram", "iterative"))
def unigram_lm_train_round2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second EM round of the unigram-LM trainer: round-1 Viterbi usage
    counts define the round-2 vocabulary (used pieces only — a strict
    subset of round 1's kept set) and its re-estimated integer
    micro-costs -ln(used/total); a second Viterbi under those costs
    re-segments every training word, and the round-2 usage produces the
    next prune verdict. Emits one row per round-2 vocab piece with both
    rounds' counts.

    Scale shape: identical to round 1 ×2 — the word table builds once
    (checkpointed) and feeds BOTH DPs; each vocabulary (checkpointed,
    <= singles + {UNI_VOCAB} rows) broadcasts into its DP rounds; the
    corpus is scanned exactly once for two full EM rounds."""
    words = _unigram_words(spark, sf_dir)
    vocab1 = _unigram_vocab(words)
    fin1 = _unigram_viterbi(words, vocab1)
    usedtot = F.broadcast(_unigram_used(fin1).agg(F.sum("used_count").alias("t")))
    cost2 = F.floor(
        -F.log(F.col("used_count") / F.col("t")) * F.lit(_UNI_SCALE) + F.lit(0.5)
    ).cast("long")
    vocab2 = (
        _unigram_used(fin1)
        .crossJoin(usedtot)
        .select("piece", "used_count", cost2.alias("cost_micro"))
        .localCheckpoint(eager=True)  # joined by every round-2 DP step + output
    )
    fin2 = _unigram_viterbi(words, vocab2)
    used2 = _unigram_used(fin2).withColumnRenamed("used_count", "used2")
    used2tot = F.broadcast(used2.agg(F.sum("used2").alias("t")))
    n2 = F.coalesce(F.col("used2"), F.lit(0)).cast("long")
    return (
        vocab2.join(F.broadcast(used2), "piece", "left")
        .crossJoin(used2tot)
        .select(
            "piece",
            F.length("piece").cast("long").alias("piece_len"),
            F.col("used_count").alias("r1_used_count"),
            F.col("cost_micro").alias("r2_cost_micro"),
            n2.alias("r2_used_count"),
            F.round(n2 / F.col("t"), 6).alias("r2_prob"),
            ((F.length("piece") == 1) | (n2 > 0)).alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style data selection (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling"): score every document by the
# log-likelihood ratio of a TARGET distribution vs the RAW corpus over
# hashed n-gram features. The published recipe hashes n-grams into a
# fixed bucket space and fits two bag-of-buckets models; here the target
# slice is the English subset (lang = 'en' — the "high-quality target"
# stand-in the fixtures support) and features are hashed unigrams. The
# importance weight integrates exactly: per-bucket log ratios are
# micro-rounded to BIGINT once, so every document's score is an
# order-free integer dot product tf · λ_micro — the same exactness
# discipline as BM25 and the unigram costs (and the same ln-boundary
# tripwire covers the new floor).

DSIR_BUCKETS = 4096
DSIR_TARGET_LANG = "en"

_DSIR_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang,
           unnest(string_split_regex(trim(lower(translate(text, 'İΣ', 'iσ'))), '\\s+')) AS w
    FROM documents
    WHERE text IS NOT NULL AND trim(text) <> ''
),
dtb AS (
    SELECT doc_id, lang,
           ('0x' || substr(md5(w), 1, 4))::BIGINT % {DSIR_BUCKETS} AS bucket,
           count(*)::BIGINT AS tf
    FROM toks WHERE w <> ''
    GROUP BY doc_id, lang, bucket
),
bstats AS (
    SELECT bucket,
           sum(tf)::BIGINT AS raw_cnt,
           sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN tf ELSE 0 END)::BIGINT
               AS tgt_cnt
    FROM dtb GROUP BY bucket
),
btot AS (
    SELECT sum(raw_cnt)::BIGINT AS r_total, sum(tgt_cnt)::BIGINT AS t_total
    FROM bstats
),
lam AS (
    SELECT b.bucket,
           floor(ln(((b.tgt_cnt + 1) * (t.r_total + {DSIR_BUCKETS}))
                    / ((b.raw_cnt + 1.0) * (t.t_total + {DSIR_BUCKETS})))
                 * 1000000 + 0.5)::BIGINT AS lam_micro
    FROM bstats b, btot t
),
perdoc AS (
    SELECT d.doc_id,
           sum(d.tf)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_feat_buckets,
           sum(d.tf * l.lam_micro)::BIGINT AS logratio_micro
    FROM dtb d JOIN lam l USING (bucket)
    GROUP BY d.doc_id
),
ptot AS (
    SELECT sum(n_tokens)::BIGINT AS nt_total,
           sum(logratio_micro)::BIGINT AS lr_total
    FROM perdoc
)
SELECT p.doc_id, p.n_tokens, p.n_feat_buckets, p.logratio_micro,
       round(p.logratio_micro / (p.n_tokens * 1000000.0), 6) AS avg_logratio,
       (p.logratio_micro * t.nt_total > p.n_tokens * t.lr_total) AS above_avg
FROM perdoc p, ptot t
"""


@register("dsir_importance_weights", oracle=_DSIR_SQL,
          tags=("text", "selection", "dsir", "importance"))
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights over hashed unigram features: buckets are
    md5-prefix hashes mod {DSIR_BUCKETS} (engine-portable — probed
    identical in Spark conv() and DuckDB '0x' cast), the per-bucket log
    ratio compares add-one-smoothed target (lang = 'en') vs raw corpus
    bucket frequencies, and each document scores the exact integer dot
    product of its bucket tf vector with the micro-rounded ratios.
    Emits per-doc token/bucket counts, the integer score, the per-token
    average readout, and the above_avg flag — the doc's per-token log
    ratio exceeds the corpus per-token average (add-one smoothing with a
    minority target slice biases every ABSOLUTE score slightly negative,
    so the relative cut is the non-vacuous keep signal; a resampler
    keeps docs with probability proportional to exp of the score).

    Scale shape: ONE corpus tokenize into a checkpointed
    (doc, lang, bucket, tf) relation that feeds both model fitting and
    scoring; bucket stats are a single hash agg over it (partial aggs
    collapse hot buckets map-side); the λ table is <= {DSIR_BUCKETS}
    rows — checkpointed and BROADCAST into the scoring join, so the
    corpus-sized side never shuffles for it; per-doc scores are one
    key-local agg. No pair joins, no Python, fan-out exactly 1 per
    (doc, bucket)."""
    toks = (
        spread(table(spark, sf_dir, "documents"))
        .filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select(
            "doc_id",
            "lang",
            F.explode(F.split(F.trim(lower_folded(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("long") % DSIR_BUCKETS
    )
    dtb = (
        toks.select("doc_id", "lang", bucket.alias("bucket"))
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)  # feeds model fitting AND scoring
    )
    bstats = (
        dtb.groupBy("bucket")
        .agg(
            F.sum("tf").alias("raw_cnt"),
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("tf")).otherwise(0)
            ).alias("tgt_cnt"),
        )
        .localCheckpoint(eager=True)  # <= DSIR_BUCKETS rows; feeds totals + lam
    )
    btot = bstats.agg(
        F.sum("raw_cnt").alias("r_total"), F.sum("tgt_cnt").alias("t_total")
    )
    lam_micro = F.floor(
        F.log(
            ((F.col("tgt_cnt") + 1) * (F.col("r_total") + F.lit(DSIR_BUCKETS)))
            / ((F.col("raw_cnt") + F.lit(1.0)) * (F.col("t_total") + F.lit(DSIR_BUCKETS)))
        )
        * F.lit(1_000_000)
        + F.lit(0.5)
    ).cast("long")
    lam = bstats.crossJoin(F.broadcast(btot)).select(
        "bucket", lam_micro.alias("lam_micro")
    )
    perdoc = (
        dtb.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.count("*").alias("n_feat_buckets"),
            F.sum(F.col("tf") * F.col("lam_micro")).alias("logratio_micro"),
        )
        .localCheckpoint(eager=True)  # feeds the corpus totals AND the output
    )
    ptot = perdoc.agg(
        F.sum("n_tokens").alias("nt_total"),
        F.sum("logratio_micro").alias("lr_total"),
    )
    # above_avg compares the doc's per-token ratio to the corpus per-token
    # average by EXACT BIGINT cross-multiplication — no float compare, no
    # summation-order hazard. Width: |logratio_micro| * nt_total stays
    # far under 2^63 at these scales; a web-scale deployment promotes the
    # comparison to DECIMAL(38) (Spark long*long wraps silently where
    # DuckDB errors — the overflow behaviors DIVERGE, so the width note
    # is load-bearing).
    return perdoc.crossJoin(F.broadcast(ptot)).select(
        "doc_id",
        "n_tokens",
        "n_feat_buckets",
        "logratio_micro",
        F.round(
            F.col("logratio_micro") / (F.col("n_tokens") * F.lit(1_000_000.0)), 6
        ).alias("avg_logratio"),
        (
            F.col("logratio_micro") * F.col("nt_total")
            > F.col("n_tokens") * F.col("lr_total")
        ).alias("above_avg"),
    )


# ---------------------------------------------------------------------------
# Trained quality classifier (VERDICT r11 #3): the CCNet/LLaMA-pipeline
# pattern — fit a cheap linear classifier on heuristic quality labels,
# then use its scores as the production filter. Here the label is the
# Gopher structural gate (doc_gopher_quality_flags' conjunction) and the
# model is binary multinomial Naive Bayes with add-one smoothing over
# hashed unigram buckets — counting fit = hash aggregates, the same
# discipline as dsir_importance_weights' λ table. Per-bucket log-odds
# weights and the class prior are micro-rounded to BIGINT once, so every
# document's log-odds is an order-free exact integer dot product and the
# keep decision (log_odds > 0) is an integer compare on both engines.

NB_BUCKETS = 4096

# label CTE: the committed Gopher battery verbatim (byte-shared with
# _GOPHER_SQL), gate coalesced to false (NULL-text docs never tokenize
# anyway), text re-attached for the feature tokenize. The label is the
# battery's STRUCTURAL conjunction — every rule except the required-
# English-stopword one, which the synthetic multilingual corpus fails
# categorically (0/500 docs at sf0.01) and would degenerate the label
# to all-negative; the remaining six rules split the fixtures ~55/45.
_NB_CORE_CTES = f"""gopher AS ({_GOPHER_SQL}),
lab AS (
    SELECT g.doc_id,
           coalesce(g.words_in_range AND g.mean_len_ok AND g.symbol_ok
                    AND g.bullet_ok AND g.ellipsis_ok AND g.alpha_ok,
                    false) AS label,
           d.text
    FROM gopher g JOIN documents d USING (doc_id)
),
toks AS (
    SELECT doc_id, label,
           unnest(string_split_regex(trim({sql_lower_folded("text")}), '\\s+')) AS w
    FROM lab
    WHERE text IS NOT NULL AND trim(text) <> ''
),
dtb AS (
    SELECT doc_id, label,
           ('0x' || substr(md5(w), 1, 4))::BIGINT % {NB_BUCKETS} AS bucket,
           count(*)::BIGINT AS tf
    FROM toks WHERE w <> ''
    GROUP BY doc_id, label, bucket
),
bstats AS (
    SELECT bucket,
           sum(CASE WHEN label THEN tf ELSE 0 END)::BIGINT AS pos_cnt,
           sum(CASE WHEN label THEN 0 ELSE tf END)::BIGINT AS neg_cnt
    FROM dtb GROUP BY bucket
),
btot AS (
    SELECT sum(pos_cnt)::BIGINT AS p_total, sum(neg_cnt)::BIGINT AS n_total
    FROM bstats
),
nbw AS (
    SELECT b.bucket,
           floor(ln(((b.pos_cnt + 1) * (t.n_total + {NB_BUCKETS}))
                    / ((b.neg_cnt + 1.0) * (t.p_total + {NB_BUCKETS})))
                 * 1000000 + 0.5)::BIGINT AS w_micro
    FROM bstats b, btot t
),
perdoc AS (
    SELECT d.doc_id, d.label,
           sum(d.tf)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_feat_buckets,
           sum(d.tf * nbw.w_micro)::BIGINT AS dot_micro
    FROM dtb d JOIN nbw USING (bucket)
    GROUP BY d.doc_id, d.label
),
prior AS (
    SELECT floor(ln((sum(CASE WHEN label THEN 1 ELSE 0 END) + 1.0)
                    / (sum(CASE WHEN label THEN 0 ELSE 1 END) + 1))
                 * 1000000 + 0.5)::BIGINT AS prior_micro
    FROM perdoc
)"""

_NB_CLASSIFIER_SQL = f"""
WITH {_NB_CORE_CTES}
SELECT p.doc_id, p.label, p.n_tokens, p.n_feat_buckets,
       (p.dot_micro + r.prior_micro)::BIGINT AS log_odds_micro,
       (p.dot_micro + r.prior_micro > 0) AS pred_keep
FROM perdoc p, prior r
"""

_NB_CONFUSION_SQL = f"""
WITH {_NB_CORE_CTES}
SELECT p.label, (p.dot_micro + r.prior_micro > 0) AS pred_keep,
       count(*)::BIGINT AS n_docs,
       sum(p.n_tokens)::BIGINT AS n_tokens
FROM perdoc p, prior r
GROUP BY p.label, (p.dot_micro + r.prior_micro > 0)
"""


def _nb_dtb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The labeled hashed-TF relation (doc_id, label, bucket, tf) every NB
    path starts from — ONE zero-shuffle label+tokenize projection, one
    hash agg, eagerly checkpointed (in-query fit+score reads it twice;
    the stored-weights probe tokenizes its batch through the same
    definition so the store and probe tokenizations can't drift)."""
    flagged = gopher_flags_df(
        spread(table(spark, sf_dir, "documents")), keep_text=True
    ).select(
        "doc_id",
        F.coalesce(
            F.col("words_in_range")
            & F.col("mean_len_ok")
            & F.col("symbol_ok")
            & F.col("bullet_ok")
            & F.col("ellipsis_ok")
            & F.col("alpha_ok"),
            F.lit(False),
        ).alias("label"),
        "text",
    )
    toks = (
        flagged.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select(
            "doc_id",
            "label",
            F.explode(
                F.split(F.trim(lower_folded(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("long") % NB_BUCKETS
    )
    return (
        toks.select("doc_id", "label", bucket.alias("bucket"))
        .groupBy("doc_id", "label", "bucket")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)  # feeds model fitting AND scoring
    )


def _nb_weights(dtb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Fit from the hashed-TF relation: (weights (bucket, w_micro),
    prior (1-row prior_micro)) — two hash aggregates, both tiny."""
    bstats = (
        dtb.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("label"), F.col("tf")).otherwise(0)).alias(
                "pos_cnt"
            ),
            F.sum(F.when(F.col("label"), 0).otherwise(F.col("tf"))).alias(
                "neg_cnt"
            ),
        )
        .localCheckpoint(eager=True)  # <= NB_BUCKETS rows; feeds totals + nbw
    )
    btot = bstats.agg(
        F.sum("pos_cnt").alias("p_total"), F.sum("neg_cnt").alias("n_total")
    )
    w_micro = F.floor(
        F.log(
            ((F.col("pos_cnt") + 1) * (F.col("n_total") + F.lit(NB_BUCKETS)))
            / (
                (F.col("neg_cnt") + F.lit(1.0))
                * (F.col("p_total") + F.lit(NB_BUCKETS))
            )
        )
        * F.lit(1_000_000)
        + F.lit(0.5)
    ).cast("long")
    return bstats.crossJoin(F.broadcast(btot)).select(
        "bucket", w_micro.alias("w_micro")
    )


def _nb_prior_expr():
    """floor(ln((n_pos+1)/(n_neg+1))*1e6+0.5) over per-doc label rows —
    one definition so the in-query path (over the perdoc relation) and
    the stored-weights build (over distinct dtb docs) cannot drift."""
    return (
        F.floor(
            F.log(
                (
                    F.sum(F.when(F.col("label"), 1).otherwise(0)) + F.lit(1.0)
                )
                / (F.sum(F.when(F.col("label"), 0).otherwise(1)) + F.lit(1))
            )
            * F.lit(1_000_000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("prior_micro")
    )


def _nb_perdoc(dtb: DataFrame, nbw: DataFrame) -> DataFrame:
    """Score the hashed-TF relation against a weight table (broadcast):
    per-doc (label, n_tokens, n_feat_buckets, dot_micro), checkpointed
    (the in-query path reads it for the prior AND the output)."""
    return (
        dtb.join(F.broadcast(nbw), "bucket")
        .groupBy("doc_id", "label")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.count("*").alias("n_feat_buckets"),
            F.sum(F.col("tf") * F.col("w_micro")).alias("dot_micro"),
        )
        .localCheckpoint(eager=True)  # feeds the prior AND the output
    )


def _nb_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared in-query fit+score chain: per-doc (label, n_tokens,
    n_feat_buckets, dot_micro) with the 1-row micro prior attached by
    broadcast."""
    dtb = _nb_dtb(spark, sf_dir)
    perdoc = _nb_perdoc(dtb, _nb_weights(dtb))
    prior = perdoc.agg(_nb_prior_expr())
    return perdoc.crossJoin(F.broadcast(prior))


def _nb_final_select(scored: DataFrame) -> DataFrame:
    return scored.select(
        "doc_id",
        "label",
        "n_tokens",
        "n_feat_buckets",
        (F.col("dot_micro") + F.col("prior_micro")).alias("log_odds_micro"),
        (F.col("dot_micro") + F.col("prior_micro") > 0).alias("pred_keep"),
    )


@register("quality_nb_classifier", oracle=_NB_CLASSIFIER_SQL,
          tags=("text", "quality", "classifier", "nb"))
def quality_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive Bayes quality classifier trained IN the engine on the Gopher
    structural gate: labels are the committed rule battery's conjunction
    minus the required-English-stopword rule (gopher_flags_df, byte-
    shared with its oracle; the stopword rule is all-false on the
    synthetic corpus and would degenerate the label), features are
    md5-prefix hashed unigram
    buckets mod {NB_BUCKETS} over the folded lowercase, and the model is
    two hash aggregates (per-bucket class counts + totals). Per-bucket
    add-one-smoothed log-odds and the class prior are micro-rounded to
    BIGINT once, so each document's log_odds_micro is an exact
    order-free integer dot product plus the prior, and pred_keep is an
    integer zero compare. Swapping the fixed-weight filter
    (doc_quality_linear_score) for TRAINED weights keeps the scoring
    plan shape — exactly the swap-in that op's docstring promises.

    Fixture caveat (same class as doc_line_boilerplate_scrub's single-
    line note): the synthetic corpus draws every document from ONE
    shared 31-word pool, so no label is lexically separable there and
    the training fit degenerates to the class prior; real lexical
    learning (disjoint vocabularies -> 100% training fit, both
    confusion cells populated) is pinned against a pure-Python NB
    reference on a constructed corpus in tests/test_round12_ops.py.

    Scale shape: label + tokenize happen in ONE zero-shuffle projection
    (keep_text threads text through the flag battery — no corpus-sized
    label join); ONE corpus tokenize into a checkpointed
    (doc, label, bucket, tf) relation feeds both fit and score; the
    weight table is <= {NB_BUCKETS} rows, BROADCAST into the scoring
    join so the corpus-sized side never shuffles for it; the prior is a
    1-row broadcast. Same width headroom as DSIR: |dot_micro| stays far
    under 2^63 (ln ratios are O(10), micro-scaled O(10^7), times tf
    O(10^4) per doc)."""
    return _nb_final_select(_nb_scored(spark, sf_dir))


@register("quality_nb_confusion", oracle=_NB_CONFUSION_SQL,
          tags=("text", "quality", "classifier", "nb", "eval"))
def quality_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-graded confusion readout for quality_nb_classifier: training-
    fit (label, pred_keep) cells with document and token mass per cell —
    the calibration view every heuristic-label classifier swap is judged
    by (how much of the corpus the trained filter moves relative to the
    rule battery it imitates). <= 4 rows; same fit chain, one extra
    4-group hash agg over the checkpointed per-doc relation."""
    scored = _nb_scored(spark, sf_dir)
    return (
        scored.groupBy(
            "label",
            (F.col("dot_micro") + F.col("prior_micro") > 0).alias("pred_keep"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# NB classifier ROC curve (r12): quality_nb_confusion grades ONE
# operating point (log_odds > 0); every deployed quality filter is
# instead tuned by sweeping the threshold — the ROC/precision readout.
# The sweep is exact and scale-safe: scores bin into NB_ROC_BINS
# integer-edged buckets between the corpus min/max log-odds (pure BIGINT
# math — no float boundary can disagree between engines), one hash agg
# counts (pos, neg) per bin, and suffix sums over the <= NB_ROC_BINS
# rows turn bin counts into per-threshold TP/FP — the same
# histogram-then-tiny-window discipline as doc_length_percentile_filter,
# so no per-threshold corpus fan-out and no corpus-sized sort.

NB_ROC_BINS = 16

_NB_ROC_SQL = f"""
WITH {_NB_CORE_CTES},
sc AS (
    SELECT p.label, (p.dot_micro + r.prior_micro)::BIGINT AS lo
    FROM perdoc p, prior r
),
mm AS (
    SELECT min(lo) AS lo_min, max(lo) AS lo_max,
           sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS pos_total,
           sum(CASE WHEN label THEN 0 ELSE 1 END)::BIGINT AS neg_total
    FROM sc
),
binned AS (
    SELECT ((s.lo - m.lo_min) * {NB_ROC_BINS})
               // (m.lo_max - m.lo_min + 1) AS bin,
           sum(CASE WHEN s.label THEN 1 ELSE 0 END)::BIGINT AS pos_n,
           sum(CASE WHEN s.label THEN 0 ELSE 1 END)::BIGINT AS neg_n
    FROM sc s, mm m
    GROUP BY 1
),
grid AS (
    SELECT g.k, m.lo_min, m.lo_max, m.pos_total, m.neg_total
    FROM (SELECT unnest(range({NB_ROC_BINS})) AS k) g, mm m
    WHERE m.lo_min IS NOT NULL
),
curve AS (
    SELECT g.k,
           (g.lo_min
            + (g.k * (g.lo_max - g.lo_min + 1) + {NB_ROC_BINS - 1})
              // {NB_ROC_BINS})::BIGINT
               AS threshold_micro,
           g.pos_total, g.neg_total,
           sum(coalesce(b.pos_n, 0)) OVER (ORDER BY g.k DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS tp,
           sum(coalesce(b.neg_n, 0)) OVER (ORDER BY g.k DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS fp
    FROM grid g LEFT JOIN binned b ON b.bin = g.k
)
SELECT k::BIGINT AS k, threshold_micro, tp, fp,
       (pos_total - tp)::BIGINT AS fn,
       (neg_total - fp)::BIGINT AS tn,
       CASE WHEN pos_total > 0 THEN round(tp * 1.0 / pos_total, 6) END AS tpr,
       CASE WHEN neg_total > 0 THEN round(fp * 1.0 / neg_total, 6) END AS fpr,
       CASE WHEN tp + fp > 0 THEN round(tp * 1.0 / (tp + fp), 6) END
           AS precision_at_k
FROM curve
"""


@register("quality_nb_roc_curve", oracle=_NB_ROC_SQL,
          tags=("text", "quality", "classifier", "nb", "eval"))
def quality_nb_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sweep calibration for the trained NB classifier: 16
    integer-edged score bins between the corpus min/max log-odds, one
    (tp, fp, fn, tn, tpr, fpr, precision) row per threshold — the ROC
    readout a deployed quality filter is tuned by, completing the
    classifier family (fit → score → single-point confusion → curve).
    Bin edges and thresholds are pure BIGINT arithmetic on the exact
    micro log-odds (both engines bin identically; rates round once at
    the readout); ``threshold_micro`` is the TRUE lower edge of bin k —
    ``lo_min + ceil(k*span/bins)``, the smallest score the bin admits —
    so ``pred = lo >= threshold_micro`` holds exactly (ADVICE r12: the
    earlier floor edge excluded scores in the floor..ceil gap from tp/fp
    when ``k*span % bins != 0``); k=0 keeps everything and higher k
    tightens the filter.

    Scale shape: the fit+score chain is quality_nb_classifier's; the
    sweep adds ONE hash agg to bin the per-doc scores (map-side
    partials collapse to <= NB_ROC_BINS rows per partition — never a
    per-threshold corpus fan-out), a 1-row min/max/total broadcast, and
    a window over the NB_ROC_BINS-row grid. Empty corpus ⇒ empty curve
    (the grid derives from the guarded min/max row)."""
    scored = _nb_scored(spark, sf_dir)
    sc = scored.select(
        "label", (F.col("dot_micro") + F.col("prior_micro")).alias("lo")
    ).localCheckpoint(eager=True)  # feeds min/max AND the bin agg
    mm = sc.agg(
        F.min("lo").alias("lo_min"),
        F.max("lo").alias("lo_max"),
        F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("long").alias("pos_total"),
        F.sum(F.when(F.col("label"), 0).otherwise(1)).cast("long").alias("neg_total"),
    )
    binned = (
        sc.crossJoin(F.broadcast(mm))
        .select(
            F.expr(
                f"((lo - lo_min) * {NB_ROC_BINS}) DIV (lo_max - lo_min + 1)"
            ).alias("bin"),
            "label",
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("long").alias("pos_n"),
            F.sum(F.when(F.col("label"), 0).otherwise(1)).cast("long").alias("neg_n"),
        )
    )
    grid = (
        mm.filter(F.col("lo_min").isNotNull())
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(NB_ROC_BINS - 1))).alias("k"),
            "lo_min",
            "lo_max",
            "pos_total",
            "neg_total",
        )
    )
    w = (
        Window.orderBy(F.desc("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = grid.join(F.broadcast(binned), grid.k == binned.bin, "left").select(
        "k",
        F.expr(
            f"CAST(lo_min + (k * (lo_max - lo_min + 1) + {NB_ROC_BINS - 1})"
            f" DIV {NB_ROC_BINS} AS BIGINT)"
        ).alias("threshold_micro"),
        "pos_total",
        "neg_total",
        F.sum(F.coalesce("pos_n", F.lit(0))).over(w).cast("long").alias("tp"),
        F.sum(F.coalesce("neg_n", F.lit(0))).over(w).cast("long").alias("fp"),
    )
    return curve.select(
        F.col("k").cast("long").alias("k"),
        "threshold_micro",
        "tp",
        "fp",
        (F.col("pos_total") - F.col("tp")).cast("long").alias("fn"),
        (F.col("neg_total") - F.col("fp")).cast("long").alias("tn"),
        F.when(
            F.col("pos_total") > 0, F.round(F.col("tp") * 1.0 / F.col("pos_total"), 6)
        ).alias("tpr"),
        F.when(
            F.col("neg_total") > 0, F.round(F.col("fp") * 1.0 / F.col("neg_total"), 6)
        ).alias("fpr"),
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.round(F.col("tp") * 1.0 / (F.col("tp") + F.col("fp")), 6),
        ).alias("precision_at_k"),
    )


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (VERDICT r11 #4): the one-line-per-stage
# readout every real curation run is judged by. Chains the engine's
# existing stages over a SINGLE corpus scan — line-level boilerplate
# scrub (doc_line_boilerplate_scrub's key), exact dedup on the scrubbed
# text (dedup_exact's fingerprint), the Gopher structural gate
# (gopher_flags_df, stopword rule excluded as in quality_nb_classifier),
# DSIR above-average selection re-fit on the gate survivors, and the
# per-source greedy sequence pack (doc_pack_sequences' discipline) —
# emitting surviving document count and token mass after every stage.

# dedup_exact's normalized fingerprint, composed from the shared fold
# fragment (textops contract: oracles splice sql_lower_folded, never
# hand-inline the case map); precomputed because f-string expressions
# cannot carry backslashes on this Python
_EXACT_FP_NORM = sql_lower_folded("regexp_replace(trim(text), '\\s+', ' ', 'g')")

_CURATION_SQL = f"""
WITH ls AS (
    SELECT doc_id, lang, source, string_split(text, chr(10)) AS ls
    FROM documents WHERE text IS NOT NULL
),
clines AS (
    SELECT doc_id, lang, source, s.i AS i, s.l AS line,
           {_LINE_SCRUB_NORM} AS norm,
           len(list_filter(string_split_regex(trim({sql_lower_folded("s.l")}), '\\s+'),
                           x -> x <> ''))::BIGINT AS tok_cnt
    FROM (SELECT doc_id, lang, source,
                 unnest([{{'i': i, 'l': ls[i + 1]}}
                         for i in range(0, len(ls))]) AS s
          FROM ls)
),
keyed AS (
    SELECT doc_id, lang, source, i, line, tok_cnt,
           CASE WHEN norm = '' THEN NULL ELSE md5(norm) END AS fp
    FROM clines
),
freq AS (
    SELECT fp, count(DISTINCT doc_id)::BIGINT AS ndocs
    FROM keyed WHERE fp IS NOT NULL GROUP BY fp
),
s1 AS (
    SELECT k.doc_id, k.lang, k.source,
           sum(k.tok_cnt)::BIGINT AS raw_tokens,
           sum(CASE WHEN k.fp IS NOT NULL AND f.ndocs < {LINE_DF_DOCS}
                    THEN k.tok_cnt ELSE 0 END)::BIGINT AS clean_tokens,
           string_agg(CASE WHEN k.fp IS NOT NULL AND f.ndocs < {LINE_DF_DOCS}
                           THEN k.line END, chr(10) ORDER BY k.i) AS text
    FROM keyed k LEFT JOIN freq f USING (fp)
    GROUP BY k.doc_id, k.lang, k.source
),
s1k AS (SELECT * FROM s1 WHERE text IS NOT NULL),
s2 AS (
    SELECT * FROM s1k
    QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5({_EXACT_FP_NORM}))
),
gph AS ({_gopher_sql("s2")}),
s3 AS (
    SELECT s2.* FROM s2 JOIN gph g USING (doc_id)
    WHERE g.words_in_range AND g.mean_len_ok AND g.symbol_ok
      AND g.bullet_ok AND g.ellipsis_ok AND g.alpha_ok
),
toks3 AS (
    SELECT doc_id, lang, source,
           unnest(string_split_regex(trim({sql_lower_folded("text")}), '\\s+')) AS w
    FROM s3
),
dtb3 AS (
    SELECT doc_id, lang, source,
           ('0x' || substr(md5(w), 1, 4))::BIGINT % {DSIR_BUCKETS} AS bucket,
           count(*)::BIGINT AS tf
    FROM toks3 WHERE w <> ''
    GROUP BY doc_id, lang, source, bucket
),
bstats3 AS (
    SELECT bucket,
           sum(tf)::BIGINT AS raw_cnt,
           sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN tf ELSE 0 END)::BIGINT
               AS tgt_cnt
    FROM dtb3 GROUP BY bucket
),
btot3 AS (
    SELECT sum(raw_cnt)::BIGINT AS r_total, sum(tgt_cnt)::BIGINT AS t_total
    FROM bstats3
),
lam3 AS (
    SELECT b.bucket,
           floor(ln(((b.tgt_cnt + 1) * (t.r_total + {DSIR_BUCKETS}))
                    / ((b.raw_cnt + 1.0) * (t.t_total + {DSIR_BUCKETS})))
                 * 1000000 + 0.5)::BIGINT AS lam_micro
    FROM bstats3 b, btot3 t
),
pd3 AS (
    SELECT d.doc_id, d.source,
           sum(d.tf)::BIGINT AS n_tokens,
           sum(d.tf * l.lam_micro)::BIGINT AS logratio_micro
    FROM dtb3 d JOIN lam3 l USING (bucket)
    GROUP BY d.doc_id, d.source
),
pt3 AS (
    SELECT sum(n_tokens)::BIGINT AS nt_total, sum(logratio_micro)::BIGINT AS lr_total
    FROM pd3
),
s4 AS (
    SELECT p.doc_id, p.source, p.n_tokens
    FROM pd3 p, pt3 t
    WHERE p.logratio_micro * t.nt_total > p.n_tokens * t.lr_total
),
cum AS (
    SELECT source, doc_id, n_tokens,
           sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_tok
    FROM s4
),
packed AS (
    SELECT source, doc_id, n_tokens,
           floor((cum_tok - n_tokens) / {SEQ_TOKEN_BUDGET})::BIGINT AS seq_id
    FROM cum
)
SELECT 0 AS stage_idx, 'raw' AS stage,
       (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT coalesce(sum(raw_tokens), 0) FROM s1)::BIGINT AS n_tokens,
       NULL::BIGINT AS n_shards
UNION ALL
SELECT 1, 'line_scrub', count(*)::BIGINT,
       coalesce(sum(clean_tokens), 0)::BIGINT, NULL::BIGINT FROM s1k
UNION ALL
SELECT 2, 'exact_dedup', count(*)::BIGINT,
       coalesce(sum(clean_tokens), 0)::BIGINT, NULL::BIGINT FROM s2
UNION ALL
SELECT 3, 'quality_gate', count(*)::BIGINT,
       coalesce(sum(clean_tokens), 0)::BIGINT, NULL::BIGINT FROM s3
UNION ALL
SELECT 4, 'dsir_select', count(*)::BIGINT,
       coalesce(sum(n_tokens), 0)::BIGINT, NULL::BIGINT FROM s4
UNION ALL
SELECT 5, 'pack', count(*)::BIGINT, coalesce(sum(n_tokens), 0)::BIGINT,
       (SELECT count(*) FROM (SELECT DISTINCT source, seq_id FROM packed) q)::BIGINT
FROM packed
"""


@register("corpus_curation_run", oracle=_CURATION_SQL, headline=True,
          tags=("text", "pipeline", "curation", "readout"))
def corpus_curation_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline readout: per-stage surviving document
    count and token mass through raw -> line scrub -> exact dedup ->
    structural quality gate -> DSIR above-average selection -> per-source
    sequence pack (with the packed-sequence count). Every stage applies
    the engine's committed primitive to the PREVIOUS stage's survivors:
    the scrub rewrites text from kept lines (doc_line_boilerplate_scrub's
    normalization key), dedup fingerprints the SCRUBBED text
    (dedup_exact's normalized md5), the gate is the Gopher structural
    battery over scrubbed text (gopher_flags_df; stopword rule excluded
    per quality_nb_classifier's fixture note), DSIR re-fits its bucket
    models on the gate survivors (lam formula byte-shared with
    dsir_importance_weights), and packing follows doc_pack_sequences'
    per-source greedy discipline at SEQ_TOKEN_BUDGET.

    Token accounting: raw token mass is summed from the scrub's own
    per-line counts (folded-lower \\s+ tokens), so stage 0 costs no
    second corpus scan — the only extra touch of the raw table is a
    metadata-only count(*). Stages hand off through eager checkpoints
    (exploded lines, scrubbed docs, bucket tf, bucket stats, per-doc
    scores), so no stage recomputes a relation another stage already
    materialized; at cluster scale each checkpoint is a persisted
    intermediate table.

    Scale shape (r15 optimization pass, guide §2.3/§2.4): the exploded
    line relation is normalized ONCE and checkpointed at the
    size-derived level (the r14 plan ran the corpus scan + explode +
    regex-normalize TWICE — once per side of the df join — and computed
    tok_cnt with a second regex split; tok_cnt now derives from the
    same collapsed ``norm`` string, and the checkpoint feeds both the
    df agg and the join probe). Scrub = the df agg (min=max doc test,
    one exchange — countDistinct's Expand+double-exchange removed; see
    the LINE_DF_DOCS == 2 branch) + a broadcast-or-shuffle join back +
    ONE payload exchange for the doc re-agg; dedup = one min_by hash
    agg on the uniform md5 key (the r14 Window shape paid an extra
    per-partition Sort of the scrubbed payload; min_by partial-aggs
    map-side, so duplicate docs drop BEFORE the exchange); gate =
    zero-shuffle projection; DSIR = one tokenize agg + broadcast
    lambda + broadcast 1-row totals; pack = per-source windows
    (parallel, no global ordering). Nothing doc x doc, nothing Python,
    nothing collected."""
    from e_commerce_click_stream_spark.operators.ckptlevel import (
        corpus_checkpoint_level,
        parquet_row_count,
    )

    docs = spread(table(spark, sf_dir, "documents"))
    # tok_cnt from the SAME collapsed-whitespace norm string that keys
    # the df lookup: norm trims and collapses every \s+ run to one
    # space, so its single-space split has exactly the tokens the r14
    # expression counted with a second split+filter pass over the raw
    # line (empty norm ⟺ zero tokens; oracle-proven identical).
    # Projections are parsed SQL (selectExpr) end to end in this builder:
    # the Column-chain construction cost ~2.5k gateway roundtrips
    # (~1.5 s of driver time inside every timed run); regex backslashes
    # are doubled so the SQL unescape hands the engine the same pattern.
    lines = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id", "lang", "source",
            F.posexplode(F.split("text", "\n", -1)).alias("i", "line"),
        )
        .selectExpr(
            "doc_id", "lang", "source", "i", "line",
            r"lower(translate(trim(regexp_replace(line, '\\s+', ' ')),"
            r" 'İΣ', 'iσ')) AS norm",
        )
        .selectExpr(
            "doc_id", "lang", "source", "i", "line",
            "CAST(CASE WHEN norm = '' THEN 0 ELSE size(split(norm, ' ')) END"
            " AS BIGINT) AS tok_cnt",
            "CASE WHEN norm != '' THEN md5(norm) END AS fp",
        )
        # one normalize pass over the corpus; both scrub consumers (df
        # agg + join probe) read this instead of re-scanning. Level is
        # size-derived like every corpus-sized checkpoint (the line
        # payload ≈ text bytes; same 8192 B/doc bound as the shingle
        # checkpoints, pinned by the footprint tests).
        .localCheckpoint(
            eager=True,
            storageLevel=corpus_checkpoint_level(
                spark, parquet_row_count(sf_dir, "documents") * 8192
            ),
        )
    )
    if LINE_DF_DOCS == 2:
        # ndocs < 2 ⟺ every occurrence is in one doc ⟺ min == max:
        # a plain min/max hash agg (map-side combinable, ONE exchange)
        # replaces countDistinct's Expand + distinct-agg double exchange.
        # The equivalence REQUIRES doc_id non-null (min/max skip NULLs):
        # doc_id is the corpus primary key, non-null at every scale
        # factor — pinned by test_doc_id_nonnull_invariant
        freq = (
            lines.filter(F.col("fp").isNotNull())
            .groupBy("fp")
            .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        )
        keep_sql = "(fp IS NOT NULL AND _mn = _mx)"
    else:  # pragma: no cover - general threshold fallback
        freq = (
            lines.filter(F.col("fp").isNotNull())
            .groupBy("fp")
            .agg(F.countDistinct("doc_id").alias("ndocs"))
        )
        keep_sql = f"(fp IS NOT NULL AND ndocs < {LINE_DF_DOCS})"
    s1 = (
        lines.join(freq, "fp", "left")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.expr("sum(tok_cnt) AS raw_tokens"),
            F.expr(
                f"sum(CASE WHEN {keep_sql} THEN tok_cnt ELSE 0 END)"
                " AS clean_tokens"
            ),
            F.expr(f"sum(CAST({keep_sql} AS BIGINT)) AS kept_lines"),
            F.expr(
                f"array_sort(collect_list(CASE WHEN {keep_sql}"
                " THEN struct(i, line) END)) AS kept"
            ),
        )
        .selectExpr(
            "doc_id", "lang", "source", "raw_tokens", "clean_tokens",
            r"CASE WHEN kept_lines > 0 THEN"
            r" concat_ws('\n', transform(kept, s -> s.line)) END AS text",
        )
        .localCheckpoint(eager=True)  # feeds stage-0/1 readouts AND dedup
    )
    s1k = s1.filter(F.col("text").isNotNull())
    # min-doc-per-fingerprint via min_by aggregate: same winner the r14
    # Window.partitionBy(fp) + filter picked (doc_id is unique, so the
    # min is a unique row), but a hash agg needs no per-partition Sort
    # of the scrubbed payload and partial-aggs duplicates away map-side
    s2 = (
        s1k.groupBy(
            F.expr(
                r"md5(lower(translate(regexp_replace(trim(text), '\\s+', ' '),"
                r" 'İΣ', 'iσ'))) AS _fp"  # fingerprint()'s parsed twin
            )
        )
        .agg(
            F.expr(
                "min_by(struct(doc_id, lang, source, raw_tokens,"
                " clean_tokens, text), doc_id) AS r"
            )
        )
        .selectExpr(
            "r.doc_id", "r.lang", "r.source", "r.raw_tokens",
            "r.clean_tokens", "r.text",
        )
        .localCheckpoint(eager=True)  # feeds stage-2 readout AND the gate
    )
    s3 = (
        gopher_flags_df(
            s2, keep_text=True, keep_cols=("lang", "source", "clean_tokens")
        )
        .filter(
            "words_in_range AND mean_len_ok AND symbol_ok AND bullet_ok"
            " AND ellipsis_ok AND alpha_ok"
        )
        .select("doc_id", "lang", "source", "clean_tokens", "text")
        .localCheckpoint(eager=True)  # feeds stage-3 readout AND DSIR
    )
    dtb3 = (
        s3.selectExpr(
            "doc_id", "lang", "source",
            r"explode(split(trim(lower(translate(text, 'İΣ', 'iσ'))),"
            r" '\\s+')) AS w",
        )
        .filter("w != ''")
        .selectExpr(
            "doc_id", "lang", "source",
            f"CAST(conv(substring(md5(w), 1, 4), 16, 10) AS BIGINT)"
            f" % {DSIR_BUCKETS} AS bucket",
        )
        .groupBy("doc_id", "lang", "source", "bucket")
        .agg(F.expr("count(*) AS tf"))
        .localCheckpoint(eager=True)  # feeds model fitting AND scoring
    )
    bstats3 = dtb3.groupBy("bucket").agg(
        F.expr("sum(tf) AS raw_cnt"),
        F.expr(
            f"sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN tf ELSE 0 END)"
            " AS tgt_cnt"
        ),
    )
    # r16: the corpus totals ride a window over the SAME bucket-stats
    # relation instead of a separate 1-row agg crossJoined back — bstats3
    # is bounded at DSIR_BUCKETS rows (4096), so the unpartitioned window
    # is a constant-size single-task frame at any corpus scale, and the
    # fused form drops bstats3's eager checkpoint job plus the btot3
    # broadcast build from lam3's lineage. r_total/t_total are BIGINT
    # sums — order-independent, value-identical to the old agg.
    # 1.0D/0.5D: SQL float literals default to DECIMAL — the D suffix
    # keeps the arithmetic double, exactly the F.lit(1.0)/F.lit(0.5)
    # tree this expression had as a Column chain
    lam3 = bstats3.selectExpr(
        "bucket",
        f"CAST(floor(ln((tgt_cnt + 1) * (sum(raw_cnt) OVER () + {DSIR_BUCKETS})"
        f" / ((raw_cnt + 1.0D) * (sum(tgt_cnt) OVER () + {DSIR_BUCKETS})))"
        f" * 1000000 + 0.5D) AS BIGINT) AS lam_micro",
    )
    pd3 = (
        dtb3.join(F.broadcast(lam3), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.expr("sum(tf) AS n_tokens"),
            F.expr("sum(tf * lam_micro) AS logratio_micro"),
        )
        .localCheckpoint(eager=True)  # feeds corpus totals AND selection
    )
    pt3 = pd3.agg(
        F.expr("sum(n_tokens) AS nt_total"),
        F.expr("sum(logratio_micro) AS lr_total"),
    )
    s4 = (
        pd3.crossJoin(F.broadcast(pt3))
        .filter("logratio_micro * nt_total > n_tokens * lr_total")
        .select("doc_id", "source", "n_tokens")
        .localCheckpoint(eager=True)  # feeds stage-4 readout AND packing
    )
    packed = s4.selectExpr(
        "source", "doc_id", "n_tokens",
        "sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok",
    ).selectExpr(
        "source", "doc_id", "n_tokens",
        f"floor((cum_tok - n_tokens) / {SEQ_TOKEN_BUDGET}) AS seq_id",
    )

    def row(idx: int, name: str, agg_df: DataFrame) -> DataFrame:
        return agg_df.selectExpr(
            f"{idx} AS stage_idx", f"'{name}' AS stage",
            "n_docs", "n_tokens", "n_shards",
        )

    def counts(df: DataFrame, tok_col: str) -> DataFrame:
        return df.agg(
            F.expr("count(*) AS n_docs"),
            F.expr(f"coalesce(sum({tok_col}), 0) AS n_tokens"),
            F.expr("CAST(NULL AS BIGINT) AS n_shards"),
        )

    r0 = row(
        0, "raw",
        docs.agg(F.expr("count(*) AS n_docs")).crossJoin(
            s1.agg(
                F.expr("coalesce(sum(raw_tokens), 0) AS n_tokens"),
                F.expr("CAST(NULL AS BIGINT) AS n_shards"),
            )
        ),
    )
    r1 = row(1, "line_scrub", counts(s1k, "clean_tokens"))
    r2 = row(2, "exact_dedup", counts(s2, "clean_tokens"))
    r3 = row(3, "quality_gate", counts(s3, "clean_tokens"))
    r4 = row(4, "dsir_select", counts(s4, "n_tokens"))
    r5 = row(
        5, "pack",
        packed.agg(
            F.expr("count(*) AS n_docs"),
            F.expr("coalesce(sum(n_tokens), 0) AS n_tokens"),
        ).crossJoin(
            packed.select("source", "seq_id")
            .distinct()
            .agg(F.expr("count(*) AS n_shards"))
        ),
    )
    return r0.unionAll(r1).unionAll(r2).unionAll(r3).unionAll(r4).unionAll(r5)


# ---------------------------------------------------------------------------
# Incremental curation run (VERDICT r12 #4): corpus_curation_run is the
# batch job; this is the INGEST path a deployment actually runs per
# micro-batch once the base corpus is curated — new docs flow
# scrub (against merged line statistics) -> exact-dedup-against-store ->
# structural gate -> NB keep from STORED weights -> DSIR keep from the
# STORED lambda grid and corpus totals -> pack-manifest append that
# CONTINUES the per-source sequence ids from the stored tails. The
# stored models are FROZEN at base-fit time (the production contract:
# ingest scoring never re-fits; re-fitting is the batch job's rebuild),
# while the line-df statistics MERGE (they are counts, like BM25 df).
# The oracle recomputes the whole thing from the raw table in one SQL —
# base fit and batch score — so the green row proves the store-routed
# incremental path ≡ a from-scratch recompute of the final state.
#
# Batch split: doc_id % 7 = 2. Deliberately NOT the per-source is_new
# split every other ingest op uses — sources span base and batch here,
# because this op's machinery (pack-tail continuation, dedup-vs-store,
# line-df merge) is only exercised when a batch doc lands in a source
# the base already curated. (7 because the fixture assigns source as
# doc_id % 20: any modulus sharing a factor with 20 would select whole
# sources and silently degenerate back to a per-source split — %5 did.)
#
# Model storage is the FULL weight grid (every bucket, unseen buckets
# at the smoothed default the fit formula assigns to zero counts) — the
# dense-vector shape a deployed scorer broadcasts; a sparse stored
# model would silently score unseen buckets as 0 instead of the
# model's actual smoothed log-ratio.

_CUR_INC_BATCH = "doc_id % 7 = 2"

# The oracle is composed from three fragments so the streaming twin can
# swap ONLY the batch-scrub CTE (its line-df statistics accumulate per
# micro-batch instead of merging the whole batch at once):
# _CUR_BASE_SQL (base fit + stored state) + a batch-scrub n1 fragment +
# _CUR_SCORE_SQL (dedup -> gate -> stored-NB -> stored-DSIR -> pack).
_CUR_BASE_SQL = f"""
WITH ls AS (
    SELECT doc_id, lang, source, ({_CUR_INC_BATCH}) AS is_batch,
           string_split(text, chr(10)) AS ls
    FROM documents WHERE text IS NOT NULL
),
clines AS (
    SELECT doc_id, lang, source, is_batch, s.i AS i, s.l AS line,
           {_LINE_SCRUB_NORM} AS norm
    FROM (SELECT doc_id, lang, source, is_batch,
                 unnest([{{'i': i, 'l': ls[i + 1]}}
                         for i in range(0, len(ls))]) AS s
          FROM ls)
),
keyed AS (
    SELECT doc_id, lang, source, is_batch, i, line,
           CASE WHEN norm = '' THEN NULL ELSE md5(norm) END AS fp
    FROM clines
),
fqb AS (
    SELECT fp, count(DISTINCT doc_id)::BIGINT AS ndocs
    FROM keyed WHERE NOT is_batch AND fp IS NOT NULL GROUP BY fp
),
fqa AS (
    SELECT fp, count(DISTINCT doc_id)::BIGINT AS ndocs
    FROM keyed WHERE fp IS NOT NULL GROUP BY fp
),
b1 AS (
    SELECT k.doc_id, k.lang, k.source,
           string_agg(CASE WHEN k.fp IS NOT NULL AND f.ndocs < {LINE_DF_DOCS}
                           THEN k.line END, chr(10) ORDER BY k.i) AS text
    FROM keyed k LEFT JOIN fqb f USING (fp)
    WHERE NOT k.is_batch
    GROUP BY k.doc_id, k.lang, k.source
),
b1k AS (SELECT * FROM b1 WHERE text IS NOT NULL),
b2 AS (
    SELECT * FROM b1k
    QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5({_EXACT_FP_NORM}))
),
gphb AS ({_gopher_sql("b2")}),
b3 AS (
    SELECT b2.* FROM b2 JOIN gphb g USING (doc_id)
    WHERE g.words_in_range AND g.mean_len_ok AND g.symbol_ok
      AND g.bullet_ok AND g.ellipsis_ok AND g.alpha_ok
),
nlab AS (
    SELECT g.doc_id,
           coalesce(g.words_in_range AND g.mean_len_ok AND g.symbol_ok
                    AND g.bullet_ok AND g.ellipsis_ok AND g.alpha_ok,
                    false) AS label,
           d.text
    FROM gphb g JOIN b2 d USING (doc_id)
),
ntoks AS (
    SELECT doc_id, label,
           unnest(string_split_regex(trim({sql_lower_folded("text")}), '\\s+')) AS w
    FROM nlab WHERE text IS NOT NULL AND trim(text) <> ''
),
ndtb AS (
    SELECT doc_id, label,
           ('0x' || substr(md5(w), 1, 4))::BIGINT % {NB_BUCKETS} AS bucket,
           count(*)::BIGINT AS tf
    FROM ntoks WHERE w <> '' GROUP BY doc_id, label, bucket
),
nbst AS (
    SELECT bucket,
           sum(CASE WHEN label THEN tf ELSE 0 END)::BIGINT AS pos_cnt,
           sum(CASE WHEN label THEN 0 ELSE tf END)::BIGINT AS neg_cnt
    FROM ndtb GROUP BY bucket
),
nbtot AS (
    SELECT coalesce(sum(pos_cnt), 0)::BIGINT AS p_total,
           coalesce(sum(neg_cnt), 0)::BIGINT AS n_total
    FROM nbst
),
nbwg AS (
    SELECT g.bucket,
           floor(ln(((coalesce(b.pos_cnt, 0) + 1) * (t.n_total + {NB_BUCKETS}))
                    / ((coalesce(b.neg_cnt, 0) + 1.0) * (t.p_total + {NB_BUCKETS})))
                 * 1000000 + 0.5)::BIGINT AS w_micro
    FROM (SELECT unnest(range({NB_BUCKETS})) AS bucket) g
    LEFT JOIN nbst b USING (bucket), nbtot t
),
nprior AS (
    SELECT floor(ln((sum(CASE WHEN label THEN 1 ELSE 0 END) + 1.0)
                    / (sum(CASE WHEN label THEN 0 ELSE 1 END) + 1))
                 * 1000000 + 0.5)::BIGINT AS prior_micro
    FROM (SELECT DISTINCT doc_id, label FROM ndtb) x
),
btoks AS (
    SELECT doc_id, lang, source,
           unnest(string_split_regex(trim({sql_lower_folded("text")}), '\\s+')) AS w
    FROM b3
),
bdtb AS (
    SELECT doc_id, lang, source,
           ('0x' || substr(md5(w), 1, 4))::BIGINT % {DSIR_BUCKETS} AS bucket,
           count(*)::BIGINT AS tf
    FROM btoks WHERE w <> '' GROUP BY doc_id, lang, source, bucket
),
bbst AS (
    SELECT bucket,
           sum(tf)::BIGINT AS raw_cnt,
           sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN tf ELSE 0 END)::BIGINT
               AS tgt_cnt
    FROM bdtb GROUP BY bucket
),
bbtot AS (
    SELECT coalesce(sum(raw_cnt), 0)::BIGINT AS r_total,
           coalesce(sum(tgt_cnt), 0)::BIGINT AS t_total
    FROM bbst
),
lamg AS (
    SELECT g.bucket,
           floor(ln(((coalesce(b.tgt_cnt, 0) + 1) * (t.r_total + {DSIR_BUCKETS}))
                    / ((coalesce(b.raw_cnt, 0) + 1.0) * (t.t_total + {DSIR_BUCKETS})))
                 * 1000000 + 0.5)::BIGINT AS lam_micro
    FROM (SELECT unnest(range({DSIR_BUCKETS})) AS bucket) g
    LEFT JOIN bbst b USING (bucket), bbtot t
),
bpd AS (
    SELECT d.doc_id, d.source,
           sum(d.tf)::BIGINT AS n_tokens,
           sum(d.tf * l.lam_micro)::BIGINT AS logratio_micro
    FROM bdtb d JOIN lamg l USING (bucket)
    GROUP BY d.doc_id, d.source
),
bpt AS (
    SELECT coalesce(sum(n_tokens), 0)::BIGINT AS nt_total,
           coalesce(sum(logratio_micro), 0)::BIGINT AS lr_total
    FROM bpd
),
b4 AS (
    SELECT p.doc_id, p.source, p.n_tokens
    FROM bpd p, bpt t
    WHERE p.logratio_micro * t.nt_total > p.n_tokens * t.lr_total
),
btail AS (
    SELECT source, sum(n_tokens)::BIGINT AS tail FROM b4 GROUP BY source
),"""

# one-shot batch scrub: the WHOLE ingest batch's line stats merge at once
_CUR_N1_ONESHOT_SQL = f"""
n1 AS (
    SELECT k.doc_id, k.lang, k.source,
           string_agg(CASE WHEN k.fp IS NOT NULL AND f.ndocs < {LINE_DF_DOCS}
                           THEN k.line END, chr(10) ORDER BY k.i) AS text
    FROM keyed k LEFT JOIN fqa f USING (fp)
    WHERE k.is_batch
    GROUP BY k.doc_id, k.lang, k.source
),"""

_CUR_SCORE_SQL = f"""
n1k AS (SELECT * FROM n1 WHERE text IS NOT NULL),
bfp AS (SELECT DISTINCT md5({_EXACT_FP_NORM}) AS xfp FROM b1k),
n2a AS (
    SELECT *, md5({_EXACT_FP_NORM}) AS xfp FROM n1k
    QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5({_EXACT_FP_NORM}))
),
n2 AS (
    SELECT n2a.doc_id, n2a.lang, n2a.source, n2a.text
    FROM n2a LEFT JOIN bfp ON bfp.xfp = n2a.xfp
    WHERE bfp.xfp IS NULL
),
gphn AS ({_gopher_sql("n2")}),
n3 AS (
    SELECT n2.* FROM n2 JOIN gphn g USING (doc_id)
    WHERE g.words_in_range AND g.mean_len_ok AND g.symbol_ok
      AND g.bullet_ok AND g.ellipsis_ok AND g.alpha_ok
),
qtoks AS (
    SELECT doc_id,
           unnest(string_split_regex(trim({sql_lower_folded("text")}), '\\s+')) AS w
    FROM n3
),
qdtb AS (
    SELECT doc_id,
           ('0x' || substr(md5(w), 1, 4))::BIGINT % {NB_BUCKETS} AS bucket,
           count(*)::BIGINT AS tf
    FROM qtoks WHERE w <> '' GROUP BY doc_id, bucket
),
qnb AS (
    SELECT d.doc_id, sum(d.tf * w.w_micro)::BIGINT AS dot_micro
    FROM qdtb d JOIN nbwg w USING (bucket)
    GROUP BY d.doc_id
),
n4 AS (
    SELECT n3.* FROM n3 JOIN qnb s USING (doc_id), nprior r
    WHERE s.dot_micro + r.prior_micro > 0
),
q2toks AS (
    SELECT doc_id, source,
           unnest(string_split_regex(trim({sql_lower_folded("text")}), '\\s+')) AS w
    FROM n4
),
q2dtb AS (
    SELECT doc_id, source,
           ('0x' || substr(md5(w), 1, 4))::BIGINT % {DSIR_BUCKETS} AS bucket,
           count(*)::BIGINT AS tf
    FROM q2toks WHERE w <> '' GROUP BY doc_id, source, bucket
),
qpd AS (
    SELECT d.doc_id, d.source,
           sum(d.tf)::BIGINT AS n_tokens,
           sum(d.tf * l.lam_micro)::BIGINT AS logratio_micro
    FROM q2dtb d JOIN lamg l USING (bucket)
    GROUP BY d.doc_id, d.source
),
n5 AS (
    SELECT p.doc_id, p.source, p.n_tokens
    FROM qpd p, bpt t
    WHERE p.logratio_micro * t.nt_total > p.n_tokens * t.lr_total
),
cumn AS (
    SELECT source, doc_id, n_tokens,
           sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_tok
    FROM n5
)
SELECT c.doc_id, c.source, c.n_tokens,
       floor((coalesce(t.tail, 0) + c.cum_tok - c.n_tokens)
             / {SEQ_TOKEN_BUDGET})::BIGINT AS seq_id
FROM cumn c LEFT JOIN btail t USING (source)
"""

_CUR_INC_SQL = _CUR_BASE_SQL + _CUR_N1_ONESHOT_SQL + _CUR_SCORE_SQL

_CUR_GATE_COLS = (
    "words_in_range", "mean_len_ok", "symbol_ok",
    "bullet_ok", "ellipsis_ok", "alpha_ok",
)


def _cur_gate() -> "F.Column":
    g = F.col(_CUR_GATE_COLS[0])
    for c in _CUR_GATE_COLS[1:]:
        g = g & F.col(c)
    return g


def _cur_lines_of(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, source, i, line, fp) — the scrub's line explosion
    with the shared normalization key (doc_line_boilerplate_scrub)."""
    norm = lower_folded(F.trim(F.regexp_replace("line", r"\s+", " ")))
    return (
        docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id", "lang", "source",
            F.posexplode(F.split("text", "\n", -1)).alias("i", "line"),
        )
        .withColumn("fp", F.when(norm != "", F.md5(norm)))
    )


def _cur_scrub(lines: DataFrame, freq: DataFrame) -> DataFrame:
    """Rebuild each doc's text from lines whose document frequency (per
    ``freq``: fp -> ndocs) stays under the boilerplate threshold; docs
    with no kept line drop out."""
    keep = F.col("fp").isNotNull() & (F.col("ndocs") < LINE_DF_DOCS)
    kept_structs = F.array_sort(
        F.collect_list(F.when(keep, F.struct(F.col("i"), F.col("line"))))
    )
    return (
        lines.join(freq, "fp", "left")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.sum(keep.cast("long")).alias("kept_lines"),
            kept_structs.alias("kept"),
        )
        .select(
            "doc_id", "lang", "source",
            F.when(
                F.col("kept_lines") > 0,
                F.concat_ws("\n", F.expr("transform(kept, s -> s.line)")),
            ).alias("text"),
        )
        .filter(F.col("text").isNotNull())
    )


def _cur_nb_bucket(col: str = "w") -> "F.Column":
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long") % NB_BUCKETS


def _cur_dsir_bucket(col: str = "w") -> "F.Column":
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long") % DSIR_BUCKETS


def _cur_tokens(df: DataFrame, *carry: str) -> DataFrame:
    return (
        df.select(
            "doc_id", *carry,
            F.explode(
                F.split(F.trim(lower_folded(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
    )


@register("corpus_curation_incremental", oracle=_CUR_INC_SQL,
          tags=("text", "pipeline", "curation", "incremental", "stored-index"))
def corpus_curation_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch ingest through the curation pipeline against STORED
    state (see the section comment above for the full contract): cold
    start fits the base corpus once into the "cur" catalog store —
    line-df counts, the base fingerprint set, the FULL NB weight grid +
    prior, the FULL DSIR lambda grid + corpus totals, and the per-source
    pack tails — then every run scores ONLY the batch: scrub against
    merged line statistics, dedup against the broadcast stored
    fingerprints (plus in-batch min-id), structural gate, NB keep from
    the broadcast stored weights, DSIR keep from the broadcast stored
    grid against the stored corpus totals, and a pack-manifest append
    whose seq_ids continue from the stored per-source tails. Returns the
    batch's manifest rows (doc_id, source, n_tokens, seq_id) — the
    artifact a loader consumes. The from-scratch oracle recomputes base
    fit + batch score from the raw table, so the green row proves the
    store-routed path ≡ recompute; warm runs are idempotent by
    construction (stores are read-only on the probe path — state
    advancement is the batch job's rebuild, the probe_only convention).

    Scale shape: per batch, |batch| docs explode/tokenize exactly three
    times (scrub lines, NB buckets, DSIR buckets — each one hash agg);
    every model artifact broadcasts (<= 4096-row grids, 1-row scalars,
    per-source tails); the base corpus is NEVER re-read on the probe
    path. The only windows run per (batch fp) and per (source) over
    DSIR survivors. Nothing doc x doc, nothing Python, nothing
    collected."""
    import os as _os

    from e_commerce_click_stream_spark.operators.storelock import (
        acquire_build_lock,
        downgrade_to_shared,
        store_location,
    )

    index_dir, prefix = store_location("cur", sf_dir)
    t = _cur_table_names(prefix)
    linedf_t, fps_t, nbw_t, prior_t, lam_t, tot_t, tail_t = t

    docs = spread(table(spark, sf_dir, "documents"))
    is_batch = F.expr(_CUR_INC_BATCH)

    acquire_build_lock(index_dir)
    # cold-build sentinel is ALL seven tables, not any single mid-build
    # one: _cur_store_build writes dsirtot and packtail AFTER lam, so a
    # crash in that window would otherwise leave a store the next run
    # treats as complete and then fails on the missing tail tables
    # instead of rebuilding (ADVICE r13)
    if not all(spark.catalog.tableExists(n) for n in t):
        _cur_store_build(spark, sf_dir, index_dir, prefix)
    downgrade_to_shared(index_dir)

    # ---- the per-batch probe: stores are read-only from here
    batch_lines = _cur_lines_of(docs.filter(is_batch)).localCheckpoint(eager=True)
    batch_freq = (
        batch_lines.filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
    )
    merged_freq = (
        spark.table(linedf_t)
        .unionByName(batch_freq)
        .groupBy("fp")
        .agg(F.sum("ndocs").alias("ndocs"))
    )
    n1k = _cur_scrub(batch_lines, merged_freq).localCheckpoint(eager=True)
    n2 = (
        n1k.withColumn("xfp", fingerprint())
        .withColumn("min_doc", F.min("doc_id").over(Window.partitionBy("xfp")))
        .filter(F.col("doc_id") == F.col("min_doc"))
        .join(F.broadcast(spark.table(fps_t)), "xfp", "left_anti")
        .select("doc_id", "lang", "source", "text")
    )
    n5 = _cur_score_batch(spark, n2, prefix)
    return _cur_pack_append(spark, n5, prefix)


def _cur_table_names(prefix: str) -> tuple[str, ...]:
    """(linedf, fps, nbw, nbprior, lam, dsirtot, packtail) table names."""
    return tuple(
        f"{prefix}_{s}"
        for s in ("linedf", "fps", "nbw", "nbprior", "lam", "dsirtot", "packtail")
    )


def _cur_score_batch(spark: SparkSession, n2: DataFrame, prefix: str) -> DataFrame:
    """Gate → stored-NB keep → stored-DSIR keep for a (deduped, scrubbed)
    batch relation (doc_id, lang, source, text); returns the DSIR
    survivors (doc_id, source, n_tokens). Every model artifact reads
    from the catalog store and broadcasts; models never re-fit."""
    _, _, nbw_t, prior_t, lam_t, tot_t, _ = _cur_table_names(prefix)
    n3 = (
        gopher_flags_df(n2, keep_text=True, keep_cols=("lang", "source"))
        .filter(_cur_gate())
        .select("doc_id", "lang", "source", "text")
        .localCheckpoint(eager=True)  # feeds the NB score AND DSIR score
    )
    qdtb = (
        _cur_tokens(n3)
        .select("doc_id", _cur_nb_bucket().alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
    )
    dot = (
        qdtb.join(F.broadcast(spark.table(nbw_t)), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("w_micro")).alias("dot_micro"))
    )
    n4 = (
        n3.join(dot, "doc_id")
        .crossJoin(F.broadcast(spark.table(prior_t)))
        .filter(F.col("dot_micro") + F.col("prior_micro") > 0)
        .select("doc_id", "source", "text")
    )
    q2dtb = (
        _cur_tokens(n4, "source")
        .select("doc_id", "source", _cur_dsir_bucket().alias("bucket"))
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count("*").alias("tf"))
    )
    qpd = (
        q2dtb.join(F.broadcast(spark.table(lam_t)), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lam_micro")).alias("logratio_micro"),
        )
    )
    return (
        qpd.crossJoin(F.broadcast(spark.table(tot_t)))
        .filter(
            F.col("logratio_micro") * F.col("nt_total")
            > F.col("n_tokens") * F.col("lr_total")
        )
        .select("doc_id", "source", "n_tokens")
    )


def _cur_pack_append(spark: SparkSession, n5: DataFrame, prefix: str) -> DataFrame:
    """Manifest rows for DSIR survivors, seq_ids continuing the stored
    per-source pack tails."""
    tail_t = _cur_table_names(prefix)[6]
    packw = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        n5.withColumn("cum_tok", F.sum("n_tokens").over(packw))
        .join(F.broadcast(spark.table(tail_t)), "source", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor(
                (F.coalesce(F.col("tail"), F.lit(0))
                 + F.col("cum_tok") - F.col("n_tokens"))
                / SEQ_TOKEN_BUDGET
            ).alias("seq_id"),
        )
    )


def _cur_store_build(
    spark: SparkSession, sf_dir: str, index_dir: str, prefix: str
) -> None:
    """Cold-build the curation state store (the base fit); caller holds
    the build lock. See corpus_curation_incremental for the contract."""
    import os as _os

    linedf_t, fps_t, nbw_t, prior_t, lam_t, tot_t, tail_t = _cur_table_names(
        prefix
    )

    def wtbl(df: DataFrame, name: str, subdir: str) -> None:
        (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", _os.path.join(index_dir, subdir))
            .saveAsTable(name)
        )

    docs = spread(table(spark, sf_dir, "documents"))
    is_batch = F.expr(_CUR_INC_BATCH)
    base_lines = _cur_lines_of(docs.filter(~is_batch)).localCheckpoint(
        eager=True
    )
    base_freq = (
        base_lines.filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .localCheckpoint(eager=True)  # feeds the store AND the scrub
    )
    wtbl(base_freq, linedf_t, "linedf")
    b1k = _cur_scrub(base_lines, base_freq).localCheckpoint(eager=True)
    wtbl(b1k.select(fingerprint().alias("xfp")).distinct(), fps_t, "fps")
    fpw = Window.partitionBy(fingerprint())
    b2 = (
        b1k.withColumn("min_doc", F.min("doc_id").over(fpw))
        .filter(F.col("doc_id") == F.col("min_doc"))
        .drop("min_doc")
    )
    flags = gopher_flags_df(
        b2, keep_text=True, keep_cols=("lang", "source")
    ).localCheckpoint(eager=True)  # feeds the NB fit AND the gate
    # NB fit on the deduped base, label = the structural conjunction
    lab = flags.select(
        "doc_id", F.coalesce(_cur_gate(), F.lit(False)).alias("label"), "text"
    ).filter(F.col("text").isNotNull() & (F.trim("text") != ""))
    ndtb = (
        _cur_tokens(lab, "label")
        .select("doc_id", "label", _cur_nb_bucket().alias("bucket"))
        .groupBy("doc_id", "label", "bucket")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)  # feeds weights AND the prior
    )
    nbst = ndtb.groupBy("bucket").agg(
        F.sum(F.when(F.col("label"), F.col("tf")).otherwise(0)).alias("pos_cnt"),
        F.sum(F.when(F.col("label"), 0).otherwise(F.col("tf"))).alias("neg_cnt"),
    )
    nbtot = nbst.agg(
        F.coalesce(F.sum("pos_cnt"), F.lit(0)).alias("p_total"),
        F.coalesce(F.sum("neg_cnt"), F.lit(0)).alias("n_total"),
    )
    w_micro = F.floor(
        F.log(
            ((F.coalesce(F.col("pos_cnt"), F.lit(0)) + 1)
             * (F.col("n_total") + F.lit(NB_BUCKETS)))
            / ((F.coalesce(F.col("neg_cnt"), F.lit(0)) + F.lit(1.0))
               * (F.col("p_total") + F.lit(NB_BUCKETS)))
        )
        * F.lit(1_000_000)
        + F.lit(0.5)
    ).cast("long")
    nbwg = (
        spark.range(NB_BUCKETS)
        .select(F.col("id").alias("bucket"))
        .join(nbst, "bucket", "left")
        .crossJoin(F.broadcast(nbtot))
        .select("bucket", w_micro.alias("w_micro"))
    )
    wtbl(nbwg, nbw_t, "nbw")
    prior = (
        ndtb.select("doc_id", "label")
        .distinct()
        .agg(
            F.floor(
                F.log(
                    (F.sum(F.when(F.col("label"), 1).otherwise(0)) + F.lit(1.0))
                    / (F.sum(F.when(F.col("label"), 0).otherwise(1)) + 1)
                )
                * F.lit(1_000_000)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("prior_micro")
        )
    )
    wtbl(prior, prior_t, "nbprior")
    # DSIR fit on the gate survivors
    b3 = flags.filter(_cur_gate()).select("doc_id", "lang", "source", "text")
    bdtb = (
        _cur_tokens(b3, "lang", "source")
        .select("doc_id", "lang", "source", _cur_dsir_bucket().alias("bucket"))
        .groupBy("doc_id", "lang", "source", "bucket")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)  # feeds the fit AND base scoring
    )
    bbst = bdtb.groupBy("bucket").agg(
        F.sum("tf").alias("raw_cnt"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("tf")).otherwise(0)
        ).alias("tgt_cnt"),
    )
    bbtot = bbst.agg(
        F.coalesce(F.sum("raw_cnt"), F.lit(0)).alias("r_total"),
        F.coalesce(F.sum("tgt_cnt"), F.lit(0)).alias("t_total"),
    )
    lam_micro = F.floor(
        F.log(
            ((F.coalesce(F.col("tgt_cnt"), F.lit(0)) + 1)
             * (F.col("r_total") + F.lit(DSIR_BUCKETS)))
            / ((F.coalesce(F.col("raw_cnt"), F.lit(0)) + F.lit(1.0))
               * (F.col("t_total") + F.lit(DSIR_BUCKETS)))
        )
        * F.lit(1_000_000)
        + F.lit(0.5)
    ).cast("long")
    lamg = (
        spark.range(DSIR_BUCKETS)
        .select(F.col("id").alias("bucket"))
        .join(bbst, "bucket", "left")
        .crossJoin(F.broadcast(bbtot))
        .select("bucket", lam_micro.alias("lam_micro"))
        .localCheckpoint(eager=True)  # feeds the store AND base scoring
    )
    wtbl(lamg, lam_t, "lam")
    bpd = (
        bdtb.join(F.broadcast(lamg), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lam_micro")).alias("logratio_micro"),
        )
        .localCheckpoint(eager=True)  # feeds totals AND base selection
    )
    bpt = bpd.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("nt_total"),
        F.coalesce(F.sum("logratio_micro"), F.lit(0)).alias("lr_total"),
    ).localCheckpoint(eager=True)  # feeds the store AND base selection
    wtbl(bpt, tot_t, "dsirtot")
    b4 = bpd.crossJoin(F.broadcast(bpt)).filter(
        F.col("logratio_micro") * F.col("nt_total")
        > F.col("n_tokens") * F.col("lr_total")
    )
    wtbl(
        b4.groupBy("source").agg(F.sum("n_tokens").alias("tail")),
        tail_t, "packtail",
    )


# ---------------------------------------------------------------------------
# Streaming curation ingest: corpus_curation_incremental run as a REAL
# Structured Streaming job — the batch docs replay as ordered micro-
# batches (arrival_order_replay, one file per trigger) through a
# foreachBatch that ADVANCES the mutable store state per batch (line-df
# counts merge, the fingerprint set appends, the pack tails advance)
# while the fitted models stay frozen, exactly a production ingest
# daemon. The semantic difference from the one-shot twin is REAL and the
# oracle encodes it: a document's scrub uses the line statistics as of
# ITS OWN micro-batch (base + batches <= its wb), so a boilerplate line
# that crosses the threshold mid-stream is scrubbed only from documents
# that arrive after the crossing — earlier emissions are immutable, the
# same seniority asymmetry the base/batch split already has. Micro-batch
# count is fixed (CUR_STREAM_NBATCHES) rather than batch size, so the
# per-run micro-batch overhead is bounded at every scale factor; wb =
# ((rank-1) * NBATCHES) DIV total over doc_id order, identical integer
# math in both engines. Because wb is monotone in doc_id, the dedup
# min-id and pack orderings are unchanged from the one-shot oracle —
# only the n1 scrub CTE swaps (fqa -> per-wb cumulative counts).

CUR_STREAM_NBATCHES = 4

_CUR_N1_STREAM_SQL = f"""
bwb AS (
    SELECT doc_id,
           ((row_number() OVER (ORDER BY doc_id) - 1) * {CUR_STREAM_NBATCHES})
               // greatest(count(*) OVER (), 1) AS wb
    FROM documents WHERE {_CUR_INC_BATCH}
),
bl AS (
    SELECT k.fp, b.wb, count(DISTINCT k.doc_id)::BIGINT AS c
    FROM keyed k JOIN bwb b USING (doc_id)
    WHERE k.is_batch AND k.fp IS NOT NULL
    GROUP BY k.fp, b.wb
),
blc AS (
    SELECT fp, wb,
           sum(c) OVER (PARTITION BY fp ORDER BY wb
                        ROWS UNBOUNDED PRECEDING) AS cb
    FROM bl
),
n1 AS (
    SELECT k.doc_id, k.lang, k.source,
           string_agg(CASE WHEN k.fp IS NOT NULL
                           AND coalesce(f.ndocs, 0) + c.cb < {LINE_DF_DOCS}
                           THEN k.line END, chr(10) ORDER BY k.i) AS text
    FROM keyed k
    JOIN bwb b USING (doc_id)
    LEFT JOIN fqb f USING (fp)
    LEFT JOIN blc c ON c.fp = k.fp AND c.wb = b.wb
    WHERE k.is_batch
    GROUP BY k.doc_id, k.lang, k.source
),"""

_CUR_STREAM_SQL = _CUR_BASE_SQL + _CUR_N1_STREAM_SQL + _CUR_SCORE_SQL

_CUR_MAN_SCHEMA = "doc_id long, source string, n_tokens long, seq_id long"


@register("streaming_curation_ingest", oracle=_CUR_STREAM_SQL,
          tags=("text", "pipeline", "curation", "incremental", "streaming",
                "stored-index"))
def streaming_curation_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental curation pipeline as a REAL streaming ingest (see
    the section comment): cold-build the base state, replay the batch
    docs as {CUR_STREAM_NBATCHES} ordered micro-batches, and per batch —
    inside foreachBatch — merge the batch's line statistics into the
    store, scrub against the UPDATED store, dedup against the stored
    fingerprints (then fold the batch's fingerprints in, so later
    micro-batches dedup against earlier ones), gate + score against the
    frozen models, append manifest rows whose seq_ids continue the
    stored tails, and advance the tails. The oracle recomputes the
    whole replay from the raw table with per-micro-batch cumulative
    line statistics, so the green row proves the store-advancing
    streaming path ≡ a from-scratch recompute of every emission.

    Scale shape: per micro-batch, three bounded store writes (|linedf|
    count merge, fingerprint dedup-append, per-source tail row) plus
    the one-shot probe's scoring chain over just that batch; models
    broadcast; nothing corpus-sized moves after the base fit. Each run
    REBUILDS the store first — the stream erodes/advances state by
    design, so it owns store kind "curs" (the batch twin's "cur" store
    stays read-only warm)."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tf
    from concurrent.futures import ThreadPoolExecutor as _Pool

    from e_commerce_click_stream_spark.operators.storelock import (
        acquire_build_lock,
        downgrade_to_shared,
        store_location,
    )
    from e_commerce_click_stream_spark.streaming.jobs import (
        _replay_parts,
        arrival_order_replay,
    )

    index_dir, prefix = store_location("curs", sf_dir)
    linedf_t, fps_t = _cur_table_names(prefix)[:2]
    tail_t = _cur_table_names(prefix)[6]

    docs = spread(table(spark, sf_dir, "documents"))
    batch_docs = docs.filter(F.expr(_CUR_INC_BATCH))
    total = batch_docs.count()

    acquire_build_lock(index_dir)
    # every run replays the stream from the base fit: the replay ADVANCES
    # the store, so a warm reuse would double-apply the batch
    _cur_store_build(spark, sf_dir, index_dir, prefix)
    if total == 0:
        downgrade_to_shared(index_dir)
        return spark.createDataFrame([], _CUR_MAN_SCHEMA)

    staged = batch_docs.select("doc_id", "lang", "source", "text").withColumn(
        "wb",
        F.expr(
            f"CAST(((row_number() OVER (ORDER BY doc_id) - 1)"
            f" * {CUR_STREAM_NBATCHES}) DIV {total} AS BIGINT)"
        ),
    )
    # deterministic per-store sink, cleared at run start (we hold the
    # build lock and the store is rebuilt every run anyway) — a fresh
    # mkdtemp per run leaked one directory per gate/bench invocation
    # (ADVICE r13); it lives past return because it backs the returned
    # lazy DataFrame
    sink_dir = _os.path.join(index_dir, "sink")
    _shutil.rmtree(sink_dir, ignore_errors=True)
    _os.makedirs(sink_dir)
    stream, stage_root = arrival_order_replay(spark, staged, "wb")

    def _ingest(bdf: DataFrame, _bid: int) -> None:
        bdf = bdf.localCheckpoint(eager=True)
        lines = _cur_lines_of(bdf).localCheckpoint(eager=True)
        bfreq = (
            lines.filter(F.col("fp").isNotNull())
            .groupBy("fp")
            .agg(F.countDistinct("doc_id").alias("ndocs"))
        )
        merged = (
            spark.table(linedf_t)
            .unionByName(bfreq)
            .groupBy("fp")
            .agg(F.sum("ndocs").alias("ndocs"))
            .localCheckpoint(eager=True)  # reads the table it replaces
        )
        # r15 session 2 (guide §2.6 overlap independent jobs): the scrub
        # reads the checkpointed `merged` relation DIRECTLY — it is
        # byte-identical to the linedf table being written (the write's
        # own input), so the store overwrite and the scrub job overlap
        # from a 2-thread pool instead of serializing on a
        # write-then-reread of the same rows. The write still completes
        # before this batch returns (next batch's merge reads the table).
        def _write_linedf() -> None:
            (
                merged.write.mode("overwrite")
                .format("parquet")
                .option("path", _os.path.join(index_dir, "linedf"))
                .saveAsTable(linedf_t)
            )

        with _Pool(max_workers=2) as pool:
            linedf_fut = pool.submit(_write_linedf)
            try:
                n1k = _cur_scrub(lines, merged).localCheckpoint(eager=True)
            except BaseException as fg:
                # ADVICE r15: a foreground failure must not mask a
                # concurrent write failure — chain it so both surface
                bg = linedf_fut.exception()
                if bg is not None:
                    raise fg from bg
                raise
            linedf_fut.result()
        n2 = (
            n1k.withColumn("xfp", fingerprint())
            .withColumn(
                "min_doc", F.min("doc_id").over(Window.partitionBy("xfp"))
            )
            .filter(F.col("doc_id") == F.col("min_doc"))
            .join(F.broadcast(spark.table(fps_t)), "xfp", "left_anti")
            .select("doc_id", "lang", "source", "text")
            .localCheckpoint(eager=True)  # BEFORE the fps advance below
        )
        newfps = (
            n1k.select(fingerprint().alias("xfp"))
            .distinct()
            .join(F.broadcast(spark.table(fps_t)), "xfp", "left_anti")
            .localCheckpoint(eager=True)
        )
        # r15 session 2 (guide §2.6): the fingerprint-store advance and
        # the scoring chain are independent once n2/newfps are
        # checkpointed — n2 anti-joined the PRE-append store above, and
        # nothing in score/pack/tails reads fps_t — so the append+refresh
        # overlaps the scoring jobs. Both sides join before this batch
        # returns, so batch k+1 still dedups against k's fingerprints
        # (the divergence test's wb3 twin pins exactly that).
        def _advance_fps() -> None:
            newfps.write.mode("append").format("parquet").saveAsTable(fps_t)
            # the append runs through the micro-batch's CLONED session
            # (newfps descends from bdf), which does not invalidate THIS
            # session's cached file listing for the table — without the
            # explicit refresh every later micro-batch deduped against
            # the base-only fingerprint set (caught by the divergence
            # test's wb3 twin). The overwrite writes elsewhere
            # drop+recreate their tables, so they never go stale this way.
            spark.catalog.refreshTable(fps_t)

        with _Pool(max_workers=2) as pool:
            fps_fut = pool.submit(_advance_fps)
            try:
                n5 = _cur_score_batch(spark, n2, prefix).localCheckpoint(
                    eager=True
                )
                man = _cur_pack_append(spark, n5, prefix).localCheckpoint(
                    eager=True
                )
                man.write.mode("append").parquet(sink_dir)
                newtails = (
                    spark.table(tail_t)
                    .unionByName(
                        n5.groupBy("source").agg(
                            F.sum("n_tokens").alias("tail")
                        )
                    )
                    .groupBy("source")
                    .agg(F.sum("tail").alias("tail"))
                    .localCheckpoint(eager=True)  # reads the table it replaces
                )
            except BaseException as fg:
                # ADVICE r15: chain a concurrent append failure under the
                # foreground error instead of silently dropping it
                bg = fps_fut.exception()
                if bg is not None:
                    raise fg from bg
                raise
            fps_fut.result()
        (
            newtails.write.mode("overwrite")
            .format("parquet")
            .option("path", _os.path.join(index_dir, "packtail"))
            .saveAsTable(tail_t)
        )

    ckpt = _tf.mkdtemp(prefix="curs_ckpt_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # size-derived replay parts (entry #8 discipline; the staged reader
    # recorded its bytes above) instead of the historical fixed 8
    spark.conf.set("spark.sql.shuffle.partitions", _replay_parts(spark))
    try:
        q = (
            stream.writeStream.foreachBatch(_ingest)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        _shutil.rmtree(stage_root, ignore_errors=True)
        # the checkpoint is dead once the availableNow replay terminates
        # (every run rebuilds the store and replays from scratch) —
        # leaving it leaked one mkdtemp per invocation (ADVICE r13)
        _shutil.rmtree(ckpt, ignore_errors=True)
        downgrade_to_shared(index_dir)
    # Eager checkpoint BEFORE returning (ADVICE r14 #3): the next
    # invocation clears sink_dir at run start, which would silently
    # invalidate a still-lazy result a caller held across runs
    # (use-after-delete). The manifest is batch-sized (thousands of
    # rows), so severing the parquet dependency costs one tiny
    # materialization and makes the result self-contained.
    return (
        spark.read.schema(_CUR_MAN_SCHEMA)
        .parquet(sink_dir)
        .select("doc_id", "source", "n_tokens", "seq_id")
        .localCheckpoint(eager=True)
    )


# ---------------------------------------------------------------------------
# Source-mixing temperature sweep (VERDICT r11 #5): the knob every
# pretraining mix actually tunes. UniMax / alpha-power sampling scales
# each source's share to n_s^alpha / sum(n^alpha) — alpha 1.0 is
# natural-proportion sampling, smaller alphas flatten the mix toward
# uniform (upweighting small sources). Swept over MIX_ALPHAS with the
# same repeat-ceiling interaction as corpus_token_budget_plan: a small
# source upweighted past MAX_REPEAT_EPOCHS epochs surfaces the unmet
# remainder instead of silently over-repeating.
#
# Exactness: pow(n, alpha) is the engine's seventh transcendental input
# — it is micro-rounded ONCE to a BIGINT weight (same discipline as the
# ln() floors, same tripwire coverage), and every derived quantity is
# exact integer math on the weights: shares as ppm by BIGINT division,
# targets as (weight * budget) DIV total-weight. No float product ever
# crosses an epoch or share boundary. Widths: weight_micro <= n*1e6 and
# weight_micro * budget stays under 2^63 through sf0.1 by ~10^3; a
# web-scale deployment promotes the products to DECIMAL(38).

MIX_ALPHAS = (0.3, 0.5, 0.7, 1.0)

_MIX_TEMP_SQL = f"""
WITH per_src AS (
    SELECT source,
           coalesce(sum(len(string_split_regex(trim(text), '\\s+'))), 0)::BIGINT
               AS tokens_available
    FROM documents
    GROUP BY source
),
tot AS (
    SELECT sum(tokens_available)::BIGINT AS total_tokens FROM per_src
),
wts AS (
    SELECT p.source, p.tokens_available, a.alpha,
           floor(pow(p.tokens_available, a.alpha) * 1000000 + 0.5)::BIGINT
               AS weight_micro
    FROM per_src p
    CROSS JOIN (SELECT unnest([{", ".join(map(str, MIX_ALPHAS))}]::DOUBLE[]) AS alpha) a
),
wtot AS (
    SELECT alpha, sum(weight_micro)::BIGINT AS w_total FROM wts GROUP BY alpha
)
SELECT w.alpha, w.source, w.tokens_available, w.weight_micro,
       (w.weight_micro * 1000000) // t.w_total AS share_ppm,
       (w.weight_micro * ({BUDGET_TOKEN_MULT} * tt.total_tokens)) // t.w_total
           AS target_tokens,
       least(w.tokens_available * {MAX_REPEAT_EPOCHS},
             (w.weight_micro * ({BUDGET_TOKEN_MULT} * tt.total_tokens)) // t.w_total)
           AS planned_tokens,
       greatest(0, (w.weight_micro * ({BUDGET_TOKEN_MULT} * tt.total_tokens)) // t.w_total
                   - w.tokens_available * {MAX_REPEAT_EPOCHS}) AS unmet_tokens,
       (w.tokens_available * {MAX_REPEAT_EPOCHS}
        >= (w.weight_micro * ({BUDGET_TOKEN_MULT} * tt.total_tokens)) // t.w_total)
           AS fully_satisfiable
FROM wts w JOIN wtot t USING (alpha), tot tt
"""


@register("corpus_mix_temperature_sweep", oracle=_MIX_TEMP_SQL,
          tags=("sampling", "governance", "mixing", "unimax"))
def corpus_mix_temperature_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha-power (temperature) source-mixing sweep: for each alpha in
    MIX_ALPHAS, each source's sampling weight is pow(tokens, alpha)
    micro-rounded once to BIGINT; its share (ppm), token target under a
    BUDGET_TOKEN_MULT x corpus budget, repeat-capped planned tokens, and
    unmet remainder all derive from the integer weights by exact BIGINT
    division (DIV // on both engines) — the integer boundary math
    reassembles totals exactly, like corpus_token_budget_plan, and
    alpha = 1.0 reproduces natural-proportion sampling while alpha -> 0
    approaches corpus_token_budget_plan's equal shares.

    Scale shape: ONE corpus scan into a checkpointed per-source token
    relation (one groupBy(source) shuffle with map-side partials); the
    4-alpha grid is a zero-shuffle explode over the <= n_sources rows;
    per-alpha weight totals are a 4-row agg BROADCAST back; the corpus
    total rides a 1-row broadcast. Everything after the first shuffle
    operates on n_sources x 4 rows."""
    per_src = (
        table(spark, sf_dir, "documents")
        .select("source", F.size(tokens()).alias("doc_tokens"))
        .groupBy("source")
        .agg(
            F.coalesce(F.sum("doc_tokens"), F.lit(0)).cast("long").alias(
                "tokens_available"
            )
        )
        .localCheckpoint(eager=True)  # feeds the grid AND the corpus total
    )
    tot = per_src.agg(
        F.sum("tokens_available").cast("long").alias("total_tokens")
    )
    wts = per_src.select(
        "source",
        "tokens_available",
        F.explode(F.array(*[F.lit(a) for a in MIX_ALPHAS])).alias("alpha"),
    ).withColumn(
        "weight_micro",
        F.floor(
            F.pow(F.col("tokens_available"), F.col("alpha")) * F.lit(1_000_000)
            + F.lit(0.5)
        ).cast("long"),
    )
    wtot = wts.groupBy("alpha").agg(F.sum("weight_micro").alias("w_total"))
    target = F.expr(
        f"(weight_micro * ({BUDGET_TOKEN_MULT} * total_tokens)) DIV w_total"
    )
    capped = F.col("tokens_available") * MAX_REPEAT_EPOCHS
    return (
        wts.join(F.broadcast(wtot), "alpha")
        .crossJoin(F.broadcast(tot))
        .select(
            "alpha",
            "source",
            "tokens_available",
            "weight_micro",
            F.expr("(weight_micro * 1000000) DIV w_total").alias("share_ppm"),
            target.alias("target_tokens"),
            F.least(capped, target).alias("planned_tokens"),
            F.greatest(F.lit(0).cast("long"), target - capped).alias(
                "unmet_tokens"
            ),
            (capped >= target).alias("fully_satisfiable"),
        )
    )


# ---------------------------------------------------------------------------
# Mix REALIZATION (r12): corpus_mix_temperature_sweep plans per-source
# token targets; this op turns ONE alpha's plan into the per-document
# artifact a data loader actually consumes — how many times each doc is
# seen in the epoch. Copies = whole-epoch repeats (planned DIV available)
# plus a hash-sampled fractional epoch: doc d joins the fractional pass
# iff h(d) * tokens_available < remainder * 2^32 — an exact BIGINT
# cross-multiplication of the Bernoulli rate remainder/available, so
# both engines select the identical doc set with zero per-source
# coordination (no cumulative window over a source's documents — a
# source at web scale has billions of docs and a per-source running sum
# would serialize on one reducer; threshold sampling realizes the
# fractional mass in expectation, the standard trade). Widths: h < 2^32
# and remainder < available, so both products stay under 2^63 until
# available exceeds ~2^31 tokens per source — a deployment shards
# sources long before that.

MIX_MANIFEST_ALPHA = 0.5  # one realized temperature; the sweep grades all


_MIX_MANIFEST_SQL = f"""
WITH docs AS (
    SELECT doc_id, source,
           len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> ''))::BIGINT
               AS n_tokens
    FROM documents
    WHERE text IS NOT NULL
      AND len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) > 0
),
per_src AS (
    SELECT source, sum(n_tokens)::BIGINT AS tokens_available
    FROM docs GROUP BY source
),
tot AS (SELECT sum(tokens_available)::BIGINT AS total_tokens FROM per_src),
wts AS (
    SELECT source, tokens_available,
           floor(pow(tokens_available, {MIX_MANIFEST_ALPHA}) * 1000000 + 0.5)::BIGINT
               AS weight_micro
    FROM per_src
),
wtot AS (SELECT sum(weight_micro)::BIGINT AS w_total FROM wts),
plan AS (
    SELECT w.source, w.tokens_available,
           least(w.tokens_available * {MAX_REPEAT_EPOCHS},
                 (w.weight_micro * ({BUDGET_TOKEN_MULT} * tt.total_tokens)) // t.w_total)
               AS planned_tokens
    FROM wts w, wtot t, tot tt
)
SELECT d.doc_id, d.source, d.n_tokens,
       p.planned_tokens // p.tokens_available AS full_epochs,
       (CAST(('0x' || substr(md5('mix:' || d.doc_id::VARCHAR), 1, 8)) AS BIGINT)
            * p.tokens_available
        < (p.planned_tokens % p.tokens_available) * 4294967296)
           AS in_fractional,
       (p.planned_tokens // p.tokens_available
        + CASE WHEN CAST(('0x' || substr(md5('mix:' || d.doc_id::VARCHAR), 1, 8)) AS BIGINT)
                    * p.tokens_available
                    < (p.planned_tokens % p.tokens_available) * 4294967296
               THEN 1 ELSE 0 END)::BIGINT AS n_copies
FROM docs d JOIN plan p USING (source)
"""


@register("corpus_mix_sampled_manifest", oracle=_MIX_MANIFEST_SQL,
          tags=("sampling", "governance", "mixing", "manifest"))
def corpus_mix_sampled_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document realization of the alpha=0.5 mix plan: every
    non-empty doc reports its source's whole-epoch repeat count and
    whether it joins the hash-sampled fractional epoch, summing to
    ``n_copies`` — the training-manifest artifact a loader consumes to
    materialize the mix (corpus_mix_temperature_sweep plans the targets;
    this op assigns them to documents).

    Exactness: the plan half reuses the sweep's integer discipline
    (pow() micro-rounded ONCE, targets by BIGINT DIV); the fractional
    membership is an exact integer cross-multiplication of the Bernoulli
    rate (h * available < remainder * 2^32) on a 32-bit md5 prefix — no
    float compare anywhere, both engines select identical docs.

    Scale shape: one groupBy(source) shuffle for the per-source token
    relation (map-side partials); the n_sources-row plan broadcasts back
    onto the doc scan, so the manifest itself is a ZERO-shuffle
    projection — no per-source window, no global order, parallel at any
    corpus size."""
    # NON-EMPTY token count: trim() strips spaces only, so whitespace-only
    # or \n-trailing text would otherwise contribute phantom empty tokens
    # to tokens_available (and the test reference counts real words)
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            F.size(F.filter(tokens(), lambda t: t != ""))
            .cast("long")
            .alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .localCheckpoint(eager=True)  # feeds the plan agg AND the manifest
    )
    per_src = docs.groupBy("source").agg(
        F.sum("n_tokens").alias("tokens_available")
    )
    wts = per_src.withColumn(
        "weight_micro",
        F.floor(
            F.pow(F.col("tokens_available"), F.lit(MIX_MANIFEST_ALPHA))
            * F.lit(1_000_000)
            + F.lit(0.5)
        ).cast("long"),
    ).localCheckpoint(eager=True)  # feeds the plan rows AND the scalar agg
    # both scalars fold out of ONE agg over the weighted per-source rows
    wtot = wts.agg(
        F.sum("weight_micro").alias("w_total"),
        F.sum("tokens_available").cast("long").alias("total_tokens"),
    )
    plan = (
        wts.crossJoin(F.broadcast(wtot))
        .select(
            "source",
            "tokens_available",
            F.least(
                F.col("tokens_available") * MAX_REPEAT_EPOCHS,
                F.expr(
                    f"(weight_micro * ({BUDGET_TOKEN_MULT} * total_tokens)) DIV w_total"
                ),
            ).alias("planned_tokens"),
        )
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    in_frac = (
        h * F.col("tokens_available")
        < (F.col("planned_tokens") % F.col("tokens_available")) * F.lit(4294967296)
    )
    full = F.expr("planned_tokens DIV tokens_available")
    return docs.join(F.broadcast(plan), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        full.alias("full_epochs"),
        in_frac.alias("in_fractional"),
        (full + F.when(in_frac, 1).otherwise(0)).cast("long").alias("n_copies"),
    )


@register("bm25_stored_compact", oracle=_BM25_TOPK_SQL,
          tags=("text", "retrieval", "bm25", "stored-index", "compaction"))
def bm25_stored_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store compaction, driver-proven: build the postings index from the
    already-indexed corpus half, APPEND the incoming batch (leaving every
    bucket with one file per ingest, the known cost of blind bucket-
    layout appends), REWRITE the postings table in place under the same
    bucket spec (operators/compaction.py — one file per bucket after),
    then probe. Sharing the full-corpus oracle makes compaction's
    no-op-ness the theorem under test: the post-compaction store must
    score bit-identically to a fresh build, and the probe PLAN is
    unchanged (same bucket-local term join, same broadcasts — pinned by
    plan fingerprint in tests and the plan audit).

    Scale shape: compaction reads and rewrites only the postings
    relation — one repartition shuffle on the bucket column (Murmur3-
    aligned with the bucket spec, so each task emits exactly one file);
    terms and scalars are untouched. At 100 TB this is the OPTIMIZE job
    run off the ingest path under the store's build lock."""
    from e_commerce_click_stream_spark.operators.bm25_index import (
        NUM_POSTING_BUCKETS,
        POSTINGS_SUBDIR,
        append_to_postings_index,
        build_postings_index,
        postings_table_names,
    )
    from e_commerce_click_stream_spark.operators.compaction import (
        compact_bucketed_table,
    )
    from e_commerce_click_stream_spark.operators.storelock import (
        acquire_build_lock,
        downgrade_to_shared,
    )
    import os as _os

    index_dir, prefix = _bm25_store_location(sf_dir)
    docs = _bm25_docs_with_flag(spark, sf_dir)

    acquire_build_lock(index_dir)
    build_postings_index(
        docs.filter(~F.col("is_new")).select("doc_id", "ts"), prefix,
        location=index_dir,
    )
    append_to_postings_index(
        spark, docs.filter("is_new").select("doc_id", "ts"), prefix,
        location=index_dir,
    )
    post_t, _, _ = postings_table_names(prefix)
    compact_bucketed_table(
        spark, post_t, "tok", NUM_POSTING_BUCKETS,
        location=_os.path.join(index_dir, POSTINGS_SUBDIR), sort_col="tok",
    )
    downgrade_to_shared(index_dir)
    return _bm25_probe(spark, prefix)


# Erasure oracle: BM25 retrieval over the SURVIVING corpus only — a
# rebuild with the erased ingest batch never indexed. The store query
# must reach the same rows via tombstones + decremented counts.
from e_commerce_click_stream_spark.plans.dedup import sql_is_new  # noqa: E402

_BM25_ERASE_SQL = f"""
WITH {_bm25_core_sql(f" AND NOT {sql_is_new()}")}
SELECT query_id, doc_id, n_terms, score_micro, bm25, rank::BIGINT AS rank
FROM bm_ranked WHERE rank <= {BM25_TOP_K}
"""


@register("bm25_stored_erase", oracle=_BM25_ERASE_SQL,
          tags=("text", "retrieval", "bm25", "stored-index", "erasure"))
def bm25_stored_erase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR erasure against a warm postings store, driver-proven: build
    the index over the FULL corpus, ERASE the ingest batch (the same
    is_new split the append op folds in — erasure is append run in
    reverse), then probe merge-on-read. The oracle rebuilds BM25 on the
    surviving corpus only, so the green row proves the whole logical-
    deletion contract at once: tombstoned docs vanish as candidates AND
    as query docs, per-term df decrements land exactly on the surviving
    corpus' dfrel, and the corpus scalars subtract — down to every
    micro-rounded score.

    Scale shape (operators/bm25_index.py): the erase pass reads the
    erased docs' postings FROM the store via a broadcast semi-join
    (never re-tokenizes them) and rewrites only the tok-count tables
    (|terms| rows) + the 1-row scalars + the tombstone deletion vector;
    the corpus-sized postings table is untouched. The probe pays one
    extra BroadcastHashJoin (anti) on each postings scan — no new
    shuffle. The physical rewrite is ``apply_erasures``, deferred off
    the erasure path and pinned probe-identical in tests. Own store
    kind ("bm25e"): this query leaves the store eroded by design, which
    the shared warm bm25 store must never observe."""
    from e_commerce_click_stream_spark.operators.bm25_index import (
        build_postings_index,
        erase_from_postings_index,
    )
    from e_commerce_click_stream_spark.operators.storelock import (
        acquire_build_lock,
        downgrade_to_shared,
        store_location,
    )

    index_dir, prefix = store_location("bm25e", sf_dir)
    docs = _bm25_docs_with_flag(spark, sf_dir)

    acquire_build_lock(index_dir)
    build_postings_index(docs.select("doc_id", "ts"), prefix, location=index_dir)
    erase_from_postings_index(
        spark, docs.filter("is_new").select("doc_id"), prefix,
        location=index_dir,
    )
    downgrade_to_shared(index_dir)
    return _bm25_probe(spark, prefix)


@register("bm25_stored_apply_erase", oracle=_BM25_ERASE_SQL,
          tags=("text", "retrieval", "bm25", "stored-index", "erasure"))
def bm25_stored_apply_erase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full erase→APPLY→probe cycle under the oracle hash (VERDICT
    r12 #2): build over the full corpus, logically erase the ingest
    batch, run ``apply_erasures`` (the physical merge-on-read rewrite —
    tombstoned postings dropped under the original bucket spec,
    terms/scalars restated from the surviving snapshot, tombstones
    truncated), then probe. Shares ``bm25_stored_erase``'s surviving-
    corpus oracle, so the green row proves the physical rewrite is a
    score-level no-op on top of the logical contract — a fixture
    regeneration can never silently break the rewrite-under-bucket-spec
    step while only the logical twin is gated. The builder additionally
    RAISES unless the apply physically happened: postings rows dropped,
    no erased id surviving in the postings table, and the tombstone
    vector truncated to zero — assertions the oracle hash alone cannot
    see (the probe would also pass merge-on-read).

    Scale shape: everything in ``bm25_stored_erase`` plus ONE deferred
    compaction-style pass over the postings relation (broadcast
    anti-join, repartition aligned to the bucket spec so each task emits
    one file per bucket) and a |terms|-sized restate — the rewrite cost
    a production store pays once per erasure epoch, off the request
    path. Own store kind ("bm25ea")."""
    from e_commerce_click_stream_spark.operators.bm25_index import (
        apply_erasures,
        build_postings_index,
        erase_from_postings_index,
        postings_table_names,
        tombstones_table_name,
    )
    from e_commerce_click_stream_spark.operators.storelock import (
        acquire_build_lock,
        downgrade_to_shared,
        store_location,
    )

    index_dir, prefix = store_location("bm25ea", sf_dir)
    docs = _bm25_docs_with_flag(spark, sf_dir)
    erased = docs.filter("is_new").select("doc_id")

    acquire_build_lock(index_dir)
    build_postings_index(docs.select("doc_id", "ts"), prefix, location=index_dir)
    erase_from_postings_index(spark, erased, prefix, location=index_dir)
    stats = apply_erasures(spark, prefix, location=index_dir)
    downgrade_to_shared(index_dir)

    post_t, _, _ = postings_table_names(prefix)
    # only a tokenizable erased doc contributes postings rows to drop
    # (and an empty fixture has none at all — the physical assertions
    # are vacuous there by design)
    any_erased_postings = (
        docs.filter("is_new").filter(F.size("ts") > 0).limit(1).count() > 0
    )
    if any_erased_postings and stats["dropped"] <= 0:
        raise RuntimeError(f"apply_erasures dropped nothing: {stats}")
    if spark.table(post_t).join(erased, "doc_id", "left_semi").count() != 0:
        raise RuntimeError("postings still hold erased doc_ids after apply")
    if spark.table(tombstones_table_name(prefix)).count() != 0:
        raise RuntimeError("tombstone vector not truncated after apply")
    return _bm25_probe(spark, prefix)


@register("quality_nb_probe_only", oracle=_NB_CLASSIFIER_SQL,
          tags=("text", "quality", "classifier", "nb", "stored-index"))
def quality_nb_probe_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STORED-WEIGHTS NB scoring: fit once into catalog tables
    (<prefix>_weights: bucket -> w_micro, <prefix>_prior: 1 row), then
    score batches purely FROM the store — the train-once/score-per-batch
    production shape, the same build/probe split the BM25, band, and IVF
    stores established, applied to the classifier family. Reuses the
    persisted weights if this session already built them (build only on
    a cold start). Shares quality_nb_classifier's oracle, so the green
    row proves stored-weights scoring is bit-identical to the in-query
    fit+score — the weight round-trip is exact because the weights are
    already integers (micro-rounded once at fit time; parquet stores
    BIGINTs losslessly where raw doubles would invite re-rounding).

    Scale shape: the probe tokenizes ONLY its batch (here the query-by-
    example corpus, via the same _nb_dtb definition as the fit, so the
    two tokenizations cannot drift); the <= NB_BUCKETS stored weights
    BROADCAST into the scoring join; the stored prior rides a 1-row
    broadcast; ONE per-doc aggregation shuffle. Nothing re-fits."""
    from e_commerce_click_stream_spark.operators.storelock import (
        acquire_build_lock,
        acquire_read_lock,
        downgrade_to_shared,
        store_location,
    )
    import os as _os

    index_dir, prefix = store_location("nbw", sf_dir)
    weights_t, prior_t = f"{prefix}_weights", f"{prefix}_prior"
    # probe BOTH tables: a crash between the two saves must re-trigger
    # the build (a weights-only store would wedge every warm run on
    # TABLE_OR_VIEW_NOT_FOUND at the prior read)
    if not (
        spark.catalog.tableExists(weights_t)
        and spark.catalog.tableExists(prior_t)
    ):
        # cold start: fit once into the store, outside any steady state
        batch_dtb = _nb_dtb(spark, sf_dir)
        nbw = _nb_weights(batch_dtb).localCheckpoint(eager=True)
        prior = (
            batch_dtb.select("doc_id", "label")
            .distinct()
            .agg(_nb_prior_expr())
        )
        acquire_build_lock(index_dir)
        (
            nbw.write.mode("overwrite").format("parquet")
            .option("path", _os.path.join(index_dir, "weights"))
            .saveAsTable(weights_t)
        )
        (
            prior.write.mode("overwrite").format("parquet")
            .option("path", _os.path.join(index_dir, "prior"))
            .saveAsTable(prior_t)
        )
        downgrade_to_shared(index_dir)
    else:
        acquire_read_lock(index_dir)
        # warm path: tokenize ONLY the batch (the cold path reuses the
        # fit's checkpointed relation instead of tokenizing twice)
        batch_dtb = _nb_dtb(spark, sf_dir)
    perdoc = (
        batch_dtb.join(F.broadcast(spark.table(weights_t)), "bucket")
        .groupBy("doc_id", "label")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.count("*").alias("n_feat_buckets"),
            F.sum(F.col("tf") * F.col("w_micro")).alias("dot_micro"),
        )
    )
    return _nb_final_select(
        perdoc.crossJoin(F.broadcast(spark.table(prior_t)))
    )
