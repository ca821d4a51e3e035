"""Shared text-processing column builders (tokens, shingles, portable hashes).

Determinism contract: all fingerprints are md5 hex STRINGS (identical bytes
in Spark, DuckDB, and Python's hashlib), never engine-specific integer
hashes, so every operator built on them can be oracle-checked across
engines. Integer values derived from hashes use the ascii-of-hex-char trick
(`ascii(substr(h, i, 1))`) which both engines and plain Python compute
identically.

All builders are pure Column expressions — no UDFs, no shuffles; they run
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

# --- cross-engine case folding -------------------------------------------
#
# Spark (Java full Unicode case mapping) and DuckDB (simple 1:1 mapping)
# disagree on exactly two codepoints under lower():
#
#     lower('İ')  spark = 'i' + U+0307 (combining dot)   duck = 'i'
#     lower('Σ')  spark = 'ς' in final position (context) duck = 'σ' always
#
# (These are the only default-locale lowercase divergences: U+0130 is the
# sole multi-char lowercase special case and Final_Sigma the sole
# context-sensitive one in Unicode SpecialCasing.txt. The multi-char
# UPPERCASE special cases — ß, ligatures, iota subscripts — lowercase
# identically in both engines; probed r11.)
#
# Pre-replacing İ→i and Σ→σ BEFORE lower() makes the two engines agree on
# every input. translate() is codepoint-wise 1:1 in both engines (probed
# r11 incl. astral/ZWJ payloads). Every builder that lowercases free text
# MUST use lower_folded()/normalized_text(), and every oracle must splice
# SQL_LOWER_FOLDED-generated fragments, so the normalization lives in one
# place on each side.
CASEFOLD_SRC = "İΣ"
CASEFOLD_DST = "iσ"

# Printable-ASCII fold for operators whose engine twins diverge on ANY
# non-ASCII input: DuckDB levenshtein() counts BYTES vs Spark CODEPOINTS,
# DuckDB reverse() keeps GRAPHEME clusters vs Spark codepoints, and
# upper() hits the multi-char special cases (ß→SS, ﬁ→FI, ῃ→ΗΙ in Spark
# only). Folding every non-printable-ASCII codepoint to '?' (both regex
# engines match per CODEPOINT, probed r11 incl. astral pairs) yields a
# single-byte alphabet where byte==codepoint==grapheme, making those
# operators provably engine-identical. Control chars fold too: CRLF is
# one grapheme to DuckDB reverse() but two codepoints to Spark's.
ASCII_FOLD_RE = "[^\\x20-\\x7E]"


def casefold_pre(col: Column) -> Column:
    """Pre-replace the two lower()-divergent codepoints (İ, Σ)."""
    return F.translate(col, CASEFOLD_SRC, CASEFOLD_DST)


def lower_folded(col: Column) -> Column:
    """Engine-portable lowercase: lower() after the İ/Σ pre-replacement."""
    return F.lower(casefold_pre(col))


def sql_lower_folded(expr: str) -> str:
    """DuckDB twin of :func:`lower_folded` for oracle fragments."""
    return f"lower(translate({expr}, '{CASEFOLD_SRC}', '{CASEFOLD_DST}'))"


def ascii_fold(col: Column) -> Column:
    """Replace every non-printable-ASCII codepoint with '?'."""
    return F.regexp_replace(col, ASCII_FOLD_RE, "?")


def sql_ascii_fold(expr: str) -> str:
    """DuckDB twin of :func:`ascii_fold` (RE2 needs the 'g' flag)."""
    return f"regexp_replace({expr}, '[^\\x20-\\x7E]', '?', 'g')"


def tokens(text_col: str = "text") -> Column:
    return F.split(F.trim(F.col(text_col)), TOKEN_SPLIT_RE)


def shingles(tokens_col_name: str, k: int = 3) -> Column:
    """Distinct k-word shingles as an array column (empty when < k tokens).

    ``tokens_col_name`` must be the NAME of an existing array<string> column
    (the expression references it by name inside a SQL lambda)."""
    t = tokens_col_name
    parts = [f"{t}[i + {j}]" for j in range(k)]
    expr = (
        f"CASE WHEN size({t}) >= {k} THEN "
        f"array_distinct(transform(sequence(0, size({t}) - {k}), "
        f"i -> concat_ws(' ', {', '.join(parts)}))) "
        f"ELSE cast(array() AS array<string>) END"
    )
    return F.expr(expr)


def minhash(shingles_col: Column, seed: int) -> Column:
    """One MinHash signature component: the minimum md5 hex string of the
    seeded shingles. min() over strings is engine-portable, unlike
    murmur3/xxhash integer minhashing."""
    return F.array_min(
        F.transform(shingles_col, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def normalized_text(text_col: str = "text") -> Column:
    """Folded-lower + whitespace-collapse normalization for fingerprinting.

    Oracle twin: ``md5(lower(translate(regexp_replace(trim(text), '\\s+',
    ' ', 'g'), 'İΣ', 'iσ')))`` — the translate() pre-replacement keeps the
    two engines' lower() identical on every input (see CASEFOLD_SRC)."""
    return lower_folded(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))


def fingerprint(text_col: str = "text") -> Column:
    return F.md5(normalized_text(text_col))


def signature_bands(sig_col: str, n_bands: int, band_bits: int) -> Column:
    """Slice a packed bit-string signature into an array of
    (band_id, band_sig) structs — the LSH OR-of-bands candidate keys.
    Shared by the sign-LSH (similarity) and SimHash-Hamming (dedup)
    banding paths so the 1-based substring arithmetic lives in one
    place. Built as ONE parsed SQL expression — the per-band
    struct/cast/substring Column chain cost ~12 gateway roundtrips x
    n_bands x call, and plan construction is inside every timed run;
    the parsed tree (named_struct of a bigint literal + substring) is
    identical to what the Column API built."""
    structs = ", ".join(
        f"named_struct('band_id', CAST({b} AS BIGINT), "
        f"'band_sig', substring({sig_col}, {b * band_bits + 1}, {band_bits}))"
        for b in range(n_bands)
    )
    return F.expr(f"array({structs})")
