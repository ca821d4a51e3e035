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
    """lower + whitespace-collapse normalization for fingerprinting."""
    return F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))


def fingerprint(text_col: str = "text") -> Column:
    return F.md5(normalized_text(text_col))


def signature_bands(sig_col: str, n_bands: int, band_bits: int) -> Column:
    """Slice a packed bit-string signature into an array of
    (band_id, band_sig) structs — the LSH OR-of-bands candidate keys.
    Shared by the sign-LSH (similarity) and SimHash-Hamming (dedup)
    banding paths so the 1-based substring arithmetic lives in one
    place."""
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band_id"),
                F.substring(sig_col, b * band_bits + 1, band_bits).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )
