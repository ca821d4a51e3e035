"""Tripwire for the r10-discovered case-folding divergence class.

Spark (Java/ICU full case mapping) and DuckDB (simple 1:1 UTF-8 mapping)
disagree on a small set of codepoints, empirically confirmed r10:

    lower('İSTANBUL')  spark='i̇stanbul' (U+0130 -> i + U+0307)  duck='istanbul'
    lower('ΟΔΟΣ')      spark='οδος' (context-sensitive final sigma) duck='οδοσ'
    upper('ß')         spark='SS'   duck='ẞ'
    upper('ﬁ')         spark='FI'   duck='ﬁ'
    upper('ῃ')         spark='ΗΙ'   duck='ῌ'

Fifteen registered oracles lower() document/part text (tokenizers,
fingerprints, dedup_exact, language-ID) and part_string_functions
upper()s part columns — a regenerated fixture containing any of these
codepoints would hash-split the engines. The FIX (pre-replace the
divergent codepoints before case mapping, centralized in
operators/textops.py and mirrored in the oracle fragments, then re-slot
every consumer) is queued for r11 (window budget: 15 consumers > the
slots left this round — see SURVEY §8 r10). Until then this test fails
LOUDLY, with a pointer, the moment any fixture carries the class —
converting a mysterious future gate red into a named, diagnosed task.

NOTE: do NOT add these codepoints to the edge-corpus fixtures before
the r11 fix lands — the matrices would (correctly) fail on the genuine
divergence.
"""

from __future__ import annotations

import os

import duckdb
import pytest

# lower()-divergent: U+0130 (İ), U+03A3 (Σ, context-sensitive final form);
# upper()-divergent: U+00DF (ß), Latin ligatures U+FB00-FB06, Greek
# iota-subscript/prosgegrammeni forms U+1FB2-1FFC
_DIVERGENT_CLASS = "[İΣßﬀ-ﬆᾲ-ῼ]"

_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_fixtures_free_of_casefold_divergent_codepoints(sf_dir):
    con = duckdb.connect()
    offenders = []
    for t in _TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
            if r[1] == "VARCHAR"
        ]
        for c in cols:
            n = con.execute(
                f"SELECT count(*) FROM '{path}' "
                f"WHERE regexp_matches(\"{c}\", ?)",
                [_DIVERGENT_CLASS],
            ).fetchone()[0]
            if n:
                offenders.append(f"{t}.{c}: {n} rows")
    assert not offenders, (
        "fixture now contains case-folding-divergent codepoints "
        f"({offenders}) — Spark and DuckDB disagree on lower()/upper() for "
        "these (İ, final Σ, ß, ligatures, iota subscripts). Apply the r11 "
        "fix plan recorded in SURVEY §8 (round 10): pre-replace the "
        "divergent codepoints before case mapping in operators/textops.py "
        "AND every oracle fragment that lowers/uppers text, then re-slot "
        "the 15 consumer queries in the verify window."
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_levenshtein_sample_heads_are_ascii(sf_dir):
    """DuckDB levenshtein() is BYTE-based, Spark's is CODEPOINT-based —
    empirically: levenshtein('中文字','中国字') = 3 vs 1,
    ('héllo','hello') = 2 vs 1, ('🎉a','a') = 4 vs 1. The sole consumer
    is dedup_levenshtein_sample over substr(lower(trim(text)),1,40) of
    doc_id % 10 == 0 documents; those sampled heads are pure ASCII on
    current fixtures at all 3 SFs, so every green row stands. The r11 fix
    (bundled with the case-folding wave): ASCII-fold the head BEFORE
    lower() (regexp_replace non-ASCII -> '?' in both engines, 'g' flag in
    DuckDB) — a single-byte alphabet makes byte and codepoint distances
    provably identical and removes this query's casefold exposure too."""
    con = duckdb.connect()
    path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip("no documents fixture")
    n = con.execute(
        f"SELECT count(*) FROM '{path}' WHERE doc_id % 10 = 0 "
        "AND regexp_matches(substr(lower(trim(text)), 1, 40), '[^\\x00-\\x7F]')"
    ).fetchone()[0]
    assert n == 0, (
        f"{n} sampled levenshtein heads now contain non-ASCII — DuckDB "
        "(bytes) and Spark (codepoints) levenshtein distances diverge on "
        "them; apply the ASCII-fold fix recorded in SURVEY §8 (round 10) "
        "and re-slot dedup_levenshtein_sample."
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_part_columns_free_of_grapheme_joiners(sf_dir):
    """reverse() diverges on grapheme clusters: DuckDB reverses GRAPHEMES
    (a ZWJ emoji sequence stays intact) while Spark reverses CODEPOINTS
    (empirically: reverse('🧑\\u200d🚀') = '🚀\\u200d🧑' in Spark, kept
    whole by DuckDB). The only reverse() consumer is
    part_string_functions on p_brand, so the guard is scoped to the part
    table — ZWJ in documents.text is legitimate content no oracle
    reverses."""
    con = duckdb.connect()
    path = os.path.join(sf_dir, "part.parquet")
    if not os.path.exists(path):
        pytest.skip("no part fixture")
    cols = [
        r[0]
        for r in con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
        if r[1] == "VARCHAR"
    ]
    offenders = []
    for c in cols:
        n = con.execute(
            f"SELECT count(*) FROM '{path}' WHERE contains(\"{c}\", chr(8205))",
        ).fetchone()[0]
        if n:
            offenders.append(f"part.{c}: {n} rows")
    assert not offenders, (
        f"part fixture now contains zero-width joiners ({offenders}) — "
        "Spark reverse() (codepoints) and DuckDB reverse() (graphemes) "
        "would split on part_string_functions.brand_rev; replace the "
        "reverse with an engine-identical codepoint reverse in both "
        "builder and oracle, then re-slot part_string_functions."
    )
