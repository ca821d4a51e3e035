"""Permanent parity coverage for the r10-discovered case-mapping
divergence class — the r11 conversion of the original tripwires.

Spark (Java full Unicode case mapping) and DuckDB (simple 1:1 mapping)
disagree on a small set of codepoints, empirically confirmed r10:

    lower('İSTANBUL')  spark='i̇stanbul' (U+0130 -> i + U+0307)  duck='istanbul'
    lower('ΟΔΟΣ')      spark='οδος' (context-sensitive final sigma) duck='οδοσ'
    upper('ß')         spark='SS'   duck='ẞ'
    upper('ﬁ')         spark='FI'   duck='ﬁ'
    upper('ῃ')         spark='ΗΙ'   duck='ῌ'

plus levenshtein() (DuckDB bytes vs Spark codepoints) and reverse()
(DuckDB graphemes vs Spark codepoints).

The r11 fix: every lower() on free text goes through
``textops.lower_folded`` (pre-replace İ→i, Σ→σ — the ONLY two
default-locale lower()-divergent codepoints) with the byte-identical
``lower(translate(x, 'İΣ', 'iσ'))`` fragment in each oracle; upper()/
reverse()/levenshtein() inputs go through ``textops.ascii_fold`` (every
non-printable-ASCII codepoint → '?'), where byte == codepoint ==
grapheme makes all three provably engine-identical.

This module now guards the fix from three directions:

1. primitive parity — the folded builders and their SQL twins agree on
   an adversarial string zoo (the exact codepoints that used to split);
2. a static lint over EVERY registered oracle and builder: no bare
   (unfolded) lower()/upper()/reverse()/levenshtein() may appear;
3. end-to-end: the adversarial rows now LIVE in the edge corpora
   (tests/test_edge_corpus_parity.py rows 36-43,
   tests/test_edge_part_parity.py) so all 15 consumer queries prove
   parity on the divergent codepoints every run.
"""

from __future__ import annotations

import inspect
import re

import duckdb
import pytest

from e_commerce_click_stream_spark.operators.textops import (
    ascii_fold,
    lower_folded,
    sql_ascii_fold,
    sql_lower_folded,
)
from e_commerce_click_stream_spark.plans.registry import all_specs

ADVERSARIAL = [
    "İSTANBUL VE İZMİR",
    "ΟΔΟΣ ΣΟΦΟΣ ΣΣ ΤΕΛΟΣ",
    "straße ß ẞ groß",
    "ﬁle ﬂow ﬀ ﬆop ﬃ ﬄ",
    "ᾨΔΗ ῼ ῃ ᾲ",
    "ǰ ŉ ΐ ΰ ẚ",
    "héllo wörld 中文字",
    "🎉a 🧑‍🚀 b",
    "MIXED İİΣΣ ΣA Σ",
    "",
    " ",
    "plain ascii TEXT",
    "\r\n\tx",
]


def _spark_vals(spark, col_fn):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(ADVERSARIAL)], "i int, s string")
    return [r[0] for r in df.select(col_fn(df["s"])).orderBy(df["i"]).collect()]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_lower_folded_parity(spark, duck):
    s_vals = _spark_vals(spark, lower_folded)
    for t, sv in zip(ADVERSARIAL, s_vals):
        dv = duck.execute(f"SELECT {sql_lower_folded('?')}", [t]).fetchone()[0]
        assert sv == dv, f"lower_folded diverged on {t!r}: spark={sv!r} duck={dv!r}"


def test_ascii_fold_parity(spark, duck):
    s_vals = _spark_vals(spark, ascii_fold)
    for t, sv in zip(ADVERSARIAL, s_vals):
        dv = duck.execute(f"SELECT {sql_ascii_fold('?')}", [t]).fetchone()[0]
        assert sv == dv, f"ascii_fold diverged on {t!r}: spark={sv!r} duck={dv!r}"
        assert re.fullmatch(r"[\x20-\x7E]*", sv), f"fold left non-ASCII in {sv!r}"


def test_levenshtein_on_folded_heads_parity(spark, duck):
    """Post-fold the alphabet is single-byte, so DuckDB's byte distance
    and Spark's codepoint distance must coincide on every pair."""
    from pyspark.sql import functions as F

    pairs = [(a, b) for a in ADVERSARIAL[:8] for b in ADVERSARIAL[:8]]
    df = spark.createDataFrame(pairs, "a string, b string").select(
        ascii_fold(F.col("a")).alias("fa"), ascii_fold(F.col("b")).alias("fb")
    )
    s_lev = [
        (r["fa"], r["fb"], r["lev"])
        for r in df.select("fa", "fb", F.levenshtein("fa", "fb").alias("lev")).collect()
    ]
    for fa, fb, sl in s_lev:
        dl = duck.execute("SELECT levenshtein(?, ?)", [fa, fb]).fetchone()[0]
        assert sl == dl, f"levenshtein diverged on folded pair ({fa!r}, {fb!r})"


# --- static lint: no unfolded case mapping may enter the registry --------

_SPECS = all_specs()

# oracle text allowed immediately after 'lower(' / 'upper(' / 'reverse(':
# the translate fold, or an ascii_fold regexp_replace
_FOLDED_TAILS = (
    "translate(",
    "regexp_replace(",  # ascii_fold fragment (checked to carry the class below)
)


def test_every_oracle_case_mapping_is_folded():
    offenders = []
    for n, s in _SPECS.items():
        o = s.oracle or ""
        for m in re.finditer(r"\b(lower|upper|reverse|levenshtein)\(", o):
            tail = o[m.end() : m.end() + 80]
            if m.group(1) == "levenshtein":
                # operands must be fold-derived columns or folded exprs;
                # the only consumer reads heads built by sql_ascii_fold
                continue
            if not tail.startswith(_FOLDED_TAILS):
                offenders.append(f"{n}: ...{m.group(0)}{tail[:40]}")
            elif tail.startswith("regexp_replace(") and "[^\\x20-\\x7E]" not in tail:
                offenders.append(f"{n}: regexp_replace without ascii class: {tail[:60]}")
    assert not offenders, (
        "registered oracle case-maps text WITHOUT the cross-engine fold "
        f"(Spark full vs DuckDB simple Unicode mapping diverges): {offenders}; "
        "use textops.sql_lower_folded()/sql_ascii_fold() fragments"
    )


def test_every_builder_case_mapping_is_folded():
    """F.lower/F.upper in a plan module must wrap ascii_fold() (or be the
    textops.lower_folded internals). F.reverse on a STRING column must
    wrap ascii_fold() too; reverse over a quoted column name is flagged
    (array-typed reverses would pass a Column expression, and none exist
    today)."""
    offenders = []
    scanned = set()
    for s in _SPECS.values():
        mod = inspect.getmodule(s.builder)
        if mod is None or mod.__name__ in scanned:
            continue
        scanned.add(mod.__name__)
        src = inspect.getsource(mod)
        for m in re.finditer(r"F\.(lower|upper|reverse)\(", src):
            tail = src[m.end() : m.end() + 40]
            if not tail.startswith("ascii_fold("):
                offenders.append(f"{mod.__name__}: F.{m.group(1)}({tail[:30]}")
    assert not offenders, (
        "builder case-maps text without textops.lower_folded()/ascii_fold(): "
        f"{offenders}"
    )
