"""Invariant tests for the r11 operators, led by
doc_line_boilerplate_scrub.

The sf fixtures are single-line documents (no newlines), so the driver
gate's green row proves the pipeline end-to-end but never exercises
multi-line semantics — the same situation test_vacuous_proofs covers
for dedup_exact. These tests construct corpora where the interesting
rows EXIST: cross-doc boilerplate lines (dropped), intra-doc repeats
(kept — the threshold counts DISTINCT docs), whitespace-only and blank
lines, multibyte lines whose İ/Σ variants must match through the folded
normalization key, trailing newlines, and single-line docs. Builder and
oracle are compared with the driver's multiset semantics, and the
rewrite is additionally checked against hand-computed expectations."""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections import Counter

import duckdb

from e_commerce_click_stream_spark.plans.registry import all_specs

SPECS = all_specs()


def _write_docs(spark, rows):
    out = tempfile.mkdtemp(prefix="r11_corpus_")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t) if t else 0) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def _oracle_rows(sql, docs_path):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{docs_path}/*.parquet'"
    )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


FOOTER = "Subscribe to our newsletter"

SCRUB_CORPUS = [
    # boilerplate footer in 3 docs -> dropped everywhere
    (1, f"unique alpha content\n{FOOTER}\nmore alpha"),
    (2, f"different beta text\n{FOOTER}"),
    (3, f"gamma closing\n{FOOTER}\ngamma end\n"),  # + trailing newline
    # intra-doc repetition only -> df counts DISTINCT docs, so KEPT
    (4, "solo repeated line\nsolo repeated line\nunique tail"),
    # whitespace-only and empty lines -> blank_lines, never keyed
    (5, "kept one\n   \n\t\nkept two"),
    # folded-key match: 'İstanbul ΣΟΦΟΣ footer' and 'istanbul σοφοσ footer'
    # normalize identically -> both dropped as cross-doc boilerplate
    (6, "doc six body\nİstanbul ΣΟΦΟΣ footer"),
    (7, "doc seven body\nistanbul   σοφοσ footer"),
    # single-line docs: one unique (kept), one pair (both dropped)
    (8, "a single unique line"),
    (9, "twin single line"),
    (10, "twin  single  line"),  # whitespace-collapse matches doc 9
    (11, ""),  # empty text -> one blank line, empty rewrite
]


def test_line_scrub_matches_oracle_on_multiline_corpus(spark):
    out = _write_docs(spark, SCRUB_CORPUS)
    spec = SPECS["doc_line_boilerplate_scrub"]
    sdf = spec.builder(spark, out)
    s_cols = sorted(sdf.columns)
    s_rows = Counter(tuple(r[c] for c in s_cols) for r in sdf.collect())
    o_col_names, o_raw = _oracle_rows(spec.oracle, os.path.join(out, "documents.parquet"))
    idx = [o_col_names.index(c) for c in sorted(o_col_names)]
    o_rows = Counter(tuple(r[i] for i in idx) for r in o_raw)
    assert s_cols == sorted(o_col_names)
    assert s_rows == o_rows


def test_line_scrub_semantics_hand_computed(spark):
    out = _write_docs(spark, SCRUB_CORPUS)
    got = {
        r["doc_id"]: r.asDict()
        for r in SPECS["doc_line_boilerplate_scrub"].builder(spark, out).collect()
    }

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    # doc 1: footer dropped, two content lines kept
    assert got[1]["dropped_lines"] == 1
    assert got[1]["cleaned_fp"] == md5("unique alpha content\nmore alpha")
    # doc 3: trailing newline -> 4 split lines, 1 blank, footer dropped
    assert got[3]["n_lines"] == 4
    assert got[3]["blank_lines"] == 1
    assert got[3]["dropped_lines"] == 1
    assert got[3]["cleaned_fp"] == md5("gamma closing\ngamma end")
    # doc 4: intra-doc repeat is NOT boilerplate (distinct-doc threshold)
    assert got[4]["dropped_lines"] == 0
    assert got[4]["kept_lines"] == 3
    # doc 5: whitespace-only lines are blanks, scrubbed from the rewrite
    assert got[5]["blank_lines"] == 2
    assert got[5]["cleaned_fp"] == md5("kept one\nkept two")
    # docs 6/7: İ/Σ variants matched through the folded key -> dropped;
    # the REWRITE keeps original text of surviving lines
    assert got[6]["dropped_lines"] == 1
    assert got[7]["dropped_lines"] == 1
    assert got[6]["cleaned_fp"] == md5("doc six body")
    # docs 9/10: whitespace-collapse key match across docs -> both empty
    assert got[9]["kept_lines"] == 0
    assert got[10]["kept_lines"] == 0
    assert got[9]["cleaned_fp"] == md5("")
    # doc 8 survives untouched; doc 11 is one blank line, empty rewrite
    assert got[8]["cleaned_fp"] == md5("a single unique line")
    assert got[11]["n_lines"] == 1
    assert got[11]["blank_lines"] == 1
    assert got[11]["cleaned_fp"] == md5("")
