"""Cross-engine parity on an EDGE-CASE corpus for every documents-only
query.

The driver regenerates fixtures between rounds, so the documents table
may one day contain what today's fixtures lack: NULL text, empty text,
whitespace-only text, single-token docs, multi-byte unicode, embedded
tabs/newlines, pathological token lengths, and exact duplicates. Each of
those is a classic cross-engine divergence trigger (NULLS FIRST/LAST
window ordering, size(NULL) semantics, ANSI division) — the
doc_length_percentile_filter NULL-length bug was found by exactly this
probe. Every registered query whose oracle reads only ``documents`` is
compared builder-vs-oracle on the constructed corpus, with the driver's
comparison semantics (sorted column names, order-insensitive normalized
value multiset)."""

from __future__ import annotations

import math
import os
import re
import tempfile
from collections import Counter

import duckdb
import pytest

from e_commerce_click_stream_spark.plans.registry import all_specs

SPECS = all_specs()
_OTHER_TABLES = "region nation customer supplier part orders lineitem events embeddings".split()

DOC_ONLY = sorted(
    n
    for n, s in SPECS.items()
    if s.oracle is not None
    and "documents" in s.oracle
    and not any(re.search(rf"\b{t}\b", s.oracle) for t in _OTHER_TABLES)
)

EDGE_TEXTS = [
    (1, None, "en", "src0"),
    (2, "", "en", "src0"),
    (3, "   ", "en", "src1"),
    (4, "one", "en", "src1"),
    (5, "héllo wörld 中文 字 café", "fr", "src2"),
    (6, "tab\tsep\nnewline  double  space", "en", "src2"),
    (7, "x" * 500, "en", "src17"),
    (8, "rep rep rep rep rep rep rep", "en", "src17"),
    # exact duplicates spanning the incremental-dedup batch boundary
    (9, "the quick brown fox jumps over the lazy dog", "en", "src18"),
    (10, "the quick brown fox jumps over the lazy dog", "en", "src19"),
    (11, "alpha beta gamma delta epsilon zeta eta theta", "de", "src3"),
    (12, "contact me at bob@example.com or 555-1234 now", "en", "src4"),
    # PII scrub adversaries (r8): multiple emails per doc, email against
    # unicode, IPv4 vs dotted-phone disambiguation, phone format zoo,
    # pattern at string start/end
    (13, "a@b.co c@d.org café@bistro.fr end@eol.io", "en", "src5"),
    (14, "server 192.168.1.10 and 10.0.0.1 dial 555.123.4567", "en", "src5"),
    (15, "+1 (555) 123-4567 or 555-123-4567 or 555 123 4567", "en", "src6"),
    (16, "192.168.1.10 starts and ends with ip 8.8.8.8", "en", "src6"),
    # substring-span dedup adversaries (r9): a multibyte 8+-token span
    # repeated across two docs; intra-doc tandem repetition whose
    # overlapping anchors must chain into ONE maximal span; two distinct
    # repeated spans in one doc (separate islands, gap >= SPAN_GRAM);
    # a doc that is one whole repeated span (empty rewrite)
    (17, "héllo wörld 中文 δοκιμή køb niño żółć tokyo osaka kyoto", "fr", "src7"),
    (18, "prefix héllo wörld 中文 δοκιμή køb niño żółć tokyo osaka kyoto suffix", "fr", "src7"),
    (19, "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4", "en", "src8"),
    (20, "s1 s2 s3 s4 s5 s6 s7 s8 gap1 gap2 u1 u2 u3 u4 u5 u6 u7 u8 tail", "en", "src8"),
    (21, "lead s1 s2 s3 s4 s5 s6 s7 s8 mid1 u1 u2 u3 u4 u5 u6 u7 u8", "en", "src9"),
    (22, "héllo wörld 中文 δοκιμή køb niño żółć tokyo osaka kyoto", "de", "src9"),
    # script-profile adversaries (r9b): dominant-script ties (equal latin
    # and cyrillic counts -> alphabetical winner), a digits-only doc, a
    # Cyrillic-dominant doc, kana vs CJK-unified in one doc, and a
    # symbols-only doc where every class is 0 but "other" wins
    (23, "пример текста на русском языке для проверки", "ru", "src10"),
    (24, "abc где 123", "ru", "src10"),
    (25, "42 7 999 2026", "en", "src11"),
    (26, "ひらがな カタカナ 漢字 テスト", "ja", "src11"),
    (27, "~~~ !!! ??? +++ ===", "en", "src12"),
    # script-profile math symbols (r9c): U+00D7/U+00F7 are Script=Common,
    # NOT Latin — a measurement-notation doc must not read latin-dominant
    (28, "3×4 ÷ 2 × 9 = 54", "en", "src13"),
    (29, "× ÷ × ÷", "en", "src13"),
    # gopher-rule adversaries (r9c): bullet-heavy lines, ellipsis-ending
    # lines (both '...' and '…'), '#'-symbol soup, a no-alpha token doc
    (30, "- item one\n- item two\n- item three\n* item four", "en", "src14"),
    (31, "first thought...\nsecond thought…\nthird line stays", "en", "src14"),
    (32, "## heading # tag # tag2 #### wall", "en", "src15"),
    (33, "12 34 56 78 90 11 22", "en", "src15"),
    (34, "the words be to of and that have with extra filler", "en", "src16"),
    # unicode line separators (r9c): U+2028/U+2029 directly after an
    # ellipsis — Java's $ matches BEFORE a final line terminator where
    # RE2's matches only at end of text; the \z anchor must agree (the
    # separators are not \n, so they stay INSIDE the split line)
    (35, "left dots...\u2028\nright dots…\u2029\nclean end…", "en", "src20"),
    # case-folding adversaries (r11): the codepoints where Spark's full
    # Unicode case mapping and DuckDB's simple mapping diverge — İ
    # (U+0130, multi-char lower in Spark), final sigma (context-sensitive
    # in Spark), ß/ligatures/iota-subscripts (multi-char UPPER in Spark;
    # lower-safe, present to prove it), astral + ZWJ sequences. These rows
    # would hash-split every case-mapping oracle without the
    # lower_folded()/ascii_fold() pre-replacement (operators/textops.py);
    # they convert the r10 tripwires into permanent parity coverage.
    (36, "İSTANBUL VE İZMİR BÜYÜK ŞEHİRLER İKİSİ", "en", "src21"),
    (37, "ΟΔΟΣ ΣΟΦΟΣ ΣΣ ΤΕΛΟΣ ΣΕ ΘΕΣΣΑΛΟΝΙΚΗ", "en", "src21"),
    (38, "straße ß ẞ groß weiß FUSS", "de", "src22"),
    (39, "ﬁle ﬂow ﬀort ﬆop ligature ﬃ ﬄ zoo", "en", "src22"),
    # doc_id 40 lands in dedup_levenshtein_sample's doc_id % 10 == 0
    # sample — its multibyte head proves the ASCII-fold makes DuckDB's
    # byte-based and Spark's codepoint-based levenshtein identical
    (40, "ᾨΔΗ ῼ ῃ İ Σ 中文字 héllo wörld δοκιμή", "fr", "src23"),
    (41, "🧑\u200d🚀 rocket 🎉 party end emoji go", "en", "src23"),
    # fold-collision pair: lower_folded('İstanbul…') == 'istanbul…', so
    # these two are EXACT duplicates under the folded fingerprint — both
    # engines must agree on the collision, not just on non-collision
    (42, "İstanbul city guide ΣΟΦΟΣ edition", "en", "src24"),
    (43, "istanbul city guide σοφοσ edition", "en", "src24"),
    # line-boilerplate adversaries (r11): a footer line shared across two
    # multi-line docs (dropped by doc_line_boilerplate_scrub), blank and
    # whitespace-only interior lines, and a trailing newline
    (44, "alpha body text\nVisit our sponsor today\n   \nalpha tail", "en", "src25"),
    (45, "beta body text\nVisit  our  sponsor  today\n", "en", "src25"),
]


@pytest.fixture(scope="module")
def edge_dir(spark):
    out = tempfile.mkdtemp(prefix="edge_corpus_")
    rows = [(i, t, l, s, len(t) if t else 0) for i, t, l, s in EDGE_TEXTS]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    return out


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{edge_dir}/documents.parquet/*.parquet'"
    )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else round(v, 9))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


@pytest.mark.parametrize("name", DOC_ONLY)
def test_documents_query_parity_on_edge_corpus(spark, edge_dir, edge_duck, name):
    spec = SPECS[name]
    sdf = spec.builder(spark, edge_dir)
    s_cols = sorted(sdf.columns)
    s_rows = Counter(
        tuple(_norm(r[c]) for c in s_cols) for r in sdf.collect()
    )
    cur = edge_duck.execute(spec.oracle)
    o_col_names = [d[0] for d in cur.description]
    o_cols = sorted(o_col_names)
    idx = [o_col_names.index(c) for c in o_cols]
    o_rows = Counter(tuple(_norm(r[i]) for i in idx) for r in cur.fetchall())
    assert s_cols == o_cols
    assert s_rows == o_rows
