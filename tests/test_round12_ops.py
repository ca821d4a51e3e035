"""Round-12 operator pins.

quality_nb_classifier / quality_nb_confusion: the fixture corpus draws
every document from one shared 31-word pool, so no label is lexically
separable there (the driver row proves engine parity, not learning).
Real learning is pinned HERE on a constructed corpus with disjoint
class vocabularies, against an independent pure-Python Naive Bayes
reference that replicates the committed pipeline end to end: structural
label battery, folded tokenize, md5 bucket hash, add-one smoothing,
micro-rounded integer log-odds.
"""

from __future__ import annotations

import hashlib
import math
import os
import re
import tempfile

from e_commerce_click_stream_spark.plans.registry import all_specs
from e_commerce_click_stream_spark.plans.text import NB_BUCKETS

SPECS = all_specs()


def _ref_tokens(text):
    """Builder's exact feature tokenization: İ/Σ pre-fold, lower,
    space-only trim, ASCII-class \\s+ split (see _ref_dsir's notes)."""
    folded = text.translate(str.maketrans("İΣ", "iσ")).lower()
    return [w for w in re.split(r"\s+", folded.strip(" "), flags=re.ASCII) if w]


def _ref_label(text):
    """The committed structural label: the Gopher battery minus the
    required-stopword rule, computed independently. Only valid for the
    corpora this test constructs (single-line, no '#'/'...'/'…', no
    bullet starts or ellipsis ends — those rules reduce to ratios of 0)."""
    if text is None:
        return False
    words = [w for w in re.split(r"\s+", text.strip(" "), flags=re.ASCII) if w]
    if not words:
        return False
    n = len(words)
    mean_wlen = sum(len(w) for w in words) / n
    alpha = sum(1 for w in words if re.search("[a-zA-Z]", w)) / n
    assert "#" not in text and "..." not in text and "…" not in text
    assert not text.startswith(("-", "*", "•")) and "\n" not in text
    return 50 <= n <= 100000 and 3.0 <= mean_wlen <= 10.0 and alpha >= 0.8


def _bucket(w):
    return int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % NB_BUCKETS


def _ref_nb(rows):
    """Independent NB reference. rows = [(doc_id, text)]. Returns
    {doc_id: (label, n_tokens, n_feat_buckets, log_odds_micro, pred)}."""
    docs = []
    for doc_id, text in rows:
        if text is None or not text.strip():
            continue
        toks = _ref_tokens(text)
        if toks:
            docs.append((doc_id, _ref_label(text), toks))
    pos, neg = {}, {}
    for _d, label, toks in docs:
        side = pos if label else neg
        for w in toks:
            b = _bucket(w)
            side[b] = side.get(b, 0) + 1
    p_total, n_total = sum(pos.values()), sum(neg.values())
    buckets = set(pos) | set(neg)
    w_micro = {
        b: math.floor(
            math.log(
                ((pos.get(b, 0) + 1) * (n_total + NB_BUCKETS))
                / ((neg.get(b, 0) + 1.0) * (p_total + NB_BUCKETS))
            )
            * 1_000_000
            + 0.5
        )
        for b in buckets
    }
    n_pos = sum(1 for _d, label, _t in docs if label)
    n_neg = len(docs) - n_pos
    prior = math.floor(math.log((n_pos + 1.0) / (n_neg + 1)) * 1_000_000 + 0.5)
    out = {}
    for doc_id, label, toks in docs:
        dot = sum(w_micro[_bucket(w)] for w in toks)
        lo = dot + prior
        out[doc_id] = (label, len(toks), len({_bucket(w) for w in toks}), lo, lo > 0)
    return out


# 5 long editorial-vocabulary docs (label True: >= 50 words, mean word
# length in [3, 10], >= 80% alphabetic) vs 7 short junk-vocabulary docs
# (label False: < 50 words). Vocabularies are DISJOINT, so a working NB
# must separate them perfectly at training fit.
_GOOD_VOCAB = ["İstanbul", "quality", "signal", "corpus", "editorial", "prose"]
_BAD_VOCAB = ["spam", "junk", "blah", "noise", "clickbait"]


def _nb_corpus():
    rows = []
    for i in range(5):
        words = [(_GOOD_VOCAB[(i + j) % len(_GOOD_VOCAB)]) for j in range(60)]
        if i == 0:
            # 10/60 non-alphabetic words: alpha_frac 0.833 still passes,
            # and the Σ fold path gets exercised on the positive class
            words[:10] = ["ΣΟΦΟΣ"] * 10
        rows.append((100 + i, " ".join(words)))
    for i in range(7):
        words = [(_BAD_VOCAB[(i + j) % len(_BAD_VOCAB)]) for j in range(12)]
        if i == 0:
            # NBSP inside a token: one token to the ASCII-class split
            words[0] = "non breaking"
        rows.append((200 + i, " ".join(words)))
    rows.append((300, None))  # NULL text -> excluded
    rows.append((301, "   "))  # whitespace-only -> excluded
    return rows


def test_quality_nb_matches_reference(spark):
    rows = _nb_corpus()
    out = tempfile.mkdtemp(prefix="nbq_")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t) if t else 0) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    expected = _ref_nb(rows)
    got = {
        r["doc_id"]: r
        for r in SPECS["quality_nb_classifier"].builder(spark, out).collect()
    }
    assert set(got) == set(expected)
    for d, (label, n, nb, lo, pred) in expected.items():
        r = got[d]
        assert r["label"] == label, d
        assert r["n_tokens"] == n, d
        assert r["n_feat_buckets"] == nb, d
        assert r["log_odds_micro"] == lo, d
        assert r["pred_keep"] == pred, d
    # the point of the constructed corpus: the model actually LEARNED —
    # perfect training fit on disjoint vocabularies, both classes present
    assert {r["pred_keep"] for r in got.values()} == {True, False}
    assert all(r["pred_keep"] == r["label"] for r in got.values())


def test_quality_nb_confusion_matches_reference(spark):
    rows = _nb_corpus()
    out = tempfile.mkdtemp(prefix="nbc_")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t) if t else 0) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    expected = {}
    for label, n, _nb, _lo, pred in _ref_nb(rows).values():
        cell = expected.setdefault((label, pred), [0, 0])
        cell[0] += 1
        cell[1] += n
    got = {
        (r["label"], r["pred_keep"]): (r["n_docs"], r["n_tokens"])
        for r in SPECS["quality_nb_confusion"].builder(spark, out).collect()
    }
    assert got == {k: tuple(v) for k, v in expected.items()}
    # perfect training fit -> exactly the two diagonal cells
    assert set(got) == {(True, True), (False, False)}
