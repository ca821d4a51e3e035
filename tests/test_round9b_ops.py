"""Invariant tests for the r9-continuation operators: doc_script_profile,
eval_gram_decontamination, doc_quality_linear_score, ann_range_search,
user_erasure_audit, user_event_sequences.

Oracle parity is covered by the driver gate and the documents edge
matrix; these pin SEMANTIC guarantees on corpora built to exercise each:
exact class counts and the alphabetical dominant-script tiebreak, a
PLANTED train->eval gram collision (and the vacuously-clean gramless
doc), the exact integer margin incl. a constructed zero-sum boundary
doc, and the inclusive rounded-cosine radius boundary."""

from __future__ import annotations

import hashlib
import math
import os
import tempfile

import pytest

from e_commerce_click_stream_spark.plans.registry import all_specs
from e_commerce_click_stream_spark.plans.text import HASH_DIM

SPECS = all_specs()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _split_of(doc_id: int) -> str:
    return "eval" if ord(_md5(str(doc_id))[0]) % 10 < 2 else "train"


def _bucket(tok: str) -> int:
    h = _md5(tok)
    return (ord(h[0]) * 101 + ord(h[1])) % HASH_DIM


def _weight(b: int) -> int:
    h = _md5(f"w:{b}")
    return (ord(h[0]) * 101 + ord(h[1])) % 201 - 100


def _write_docs(spark, rows):
    out = tempfile.mkdtemp(prefix="r9b_corpus_")
    spark.createDataFrame(
        [(i, t, lang, src, len(t) if t else 0) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


# ---------------------------------------------------------------------- #
# doc_script_profile


def test_script_profile_counts_and_tiebreak(spark):
    d = _write_docs(
        spark,
        [
            (1, "abc где 123", "ru", "s"),  # 3-way tie -> 'cyrillic' (alpha)
            (2, "пример текста", "ru", "s"),  # cyrillic dominant
            (3, "漢字 テスト", "ja", "s"),  # cjk dominant (unified + katakana)
            (4, "~~~ !!!", "en", "s"),  # other dominant, classes all 0
            (5, "   ", "en", "s"),  # whitespace only -> NULL dominant
            (6, None, "en", "s"),  # NULL text -> NULL everything
            (7, "café 42", "fr", "s"),  # é is Latin-1 supplement -> latin
        ],
    )
    rows = {r.doc_id: r for r in SPECS["doc_script_profile"].builder(spark, d).collect()}

    r1 = rows[1]
    assert (r1.latin_chars, r1.cyrillic_chars, r1.digit_chars) == (3, 3, 3)
    assert r1.dominant_script == "cyrillic"  # tie broken alphabetically
    assert r1.nonspace_chars == 9 and r1.total_chars == 11
    assert r1.ascii_only is False

    assert rows[2].dominant_script == "cyrillic" and rows[2].latin_chars == 0
    r3 = rows[3]  # 漢字 (2 unified) + テスト (3 katakana), 1 space
    assert r3.dominant_script == "cjk" and r3.cjk_chars == 5 and r3.nonspace_chars == 5
    r4 = rows[4]
    assert r4.dominant_script == "other" and r4.other_chars == 6
    assert r4.ascii_only is True
    assert rows[5].dominant_script is None and rows[5].nonspace_chars == 0
    r6 = rows[6]
    assert r6.total_chars is None and r6.dominant_script is None
    assert r6.ascii_only is None
    r7 = rows[7]
    assert r7.latin_chars == 4 and r7.digit_chars == 2
    assert r7.dominant_script == "latin"
    assert r7.latin_frac == round(4 / 6, 6)


# ---------------------------------------------------------------------- #
# eval_gram_decontamination


def test_decontamination_planted_collision(spark):
    # deterministic split: find concrete eval/train ids up front
    eval_ids = [i for i in range(1, 200) if _split_of(i) == "eval"]
    train_ids = [i for i in range(1, 200) if _split_of(i) == "train"]
    e1, t1, t2, t3 = eval_ids[0], train_ids[0], train_ids[1], train_ids[2]

    leak = "l1 l2 l3 l4 l5 l6 l7 l8"  # exactly one 8-gram
    d = _write_docs(
        spark,
        [
            (e1, f"{leak} evtail1 evtail2", "en", "s"),
            (t1, f"pre1 {leak} post1", "en", "s"),  # planted collision
            (t2, "c1 c2 c3 c4 c5 c6 c7 c8 c9", "en", "s"),  # clean
            (t3, "too short", "en", "s"),  # gramless -> vacuously clean
        ],
    )
    rows = {
        r.doc_id: r
        for r in SPECS["eval_gram_decontamination"].builder(spark, d).collect()
    }
    assert set(rows) == {t1, t2, t3}, "only train docs are reported"

    r = rows[t1]
    # "pre1 {leak} post1" has 10 tokens -> 3 grams; only the middle one
    # (the planted leak) is in the eval gram set
    assert (r.n_grams, r.eval_hit_grams, r.contaminated) == (3, 1, True)
    assert r.eval_hit_frac == round(1 / 3, 6)
    assert rows[t2].contaminated is False and rows[t2].eval_hit_grams == 0
    r3 = rows[t3]
    assert (r3.n_grams, r3.eval_hit_grams, r3.contaminated) == (0, 0, False)
    assert r3.eval_hit_frac is None


# ---------------------------------------------------------------------- #
# doc_quality_linear_score


def test_linear_score_exact_margin_and_boundary(spark):
    # find a token pair whose weights cancel exactly -> margin 0 (kept):
    # target a weight whose exact negation is reachable in the 32-bucket
    # weight table (not every weight's is)
    reachable = {_weight(b) for b in range(HASH_DIM)}
    target = next(w for w in sorted(reachable, reverse=True) if w > 0 and -w in reachable)
    pos = next(t for t in (f"p{i}" for i in range(10000)) if _weight(_bucket(t)) == target)
    neg = next(t for t in (f"n{i}" for i in range(10000)) if _weight(_bucket(t)) == -target)
    text0 = f"{pos} {neg}"
    text1 = "alpha beta gamma"
    exp1 = sum(_weight(_bucket(t)) for t in text1.split())

    d = _write_docs(
        spark, [(1, text0, "en", "s"), (2, text1, "en", "s"), (3, None, "en", "s")]
    )
    rows = {
        r.doc_id: r
        for r in SPECS["doc_quality_linear_score"].builder(spark, d).collect()
    }
    r1 = rows[1]
    assert r1.weight_sum == 0 and r1.keep is True  # boundary is integer-exact
    assert r1.prob == 0.5
    r2 = rows[2]
    assert r2.weight_sum == exp1 and r2.n_tokens == 3
    assert r2.keep is (exp1 >= 0)
    assert r2.prob == round(1.0 / (1.0 + math.exp(-exp1 / 300.0)), 6)
    r3 = rows[3]
    assert r3.weight_sum is None and r3.keep is None and r3.prob is None


# ---------------------------------------------------------------------- #
# ann_range_search


def test_range_search_inclusive_boundary(spark):
    from e_commerce_click_stream_spark.plans.similarity import RANGE_TAU

    dim = 64

    def vec(*pairs):
        v = [0.0] * dim
        for i, x in pairs:
            v[i] = x
        return v

    rows = [
        (0, vec((0, 1.0)), 0),  # the query
        (20, vec((0, RANGE_TAU), (1, math.sqrt(1 - RANGE_TAU**2))), 0),  # == tau
        (21, vec((0, 1.0)), 0),  # cosine 1.0
        (22, vec((1, 1.0)), 0),  # cosine 0.0 -> out
        (23, vec((0, -1.0)), 0),  # cosine -1 -> out
        (24, vec((0, 0.2), (1, math.sqrt(1 - 0.04))), 0),  # 0.2 -> out
        (25, [0.0] * dim, 0),  # zero vector -> gated out
        (26, None, 0),  # NULL -> gated out
        (27, [1.0] * 10, 0),  # wrong dim -> gated out
    ]
    out = tempfile.mkdtemp(prefix="r9b_vec_")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    res = SPECS["ann_range_search"].builder(spark, out).collect()
    got = {(r.query_id, r.neighbor_id): r for r in res}
    assert set(got) == {(0, 20), (0, 21)}, "inclusive at tau, exclusive below"
    assert got[(0, 20)].cosine == pytest.approx(RANGE_TAU)
    assert got[(0, 21)].cosine == 1.0
    assert got[(0, 20)].n_in_range == 2 and got[(0, 21)].n_in_range == 2


# ---------------------------------------------------------------------- #
# user_erasure_audit


def test_erasure_audit_cascade_invariants(spark):
    sf = "/root/testdata/sf0.001"
    rows = {r.table_name: r for r in SPECS["user_erasure_audit"].builder(spark, sf).collect()}
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    for r in rows.values():
        assert 0 <= r.rows_affected <= r.total_rows
        assert r.affected_frac == round(r.rows_affected / r.total_rows, 6)
    # the md5 bucket predicate selects a non-degenerate cohort (~10%)
    c = rows["customer"]
    assert 0 < c.rows_affected < c.total_rows
    # cascade consistency against a direct recomputation
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    direct = con.execute(
        """
        SELECT count(*) FROM lineitem WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_custkey IN (
                SELECT c_custkey FROM customer
                WHERE ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) % 10 = 3))
        """
    ).fetchone()[0]
    con.close()
    assert rows["lineitem"].rows_affected == direct


# ---------------------------------------------------------------------- #
# user_event_sequences


def test_event_sequences_ordering_and_cap(spark):
    import tempfile as _tmp
    from e_commerce_click_stream_spark.plans.behavior import SEQ_MAX

    base = None  # events-only corpus
    out = _tmp.mkdtemp(prefix="r9b_seq_")
    rows = []
    # user 1: 40 events, ts ascending -> capped at SEQ_MAX
    for i in range(40):
        rows.append((i, f"2024-01-01 00:00:{i:02d}", 1, f"e{i}", None, None))
    # user 2: a ts tie broken by event_id, a NULL event_type token
    rows += [
        (100, "2024-01-01 00:00:00", 2, "b", None, None),
        (101, "2024-01-01 00:00:00", 2, None, None, None),
        (99, "2024-01-01 00:00:00", 2, "a", None, None),
    ]
    # user 3: NULL ts -> excluded entirely
    rows.append((200, None, 3, "x", None, None))
    import os as _os

    spark.createDataFrame(
        [(i, ts, u, et, v, p) for i, ts, u, et, v, p in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.mode("overwrite").parquet(_os.path.join(out, "events.parquet"))

    res = {r.user_id: r for r in SPECS["user_event_sequences"].builder(spark, out).collect()}
    assert set(res) == {1, 2}, "NULL-ts-only user is excluded"
    r1 = res[1]
    assert (r1.n_events, r1.seq_len) == (40, SEQ_MAX)
    assert r1.sequence == ">".join(f"e{i}" for i in range(SEQ_MAX))
    r2 = res[2]
    # tie on ts resolved by event_id: 99(a) < 100(b) < 101(null token)
    assert r2.sequence == "a>b>null"
    assert r2.n_events == 3 and r2.seq_len == 3


# ---------------------------------------------------------------------- #
# ann_ivf_range_search


def test_ivf_range_is_subset_of_exact_range(spark):
    """Every IVF-range hit must appear in the exact range result with the
    SAME cosine (the index may miss neighbors in unprobed cells — lower
    recall — but can never invent or re-score one)."""
    sf = "/root/testdata/sf0.001"
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in SPECS["ann_range_search"].builder(spark, sf).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in SPECS["ann_ivf_range_search"].builder(spark, sf).collect()
    }
    assert ivf, "probed cells produce a non-degenerate result"
    assert set(ivf) <= set(exact)
    assert all(exact[k] == v for k, v in ivf.items())
