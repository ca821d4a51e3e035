"""Invariant tests for the round-5 operators, independent of the DuckDB
oracles (which could share a bug with the Spark side): pure-Python
recomputations of the passage rewrite and hashed TF vectors, Bloom
subtraction vs a plain anti-join, and merge-equals-recompute for the
incremental view."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from e_commerce_click_stream_spark.io import table
from e_commerce_click_stream_spark.plans.registry import all_specs
from e_commerce_click_stream_spark.plans.text import HASH_DIM, PASSAGE_TOKENS
from tests.conftest import SF_SMOKE

SPECS = all_specs()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_passage_dedup_matches_python_recomputation(spark):
    """Recompute the chunk split / global-count removal / reassembly in
    plain Python for every document and compare all output columns."""
    docs = {
        r.doc_id: r.text.strip().split()
        for r in table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    chunks: dict[int, list[str]] = {
        d: [
            " ".join(t[i * PASSAGE_TOKENS : (i + 1) * PASSAGE_TOKENS])
            for i in range(math.ceil(len(t) / PASSAGE_TOKENS))
        ]
        for d, t in docs.items()
    }
    counts: dict[str, int] = {}
    for cs in chunks.values():
        for c in cs:
            counts[c] = counts.get(c, 0) + 1
    out = SPECS["doc_passage_dedup"].builder(spark, SF_SMOKE).collect()
    assert {r.doc_id for r in out} == set(docs)
    for r in out:
        cs = chunks[r.doc_id]
        kept = [c for c in cs if counts[c] == 1]
        cleaned = " ".join(kept)
        assert r.n_passages == len(cs)
        assert r.removed_passages == len(cs) - len(kept)
        assert r.kept_chars == len(cleaned)
        assert r.cleaned_fp == _md5(cleaned)


def test_bloom_antijoin_equals_plain_antijoin(spark):
    """The Bloom prefilter must be output-invisible: union(certain,
    verified) == the plain left_anti join, computed entirely in Spark."""
    li = table(spark, SF_SMOKE, "lineitem")
    flagged = table(spark, SF_SMOKE, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    exact = (
        li.join(flagged, li.l_orderkey == flagged.o_orderkey, "left_anti")
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("clean_revenue"),
        )
    )
    got = {
        r.l_linestatus: (r.n_items, r.clean_revenue)
        for r in SPECS["bloom_prefiltered_antijoin"].builder(spark, SF_SMOKE).collect()
    }
    want = {r.l_linestatus: (r.n_items, r.clean_revenue) for r in exact.collect()}
    assert got == want
    # and the subtraction did remove something
    total = li.count()
    assert sum(n for n, _ in got.values()) < total


def test_embedding_dim_stats_bounds(spark):
    rows = SPECS["embedding_dim_stats"].builder(spark, SF_SMOKE).collect()
    n = table(spark, SF_SMOKE, "embeddings").count()
    dim = len(
        table(spark, SF_SMOKE, "embeddings").select("embedding").first().embedding
    )
    assert len(rows) == dim
    assert sorted(r.dim for r in rows) == list(range(dim))
    for r in rows:
        assert r.n_vecs == n
        assert r.vmin <= r.mean <= r.vmax
        assert r.stddev >= 0
        # vmin/vmax are rounded(6) independently of value_range, so the
        # recomputed difference can drift a full ulp-of-rounding
        assert abs(r.value_range - round(r.vmax - r.vmin, 6)) <= 2e-6


def test_incremental_equals_full_recompute(spark):
    """The merged state∪batch view must be row-identical to the one-pass
    hourly_metrics — the definition of correct incremental maintenance."""
    full = {
        r.hour_timestamp: r.asDict()
        for r in SPECS["hourly_metrics"].builder(spark, SF_SMOKE).collect()
    }
    inc = {
        r.hour_timestamp: r.asDict()
        for r in SPECS["hourly_metrics_incremental"].builder(spark, SF_SMOKE).collect()
    }
    assert full.keys() == inc.keys()
    for k, f in full.items():
        i = inc[k]
        for col, v in f.items():
            if isinstance(v, float):
                assert abs(v - i[col]) < 1e-6, (k, col)
            else:
                assert v == i[col], (k, col)


def test_hashed_tf_matches_python_recomputation(spark):
    docs = {
        r.doc_id: r.text.strip().split()
        for r in table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }

    def bucket(tok: str) -> int:
        h = _md5(tok)
        return (ord(h[0]) * 101 + ord(h[1])) % HASH_DIM

    out = SPECS["doc_hashed_tf_vectors"].builder(spark, SF_SMOKE).collect()
    assert {r.doc_id for r in out} == set(docs)
    for r in out:
        toks = docs[r.doc_id]
        tf = [0] * HASH_DIM
        for t in toks:
            tf[bucket(t)] += 1
        assert r.n_tokens == len(toks)
        # tf ships as a comma-joined string (registry contract: no raw
        # arrays in output schemas — the driver's hasher can't hash lists)
        got_tf = [int(c) for c in r.tf.split(",")]
        assert got_tf == tf
        assert r.nnz == sum(1 for c in tf if c > 0)
        assert sum(got_tf) == r.n_tokens
        assert abs(r.l2_norm - round(math.sqrt(sum(c * c for c in tf)), 6)) <= 1e-9


def test_salted_join_equals_unsalted(spark):
    """Salting redistributes rows, never changes the matches: the salted
    compound-key join must agg to the same result as the plain join."""
    li = table(spark, SF_SMOKE, "lineitem")
    orders = table(spark, SF_SMOKE, "orders")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )
    want = {r.o_orderpriority: (r.n_items, r.revenue) for r in plain.collect()}
    got = {
        r.o_orderpriority: (r.n_items, r.revenue)
        for r in SPECS["skew_salted_fact_join"].builder(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_bpe_pairs_match_python_recomputation(spark):
    """Recompute the weighted adjacent-pair counts in plain Python and
    compare the full ranked top list."""
    words: dict[str, int] = {}
    for r in table(spark, SF_SMOKE, "documents").select("text").collect():
        for w in r.text.strip().lower().split():
            if len(w) >= 2:
                words[w] = words.get(w, 0) + 1
    pairs: dict[tuple[str, str], int] = {}
    for w, wc in words.items():
        for i in range(len(w) - 1):
            k = (w[i], w[i + 1])
            pairs[k] = pairs.get(k, 0) + wc
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    out = sorted(
        SPECS["bpe_merge_pairs"].builder(spark, SF_SMOKE).collect(),
        key=lambda r: r.merge_rank,
    )
    assert len(out) == min(20, len(ranked))
    for r, ((a, b), c) in zip(out, ranked):
        assert (r.left_sym, r.right_sym, r.pair_count) == (a, b, c)
        assert r.merged == a + b


def test_histogram_partitions_all_orders(spark):
    rows = SPECS["order_value_histogram"].builder(spark, SF_SMOKE).collect()
    n_orders = table(spark, SF_SMOKE, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert abs(sum(r.pct for r in rows) - 1.0) < 1e-4
    last = max(rows, key=lambda r: r.bin)
    assert abs(last.cum_pct - 1.0) < 1e-6
    for r in rows:
        assert r.bin_hi - r.bin_lo == 25_000.0
        assert r.n_orders > 0


def test_covariance_matches_numpy(spark):
    """Population covariance/correlation recomputed with numpy over the
    full (small) fixture."""
    import numpy as np

    vecs = sorted(
        table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    X = np.array([r.embedding for r in vecs], dtype=np.float64)
    n, d = X.shape
    cov = np.cov(X, rowvar=False, bias=True)
    sd = X.std(axis=0)
    out = SPECS["embedding_covariance"].builder(spark, SF_SMOKE).collect()
    assert len(out) == d * (d + 1) // 2
    for r in out:
        assert r.di <= r.dj and r.n_vecs == n
        assert abs(r.cov - cov[r.di, r.dj]) < 5e-7, (r.di, r.dj)
        assert abs(r.corr - cov[r.di, r.dj] / (sd[r.di] * sd[r.dj])) < 5e-5
    diag = [r for r in out if r.di == r.dj]
    for r in diag:
        assert abs(r.corr - 1.0) < 1e-6


def test_session_paths_share_and_rank(spark):
    rows = SPECS["session_event_paths"].builder(spark, SF_SMOKE).collect()
    assert rows
    ranks = sorted(r.path_rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    by_rank = sorted(rows, key=lambda r: r.path_rank)
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a.n_sessions, b.path) >= (b.n_sessions, a.path)  # count desc
        assert a.n_sessions >= b.n_sessions
    # share denominator is ALL sessions, not just the top-k
    n_sessions = (
        SPECS["session_metrics"].builder(spark, SF_SMOKE).count()
    )
    for r in rows:
        assert abs(r.share - round(r.n_sessions / n_sessions, 6)) <= 1e-6


def test_length_filter_bounds_and_partition(spark):
    """Bounds recomputed in Python (same cumulative rule); per-source
    kept/short/long must partition each source's docs."""
    import re

    # re.split matches the engines' regex-split semantics: '' -> [''] (one
    # token), unlike str.split() which returns [] for empty text
    lens = [
        len(re.split(r"\s+", r.text.strip()))
        for r in table(spark, SF_SMOKE, "documents").select("text").collect()
    ]
    total = len(lens)
    hist: dict[int, int] = {}
    for n in lens:
        hist[n] = hist.get(n, 0) + 1
    cum = 0
    lo = hi = None
    for n in sorted(hist):
        cum += hist[n]
        if lo is None and cum >= 0.05 * total:
            lo = n
        if hi is None and cum >= 0.95 * total:
            hi = n
    rows = SPECS["doc_length_percentile_filter"].builder(spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert (r.p05_tokens, r.p95_tokens) == (lo, hi)
        assert r.kept + r.too_short + r.too_long == r.n_docs
    dropped = sum(r.too_short + r.too_long for r in rows)
    assert dropped / total <= 0.1 + 1e-9  # at most ~10% outside [p5, p95]


def test_semantic_dedup_python_recomputation(spark):
    """Recompute cell assignment + within-cell dup pairs with numpy and
    compare every per-cell statistic."""
    import numpy as np

    from e_commerce_click_stream_spark.plans.similarity import (
        N_CENTROIDS,
        SEMDEDUP_COSINE,
    )

    rows = sorted(
        table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    nrm = np.linalg.norm(X, axis=1)
    C, cn = X[:N_CENTROIDS], nrm[:N_CENTROIDS]
    sims = np.round((X @ C.T) / np.outer(nrm, cn), 6) - np.arange(N_CENTROIDS) * 1e-12
    cell = sims.argmax(axis=1)
    want: dict[int, dict] = {
        c: {"n_vectors": 0, "pairs": 0, "removed": set()} for c in set(cell)
    }
    for c in cell:
        want[c]["n_vectors"] += 1
    for c in want:
        members = np.where(cell == c)[0]
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                a, b = members[ai], members[bi]
                cos = round(float(X[a] @ X[b] / (nrm[a] * nrm[b])), 6)
                if cos >= SEMDEDUP_COSINE:
                    want[c]["pairs"] += 1
                    want[c]["removed"].add(int(ids[b]))
    out = SPECS["dedup_semantic_cells"].builder(spark, SF_SMOKE).collect()
    assert {r.cell for r in out} == set(want)
    for r in out:
        w = want[r.cell]
        assert r.n_vectors == w["n_vectors"]
        assert r.n_dup_pairs == w["pairs"], r.cell
        assert r.n_removed == len(w["removed"])
        assert r.n_kept == r.n_vectors - r.n_removed


def test_pca_power_matches_numpy_recurrence(spark):
    """Replicate the EXACT recurrence in numpy — same rounded covariance
    matrix, same per-round normalize+round — and compare per component.
    (The fixture embeddings are near-isotropic, so 8 rounds do NOT
    converge to the true eigenvector; the contract is the recurrence,
    plus Rayleigh bounds against the true spectrum.)"""
    import numpy as np

    from e_commerce_click_stream_spark.plans.similarity import PCA_ITERS, _PCA_V0

    rows = sorted(
        table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    d = X.shape[1]
    C = np.round(np.cov(X, rowvar=False, bias=True), 8)  # the rounded matrix
    v = np.full(d, _PCA_V0)
    for _ in range(PCA_ITERS):
        w = C @ v
        v = np.round(w / np.linalg.norm(w), 8)
    out = sorted(
        SPECS["embedding_pca_power"].builder(spark, SF_SMOKE).collect(),
        key=lambda r: r.dim,
    )
    assert len(out) == d
    got = np.array([r.loading for r in out])
    assert np.max(np.abs(got - v)) <= 5e-7, np.max(np.abs(got - v))
    ray = out[0].eigenvalue
    assert all(r.eigenvalue == ray for r in out)
    evals = np.linalg.eigvalsh(C)
    # Rayleigh quotient of any unit vector lies inside the spectrum, and
    # power iteration can only have moved it UP from the start vector
    r0 = float(np.full(d, _PCA_V0) @ C @ np.full(d, _PCA_V0))
    assert r0 - 1e-6 <= ray <= evals[-1] + 1e-6
