"""Invariant tests for the late-round-5 operators, independent of the
DuckDB oracles (which could share a bug with the Spark side): pure-Python
recomputations of the RAG chunker, shard manifest, and bigram LM, plus
structural invariants for the SCD2 collapse and the incremental dedup's
consistency with the full-corpus LSH pass."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from e_commerce_click_stream_spark.io import table
from e_commerce_click_stream_spark.plans.dedup import (
    JACCARD_THRESHOLD,
    NEW_SRC_MIN,
)
from e_commerce_click_stream_spark.plans.governance import KMV_K, N_TRAIN_SHARDS
from e_commerce_click_stream_spark.plans.registry import all_specs
from e_commerce_click_stream_spark.plans.text import (
    BIGRAM_LAMBDA,
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    RESERVOIR_K,
)
from tests.conftest import SF_SMOKE

SPECS = all_specs()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_rag_chunks_match_python_recomputation(spark):
    docs = {
        r.doc_id: r.text.strip().split()
        for r in table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    out = SPECS["doc_rag_chunks"].builder(spark, SF_SMOKE).collect()
    got = {(r.doc_id, r.chunk_id): r for r in out}
    expected = {}
    for d, t in docs.items():
        if not t:
            continue
        for k, start in enumerate(range(0, len(t), CHUNK_STRIDE)):
            chunk = t[start : start + CHUNK_TOKENS]
            expected[(d, k)] = (start + 1, len(chunk), _md5(" ".join(chunk)))
    assert set(got) == set(expected)
    for key, (start_tok, n_tokens, fp) in expected.items():
        r = got[key]
        assert (r.start_tok, r.n_tokens, r.chunk_fp) == (start_tok, n_tokens, fp)


def test_shard_manifest_matches_python_recomputation(spark):
    rows = (
        table(spark, SF_SMOKE, "documents")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    n_docs = defaultdict(int)
    chars = defaultdict(int)
    checksum = defaultdict(int)
    sources = defaultdict(set)
    for r in rows:
        h = _md5(f"shard:{r.doc_id}")
        s = int(h[:8], 16) % N_TRAIN_SHARDS
        n_docs[s] += 1
        chars[s] += r.n_chars
        checksum[s] += int(h[8:16], 16)
        sources[s].add(r.source)
    out = {r.shard: r for r in SPECS["training_shard_manifest"].builder(spark, SF_SMOKE).collect()}
    assert set(out) == set(n_docs)
    for s, r in out.items():
        assert r.n_docs == n_docs[s]
        assert r.total_chars == chars[s]
        assert r.order_checksum == checksum[s]
        assert r.n_sources == len(sources[s])
    # uniform md5 sharding: no shard more than 3x the mean (binomial
    # tails at n=500/16 make this astronomically safe if the hash is uniform)
    mean = len(rows) / N_TRAIN_SHARDS
    assert max(n_docs.values()) < 3 * mean


def test_bigram_nll_matches_python_recomputation(spark):
    docs = {
        r.doc_id: r.text.strip().split()
        for r in table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    uni = defaultdict(int)
    big = defaultdict(int)
    marg = defaultdict(int)
    for t in docs.values():
        for w in t:
            uni[w] += 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] += 1
            marg[a] += 1
    n_tok = sum(uni.values())
    out = {r.doc_id: r for r in SPECS["doc_bigram_nll"].builder(spark, SF_SMOKE).collect()}
    assert set(out) == {d for d, t in docs.items() if len(t) >= 2}
    for d, t in docs.items():
        if len(t) < 2:
            continue
        nlls = [
            -math.log(
                BIGRAM_LAMBDA * big[(a, b)] / marg[a]
                + (1 - BIGRAM_LAMBDA) * uni[b] / n_tok
            )
            for a, b in zip(t, t[1:])
        ]
        r = out[d]
        assert r.n_bigrams == len(nlls)
        # mean_nll rounds to 4 decimals (summation-order contract), so the
        # recomputed mean can sit up to half an ulp-of-rounding away
        assert abs(r.mean_nll - sum(nlls) / len(nlls)) < 5.1e-5
        assert abs(r.max_bigram_nll - max(nlls)) < 1e-5


def test_scd2_history_invariants(spark):
    out = SPECS["customer_scd2_history"].builder(spark, SF_SMOKE).collect()
    by_cust = defaultdict(list)
    for r in out:
        by_cust[r.custkey].append(r)
    n_orders_custs = {
        r.o_custkey
        for r in table(spark, SF_SMOKE, "orders").select("o_custkey").distinct().collect()
    }
    assert set(by_cust) == n_orders_custs
    for rows in by_cust.values():
        rows.sort(key=lambda r: r.version)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        # exactly the last version is open-ended; ranges chain exactly
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from
            assert a.priority != b.priority
            assert a.valid_from <= a.valid_to
        assert rows[-1].valid_to is None
        assert all(r.valid_to is not None for r in rows[:-1])


def test_kmv_sketch_matches_python_recomputation(spark):
    rows = (
        table(spark, SF_SMOKE, "events")
        .select("event_type", "user_id")
        .distinct()
        .collect()
    )
    by_type = defaultdict(set)
    for r in rows:
        by_type[r.event_type].add(r.user_id)
    out = {r.event_type: r for r in SPECS["events_kmv_distinct"].builder(spark, SF_SMOKE).collect()}
    assert set(out) == set(by_type)
    for et, users in by_type.items():
        fracs = sorted(int(_md5(f"kmv:{u}")[:15], 16) / 2**60 for u in users)
        exact = len(users)
        est = exact if exact < KMV_K else math.floor((KMV_K - 1) / fracs[KMV_K - 1] + 0.5)
        r = out[et]
        assert r.exact_distinct == exact
        assert r.kmv_estimate == est
        assert abs(r.rel_error - round(abs(est - exact) / exact, 4)) < 1e-9
        # k=64 KMV has relative standard error ~1/sqrt(k-2) ≈ 12.7%;
        # 4x that is a astronomically-safe determinism check, not a tuning bound
        assert r.rel_error < 0.5


def test_weighted_reservoir_matches_python_recomputation(spark):
    rows = (
        table(spark, SF_SMOKE, "documents").select("doc_id", "source", "text").collect()
    )
    by_source = defaultdict(list)
    for r in rows:
        t = r.text.strip().split()
        if not t:
            continue
        w = len(set(t)) / len(t)
        u = int(_md5(f"wrs:{r.doc_id}")[:15], 16) / 2**60
        by_source[r.source].append((round(-math.log(u) / w, 9), r.doc_id, w))
    out = defaultdict(list)
    for r in SPECS["weighted_reservoir_sample"].builder(spark, SF_SMOKE).collect():
        out[r.source].append(r)
    assert set(out) == set(by_source)
    for src, cands in by_source.items():
        cands.sort()
        expected = cands[:RESERVOIR_K]
        got = sorted(out[src], key=lambda r: r.rank)
        assert [r.doc_id for r in got] == [c[1] for c in expected]
        for r, (clock, _, w) in zip(got, expected):
            assert abs(r.clock - clock) < 1e-8
            assert abs(r.weight - round(w, 6)) < 1e-9


def test_incremental_dedup_consistent_with_full_lsh(spark):
    out = SPECS["dedup_incremental_minhash"].builder(spark, SF_SMOKE).collect()
    new_ids = {
        r.doc_id
        for r in table(spark, SF_SMOKE, "documents")
        .filter(F.substring("source", 4, 8).cast("int") >= NEW_SRC_MIN)
        .select("doc_id")
        .collect()
    }
    assert {r.doc_id for r in out} == new_ids  # exactly one verdict per new doc
    by_id = {r.doc_id: r for r in out}
    for r in out:
        if r.verdict == "novel":
            assert r.match_doc_id is None and r.jaccard is None
        else:
            assert r.jaccard >= JACCARD_THRESHOLD
            if r.verdict == "dup_in_batch":
                assert r.match_doc_id in new_ids and r.match_doc_id < r.doc_id
            else:
                assert r.match_doc_id not in new_ids
    # the full-corpus LSH pass uses the identical banding, so any of its
    # verified pairs that lands inside the batch (later doc is new, and the
    # partner is either indexed or an earlier batch doc) forbids 'novel'
    pairs = SPECS["dedup_minhash_lsh"].builder(spark, SF_SMOKE).collect()
    for p in pairs:
        lo, hi = sorted((p.doc_a, p.doc_b))
        if hi in new_ids:
            assert by_id[hi].verdict != "novel"


def test_ab_readout_matches_python_recomputation(spark):
    from e_commerce_click_stream_spark.plans.behavior import AB_VALUE_MIN

    rows = (
        table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", "value")
        .collect()
    )
    conv = defaultdict(int)
    for r in rows:
        if r.event_type == "purchase" and r.value >= AB_VALUE_MIN:
            conv[r.user_id] = 1
        else:
            conv.setdefault(r.user_id, 0)
    arms = {0: [0, 0], 1: [0, 0]}  # variant -> [n, converted]
    for u, c in conv.items():
        v = int(_md5(f"ab:{u}")[:8], 16) % 2
        arms[v][0] += 1
        arms[v][1] += c
    (n_a, c_a), (n_b, c_b) = arms[0], arms[1]
    [r] = SPECS["ab_test_readout"].builder(spark, SF_SMOKE).collect()
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (n_a, n_b, c_a, c_b)
    assert abs(r.rate_a - round(c_a / n_a, 6)) < 1e-9
    assert abs(r.rate_b - round(c_b / n_b, 6)) < 1e-9
    pooled = (c_a + c_b) / (n_a + n_b)
    if 0 < pooled < 1:
        z = (c_b / n_b - c_a / n_a) / math.sqrt(
            pooled * (1 - pooled) * (1 / n_a + 1 / n_b)
        )
        assert abs(r.z_score - round(z, 4)) < 1e-9
    else:
        assert r.z_score is None


def test_triangle_count_matches_python_recomputation(spark):
    from itertools import combinations

    rows = (
        table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey").collect()
    )
    orders = defaultdict(set)
    for r in rows:
        orders[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in orders.values():
        for u, v in combinations(sorted(parts), 2):
            edges.add((u, v))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    triangles = 0
    for u, v in edges:
        triangles += len(adj[u] & adj[v])
    triangles //= 3  # each triangle counted once per edge
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    [r] = SPECS["graph_triangle_count"].builder(spark, SF_SMOKE).collect()
    assert r.n_nodes == len(adj)
    assert r.n_edges == len(edges)
    assert r.n_wedges == wedges
    assert r.n_triangles == triangles
    if wedges:
        assert abs(r.transitivity - round(3 * triangles / wedges, 6)) < 1e-9
