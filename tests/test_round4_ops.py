"""Invariant tests for the round-4 operators, independent of the DuckDB
oracles (which could share a bug with the Spark side): mathematical
bounds, subset relations between operators, and a pandas recomputation
of the EWMA."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from e_commerce_click_stream_spark.io import table
from e_commerce_click_stream_spark.plans.registry import all_specs
from tests.conftest import SF_SMOKE

SPECS = all_specs()


@pytest.fixture(scope="module")
def ewma_rows(spark):
    return SPECS["user_value_ewma"].builder(spark, SF_SMOKE).collect()


def test_ewma_bounded_by_user_value_range(spark, ewma_rows):
    """A (positively-)weighted average never leaves [min, max] of its
    inputs."""
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert ewma_rows
    for r in ewma_rows:
        lo, hi = bounds[r.user_id]
        assert lo - 1e-6 <= r.ewma_value <= hi + 1e-6, r


def test_ewma_matches_pandas_recomputation(spark, ewma_rows):
    """Recompute the bounded-frame adjust=True EWMA in plain Python over
    each user's last 16 events and compare to the Spark result."""
    from e_commerce_click_stream_spark.plans.behavior import EWMA_ALPHA, EWMA_FRAME

    events = sorted(
        table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    by_user: dict[int, list[float]] = {}
    for r in events:
        by_user.setdefault(r.user_id, []).append(r.value)
    decay = 1 - EWMA_ALPHA
    for r in ewma_rows:
        tail = by_user[r.user_id][-EWMA_FRAME:]
        num = sum(x * decay ** (len(tail) - 1 - i) for i, x in enumerate(tail))
        den = sum(decay**k for k in range(len(tail)))
        assert abs(r.ewma_value - num / den) < 1e-5, r.user_id


def test_containment_score_dominates_jaccard_on_shared_pairs(spark):
    """jaccard = |∩|/|∪| <= |∩|/min = containment. The SCORE relation is
    guaranteed; full pair-set subsetting is NOT (the two operators use
    different candidate caps — prefix-df<=100 vs rare-shingle-df<=20 — so
    either may miss a pair the other finds). Assert the guaranteed part:
    on pairs emitted by both, containment >= jaccard; and containment
    output is internally sane."""
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in SPECS["dedup_ngram_jaccard"].builder(spark, SF_SMOKE).collect()
    }
    cont_rows = SPECS["dedup_containment"].builder(spark, SF_SMOKE).collect()
    assert cont_rows
    for r in cont_rows:
        assert r.doc_a < r.doc_b and 0.9 - 1e-9 <= r.containment <= 1.0 + 1e-9
        assert r.size_a > 0 and r.size_b > 0
        j = jac.get((r.doc_a, r.doc_b))
        if j is not None:
            assert r.containment >= j - 1e-4, (r, j)


def test_simhash_hamming_bounds_and_zero_distance_groups(spark):
    from e_commerce_click_stream_spark.plans.dedup import (
        _SIMHASH_BAND_BITS,
        _SIMHASH_BANDS,
        SIMHASH_BUCKET_CAP,
    )

    rows = SPECS["dedup_simhash_hamming"].builder(spark, SF_SMOKE).collect()
    assert all(0 <= r.hamming <= 3 and r.doc_a < r.doc_b for r in rows)
    zero_pairs = {(r.doc_a, r.doc_b) for r in rows if r.hamming == 0}
    for g in SPECS["dedup_simhash_groups"].builder(spark, SF_SMOKE).collect():
        assert g.n_docs >= 2
    # Distance-0 collision groups must reappear as hamming=0 pairs —
    # UNLESS every band bucket the group occupies is hot (over the
    # documented SIMHASH_BUCKET_CAP drop), so compute band occupancy and
    # assert only for cap-surviving groups.
    sigs = SPECS["dedup_simhash"].builder(spark, SF_SMOKE).collect()
    occ: dict[tuple[int, str], int] = {}
    for r in sigs:
        for b in range(_SIMHASH_BANDS):
            key = (b, r.simhash[b * _SIMHASH_BAND_BITS : (b + 1) * _SIMHASH_BAND_BITS])
            occ[key] = occ.get(key, 0) + 1
    by_sig: dict[str, list[int]] = {}
    for r in sigs:
        by_sig.setdefault(r.simhash, []).append(r.doc_id)
    for sig, ids in by_sig.items():
        if len(ids) < 2:
            continue
        survives = any(
            occ[(b, sig[b * _SIMHASH_BAND_BITS : (b + 1) * _SIMHASH_BAND_BITS])]
            <= SIMHASH_BUCKET_CAP
            for b in range(_SIMHASH_BANDS)
        )
        if not survives:
            continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert (ids[i], ids[j]) in zero_pairs, (ids[i], ids[j])


def test_sq8_error_bounded_by_half_quantization_step(spark):
    """|x - decode(encode(x))| <= (hi-lo)/255/2 per dimension; the global
    max-abs error is bounded by the widest dimension's half-step."""
    rows = SPECS["embedding_sq8_error"].builder(spark, SF_SMOKE).collect()
    ranges = (
        table(spark, SF_SMOKE, "embeddings")
        .select(F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"))
        .groupBy("dim")
        .agg((F.max("x") - F.min("x")).alias("rng"))
        .agg(F.max("rng"))
        .collect()[0][0]
    )
    bound = ranges / 255 / 2 + 1e-6
    assert rows
    for r in rows:
        assert 0 <= r.max_abs_err <= bound, r
        assert 0 <= r.mse <= bound * bound + 1e-9


def test_quality_weighted_sample_decision_is_md5_deterministic(spark):
    """Every kept row must satisfy the md5-uniform < weight predicate when
    recomputed in plain Python — proving the sample is engine-independent."""
    rows = SPECS["quality_weighted_sample"].builder(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        u = int(hashlib.md5(f"qws:{r.doc_id}".encode()).hexdigest()[:8], 16) / 2**32
        assert 0 < r.keep_weight <= 1
        # keep_weight is rounded to 6 decimals; allow that much slack
        assert u < r.keep_weight + 1e-6, (r.doc_id, u, r.keep_weight)


def test_corpus_mix_plan_conservation(spark):
    rows = SPECS["corpus_mix_plan"].builder(spark, SF_SMOKE).collect()
    n_docs_total = table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs_total
    assert sum(r.expected_docs for r in rows) <= n_docs_total
    target = n_docs_total / len(rows)
    for r in rows:
        assert 0 < r.sampling_rate <= 1
        if r.n_docs <= target:
            assert r.sampling_rate == 1.0 and r.expected_docs == r.n_docs


def test_segment_enrichment_conserves_event_count(spark):
    rows = SPECS["streaming_segment_enrichment"].builder(spark, SF_SMOKE).collect()
    assert sum(r.total_events for r in rows) == table(spark, SF_SMOKE, "events").count()
