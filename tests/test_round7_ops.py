"""Invariant tests for the round-7 operators (sketch family, JL
projection, z-order audit, hard negatives).

Oracle parity is covered by the driver gate and the edge matrices; these
pin the guarantees the operators' docstrings claim — the properties a
user relies on even when the estimate is approximate."""

from __future__ import annotations

from collections import defaultdict

from e_commerce_click_stream_spark.plans.governance import CMS_TOP, QSK_BIN_CENTS, QSK_QUANTILES
from e_commerce_click_stream_spark.plans.registry import all_specs
from tests.conftest import SF_CORRECT

SPECS = all_specs()


def test_countmin_never_underestimates(spark):
    rows = SPECS["events_countmin_heavy_hitters"].builder(spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= CMS_TOP
    for r in rows:
        assert r.cms_estimate >= r.exact_n, r
        assert r.overcount == r.cms_estimate - r.exact_n
        assert r.overcount >= 0


def test_quantile_sketch_within_one_bin(spark):
    rows = SPECS["lineitem_price_quantile_sketch"].builder(spark, SF_CORRECT).collect()
    assert sorted(r.quantile for r in rows) == sorted(QSK_QUANTILES)
    bin_dollars = QSK_BIN_CENTS / 100.0
    for r in rows:
        # linear interpolation lands inside the crossing bin, so the
        # estimate can't be more than one bin width from the exact value
        assert abs(r.est_price - r.exact_price) <= bin_dollars, r
        assert r.rel_error >= 0


def test_jl_distortion_is_bounded(spark):
    rows = SPECS["embedding_jl_projection"].builder(spark, SF_CORRECT).collect()
    ds = [r.distortion for r in rows if r.distortion is not None]
    assert ds, "no comparable pairs"
    # m=16: per-pair distortion std ≈ 1/sqrt(2m) ≈ 0.18 — these bounds are
    # many sigmas wide and would only break on an implementation bug
    assert all(0.3 <= d <= 3.0 for d in ds)
    mean = sum(ds) / len(ds)
    assert 0.75 <= mean <= 1.3, mean


def test_hard_negatives_contract(spark):
    rows = SPECS["ann_hard_negatives"].builder(spark, SF_CORRECT).collect()
    per_q = defaultdict(list)
    for r in rows:
        assert r.neg_label != r.query_label, r
        per_q[r.query_id].append(r)
    for q, rs in per_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        cosines = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)
        for r in rs:
            if r.pos_best_cosine is not None:
                assert r.is_semi_hard == (r.cosine < r.pos_best_cosine)
            else:
                assert r.is_semi_hard is None


def test_kmv_overlap_sanity(spark):
    rows = SPECS["kmv_audience_overlap"].builder(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.jaccard_est <= 1.0
        assert r.exact_union >= r.exact_intersection >= 0
        assert r.intersection_est >= 0
        # k=64 KMV: relative error ~1/sqrt(k-1) ≈ 13%; 50% is ~4 sigma
        assert abs(r.union_est - r.exact_union) <= 0.5 * r.exact_union, r


def test_zorder_tightens_the_interleaved_dimension(spark):
    # sf0.01: ~20 files per layout — sf0.001 has only 2 files and the
    # envelopes tie by chance
    rows = SPECS["events_zorder_stats"].builder(spark, SF_CORRECT).collect()
    spans = defaultdict(list)
    totals = defaultdict(int)
    for r in rows:
        spans[r.layout].append(r.u_span)
        totals[r.layout] += r.n_rows
    # same rows, different layout
    assert totals["zorder"] == totals["linear"] > 0
    mean = {k: sum(v) / len(v) for k, v in spans.items()}
    # the whole point of z-ordering: user-dimension envelopes shrink vs a
    # time-sorted layout (sf0.01 measures 52 vs 150)
    assert mean["zorder"] < mean["linear"]


def test_streaming_kmv_equals_batch_sketch(spark):
    """The foreachBatch-merged store must equal the one-pass batch sketch
    — KMV closure under union, exercised across 4 real micro-batches."""
    stream_rows = {
        r.event_type: (r.n_in_sketch, r.kmv_estimate)
        for r in SPECS["streaming_kmv_distinct"].builder(spark, SF_CORRECT).collect()
    }
    batch_rows = {
        r.event_type: r.kmv_estimate
        for r in SPECS["events_kmv_distinct"].builder(spark, SF_CORRECT).collect()
    }
    assert stream_rows.keys() == batch_rows.keys()
    for t, (n, est) in stream_rows.items():
        assert est == batch_rows[t], t
        assert n <= 64


def test_streaming_ewma_null_user_counts_merge_across_batches(spark, tmp_path):
    """NULL-user events scattered over micro-batches must accumulate into
    ONE count row (NULL-safe merge key), matching the batch twin exactly —
    the fixture's single NULL-user row can't exercise this, so build a
    feed where the round-robin chunking necessarily splits them."""
    import datetime as dt

    from e_commerce_click_stream_spark.io import TABLES, table

    base = dt.datetime(2024, 5, 1, 9, 0, 0)
    rows = []
    for i in range(24):
        # 12 NULL-user events interleaved with two real users
        user = None if i % 2 == 0 else (100 if i % 4 == 1 else 200)
        rows.append((i, base + dt.timedelta(minutes=i), user, "click", float(i), None))
    out = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{out}/events.parquet")
    for name in TABLES:
        if name != "events":
            table(spark, "/root/testdata/sf0.001", name).limit(0).write.parquet(
                f"{out}/{name}.parquet"
            )

    got = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in SPECS["streaming_user_ewma"].builder(spark, out).collect()
    }
    want = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in SPECS["user_value_ewma"].builder(spark, out).collect()
    }
    assert got == want
    assert None in want and want[None][0] == 12


def test_morton_code_matches_python_interleave(spark):
    """The z-order expression (pure integer arithmetic, engine-portable)
    must equal bit interleaving recomputed in Python for every (u, h)
    bucket pair in a random-but-deterministic sample."""
    from e_commerce_click_stream_spark.plans.governance import (
        ZORDER_BITS,
        _morton_terms,
    )
    from pyspark.sql import functions as F

    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(256), rng.randrange(256)) for _ in range(200)] + [
        (0, 0), (255, 255), (0, 255), (255, 0), (1, 2)
    ]
    df = spark.createDataFrame(pairs, "u long, h long").withColumn(
        "z", F.expr(_morton_terms("u", "h", "DIV"))
    )

    def interleave(u: int, h: int) -> int:
        z = 0
        for k in range(ZORDER_BITS):
            z |= ((u >> k) & 1) << (2 * k + 1)
            z |= ((h >> k) & 1) << (2 * k)
        return z

    for r in df.collect():
        assert r.z == interleave(r.u, r.h), (r.u, r.h)
