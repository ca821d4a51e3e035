"""Round-14 pins: the money-sum BIGINT overflow tripwire (VERDICT r13
#4). q1/q5/brand_revenue sum exact BIGINT money terms (cents-scaled
products up to charge_e6 = cents x (100-d) x (100+t)); Spark long
arithmetic WRAPS silently where DuckDB's HUGEINT would not, so the
exactness promotion rests on every group's accumulated sum staying
inside int64. The width argument lived only in comments — these tests
make fixture growth trip an alarm BEFORE wrap (the DSIR 2^62 pattern,
tests/test_round11_ops.py::test_dsir_bigint_headroom)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from e_commerce_click_stream_spark.io import table
from e_commerce_click_stream_spark.plans.relational import money_terms

# alarm at HALF the int64 range: growth trips a round before wrap
ALARM = float(2**62)


def _worst_money_accumulation(li) -> float:
    """The worst total |charge_e6| magnitude any money sum in
    q1/q5/brand can accumulate over this relation: ONE ungrouped sum of
    the largest term bounds every group of every money query (each
    groups a SUBSET of these rows, and |disc_price_e4| <= |charge_e6|
    <= this total whenever rows don't cancel — money terms are
    non-negative on every real fixture). Accumulated in DOUBLE so the
    tripwire itself cannot wrap while measuring an over-limit fixture;
    at the 2^62 alarm the double's 2^53 mantissa slack is noise."""
    charge = money_terms()["charge_e6"]
    row = li.agg(F.sum(F.abs(charge).cast("double")).alias("s")).collect()[0]
    return row["s"] or 0.0


@pytest.mark.parametrize("sf_dir", [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
])
def test_money_sum_bigint_headroom(spark, sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    worst = _worst_money_accumulation(table(spark, sf_dir, "lineitem"))
    assert 0 < worst < ALARM, (
        f"money accumulation at {worst:.3e} exceeds the 2^62 alarm "
        "(int64 wrap at 9.2e18) — promote the q1/q5/brand_revenue sums "
        "to DECIMAL(38) per the plans/relational.py width notes"
    )


def test_money_sum_tripwire_trips_on_overlimit_fixture(spark):
    """The tripwire must go RED on a constructed over-limit lineitem —
    proof the guard measures the real accumulation, not a vacuous
    pass. Per-row charge must stay inside int64 (the product itself is
    long math) while the TOTAL crosses the alarm: 16 rows at price 4e11
    give charge_e6 = 4.4e17 each (< 2^63), total 7e18 > 2^62 ~ 4.6e18."""
    li = spark.range(16).select(
        F.lit(4.0e11).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"),
        F.lit(0.10).alias("l_tax"),
        F.lit(1.0).alias("l_quantity"),
    )
    assert _worst_money_accumulation(li) >= ALARM


# ---------------------------------------------------------------------------
# Size-derived sign-LSH band geometry (VERDICT r13 #3)


def test_band_bits_derivation_rule():
    """The integer growth rule at its boundaries: the committed fixtures
    (500-2000 vectors) keep the historical 8 bits, the rule widens at
    exactly 2^b * LSH_TARGET_OCCUPANCY + 1, the x10-probe size derives
    12, and past-MAX corpora clamp at BAND_BITS_MAX (raised 16 -> 27 in
    r15 with the Rademacher-projection plane source; the corpus-plane
    clamp at 16 is now BAND_BITS_CORPUS_PLANES_MAX, straddled in
    tests/test_round15_ops.py)."""
    from e_commerce_click_stream_spark.plans.similarity import (
        BAND_BITS_CORPUS_PLANES_MAX,
        BAND_BITS_MAX,
        _band_bits,
    )

    assert _band_bits(500) == 8
    assert _band_bits(2000) == 8
    assert _band_bits(2048) == 8  # 2^8 * 8 = 2048 still fits
    assert _band_bits(2049) == 9  # first count past the boundary widens
    assert _band_bits(20_000) == 12
    # the corpus-plane clamp boundary: last corpus-plane size / first
    # projection size
    assert _band_bits(524_288) == BAND_BITS_CORPUS_PLANES_MAX == 16
    assert _band_bits(524_289) == 17
    assert _band_bits(10**9) == BAND_BITS_MAX == 27


def _synth_embeddings(tmpdir: str, n: int) -> None:
    """Deterministic synthetic embeddings fixture (same schema as the
    driver's: vec_id BIGINT, embedding FLOAT[], label INTEGER)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((n, 64)).astype("float32")
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array([i % 7 for i in range(n)], pa.int32()),
    })
    pq.write_table(tbl, os.path.join(tmpdir, "embeddings.parquet"))


@pytest.mark.parametrize("n,expected_bb", [(600, 8), (2100, 9)])
def test_lsh_geometry_identical_in_builder_and_oracle(spark, tmp_path, n, expected_bb):
    """The pin the derivation exists for: at two synthetic corpus sizes
    STRADDLING a band_bits boundary, the Spark builder and the DuckDB
    oracle derive the same geometry and produce identical band rows —
    a fixture regeneration can move the geometry but never desync the
    two engines."""
    import duckdb

    from e_commerce_click_stream_spark.plans.registry import all_specs

    d = str(tmp_path / f"n{n}")
    os.makedirs(d)
    _synth_embeddings(d, n)

    spec = all_specs()["ann_lsh_buckets"]
    rows = spec.builder(spark, d).collect()
    # the derived geometry actually moved with the size
    assert all(len(r["band_sig"]) == expected_bb for r in rows)
    assert {r["band_id"] for r in rows} == set(range(4))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    oracle = con.execute(spec.oracle).fetchall()
    con.close()
    s_rows = sorted(
        (r["vec_id"], r["bucket_signature"], r["band_id"], r["band_sig"])
        for r in rows
    )
    assert s_rows == sorted(tuple(r) for r in oracle)
