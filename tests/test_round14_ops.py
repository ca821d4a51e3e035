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
