"""Invariant checks for the behavior-analytics queries — properties the
oracle hash comparison can't express (it proves Spark == DuckDB, not
that both are sane)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_click_stream_spark.plans.registry import all_specs
from tests.conftest import SF_SMOKE

SPECS = all_specs()


def test_funnel_steps_are_ordered(spark):
    df = SPECS["funnel_conversion"].builder(spark, SF_SMOKE)
    bad = df.filter(
        (F.col("first_click").isNotNull() & (F.col("first_click") <= F.col("first_view")))
        | (
            F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") <= F.col("first_click"))
        )
    ).count()
    assert bad == 0
    stages = {r["funnel_stage"] for r in df.select("funnel_stage").distinct().collect()}
    assert stages <= {0, 1, 2, 3}


def test_retention_day_zero_is_full_cohort(spark):
    df = SPECS["user_retention_cohorts"].builder(spark, SF_SMOKE)
    day0 = df.filter(F.col("day_offset") == 0)
    assert day0.filter(F.col("retention_rate") != 1.0).count() == 0
    # retention never exceeds 1 and active_users never exceeds the cohort
    assert df.filter(F.col("active_users") > F.col("cohort_users")).count() == 0


def test_entropy_is_bounded(spark):
    df = SPECS["user_entropy_profile"].builder(spark, SF_SMOKE)
    assert df.filter((F.col("entropy_norm") < 0) | (F.col("entropy_norm") > 1)).count() == 0
    # a single-type user has exactly zero entropy
    assert df.filter((F.col("n_types") == 1) & (F.col("entropy_bits") != 0.0)).count() == 0


def test_markov_rows_are_probability_distributions(spark):
    df = SPECS["event_type_markov"].builder(spark, SF_SMOKE)
    sums = (
        df.groupBy("prev_type")
        .agg(F.round(F.sum("p_transition"), 2).alias("s"))
        .filter(F.abs(F.col("s") - 1.0) > 0.02)
        .count()
    )
    assert sums == 0


def test_wau_at_least_dau(spark):
    df = SPECS["daily_active_users"].builder(spark, SF_SMOKE)
    assert df.filter(F.col("wau") < F.col("dau")).count() == 0
    assert df.filter((F.col("stickiness") < 0) | (F.col("stickiness") > 1)).count() == 0


def test_rollup_grains_are_consistent(spark):
    df = SPECS["events_rollup_hypertable"].builder(spark, SF_SMOKE)
    total = df.filter(F.col("day_b").isNull()).select("n_events").collect()[0][0]
    day_sum = (
        df.filter(F.col("day_b").isNotNull() & F.col("hour_b").isNull())
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    assert total == day_sum


def test_shard_pack_respects_item_counts(spark):
    df = SPECS["multimodal_shard_pack"].builder(spark, SF_SMOKE)
    # every document lands in exactly one shard
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    packed = df.agg(F.sum("n_items")).collect()[0][0]
    assert packed == n_docs


def test_pagerank_mass_is_conserved(spark):
    df = SPECS["pagerank_bipartite"].builder(spark, SF_SMOKE)
    total = df.agg(F.sum("pagerank")).collect()[0][0]
    # symmetric bipartite graph has no dangling mass: sum(rank) == 1
    assert abs(total - 1.0) < 1e-3
