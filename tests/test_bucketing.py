"""Bucketed-table co-located joins: the plan-level proof that persisting
both sides hash-bucketed on the join key removes the join shuffle
entirely (and the sort, when sortBy matches) — the storage layout that
makes repeated fact-fact joins affordable at 100 TB."""

from __future__ import annotations

import pytest

from e_commerce_click_stream_spark.io import table
from e_commerce_click_stream_spark.sinks.writers import write_bucketed
from scripts.plan_audit import count_shuffles, formatted_plan
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    write_bucketed(li, "li_bucketed", ["l_orderkey"], num_buckets=8,
                   sort_cols=["l_orderkey"])
    write_bucketed(o, "o_bucketed", ["o_orderkey"], num_buckets=8,
                   sort_cols=["o_orderkey"])
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    # forbid broadcast so the join MUST satisfy its distribution
    # requirement — from bucketing, not an exchange
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table(li_name)
        o = spark.table(o_name)
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = formatted_plan(joined)
        assert count_shuffles(plan) == 0, plan.split("\n\n")[0]
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    li = spark.table(li_name)
    o = spark.table(o_name)
    bucketed_n = li.join(o, li.l_orderkey == o.o_orderkey).count()
    plain_li = table(spark, SF_SMOKE, "lineitem")
    plain_o = table(spark, SF_SMOKE, "orders")
    plain_n = plain_li.join(
        plain_o, plain_li.l_orderkey == plain_o.o_orderkey
    ).count()
    assert bucketed_n == plain_n


def test_join_scan_engages_bucketing(spark, bucketed_tables):
    # a bare scan reports "Bucketed: false (disabled by query planner)" —
    # bucketing only engages when an operator requires the distribution,
    # so assert on the JOIN plan's scans
    li_name, o_name = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table(li_name)
        o = spark.table(o_name)
        plan = formatted_plan(li.join(o, li.l_orderkey == o.o_orderkey))
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
