"""Hive-style partitioned layout + partition pruning: the plan-level
proof that a date-partitioned table turns a day filter into directory
pruning — at 100 TB the scan reads 1/30th of the files, before any row
is decoded. Companion to the bucketing proof (tests/test_bucketing.py):
bucketing kills the join shuffle, partitioning kills the scan."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from e_commerce_click_stream_spark.io import table
from scripts.plan_audit import formatted_plan
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def partitioned_events(spark):
    out = tempfile.mkdtemp(prefix="events_by_day_")
    (
        table(spark, SF_SMOKE, "events")
        .withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out)
    )
    yield out


def test_layout_is_hive_partitioned(partitioned_events):
    days = [d for d in os.listdir(partitioned_events) if d.startswith("event_date=")]
    assert len(days) > 1, days


def test_day_filter_prunes_partitions(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events)
    one_day = df.filter(F.col("event_date") == "2024-01-02")
    plan = formatted_plan(one_day)
    # the date predicate must land in PartitionFilters (directory pruning),
    # NOT in PushedFilters (row-group pruning) and NOT in a post-scan Filter
    assert "PartitionFilters: [isnotnull(event_date" in plan, plan
    scanned = one_day.select("event_id").count()
    total = df.count()
    assert 0 < scanned < total


def test_pruned_read_matches_unpartitioned_filter(spark, partitioned_events):
    pruned = (
        spark.read.parquet(partitioned_events)
        .filter(F.col("event_date") == "2024-01-02")
        .count()
    )
    plain = (
        table(spark, SF_SMOKE, "events")
        .filter(F.to_date("ts") == "2024-01-02")
        .count()
    )
    assert pruned == plain
