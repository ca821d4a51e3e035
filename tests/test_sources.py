"""Text-format source round-trips: CSV and JSON-lines with EXPLICIT
schemas (SURVEY.md §1.2 — the engine never infers), including the
PERMISSIVE corrupt-record path a real ingest needs. The reference's only
text-format source is Kafka-JSON (covered by the streaming suite); these
prove the same explicit-schema discipline for the file formats a
warehouse actually receives drops of."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e_commerce_click_stream_spark.io import table
from tests.conftest import SF_SMOKE

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def events_subset(spark):
    return table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


def _multiset(df):
    return sorted(map(tuple, df.collect()))


def test_csv_round_trip_with_explicit_schema(spark, events_subset):
    out = tempfile.mkdtemp(prefix="events_csv_")
    events_subset.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(SCHEMA).option("header", True).csv(out)
    assert back.schema == SCHEMA
    assert _multiset(back) == _multiset(events_subset)


def test_jsonl_round_trip_with_explicit_schema(spark, events_subset):
    out = tempfile.mkdtemp(prefix="events_jsonl_")
    events_subset.write.mode("overwrite").json(out)
    back = spark.read.schema(SCHEMA).json(out)
    assert back.schema == SCHEMA
    assert _multiset(back) == _multiset(events_subset)


def test_jsonl_permissive_corrupt_records_are_quarantined(spark):
    out = tempfile.mkdtemp(prefix="dirty_jsonl_")
    with open(os.path.join(out, "part-0.json"), "w") as f:
        f.write('{"event_id": 1, "user_id": 10, "event_type": "view", "value": 1.5}\n')
        f.write("{this is not json}\n")
        f.write('{"event_id": 2, "user_id": 20, "event_type": "click", "value": 2.5}\n')
    # NB: StructType.add mutates in place — never .add the shared SCHEMA
    dirty_schema = T.StructType(
        list(SCHEMA.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    back = (
        spark.read.schema(dirty_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    # cache first: Spark forbids filtering raw JSON on _corrupt_record alone
    back = back.cache()
    try:
        good = back.filter(F.col("_corrupt_record").isNull())
        bad = back.filter(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2
        assert bad.count() == 1
        assert good.filter(F.col("event_id").isin(1, 2)).count() == 2
    finally:
        back.unpersist()


def test_csv_malformed_handling(spark):
    out = tempfile.mkdtemp(prefix="dirty_csv_")
    with open(os.path.join(out, "part-0.csv"), "w") as f:
        f.write("event_id,user_id,event_type,value\n")
        f.write("1,10,view,1.5\n")
        f.write("not-a-long,20,click,oops\n")  # type mismatch -> nulls
        f.write("2,30,purchase,9.99\n")
    # PERMISSIVE: type-coercion failures surface as NULL cells, row kept
    permissive = (
        spark.read.schema(SCHEMA).option("header", True).csv(out)
    )
    assert permissive.count() == 3
    assert permissive.filter(F.col("event_id").isNull()).count() == 1
    # DROPMALFORMED drops type-mismatch AND wrong-arity rows — but ONLY
    # for the columns actually parsed: CSV column pruning means a count()
    # or a pruned projection may not see the malformed cell at all, so the
    # assertion must read full rows (classic CSV-ingest footgun)
    with open(os.path.join(out, "part-1.csv"), "w") as f:
        f.write("event_id,user_id,event_type,value\n")
        f.write("3,40,view,1.5,surplus,surplus\n")  # extra columns
    dropped = (
        spark.read.schema(SCHEMA)
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(out)
    )
    kept = sorted(tuple(r) for r in dropped.collect())
    assert kept == [(1, 10, "view", 1.5), (2, 30, "purchase", 9.99)]


def test_events_ts_loads_as_timestamp_ltz_at_every_sf(spark):
    """Guard against fixture-encoding drift (round-3 regression).

    The driver has shipped events.ts as TIMESTAMP(NANOS)-as-INT64 and as
    plain timestamp[us] with isAdjustedToUTC=false; the loader + session
    config must normalize BOTH to classic TIMESTAMP (LTZ) — TIMESTAMP_NTZ
    breaks unix_micros() and withWatermark() across ~15 queries."""
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        dtypes = dict(table(spark, sf_dir, "events").dtypes)
        assert dtypes["ts"] == "timestamp", f"{sf_dir}: ts loaded as {dtypes['ts']}"


def test_orc_round_trip_with_explicit_schema(spark, events_subset):
    """ORC is the second Spark-native columnar format (vectorized reader,
    predicate pushdown) — prove the same explicit-schema round-trip
    discipline as parquet/CSV/JSON so mixed-format lakes can feed the
    engine."""
    out = tempfile.mkdtemp(prefix="events_orc_")
    events_subset.write.mode("overwrite").orc(out)
    back = spark.read.schema(SCHEMA).orc(out)
    assert back.schema == SCHEMA
    assert _multiset(back) == _multiset(events_subset)


def test_orc_predicate_pushdown_reaches_scan(spark, events_subset):
    out = tempfile.mkdtemp(prefix="events_orc_pd_")
    events_subset.write.mode("overwrite").orc(out)
    plan = (
        spark.read.schema(SCHEMA)
        .orc(out)
        .filter("event_type = 'purchase'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "event_type" in plan


def test_embeddings_vec_id_unique_at_every_sf():
    """Pin the invariant the kmeans/ANN plans rely on (plans/similarity.py):
    vec_id is the embeddings PK. embedding_kmeans_iter seeds its centroids
    from ``vec_id < K`` (duplicate ids would double-count a seed) and its
    DuckDB oracle groups by (vec_id, v) where the Spark side treats vec_id
    as unique; if the driver ever regenerates embeddings with duplicate
    ids the two sides would silently diverge — fail fast here instead."""
    import duckdb

    con = duckdb.connect()
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        n, n_ids = con.execute(
            f"SELECT count(*), count(DISTINCT vec_id) FROM '{sf_dir}/embeddings.parquet'"
        ).fetchone()
        assert n == n_ids, f"{sf_dir}: {n - n_ids} duplicate vec_id values"
    con.close()
