"""Sink semantics: append, snapshot overwrite, keyed upsert (batch and
foreachBatch streaming — the reference's S3/S4/S6 sinks on parquet)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_click_stream_spark.sinks.writers import (
    append,
    foreach_batch_upsert,
    overwrite_snapshot,
    upsert,
)


def _rows(spark, data):
    return spark.createDataFrame(data, "k int, v string")


def test_append_accumulates(spark, tmp_path):
    path = str(tmp_path / "t")
    append(_rows(spark, [(1, "a")]), path)
    append(_rows(spark, [(1, "a")]), path)
    assert spark.read.parquet(path).count() == 2


def test_overwrite_replaces(spark, tmp_path):
    path = str(tmp_path / "t")
    overwrite_snapshot(_rows(spark, [(1, "a"), (2, "b")]), path)
    overwrite_snapshot(_rows(spark, [(3, "c")]), path)
    out = spark.read.parquet(path).collect()
    assert [(r.k, r.v) for r in out] == [(3, "c")]


def test_upsert_merges_on_key(spark, tmp_path):
    path = str(tmp_path / "t")
    upsert(_rows(spark, [(1, "a"), (2, "b")]), path, keys=["k"])
    upsert(_rows(spark, [(2, "B"), (3, "c")]), path, keys=["k"])
    out = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: "a", 2: "B", 3: "c"}


def test_streaming_foreach_batch_upsert_matches_batch(spark, tmp_path):
    """S4 parity: replay events through a streaming session aggregate in
    update mode, upsert each micro-batch; the final table must equal the
    one-shot batch aggregate."""
    from e_commerce_click_stream_spark.streaming.jobs import read_events_stream
    from e_commerce_click_stream_spark.io import table
    from tests.conftest import SF_SMOKE

    path = str(tmp_path / "sessions")
    stream = read_events_stream(spark, SF_SMOKE)
    agg = stream.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(foreach_batch_upsert(path, keys=["user_id"]))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    got = {(r.user_id, r.n, r.total_value) for r in spark.read.parquet(path).collect()}
    want = {(r.user_id, r.n, r.total_value) for r in batch.collect()}
    assert got == want


def test_jdbc_writer_option_parity(spark):
    """The JDBC passthrough carries the reference's exact option set
    (streaming_processor.py:150-157); build-only — no DB in the container."""
    from e_commerce_click_stream_spark.sinks.writers import jdbc_writer

    w = jdbc_writer(
        _rows(spark, [(1, "a")]),
        url="jdbc:postgresql://localhost:5432/analytics",
        table="analytics.raw_events",
        user="u",
        password="p",
        mode="append",
        num_partitions=8,
    )
    # DataFrameWriter keeps its config private; format/option round-trip is
    # observable via the jvm-side plan it would build — assert on the public
    # surface instead: saving against a bogus driver must fail with a
    # class-not-found (options reached the JDBC source), not an option error
    import pytest

    with pytest.raises(Exception) as exc:
        w.save()
    assert "postgresql" in str(exc.value).lower() or "ClassNotFound" in str(exc.value)
