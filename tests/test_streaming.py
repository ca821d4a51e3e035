"""Streaming semantics tests: checkpoint recovery (T6), replay-equals-batch,
Kafka payload shaping (S8), trigger/output-mode surface (T4/T5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_click_stream_spark.streaming.jobs import (
    read_events_stream,
    to_kafka_payload,
)
from tests.conftest import SF_SMOKE


def test_checkpoint_recovery_no_duplicates(spark, tmp_path):
    """T6: re-running an availableNow query against the same checkpoint
    reprocesses nothing — the sink stays exactly once for already-seen
    files."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            read_events_stream(spark, SF_SMOKE)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    first = spark.read.parquet(out).count()
    run()  # same checkpoint, no new files → no new rows
    assert spark.read.parquet(out).count() == first
    assert first == 1000  # sf0.001 events


def test_stream_replay_equals_batch(spark):
    """The file-source replay delivers exactly the batch table."""
    from e_commerce_click_stream_spark.io import table
    from e_commerce_click_stream_spark.streaming.jobs import run_to_completion

    streamed = run_to_completion(
        read_events_stream(spark, SF_SMOKE).groupBy("event_type").count(), "complete"
    )
    batch = table(spark, SF_SMOKE, "events").groupBy("event_type").count()
    assert {tuple(r) for r in streamed.collect()} == {tuple(r) for r in batch.collect()}


def test_kafka_payload_shape(spark):
    """S8: key/value columns, with the value a JSON envelope that round-trips
    through from_json (S2)."""
    from e_commerce_click_stream_spark.io import table

    ev = table(spark, SF_SMOKE, "events")
    payload = to_kafka_payload(ev, key_col="user_id")
    assert payload.columns == ["key", "value"]
    parsed = payload.select(
        F.from_json(
            "value",
            "user_id long, event_id long, ts timestamp, event_type string, value double, props string",
        ).alias("e")
    ).select("e.*")
    n = ev.count()
    assert parsed.filter(F.col("event_id").isNotNull()).count() == n
    back = {(r.event_id, r.event_type) for r in parsed.collect()}
    orig = {(r.event_id, r.event_type) for r in ev.collect()}
    assert back == orig


def test_tables_ddl_and_seed(spark, tmp_path):
    """S9 DDL mirror + S7 seed + product_metrics population (the table the
    reference declares but never writes)."""
    from e_commerce_click_stream_spark.io import table
    from e_commerce_click_stream_spark.tables import (
        create_analytics_schema,
        product_metrics_from_events,
        seed_dashboard_metrics,
    )

    db = "analytics_test"
    create_analytics_schema(spark, db=db, location=str(tmp_path / "wh"))
    try:
        seed_dashboard_metrics(spark, db=db)
        seeded = spark.table(f"{db}.dashboard_metrics")
        assert seeded.count() == 5
        assert {r.metric_name for r in seeded.collect()} >= {"total_events", "conversion_rate"}

        pm = product_metrics_from_events(table(spark, SF_SMOKE, "events"))
        pm.write.insertInto(f"{db}.product_metrics")
        got = spark.table(f"{db}.product_metrics")
        assert got.count() > 0
        assert got.filter("page_views > 0 AND conversion_rate > 0").count() >= 0
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_processing_time_trigger_matches_available_now(spark):
    """T5: the same finite replay under a processingTime trigger converges
    to the identical final state as Trigger.AvailableNow."""
    from e_commerce_click_stream_spark.streaming.jobs import (
        hourly_metrics_stream,
        read_events_stream,
        run_to_completion,
        run_with_processing_time,
    )

    pt = run_with_processing_time(
        hourly_metrics_stream(read_events_stream(spark, SF_SMOKE)), "complete"
    )
    an = run_to_completion(
        hourly_metrics_stream(read_events_stream(spark, SF_SMOKE)), "complete"
    )
    cols = ["hour_timestamp", "total_events", "page_views", "purchases", "revenue"]
    assert sorted(map(tuple, pt.select(cols).collect())) == sorted(
        map(tuple, an.select(cols).collect())
    )


def test_initial_watermark_drops_pre_epoch_rows(spark, tmp_path):
    """Pins the Spark behavior behind the r8 edge-parity reds: the
    event-time watermark initializes at EPOCH 0, so a pre-epoch row is
    "late" even in the very FIRST micro-batch and append-mode stateful
    operators (dropDuplicatesWithinWatermark here) drop it silently.
    The streaming oracles mirror this floor (plans/streaming_parity.py);
    if a Spark upgrade ever changes the initial-watermark semantics,
    this test flags the oracles for re-derivation."""
    src = str(tmp_path / "src")
    rows = [
        ("pre", "1969-12-31 22:59:00"),
        # exactly-epoch: the late filter is INCLUSIVE (ts <= watermark is
        # late — the r10 boundary finding), so ts == 0 is dropped too
        ("epoch", "1970-01-01 00:00:00"),
        ("post", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "k string, ts_s string").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["k"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pre_epoch_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        # awaitTermination returns False on timeout rather than raising —
        # a hung query must fail HERE, not as a misleading empty-table
        # assertion below
        assert q.awaitTermination(120), "replay did not finish in 120s"
    finally:
        q.stop()
    got = {r.k for r in spark.sql("SELECT k FROM pre_epoch_probe").collect()}
    assert got == {"post"}, (
        "initial-watermark semantics changed — re-derive the epoch floor "
        f"in the streaming oracles (got {got})"
    )
