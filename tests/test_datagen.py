"""Generator determinism + behavioral-model shape (SURVEY.md §2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_click_stream_spark.datagen import generate_events


def test_deterministic_across_partitionings(spark):
    a = generate_events(spark, n_sessions=50, seed=7).orderBy("event_id").collect()
    b = (
        generate_events(spark, n_sessions=50, seed=7)
        .repartition(13)
        .orderBy("event_id")
        .collect()
    )
    assert a == b
    assert len(a) > 50


def test_behavioral_model(spark):
    df = generate_events(spark, n_sessions=300, seed=42).cache()
    mix = {r.event_type: r.cnt for r in df.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    total = sum(mix.values())
    # G3: page_view-dominated mix
    assert mix["page_view"] / total > 0.5
    assert set(mix) == {"page_view", "add_to_cart", "purchase"}
    # G4: purchases carry amounts, views don't
    assert df.filter("event_type = 'purchase' AND purchase_amount IS NULL").count() == 0
    assert df.filter("event_type = 'page_view' AND purchase_amount IS NOT NULL").count() == 0
    # G1: bounded pools
    assert df.select("user_id").distinct().count() <= 1000
    products = df.filter("product_id IS NOT NULL").select("product_id").distinct()
    assert products.count() <= 500
    # G5: sessions end — bounded length
    sess = df.groupBy("session_id").count()
    assert sess.agg(F.max("count")).first()[0] <= 200
    df.unpersist()
