"""Analytics table DDL — Spark-SQL mirror of the reference's Postgres schema.

Reproduces the five tables of /root/reference/db/init.sql:8-88 as Spark
managed tables (S9): raw_events (append audit), user_sessions (upsert
target), product_metrics, hourly_metrics, dashboard_metrics — including the
dashboard seed rows (init.sql:82-88, the S7 in-memory local source) and a
populater for product_metrics, which the reference declares but never
writes (SURVEY.md §1.1: schema-only capability — fixed here).

Postgres type mapping: SERIAL → implicit (no identity needed for analytics
tables), VARCHAR → STRING, DECIMAL(p,s) kept, TIMESTAMP WITH TIME ZONE →
TIMESTAMP (session TZ = UTC), BOOLEAN → BOOLEAN. btree indexes (init.sql:
73-79) have no Spark equivalent — the scale analogue recorded per table is
the partitioning/bucketing layout a 100 TB deployment would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# mirrors db/init.sql:8-70; partitioning comments = 100 TB layout guidance
DDL: dict[str, str] = {
    # init.sql:8-19; partition by event date, cluster by user_id
    "raw_events": """
        CREATE TABLE IF NOT EXISTS {db}.raw_events (
            event_id STRING,
            user_id STRING,
            event_type STRING,
            product_id STRING,
            purchase_amount DECIMAL(10,2),
            event_timestamp TIMESTAMP,
            session_id STRING,
            page_url STRING,
            user_agent STRING,
            processing_time TIMESTAMP
        ) USING PARQUET
    """,
    # init.sql:22-36; upsert key session_id
    "user_sessions": """
        CREATE TABLE IF NOT EXISTS {db}.user_sessions (
            session_id STRING,
            user_id STRING,
            session_start TIMESTAMP,
            session_end TIMESTAMP,
            total_events INT,
            page_views INT,
            cart_additions INT,
            purchases INT,
            purchase_amount DECIMAL(10,2),
            session_duration_seconds INT,
            converted BOOLEAN,
            updated_at TIMESTAMP
        ) USING PARQUET
    """,
    # init.sql:39-49 — declared by the reference, never populated there
    "product_metrics": """
        CREATE TABLE IF NOT EXISTS {db}.product_metrics (
            product_id STRING,
            metric_date DATE,
            page_views INT,
            cart_additions INT,
            purchases INT,
            conversion_rate DECIMAL(5,2),
            revenue DECIMAL(12,2),
            updated_at TIMESTAMP
        ) USING PARQUET
    """,
    # init.sql:52-62
    "hourly_metrics": """
        CREATE TABLE IF NOT EXISTS {db}.hourly_metrics (
            hour_timestamp TIMESTAMP,
            total_events INT,
            unique_users INT,
            page_views INT,
            cart_additions INT,
            purchases INT,
            conversion_rate DECIMAL(5,2),
            revenue DECIMAL(12,2),
            updated_at TIMESTAMP
        ) USING PARQUET
    """,
    # init.sql:65-70
    "dashboard_metrics": """
        CREATE TABLE IF NOT EXISTS {db}.dashboard_metrics (
            metric_name STRING,
            metric_value DECIMAL(15,4),
            metric_label STRING,
            updated_at TIMESTAMP
        ) USING PARQUET
    """,
}

# init.sql:82-88 seed rows (S7: spark.createDataFrame local source)
DASHBOARD_SEED = [
    ("total_events", 0.0, "Total Events"),
    ("unique_users", 0.0, "Unique Users"),
    ("conversion_rate", 0.0, "Conversion Rate (%)"),
    ("total_revenue", 0.0, "Total Revenue"),
    ("avg_session_duration", 0.0, "Avg Session Duration (minutes)"),
]


def create_analytics_schema(
    spark: SparkSession, db: str = "analytics", location: str | None = None
) -> None:
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}{loc}")
    for ddl in DDL.values():
        spark.sql(ddl.format(db=db))


def seed_dashboard_metrics(spark: SparkSession, db: str = "analytics") -> None:
    seed = spark.createDataFrame(
        DASHBOARD_SEED, "metric_name string, metric_value double, metric_label string"
    ).select(
        "metric_name",
        F.col("metric_value").cast("decimal(15,4)").alias("metric_value"),
        "metric_label",
        F.current_timestamp().alias("updated_at"),
    )
    seed.write.insertInto(f"{db}.dashboard_metrics", overwrite=True)


def product_metrics_from_events(events: DataFrame) -> DataFrame:
    """Populate the reference's orphaned product_metrics table: per-product
    per-day conditional counts + safe-division conversion rate, the same
    A2/A3/P7 shapes as the session/hourly metrics."""
    product = F.get_json_object("props", "$.k").alias("product_id")
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    out = (
        events.select(
            product, F.to_date("ts").alias("metric_date"), "event_type", "value"
        )
        .where(F.col("product_id").isNotNull())
        .groupBy("product_id", "metric_date")
        .agg(
            F.sum(F.when(is_("view"), 1).otherwise(0)).cast("int").alias("page_views"),
            F.sum(F.when(is_("click"), 1).otherwise(0)).cast("int").alias("cart_additions"),
            F.sum(F.when(is_("purchase"), 1).otherwise(0)).cast("int").alias("purchases"),
            F.sum(F.when(is_("purchase"), F.col("value")).otherwise(F.lit(0.0)))
            .cast("decimal(12,2)")
            .alias("revenue"),
        )
    )
    conv = (
        F.when(F.col("page_views") > 0, F.col("purchases") * 100.0 / F.col("page_views"))
        .otherwise(F.lit(0.0))
        .cast("decimal(5,2)")
    )
    return out.select(
        "product_id",
        "metric_date",
        "page_views",
        "cart_additions",
        "purchases",
        conv.alias("conversion_rate"),
        "revenue",
        F.current_timestamp().alias("updated_at"),
    )
