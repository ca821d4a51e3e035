"""SparkSession factory.

Mirrors the session configuration surface of the reference processor
(/root/reference/processor/streaming_processor.py:66-88: AQE on, partition
coalescing on, Kryo serializer) and adds the settings that matter at scale:
UTC session timezone, Arrow transfer for the Python boundary, AQE skew-join
handling, and a shuffle-partition count sized to the local core count
instead of the 200 default (on a real cluster this would be tuned to
~2-3x total executor cores, or left to AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "") or (os.cpu_count() or 8)))
    except ValueError:
        return os.cpu_count() or 8


def get_spark(
    app_name: str = "e_commerce_click_stream_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    In local mode the driver JVM is the whole cluster, so
    ``spark.driver.memory`` is the only memory knob; it must be set before
    the JVM starts, hence here rather than at runtime.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # -- parallelism ---------------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 16)))
        .config("spark.default.parallelism", str(cpus))
        # -- adaptive execution (reference X1/X2 + skew handling) ----------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- serialization / transfer --------------------------------------
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- determinism ----------------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # Fixture parquet stores naive timestamp[us] (isAdjustedToUTC=false);
        # Spark >=3.4 would infer TIMESTAMP_NTZ, which unix_micros() and
        # withWatermark() reject. Force the classic TIMESTAMP (LTZ) read —
        # with the UTC session TZ above the wall-clock values are identical
        # to what DuckDB's oracle sees, so value hashes are unchanged.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # -- local-mode ergonomics -------------------------------------------
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # At 100 TB the scan parallelism is governed by this: 128 MB splits.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
