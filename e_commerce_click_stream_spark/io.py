"""Table loaders for the driver-generated parquet fixtures (TESTDATA.md).

All reads go through ``spark.read.parquet`` so Catalyst gets column pruning
and predicate pushdown for free; never pre-collect or pre-filter in Python.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver has shipped events.ts under two encodings across rounds:
#   1. TIMESTAMP(NANOS)-as-INT64 — Spark's reader rejects it by default
#      (PARQUET_TYPE_ILLEGAL); with the legacy flag it surfaces as LongType
#      nanoseconds, which we truncate to microseconds (DuckDB's semantics
#      for a nanos scan, so oracle comparisons stay bit-identical);
#   2. plain timestamp[us] with isAdjustedToUTC=false — Spark >=3.4 infers
#      TIMESTAMP_NTZ, which unix_micros()/withWatermark() reject.
# get_spark() disables NTZ inference session-wide, but queries also run
# under sessions we don't build (the driver's gate, plan audits), so the
# loader additionally re-reads with an explicit TIMESTAMP schema whenever a
# NTZ column surfaces. The stored micros are then interpreted as UTC
# instants directly — independent of the session time zone, unlike a cast.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def ntz_to_ltz(schema: T.StructType) -> T.StructType:
    """Rewrite every TIMESTAMP_NTZ field to classic TIMESTAMP (LTZ).

    Used as an explicit read schema: the stored micros are then
    interpreted as UTC instants directly, independent of the session time
    zone — unlike a cast, which would re-interpret wall-clock values.
    The single source of truth for this rewrite (loader, streaming
    replay, and the processor CLI all share it)."""
    return T.StructType(
        [
            T.StructField(
                f.name,
                T.TimestampType() if isinstance(f.dataType, T.TimestampNTZType) else f.dataType,
                f.nullable,
            )
            for f in schema.fields
        ]
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if any(isinstance(f.dataType, T.TimestampNTZType) for f in df.schema.fields):
        df = spark.read.schema(ntz_to_ltz(df.schema)).parquet(path)
    for col in _NANOS_TS_COLS.get(name, ()):
        field = df.schema[col]
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition — only when the input is genuinely
    under-split.

    The local fixtures are single parquet files → one input split → any
    expression-heavy pipeline (md5 minhashing, simhash explosion, vector
    math, Pandas decode) runs on one core unless spread first. On a real
    cluster inputs arrive pre-split (maxPartitionBytes), so the guard below
    makes this a literal no-op there: if the plan already has at least half
    the target parallelism, no exchange is added. Call only on
    freshly-scanned inputs: the getNumPartitions probe is jobless for a
    scan, but under AQE it would eagerly execute any shuffle stage upstream
    of df."""
    sc = df.sparkSession.sparkContext
    target = n or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= max(1, target // 2):
        return df
    return df.repartition(target)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
