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

# events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
# rejects by default (PARQUET_TYPE_ILLEGAL). With the legacy flag the column
# surfaces as LongType nanoseconds; we truncate to microseconds — the exact
# semantics DuckDB applies when it scans a nanos parquet column — so oracle
# comparisons stay bit-identical.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        field = df.schema[col]
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    The local fixtures are single parquet files → one input split → any
    expression-heavy pipeline (md5 minhashing, simhash explosion, vector
    math, Pandas decode) runs on one core unless spread first. On a real
    cluster inputs arrive pre-split (maxPartitionBytes), so this is a
    no-op-cost guard, not a crutch: it costs one narrow shuffle of the raw
    rows before the expensive compute."""
    sc = df.sparkSession.sparkContext
    return df.repartition(n or sc.defaultParallelism)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
