"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(`e_commerce_click_stream_spark.plans.registry`): every implemented operator
from SURVEY.md §2 is a named QuerySpec pairing a Spark builder with a DuckDB
oracle SQL string. Specs without an oracle (approx sketches, streaming
replays) surface in ``queries()`` only → driver records rows-only checks.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from e_commerce_click_stream_spark.plans.registry import all_specs  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_specs()
    return specs["hourly_metrics"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
