"""Registry of named queries.

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string runnable by DuckDB over the same parquet
fixtures (tables pre-registered as views). The driver's correctness gate
(/root/repo/__spark_entry__.py contract) compares the two at sf=0.01 by
row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded on both sides (summation order
  differs between engines, so raw doubles would never hash-match);
- all hashing/fingerprinting uses md5 hex *strings* (identical in Spark and
  DuckDB) rather than engine-specific integer hash functions.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_PLAN_MODULES = (
    "e_commerce_click_stream_spark.plans.clickstream",
    "e_commerce_click_stream_spark.plans.relational",
    "e_commerce_click_stream_spark.plans.dedup",
    "e_commerce_click_stream_spark.plans.similarity",
    "e_commerce_click_stream_spark.plans.text",
    "e_commerce_click_stream_spark.plans.multimodal",
    "e_commerce_click_stream_spark.plans.streaming_parity",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # None => driver records rows-only check
    headline: bool = False  # included in bench.py timings
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle,
            headline=headline,
            tags=tuple(tags),
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Import every plan module (registration is an import side effect)."""
    for mod in _PLAN_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            if exc.name != mod:  # genuine missing dependency inside the module
                raise
    return dict(_REGISTRY)
