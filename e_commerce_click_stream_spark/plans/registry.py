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
    "e_commerce_click_stream_spark.plans.behavior",
    "e_commerce_click_stream_spark.plans.graph",
    "e_commerce_click_stream_spark.plans.governance",
)

# The external correctness gate verifies a bounded prefix (~50) of queries()
# in dict-insertion order. Emit these names FIRST so every query that is new,
# changed this round, or lacked a CORRECTNESS row last round lands inside the
# verified window; previously-proven queries follow in registration order.
# Maintain per round: new/changed queries go at the top.
_VERIFY_FIRST: tuple[str, ...] = (
    # new / changed this round — must verify
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q15_top_supplier",
    "q16_supplier_diversity",
    "q17_small_quantity_revenue",
    "q20_promo_part_suppliers",
    "q21_waiting_suppliers",
    "dedup_connected_components",
    "doc_repetition_stats",
    "doc_pii_scrub",
    "embedding_kmeans_iter",
    "streaming_click_attribution",
    "events_json_deadletter",
    "lineitem_math_functions",
    "session_cart_contents",
    "dedup_ngram_jaccard",
    "embedding_neardup_lsh",
    "q4_order_priority",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q19_disjunctive_predicates",
    "q22_dormant_customers",
    "doc_pack_sequences",
    "stratified_sample",
    # no CORRECTNESS_r01 row: similarity / sampling
    "ann_cosine_topk",
    "ann_lsh_buckets",
    "embedding_cosine_pairs",
    "ann_ivf_cells",
    "ann_ivf_topk",
    "deterministic_sample",
    # no CORRECTNESS_r01 row: text analysis
    "doc_quality_scores",
    "doc_token_counts",
    "doc_language_id",
    "doc_fingerprints",
    "corpus_source_stats",
    "token_array_functions",
    "dedup_levenshtein_sample",
    # no CORRECTNESS_r01 row: multimodal plumbing
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "multimodal_feature_extract",
    # no CORRECTNESS_r01 row: streaming parity (real streams, oracle on state)
    "streaming_hourly_metrics",
    "streaming_dashboard_metrics",
    "streaming_session_windows",
    "streaming_stateful_sessions",
    # new this round (the rest of the round's new queries queue for r3 —
    # the 50-slot window is otherwise full of never-verified backlog)
    "streaming_exactly_once_dedup",
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
    """Import every plan module (registration is an import side effect).

    Returns specs with ``_VERIFY_FIRST`` names leading (driver verification
    window), then the remainder in registration order.
    """
    for mod in _PLAN_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            if exc.name != mod:  # genuine missing dependency inside the module
                raise
    ordered = {n: _REGISTRY[n] for n in _VERIFY_FIRST if n in _REGISTRY}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered
