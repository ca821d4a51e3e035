"""Registry of named queries.

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string runnable by DuckDB over the same parquet
fixtures (tables pre-registered as views). The driver's correctness gate
(/root/repo/__spark_entry__.py contract) compares the two at sf=0.01 by
row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded on both sides (summation order
  differs between engines, so raw doubles would never hash-match);
- when the averaged column is integral at a fixed scale (cents, rounded
  jaccards), the mean is computed as an exact integer sum + ONE final
  division — round(avg(double), k) flips its last decimal between
  engines once groups grow (summation order, observed at sf0.1 in
  dedup_cross_source_contamination / hourly_gapfill_locf /
  parts_above_avg_price); where the result can land on an exact decimal
  midpoint, final rounding is floor(x*10^k + 0.5)/10^k, never round()
  (Spark HALF_UP vs DuckDB double rounding);
- window ORDER BY over a nullable column says NULLS FIRST explicitly in
  the oracle (Spark's ASC default; DuckDB defaults NULLS LAST);
- all hashing/fingerprinting uses md5 hex *strings* (identical in Spark and
  DuckDB) rather than engine-specific integer hash functions — composed
  with ``||`` in SQL, never concat() (DuckDB concat() SKIPS NULL
  arguments where Spark's propagates them).
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
    # r5 rotation (VERDICT r4 #1): the driver regenerated all fixtures after
    # r2, so r1/r2-only green rows are stale proof. Slots 1-7 = the 7
    # never-green oracle-backed queries (lineitem_decimal_money red in r4 —
    # decimal outputs now cast to DOUBLE — plus the 6 ops registered after
    # the r4 window was packed), the 2 plans rewritten for scale this round,
    # and the 16 new r5 operators; the rest = 25 of the 45 queries whose
    # only green rows predate the regeneration, headline + clickstream §2
    # family first. The 31 deferred stale queries (simple scalar/setop/stat
    # shapes plus those displaced by late-r5 operators:
    # part_string_functions, order_date_functions, order_price_dispersion,
    # nation_set_ops, embedding_norms, dedup_exact_stats,
    # dedup_simhash_groups, q6_forecast_revenue, q12_priority_shipping,
    # q18_large_volume_customers, dedup_exact, dedup_simhash,
    # orders_with_returns, customer_order_stats, parts_above_avg_price,
    # order_value_percentiles, customers_without_orders,
    # orders_monthly_trend, customer_revenue_quartiles,
    # running_customer_revenue, lineitem_grouping_sets, part_type_rollup,
    # orders_status_pivot, top_orders_per_customer, customer_order_gaps,
    # skew_salted_event_counts, lineitem_cube, purchase_attribution_window,
    # events_asof_orders, recent_events_window, events_enriched —
    # all driver_sim-green on current fixtures) rotate in r6.
    # never driver-verified
    "lineitem_decimal_money",
    "event_props_map_profile",
    # changed this round (r5 perf rewrites: broadcast-rank BSP join;
    # zero-shuffle kmeans assignment) — r4 proof no longer covers the code
    "pagerank_bipartite",
    "embedding_kmeans_iter",
    # new this round — never driver-verified
    "corpus_snapshot_diff",
    "embedding_quality_gate",
    "graph_triangle_count",
    "ab_test_readout",
    "events_kmv_distinct",
    "weighted_reservoir_sample",
    "doc_bigram_nll",
    "doc_rag_chunks",
    "customer_scd2_history",
    "training_shard_manifest",
    "dedup_incremental_minhash",
    "embedding_pca_power",
    "dedup_semantic_cells",
    "doc_length_percentile_filter",
    "embedding_covariance",
    "session_event_paths",
    "skew_salted_fact_join",
    "bpe_merge_pairs",
    "order_value_histogram",
    "doc_passage_dedup",
    "bloom_prefiltered_antijoin",
    "embedding_dim_stats",
    "hourly_metrics_incremental",
    "doc_hashed_tf_vectors",
    "customer_rolling_spend_90d",
    "customer_purchase_streaks",
    "train_eval_split_leakage",
    "dedup_savings_report",
    "doc_language_confusion",
    "streaming_top_users",
    "user_activity_similarity",
    "events_weekly_seasonality",
    # stale headline queries (bench-critical — prove on current fixtures)
    "hourly_metrics",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "brand_revenue",
    "dedup_minhash_lsh",
    "corpus_clean_pipeline",
    # stale clickstream §2 family (P/A/O/F rows riding r1 proofs)
    "dashboard_metrics",
    "event_type_distribution",
    "conversion_by_duration_bucket",
    "latest_hour_conversion",
    "pipeline_status_union",
    "user_activity_profile",
    "session_first_event",
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
