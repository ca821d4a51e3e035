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
    # r14 window (VERDICT r13 #1): LEADS with the 20 r8-proof queries
    # that led _VERIFY_NEXT last round — after this round's gate no
    # proof older than r9 remains anywhere — then the queries CHANGED
    # this round, then the oldest r9-proof queries (alphabetical) with
    # the remaining slots; the r9 overflow leads _VERIFY_NEXT for r15.
    # the 20 r8 proofs — refresh FIRST
    "lineitem_math_functions",
    "multimodal_decode_meta",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "pii_detection_report",
    "pii_redacted_docs",
    "q10_returned_items",
    "q11_important_stock",
    "q13_order_count_distribution",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "stratified_sample",
    "streaming_dashboard_metrics",
    "streaming_stateful_sessions",
    "token_array_functions",
    "train_eval_split_leakage",
    # CHANGED r14 — no fixture-current proof of the current behavior
    "corpus_curation_incremental",   # all-seven-tables cold-build sentinel
    "streaming_curation_ingest",     # deterministic sink + ckpt cleanup
    "dedup_stored_apply_erase",      # shingle-aware vacuity guard
    "pagerank_bipartite",            # size-derived edge-checkpoint level
    "q1_pricing_summary",            # money_terms() extraction (tripwire)
    "q5_local_supplier_volume",      # same
    "brand_revenue",                 # same
    "ann_lsh_buckets",               # size-derived band geometry
    "embedding_neardup_lsh",         # same
    "embedding_lsh_recall_eval",     # same (composes the neardup path)
    # size-derived checkpoint level (x10-probe OOM fix; result-neutral
    # by construction but code-touched, so they re-verify)
    "graph_triangle_count",
    "dedup_stored_probe_only",
    "dedup_incremental_stored",
    "dedup_stored_erase",
    "dedup_stored_compact",
    # rotation: the oldest r9-proof queries (alphabetical; the five the
    # checkpoint-level insertions displaced lead _VERIFY_NEXT)
    "ann_ivf_cells",
    "ann_ivf_probe_only",
    "ann_ivf_range_search",
    "ann_ivf_topk",
    "ann_range_search",
    "corpus_token_budget_plan",
    "dedup_connected_components",
    "dedup_exact_substring_spans",
    "dedup_quality_keep",
    "dedup_savings_report",
    "doc_curriculum_manifest",
    "doc_exact_substring_rewrite",
    "doc_gopher_quality_flags",
    "doc_quality_linear_score",
    "doc_script_profile",
)


# Overflow preference: emitted immediately AFTER the verify window. The
# driver checks "a bounded prefix (~50)" — if its window runs past 50,
# these benefit first; if not, they cost nothing (every one holds a
# fixture-current ever-green row). These are the r9-proof queries the
# r14 window could not fit — they lead the r15 window.
_VERIFY_NEXT: tuple[str, ...] = (
    "embedding_top_component",
    "embedding_truncation_recall",
    "eval_gram_decontamination",
    "k_anonymity_audit",
    "neardup_threshold_curve",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_diversity",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q20_promo_part_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "quality_threshold_sweep",
    "source_ngram_novelty",
    "streaming_click_attribution",
    "streaming_hourly_metrics",
    "streaming_pii_scrub",
    "streaming_quality_gate",
    "streaming_segment_enrichment",
    "substring_span_clusters",
    "user_bot_flags",
    "user_erasure_audit",
    "user_event_sequences",
    "vocab_oov_curve",
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
    any_module_skipped = False
    for mod in _PLAN_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            if exc.name != mod:  # genuine missing dependency inside the module
                raise
            any_module_skipped = True
    # Rotation lists are maintained by hand (~90 literal edits per round) —
    # a typo'd name must fail LOUDLY here, not silently forfeit its verify
    # slot (ADVICE r10). The strictness only applies when the registry is
    # complete: a tolerated-missing plan module (the swallow above) takes
    # its registrations with it, and flagging those names would make the
    # tolerance unreachable.
    if not any_module_skipped:
        unknown = (set(_VERIFY_FIRST) | set(_VERIFY_NEXT)) - set(_REGISTRY)
        if unknown:
            raise ValueError(
                f"rotation lists name unregistered queries: {sorted(unknown)}"
            )
    overlap = set(_VERIFY_FIRST) & set(_VERIFY_NEXT)
    if overlap:
        raise ValueError(f"queries in BOTH rotation lists: {sorted(overlap)}")
    for lst, label in ((_VERIFY_FIRST, "_VERIFY_FIRST"), (_VERIFY_NEXT, "_VERIFY_NEXT")):
        if len(lst) != len(set(lst)):
            dupes = sorted({n for n in lst if lst.count(n) > 1})
            raise ValueError(f"duplicate names in {label}: {dupes}")
    if any_module_skipped:
        # tolerated-missing plan module: its registrations are absent, so
        # rotation names it owned must be skipped, not KeyError (the
        # degradation path the strictness guard above deliberately spares)
        ordered = {n: _REGISTRY[n] for n in _VERIFY_FIRST if n in _REGISTRY}
        ordered.update(
            (n, _REGISTRY[n]) for n in _VERIFY_NEXT if n in _REGISTRY
        )
    else:
        ordered = {n: _REGISTRY[n] for n in _VERIFY_FIRST}
        ordered.update((n, _REGISTRY[n]) for n in _VERIFY_NEXT)
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered
