"""Structural audit of physical plans — the scale gate.

Correctness says the answer is right at sf0.01; this audit says the PLAN
is the one that survives 100 TB: dimension joins broadcast (fact side
never shuffles), filters reach the parquet scan, aggregates are
partial+final pairs, top-k uses TakeOrderedAndProject / WindowGroupLimit
instead of full sorts, and shuffle counts match the operator's minimum.

Run: python scripts/plan_audit.py            # audits EXPECTATIONS below
Each rule is (substring must appear | must not appear | max shuffle
exchanges in the non-adaptive initial plan). Plans are compiled, never
executed — the audit is seconds, not minutes.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# name -> dict(contains=[...], not_contains=[...], max_exchanges=N)
# max_exchanges counts shuffle Exchange nodes only (BroadcastExchange is
# the cheap path we WANT; it is excluded).
EXPECTATIONS: dict[str, dict] = {
    # two broadcast dim joins; the lineitem fact is never shuffled for a
    # join — the only Exchange feeds the final agg; top-10 is
    # TakeOrderedAndProject (heap per partition), never a global Sort
    "q3_shipping_priority": {
        "contains": ["BroadcastHashJoin", "TakeOrderedAndProject", "PushedFilters: [Is"],
        "not_contains": ["SortMergeJoin", "CartesianProduct"],
        "max_exchanges": 1,
    },
    # canonical partial+final hash agg: exactly one shuffle, predicate
    # pushed to the scan, ReadSchema pruned to the 7 referenced columns
    "q1_pricing_summary": {
        "contains": ["HashAggregate", "PushedFilters: [Is"],
        "not_contains": ["SortAggregate", "CartesianProduct"],
        "max_exchanges": 1,
    },
    # 5-table star join: every dimension broadcasts
    "q5_local_supplier_volume": {
        "contains": ["BroadcastHashJoin"],
        "not_contains": ["CartesianProduct"],
        "max_exchanges": 2,
    },
    # query vectors broadcast against the corpus (corpus never moves);
    # per-query top-k via WindowGroupLimit (rank pushdown), one shuffle
    # to co-locate each query's candidates
    "ann_cosine_topk": {
        "contains": ["BroadcastNestedLoopJoin", "WindowGroupLimit"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 1,
    },
    # semantic decontamination (r12): the eval split broadcasts against
    # the train corpus (which never shuffles for the join); per-train
    # best match is a partial+final max(struct) — ONE shuffle total
    "eval_semantic_decontamination": {
        "contains": ["BroadcastNestedLoopJoin", "partial_max"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 1,
    },
    # as-of join composition: union + ONE hash shuffle on the key, then
    # linear window work — the whole point vs the O(n·m) inequality join
    "events_asof_orders": {
        "contains": ["Union", "Window"],
        "not_contains": ["Join"],
        "max_exchanges": 1,
    },
    # bucketed range join MUST compile to an equi-join (hash-partitioned
    # on (user,bucket)) — never a nested-loop over the inequality
    "purchase_attribution_window": {
        "contains": ["HashAggregate"],
        "not_contains": ["BroadcastNestedLoopJoin", "CartesianProduct"],
        "max_exchanges": 4,
    },
    # salted two-phase agg: exactly two shuffles by construction
    # (event_type,salt) then (event_type)
    "skew_salted_event_counts": {
        "contains": ["HashAggregate"],
        "not_contains": ["Join"],
        "max_exchanges": 2,
    },
    # keyed session agg: one shuffle, partial+final
    "session_metrics": {
        "contains": ["HashAggregate"],
        "not_contains": ["SortAggregate", "Join"],
        "max_exchanges": 1,
    },
    # pure filter+agg: all four predicates reach the scan, one shuffle
    # feeds the single-row final agg
    "q6_forecast_revenue": {
        "contains": ["HashAggregate", "PushedFilters: [Is"],
        "not_contains": ["Join", "SortAggregate"],
        "max_exchanges": 1,
    },
    # aggregate-then-join: the HAVING agg runs before any join; customer
    # broadcasts; at sf0.01 the orders join also broadcasts (1 shuffle
    # total) — allow SMJ's extra exchanges at larger SFs
    "q18_large_volume_customers": {
        "contains": ["HashAggregate", "BroadcastHashJoin"],
        "not_contains": ["CartesianProduct"],
        "max_exchanges": 3,
    },
    # fact-fact equi-join + conditional counts; ship-year predicate pushed
    "q12_priority_shipping": {
        "contains": ["HashAggregate", "PushedFilters: [Is"],
        "not_contains": ["CartesianProduct"],
        "max_exchanges": 3,
    },
    # GROUPING SETS = one Expand + one shuffle (never three scans)
    "lineitem_grouping_sets": {
        "contains": ["Expand", "HashAggregate"],
        "not_contains": ["Union", "Join"],
        "max_exchanges": 1,
    },
    # scalar subquery: 1-row avg broadcast-crossjoined (BNLJ over one row),
    # never collected; two shuffles (global avg + per-brand agg)
    "parts_above_avg_price": {
        "contains": ["BroadcastNestedLoopJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 2,
    },
    # PPJoin candidate stage: prefix-filtered inverted index must stay an
    # EQUI self-join (never a nested-loop/cartesian pair scan), df cap +
    # distinct are hash aggregates
    "dedup_ngram_jaccard": {
        "contains": ["HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 5,
    },
    # LSH near-dup: the banded keys are checkpointed before the self-join
    # (r15 — signature pipeline runs ONCE, at checkpoint time, where its
    # only nested-loop is the 1-row packed-plane broadcast); the readout
    # plan is the candidate equi-join on (band_id, band_sig) with a
    # distinct-pair hash aggregate and the two broadcast verify joins
    "embedding_neardup_lsh": {
        "contains": ["HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 4,
    },
    # EXISTS with inequality correlation: hash semi-join, never a
    # nested-loop; order-date range pushed to the orders scan
    "q4_order_priority": {
        "contains": ["LeftSemi", "PushedFilters: [Is"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 3,
    },
    # returns top-20: dims broadcast, returnflag + date pushed, top-k is
    # TakeOrderedAndProject
    "q10_returned_items": {
        "contains": ["BroadcastHashJoin", "TakeOrderedAndProject", "PushedFilters: [Is"],
        "not_contains": ["CartesianProduct"],
        "max_exchanges": 3,
    },
    # left join + per-customer count + distribution: two agg shuffles max
    # on top of the join
    "q13_order_count_distribution": {
        "contains": ["HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 4,
    },
    # one-month scan + broadcast part + single global agg
    "q14_promo_revenue": {
        "contains": ["BroadcastHashJoin", "HashAggregate", "PushedFilters: [Is"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 1,
    },
    # OR-of-ANDs predicates: still a broadcast EQUI join on p_partkey
    # (Catalyst extracts the common key), single agg
    "q19_disjunctive_predicates": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 1,
    },
    # scalar subquery broadcast (1-row BNLJ) + anti join on recent orders
    "q22_dormant_customers": {
        "contains": ["BroadcastNestedLoopJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 3,
    },
    # first-order agg + cohort join share the o_custkey exchange; cum
    # window runs over (cohort, month-offset) cardinality
    "customer_ltv_cohorts": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 3,
    },
    # per-kind windowed cumsum + agg — binary twin of doc_pack_sequences
    "multimodal_shard_pack": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 2,
    },
    # per-source windowed cumsum + agg: one shuffle on source feeds both
    "doc_pack_sequences": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 2,
    },
    # basket self-join fans out per ORDER (bounded C(7,2)); brand dim and
    # frequency/total tables broadcast; never corpus-quadratic
    "brand_basket_affinity": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct"],
        "max_exchanges": 11,
    },
    # centroids re-assembled from k tiny arrays then broadcast; the
    # corpus never shuffles for the cohesion join
    "embedding_cluster_quality": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 7,
    },
    # per-customer agg first; global rank over customer cardinality only
    "customer_pareto_abc": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 2,
    },
    # one user_id exchange shared by the lag window and the aggregate
    "user_interarrival_stats": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 2,
    },
    # delta-encoded interval count: per-order agg + day agg + one
    # date-cardinality cumulative window; no order x days explosion
    "orders_backlog_over_time": {
        "contains": ["Union", "Window", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 4,
    },
    # exact decimal aggregation: one partial+final agg, no joins
    "lineitem_decimal_money": {
        "contains": ["HashAggregate"],
        "not_contains": ["Join", "SortAggregate", "CartesianProduct"],
        "max_exchanges": 1,
    },
    # winnowing is a pure per-document map (plus the local-mode spread)
    "doc_winnowing_fingerprints": {
        "contains": [],
        "not_contains": ["Join", "HashAggregate", "CartesianProduct"],
        "max_exchanges": 1,
    },
    # pure hash-predicate filter: no shuffle at all, filter runs at scan
    "stratified_sample": {
        "contains": [],
        "not_contains": ["Exchange", "Join"],
        "max_exchanges": 0,
    },
    # tumbling-window agg with EXACT count(distinct user_id): Catalyst's
    # distinct expansion is two shuffles (hash on (window,user) to dedup,
    # then on (window) to count) — that IS the minimal exact plan; the
    # one-shuffle alternative is hourly_metrics_approx (HLL sketch)
    "hourly_metrics": {
        "contains": ["HashAggregate"],
        "max_exchanges": 2,
    },
    # derived cost agg (shuffle 1) + per-part window min (shuffle 2);
    # part/supplier-chain dims broadcast; top-100 never a global sort
    "q2_min_cost_supplier": {
        "contains": ["BroadcastHashJoin", "Window", "TakeOrderedAndProject"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 2,
    },
    # double-aliased nation dim broadcasts twice; single 3-key agg shuffle
    "q7_volume_shipping": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 1,
    },
    # seven dim joins all broadcast; conditional-sum share in ONE agg pass
    "q8_market_share": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 1,
    },
    "q9_product_type_profit": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 1,
    },
    # per-part value agg (1 shuffle) + 1-row threshold broadcast back —
    # NOT an unpartitioned window over every part
    "q11_important_stock": {
        "contains": ["BroadcastNestedLoopJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 1,
    },
    # rank()=1 over per-supplier revenue MUST pre-prune map-side
    # (WindowGroupLimit) before the single-partition final window
    "q15_top_supplier": {
        "contains": ["WindowGroupLimit", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 2,
    },
    # NOT IN → broadcast anti join; distinct agg expands to two shuffles
    "q16_supplier_diversity": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 2,
    },
    # correlated per-part avg as a partitioned window: ONE scan of
    # lineitem (no self-join), window shuffle + final 1-row agg
    "q17_small_quantity_revenue": {
        "contains": ["BroadcastHashJoin", "Window", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 2,
    },
    # HAVING-agg semi join: qualifying-supplier list broadcasts
    "q20_promo_part_suppliers": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 1,
    },
    # exists/not-exists as two per-order window counts: (order,supp) agg
    # shuffle, order-window shuffle, final s_name agg — never a
    # fact-fact self-join
    "q21_waiting_suppliers": {
        "contains": ["Window", "HashAggregate", "TakeOrderedAndProject"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 3,
    },
    # one hash exchange on user_id feeds all three window passes AND the
    # final group-by — the partitioning-reuse proof for the funnel chain
    "funnel_conversion": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 1,
    },
    # cohort sizes (date-cardinality) broadcast; activity/firsts join is
    # hash on user_id; the only NLJ anywhere is forbidden
    "user_retention_cohorts": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
        "max_exchanges": 6,
    },
    # WAU range join: day grid broadcasts (BNLJ over date-cardinality rows
    # is the intended cheap path); rolling window sorts per-day rows only
    "daily_active_users": {
        "contains": ["BroadcastNestedLoopJoin", "Window", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 7,
    },
    # gram-df join must stay an EQUI join on the md5 key — fan-out 1 per
    # gram instance, never a pair-generating scan; the spread() round-robin
    # appears twice in the initial plan (grams feeds both the df agg and
    # the join) and collapses to one ReusedExchange at runtime
    "doc_gram_contamination": {
        "contains": ["Generate", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
        "max_exchanges": 5,
    },
    # codebook collapses to ONE row then broadcasts; the corpus side is a
    # single scan + projection with zero shuffles
    "embedding_pq_encode": {
        "contains": ["BroadcastNestedLoopJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 1,
    },
    # (user,type) pre-agg then per-user fold over <=5 rows; no UDF
    "user_entropy_profile": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 2,
    },
    # lag window on user_id, 5x5 transition agg, tiny prob window
    "event_type_markov": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 3,
    },
    # frequency table in one hash agg; scoring join fan-out exactly 1
    "doc_unigram_nll": {
        "contains": ["Generate", "HashAggregate", "BroadcastNestedLoopJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 4,
    },
    # explode -> token agg; global rank runs over vocab cardinality only
    "corpus_vocabulary": {
        "contains": ["Generate", "HashAggregate", "Window"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 3,
    },
    # tf-df equi-join on token (fan-out 1) + 1-row N broadcast + per-doc
    # WindowGroupLimit top-k
    "tfidf_top_terms": {
        "contains": ["WindowGroupLimit", "BroadcastNestedLoopJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 5,
    },
    # four grains in ONE pass: one Expand + one shuffle, never four scans
    "events_rollup_hypertable": {
        "contains": ["Expand", "HashAggregate"],
        "not_contains": ["Union", "Join", "CartesianProduct"],
        "max_exchanges": 1,
    },
    # grid generated from a 1-row bounds agg (never collected); LOCF
    # window over time-dimension rows
    "hourly_gapfill_locf": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 3,
    },
    # hourly pre-agg then a window over (type, hour) cardinality only
    "events_anomaly_zscore": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 2,
    },
    # hopping windows: Expand (4 assignments/event) then ONE hash agg
    "events_sliding_windows": {
        "contains": ["Expand", "HashAggregate"],
        "not_contains": ["Join", "Union", "CartesianProduct"],
        "max_exchanges": 1,
    },
    # aggregate-first full outer: join runs over key cardinality; both
    # 25-row agg sides broadcastable but outer sides must keep nulls
    "nation_coverage_full_outer": {
        "contains": ["FullOuter", "HashAggregate"],
        "not_contains": ["CartesianProduct"],
        "max_exchanges": 2,
    },
    # the SQL text compiles to the same partial+final agg as the
    # DataFrame builders — one shuffle
    "sql_gateway_hourly_revenue": {
        "contains": ["HashAggregate"],
        "not_contains": ["Join", "CartesianProduct", "SortAggregate"],
        "max_exchanges": 1,
    },
    # integrity checks: anti joins (dims broadcast), never nested loops
    "dq_constraint_report": {
        "contains": ["Union", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 7,
    },
    # IVF-PQ: codebooks broadcast; candidate expansion and the
    # codes-attach are corpus-scale EQUI joins (SMJ legitimate — AQE
    # converts small sides to broadcast at runtime); top-k via rank
    # pushdown; never a cartesian pair scan
    "ann_ivf_pq_topk": {
        "contains": ["WindowGroupLimit", "HashAggregate", "BroadcastNestedLoopJoin"],
        "not_contains": ["CartesianProduct"],
        "max_exchanges": 8,
    },
    # per-key agg + 1-row totals broadcast + TakeOrderedAndProject top-k
    "key_skew_profile": {
        "contains": ["TakeOrderedAndProject", "BroadcastNestedLoopJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 3,
    },
    # BSP pagerank: the per-round rank⋈edges join must be a BROADCAST hash
    # join (checkpointed edges report UnknownPartitioning, so a shuffle join
    # re-exchanges + sorts the whole edge list every round — the r4
    # regression); the checkpointed 1-row node count kills the per-round
    # edge-scan recompute. Final-round plan: 1 shuffle Exchange (dst agg)
    # + broadcasts only.
    "pagerank_bipartite": {
        "contains": ["BroadcastHashJoin", "BroadcastNestedLoopJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 1,
    },
    # RANGE-interval frame: one custkey exchange shared by both window
    # aggregates; pure window math, no joins
    "customer_rolling_spend_90d": {
        "contains": ["Window"],
        "not_contains": ["Join", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
        "max_exchanges": 1,
    },
    # gaps-and-islands: (cust, day) distinct + cust window; the stacked
    # run/streak groupBys must reuse the window's custkey partitioning
    # (grouping keys prefix-extend it) — no third exchange
    "customer_purchase_streaks": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 2,
    },
    # k-means final round (earlier rounds sit behind checkpoints): the
    # packed-codebook broadcast (1-row BroadcastNestedLoopJoin) feeds a
    # zero-shuffle per-row assignment, and ONE wide hash agg emits cell
    # sizes + recentered centroids together — no readout join at all.
    # 2 exchanges: the corpus-side cell agg + the ≤k-row packed-codebook
    # collect inside the broadcast build (same shape as the LSH planes
    # collect)
    "embedding_kmeans_iter": {
        "contains": ["BroadcastNestedLoopJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BroadcastHashJoin"],
        "max_exchanges": 2,
    },
    # windowed EWMA: one user_id exchange shared by the collect-frame,
    # row_number, and partition count windows; pure expression fold, no
    # joins, no UDFs
    "user_value_ewma": {
        "contains": ["Window"],
        "not_contains": ["Join", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"],
        "max_exchanges": 1,
    },
    # deterministic importance sampling: per-row expressions only — zero
    # shuffles, filter evaluated at/near the scan
    "quality_weighted_sample": {
        "contains": ["Filter"],
        "not_contains": ["Exchange", "Join", "Window"],
        "max_exchanges": 0,
    },
    # source rebalancing: the corpus-scale shuffle is the per-source
    # groupBy (compiled twice — the totals branch re-derives it; tiny:
    # |sources| rows) + the 1-row totals' single-partition exchange; the
    # totals attach as a 1-row BNLJ broadcast — never a global Window
    "corpus_mix_plan": {
        "contains": ["BroadcastNestedLoopJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "Window"],
        "max_exchanges": 3,
    },
    # token-budget twin of corpus_mix_plan: same groupBy(source) + 1-row
    # broadcast totals shape; per-doc token counts stay in the scan
    # projection, never a Window or Python hop
    "corpus_token_budget_plan": {
        "contains": ["BroadcastNestedLoopJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "Window", "BatchEvalPython"],
        "max_exchanges": 3,
    },
    # BPE trainer: the output unions the four checkpointed 1-row winners,
    # so the audited plan is flat projections over ExistingRDD scans —
    # the per-round pair aggs ran at checkpoint time; nothing Python
    "bpe_train_merges": {
        "contains": ["Union", "Scan ExistingRDD"],
        "not_contains": ["Exchange", "BatchEvalPython", "SortMergeJoin"],
        "max_exchanges": 0,
    },
    # WordPiece trainer (r12): same checkpointed-loop discipline as the
    # BPE trainer — every per-round pair/symbol agg and likelihood argmax
    # ran at checkpoint time, so the audited plan is flat projections
    # over ExistingRDD scans unioned per round; nothing Python
    "wordpiece_train_merges": {
        "contains": ["Union", "Scan ExistingRDD"],
        "not_contains": ["Exchange", "BatchEvalPython", "SortMergeJoin"],
        "max_exchanges": 0,
    },
    # tokenizer apply: learned winners pivot to ONE broadcast row (BNLJ
    # attach), segmentation is a projection over the exploded words, one
    # groupBy(doc) re-agg; no Python, no sort joins
    "bpe_segment_docs": {
        "contains": ["HashAggregate", "BroadcastNestedLoopJoin", "Generate"],
        "not_contains": ["BatchEvalPython", "SortMergeJoin", "CartesianProduct"],
        "max_exchanges": 3,
    },
    # WordPiece apply (r12): same contract as bpe_segment_docs — winners
    # pivot to one broadcast row, segmentation is a projection, one
    # per-doc re-agg
    "wordpiece_segment_docs": {
        "contains": ["HashAggregate", "BroadcastNestedLoopJoin", "Generate"],
        "not_contains": ["BatchEvalPython", "SortMergeJoin", "CartesianProduct"],
        "max_exchanges": 3,
    },
    # mix-realizing manifest (r12): one groupBy(source) shuffle for the
    # per-source relation + one tiny scalar agg (w_total and the corpus
    # total fold out of ONE agg), then the n_sources-row plan broadcasts
    # onto the doc scan — the manifest itself is a zero-shuffle
    # projection (no per-source window)
    "corpus_mix_sampled_manifest": {
        "contains": ["BroadcastHashJoin", "Scan ExistingRDD"],
        "not_contains": ["Window", "CartesianProduct", "SortMergeJoin",
                         "BatchEvalPython"],
        "max_exchanges": 2,
    },
    # Gopher rule battery: pure zero-shuffle projection — token/line
    # arrays live inside one codegen stage
    "doc_gopher_quality_flags": {
        "contains": ["Scan parquet"],
        "not_contains": ["Exchange", "BatchEvalPython", "Window", "SortMergeJoin"],
        "max_exchanges": 0,
    },
    # banded sign-LSH bucket emission: signature is computed against a
    # broadcast 1-row planes array (BNLJ) and the bands explode in place
    # (Generate) — the ONLY exchange is the ≤N_PLANES-row collect that
    # packs the planes; the corpus itself never shuffles
    "ann_lsh_buckets": {
        "contains": ["BroadcastNestedLoopJoin", "Generate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 1,
    },
    # behavioral profiles: the user_id agg runs once behind a
    # localCheckpoint (so it is NOT visible in this audited plan — the
    # plan starts at the checkpointed profile scan), the pair scan
    # broadcasts one side, top-k via rank pushdown
    "user_activity_similarity": {
        "contains": ["WindowGroupLimit"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 3,
    },
    # map explode + single hash agg on the discovered-key grid
    "event_props_map_profile": {
        "contains": ["Generate", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct", "BatchEvalPython"],
        "max_exchanges": 2,
    },
    # passage rewrite: zero-shuffle chunking (Generate), df agg + fan-out-1
    # equi-join back + doc re-agg — key-local shuffles only, no pair join
    "doc_passage_dedup": {
        "contains": ["Generate", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 4,
    },
    # line-boilerplate rewrite (r11; re-pinned r15 optimization): the
    # explode + normalize pass runs ONCE at checkpoint time (the r14
    # plan re-ran scan+Generate+regex on both sides of the df join), so
    # the audited plan reads the checkpointed line relation twice (Scan
    # ExistingRDD) — min/max df agg (ONE exchange; countDistinct's
    # Expand+double-exchange removed under LINE_DF_DOCS == 2), fan-out-1
    # equi-join back, doc re-agg. No pair join, no Python, no Window, no
    # in-plan Generate
    "doc_line_boilerplate_scrub": {
        "contains": ["Scan ExistingRDD", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BatchEvalPython", "Window",
                         "SortMergeJoin", "Generate", "Expand"],
        "max_exchanges": 2,
    },
    # explicit runtime filter: the bloom is built ONCE behind a
    # localCheckpoint and rides a 1-row BNLJ broadcast into both union
    # branches; the fact side is never exchanged before the prefilter —
    # the only shuffle is the final aggregate, and no full-fact SMJ may
    # appear
    "bloom_prefiltered_antijoin": {
        "contains": ["BroadcastNestedLoopJoin", "Union", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 1,
    },
    # posexplode fan-out + ONE hash agg on the 64-key dim column; all
    # statistics associative so partials collapse map-side
    "embedding_dim_stats": {
        "contains": ["Generate", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct", "Window"],
        "max_exchanges": 1,
    },
    # incremental view maintenance: two partial-grain aggs + union merge +
    # final-grain agg; strictly no join anywhere
    "hourly_metrics_incremental": {
        "contains": ["Union", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 5,
    },
    # power-iteration PCA: the audited plan starts at the checkpointed
    # 64-row final vector — matrix-vector rounds are broadcast joins on
    # the d² grid, never an SMJ or cartesian anywhere
    "embedding_pca_power": {
        "contains": ["BroadcastHashJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 2,
    },
    # SemDeDup: zero-shuffle cell assignment (1-row packed centroid
    # broadcast, audited plan starts at the checkpointed assignment) and a
    # cell EQUI-join for the pair stage — never an all-pairs product
    "dedup_semantic_cells": {
        "contains": ["HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 4,
    },
    # exact percentiles over a discrete domain: histogram agg + cum walk
    # on the tiny length grid + 1-row broadcast bounds back over the
    # corpus (BNLJ) — never a global sort or a collect-style percentile
    "doc_length_percentile_filter": {
        "contains": ["HashAggregate", "Window", "BroadcastNestedLoopJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 3,
    },
    # covariance: BLAS Gram partials inside ONE Arrow-batch Python hop
    # (MapInPandas — the legitimate kind) + one hash agg merging
    # O(partitions × d²) associative-moment rows; no join, no explode
    "embedding_covariance": {
        "contains": ["MapInPandas", "HashAggregate"],
        "not_contains": ["Join", "CartesianProduct", "Window", "Generate"],
        "max_exchanges": 1,
    },
    # session paths: sessionizer window + per-session ordered collect +
    # path count + one single-partition rank/share window; no join
    "session_event_paths": {
        "contains": ["Window", "ObjectHashAggregate"],
        "not_contains": ["Join", "CartesianProduct", "BatchEvalPython"],
        "max_exchanges": 4,
    },
    # salted fact-fact join: compound (key, salt) equi-join — the explode
    # replication (Generate) must be present and the join must never
    # degrade to a nested loop over the inequality-free predicate
    "skew_salted_fact_join": {
        "contains": ["Generate", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 3,
    },
    # BPE pair stats: vocab agg BEFORE pair explosion (Generate sits over
    # the |vocab| rows, not the corpus), pair agg, then top-K on the tiny
    # pair grid
    "bpe_merge_pairs": {
        "contains": ["Generate", "HashAggregate", "Window"],
        "not_contains": ["CartesianProduct", "Join"],
        "max_exchanges": 3,
    },
    # histogram: one fact agg to |bins| rows; grand total and cum-share
    # are two frames of ONE single-partition window over the bin grid —
    # strictly no join, no second scan of the fact
    "order_value_histogram": {
        "contains": ["HashAggregate", "Window"],
        "not_contains": ["CartesianProduct", "Join"],
        "max_exchanges": 2,
    },
    # hashing-trick featurization is a pure projection: no shuffle, no
    # join, no Python
    "doc_hashed_tf_vectors": {
        "contains": ["Project"],
        "not_contains": ["Exchange", "Join", "HashAggregate", "BatchEvalPython"],
        "max_exchanges": 0,
    },
    # bigram LM: three hash aggs + three fan-out-1 equi-joins; the 1-row
    # token total broadcasts; nothing nested-loops over the corpus
    "doc_bigram_nll": {
        "contains": ["HashAggregate", "BroadcastNestedLoopJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 7,
    },
    # Kneser-Ney bigram (r12): same join-chain shape as doc_bigram_nll —
    # bigram explode runs ONCE behind a checkpoint (Scan ExistingRDD),
    # the model is hash aggs folded out of the count table, the 1-row
    # type total broadcasts, and scoring is equi-joins with fan-out 1.
    # One exchange MORE than doc_bigram_nll: KN's backward continuation
    # table (distinct left contexts per w2) is a second vocab-keyed agg
    # the fixed-λ model doesn't have
    "doc_kn_bigram_nll": {
        "contains": ["HashAggregate", "BroadcastNestedLoopJoin",
                     "Scan ExistingRDD"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 8,
    },
    # RAG chunking is sequence→explode→slice per row: zero shuffles,
    # no join, no Python
    "doc_rag_chunks": {
        "contains": ["Generate"],
        "not_contains": ["Exchange", "Join", "HashAggregate", "BatchEvalPython"],
        "max_exchanges": 0,
    },
    # SCD2 collapse: ONE hash exchange on custkey feeds both window
    # passes (lag → filter → row_number/lead re-sort locally); no join
    "customer_scd2_history": {
        "contains": ["Window"],
        "not_contains": ["Join", "CartesianProduct", "HashAggregate"],
        "max_exchanges": 1,
    },
    # shard manifest: one hash agg on the uniform md5-derived shard key
    "training_shard_manifest": {
        "contains": ["HashAggregate"],
        "not_contains": ["Join", "Window", "CartesianProduct"],
        "max_exchanges": 2,
    },
    # incremental dedup: banded equi-joins only (probe×store, verify,
    # final left join) — candidate generation must never nested-loop
    # top-1 = min_by partial+final SortAggregate (r9; struct-buffer aggs
    # can't use HashAggregateExec) — "Window" in not_contains is the real
    # pin: a revert to the row_number sort window must fail the audit
    "dedup_incremental_minhash": {
        "contains": ["SortAggregate"],
        "not_contains": ["Window", "CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython"],
        # tightened twice: candidate-distinct removal (r9), then the
        # broadcast best-verdict join (r10; this one-pass twin has
        # checkpointed its signed buckets since r9 and does not call
        # _probe_against) — remaining shuffles: the signature aggregation
        # and the min_by verdict agg
        "max_exchanges": 2,
    },
    # KMV sketch: rank window MUST prune (WindowGroupLimit before the
    # shuffle — the mergeable-sketch property); exact-count branch joins
    # back broadcast over group cardinality
    "events_kmv_distinct": {
        "contains": ["WindowGroupLimit", "BroadcastHashJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 5,
    },
    # weighted reservoir: per-group top-k with rank pushdown, no join
    "weighted_reservoir_sample": {
        "contains": ["WindowGroupLimit"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 1,
    },
    # A/B readout: user-grain agg + single-row conditional agg, no join
    "ab_test_readout": {
        "contains": ["HashAggregate"],
        "not_contains": ["Join", "Window", "CartesianProduct"],
        "max_exchanges": 2,
    },
    # --- breadth pins: every remaining headline + scale-critical batch
    # query holds at least a no-scale-killer pin (counts measured on the
    # audited plan; checkpointed builders truncate lineage, so their
    # exchange counts cover the FINAL segment only — the upstream
    # segments are audited via their own primitives above)
    # banded LSH dedup (headline): band-bucket equi-joins only; the
    # verify join broadcasts candidates against the shingled corpus
    "dedup_minhash_lsh": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython"],
        "max_exchanges": 3,
    },
    # rare-shingle inverted-index containment: equi-join candidates only
    "dedup_containment": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 4,
    },
    # pigeonhole-banded Hamming pairs: equi-join candidates only
    "dedup_simhash_hamming": {
        "contains": ["HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 4,
    },
    # exact dedup: ONE hash shuffle on the uniform md5 fingerprint
    "dedup_exact": {
        "contains": ["HashAggregate"],
        "not_contains": ["Join", "Window", "SortAggregate"],
        "max_exchanges": 1,
    },
    # IVF probe: centroids broadcast (1-row packed array), per-query
    # top-k via rank pushdown — never a corpus-wide sort
    "ann_ivf_topk": {
        "contains": ["WindowGroupLimit", "BroadcastHashJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 3,
    },
    # IVF cell stats: zero-shuffle assignment + one cell agg
    "ann_ivf_cells": {
        "contains": ["HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 2,
    },
    # corpus clean: dedup + quality gates fused in one pass
    "corpus_clean_pipeline": {
        "contains": ["HashAggregate", "WindowGroupLimit"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 2,
    },
    # star join: dims broadcast, fact never shuffles for the join
    "brand_revenue": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["SortMergeJoin", "CartesianProduct"],
        "max_exchanges": 1,
    },
    # zero-shuffle per-row text/embedding ops: pure codegen projections
    "deterministic_sample": {"not_contains": ["Exchange", "Join", "HashAggregate"], "max_exchanges": 0},
    "doc_quality_scores": {"not_contains": ["Exchange", "Join", "BatchEvalPython"], "max_exchanges": 0},
    "doc_token_counts": {"not_contains": ["Exchange", "Join"], "max_exchanges": 0},
    "doc_language_id": {"not_contains": ["Exchange", "Join"], "max_exchanges": 0},
    "doc_fingerprints": {"not_contains": ["Exchange", "Join"], "max_exchanges": 0},
    "embedding_norms": {"not_contains": ["Exchange", "Join"], "max_exchanges": 0},
    "events_enriched": {"not_contains": ["Exchange", "Join", "BatchEvalPython"], "max_exchanges": 0},
    # split-leakage audit: band equi-joins; never a pair nested loop
    "train_eval_split_leakage": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 4,
    },
    # CUBE / ROLLUP: one Expand pass + one agg shuffle — never one scan
    # per grouping set
    "lineitem_cube": {
        "contains": ["Expand", "HashAggregate"],
        "not_contains": ["Join", "Union"],
        "max_exchanges": 1,
    },
    "part_type_rollup": {
        "contains": ["Expand", "HashAggregate"],
        "not_contains": ["Join", "Union"],
        "max_exchanges": 1,
    },
    # pivot: two-phase agg, no per-status scan fan-out
    "orders_status_pivot": {
        "contains": ["HashAggregate"],
        "not_contains": ["Join", "Union"],
        "max_exchanges": 2,
    },
    # window chains: ONE custkey exchange feeds the frames
    "running_customer_revenue": {
        "contains": ["Window"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 1,
    },
    "customer_order_gaps": {
        "contains": ["Window"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 1,
    },
    # per-group top-k MUST rank-pushdown
    "top_orders_per_customer": {
        "contains": ["WindowGroupLimit"],
        "not_contains": ["Join", "CartesianProduct"],
        "max_exchanges": 1,
    },
    # multimodal decode: the ONE legitimate Python hop — Arrow-batched
    # mapInPandas, never row-at-a-time BatchEvalPython
    "multimodal_decode_meta": {
        "contains": ["MapInPandas"],
        "not_contains": ["BatchEvalPython", "Join"],
        "max_exchanges": 1,
    },
    # power iteration: output derives from the final checkpointed 1-row
    # direction — flat posexplode projection; the per-round matvecs
    # (coefficient projection + 64-group agg) ran at checkpoint time
    "embedding_top_component": {
        "contains": ["Generate", "Scan ExistingRDD"],
        "not_contains": ["Exchange", "BatchEvalPython", "SortMergeJoin"],
        "max_exchanges": 0,
    },
    # source novelty: (source, gram) distinct checkpoints once (gram
    # counts + join both read it), gram-grain count reuses the key, one
    # sources-grain agg, 1-row total broadcast — fan-out 1 per pair
    "source_ngram_novelty": {
        "contains": ["HashAggregate", "Scan ExistingRDD", "BroadcastNestedLoopJoin"],
        "not_contains": ["BatchEvalPython", "CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 5,
    },
    # bot flags: the per-user relation (lag window + agg) checkpoints
    # once — mean branch and output both read the ExistingRDD — then the
    # 1-row corpus mean broadcasts back (BNLJ attach); exact-arithmetic
    # heuristics, no Python, no sort-merge
    "user_bot_flags": {
        "contains": ["Scan ExistingRDD", "HashAggregate", "BroadcastNestedLoopJoin"],
        "not_contains": ["BatchEvalPython", "CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 1,
    },
    # curriculum manifest: length histogram -> cumulative walk on the
    # tiny distinct-length grid -> phases broadcast back by length; the
    # corpus itself never sorts or windows
    "doc_curriculum_manifest": {
        "contains": ["HashAggregate", "Window", "BroadcastHashJoin"],
        "not_contains": ["BatchEvalPython", "CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 4,
    },
    # quality keep: the labels+tokens relation checkpoints once for its
    # three consumers (max-tokens agg, canonical filter-join, output), so
    # the visible plan is two key-local aggs + the component-keyed join
    # back over ExistingRDD scans — no window, no Python
    "dedup_quality_keep": {
        "contains": ["HashAggregate", "Scan ExistingRDD"],
        "not_contains": ["BatchEvalPython", "CartesianProduct", "Window"],
        "max_exchanges": 5,
    },
    # watermark calibration: batch-grain agg + prefix-max window over
    # the TINY batch domain only, watermarks broadcast back onto events,
    # one grid-grain agg — the event stream itself never sorts
    "watermark_delay_calibration": {
        "contains": ["HashAggregate", "Window", "BroadcastHashJoin"],
        "not_contains": ["BatchEvalPython", "CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 6,
    },
    # k-anonymity: one QI-tuple groupBy (the only corpus-sized shuffle),
    # then a size-domain groupBy with the 1-row total broadcast-attached
    "k_anonymity_audit": {
        "contains": ["HashAggregate", "BroadcastNestedLoopJoin"],
        "not_contains": ["BatchEvalPython", "CartesianProduct", "SortMergeJoin", "Window"],
        "max_exchanges": 4,
    },
    # truncation recall: checkpointed full-dim baseline + per-width
    # broadcast brute-force rankings over prefix slices; recall via
    # semi-join + count — never a sort-merge pair join
    "embedding_truncation_recall": {
        "contains": ["BroadcastNestedLoopJoin", "Window", "Scan ExistingRDD"],
        "not_contains": ["BatchEvalPython", "CartesianProduct", "SortMergeJoin"],
        "max_exchanges": 16,
    },
    # unigram-LM trainer (final readout plan; the 12 Viterbi DP rounds
    # run behind per-round checkpoints): the M-step usage agg and its
    # 1-row total are the only shuffles; vocab/used/total all broadcast
    # into the output join (BHJ + 1-row BNLJ) — never a shuffle join; the
    # string-encoded DP argmin keeps every aggregate a HashAggregate
    "unigram_lm_train": {
        "contains": ["BroadcastHashJoin", "HashAggregate", "Scan ExistingRDD"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "SortAggregate"],
        "max_exchanges": 3,
    },
    # round-2 EM (r11): both DPs ran behind checkpoints by audit time, so
    # the audited plan is the round-2 usage agg over the final DP states
    # joined to the broadcast round-2 vocabulary — same discipline as
    # round 1 (one extra exchange: the r2 usage agg feeds both the output
    # join and its 1-row total)
    "unigram_lm_train_round2": {
        "contains": ["BroadcastHashJoin", "HashAggregate", "Scan ExistingRDD"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "SortAggregate"],
        "max_exchanges": 4,
    },
    # unigram apply path: the per-word segmentation table joins the
    # per-occurrence token stream on the word key (SMJ is the legitimate
    # scale plan — the unique-word table is NOT broadcast-bounded at web
    # scale), one doc-grain agg; never a nested-loop
    "unigram_lm_segment_docs": {
        "contains": ["HashAggregate", "Scan ExistingRDD"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin",
                         "BatchEvalPython", "SortAggregate"],
        "max_exchanges": 4,
    },
    # RRF fusion: both <= Q*k rank lists broadcast onto the union-derived
    # pair grid; one distinct + one per-query re-rank window
    "hybrid_rrf_fusion": {
        "contains": ["BroadcastHashJoin", "HashAggregate", "Window"],
        "not_contains": ["CartesianProduct", "SortMergeJoin",
                         "BatchEvalPython"],
        "max_exchanges": 3,
    },
    # BM25 retrieval: the checkpointed postings relation NEVER shuffles
    # for the probe — query terms broadcast into it (BroadcastHashJoin);
    # corpus scalars ride a 1-row broadcast (BNLJ-over-one-row, the
    # parts_above_avg_price pattern, so BNLJ is expected); per-query
    # top-k is rank pushdown (WindowGroupLimit heaps), never a global
    # sort; no second corpus scan (scalars derive from the postings)
    "bm25_topk_retrieval": {
        "contains": ["WindowGroupLimit", "BroadcastHashJoin", "Scan ExistingRDD"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Scan parquet"],
        "max_exchanges": 6,
    },
    # DSIR importance weights (r11): the audited plan starts at the
    # checkpointed per-doc score relation (tokenize + model fit ran at
    # checkpoint time) — corpus totals attach as a 1-row broadcast
    # (BNLJ-over-one-row, the parts_above_avg_price pattern); nothing
    # Python, no pair joins, no Window
    "dsir_importance_weights": {
        "contains": ["BroadcastNestedLoopJoin", "Scan ExistingRDD"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Window", "Generate"],
        "max_exchanges": 1,
    },
    # NB quality classifier (r12): the audited plan starts at the
    # checkpointed per-doc (label, n_tokens, dot_micro) relation — the
    # zero-shuffle label+tokenize projection, the <= 4096-row weight
    # broadcast, and the scoring join all ran at checkpoint time. Only
    # the 1-row prior agg shuffles; it attaches as a 1-row broadcast
    # (the DSIR/parts_above_avg pattern)
    "quality_nb_classifier": {
        "contains": ["BroadcastNestedLoopJoin", "Scan ExistingRDD"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Window", "Generate", "Scan parquet"],
        "max_exchanges": 1,
    },
    # NB ROC curve (r12): the sweep is a histogram-then-tiny-window —
    # one hash agg bins the checkpointed per-doc scores (never a
    # per-threshold corpus fan-out), min/max/totals broadcast, and the
    # only Window runs over the 16-row grid. Exchanges: the score agg
    # off the checkpointed dtb, the bin agg, the grid window's
    # single-partition exchange, and the 1-row min/max agg
    "quality_nb_roc_curve": {
        "contains": ["Scan ExistingRDD", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Scan parquet"],
        "max_exchanges": 5,
    },
    # alpha-power mix sweep (r12): the audited plan starts at the
    # checkpointed per-source token relation (the single corpus scan +
    # groupBy ran at checkpoint time); the 4-alpha grid is a zero-
    # shuffle Generate, per-alpha weight totals broadcast back on alpha,
    # the corpus total rides a 1-row broadcast
    "corpus_mix_temperature_sweep": {
        "contains": ["Generate", "BroadcastHashJoin", "BroadcastNestedLoopJoin",
                     "Scan ExistingRDD"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Window", "Scan parquet"],
        "max_exchanges": 2,
    },
    # composed curation readout (r12): the six stage branches each
    # aggregate a CHECKPOINTED relation (scrubbed docs, deduped docs,
    # gate survivors, per-doc DSIR scores) — the scrub/dedup/gate/DSIR
    # work ran once at checkpoint time, so the audited plan is six tiny
    # partial+final readout aggs, the per-source pack window, and ONE
    # metadata-only parquet count for the raw row. No pair joins, no
    # Python, no Generate (tokenizes ran pre-checkpoint), no SMJ (the
    # totals attach by broadcast)
    "corpus_curation_run": {
        "contains": ["Union", "Scan ExistingRDD", "BroadcastNestedLoopJoin",
                     "Window"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Generate"],
        "max_exchanges": 10,
    },
    # stored-weights NB probe (r12): scoring must come purely FROM the
    # store — the batch's hashed-TF relation (checkpointed Scan
    # ExistingRDD) joins the stored weight table by BROADCAST, the
    # stored prior rides a 1-row broadcast, ONE per-doc agg shuffle;
    # nothing re-fits (no second agg chain over bucket stats)
    "quality_nb_probe_only": {
        "contains": ["BroadcastHashJoin", "BroadcastNestedLoopJoin",
                     "Scan parquet spark_catalog.default.nbw_",
                     "Scan ExistingRDD"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Window", "Generate"],
        "max_exchanges": 1,
    },
    # confusion readout: same chain plus ONE <=4-group partial+final agg
    "quality_nb_confusion": {
        "contains": ["BroadcastNestedLoopJoin", "Scan ExistingRDD"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Window", "Generate", "Scan parquet"],
        "max_exchanges": 2,
    },
    # warm-store BM25 probe (r11): every relation comes off the bm25_*
    # catalog tables — NOTHING in the plan may tokenize the corpus
    # (Generate = explode is banned outright), the selected query terms
    # broadcast into the postings scan, scalars ride a 1-row broadcast,
    # top-k is rank pushdown. Only the query-term window + score agg +
    # rank shuffles remain
    "bm25_stored_probe_only": {
        "contains": ["WindowGroupLimit", "BroadcastHashJoin",
                     "Scan parquet spark_catalog.default.bm25_"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Generate"],
        "max_exchanges": 3,
    },
    # compact-then-probe (r12): the post-compaction probe plan must be
    # THE SAME warm-probe plan — compaction is invisible to the planner
    # (byte-stability additionally pinned in test_round12_ops)
    "bm25_stored_compact": {
        "contains": ["WindowGroupLimit",
                     "Scan parquet spark_catalog.default.bm25_"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Generate"],
        "max_exchanges": 3,
    },
    # append-then-probe: same probe contract after the incremental merge
    # (the build+append ran eagerly at store time, so the audited plan is
    # the warm probe's)
    "bm25_stored_append": {
        "contains": ["WindowGroupLimit",
                     "Scan parquet spark_catalog.default.bm25_"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Generate"],
        "max_exchanges": 3,
    },
    # erase-then-probe (r12): merge-on-read over the eroded store — the
    # tombstone deletion vector must reach each postings read as a
    # BroadcastHashJoin LeftAnti (never a shuffled anti-join), and the
    # probe keeps the warm-probe contract: no corpus tokenization
    # (Generate banned), rank pushdown, same 3-shuffle budget
    "bm25_stored_erase": {
        "contains": ["WindowGroupLimit", "LeftAnti", "BroadcastHashJoin",
                     "Scan parquet spark_catalog.default.bm25e_"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Generate"],
        "max_exchanges": 3,
    },
    # erase-then-APPLY-then-probe (r13): after the physical rewrite the
    # probe keeps the warm-probe contract over the rewritten store; the
    # truncated (empty) tombstone vector still anti-joins as a broadcast
    # (tableExists stays true post-apply — the cheap-probe contract)
    "bm25_stored_apply_erase": {
        "contains": ["WindowGroupLimit", "LeftAnti", "BroadcastHashJoin",
                     "Scan parquet spark_catalog.default.bm25ea_"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                         "Generate"],
        "max_exchanges": 3,
    },
    # hybrid-retrieval overlap: every join over the <= Q*k top-k
    # relations broadcasts onto the union-derived id grid — no full-outer
    # or sort-merge shuffle join anywhere
    "bm25_vs_ann_overlap": {
        "contains": ["BroadcastHashJoin", "Union"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 7,
    },
    # phash near-dup: the Arrow hop runs ONCE behind a checkpoint (plan
    # shows Scan ExistingRDD, never MapInPandas re-executed per branch);
    # the hot-bucket cap stage must appear — occupancy HashAggregate with
    # its tiny survivor list BROADCAST back onto the band rows — ahead of
    # the banded single-column equi-join (never all-pairs/NLJ); hamming
    # verify and distinct run on band candidates only
    "multimodal_phash_neardup": {
        "contains": ["Scan ExistingRDD", "HashAggregate", "BroadcastHashJoin"],
        "not_contains": [
            "MapInPandas", "BatchEvalPython", "CartesianProduct",
            "BroadcastNestedLoopJoin",
        ],
        "max_exchanges": 6,
    },
    # triangle counting: degree-ordered wedge + closing equi-joins only;
    # checkpointed edge list truncates the audited plan to the final
    # segment — the co-purchase self-join is audited via basket affinity
    # snapshot diff: fingerprints (not text) through ONE co-partitioned
    # full-outer join on the uniform doc_id key, then a tiny status agg
    "corpus_snapshot_diff": {
        "contains": ["SortMergeJoin FullOuter", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin"],
        "max_exchanges": 3,
    },
    # hygiene-gate audit: one single-row aggregate, nothing else
    "embedding_quality_gate": {
        "contains": ["HashAggregate"],
        "not_contains": ["Join", "Window", "CartesianProduct", "SortAggregate"],
        "max_exchanges": 1,
    },
    # (the BroadcastNestedLoopJoins in this plan are the 1-row × 1-row
    # final-stat assembly crossJoins, not a data-scale nested loop);
    # the closing-edge check MUST be a broadcast probe — sort-merging
    # the wedge stream OOM'd a default-heap session at sf0.1
    "graph_triangle_count": {
        "contains": ["HashAggregate", "BroadcastHashJoin"],
        "not_contains": ["CartesianProduct", "BatchEvalPython"],
        "max_exchanges": 8,
    },
    # stored-index probe: the store side streams from the BUCKETED
    # catalog tables (bands bucketed on the single-column join key, so at
    # scale the stored side never exchanges — pinned with broadcast
    # disabled in tests/test_bucketing.py; here the small batch broadcast
    # path is fine); best-match window + final left join; the build job
    # ran before this plan, so only the probe is audited here
    "dedup_incremental_stored": {
        "contains": ["SortAggregate", "Scan parquet spark_catalog.default.bidx_"],
        "not_contains": ["Window", "CartesianProduct", "BatchEvalPython"],
        # tightened r10: signed-batch checkpoint collapses the three
        # signature stages to one; best-verdict join broadcasts
        "max_exchanges": 2,
    },
    # erase-then-probe (r12): merge-on-read over the eroded band store —
    # the tombstone deletion vector reaches both stored reads as a
    # BroadcastHashJoin LeftAnti (never a shuffled anti-join); otherwise
    # the warm-probe contract holds (2-shuffle budget, no window)
    "dedup_stored_erase": {
        "contains": ["SortAggregate", "LeftAnti", "BroadcastHashJoin",
                     "Scan parquet spark_catalog.default.bide_"],
        "not_contains": ["Window", "CartesianProduct", "BatchEvalPython"],
        "max_exchanges": 2,
    },
    # incremental curation probe (r13): the scrub/dedup stages ran
    # eagerly behind checkpoints (the dedup's BroadcastHashJoin LeftAnti
    # lives before the gate checkpoint, outside this audited segment);
    # the audited scoring plan reads every model artifact from the
    # catalog store via broadcast (weights, lambda grid, totals, prior,
    # tails), never re-reads any corpus table, and carries only the
    # NB-bucket agg, the DSIR-bucket agg, and the per-source pack window
    "corpus_curation_incremental": {
        "contains": ["BroadcastHashJoin",
                     "Scan parquet spark_catalog.default.cur_"],
        "not_contains": ["CartesianProduct", "BatchEvalPython",
                         "SortMergeJoin", "documents.parquet"],
        "max_exchanges": 3,
    },
    # stored cluster labels (r13): the component report reads the
    # bucketed catalog label table (the merge/rewrite ran eagerly at
    # store time) — one groupBy(label) shuffle over the store scan,
    # nothing re-derives pairs or edges in the audited plan
    "dedup_cc_stored": {
        "contains": ["Scan parquet spark_catalog.default.ccl_"],
        "not_contains": ["CartesianProduct", "BatchEvalPython",
                         "BroadcastNestedLoopJoin"],
        "max_exchanges": 1,
    },
    # CC-store erasure (r13): the affected-component re-cluster and the
    # bucketed rewrite ran eagerly at store time; the audited report
    # keeps dedup_cc_stored's one-shuffle contract over the eroded store
    "dedup_cc_stored_erase": {
        "contains": ["Scan parquet spark_catalog.default.ccle_"],
        "not_contains": ["CartesianProduct", "BatchEvalPython",
                         "BroadcastNestedLoopJoin"],
        "max_exchanges": 1,
    },
    # CC-store compaction (r13): post-compaction report = the same
    # one-shuffle store-scan plan (compaction invisible to the planner)
    "dedup_cc_stored_compact": {
        "contains": ["Scan parquet spark_catalog.default.ccl_"],
        "not_contains": ["CartesianProduct", "BatchEvalPython",
                         "BroadcastNestedLoopJoin"],
        "max_exchanges": 1,
    },
    # erase-then-APPLY-then-probe (r13): post-rewrite probe keeps the
    # warm-probe contract; the truncated vector still anti-joins
    "dedup_stored_apply_erase": {
        "contains": ["SortAggregate", "LeftAnti", "BroadcastHashJoin",
                     "Scan parquet spark_catalog.default.bidea_"],
        "not_contains": ["Window", "CartesianProduct", "BatchEvalPython"],
        "max_exchanges": 2,
    },
    # compact-then-probe (r12): after both band-store tables are
    # rewritten in place, the probe plan must be THE SAME warm-probe
    # plan — compaction invisible to the planner (byte-stability
    # additionally pinned in test_round12_ops)
    "dedup_stored_compact": {
        "contains": ["SortAggregate", "Scan parquet spark_catalog.default.bidx_"],
        "not_contains": ["Window", "CartesianProduct", "BatchEvalPython"],
        "max_exchanges": 2,
    },
    # warm-store probe (the per-ingest-batch marginal cost): same probe
    # contract as dedup_incremental_stored, but NOTHING in the plan may
    # re-derive the corpus — only the batch filter + the catalog store
    "dedup_stored_probe_only": {
        "contains": ["SortAggregate", "Scan parquet spark_catalog.default.bidx_"],
        "not_contains": ["Window", "CartesianProduct", "BatchEvalPython"],
        # tightened r10: signed-batch checkpoint collapses the three
        # signature stages to one; best-verdict join broadcasts
        "max_exchanges": 2,
    },
    # compact-then-probe (r12): the post-compaction probe plan must be
    # THE SAME warm-probe plan — DPP against the same cell partitions
    # (byte-stability additionally pinned in test_round12_ops)
    "ann_ivf_compact": {
        "contains": ["dynamicpruning", "BroadcastHashJoin", "WindowGroupLimit",
                     "Scan parquet spark_catalog.default.ivf_"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 3,
    },
    # append-then-probe: identical probe contract to ann_ivf_stored —
    # dynamic partition pruning against the (appended) cell partitions
    "ann_ivf_append": {
        "contains": ["dynamicpruning", "BroadcastHashJoin", "WindowGroupLimit",
                     "Scan parquet spark_catalog.default.ivf_"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 3,
    },
    # cell-balance audit: one partial+final count over the store's
    # (vec_id, cell) columns + a grand-total window over ncells rows;
    # ReadSchema must NOT drag the vector column through the agg
    "ivf_cell_balance_audit": {
        "contains": ["HashAggregate", "Window",
                     "Scan parquet spark_catalog.default.ivf_"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 2,
    },
    # sketch set-ops: the |types|-row sketch and count relations are
    # materialized once (localCheckpoint) and every pair-stage join
    # broadcasts — the only live shuffle is the exact-intersection
    # self-grading agg, which production drops
    "kmv_audience_overlap": {
        "contains": ["BroadcastHashJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 2,
    },
    # JL projection: zero shuffles end to end — per-row fold projection,
    # sampled pair check via broadcast; hygiene gate pushed to the scan
    "embedding_jl_projection": {
        "contains": ["BroadcastNestedLoopJoin", "PushedFilters: [Is"],
        "not_contains": ["SortMergeJoin", "CartesianProduct", "BatchEvalPython"],
        "max_exchanges": 0,
    },
    # hard-negative mining: queries broadcast (corpus never shuffles for
    # the join), per-query top-k pruned pre-shuffle; the positives
    # branch re-shuffles only scored candidate rows
    "ann_hard_negatives": {
        "contains": ["BroadcastNestedLoopJoin", "WindowGroupLimit"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 2,
    },
    # count-min sketch: one hash agg into depth×width counters
    # (materialized once — 4 probe joins must read it, not re-derive
    # it), probes broadcast, exact top-k via TakeOrderedAndProject
    "events_countmin_heavy_hitters": {
        "contains": ["BroadcastHashJoin", "TakeOrderedAndProject"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 2,
    },
    # stored IVF probe: the assignments store is partitioned by cell and
    # the probe joins on the partition column against a broadcast probe
    # list — Catalyst MUST insert a dynamic-partition-pruning filter
    # (each query scans ~nprobe/ncells of the store's files), and the
    # per-query top-k prunes pre-shuffle
    "ann_ivf_stored": {
        "contains": ["dynamicpruning", "BroadcastHashJoin", "WindowGroupLimit", "Scan parquet"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 3,
    },
    # warm-store probe: identical probe contract to ann_ivf_stored — the
    # marginal per-query cost must keep the DPP cell pruning and the
    # pre-shuffle per-query top-k
    "ann_ivf_probe_only": {
        "contains": ["dynamicpruning", "BroadcastHashJoin", "WindowGroupLimit", "Scan parquet"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 3,
    },
    # erase-then-probe (r12): merge-on-read over the eroded IVF store —
    # the tombstone deletion vector reaches the assignments scan as a
    # BroadcastHashJoin LeftAnti; DPP cell pruning and the pre-shuffle
    # per-query top-k keep the warm-probe contract
    "ann_ivf_erase": {
        "contains": ["dynamicpruning", "LeftAnti", "BroadcastHashJoin",
                     "WindowGroupLimit", "Scan parquet"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 3,
    },
    # erase-then-APPLY-then-probe (r13): post-rewrite probe keeps the
    # DPP warm-probe contract; the truncated vector still anti-joins
    "ann_ivf_apply_erase": {
        "contains": ["dynamicpruning", "LeftAnti", "BroadcastHashJoin",
                     "WindowGroupLimit", "Scan parquet"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 3,
    },
    # quantile sketch: the production path is the ~bins-row histogram
    # agg + tiny cumulative window; the per-value exact branch (its own
    # agg + window) is self-grading only — all joins broadcast
    "lineitem_price_quantile_sketch": {
        "contains": ["BroadcastHashJoin", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 6,
    },
    # z-order audit: the two global sorts ARE the modeled layout job
    # (range-partition by z on a cluster); the span agg is partial+final
    # over file-count rows
    "events_zorder_stats": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 3,
    },
    # substring-span dedup: anchor-frequency agg (partial+final on
    # md5-uniform fps), fan-out-1 join back (broadcast at audit SF), one
    # doc-keyed window; the island agg reuses the window's partitioning
    # (doc_id subset) — no extra exchange between Window and the span
    # HashAggregate. The two RoundRobin spreads are local-fixture no-ops
    # on a pre-split cluster scan.
    "dedup_exact_substring_spans": {
        "contains": ["HashAggregate", "Window", "BroadcastHashJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 5,
    },
    # span-redacted rewrite: same anchor/island pipeline + a per-doc
    # left join whose probe side is the doc scan — the rewrite itself is
    # a zero-shuffle array projection
    "doc_exact_substring_rewrite": {
        "contains": ["HashAggregate", "Window", "BroadcastHashJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 5,
    },
    # span-cluster leaderboard: same anchor/island pipeline, then one
    # md5-uniform cluster agg — nothing pairwise (7 = 2 local-fixture
    # spreads + anchor agg + island window + span join + the two-phase
    # distinct-doc count)
    "substring_span_clusters": {
        "contains": ["HashAggregate", "Window", "BroadcastHashJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 7,
    },
    # OOV curve: one corpus-scale token agg; every window runs over
    # vocabulary cardinality; the 7-row size grid broadcasts (BNLJ —
    # the least() join key spans both sides, and the build side is the
    # literal grid, never the vocab)
    "vocab_oov_curve": {
        "contains": ["HashAggregate", "Window", "BroadcastNestedLoopJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 2,
    },
    # threshold sweep: ONE corpus scan (totals are a window over the
    # bounded score histogram, never a second aggregation branch); the
    # grid attaches via broadcast nested-loop over histogram-sized input
    "quality_threshold_sweep": {
        "contains": ["HashAggregate", "Window", "BroadcastNestedLoopJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 3,
    },
    # PII report: chained regexp projections + ONE partial+final agg to
    # sources-rows; a future regex "improvement" must not smuggle in a
    # Python UDF (the whole point is JVM-side regexp_* at 100 TB)
    "pii_detection_report": {
        "contains": ["HashAggregate"],
        "not_contains": ["CartesianProduct", "Join", "BatchEvalPython"],
        "max_exchanges": 1,
    },
    # PII rewrite: pure zero-shuffle projection — three staged
    # regexp_replace passes over the scan, nothing else
    "pii_redacted_docs": {
        "contains": ["Project", "Scan parquet"],
        "not_contains": ["Exchange", "Join", "HashAggregate", "BatchEvalPython"],
        "max_exchanges": 0,
    },
    # script histogram: every class count is regexp_replace+length inside
    # one codegen'd projection — zero shuffles, no UDF, ever
    "doc_script_profile": {
        "contains": ["Project", "Scan parquet"],
        "not_contains": ["Exchange", "Join", "HashAggregate", "BatchEvalPython"],
        "max_exchanges": 0,
    },
    # linear scorer: two md5 calls per token in a zero-shuffle projection;
    # a trained-weights swap-in must stay a projection/broadcast, not a UDF
    "doc_quality_linear_score": {
        "contains": ["Project", "Scan parquet"],
        "not_contains": ["Exchange", "Join", "HashAggregate", "BatchEvalPython"],
        "max_exchanges": 0,
    },
    # decontamination: gram explode -> eval-side distinct -> ONE
    # fan-out-1 equi-join -> per-doc agg -> left join back; no pair
    # explosion (the gram join key is the distinct eval set). The
    # tokenize+explode+md5 gram stage is localCheckpoint'd (it feeds both
    # the eval-distinct and the train join), so the visible plan reads
    # the checkpointed RDD instead of a Generate node.
    "eval_gram_decontamination": {
        "contains": ["Scan ExistingRDD", "HashAggregate"],
        "not_contains": ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython"],
        "max_exchanges": 6,
    },
    # threshold curve: verified pair relation x broadcast 7-row grid,
    # endpoint explode, ONE grid-grain agg (the countDistinct expands it
    # to two passes); never a corpus scan
    "neardup_threshold_curve": {
        "contains": ["HashAggregate", "BroadcastNestedLoopJoin"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 8,
    },
    # contrastive pairs: both modality gates are scan filters BEFORE the
    # single-key id equi-join; no vector arrays in the output
    "multimodal_text_embedding_pairs": {
        "contains": ["Join", "PushedFilters: [Is"],
        "not_contains": ["CartesianProduct", "BatchEvalPython", "Generate"],
        "max_exchanges": 3,
    },
    # IVF range search: same probe plumbing as ann_ivf_topk (broadcast
    # centroids + probes, cell equi-join), radius filter before the one
    # count-window shuffle; never a corpus-wide pair scan
    "ann_ivf_range_search": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 3,
    },
    # behavioral-sequence export: ONE user_id shuffle serves both window
    # passes and the final per-user agg; the rn<=cap prune bounds every
    # collected list before array builds
    "user_event_sequences": {
        "contains": ["Window", "HashAggregate"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 1,
    },
    # erasure audit: every leg is a broadcast LEFT SEMI on the fact side
    # (facts never shuffle for the cohort), single-row aggs unioned; the
    # only Exchanges feed the four single-row final aggregates
    "user_erasure_audit": {
        "contains": ["BroadcastHashJoin", "LeftSemi"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 9,
    },
    # cosine range search: queries broadcast against the corpus scan
    # (inequality join -> BNLJ over a broadcast the size of N_QUERIES),
    # radius filter BEFORE the one per-query count-window shuffle
    "ann_range_search": {
        "contains": ["BroadcastNestedLoopJoin", "Window"],
        "not_contains": ["CartesianProduct", "SortMergeJoin", "BatchEvalPython"],
        "max_exchanges": 1,
    },
}

_EXCHANGE = re.compile(r"^\s*(?::|\+)?-?\s*\+?-?\s*Exchange\b", re.MULTILINE)


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def count_shuffles(plan: str) -> int:
    tree = plan.split("\n\n")[0]
    return len([ln for ln in tree.splitlines() if re.search(r"\bExchange\b", ln) and "BroadcastExchange" not in ln])


def main() -> int:
    import os

    # EXPLAINing the stored-index queries triggers real store builds
    # (the bucketed catalog tables must exist to plan against). Build
    # them in an audit-private namespace so a concurrent gate/bench on
    # the shared per-fixture stores never contends with the audit
    # (VERDICT r8 #8: the audit used to trip the storelock).
    os.environ.setdefault("SPARK_GRAFT_STORE_NS", "audit")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-audit")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    failures = []
    for name, rules in sorted(EXPECTATIONS.items()):
        plan = formatted_plan(qs[name](spark, SF_DIR))
        tree = plan.split("\n\n")[0]
        problems = []
        for frag in rules.get("contains", ()):
            if frag not in plan:
                problems.append(f"missing {frag!r}")
        for frag in rules.get("not_contains", ()):
            if frag in tree:
                problems.append(f"forbidden {frag!r} present")
        n = count_shuffles(plan)
        if "max_exchanges" in rules and n > rules["max_exchanges"]:
            problems.append(f"{n} shuffle exchanges > max {rules['max_exchanges']}")
        if problems:
            failures.append(name)
            print(f"[BAD]  {name}: {'; '.join(problems)}")
            print(tree)
        else:
            print(f"[OK]   {name} ({n} shuffle{'s' if n != 1 else ''})")

    print(f"\n{len(failures)} plan violations" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
