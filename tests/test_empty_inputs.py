"""Empty-input robustness: at 100 TB, empty partitions, empty date
ranges, and freshly-created tables are routine — a representative query
from every operator family must plan and execute against zero-row inputs
without raising, returning an empty (or well-defined aggregate) result."""

from __future__ import annotations

import os
import tempfile

import pytest

from e_commerce_click_stream_spark.io import TABLES, table
from e_commerce_click_stream_spark.plans.registry import all_specs
from tests.conftest import SF_SMOKE

# one per family: TPC-H join/agg, sessionization, windowed agg, exact +
# LSH dedup, ANN, iterative (kmeans / pagerank / components), text,
# sampling, EWMA window, mix plan, multimodal, streaming replay
REPRESENTATIVE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "session_metrics",
    "hourly_metrics",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_hamming",
    "ann_cosine_topk",
    "embedding_kmeans_iter",
    "dedup_connected_components",
    "doc_quality_scores",
    "quality_weighted_sample",
    "corpus_mix_plan",
    "user_value_ewma",
    "multimodal_decode_meta",
    "streaming_hourly_metrics",
    # round-5 families: passage rewrite, bloom runtime filter, IVM,
    # hashing-trick features, covariance grid, BPE stats, salted join,
    # histogram, session paths
    "doc_passage_dedup",
    "bloom_prefiltered_antijoin",
    "hourly_metrics_incremental",
    "doc_hashed_tf_vectors",
    "embedding_covariance",
    "bpe_merge_pairs",
    "skew_salted_fact_join",
    "order_value_histogram",
    "session_event_paths",
    "dedup_semantic_cells",
    "doc_length_percentile_filter",
    "embedding_pca_power",
    # late-round-5 families: bigram LM, RAG chunking, SCD2 collapse,
    # shard manifest, incremental dedup
    "doc_bigram_nll",
    "doc_rag_chunks",
    "customer_scd2_history",
    "training_shard_manifest",
    "dedup_incremental_minhash",
    "events_kmv_distinct",
    "weighted_reservoir_sample",
    "ab_test_readout",
    "graph_triangle_count",
    "embedding_quality_gate",
    "corpus_snapshot_diff",
    # round-7 families: stored band index, KMV set ops, Count-Min,
    # quantile sketch, JL projection, hard negatives, z-order layout,
    # stored IVF probe, streaming sketch/EWMA merges, drift monitor
    "dedup_incremental_stored",
    "kmv_audience_overlap",
    "events_countmin_heavy_hitters",
    "lineitem_price_quantile_sketch",
    "embedding_jl_projection",
    "ann_hard_negatives",
    "events_zorder_stats",
    "ann_ivf_stored",
    "streaming_kmv_distinct",
    "streaming_user_ewma",
    "corpus_quality_drift",
    "embedding_coreset_kcenter",
    # round-8/9 families: PII scrub, IVF maintenance, warm-store probes,
    # substring-span dedup, calibration curves
    "pii_detection_report",
    "ann_ivf_append",
    "ann_ivf_probe_only",
    "ivf_cell_balance_audit",
    "dedup_stored_probe_only",
    "dedup_exact_substring_spans",
    "doc_exact_substring_rewrite",
    "substring_span_clusters",
    "vocab_oov_curve",
    "quality_threshold_sweep",
    # round-10 families: lexical retrieval + hybrid fusion, unigram-LM
    # tokenizer train/apply, real-engine watermark audit
    "bm25_topk_retrieval",
    "bm25_vs_ann_overlap",
    "hybrid_rrf_fusion",
    "unigram_lm_train",
    "unigram_lm_segment_docs",
    "streaming_late_data_audit",
    # round-11 families: line-boilerplate rewrite, stored BM25
    # probe/append, second EM round, DSIR selection
    "doc_line_boilerplate_scrub",
    "bm25_stored_probe_only",
    "bm25_stored_append",
    "unigram_lm_train_round2",
    "dsir_importance_weights",
    # round-12 families: trained NB classifier + confusion readout,
    # composed curation pipeline, alpha-power mix sweep, store
    # compaction (postings + IVF assignments)
    "quality_nb_classifier",
    "quality_nb_confusion",
    "quality_nb_probe_only",
    "corpus_curation_run",
    "corpus_mix_temperature_sweep",
    "bm25_stored_compact",
    "ann_ivf_compact",
    "dedup_stored_compact",
    "bm25_stored_erase",
    "eval_semantic_decontamination",
    "doc_kn_bigram_nll",
    "dedup_stored_erase",
    "ann_ivf_erase",
    "wordpiece_train_merges",
    "wordpiece_segment_docs",
    "corpus_mix_sampled_manifest",
    "dedup_cc_incremental",
    "quality_nb_roc_curve",
    # round-13 families: driver-gated physical erasure apply
    "bm25_stored_apply_erase",
    "dedup_stored_apply_erase",
    "ann_ivf_apply_erase",
    "dedup_cc_stored",
    "dedup_cc_stored_erase",
    "dedup_cc_stored_compact",
    "corpus_curation_incremental",
    "streaming_curation_ingest",
)

# readout queries that emit a FIXED number of rows regardless of input
# (corpus_curation_run always reports its six stages; on empty inputs
# every stage must read 0 docs / 0 tokens)
_FIXED_READOUT_ROWS = {"corpus_curation_run": 6}


@pytest.fixture(scope="module")
def empty_sf_dir(spark):
    """A fixture directory with every table present but zero rows, with
    the exact production schemas (written via limit(0) round-trips)."""
    out = tempfile.mkdtemp(prefix="sf_empty_")
    for name in TABLES:
        table(spark, SF_SMOKE, name).limit(0).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    return out


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_survives_empty_inputs(spark, empty_sf_dir, name):
    df = all_specs()[name].builder(spark, empty_sf_dir)
    assert df.columns
    # EXECUTE, don't just plan: runtime-only failures (ANSI
    # divide-by-zero in an aggregate over zero rows, a window over an
    # empty frame) never surface at plan time
    rows = df.collect()
    if name in _FIXED_READOUT_ROWS:
        assert len(rows) == _FIXED_READOUT_ROWS[name]
        assert all(r["n_docs"] == 0 and r["n_tokens"] == 0 for r in rows)
        return
    # global aggregates legitimately return a single all-NULL/zero row;
    # everything else must be empty
    assert len(rows) <= 1
    assert df.count() >= 0
