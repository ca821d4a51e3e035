"""Stored-band-index incremental dedup (operators/dedup_index.py).

Pins the contract the module's docstring promises: build→probe over a
persisted parquet index produces bit-identical verdicts to the one-pass
``dedup_incremental_minhash`` query, the stored layout is the documented
(bands/ partitioned-by-band + shingles/) shape, and ``append_to_band_index``
folds a batch into the store so the NEXT batch dedups against it."""

from __future__ import annotations

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from e_commerce_click_stream_spark.io import table
from e_commerce_click_stream_spark.operators.dedup_index import (
    BANDS_SUBDIR,
    SHINGLES_SUBDIR,
    append_to_band_index,
    build_band_index,
    probe_band_index,
)
from e_commerce_click_stream_spark.operators.textops import shingles, tokens
from e_commerce_click_stream_spark.plans.dedup import (
    JACCARD_THRESHOLD,
    NEW_SRC_MIN,
    NUM_BANDS,
    NUM_HASHES,
    dedup_incremental_minhash,
    dedup_incremental_stored,
)
from tests.conftest import SF_SMOKE


def _rows(df):
    return Counter(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def shingled(spark):
    is_new = F.coalesce(
        F.expr("substring(source, 4)").try_cast("int") >= NEW_SRC_MIN, F.lit(False)
    )
    docs = table(spark, SF_SMOKE, "documents").select(
        "doc_id", is_new.alias("is_new"), tokens().alias("toks")
    )
    return docs.select(
        "doc_id", "is_new", shingles("toks", 3).alias("s")
    ).localCheckpoint(eager=True)


def test_stored_probe_matches_one_pass(spark, shingled, tmp_path):
    index_dir = str(tmp_path / "idx")
    build_band_index(
        shingled.filter(~F.col("is_new")).select("doc_id", "s"),
        index_dir, NUM_HASHES, NUM_BANDS,
    )
    batch_ids = shingled.filter("is_new").select("doc_id")
    got = probe_band_index(
        spark,
        shingled.filter("is_new").select("doc_id", "s"),
        batch_ids,
        index_dir,
        NUM_HASHES,
        NUM_BANDS,
        JACCARD_THRESHOLD,
    )
    want = dedup_incremental_minhash(spark, SF_SMOKE)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_registered_stored_query_matches_one_pass(spark):
    got = dedup_incremental_stored(spark, SF_SMOKE)
    want = dedup_incremental_minhash(spark, SF_SMOKE)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_index_layout_is_band_partitioned(spark, shingled, tmp_path):
    index_dir = str(tmp_path / "idx")
    build_band_index(
        shingled.filter(~F.col("is_new")).select("doc_id", "s"),
        index_dir, NUM_HASHES, NUM_BANDS,
    )
    band_dirs = sorted(
        d for d in os.listdir(os.path.join(index_dir, BANDS_SUBDIR))
        if d.startswith("band=")
    )
    assert band_dirs == [f"band={b}" for b in range(NUM_BANDS)]
    # a single-band probe prunes to one partition directory
    one = spark.read.parquet(os.path.join(index_dir, BANDS_SUBDIR)).filter("band = 2")
    n_all = spark.read.parquet(os.path.join(index_dir, BANDS_SUBDIR)).count()
    assert one.count() * NUM_BANDS == n_all  # every doc contributes one row per band
    sh = spark.read.parquet(os.path.join(index_dir, SHINGLES_SUBDIR))
    assert set(sh.columns) == {"doc_id", "s"}


def test_append_then_probe_sees_new_index_docs(spark, shingled, tmp_path):
    """Fold half the batch into the store; the other half must now get
    dup_of_index verdicts where it previously matched those docs in-batch."""
    index_dir = str(tmp_path / "idx")
    build_band_index(
        shingled.filter(~F.col("is_new")).select("doc_id", "s"),
        index_dir, NUM_HASHES, NUM_BANDS,
    )
    batch = shingled.filter("is_new").select("doc_id", "s").localCheckpoint(eager=True)
    med = batch.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    first_half = batch.filter(F.col("doc_id") <= med)
    second_half = batch.filter(F.col("doc_id") > med)

    append_to_band_index(first_half, index_dir, NUM_HASHES, NUM_BANDS)
    got = probe_band_index(
        spark,
        second_half,
        second_half.select("doc_id"),
        index_dir,
        NUM_HASHES,
        NUM_BANDS,
        JACCARD_THRESHOLD,
    ).localCheckpoint(eager=True)

    # every second-half doc still gets exactly one verdict row
    assert got.count() == second_half.count()
    # verdicts referencing a first-half doc are now dup_of_index, never
    # dup_in_batch (those ids live in the store after the append)
    wrong = got.join(
        first_half.select(F.col("doc_id").alias("match_doc_id")), "match_doc_id"
    ).filter("verdict = 'dup_in_batch'")
    assert wrong.count() == 0


def test_table_store_probe_matches_parquet_store(spark, shingled, tmp_path):
    """The bucketed catalog-table layout and the plain-parquet fallback
    are the same index: identical probe verdicts."""
    from e_commerce_click_stream_spark.operators.dedup_index import (
        band_table_names,
        build_band_index_tables,
        probe_band_index_tables,
    )

    index_dir = str(tmp_path / "idx")
    idx_docs = shingled.filter(~F.col("is_new")).select("doc_id", "s")
    build_band_index(idx_docs, index_dir, NUM_HASHES, NUM_BANDS)
    prefix = "t_parity_store"
    build_band_index_tables(
        idx_docs, prefix, NUM_HASHES, NUM_BANDS, location=str(tmp_path / "tidx")
    )
    try:
        batch = shingled.filter("is_new").select("doc_id", "s").localCheckpoint(eager=True)
        via_parquet = probe_band_index(
            spark, batch, batch.select("doc_id"), index_dir,
            NUM_HASHES, NUM_BANDS, JACCARD_THRESHOLD,
        )
        via_tables = probe_band_index_tables(
            spark, batch, batch.select("doc_id"), prefix,
            NUM_HASHES, NUM_BANDS, JACCARD_THRESHOLD,
        )
        assert via_tables.columns == via_parquet.columns
        assert _rows(via_tables) == _rows(via_parquet)
    finally:
        for t in band_table_names(prefix):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_table_store_append_matches_scratch_build(spark, shingled, tmp_path):
    """append_to_band_index_tables folds a batch into the bucketed store;
    probing it must equal probing a from-scratch build over the union."""
    from e_commerce_click_stream_spark.operators.dedup_index import (
        append_to_band_index_tables,
        band_table_names,
        build_band_index_tables,
        probe_band_index_tables,
    )

    idx_docs = shingled.filter(~F.col("is_new")).select("doc_id", "s")
    batch = shingled.filter("is_new").select("doc_id", "s").localCheckpoint(eager=True)
    med = batch.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    first_half = batch.filter(F.col("doc_id") <= med)
    second_half = batch.filter(F.col("doc_id") > med).localCheckpoint(eager=True)

    appended, scratch = "t_app_store", "t_scr_store"
    build_band_index_tables(
        idx_docs, appended, NUM_HASHES, NUM_BANDS, location=str(tmp_path / "app")
    )
    append_to_band_index_tables(first_half, appended, NUM_HASHES, NUM_BANDS)
    build_band_index_tables(
        idx_docs.unionByName(first_half), scratch, NUM_HASHES, NUM_BANDS,
        location=str(tmp_path / "scr"),
    )
    try:
        probes = [
            probe_band_index_tables(
                spark, second_half, second_half.select("doc_id"), p,
                NUM_HASHES, NUM_BANDS, JACCARD_THRESHOLD,
            )
            for p in (appended, scratch)
        ]
        assert _rows(probes[0]) == _rows(probes[1])
    finally:
        for p in (appended, scratch):
            for t in band_table_names(p):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_replayed_batch_never_self_matches(spark, shingled, tmp_path):
    """At-least-once replay safety: probing a batch already folded into the
    store must not report a doc as dup_of_index OF ITSELF at jaccard 1.0 —
    the probe-side join excludes equal doc_ids by construction."""
    index_dir = str(tmp_path / "idx")
    build_band_index(
        shingled.filter(~F.col("is_new")).select("doc_id", "s"),
        index_dir, NUM_HASHES, NUM_BANDS,
    )
    batch = shingled.filter("is_new").select("doc_id", "s").localCheckpoint(eager=True)
    baseline = probe_band_index(
        spark, batch, batch.select("doc_id"), index_dir,
        NUM_HASHES, NUM_BANDS, JACCARD_THRESHOLD,
    ).localCheckpoint(eager=True)

    # simulate the retry: the batch was appended, then the probe re-runs
    append_to_band_index(batch, index_dir, NUM_HASHES, NUM_BANDS)
    replay = probe_band_index(
        spark, batch, batch.select("doc_id"), index_dir,
        NUM_HASHES, NUM_BANDS, JACCARD_THRESHOLD,
    ).localCheckpoint(eager=True)

    assert replay.filter("doc_id = match_doc_id").count() == 0
    # a doc that had a match keeps one at least as good — the store now
    # also holds the replayed batch, which can only ADD candidates (e.g.
    # the reverse of an in-batch pair, visible store-side regardless of id
    # order), never remove the baseline's best match
    had = baseline.filter("match_doc_id IS NOT NULL").select(
        "doc_id", F.col("jaccard").alias("base_j")
    )
    worse = had.join(replay, "doc_id").filter(
        "match_doc_id IS NULL OR jaccard < base_j"
    )
    assert worse.count() == 0
