"""Bucketed-table co-located joins: the plan-level proof that persisting
both sides hash-bucketed on the join key removes the join shuffle
entirely (and the sort, when sortBy matches) — the storage layout that
makes repeated fact-fact joins affordable at 100 TB."""

from __future__ import annotations

import pytest

from e_commerce_click_stream_spark.io import table
from e_commerce_click_stream_spark.sinks.writers import write_bucketed
from scripts.plan_audit import count_shuffles, formatted_plan
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    write_bucketed(li, "li_bucketed", ["l_orderkey"], num_buckets=8,
                   sort_cols=["l_orderkey"])
    write_bucketed(o, "o_bucketed", ["o_orderkey"], num_buckets=8,
                   sort_cols=["o_orderkey"])
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    # forbid broadcast so the join MUST satisfy its distribution
    # requirement — from bucketing, not an exchange
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table(li_name)
        o = spark.table(o_name)
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = formatted_plan(joined)
        assert count_shuffles(plan) == 0, plan.split("\n\n")[0]
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    li = spark.table(li_name)
    o = spark.table(o_name)
    bucketed_n = li.join(o, li.l_orderkey == o.o_orderkey).count()
    plain_li = table(spark, SF_SMOKE, "lineitem")
    plain_o = table(spark, SF_SMOKE, "orders")
    plain_n = plain_li.join(
        plain_o, plain_li.l_orderkey == plain_o.o_orderkey
    ).count()
    assert bucketed_n == plain_n


@pytest.fixture(scope="module")
def band_store(spark, tmp_path_factory):
    """Bucketed band-index store over the smoke corpus (the registered
    dedup_incremental_stored layout, but at a test-owned location)."""
    from pyspark.sql import functions as F

    from e_commerce_click_stream_spark.operators.dedup_index import (
        band_table_names,
        build_band_index_tables,
        sign_docs,
    )
    from e_commerce_click_stream_spark.operators.textops import shingles, tokens
    from e_commerce_click_stream_spark.plans.dedup import (
        NUM_BANDS,
        NUM_HASHES,
        is_new_source,
    )

    is_new = is_new_source()
    sh = (
        table(spark, SF_SMOKE, "documents")
        .select("doc_id", is_new.alias("is_new"), tokens().alias("toks"))
        .select("doc_id", "is_new", shingles("toks", 3).alias("s"))
        .localCheckpoint(eager=True)
    )
    prefix = "t_bandstore"
    build_band_index_tables(
        sh.filter(~F.col("is_new")).select("doc_id", "s"),
        prefix, NUM_HASHES, NUM_BANDS,
        location=str(tmp_path_factory.mktemp("band_store")),
    )
    batch_bands, _ = sign_docs(
        sh.filter("is_new").select("doc_id", "s"), NUM_HASHES, NUM_BANDS
    )
    yield prefix, batch_bands.localCheckpoint(eager=True)
    for t in band_table_names(prefix):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_band_store_probe_has_no_exchange_on_stored_side(spark, band_store):
    """VERDICT r7 #2: the stored side of the probe's candidate equi-join
    must come straight out of its bucket layout — the ONLY shuffle in the
    join is the |batch|-sized probe side, even when broadcast is off."""
    from pyspark.sql import functions as F

    prefix, batch_bands = band_store
    stored = spark.table(f"{prefix}_bands").select("doc_id", "band", "bucket")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = batch_bands.alias("p")
        m = stored.alias("m")
        cand = p.join(
            m,
            (F.col("p.bucket") == F.col("m.bucket"))
            & (F.col("m.doc_id") != F.col("p.doc_id")),
        )
        plan = formatted_plan(cand)
        assert count_shuffles(plan) == 1, plan.split("\n\n")[0]
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_band_store_shingle_scan_is_bucketed_on_doc_id(spark, band_store):
    """The shingle-verification side: joining candidates by doc_id against
    the bucketed shingle table leaves the stored scan exchange-free too."""
    prefix, batch_bands = band_store
    sh = spark.table(f"{prefix}_shingles")
    # NOT .distinct(): a pre-shuffled probe side (e.g. 32 partitions from
    # a distinct) out-partitions the 8-bucket store and Spark re-shuffles
    # the STORE to match — the production probe feeds candidate ids
    # straight in, so the store's bucket layout carries the join
    ids = batch_bands.select("doc_id")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(sh.join(ids, "doc_id"))
        assert count_shuffles(plan) == 1, plan.split("\n\n")[0]  # ids side only
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_join_scan_engages_bucketing(spark, bucketed_tables):
    # a bare scan reports "Bucketed: false (disabled by query planner)" —
    # bucketing only engages when an operator requires the distribution,
    # so assert on the JOIN plan's scans
    li_name, o_name = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table(li_name)
        o = spark.table(o_name)
        plan = formatted_plan(li.join(o, li.l_orderkey == o.o_orderkey))
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bm25_store(spark, tmp_path_factory):
    """Bucketed BM25 postings store over the smoke corpus (the registered
    bm25_stored_probe_only layout, at a test-owned location)."""
    from e_commerce_click_stream_spark.operators.bm25_index import (
        build_postings_index,
        postings_table_names,
    )
    from e_commerce_click_stream_spark.plans.text import _bm25_docs

    prefix = "t_bm25store"
    build_postings_index(
        _bm25_docs(spark, SF_SMOKE), prefix,
        location=str(tmp_path_factory.mktemp("bm25_store")),
    )
    yield prefix
    for t in postings_table_names(prefix):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bm25_postings_terms_join_is_shuffle_free(spark, bm25_store):
    """The query-term selection join (postings x terms on tok) must be
    bucket-local: both tables share the tok bucket spec, so with
    broadcast disabled the SMJ needs NO exchange on either side."""
    from pyspark.sql import functions as F

    post_t, terms_t, _ = __import__(
        "e_commerce_click_stream_spark.operators.bm25_index",
        fromlist=["postings_table_names"],
    ).postings_table_names(bm25_store)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        qtf = spark.table(post_t).filter(F.col("doc_id") < 10)
        terms = spark.table(terms_t).filter(F.col("df") >= 2)
        plan = formatted_plan(qtf.join(terms, "tok"))
        assert count_shuffles(plan) == 0, plan.split("\n\n")[0]
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bm25_probe_pushes_query_doc_filter_into_postings_scan(spark, bm25_store):
    """The query docs' own tf rows are a doc_id predicate PUSHED into the
    postings parquet scan — no corpus tokenize at probe time and no
    full-scan-then-filter."""
    from pyspark.sql import functions as F

    post_t = f"{bm25_store}_postings"
    plan = formatted_plan(spark.table(post_t).filter(F.col("doc_id") < 10))
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in plan, plan
