"""Round-16 optimization pins: the doc_id non-null invariant behind the
LINE_DF_DOCS==2 min/max rewrite (VERDICT r15 #5/#8), the unrolled
activity-similarity dot's bit-identity to the HOF fold it replaced, and
the bucket-aligned + overlapped BM25 store writes' file-count bound."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


def test_doc_id_nonnull_invariant():
    """The min/max ≡ countDistinct rewrite in the line-scrub df agg
    (plans/text.py, LINE_DF_DOCS == 2 branch) treats NULL doc_ids
    differently from countDistinct in mixed groups — it is exact only
    because doc_id is the corpus primary key and never NULL. Pin that
    on every fixture so a datagen change fails here, not as a silent
    value drift."""
    import duckdb

    con = duckdb.connect()
    for sf_dir in SF_DIRS:
        path = os.path.join(sf_dir, "documents.parquet")
        if not os.path.exists(path):  # pragma: no cover - trimmed fixture set
            continue
        (nulls,) = con.execute(
            f"SELECT count(*) FROM '{path}' WHERE doc_id IS NULL"
        ).fetchone()
        assert nulls == 0, f"NULL doc_id in {path}"
    con.close()


def test_unrolled_pair_dot_matches_hof_fold(spark):
    """user_activity_similarity's pair dot was rewritten from
    aggregate(zip_with(...)) (CodegenFallback, allocates per pair) to an
    unrolled 24-term sum. Same left-to-right addition order and
    non-negative terms ⇒ bit-identical doubles — pin exact equality on
    adversarial values (denormals, huge/tiny magnitude mixes) so a
    future reordering fails loudly."""
    rows = [
        ([float(i) / 7.0 for i in range(24)], [float(24 - i) / 11.0 for i in range(24)]),
        ([1e-300] * 24, [1e300] * 24),
        ([0.1] * 24, [0.3] * 24),
        ([1e16, 1.0] + [0.0] * 22, [1.0, 1.0] + [0.0] * 22),
        ([5e-324] * 24, [1.0] * 24),
    ]
    df = spark.createDataFrame(rows, "pa array<double>, pb array<double>")
    hof = F.aggregate(
        F.zip_with(F.col("pa"), F.col("pb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    unrolled = F.expr(" + ".join(f"pa[{h}]*pb[{h}]" for h in range(24)))
    bad = df.select(hof.alias("a"), unrolled.alias("b")).where(
        # exact bit comparison, NaN-safe
        ~F.col("a").eqNullSafe(F.col("b"))
    )
    assert bad.count() == 0


def test_bm25_store_build_file_counts_bounded(spark, tmp_path):
    """build_postings_index bucket-aligns its keyed writes: each of the
    postings/terms tables must land exactly num_buckets data files (one
    per bucket), not tasks x buckets — the r16 small-files fix. Also
    proves the three concurrent table writes all committed."""
    from e_commerce_click_stream_spark.operators.bm25_index import (
        NUM_POSTING_BUCKETS,
        build_postings_index,
        postings_table_names,
    )

    docs = spark.createDataFrame(
        [(i, [f"tok{j}" for j in range(i % 40 + 1)]) for i in range(200)],
        "doc_id bigint, ts array<string>",
    ).repartition(8)  # multiple upstream tasks: unaligned would fan out
    prefix = "t16bm25"
    loc = str(tmp_path / "store")
    post_t, terms_t, scal_t = postings_table_names(prefix)
    try:
        build_postings_index(docs, prefix, location=loc)
        for sub in ("postings", "terms"):
            files = [
                f
                for f in glob.glob(os.path.join(loc, sub, "*"))
                if os.path.basename(f).startswith("part-")
            ]
            # one file per NON-EMPTY bucket: never more than the bucket
            # count (the unaligned write fanned out tasks x buckets)
            assert 1 <= len(files) <= NUM_POSTING_BUCKETS, (sub, files)
        # all three tables committed and are readable
        assert spark.table(post_t).count() > 0
        assert spark.table(terms_t).count() > 0
        assert spark.table(scal_t).count() == 1
    finally:
        for t in (post_t, terms_t, scal_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
