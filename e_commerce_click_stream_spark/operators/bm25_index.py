"""Persisted BM25 postings index: build once, probe per retrieval batch.

``bm25_topk_retrieval`` (plans/text.py) proves the scoring semantics but
tokenizes and aggregates the WHOLE corpus on every run. The production
100 TB shape indexes the corpus once and pays only lookup work per
retrieval — the same build/probe split the MinHash band index
(operators/dedup_index.py) and the stored IVF index established:

- **build** (``build_postings_index``): tokenize the corpus once into
  three catalog tables. ``<prefix>_postings`` (doc_id, tok, tf, dl) is
  hash-bucketed AND sorted on ``tok`` — exactly the probe join key;
  ``<prefix>_terms`` (tok, df) carries document frequency in the same
  bucket layout so term statistics join postings bucket-locally; the
  1-row ``<prefix>_scalars`` (n_docs, total_len) holds the corpus
  aggregates every score needs. All three derive from ONE tokenize+agg
  pass (df and the scalars fold out of the postings relation, never a
  second corpus scan — the ``_bm25_scored`` discipline).
- **probe** (``probe_postings_index``): score the query-by-example set
  purely FROM the store. The query docs' own term rows are a
  filter-pushdown read of the postings table (doc_id < n_queries reaches
  the parquet scan); their rarest-df terms come from a bucket-local
  postings⋈terms join (NO Exchange on either side — both tables share
  the tok bucket spec); the tiny selected-terms relation then broadcasts
  into the postings scan, so the corpus-sized side of candidate scoring
  never shuffles. Contributions are micro-rounded to BIGINT exactly as
  the one-pass query — verdicts are bit-identical, pinned by the shared
  DuckDB oracle on the registered ``bm25_stored_probe_only`` query.
- **append** (``append_to_postings_index``): fold a new-document batch
  in. Postings rows of new doc_ids are disjoint — blind bucket-layout
  append; df and the corpus scalars are MERGEABLE counts (sum by tok
  resp. 1-row add), re-written after an eager checkpoint of the merged
  relations (the store is both input and output of the merge). After an
  append the store is indistinguishable from a full rebuild — the
  registered ``bm25_stored_append`` query proves it against the
  full-corpus oracle.

Concurrent-writer safety: callers take the same flock discipline as the
band store (operators/storelock.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

POSTINGS_SUBDIR = "postings"
TERMS_SUBDIR = "terms"
SCALARS_SUBDIR = "scalars"
# bucket count shared by postings and terms so their join is bucket-local
NUM_POSTING_BUCKETS = 8


def postings_table_names(prefix: str) -> tuple[str, str, str]:
    return f"{prefix}_postings", f"{prefix}_terms", f"{prefix}_scalars"


def corpus_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, ts array<string> non-empty tokens) -> postings
    (doc_id, tok, tf, dl). dl is computed BEFORE the explode and carried
    through the tf aggregation — no post-hoc doc-length join."""
    toked = docs.filter(F.size("ts") > 0).select(
        "doc_id", F.size("ts").cast("long").alias("dl"), "ts"
    )
    return (
        toked.select("doc_id", "dl", F.explode("ts").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )


def _df_and_scalars(postings: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Term df + 1-row corpus scalars, both folded out of the postings
    relation (every tokenized doc owns >= 1 posting, so the doc set and
    dl values are complete — no second corpus scan)."""
    terms = postings.groupBy("tok").agg(F.count("*").alias("df"))
    scalars = (
        postings.groupBy("doc_id")
        .agg(F.max("dl").alias("dl"))
        .agg(F.count("*").alias("n_docs"), F.sum("dl").alias("total_len"))
    )
    return terms, scalars


def build_postings_index(
    docs: DataFrame,
    prefix: str,
    num_buckets: int = NUM_POSTING_BUCKETS,
    location: str | None = None,
) -> None:
    """Write the postings store for ``docs`` (doc_id, ts): postings and
    terms bucketed+sorted on ``tok``, scalars as a plain 1-row table."""
    postings = corpus_postings(docs).localCheckpoint(eager=True)
    terms, scalars = _df_and_scalars(postings)
    post_t, terms_t, scal_t = postings_table_names(prefix)
    w = (
        postings.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, "tok")
        .sortBy("tok")
    )
    if location:
        w = w.option("path", os.path.join(location, POSTINGS_SUBDIR))
    w.saveAsTable(post_t)
    wt = (
        terms.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, "tok")
        .sortBy("tok")
    )
    if location:
        wt = wt.option("path", os.path.join(location, TERMS_SUBDIR))
    wt.saveAsTable(terms_t)
    ws = scalars.write.mode("overwrite").format("parquet")
    if location:
        ws = ws.option("path", os.path.join(location, SCALARS_SUBDIR))
    ws.saveAsTable(scal_t)


def append_to_postings_index(
    spark: SparkSession,
    new_docs: DataFrame,
    prefix: str,
    num_buckets: int = NUM_POSTING_BUCKETS,
    location: str | None = None,
) -> None:
    """Fold a batch of NEW documents (disjoint doc_ids) into the store.

    Postings append blindly in the bucket layout (new doc_ids cannot
    collide with stored rows). df and the corpus scalars are mergeable
    counts: merged = stored + batch, aggregated by tok resp. added
    row-wise. The merged relations are eagerly checkpointed BEFORE the
    overwrite — they read from the very tables they replace.

    ``location`` must match the build's: an overwrite-saveAsTable
    RECREATES the table, and without the path option the replacement
    becomes a MANAGED table whose warehouse directory outlives the
    session catalog — the next session's append then fails with
    LOCATION_ALREADY_EXISTS on that stale directory."""
    post_t, terms_t, scal_t = postings_table_names(prefix)
    batch_postings = corpus_postings(new_docs).localCheckpoint(eager=True)
    batch_terms, batch_scalars = _df_and_scalars(batch_postings)

    merged_terms = (
        spark.table(terms_t)
        .unionByName(batch_terms)
        .groupBy("tok")
        .agg(F.sum("df").alias("df"))
        .localCheckpoint(eager=True)
    )
    s_old = spark.table(scal_t)
    merged_scalars = (
        s_old.unionByName(batch_scalars)
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_len").alias("total_len"),
        )
        .localCheckpoint(eager=True)
    )
    (
        batch_postings.write.mode("append")
        .format("parquet")
        .bucketBy(num_buckets, "tok")
        .sortBy("tok")
        .saveAsTable(post_t)
    )
    wt = (
        merged_terms.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, "tok")
        .sortBy("tok")
    )
    if location:
        wt = wt.option("path", os.path.join(location, TERMS_SUBDIR))
    wt.saveAsTable(terms_t)
    ws = merged_scalars.write.mode("overwrite").format("parquet")
    if location:
        ws = ws.option("path", os.path.join(location, SCALARS_SUBDIR))
    ws.saveAsTable(scal_t)


def probe_postings_index(
    spark: SparkSession,
    prefix: str,
    n_queries: int,
    query_terms: int,
    top_k: int,
    k1: float,
    b: float,
    scale: int,
) -> DataFrame:
    """Warm-store BM25 retrieval: (query_id, doc_id, n_terms, score_micro,
    bm25, rank) for the query-by-example set doc_id < n_queries,
    bit-identical to the one-pass ``bm25_topk_retrieval``.

    Store-side shapes: the query docs' tf rows are a doc_id<n filter
    PUSHED into the postings parquet scan; query-term selection joins
    those rows to the terms table BUCKET-LOCALLY (shared tok bucket spec,
    no Exchange on either side); the <= n_queries*query_terms selected
    terms broadcast into the candidate postings scan so the corpus-sized
    relation never shuffles; scalars ride a 1-row broadcast."""
    post_t, terms_t, scal_t = postings_table_names(prefix)
    postings = spark.table(post_t)
    terms = spark.table(terms_t)
    scalars = spark.table(scal_t)

    qt = (
        postings.filter(F.col("doc_id") < n_queries)
        .select(F.col("doc_id").alias("query_id"), "tok")
        .join(terms.filter(F.col("df") >= 2), "tok")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.asc("df"), F.asc("tok"))
            ),
        )
        .filter(F.col("r") <= query_terms)
        .select("query_id", "tok", "df")
    )
    cands = (
        postings.join(F.broadcast(qt), "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .crossJoin(F.broadcast(scalars))
    )
    b1 = 1.0 - b
    k1p1 = k1 + 1.0
    idf = F.log(
        F.lit(1)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(b1) + F.lit(b) * (F.col("dl") * F.col("n_docs") / F.col("total_len"))
    )
    contrib = F.floor(
        idf * (F.col("tf") * F.lit(k1p1)) / denom * F.lit(scale) + F.lit(0.5)
    ).cast("long")
    scored = (
        cands.select("query_id", "doc_id", contrib.alias("contrib"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("contrib").alias("score_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return (
        scored.select(
            "query_id",
            "doc_id",
            "n_terms",
            "score_micro",
            F.round(F.col("score_micro") / F.lit(float(scale)), 6).alias("bm25"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= top_k)
    )
