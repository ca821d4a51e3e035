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
- **erase** (``erase_from_postings_index``): the right-to-be-forgotten
  path — append run in reverse. Rewriting the corpus-sized postings
  table per deletion request is the one cost a 100 TB store cannot pay
  on the erasure path, so deletion is LOGICAL first: erased doc_ids
  land in a ``<prefix>_tombstones`` deletion-vector table (the
  Delta/Iceberg merge-on-read shape), while df and the corpus scalars —
  mergeable counts — are decremented exactly the way append increments
  them, from the erased docs' OWN stored postings rows (a broadcast
  semi-join read; the erased batch is never re-tokenized, the store
  already holds its postings). The probe anti-joins the broadcast
  tombstone set, so the store answers as if the docs never existed —
  the registered ``bm25_stored_erase`` query proves bit-identity
  against a rebuild on the surviving corpus. The physical rewrite is
  deferred to ``apply_erasures``: one compaction-style pass (same
  bucket spec, tombstoned rows dropped, tombstones truncated), run off
  the erasure path under the store's build lock.

Concurrent-writer safety: callers take the same flock discipline as the
band store (operators/storelock.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from e_commerce_click_stream_spark.operators.tombstones import (
    TOMBSTONES_SUBDIR,
    anti_join_tombstones,
    append_tombstones,
    reset_tombstones,
    tombstones_table_name,
    truncate_tombstones,
)

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
    terms bucketed+sorted on ``tok``, scalars as a plain 1-row table.

    The bucketed writes repartition by ``tok`` first — the Murmur3-pmod
    alignment the band/IVF stores use (operators/compaction.py): each
    writer task holds exactly one bucket's rows, so the store
    materializes ``num_buckets`` files per table instead of one per
    (upstream task, bucket). The three table jobs all hang off the ONE
    checkpointed postings relation and write disjoint tables/dirs, so
    they run from a thread pool (guide §2.6 overlap independent jobs —
    the terms/scalars jobs back-fill the postings write's tail)."""
    from e_commerce_click_stream_spark.operators.dedup_index import (
        _run_concurrently,
    )

    postings = corpus_postings(docs).localCheckpoint(eager=True)
    terms, scalars = _df_and_scalars(postings)
    post_t, terms_t, scal_t = postings_table_names(prefix)

    def _write_postings() -> None:
        w = (
            postings.repartition(num_buckets, F.col("tok"))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(num_buckets, "tok")
            .sortBy("tok")
        )
        if location:
            w = w.option("path", os.path.join(location, POSTINGS_SUBDIR))
        w.saveAsTable(post_t)

    def _write_terms() -> None:
        wt = (
            terms.repartition(num_buckets, F.col("tok"))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(num_buckets, "tok")
            .sortBy("tok")
        )
        if location:
            wt = wt.option("path", os.path.join(location, TERMS_SUBDIR))
        wt.saveAsTable(terms_t)

    def _write_scalars() -> None:
        ws = scalars.write.mode("overwrite").format("parquet")
        if location:
            ws = ws.option("path", os.path.join(location, SCALARS_SUBDIR))
        ws.saveAsTable(scal_t)

    _run_concurrently(_write_postings, _write_terms, _write_scalars)
    # a fresh build has no erasures: reset any tombstones a previous
    # generation of this store left behind (catalog AND directory, or a
    # later session's erase would resurrect stale deletion vectors —
    # operators/tombstones.py)
    reset_tombstones(docs.sparkSession, prefix, location)


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
    # all three relations are eagerly checkpointed above (the merges read
    # from the very tables the overwrites replace), so the three writes
    # are independent jobs over pinned inputs: bucket-align the keyed
    # ones and overlap them (guide §2.6, the build's discipline)
    from e_commerce_click_stream_spark.operators.dedup_index import (
        _run_concurrently,
    )

    def _append_postings() -> None:
        (
            batch_postings.repartition(num_buckets, F.col("tok"))
            .write.mode("append")
            .format("parquet")
            .bucketBy(num_buckets, "tok")
            .sortBy("tok")
            .saveAsTable(post_t)
        )

    def _write_terms() -> None:
        wt = (
            merged_terms.repartition(num_buckets, F.col("tok"))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(num_buckets, "tok")
            .sortBy("tok")
        )
        if location:
            wt = wt.option("path", os.path.join(location, TERMS_SUBDIR))
        wt.saveAsTable(terms_t)

    def _write_scalars() -> None:
        ws = merged_scalars.write.mode("overwrite").format("parquet")
        if location:
            ws = ws.option("path", os.path.join(location, SCALARS_SUBDIR))
        ws.saveAsTable(scal_t)

    _run_concurrently(_append_postings, _write_terms, _write_scalars)


def erase_from_postings_index(
    spark: SparkSession,
    erased_doc_ids: DataFrame,
    prefix: str,
    num_buckets: int = NUM_POSTING_BUCKETS,
    location: str | None = None,
) -> None:
    """Logically erase a batch of doc_ids from the store (GDPR
    right-to-be-forgotten): append the ids to the ``<prefix>_tombstones``
    deletion-vector table and decrement the mergeable statistics.

    The erased docs' term/length rows are read FROM the store (a
    broadcast semi-join against the erased set — the batch is small, the
    postings relation never shuffles and is never re-tokenized); df
    merges as stored − erased per tok (rows reaching 0 drop out, exactly
    the dfrel a surviving-corpus rebuild would produce) and the corpus
    scalars subtract row-wise. The corpus-sized postings table is NOT
    rewritten — probes anti-join the broadcast tombstone set until
    ``apply_erasures`` physically drops the rows. Erasing an id the
    store never indexed is a no-op beyond the tombstone row (the
    semi-join finds nothing to decrement).

    Idempotent and crash-ordered: ids already tombstoned are excluded
    BEFORE the decrement (a repeated GDPR request or retried batch whose
    physical rows still await ``apply_erasures`` must not subtract its
    df/scalar contributions twice), and the tombstone append commits
    FIRST — an interruption before the statistics overwrite leaves docs
    hidden but stats at full-corpus values, and because the idempotent
    dedup makes every RETRY of the same batch return an empty id set,
    the decrements are never re-attempted: the stats stay stale until
    ``apply_erasures`` (which recomputes terms/scalars from the
    surviving postings snapshot — the self-healing half of this
    contract, ADVICE r12) or a full rebuild. The inverse ordering would
    be worse (stats decremented, docs still retrievable, nothing heals
    probe scores).

    Scale note: tombstones broadcast at probe time, so this path is
    sized for erasure sets up to broadcast scale (~10M ids); a larger
    backlog is the signal to run ``apply_erasures``, which resets the
    tombstone set to empty."""
    post_t, terms_t, scal_t = postings_table_names(prefix)
    ids = append_tombstones(spark, erased_doc_ids, prefix, location, "doc_id")
    erased_postings = (
        spark.table(post_t)
        .join(F.broadcast(ids), "doc_id", "left_semi")
        .localCheckpoint(eager=True)
    )
    erased_terms, erased_scalars = _df_and_scalars(erased_postings)

    merged_terms = (
        spark.table(terms_t)
        .unionByName(erased_terms.select("tok", (-F.col("df")).alias("df")))
        .groupBy("tok")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") > 0)
        .localCheckpoint(eager=True)
    )
    merged_scalars = (
        spark.table(scal_t)
        .unionByName(
            erased_scalars.select(
                (-F.col("n_docs")).alias("n_docs"),
                (-F.col("total_len")).alias("total_len"),
            )
        )
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_len").alias("total_len"),
        )
        .localCheckpoint(eager=True)
    )
    # both merged relations are checkpointed: the two overwrites are
    # independent jobs — bucket-align the terms write and overlap them
    # (guide §2.6, same discipline as build/append)
    from e_commerce_click_stream_spark.operators.dedup_index import (
        _run_concurrently,
    )

    def _write_terms() -> None:
        wt = (
            merged_terms.repartition(num_buckets, F.col("tok"))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(num_buckets, "tok")
            .sortBy("tok")
        )
        if location:
            wt = wt.option("path", os.path.join(location, TERMS_SUBDIR))
        wt.saveAsTable(terms_t)

    def _write_scalars() -> None:
        ws = merged_scalars.write.mode("overwrite").format("parquet")
        if location:
            ws = ws.option("path", os.path.join(location, SCALARS_SUBDIR))
        ws.saveAsTable(scal_t)

    _run_concurrently(_write_terms, _write_scalars)


def apply_erasures(
    spark: SparkSession,
    prefix: str,
    num_buckets: int = NUM_POSTING_BUCKETS,
    location: str | None = None,
) -> dict[str, int]:
    """Physically drop tombstoned rows from the postings table, restate
    the term/corpus statistics from the surviving snapshot, and reset
    the tombstone set — the deferred compaction half of the merge-on-read
    erasure contract. One pass over the postings relation: anti-join the
    broadcast tombstones, rewrite under the SAME bucket spec (the
    ``repartition(n, col)``/``bucketBy(n, col)`` Murmur3 alignment from
    operators/compaction.py, so each task emits one file per bucket),
    recompute terms/scalars FROM the surviving snapshot, truncate
    tombstones. The recompute is self-healing (ADVICE r12): normally
    ``erase_from_postings_index`` already decremented the stats and the
    recompute restates identical values (probes bit-identical before and
    after — pinned in tests), but if an erase crashed after its tombstone
    append and before its stats overwrite, retries no-op on the
    idempotent dedup and ONLY this pass reconciles the stats with the
    deletion vector. No-ops (``{"dropped": 0}``) when the store carries
    no deletion vector (ADVICE r12 — a fresh session reusing the
    directory must not raise). Returns ``{"dropped": n, "kept": m}``."""
    post_t, terms_t, scal_t = postings_table_names(prefix)
    tomb_t = tombstones_table_name(prefix)
    if not spark.catalog.tableExists(tomb_t):
        return {"dropped": 0, "kept": spark.table(post_t).count()}
    tomb = spark.table(tomb_t).localCheckpoint(eager=True)
    if tomb.isEmpty():
        return {"dropped": 0, "kept": spark.table(post_t).count()}
    snap = (
        spark.table(post_t)
        .join(F.broadcast(tomb), "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    before = spark.table(post_t).count()
    kept = snap.count()
    # self-heal: terms/scalars restated from the surviving snapshot (snap
    # is checkpointed, so overwriting the tables it no longer reads from
    # is safe); identical to the erase-time decrements when those landed,
    # the only reconciliation path when they did not. All three rewrites
    # hang off the checkpointed snapshot and touch disjoint tables, so
    # they overlap (guide §2.6) with the terms write bucket-aligned.
    heal_terms, heal_scalars = _df_and_scalars(snap)
    from e_commerce_click_stream_spark.operators.dedup_index import (
        _run_concurrently,
    )

    def _rewrite_postings() -> None:
        w = (
            snap.repartition(num_buckets, F.col("tok"))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(num_buckets, "tok")
            .sortBy("tok")
        )
        if location:
            w = w.option("path", os.path.join(location, POSTINGS_SUBDIR))
        w.saveAsTable(post_t)

    def _write_terms() -> None:
        wt = (
            heal_terms.repartition(num_buckets, F.col("tok"))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(num_buckets, "tok")
            .sortBy("tok")
        )
        if location:
            wt = wt.option("path", os.path.join(location, TERMS_SUBDIR))
        wt.saveAsTable(terms_t)

    def _write_scalars() -> None:
        ws = heal_scalars.write.mode("overwrite").format("parquet")
        if location:
            ws = ws.option("path", os.path.join(location, SCALARS_SUBDIR))
        ws.saveAsTable(scal_t)

    _run_concurrently(_rewrite_postings, _write_terms, _write_scalars)
    truncate_tombstones(spark, prefix, location)
    return {"dropped": before - kept, "kept": kept}


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
    relation never shuffles; scalars ride a 1-row broadcast.

    Merge-on-read: when the store carries a tombstone table (a logical
    erasure ran and ``apply_erasures`` hasn't yet), every postings read
    anti-joins the broadcast deletion vector — one BroadcastHashJoin on
    the scan, no shuffle, and the probe answers as if the erased docs
    were never indexed."""
    post_t, terms_t, scal_t = postings_table_names(prefix)
    postings = anti_join_tombstones(spark, spark.table(post_t), prefix, "doc_id")
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
