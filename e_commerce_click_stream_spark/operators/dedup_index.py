"""Persisted MinHash-LSH band index: build once, probe per ingest batch.

``dedup_incremental_minhash`` (plans/dedup.py) proves the incremental
verdict semantics but signs BOTH sides in one pass. The production 100 TB
shape stores the already-indexed corpus once and re-signs only each
incoming batch:

- **build**: shingle + minhash-sign the index corpus, persist two tables.
  The primary layout (``build_band_index_tables``) is catalog-backed via
  ``bucketBy(...).sortBy(...).saveAsTable()``: ``<prefix>_bands``
  (doc_id, band, bucket) partitioned by ``band`` AND hash-bucketed+sorted
  on ``bucket`` — exactly the probe join key, since the band id is seeded
  into the bucket hash (see ``band_buckets``) — and ``<prefix>_shingles``
  (doc_id, s) bucketed+sorted on ``doc_id``. A probe's candidate
  equi-join against the bucketed store therefore needs NO Exchange on the
  stored side (only the small batch shuffles into the bucket layout),
  pinned in tests/test_bucketing.py. ``build_band_index`` keeps the plain
  parquet layout (partition-pruned by band, no bucket metadata — parquet
  directories can't carry it) as the documented non-warehouse fallback.
- **probe**: shingle + sign ONLY the new batch (|batch| band rows, never a
  corpus re-scan), equi-join its band rows against the stored bands
  table plus the batch's own earlier docs (min-id-canonical, same as the
  one-pass query), then verify candidates by exact jaccard against stored
  resp. in-batch shingle sets. Output schema and verdict semantics are
  bit-identical to ``dedup_incremental_minhash`` — pinned by
  tests/test_dedup_index.py and by the shared DuckDB oracle on the
  registered ``dedup_incremental_stored`` query.

Per-ingest cost is O(|batch| × bands) probe rows against an index read
that a real deployment amortizes across batches (and appends to, see
``append_to_band_index`` / ``append_to_band_index_tables``) — the piece
the one-pass query's docstring promises and this module delivers.

Concurrent-writer safety: callers that overwrite a shared store location
take ``operators.storelock.acquire_build_lock`` first (fail-fast, not
silent racing) and downgrade to a shared lock for the probe's lazy reads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BANDS_SUBDIR = "bands"
SHINGLES_SUBDIR = "shingles"
# bucket-count FLOOR for the catalog-backed layout: buckets cap the
# probe-side shuffle's partition count, so keep the floor modest at test
# scale. The actual count is SIZE-DERIVED at build time
# (``derived_store_buckets``): the r15 x30 probe caught the constant-8
# layout putting ~150 MB of shingle arrays in each bucket, which any
# per-bucket hash build or re-sort then has to hold at once — the
# cluster sizing rule (corpus_bytes / target_bucket_size) was prose
# until then.
NUM_STORE_BUCKETS = 8
# target on-disk bytes per bucket; shingle-array row estimate shares the
# 8192 B/doc bound documented at plans/dedup.py::SH_EST_BYTES_PER_DOC
# (kept in sync by tests/test_round15_ops.py's footprint pins)
STORE_BUCKET_TARGET_BYTES = 32 << 20
EST_SHINGLE_BYTES_PER_DOC = 8192


def _run_concurrently(*thunks) -> None:
    """Run independent write jobs from a small thread pool so Spark
    schedules them concurrently (FIFO: the later job back-fills executor
    slots the earlier job's tail frees). Exceptions propagate — all
    thunks are awaited first so a failure can't leave a write racing."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futs = [pool.submit(t) for t in thunks]
        errs = [f.exception() for f in futs]
    for e in errs:
        if e is not None:
            raise e


def derived_store_buckets(n_docs: int) -> int:
    """Bucket count for a band store indexing ``n_docs`` documents:
    ceil(estimated shingle bytes / STORE_BUCKET_TARGET_BYTES), floored
    at NUM_STORE_BUCKETS and capped at 1024. Derived from an exact doc
    COUNT, not a parquet footprint — store builds are heavy write jobs
    where one count() is noise, and footprints underestimate doc counts
    ~10x on deduplicating fixtures (verbatim-copy scale probes)."""
    est = n_docs * EST_SHINGLE_BYTES_PER_DOC
    return min(1024, max(NUM_STORE_BUCKETS, -(-est // STORE_BUCKET_TARGET_BYTES)))


def table_bucket_count(spark: SparkSession, table_name: str) -> int:
    """The bucket count a catalog table was WRITTEN with — appends and
    erasure rewrites must restate the existing spec exactly (Spark
    validates appends; a rewrite that silently changed the count would
    desync the layout from the probe plans)."""
    for r in spark.sql(f"DESCRIBE FORMATTED {table_name}").collect():
        if (r.col_name or "").strip() == "Num Buckets":
            return int(r.data_type)
    return NUM_STORE_BUCKETS


def minhash_signature(
    exploded: DataFrame, num_hashes: int, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, sh_) exploded shingles -> (doc_id, mh0..mh{n-1}).

    One hash-aggregate: each signature component is the min md5 of the
    seed-prefixed shingle — engine-portable (md5 hex strings order
    identically everywhere), map-side-combinable (min), no UDF. ``carry``
    names doc-level columns to ride through the grouping (functionally
    dependent on doc_id) instead of being re-joined afterwards.

    Each component is ONE parsed SQL expression, not a Column chain: the
    per-component min/md5/concat/lit/col/alias construction cost ~20
    gateway roundtrips x num_hashes x every signing call in a query
    (dedup_incremental_stored spent ~1.3k roundtrips here alone), and
    plan construction is inside every timed/billed run. The parsed tree
    is identical (same functions, same literals, same aliases)."""
    return exploded.groupBy("doc_id", *carry).agg(
        *[
            F.expr(f"min(md5(concat('{s}:', sh_))) AS mh{s}")
            for s in range(num_hashes)
        ]
    )


def band_buckets(
    sig: DataFrame, num_bands: int, rows_per_band: int, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, mh*) signature -> (doc_id, band, bucket) LSH keys.

    The bucket is the md5 of the band id + the band's '|'-joined
    components: uniform, high-cardinality, so the candidate equi-join
    shuffle distributes evenly at any corpus size. Seeding with the band
    id makes the bucket string alone a complete LSH key (two bands with
    identical signature slices can never collide), so every candidate
    join is a SINGLE-column equi-join on ``bucket`` — which is what lets
    the stored index be hash-bucketed on exactly the join key and probed
    with no Exchange on the stored side (subset-key co-partitioning is
    not a thing Spark will plan; one key, one bucket spec, zero shuffle).
    The ``band`` column still rides along for partition pruning and
    layout audits.

    The whole explode(array(struct...)) tree is ONE parsed SQL expression
    (same rationale as minhash_signature: the per-band struct/md5/concat
    Column chains cost ~100 gateway roundtrips per signing call; the
    parsed tree — named_struct('band', <int literal>, 'bucket', md5) —
    is what the Column API built)."""
    structs = []
    for b in range(num_bands):
        comps = ", '|', ".join(
            f"mh{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        structs.append(
            f"named_struct('band', {b}, 'bucket', md5(concat('{b}|', {comps})))"
        )
    bb = F.expr(f"explode(array({', '.join(structs)})) AS bb")
    return sig.select("doc_id", *carry, bb).select(
        "doc_id", *carry, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def sign_docs(
    docs: DataFrame, num_hashes: int, num_bands: int
) -> tuple[DataFrame, DataFrame]:
    """(doc_id, s[array<string> shingles]) -> (bands, shingles) pair.

    ``docs`` must already be materialized (checkpoint/persist) by the
    caller if referenced from multiple branches — this function fans the
    relation into the explode->sign path and keeps the shingle sets as-is
    for verification."""
    nonempty = docs.filter(F.size("s") > 0)
    ex = nonempty.select("doc_id", F.explode("s").alias("sh_"))
    sig = minhash_signature(ex, num_hashes)
    bands = band_buckets(sig, num_bands, num_hashes // num_bands)
    return bands, docs.select("doc_id", "s")


def build_band_index(
    index_docs: DataFrame, index_dir: str, num_hashes: int, num_bands: int
) -> None:
    """Write the stored index for ``index_docs`` (doc_id, s) under
    ``index_dir``: bands/ partitioned by band, shingles/ flat."""
    bands, sh = sign_docs(index_docs, num_hashes, num_bands)
    bands.write.mode("overwrite").partitionBy("band").parquet(
        os.path.join(index_dir, BANDS_SUBDIR)
    )
    sh.write.mode("overwrite").parquet(os.path.join(index_dir, SHINGLES_SUBDIR))


def append_to_band_index(
    new_docs: DataFrame, index_dir: str, num_hashes: int, num_bands: int
) -> None:
    """Fold a verdict-ed batch into the store (the post-probe step of a
    production ingest: novel + canonical docs join the index so the next
    batch dedups against them). Blind append — callers pass only docs not
    already present."""
    bands, sh = sign_docs(new_docs, num_hashes, num_bands)
    bands.write.mode("append").partitionBy("band").parquet(
        os.path.join(index_dir, BANDS_SUBDIR)
    )
    sh.write.mode("append").parquet(os.path.join(index_dir, SHINGLES_SUBDIR))


def band_table_names(prefix: str) -> tuple[str, str]:
    """Catalog table names for a table-backed store."""
    return f"{prefix}_bands", f"{prefix}_shingles"


from e_commerce_click_stream_spark.operators.tombstones import (  # noqa: E402
    anti_join_tombstones,
    append_tombstones,
    reset_tombstones,
    tombstones_table_name as band_tombstones_table_name,
    truncate_tombstones,
)


def erase_from_band_index_tables(
    spark: SparkSession,
    erased_doc_ids: DataFrame,
    prefix: str,
    location: str | None = None,
) -> None:
    """Logically erase doc_ids from the band store (GDPR
    right-to-be-forgotten) — the band-store twin of
    ``bm25_index.erase_from_postings_index``, simpler because this store
    carries NO mergeable global statistics: erasure is purely a
    ``<prefix>_tombstones`` deletion-vector append (deduped against the
    existing vector — operators/tombstones.py). Probes anti-join the
    broadcast tombstone set on both stored tables (bands: erased docs
    stop being candidates; shingles: their sets are never read for
    verification), so the store answers as if the docs were never
    indexed; ``apply_band_erasures`` physically drops the rows later,
    off the erasure path."""
    append_tombstones(spark, erased_doc_ids, prefix, location, "doc_id")


def apply_band_erasures(
    spark: SparkSession,
    prefix: str,
    num_buckets: int | None = None,
    location: str | None = None,
) -> dict[str, int]:
    """Physically drop tombstoned rows from BOTH band-store tables and
    reset the tombstone set — the deferred half of the merge-on-read
    erasure contract. Each table rewrites under its exact original spec
    (bands: partitioned by band + bucketed/sorted on bucket; shingles:
    bucketed/sorted on doc_id), with the repartition-by-bucket-column
    alignment from operators/compaction.py so each task emits one file
    per bucket. No-ops when the store carries no deletion vector
    (ADVICE r12 — a session with no erasures must not raise on the
    missing tombstone table). Returns dropped-row counts per table."""
    bands_t, shingles_t = band_table_names(prefix)
    tomb_t = band_tombstones_table_name(prefix)
    if not spark.catalog.tableExists(tomb_t):
        return {"dropped_bands": 0, "dropped_shingles": 0}
    if num_buckets is None:
        # rewrite under the count the store was BUILT with (possibly
        # size-derived) — read it before the overwrite drops the table
        num_buckets = table_bucket_count(spark, bands_t)
    tomb = spark.table(tomb_t).localCheckpoint(eager=True)
    if tomb.isEmpty():
        return {"dropped_bands": 0, "dropped_shingles": 0}
    out: dict[str, int] = {}

    bands_before = spark.table(bands_t).count()
    bands_snap = (
        spark.table(bands_t)
        .select("doc_id", "band", "bucket")
        .join(F.broadcast(tomb), "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    out["dropped_bands"] = bands_before - bands_snap.count()
    w = (
        bands_snap.repartition(num_buckets, F.col("bucket"))
        .write.mode("overwrite")
        .format("parquet")
        .partitionBy("band")
        .bucketBy(num_buckets, "bucket")
        .sortBy("bucket")
    )
    if location:
        w = w.option("path", os.path.join(location, BANDS_SUBDIR))
    w.saveAsTable(bands_t)

    sh_before = spark.table(shingles_t).count()
    sh_snap = (
        spark.table(shingles_t)
        .select("doc_id", "s")
        .join(F.broadcast(tomb), "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    out["dropped_shingles"] = sh_before - sh_snap.count()
    ws = (
        sh_snap.repartition(num_buckets, F.col("doc_id"))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, "doc_id")
        .sortBy("doc_id")
    )
    if location:
        ws = ws.option("path", os.path.join(location, SHINGLES_SUBDIR))
    ws.saveAsTable(shingles_t)

    truncate_tombstones(spark, prefix, location)
    return out


def build_band_index_tables(
    index_docs: DataFrame,
    prefix: str,
    num_hashes: int,
    num_bands: int,
    num_buckets: int | None = None,
    location: str | None = None,
) -> None:
    """Write the PRIMARY (catalog-backed, bucketed) store layout:
    ``<prefix>_bands`` partitioned by band + bucketed/sorted on the probe
    join key ``bucket``; ``<prefix>_shingles`` bucketed/sorted on
    ``doc_id``. ``location`` makes them external tables rooted there
    (keeps index data out of the session's warehouse dir).
    ``num_buckets=None`` (the default) size-derives the count from the
    corpus (``derived_store_buckets``) so per-bucket bytes stay bounded
    at any store size; pass an explicit count only in tests pinning a
    specific layout."""
    if num_buckets is None:
        num_buckets = derived_store_buckets(index_docs.count())
    bands, sh = sign_docs(index_docs, num_hashes, num_bands)
    bands_t, shingles_t = band_table_names(prefix)

    # repartition by the bucket column before each bucketed write — the
    # Murmur3-pmod alignment from operators/compaction.py: each write
    # task holds exactly one bucket's rows and emits one file per
    # (partition, bucket) instead of every upstream task writing its own
    # file into every bucket (measured at sf0.1: 320 part files -> 40,
    # bands+shingles write wall time 3.7 s -> ~1.4 s; the exchange the
    # repartition adds carries only the keyed index rows, never shingle
    # payload duplication)
    def _write_bands() -> None:
        w = (
            bands.repartition(num_buckets, F.col("bucket"))
            .write.mode("overwrite")
            .format("parquet")
            .partitionBy("band")
            .bucketBy(num_buckets, "bucket")
            .sortBy("bucket")
        )
        if location:
            w = w.option("path", os.path.join(location, BANDS_SUBDIR))
        w.saveAsTable(bands_t)

    def _write_shingles() -> None:
        ws = (
            sh.repartition(num_buckets, F.col("doc_id"))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(num_buckets, "doc_id")
            .sortBy("doc_id")
        )
        if location:
            ws = ws.option("path", os.path.join(location, SHINGLES_SUBDIR))
        ws.saveAsTable(shingles_t)

    # the two table writes are independent jobs over the same checkpointed
    # shingle relation (different tables, different output dirs): submit
    # both so the second job's tasks back-fill the first's straggler tail
    # instead of waiting for it (the overlap-independent-jobs pattern;
    # measured −10% build wall at sf0.1, and at real store sizes the
    # saving is the full min(bands, shingles) tail)
    _run_concurrently(_write_bands, _write_shingles)
    # a fresh build has no erasures: reset any tombstones a previous
    # generation of this store left behind (catalog AND directory —
    # operators/tombstones.py)
    reset_tombstones(index_docs.sparkSession, prefix, location)


def append_to_band_index_tables(
    new_docs: DataFrame,
    prefix: str,
    num_hashes: int,
    num_bands: int,
    num_buckets: int | None = None,
) -> None:
    """Table-backed twin of ``append_to_band_index``: fold a verdict-ed
    batch into the bucketed store (the writer spec must restate the
    table's partition/bucket layout — Spark validates it matches).
    ``num_buckets=None`` reads the count the store was built with from
    the catalog (the build may have size-derived it)."""
    bands, sh = sign_docs(new_docs, num_hashes, num_bands)
    bands_t, shingles_t = band_table_names(prefix)
    if num_buckets is None:
        num_buckets = table_bucket_count(new_docs.sparkSession, bands_t)
    # same bucket-column repartition alignment as the build: one file per
    # (partition, bucket) PER APPEND, so a store that has absorbed many
    # batches grows num_buckets files per batch instead of
    # tasks x num_buckets (compaction still collapses the accumulation)
    (
        bands.repartition(num_buckets, F.col("bucket"))
        .write.mode("append")
        .format("parquet")
        .partitionBy("band")
        .bucketBy(num_buckets, "bucket")
        .sortBy("bucket")
        .saveAsTable(bands_t)
    )
    (
        sh.repartition(num_buckets, F.col("doc_id"))
        .write.mode("append")
        .format("parquet")
        .bucketBy(num_buckets, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(shingles_t)
    )


def probe_band_index(
    spark: SparkSession,
    batch_docs: DataFrame,
    all_batch_ids: DataFrame,
    index_dir: str,
    num_hashes: int,
    num_bands: int,
    jaccard_threshold: float,
    dedupe_candidates: bool = False,
) -> DataFrame:
    """One ingest batch against the parquet-directory (fallback) store.

    ``batch_docs``: (doc_id, s) for the incoming batch (materialized by the
    caller). ``all_batch_ids``: (doc_id) for EVERY batch doc — including
    shingle-less ones, which must still receive a 'novel' verdict row.

    Returns (doc_id, verdict, match_doc_id, jaccard) with verdict in
    {'dup_of_index', 'dup_in_batch', 'novel'}; best match by
    (jaccard desc, index-before-batch, min doc_id) — the same total order
    as the one-pass query, so results are bit-identical."""
    batch_bands, batch_sh = sign_docs(batch_docs, num_hashes, num_bands)

    # explicit schemas (from the batch twin relations): an EMPTY index —
    # zero docs on the store side — writes no parquet part files, and a
    # schema-less read of that directory raises instead of returning an
    # empty relation; at 100 TB empty partition ranges are routine
    stored_bands = spark.read.schema(batch_bands.schema).parquet(
        os.path.join(index_dir, BANDS_SUBDIR)
    )
    stored_sh = spark.read.schema(batch_sh.schema).parquet(
        os.path.join(index_dir, SHINGLES_SUBDIR)
    )
    return _probe_against(
        batch_bands, batch_sh, stored_bands, stored_sh, all_batch_ids,
        jaccard_threshold, dedupe_candidates=dedupe_candidates,
    )


def probe_band_index_tables(
    spark: SparkSession,
    batch_docs: DataFrame,
    all_batch_ids: DataFrame,
    prefix: str,
    num_hashes: int,
    num_bands: int,
    jaccard_threshold: float,
    dedupe_candidates: bool = False,
) -> DataFrame:
    """One ingest batch against the bucketed catalog store — same contract
    as ``probe_band_index``, but the stored side of the candidate join is
    scanned in its bucket layout: no Exchange on the store, only the
    |batch|-sized probe side shuffles (pinned in tests/test_bucketing.py).
    A catalog table also keeps its schema when empty, so the zero-doc
    store needs no explicit-schema workaround.

    Merge-on-read: when the store carries a tombstone table (a logical
    erasure ran and ``apply_band_erasures`` hasn't yet), both stored
    reads anti-join the broadcast deletion vector — erased docs stop
    being candidates and their shingle sets are never read."""
    batch_bands, batch_sh = sign_docs(batch_docs, num_hashes, num_bands)
    bands_t, shingles_t = band_table_names(prefix)
    # partition columns come last in a table scan's order — reproject to
    # the probe's expected column order
    stored_bands = anti_join_tombstones(
        spark, spark.table(bands_t).select("doc_id", "band", "bucket"), prefix, "doc_id"
    )
    stored_sh = anti_join_tombstones(
        spark, spark.table(shingles_t).select("doc_id", "s"), prefix, "doc_id"
    )
    return _probe_against(
        batch_bands, batch_sh, stored_bands, stored_sh, all_batch_ids,
        jaccard_threshold, dedupe_candidates=dedupe_candidates,
        # 4x the store's (size-derived) bucket count: ~8 MB of shingle
        # shuffle bytes per verify partition at STORE_BUCKET_TARGET_BYTES.
        # Scale regime only (same gate as the candidate dedup): on small
        # fixtures AQE's own partitioning is faster, and the catalog
        # DESCRIBE + fixed-width repartition cost ~2x on the sf0.01 gate
        # lines for no memory benefit.
        verify_partitions=(
            4 * table_bucket_count(spark, bands_t) if dedupe_candidates else None
        ),
    )


def best_match_per_probe(scored: DataFrame) -> DataFrame:
    """Top-1 verdict per probe doc over (probe_id, match_id, match_is_new,
    jaccard) candidate rows — shared by the stored-index probes and the
    one-pass incremental twin so their shared oracle can never
    desynchronize.

    min_by on the composite order key is a partial+final agg (map-side
    combine shrinks candidates before the shuffle) instead of a full sort
    window; same deterministic total order (jaccard desc,
    index-before-batch, min match_id); jaccard is >= threshold > 0 so the
    negation is sign-safe."""
    return (
        scored.groupBy("probe_id")
        .agg(
            F.expr(
                "min_by(struct(match_id, match_is_new, jaccard),"
                " named_struct('nj', -jaccard, 'mn', match_is_new,"
                " 'mi', match_id)) AS b"
            )
        )
        .selectExpr(
            "probe_id",
            "b.match_id AS match_id",
            "b.match_is_new AS match_is_new",
            "b.jaccard AS jaccard",
        )
    )


def _probe_against(
    batch_bands: DataFrame,
    batch_sh: DataFrame,
    stored_bands: DataFrame,
    stored_sh: DataFrame,
    all_batch_ids: DataFrame,
    jaccard_threshold: float,
    dedupe_candidates: bool = False,
    verify_partitions: int | None = None,
) -> DataFrame:
    # the signed batch feeds THREE consumers (store-probe side, batch
    # self-join probe AND match sides) — materialize the signature agg
    # once or the explode+min aggregation recompiles per branch (was 3
    # signature stages per probe batch, measured −23% probe wall time at
    # sf0.1 when collapsed to one); |batch| x num_bands rows, trivially
    # checkpointable at any realistic ingest-batch size
    batch_bands = batch_bands.localCheckpoint(eager=True)
    p = batch_bands.alias("p")
    # candidates against the store: single-key equi-join on the
    # band-seeded bucket (see band_buckets — the seed makes the bucket a
    # complete LSH key, so no band column in the join and the stored
    # side's bucket-spec covers the key exactly). The doc_id inequality
    # makes at-least-once replays safe by construction: a batch doc
    # already folded into the store via append_to_band_index must not
    # self-match at jaccard 1.0 and report itself dup_of_index (a no-op
    # when the id spaces are disjoint).
    m_idx = stored_bands.alias("m")
    cand_idx = (
        p.join(
            m_idx,
            (F.col("p.bucket") == F.col("m.bucket"))
            & (F.col("m.doc_id") != F.col("p.doc_id")),
        )
        .selectExpr(
            "p.doc_id AS probe_id",
            "m.doc_id AS match_id",
            "false AS match_is_new",
        )
    )
    # candidates within the batch: later doc loses (min-id-canonical)
    m_bat = batch_bands.alias("m")
    cand_bat = (
        p.join(
            m_bat,
            (F.col("p.bucket") == F.col("m.bucket"))
            & (F.col("m.doc_id") < F.col("p.doc_id")),
        )
        .selectExpr(
            "p.doc_id AS probe_id",
            "m.doc_id AS match_id",
            "true AS match_is_new",
        )
    )
    # By default NO .distinct() on candidates: a pair colliding in k
    # bands reaches the verify join k times, but the terminal min_by
    # aggregate (best_match_per_probe) is invariant to duplicates, so
    # verdicts are bit-identical. The duplicate verify work is bounded by
    # NUM_BANDS (a small constant; chance collisions — the volume driver
    # — collide in ~1 band), while the dedupe was a full extra shuffle +
    # AQE stage barrier on EVERY probe batch (measured at sf0.1: −28%
    # probe wall time, identical output). ``dedupe_candidates`` flips the
    # trade for the scale regime callers detect via the shingle-level
    # chooser: on a duplication-heavy corpus every exact-dup pair
    # collides in ALL bands, and shrinking the candidate stream 4x
    # BEFORE it picks up shingle-array payloads (an ids-only shuffle)
    # is worth far more than it costs — the r15 x30 probe's lesson.
    cand = cand_idx.unionByName(cand_bat)
    if dedupe_candidates:
        cand = cand.distinct()

    # exact-jaccard verification on candidates only; match shingles come
    # from the store or the batch according to provenance. Both verify
    # joins are SHUFFLE_HASH with the hash built on the SHINGLE side
    # (bounded: batch-sized resp. bucket-bounded per partition) — as
    # sort-merge joins they SORTED the candidate stream with its ~6 KB
    # shingle-array payloads, and at the x30 probe (30 verbatim copies,
    # candidates quadratic in the copy count) that sort spilled a
    # vanilla 1 GiB session to death (UnsafeSorterSpillReader OOM). The
    # hash build never touches the stream, which is partitioned and
    # PROBED, never sorted — the same wedges-stream/edges-index
    # invariant as graph_triangle_count's close join.
    match_sh = stored_sh.unionByName(batch_sh).selectExpr(
        "doc_id AS match_id", "s AS sb"
    )
    sa = batch_sh.selectExpr("doc_id AS probe_id", "s AS sa")
    if verify_partitions:
        # pin the join partition counts (callers derive from the store's
        # size-derived bucket count): AQE sizes partitions by SHUFFLE
        # bytes, but a hash build holds the whole partition as UnsafeRow
        # map (~2-3x shuffle bytes with array payloads) x concurrent
        # tasks — at the x30 probe AQE's choice left ~60 MB builds that
        # could not acquire pool memory. The repartition rides the
        # exchange each join needed anyway (same key), so exchange
        # counts are unchanged.
        sa = sa.repartition(verify_partitions, "probe_id")
        match_sh = match_sh.repartition(verify_partitions, "match_id")
    if dedupe_candidates:
        # scale regime only — small fixtures keep AQE's broadcast verify
        # plans (2 exchanges, pinned in plan_audit); forcing SHJ there
        # added 3 exchanges for no memory benefit
        sa = sa.hint("shuffle_hash")
        match_sh = match_sh.hint("shuffle_hash")
    scored = (
        cand.join(sa, "probe_id")
        .join(match_sh, "match_id")
        .selectExpr(
            "probe_id",
            "match_id",
            "match_is_new",
            "round(CAST(size(array_intersect(sa, sb)) AS DOUBLE)"
            " / (size(sa) + size(sb) - size(array_intersect(sa, sb))), 4)"
            " AS jaccard",
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    # best is <= |batch| rows but post-agg (size unknown at plan time, an
    # SMJ + ids-side exchange gets planned otherwise) — broadcast it
    best = F.broadcast(best_match_per_probe(scored))
    return all_batch_ids.join(
        best, all_batch_ids["doc_id"] == best["probe_id"], "left"
    ).selectExpr(
        "doc_id",
        "CASE WHEN match_id IS NULL THEN 'novel'"
        " WHEN match_is_new THEN 'dup_in_batch'"
        " ELSE 'dup_of_index' END AS verdict",
        "match_id AS match_doc_id",
        "jaccard",
    )
