"""Multimodal plumbing queries — binary payload columns exercised end-to-end.

The decode itself is a deterministic fake (no codec libs in this
container — see operators/multimodal.py), which has the useful property
that the WHOLE path, including the Python mapInPandas hop, is
oracle-checkable: the fake decode derives dimensions from the payload md5,
which DuckDB reproduces in SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_click_stream_spark.io import spread, table
from e_commerce_click_stream_spark.operators.multimodal import (
    decode_metadata,
    extract_features,
    frame_sample,
    resize_plan,
    with_binary_payload,
)
from e_commerce_click_stream_spark.plans.registry import register

_DECODE_SQL = """
SELECT doc_id,
       octet_length(encode(coalesce(text, ''))) AS n_bytes,
       md5(coalesce(text, '')) AS content_fp,
       (ascii(substr(md5(coalesce(text, '')), 1, 1)) * 256 + ascii(substr(md5(coalesce(text, '')), 2, 1))) % 1024 + 16
           AS width,
       (ascii(substr(md5(coalesce(text, '')), 3, 1)) * 256 + ascii(substr(md5(coalesce(text, '')), 4, 1))) % 1024 + 16
           AS height,
       3 AS n_channels,
       'fake-md5' AS decoder
FROM documents
"""


@register("multimodal_decode_meta", oracle=_DECODE_SQL, tags=("multimodal", "pandas-udf"))
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → Arrow-batched mapInPandas decode → typed metadata.
    Exercises the real multimodal plumbing (binary column, batch iterator,
    explicit result schema); the decode is the deterministic fake."""
    docs = with_binary_payload(spread(table(spark, sf_dir, "documents")))
    return decode_metadata(docs, use_real_codec=False)


_FRAMES_SQL = """
SELECT doc_id,
       unnest(range((octet_length(encode(coalesce(text, ''))) + 63) // 64)) AS frame_idx,
       unnest(range((octet_length(encode(coalesce(text, ''))) + 63) // 64)) * 64 AS offset
FROM documents
"""


@register("multimodal_frame_sample", oracle=_FRAMES_SQL, tags=("multimodal",))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-stream 'frame sampling': one row per 64-byte chunk offset —
    the video frame-extraction row shape without a codec."""
    docs = with_binary_payload(table(spark, sf_dir, "documents"))
    return frame_sample(docs, every_n_bytes=64)


_RESIZE_SQL = """
WITH d AS (
    SELECT doc_id,
           (ascii(substr(md5(coalesce(text, '')), 1, 1)) * 256 + ascii(substr(md5(coalesce(text, '')), 2, 1))) % 1024 + 16
               AS width,
           (ascii(substr(md5(coalesce(text, '')), 3, 1)) * 256 + ascii(substr(md5(coalesce(text, '')), 4, 1))) % 1024 + 16
               AS height
    FROM documents
)
SELECT doc_id, width, height,
       CASE WHEN greatest(width, height) <= 256 THEN width
            ELSE (width * 256) // greatest(width, height) END AS target_width,
       CASE WHEN greatest(width, height) <= 256 THEN height
            ELSE (height * 256) // greatest(width, height) END AS target_height,
       greatest(width, height) > 256 AS resized
FROM d
"""


@register("multimodal_resize_plan", oracle=_RESIZE_SQL, tags=("multimodal",))
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plan (longest side clamped to 256, never
    upscaled) over the decoded dimensions — runs the full payload → decode
    → metadata-math path; the pixel resample itself is the codec layer's
    job and stays stubbed like the decode."""
    docs = with_binary_payload(table(spark, sf_dir, "documents"))
    return resize_plan(decode_metadata(docs, use_real_codec=False), max_side=256)


_FEATURES_SQL = """
SELECT doc_id,
       array_to_string(
           list_transform(range(8),
               i -> round(ascii(substr(md5(coalesce(text, '')), (i + 1)::INT, 1)) / 255.0 * 1000000)::BIGINT),
           ',') AS features
FROM documents
"""


@register("multimodal_feature_extract", oracle=_FEATURES_SQL, tags=("multimodal", "pandas-udf"))
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload → fixed-length float feature vector through the real
    Arrow/mapInPandas plumbing (the encoder is the md5-derived stub). The
    operator itself emits array<double> — exactly what the similarity
    queries consume; for the gate the vector is serialized to micro-scaled
    integers (pandas canonicalization can't hash list cells, and both
    engines compute ascii/255.0*1e6 on identical IEEE doubles)."""
    docs = with_binary_payload(spread(table(spark, sf_dir, "documents")))
    feats = extract_features(docs, n_features=8)
    return feats.select(
        "doc_id",
        F.array_join(
            F.transform(
                "features", lambda x: F.round(x * 1000000).cast("bigint").cast("string")
            ),
            ",",
        ).alias("features"),
    )


# ---------------------------------------------------------------------------
# training-shard packing for binary payloads — the webdataset/tar-shard
# layout step: media items are laid out per kind in doc_id order and
# assigned to the shard their cumulative byte offset starts in

SHARD_BYTE_BUDGET = 65536


_SHARD_SQL = f"""
WITH sized AS (
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_kind,
           octet_length(encode(coalesce(text, ''))) AS n_bytes
    FROM documents
),
cum AS (
    SELECT doc_id, media_kind, n_bytes,
           sum(n_bytes) OVER (PARTITION BY media_kind ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_bytes
    FROM sized
)
SELECT media_kind,
       ((cum_bytes - n_bytes) // {SHARD_BYTE_BUDGET})::BIGINT AS shard_id,
       count(*) AS n_items,
       sum(n_bytes)::BIGINT AS total_bytes,
       round(sum(n_bytes) / {SHARD_BYTE_BUDGET}.0, 4) AS fill_ratio
FROM cum
GROUP BY media_kind, shard_id
"""


@register("multimodal_shard_pack", oracle=_SHARD_SQL, tags=("multimodal", "packing", "window"))
def multimodal_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budget shard packing for media payloads (64 KiB shards): the
    webdataset-style layout a multimodal training pipeline writes, one
    running-sum window PER media kind — the binary twin of
    ``doc_pack_sequences``. Each kind packs independently in parallel; an
    item straddling a boundary stays in its starting shard (offset
    packing). Media kind is a deterministic doc_id stand-in — real tables
    carry it in the metadata struct (``with_binary_payload``)."""
    from pyspark.sql import Window

    docs = with_binary_payload(table(spark, sf_dir, "documents"))
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    sized = docs.select(
        "doc_id", kind.alias("media_kind"), F.col("meta.n_bytes").alias("n_bytes")
    )
    w = (
        Window.partitionBy("media_kind")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sized.withColumn("cum_bytes", F.sum("n_bytes").over(w))
    shard_id = F.floor((F.col("cum_bytes") - F.col("n_bytes")) / SHARD_BYTE_BUDGET)
    return (
        cum.groupBy("media_kind", shard_id.alias("shard_id"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.sum("n_bytes") / float(SHARD_BYTE_BUDGET), 4).alias("fill_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# text<->embedding pair assembly: the contrastive-pairs dataset builder
# (CLIP-style) — align the caption table with the vector table by id,
# quality-gate BOTH modalities, and emit the join the trainer consumes

_PAIRS_GATE_SQL = (
    "SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
    "FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 "
    "AND len(list_filter(embedding, x -> x IS NOT NULL)) = 64 "
    "AND len(list_filter(embedding, x -> x <> 0)) > 0"
)

_TEXT_EMB_PAIRS_SQL = f"""
WITH d AS (
    SELECT doc_id, source, lang,
           string_split_regex(trim(text), '\\s+') AS t,
           md5(lower(translate(regexp_replace(trim(text), '\\s+', ' ', 'g'), 'İΣ', 'iσ'))) AS caption_fp
    FROM documents
    WHERE text IS NOT NULL AND trim(text) <> ''
),
e AS (
    SELECT vec_id, label,
           round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS l2_norm
    FROM ({_PAIRS_GATE_SQL}) g
)
SELECT d.doc_id, d.source, d.lang,
       len(d.t) AS n_tokens, d.caption_fp, e.label, e.l2_norm
FROM d JOIN e ON e.vec_id = d.doc_id
WHERE len(d.t) >= 3
"""


@register("multimodal_text_embedding_pairs", oracle=_TEXT_EMB_PAIRS_SQL,
          tags=("multimodal", "contrastive", "join"))
def multimodal_text_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair assembly: captions (documents) joined to
    their embedding rows by id, with BOTH modalities quality-gated first —
    text must be non-empty with >= 3 tokens, vectors pass the standard
    hygiene gate (non-NULL, full 64 dims, no NULL elements, non-zero).
    Emits the caption fingerprint (normalized-text md5, the dedup key a
    CLIP pipeline dedups pairs on), token count, class label, and vector
    norm — the manifest row a contrastive trainer consumes.

    Scale shape: both gates are zero-shuffle scan filters (each side
    shrinks BEFORE the join); the join is a single-key equi-join on the
    id — at 100 TB both tables live bucketed/sorted on that id (the
    operators/dedup_index.py catalog-table discipline) and the join is
    exchange-free. No vectors ride through the output — only the norm."""
    from e_commerce_click_stream_spark.operators.textops import (
        fingerprint,
        tokens,
    )
    from e_commerce_click_stream_spark.plans.similarity import _norm, _vecs

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select(
            "doc_id", "source", "lang",
            F.size(tokens()).cast("long").alias("n_tokens"),
            fingerprint().alias("caption_fp"),
        )
        .filter(F.col("n_tokens") >= 3)
    )
    e = _vecs(spark, sf_dir).select(
        "vec_id", "label", F.round(_norm(F.col("v")), 6).alias("l2_norm")
    )
    return d.join(e, d["doc_id"] == e["vec_id"]).select(
        "doc_id", "source", "lang", "n_tokens", "caption_fp", "label", "l2_norm"
    )


# ---------------------------------------------------------------------------
# perceptual-hash near-dup over the binary payload path: the image/media
# dedup stage (pHash/aHash + hamming radius) — completes the multimodal
# story: decode -> fingerprint -> banded near-dup join. The fingerprint
# rides through the REAL Arrow/mapInPandas plumbing; the 'luma signal' is
# the fake decode's codepoint sequence, so DuckDB reproduces the whole
# hash in SQL and the Python hop is oracle-checked bit-for-bit.

PHASH_HAMMING_T = 1  # near-dup radius; 2 bands of 8 bits => pigeonhole-exact

from e_commerce_click_stream_spark.operators.multimodal import PHASH_BITS

_PHASH_BAND_BITS = PHASH_BITS // 2
_PHASH_BAND_MASK = (1 << _PHASH_BAND_BITS) - 1

# The demo's 16-bit hash has only 2^8 = 256 band-key values, so band
# buckets go hot fast (measured at sf0.1: 381k candidate pairs from a
# 5k-doc corpus — occupancy² fan-out, quadratic-shaped already at toy
# scale). Buckets over the cap are dropped BEFORE the self-join, bounding
# candidate fan-out at cap²/bucket regardless of corpus size — the same
# documented recall tradeoff as SIMHASH_BUCKET_CAP / NGRAM_DF_CAP: a pair
# lost to one hot band usually shares the other, and a production 64-bit
# hash makes hot buckets rare to begin with.

PHASH_BUCKET_CAP = 100

# Geometry constants interpolate from PHASH_BITS / PHASH_HAMMING_T /
# PHASH_BUCKET_CAP so a width/radius/cap retune changes builder and
# oracle TOGETHER (with >2 bands the pigeonhole guarantee needs the
# banding generalized too).
_PHASH_NEARDUP_SQL = f"""
WITH cps AS (
    SELECT doc_id,
           [unicode(c) FOR c IN string_split(coalesce(text, ''), '') IF c <> ''] AS cp
    FROM documents
),
h AS (
    SELECT doc_id,
           list_sum(list_transform(range({PHASH_BITS}), i ->
               CASE WHEN {PHASH_BITS} * coalesce(list_sum(cp[(i * k + 1):(i * k + k)]), 0)
                         > coalesce(list_sum(cp), 0)
                    THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS phash
    FROM (SELECT doc_id, cp, (len(cp) + {PHASH_BITS - 1}) // {PHASH_BITS} AS k FROM cps)
),
bands AS (
    SELECT doc_id, phash, 0 AS band, phash & {_PHASH_BAND_MASK} AS key FROM h
    UNION ALL
    SELECT doc_id, phash, 1 AS band, phash >> {_PHASH_BAND_BITS} AS key FROM h
),
kept AS (
    SELECT band, key FROM bands
    GROUP BY band, key HAVING count(*) <= {PHASH_BUCKET_CAP}
),
kb AS (
    SELECT b.* FROM bands b JOIN kept k ON k.band = b.band AND k.key = b.key
),
pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.phash AS phash_a, b.phash AS phash_b
    FROM kb a JOIN kb b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_HAMMING_T}
)
SELECT doc_a, doc_b, phash_a, phash_b,
       bit_count(xor(phash_a, phash_b))::BIGINT AS hamming
FROM pairs
"""


@register("multimodal_phash_neardup", oracle=_PHASH_NEARDUP_SQL,
          tags=("multimodal", "pandas-udf", "near-dup"))
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-duplicate pairs by perceptual hash: every payload gets a
    16-bit aHash (16 contiguous blocks of the decoded signal, bit = block
    mean above global mean, exact integer cross-multiplication) through
    the Arrow/mapInPandas hop, then pairs within hamming radius 1 are
    found by pigeonhole banding — 2 bands of 8 bits, so any pair within
    the radius shares at least one full band and candidate generation is
    a single-column equi-join per band, never all-pairs. Band buckets
    over PHASH_BUCKET_CAP occupants are dropped before the self-join
    (the dedup_simhash_hamming hot-bucket guard), so per-bucket fan-out
    is bounded at cap² by the EXECUTED plan, not by narration. DISTINCT
    folds pairs caught by both bands; the hamming verify runs on
    candidates only (bit_count over xor, JVM-side). A production
    deployment swaps the fake decode for real pixels and widens to a
    64-bit hash with 4+ bands; every plan property here (Arrow batch
    hop, band equi-join, occupancy cap, candidate-only verify) carries
    over unchanged.

    Scale shape: the Python hop is partition-local (no shuffle feeds it)
    and runs ONCE (checkpointed — three consumers downstream); banding
    doubles rows THEN shuffles on (band, key); the occupancy count is a
    partial+final hash agg whose tiny survivor list broadcasts back onto
    the band rows; the self-join is an equi-join with cap-bounded
    per-bucket fan-out; hamming filter prunes before the distinct."""
    from e_commerce_click_stream_spark.operators.multimodal import content_phash

    h = content_phash(
        with_binary_payload(spread(table(spark, sf_dir, "documents")))
    ).localCheckpoint(eager=True)
    bands = h.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.col("phash").bitwiseAND(F.lit(_PHASH_BAND_MASK)).alias("key"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.shiftright("phash", _PHASH_BAND_BITS).alias("key"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "phash", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    kept = (
        bands.groupBy("band", "key")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") <= PHASH_BUCKET_CAP)
        .select("band", "key")
    )
    # post-agg size is unknown at plan time (SMJ would be planned);
    # the survivor list is <= 2 * 2^band_bits rows — always broadcast
    bands = bands.join(F.broadcast(kept), ["band", "key"])
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("phash").alias("phash_a"), "band", "key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("phash").alias("phash_b"), "band", "key"
    )
    hamming = F.bit_count(F.col("phash_a").bitwiseXOR(F.col("phash_b"))).cast("long")
    # hamming verify BEFORE the distinct: only in-radius pairs pay the
    # dedup exchange, not every band-bucket collision
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(hamming <= PHASH_HAMMING_T)
        .select("doc_a", "doc_b", "phash_a", "phash_b")
        .distinct()
        .select("doc_a", "doc_b", "phash_a", "phash_b", hamming.alias("hamming"))
    )
