"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as parquet ``binary`` columns with a
metadata struct alongside; the Spark-side plumbing here — schemas, Arrow
batch shapes, mapInPandas signatures, partitioning — is real and tested.
The actual codec work (JPEG decode, resampling, frame extraction) is
STUBBED: the container has no image/audio libraries, so ``decode_image``
tries Pillow behind an import-guard and otherwise falls back to a
deterministic md5-derived fake decode (clearly marked). Swap `_fake_decode`
for the real codec on a cluster with the libs installed; nothing else
changes.

Scale notes: decode runs via ``mapInPandas`` so payload bytes stream
through Arrow record batches partition-locally — no shuffle, no driver
involvement; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
payload-size-bounded regardless of corpus size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_fp string, "
    "width int, height int, n_channels int, decoder string"
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct, the storage
    shape a multimodal table uses (payload: binary, meta: struct). A NULL
    source column becomes an EMPTY payload, not a NULL one — downstream
    Arrow batches then never carry None where the decode expects bytes
    (mirrors a production ingest writing b'' for failed fetches)."""
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("content_type"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int, int, str]:
    """Deterministic stand-in for an image decode: dimensions derived from
    the payload's md5 via ascii-of-hex-char arithmetic (reproducible in SQL
    for the oracle check)."""
    fp = hashlib.md5(payload).hexdigest()
    width = (ord(fp[0]) * 256 + ord(fp[1])) % 1024 + 16
    height = (ord(fp[2]) * 256 + ord(fp[3])) % 1024 + 16
    return fp, width, height, 3, "fake-md5"


def _real_decode(payload: bytes) -> tuple[str, int, int, int, str]:
    """Real image decode — requires Pillow, absent in this container."""
    try:
        import io

        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - no PIL here
        raise NotImplementedError(
            "image decode requires Pillow; install it or use the fake decoder"
        ) from exc
    img = Image.open(io.BytesIO(payload))  # pragma: no cover
    fp = hashlib.md5(payload).hexdigest()  # pragma: no cover
    return fp, img.width, img.height, len(img.getbands()), "pillow"  # pragma: no cover


def decode_batches(use_real_codec: bool = False):
    """mapInPandas function: binary payloads in, decoded metadata out."""
    decode = _real_decode if use_real_codec else _fake_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "content_fp": [r[0] for r in rows],
                    "width": pd.Series([r[1] for r in rows], dtype="int32"),
                    "height": pd.Series([r[2] for r in rows], dtype="int32"),
                    "n_channels": pd.Series([r[3] for r in rows], dtype="int32"),
                    "decoder": [r[4] for r in rows],
                }
            )

    return fn


def decode_metadata(docs_with_payload: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Decode the payload column into typed metadata via Arrow-batched
    mapInPandas (partition-local, no shuffle)."""
    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        decode_batches(use_real_codec), schema=DECODED_SCHEMA
    )


def frame_sample(docs_with_payload: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over an opaque byte stream: deterministic byte-range
    chunks every N bytes (the video-path plumbing: one row per sampled
    frame, chunk offsets carried alongside). Pure built-in expressions.

    Zero-byte payloads are filtered BEFORE the explode: they yield no
    frames, and sequence(0, n-1) raises on n=0 ("Illegal sequence
    boundaries: 0 to -1") — found by the edge-corpus parity matrix."""
    n = F.octet_length(F.col("payload"))
    offsets = F.sequence(F.lit(0), n - 1, F.lit(every_n_bytes))
    return docs_with_payload.filter(n > 0).select(
        "doc_id", F.posexplode(offsets).alias("frame_idx", "offset")
    ).select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("offset").cast("long").alias("offset"),
    )


def resize_plan(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning over decoded dimensions: clamp the longer side to
    ``max_side`` preserving aspect ratio, never upscaling. All integer math
    (multiply-then-integer-divide) so the plan is engine-exact; the actual
    pixel resample belongs to the codec layer (stubbed, like the decode).
    Pure built-in expressions — this is metadata math, no Python hop."""
    longest = F.greatest("width", "height")
    fit = longest <= F.lit(max_side)
    target_w = F.when(fit, F.col("width")).otherwise(
        (F.col("width") * max_side).cast("long") / longest
    )
    target_h = F.when(fit, F.col("height")).otherwise(
        (F.col("height") * max_side).cast("long") / longest
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.floor(target_w).cast("long").alias("target_width"),
        F.floor(target_h).cast("long").alias("target_height"),
        (~fit).alias("resized"),
    )


FEATURES_SCHEMA = "doc_id bigint, features array<double>"


def feature_batches(n_features: int = 8):
    """mapInPandas function: payload bytes in, fixed-length float feature
    vector out. The embedding model is stubbed with md5-derived features
    (ascii of hex chars / 255.0 — bit-exact reproducible in SQL); swap the
    body for a real encoder on a cluster with the model libs."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "features": [
                        [ord(fp[i]) / 255.0 for i in range(n_features)] for fp in fps
                    ],
                }
            )

    return fn


def extract_features(docs_with_payload: DataFrame, n_features: int = 8) -> DataFrame:
    """Payload → fixed-length feature vector via Arrow-batched mapInPandas
    (partition-local, executor-memory bounded by Arrow batch size)."""
    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        feature_batches(n_features), schema=FEATURES_SCHEMA
    )


PHASH_BITS = 16  # fake-decode stand-in; a production pHash is 64-bit


def phash_batches():
    """mapInPandas function: binary payloads in, a 16-bit aHash-style
    content fingerprint out. The 'decode' is the UTF-8 payload's codepoint
    sequence (the deterministic stand-in for pixel luma — same contract as
    ``_fake_decode``); the hash itself is the REAL aHash construction:
    split the signal into 16 contiguous blocks, bit i set iff block i's
    mean exceeds the global mean (computed cross-multiplied in exact
    integer arithmetic so the oracle's SQL reproduces it bit-for-bit)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                cps = [ord(c) for c in bytes(p).decode("utf-8")]
                k = (len(cps) + PHASH_BITS - 1) // PHASH_BITS
                total = sum(cps)
                h = 0
                for i in range(PHASH_BITS):
                    if PHASH_BITS * sum(cps[i * k : i * k + k]) > total:
                        h |= 1 << i
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return fn


def content_phash(docs_with_payload: DataFrame) -> DataFrame:
    """(doc_id, phash) via Arrow-batched mapInPandas — partition-local,
    no shuffle; the perceptual-hash front half of a media near-dup pass."""
    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        phash_batches(), schema="doc_id bigint, phash bigint"
    )
