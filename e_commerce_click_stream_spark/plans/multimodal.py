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
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_fp,
       (ascii(substr(md5(text), 1, 1)) * 256 + ascii(substr(md5(text), 2, 1))) % 1024 + 16
           AS width,
       (ascii(substr(md5(text), 3, 1)) * 256 + ascii(substr(md5(text), 4, 1))) % 1024 + 16
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
       unnest(range((octet_length(encode(text)) + 63) // 64)) AS frame_idx,
       unnest(range((octet_length(encode(text)) + 63) // 64)) * 64 AS offset
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
           (ascii(substr(md5(text), 1, 1)) * 256 + ascii(substr(md5(text), 2, 1))) % 1024 + 16
               AS width,
           (ascii(substr(md5(text), 3, 1)) * 256 + ascii(substr(md5(text), 4, 1))) % 1024 + 16
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
       list_transform(range(8), i -> ascii(substr(md5(text), (i + 1)::INT, 1)) / 255.0)
           AS features
FROM documents
"""


@register("multimodal_feature_extract", oracle=_FEATURES_SQL, tags=("multimodal", "pandas-udf"))
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload → fixed-length float feature vector through the real
    Arrow/mapInPandas plumbing (the encoder is the md5-derived stub). The
    output column shape (array<double>) is exactly what the similarity
    queries consume — payload in, ANN-ready vectors out."""
    docs = with_binary_payload(spread(table(spark, sf_dir, "documents")))
    return extract_features(docs, n_features=8)
