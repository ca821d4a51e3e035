"""Multimodal plumbing unit tests: binary schema, Arrow batch path, stub
codec gating."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from e_commerce_click_stream_spark.io import table
from e_commerce_click_stream_spark.operators.multimodal import (
    _real_decode,
    decode_metadata,
    extract_features,
    frame_sample,
    resize_plan,
    with_binary_payload,
)
from tests.conftest import SF_SMOKE


def test_payload_schema(spark):
    docs = with_binary_payload(table(spark, SF_SMOKE, "documents"))
    assert isinstance(docs.schema["payload"].dataType, T.BinaryType)
    meta = docs.schema["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert [f.name for f in meta.fields] == ["n_bytes", "content_type"]


def test_decode_roundtrip(spark):
    docs = with_binary_payload(table(spark, SF_SMOKE, "documents"))
    out = decode_metadata(docs)
    row = out.orderBy("doc_id").first()
    assert row.n_bytes > 0
    assert len(row.content_fp) == 32
    assert 16 <= row.width < 1040 and 16 <= row.height < 1040
    assert row.decoder == "fake-md5"
    assert out.count() == docs.count()


def test_real_codec_is_gated():
    with pytest.raises(NotImplementedError):
        _real_decode(b"not-an-image")


def test_frame_sample_offsets(spark):
    docs = with_binary_payload(table(spark, SF_SMOKE, "documents"))
    frames = frame_sample(docs, every_n_bytes=64)
    first = frames.filter("doc_id = 0").orderBy("frame_idx").collect()
    assert [f.offset for f in first] == [i * 64 for i in range(len(first))]


def test_resize_plan_never_upscales(spark):
    docs = with_binary_payload(table(spark, SF_SMOKE, "documents"))
    plan = resize_plan(decode_metadata(docs), max_side=256).collect()
    for r in plan:
        assert max(r.target_width, r.target_height) <= 256
        if r.resized:
            # aspect ratio preserved within integer-division truncation
            assert r.target_width <= r.width and r.target_height <= r.height
            assert max(r.target_width, r.target_height) == 256
        else:
            assert (r.target_width, r.target_height) == (r.width, r.height)


def test_feature_extract_shape(spark):
    docs = with_binary_payload(table(spark, SF_SMOKE, "documents"))
    feats = extract_features(docs, n_features=8)
    assert isinstance(feats.schema["features"].dataType, T.ArrayType)
    rows = feats.collect()
    assert len(rows) == docs.count()
    for r in rows[:5]:
        assert len(r.features) == 8
        assert all(0.0 <= x <= 1.0 for x in r.features)
