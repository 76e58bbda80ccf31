"""Multimodal plumbing: schema, Arrow batch shape, frame sampling
fan-out, stubbed resize."""

from __future__ import annotations

import hashlib

import pytest

from aichemy_data_pipelines_spark.multimodal.codecs import (
    HAVE_PIL,
    decode_features,
    frame_sample,
    resize_image,
    synthetic_media,
)
from tests.conftest import SF_SMOKE


def test_media_schema_and_determinism(spark):
    m = synthetic_media(spark, SF_SMOKE)
    assert [f.name for f in m.schema.fields] == [
        "doc_id", "mime", "payload", "declared_w", "declared_h",
    ]
    rows = {r.doc_id: r for r in m.collect()}
    r0 = rows[0]
    assert isinstance(r0.payload, (bytes, bytearray)) and len(r0.payload) == 32
    assert r0.mime == "image/png" and rows[1].mime == "audio/wav"
    # payload is md5(text) || md5(reverse(text)) — recompute in python
    doc0 = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where("doc_id = 0")
        .collect()[0]
    )
    want = hashlib.md5(doc0.text.encode()).digest() + hashlib.md5(
        doc0.text[::-1].encode()
    ).digest()
    assert bytes(r0.payload) == want


def test_decode_features_matches_python(spark):
    m = synthetic_media(spark, SF_SMOKE)
    feats = {r.doc_id: r for r in decode_features(m).collect()}
    raw = {r.doc_id: bytes(r.payload) for r in m.collect()}
    for doc_id in list(raw)[:20]:
        b, f = raw[doc_id], feats[doc_id]
        assert f.n_bytes == 32
        assert f.lead_byte == b[0]
        assert f.byte_sum_mod == sum(b) % 256
        assert f.phash == hashlib.md5(b.hex().encode()).hexdigest()


def test_frame_sample_only_video_and_stride(spark):
    m = synthetic_media(spark, SF_SMOKE)
    frames = frame_sample(m, every=4)
    rows = frames.collect()
    video_ids = {r.doc_id for r in m.where("mime = 'video/mp4'").collect()}
    assert {r.doc_id for r in rows} == video_ids
    per_doc = [r for r in rows if r.doc_id == min(video_ids)]
    # 32 bytes -> 8 4-byte frames -> stride 4 keeps idx 0 and 4
    assert sorted(r.frame_idx for r in per_doc) == [0, 4]
    # frame_hash = md5 over the frame's hex encoding (oracle-checkable)
    import hashlib

    payload = {
        r.doc_id: bytes(r.payload)
        for r in m.where("mime = 'video/mp4'").collect()
    }
    for r in per_doc:
        frame = payload[r.doc_id][r.frame_idx * 4 : r.frame_idx * 4 + 4]
        assert r.frame_hash == hashlib.md5(frame.hex().encode()).hexdigest()


def test_resize_is_explicitly_stubbed(spark):
    if HAVE_PIL:
        pytest.skip("PIL present; stub not applicable")
    with pytest.raises(NotImplementedError, match="PIL"):
        resize_image(synthetic_media(spark, SF_SMOKE), 64, 64)
