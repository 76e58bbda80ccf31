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


def _media_df(spark, rows):
    """rows: [(doc_id, payload_bytes)] -> media frame (all images)."""
    return spark.createDataFrame(
        [(i, "image/png", bytearray(p), 64, 64) for i, p in rows],
        "doc_id long, mime string, payload binary, declared_w int, declared_h int",
    )


def test_image_ahash_locality_and_recall(spark):
    """Near-identical payloads (<=3 perturbed bytes) MUST pair up
    (banding has pigeonhole-perfect recall at hamming<=3); unrelated
    random payloads must not."""


    from pyspark.sql import functions as F

    from aichemy_data_pipelines_spark.operators.multimodal_ops import (
        image_ahash,
    )

    # bimodal payload: the 10/200 margin around the mean absorbs the
    # mean shift a few byte edits cause, so k edits -> exactly k bit
    # flips (aHash locality is only guaranteed away from the mean)
    base = bytes([10] * 16 + [200] * 16)
    near = bytearray(base)
    near[5] = 200  # one dark byte goes bright
    near2 = bytearray(base)
    for i in (1, 9, 22):
        near2[i] = 200 if base[i] == 10 else 10
    far = bytes([200] * 16 + [10] * 16)  # full inversion
    rows = [(0, base), (1, bytes(near)), (2, bytes(near2)), (3, far)]

    h = {r.doc_id: r.ahash for r in image_ahash(_media_df(spark, rows)).collect()}
    def ham(a, b):
        return bin(h[a] ^ h[b]).count("1")

    # locality: k byte flips -> at most k bit flips
    assert ham(0, 1) <= 1
    assert ham(0, 2) <= 3
    assert ham(0, 3) > 3  # random 32-bit hashes ~16 apart


def test_multimodal_image_phash_counts(spark, tmp_path):
    """End-to-end on a crafted corpus routed through synthetic_media:
    exact-dup texts (identical payloads) count each other; singletons
    report 0."""
    from aichemy_data_pipelines_spark.operators.multimodal_ops import (
        multimodal_image_phash,
    )

    # doc_id % 3 == 0 -> image mime; 0/3/6 share text, 9 is alone
    rows = [
        (0, "the quick brown fox", "en", "web", 19),
        (3, "the quick brown fox", "en", "web", 19),
        (6, "the quick brown fox", "en", "web", 19),
        (9, "completely different text entirely", "en", "web", 34),
        (1, "not an image", "en", "web", 12),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        r.doc_id: r.n_near_dups
        for r in multimodal_image_phash(spark, str(tmp_path)).collect()
    }
    assert got == {0: 2, 3: 2, 6: 2, 9: 0}


def test_scene_cuts_ground_truth(spark):
    """Recompute intensities/deltas from the payload bytes in pure
    Python; every consecutive-frame pair of every video must match."""
    import hashlib

    from aichemy_data_pipelines_spark.operators.multimodal_ops import (
        _CUT_THRESHOLD,
        _FRAME_BYTES,
        _N_FRAMES,
        multimodal_scene_cuts,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    expected = {}
    n_videos = 0
    for r in docs:
        if r.doc_id % 3 != 2:  # video/mp4 slice
            continue
        n_videos += 1
        payload = bytes.fromhex(
            hashlib.md5(r.text.encode()).hexdigest()
            + hashlib.md5(r.text[::-1].encode()).hexdigest()
        )
        sums = [
            sum(payload[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES])
            for i in range(_N_FRAMES)
        ]
        for i in range(1, _N_FRAMES):
            delta = abs(sums[i] - sums[i - 1])
            expected[(r.doc_id, i)] = (
                sums[i],
                delta,
                delta > _CUT_THRESHOLD,
            )

    rows = multimodal_scene_cuts(spark, SF_SMOKE).collect()
    got = {
        (r.doc_id, r.frame_idx): (r.intensity, r.delta, r.is_cut)
        for r in rows
    }
    assert got == expected
    assert len(rows) == n_videos * (_N_FRAMES - 1)
    # random payloads make some cuts near-certain at this threshold
    assert any(r.is_cut for r in rows)
