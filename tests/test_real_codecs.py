"""multimodal/codecs.decode_wav_meta / decode_bmp_meta: REAL media
bytes (generated with the standard library — ``wave`` for RIFF/PCM16,
``struct`` for BMP) parsed back through the Arrow mapInPandas stages.
This is the one corner of the multimodal tier where no third-party
codec is needed, so the decode is the real thing, not the documented
fake; malformed payloads must quarantine (ok = 0), not abort."""

from __future__ import annotations

import io
import math
import struct
import wave

from aichemy_data_pipelines_spark.multimodal.codecs import (
    MEDIA_SCHEMA,
    decode_bmp_meta,
    decode_wav_meta,
)


def _wav_bytes(rate=8000, samples=(0, 1000, -1000, 32767, -32768)):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue(), samples


def _bmp_bytes(w=3, h=2, bgr=(10, 20, 30)):
    stride = (w * 3 + 3) & ~3
    row = (bytes(bgr) * w).ljust(stride, b"\x00")
    pixels = row * h
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + info + pixels


def _media_df(spark, rows):
    return spark.createDataFrame(
        [(i, "x", payload, 0, 0) for i, payload in enumerate(rows)],
        MEDIA_SCHEMA,
    )


def test_wav_roundtrip_and_quarantine(spark):
    payload, samples = _wav_bytes()
    df = _media_df(spark, [payload, b"not a wav at all"])
    got = {r.doc_id: r for r in decode_wav_meta(df).collect()}
    r = got[0]
    assert (r.ok, r.sample_rate, r.n_channels, r.bits) == (1, 8000, 1, 16)
    assert r.n_samples == len(samples)
    assert r.duration_ms == len(samples) * 1000 // 8000
    want_rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    assert r.rms == f"{want_rms:.6f}"
    assert got[1].ok == 0 and got[1].sample_rate is None


def test_bmp_roundtrip_and_quarantine(spark):
    df = _media_df(
        spark, [_bmp_bytes(), b"BM but truncated", b"\x89PNG not supported"]
    )
    got = {r.doc_id: r for r in decode_bmp_meta(df).collect()}
    r = got[0]
    assert (r.ok, r.width, r.height, r.bpp) == (1, 3, 2, 24)
    # constant BGR=(10,20,30): luma = (299*30 + 587*20 + 114*10) / 1000
    want = (299 * 30 + 587 * 20 + 114 * 10) / 1000
    assert r.mean_lum == f"{want:.6f}"
    assert got[1].ok == 0
    assert got[2].ok == 0


def test_stages_are_arrow_batched_not_row_udfs(spark):
    plan = (
        decode_wav_meta(_media_df(spark, [b"x"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
