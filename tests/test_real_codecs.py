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


def _png_chunk(cid: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + cid
        + body
        + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
    )


def _png_filter_row(ftype, line, prior, bpp):
    """Apply PNG filter ``ftype`` FORWARD to a raw scanline — the
    encoder side of the five filters, so the test proves the decoder
    inverts every one of them."""
    out = bytearray([ftype])
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prior[i]
        c = prior[i - bpp] if i >= bpp else 0
        if ftype == 0:
            v = line[i]
        elif ftype == 1:
            v = line[i] - a
        elif ftype == 2:
            v = line[i] - b
        elif ftype == 3:
            v = line[i] - ((a + b) >> 1)
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if pa <= pb and pa <= pc else b if pb <= pc else c
            v = line[i] - pr
        out.append(v & 0xFF)
    return bytes(out)


def _png_bytes(pixels, channels=3, filters=None):
    """Minimal PNG writer: ``pixels`` is rows of per-pixel tuples
    (len == channels); one filter type per row (default cycling
    0..4 so every filter is exercised)."""
    import zlib

    h = len(pixels)
    w = len(pixels[0])
    ctype = {1: 0, 3: 2, 4: 6}[channels]
    raw = b""
    prior = bytes(w * channels)
    for r, row in enumerate(pixels):
        line = bytes(v for px in row for v in px)
        fl = filters or [0, 1, 2, 3, 4]
        ftype = fl[r % len(fl)]
        raw += _png_filter_row(ftype, line, prior, channels)
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _lum6(pixels, channels):
    total, npx = 0, 0
    for row in pixels:
        for px in row:
            rd, g, bl = (px[0],) * 3 if channels == 1 else px[:3]
            total += 299 * rd + 587 * g + 114 * bl
            npx += 1
    return f"{total / (npx * 1000):.6f}"


def test_png_meta_decodes_all_filter_types(spark):
    """A 4x5 truecolor PNG whose five rows use filter types 0..4
    (the writer applies them FORWARD) must decode to the exact
    ITU-R 601 mean luminance of the raw pixels — proving IDAT
    inflate + every unfilter path."""
    from aichemy_data_pipelines_spark.multimodal.codecs import (
        decode_png_meta,
    )

    pixels = [
        [((r * 53 + c * 17 + ch * 31) % 256 for ch in range(3))
         for c in range(4)]
        for r in range(5)
    ]
    pixels = [[tuple(px) for px in row] for row in pixels]
    png = _png_bytes(pixels, channels=3)
    got = decode_png_meta(_media_df(spark, [png])).collect()[0]
    assert (got.ok, got.width, got.height) == (1, 4, 5)
    assert (got.bit_depth, got.color_type) == (8, 2)
    assert got.mean_lum == _lum6(pixels, 3)


def test_png_meta_grey_and_rgba(spark):
    """Greyscale (R=G=B luma) and RGBA (alpha ignored) decode; the
    Paeth-only filter choice covers the c-operand (upper-left)
    branch that the cycling test reaches only on later rows."""
    from aichemy_data_pipelines_spark.multimodal.codecs import (
        decode_png_meta,
    )

    grey = [[(v,) for v in (0, 128, 255)], [(v,) for v in (7, 19, 200)]]
    rgba = [
        [(10, 20, 30, 0), (200, 100, 50, 255)],
        [(1, 2, 3, 9), (250, 251, 252, 13)],
    ]
    df = _media_df(
        spark,
        [
            _png_bytes(grey, channels=1, filters=[4]),
            _png_bytes(rgba, channels=4, filters=[4]),
        ],
    )
    got = {r.doc_id: r for r in decode_png_meta(df).collect()}
    assert got[0].ok == 1 and got[0].color_type == 0
    assert got[0].mean_lum == _lum6(grey, 1)
    assert got[1].ok == 1 and got[1].color_type == 6
    assert got[1].mean_lum == _lum6(rgba, 4)


def test_png_meta_quarantines_unsupported(spark):
    """Palette/16-bit/interlaced/truncated/garbage payloads must
    yield ok=0 rows (quarantine), never abort the batch."""
    import zlib

    from aichemy_data_pipelines_spark.multimodal.codecs import (
        decode_png_meta,
    )

    def ihdr_png(depth=8, ctype=2, inter=0, idat=None):
        ihdr = struct.pack(">IIBBBBB", 2, 1, depth, ctype, 0, 0, inter)
        body = idat if idat is not None else zlib.compress(b"\x00" + b"\x01" * 6)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", body)
            + _png_chunk(b"IEND", b"")
        )

    good = _png_bytes([[(9, 9, 9), (1, 2, 3)]], channels=3)
    rows = [
        ihdr_png(ctype=3),           # palette
        ihdr_png(depth=16),          # 16-bit
        ihdr_png(inter=1),           # interlaced (Adam7)
        ihdr_png(idat=zlib.compress(b"\x00\x01")),  # truncated raster
        ihdr_png(idat=b"not-deflate"),              # corrupt IDAT
        b"GIF89a totally not a png",                # wrong signature
        good,
    ]
    got = {r.doc_id: r for r in decode_png_meta(_media_df(spark, rows)).collect()}
    assert [got[i].ok for i in range(7)] == [0, 0, 0, 0, 0, 0, 1]
    assert got[6].mean_lum == _lum6([[(9, 9, 9), (1, 2, 3)]], 3)
    # status column (r15 ADVICE #5): policy quarantine distinguishable
    # from corruption — valid-but-outside-subset payloads say so
    assert [got[i].status for i in range(7)] == [
        "unsupported", "unsupported", "unsupported",
        "malformed", "malformed", "malformed", "ok",
    ]


def test_png_meta_quarantines_decompression_bomb(spark):
    """A PNG whose IDAT inflates far beyond the header raster (or
    whose header promises a multi-GB raster) must quarantine as
    ok=0 without inflating unboundedly — the inflate is capped at
    the header-promised size, which is itself capped at 64 MB (r15
    self-review finding #2)."""
    import zlib

    from aichemy_data_pipelines_spark.multimodal.codecs import (
        decode_png_meta,
    )

    # tiny declared raster, 10 MB of inflate behind it
    bomb_idat = zlib.compress(b"\x00" * (10 << 20), 9)
    small_hdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", small_hdr)
        + _png_chunk(b"IDAT", bomb_idat)
        + _png_chunk(b"IEND", b"")
    )
    # header promises a ~17 GB raster (75000 x 75000 RGB)
    huge_hdr = struct.pack(">IIBBBBB", 75000, 75000, 8, 2, 0, 0, 0)
    huge = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", huge_hdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + _png_chunk(b"IEND", b"")
    )
    good = _png_bytes([[(9, 9, 9), (1, 2, 3)]], channels=3)
    got = {
        r.doc_id: r
        for r in decode_png_meta(
            _media_df(spark, [bomb, huge, good])
        ).collect()
    }
    assert got[0].ok == 1, "bounded inflate still decodes the raster"
    assert got[1].ok == 0
    assert got[1].status == "too_large", (
        "the 64 MB cap is POLICY, not corruption -- status must say so"
    )
    assert got[2].ok == 1 and got[2].status == "ok"
