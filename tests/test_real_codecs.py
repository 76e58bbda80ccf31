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


# -- baseline JPEG (r17) ------------------------------------------------
# A from-scratch baseline ENCODER (FDCT + canonical Huffman built from
# the symbols actually used + byte stuffing + restart markers), so the
# decoder (multimodal/codecs.decode_jpeg_meta) is proven against real
# SOF0 bitstreams it did not write. With an all-ones quant table a
# per-8x8-constant raster round-trips EXACTLY (DC = 8*(v-128) is
# integral, ACs are 0), so the mean-luma comparison is string-equal;
# full-AC content is compared within DCT rounding tolerance.

_JZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
    28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
    37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
    54, 47, 55, 62, 63,
]


class _JBitWriter:
    def __init__(self):
        self.out, self.acc, self.nbits = bytearray(), 0, 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nbits = 0, 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits


def _jcat(v: int) -> int:
    return abs(v).bit_length()


def _jmag(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _jcanonical(symbols, length):
    """All symbols at one code length (never the all-ones code);
    returns ({sym: (code, len)}, BITS16, HUFFVAL)."""
    assert len(symbols) <= (1 << length) - 1
    codes = {s: (i, length) for i, s in enumerate(symbols)}
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return codes, bits, list(symbols)


def _jpeg_bytes(planes, samps, w, h, quant=None, restart=0):
    """Baseline JPEG writer. ``planes``: per-component 2D uint8
    arrays at their OWN sampled geometry; ``samps``: [(h_i, v_i)];
    (w, h): declared luma dims; ``quant``: 64 ints zigzag (default
    all-ones — the exactness trick above)."""
    import numpy as np

    q = quant or [1] * 64
    nc = len(planes)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    xs = np.arange(8)
    cm = np.cos((2 * xs[None, :] + 1) * xs[:, None] * np.pi / 16) * 0.5
    cm[0, :] *= 1 / np.sqrt(2.0)

    padded = []
    for pl, (sh, sv) in zip(planes, samps):
        pl = np.asarray(pl)
        ph, pw = mcuy * sv * 8 - pl.shape[0], mcux * sh * 8 - pl.shape[1]
        padded.append(np.pad(pl, ((0, ph), (0, pw)), mode="edge"))

    def coeffs(block):
        fm = cm @ (block.astype(np.float64) - 128.0) @ cm.T
        return [int(round(fm.flat[_JZZ[zz]] / q[zz])) for zz in range(64)]

    dc_syms, ac_syms = [set(), set()], [set(), set()]
    units, pred = [], [0] * nc
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            pred = [0] * nc
        my, mx = divmod(m, mcux)
        for ci in range(nc):
            sh, sv = samps[ci]
            tcls = 0 if ci == 0 else 1
            for by in range(sv):
                for bx in range(sh):
                    r0, c0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                    coef = coeffs(padded[ci][r0:r0 + 8, c0:c0 + 8])
                    diff, pred[ci] = coef[0] - pred[ci], coef[0]
                    t = _jcat(diff)
                    dc_syms[tcls].add(t)
                    acs, run = [], 0
                    for k in range(1, 64):
                        v = coef[k]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            acs.append((0xF0, 0, 0))
                            ac_syms[tcls].add(0xF0)
                            run -= 16
                        s = _jcat(v)
                        acs.append(((run << 4) | s, v, s))
                        ac_syms[tcls].add((run << 4) | s)
                        run = 0
                    if run:
                        acs.append((0x00, 0, 0))
                        ac_syms[tcls].add(0x00)
                    units.append((tcls, t, diff, acs))

    dc_tabs, ac_tabs, dht = [], [], b""
    for tcls in range(2 if nc > 1 else 1):
        dcodes, dbits, dvals = _jcanonical(sorted(dc_syms[tcls]) or [0], 5)
        acodes, abits, avals = _jcanonical(sorted(ac_syms[tcls]) or [0], 9)
        dc_tabs.append(dcodes)
        ac_tabs.append(acodes)
        bd = bytes([0x00 | tcls]) + bytes(dbits) + bytes(dvals)
        ba = bytes([0x10 | tcls]) + bytes(abits) + bytes(avals)
        dht += b"\xff\xc4" + struct.pack(">H", 2 + len(bd)) + bd
        dht += b"\xff\xc4" + struct.pack(">H", 2 + len(ba)) + ba

    bw, data, ui, rst = _JBitWriter(), bytearray(), 0, 0
    per_mcu = sum(s[0] * s[1] for s in samps)
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            bw.flush()
            data += bw.out
            bw = _JBitWriter()
            data += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
        for _ in range(per_mcu):
            tcls, t, diff, acs = units[ui]
            ui += 1
            code, ln = dc_tabs[tcls][t]
            bw.write(code, ln)
            if t:
                bw.write(_jmag(diff, t), t)
            for sym, v, s in acs:
                code, ln = ac_tabs[tcls][sym]
                bw.write(code, ln)
                if s:
                    bw.write(_jmag(v, s), s)
    bw.flush()
    data += bw.out

    out = b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + bytes(q)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (samps[ci][0] << 4) | samps[ci][1], 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += dht
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytes([nc])
    for ci in range(nc):
        tcls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tcls << 4) | tcls])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    return out + bytes(data) + b"\xff\xd9"


def test_jpeg_grayscale_exact_and_padding_crop(spark):
    """Per-8x8-constant 11x5 grayscale (non-multiple-of-8 dims → MCU
    padding must be cropped before the mean): exact string match."""
    import numpy as np

    from aichemy_data_pipelines_spark.multimodal.codecs import (
        decode_jpeg_meta,
    )

    img = np.zeros((5, 11), dtype=np.uint8)
    img[:, :8] = 40
    img[:, 8:] = 200
    payload = _jpeg_bytes([img], [(1, 1)], 11, 5)
    # T.81 A.2: a single-component scan is NON-interleaved — sampling
    # factors are ignored, so the same bitstream with the SOF
    # sampling byte patched 1x1 -> 2x2 must decode identically
    # (an interleaved reading would bit-starve on 4x the data units)
    si = payload.index(b"\xff\xc0") + 11
    patched = payload[:si] + bytes([0x22]) + payload[si + 1:]
    got = {
        r.doc_id: r
        for r in decode_jpeg_meta(
            _media_df(spark, [payload, patched])
        ).collect()
    }
    for r in (got[0], got[1]):
        assert (r.ok, r.status, r.width, r.height) == (1, "ok", 11, 5)
        assert r.n_components == 1
        assert r.mean_lum == f"{img.mean():.6f}"


def test_jpeg_color_444_and_420_exact(spark):
    """YCbCr 4:4:4 and 4:2:0: the decoder entropy-decodes the
    interleaved chroma (it cannot be skipped) but reports the Y mean;
    constant-per-block Y rasters are exact."""
    import numpy as np

    from aichemy_data_pipelines_spark.multimodal.codecs import (
        decode_jpeg_meta,
    )

    y1 = np.full((8, 8), 77, dtype=np.uint8)
    c1 = np.full((8, 8), 10, dtype=np.uint8)
    y2 = np.zeros((16, 16), dtype=np.uint8)
    y2[:8, :8], y2[:8, 8:], y2[8:, :8], y2[8:, 8:] = 10, 60, 130, 220
    c2 = np.full((8, 8), 200, dtype=np.uint8)
    df = _media_df(
        spark,
        [
            _jpeg_bytes([y1, c1, c1], [(1, 1)] * 3, 8, 8),
            _jpeg_bytes([y2, c2, c2], [(2, 2), (1, 1), (1, 1)], 16, 16),
        ],
    )
    got = {r.doc_id: r for r in decode_jpeg_meta(df).collect()}
    assert got[0].ok == 1 and got[0].n_components == 3
    assert got[0].mean_lum == f"{y1.mean():.6f}"
    assert got[1].ok == 1
    assert got[1].mean_lum == f"{y2.mean():.6f}"


def test_jpeg_full_ac_content_and_restarts(spark):
    """Non-constant raster exercises the AC/ZRL/EOB + zigzag +
    dequant + IDCT paths (tolerance: DCT rounding); the restart
    variant must decode to the identical value (DC predictor resets +
    byte-aligned RSTn segmentation)."""
    import numpy as np

    from aichemy_data_pipelines_spark.multimodal.codecs import (
        decode_jpeg_meta,
    )

    img = (np.arange(16 * 24).reshape(16, 24) * 7 % 256).astype(np.uint8)
    plain = _jpeg_bytes([img], [(1, 1)], 24, 16)
    rst = _jpeg_bytes([img], [(1, 1)], 24, 16, restart=2)
    got = {
        r.doc_id: r
        for r in decode_jpeg_meta(_media_df(spark, [plain, rst])).collect()
    }
    assert got[0].ok == 1 and got[1].ok == 1
    assert abs(float(got[0].mean_lum) - img.mean()) < 0.5
    assert got[0].mean_lum == got[1].mean_lum
    # quantized variant (a real table's worth of loss) still lands
    # within a coarse bound — proves dequantization multiplies back
    q = [16] * 64
    lossy = _jpeg_bytes([img], [(1, 1)], 24, 16, quant=q)
    r = decode_jpeg_meta(_media_df(spark, [lossy])).collect()[0]
    assert r.ok == 1
    assert abs(float(r.mean_lum) - img.mean()) < 4.0


def test_jpeg_quarantine_statuses(spark):
    """Policy vs corruption vs unsupported — the decode_png_meta
    status contract applied to JPEG."""
    import numpy as np

    from aichemy_data_pipelines_spark.multimodal.codecs import (
        decode_jpeg_meta,
    )

    img = np.full((8, 8), 99, dtype=np.uint8)
    good = _jpeg_bytes([img], [(1, 1)], 8, 8)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)  # SOF2
    trunc = good[: len(good) - 6]
    i = good.index(b"\xff\xdb") + 4
    dqt16 = good[:i] + bytes([0x10]) + good[i + 1:]
    j = good.index(b"\xff\xc0") + 5
    huge = good[:j] + struct.pack(">HH", 5000, 5000) + good[j + 4:]
    k = good.index(b"\xff\xc0") + 11
    samp4 = good[:k] + bytes([0x44]) + good[k + 1:]
    # legal 0xFF fill bytes before a marker must still decode
    fi = good.index(b"\xff\xc0")
    filled = good[:fi] + b"\xff\xff\xff" + good[fi:]
    rows = [
        good, prog, trunc, dqt16, huge, samp4,
        b"\xff\xd8nope", b"", filled,
    ]
    got = {
        r.doc_id: r
        for r in decode_jpeg_meta(_media_df(spark, rows)).collect()
    }
    assert [got[i].ok for i in range(9)] == [1, 0, 0, 0, 0, 0, 0, 0, 1]
    assert [got[i].status for i in range(9)] == [
        "ok", "unsupported", "malformed", "unsupported",
        "too_large", "unsupported", "malformed", "malformed", "ok",
    ]
    assert got[8].mean_lum == got[0].mean_lum


def test_jpeg_tem_marker_and_non_ycbcr_gate(spark):
    """r17 ADVICE #1/#2: (a) a standalone TEM marker (0xFF01) between
    header segments is parameterless and legal — the decoder must
    skip it like SOI/RSTn, not parse a bogus length and reject the
    file; (b) a 3-component SOF0 whose component ids are NOT the
    JFIF YCbCr convention (1,2,3) — e.g. Adobe 'R','G','B' — must
    quarantine as ``unsupported`` instead of decoding "ok" with the
    wrong channel's mean reported as mean_lum."""
    import numpy as np

    from aichemy_data_pipelines_spark.multimodal.codecs import (
        decode_jpeg_meta,
    )

    img = np.full((8, 8), 99, dtype=np.uint8)
    good = _jpeg_bytes([img], [(1, 1)], 8, 8)
    fi = good.index(b"\xff\xc0")
    tem = good[:fi] + b"\xff\x01" + good[fi:]

    y = np.full((8, 8), 77, dtype=np.uint8)
    c = np.full((8, 8), 10, dtype=np.uint8)
    color = _jpeg_bytes([y, c, c], [(1, 1)] * 3, 8, 8)
    # patch component ids 1,2,3 -> 'R','G','B' in BOTH SOF and SOS
    si = color.index(b"\xff\xc0") + 10  # first comp id in SOF
    rgb = bytearray(color)
    for ci, cid in enumerate(b"RGB"):
        rgb[si + 3 * ci] = cid
    ss = color.index(b"\xff\xda") + 5  # first comp id in SOS
    for ci, cid in enumerate(b"RGB"):
        rgb[ss + 2 * ci] = cid
    got = {
        r.doc_id: r
        for r in decode_jpeg_meta(
            _media_df(spark, [tem, bytes(rgb), color])
        ).collect()
    }
    assert (got[0].ok, got[0].status) == (1, "ok")
    assert got[0].mean_lum == f"{img.mean():.6f}"
    assert (got[1].ok, got[1].status) == (0, "unsupported")
    assert (got[2].ok, got[2].status) == (1, "ok")  # control
