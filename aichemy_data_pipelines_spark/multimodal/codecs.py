"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
processed with Arrow-batched Pandas UDFs (``mapInPandas``).

The design a 100 TB training-data pipeline needs:

* media rides as a ``binary`` column next to typed metadata
  (mime/width/height/n_frames) — never exploded into rows of pixels;
* decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages so bytes cross the JVM↔Python boundary in
  Arrow record batches (one copy, vectorized), never row-at-a-time;
* partitioning: payloads stay where they are — every stage is a pure
  map, so the media table never shuffles; only extracted features
  (tiny) join onward.

Decode reality, by format: this container ships no image/audio libs,
so ``decode_features`` uses a deterministic byte-level fake
(documented below) and ``resize_image`` raises
``NotImplementedError`` unless PIL is importable — EXCEPT for the
formats the standard library can parse outright: ``decode_wav_meta``
(RIFF/PCM16), ``decode_bmp_meta`` (uncompressed 24-bit BMP) and
``decode_png_meta`` (8-bit grey/truecolor/RGBA PNG — zlib IDAT
inflate + full five-filter unfiltering) and ``decode_jpeg_meta``
(baseline SOF0 JPEG — Huffman entropy decode + IDCT of the Y
channel; r17) at the bottom of this module are REAL decoders over
real container bytes, tested against generated files
(tests/test_real_codecs.py). The Spark-side plumbing — schema, Arrow
batch shape, UDF signatures, partition behavior — is real and tested
everywhere (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from aichemy_data_pipelines_spark.catalog import load_table

try:  # real decoder path, absent in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("declared_w", IntegerType()),
        StructField("declared_h", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("lead_byte", IntegerType()),
        StructField("byte_sum_mod", IntegerType()),
        StructField("phash", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)

CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("chunk_hash", StringType()),
        StructField("byte_sum", LongType()),
    ]
)

_MIMES = ("image/png", "audio/wav", "video/mp4")


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 32-byte fake payload per document:
    unhex(md5(text) || md5(reverse(text))). Every value is derivable
    in plain SQL, so even the Pandas-UDF stage downstream is
    oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in _MIMES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("mime"),
        F.unhex(F.concat(F.md5("text"), F.md5(F.reverse(F.col("text"))))).alias(
            "payload"
        ),
        ((F.col("doc_id") % 4 + 1) * 64).cast("int").alias("declared_w"),
        ((F.col("doc_id") % 3 + 1) * 64).cast("int").alias("declared_h"),
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Fake decode (deterministic, no libs): n_bytes, first byte,
    byte-sum mod 256, and a hex 'perceptual hash' = md5 of the
    payload. With a real decoder this is where pixels would become
    embeddings; the batch shape and schema would not change.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "lead_byte": payloads.map(lambda b: b[0]).astype("int32"),
                    "byte_sum_mod": payloads.map(
                        lambda b: sum(b) % 256
                    ).astype("int32"),
                    # md5 over the hex encoding (not raw bytes) so
                    # SQL oracles can recompute it (DuckDB md5 takes
                    # VARCHAR only)
                    "phash": payloads.map(
                        lambda b: hashlib.md5(bytes(b).hex().encode()).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling for video payloads: treat each 4-byte block as
    a 'frame', keep every Nth, emit (doc_id, frame_idx, frame_hash).
    Real codecs would seek keyframes; the fan-out shape (one media
    row → k frame rows, still map-side) is the point.

    frame_hash is md5 over the frame's HEX encoding (not raw bytes)
    for the same reason as decode_features' phash: DuckDB's md5 takes
    VARCHAR only, and hashing the hex keeps the whole stage
    oracle-checkable."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for doc_id, mime, payload in zip(
                pdf["doc_id"], pdf["mime"], pdf["payload"]
            ):
                if mime != "video/mp4":
                    continue
                frames = [
                    payload[i : i + 4] for i in range(0, len(payload), 4)
                ]
                for idx in range(0, len(frames), every):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_hash"].append(
                        hashlib.md5(bytes(frames[idx]).hex().encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(sample, FRAME_SCHEMA)


def audio_chunks(media: DataFrame, win: int = 8, hop: int = 4) -> DataFrame:
    """Overlapping-window chunking for audio payloads — the STFT-
    style framing every audio feature pipeline starts with: window
    ``win`` bytes, hop ``hop`` (50% overlap at the defaults), one
    media row → k chunk rows, still map-side. A real pipeline would
    window PCM samples and FFT each window; the windowing fan-out
    and Arrow batch shape are identical.

    Emits (doc_id, chunk_idx, chunk_hash, byte_sum): the hash is md5
    over the window's HEX encoding and byte_sum the exact integer sum
    of its bytes — both recomputable from hex arithmetic in DuckDB,
    so the whole stage stays oracle-checked.
    """

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "chunk_idx": [],
                "chunk_hash": [],
                "byte_sum": [],
            }
            for doc_id, mime, payload in zip(
                pdf["doc_id"], pdf["mime"], pdf["payload"]
            ):
                if mime != "audio/wav":
                    continue
                b = bytes(payload)
                for ci, start in enumerate(range(0, len(b) - win + 1, hop)):
                    w = b[start : start + win]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(ci)
                    out["chunk_hash"].append(
                        hashlib.md5(w.hex().encode()).hexdigest()
                    )
                    out["byte_sum"].append(sum(w))
            yield pd.DataFrame(out)

    return media.mapInPandas(chunk, CHUNK_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize — requires PIL, absent in this container.

    Kept as an explicit NotImplementedError (per the build mandate)
    rather than a fake: resizing changes pixels, and faking pixels
    would silently corrupt a real training pipeline.
    """
    if not HAVE_PIL:
        raise NotImplementedError(
            "resize_image needs PIL; container ships without image libs. "
            "The mapInPandas harness is identical to decode_features."
        )
    raise NotImplementedError("real decode path not wired in this build")


# ---------------------------------------------------------------------
# REAL codecs — formats parseable with the standard library alone.
#
# PIL/ffmpeg are absent in this container (the documented seam), but
# RIFF/WAV PCM and uncompressed BMP need nothing beyond ``struct``:
# for these two formats the decode below is the real thing — real
# container bytes in, real parsed audio/pixel statistics out — through
# the same Arrow ``mapInPandas`` harness as the fake path, so it also
# serves as the template for dropping in PIL/ffmpeg decoders later.
# Malformed payloads yield a NULL-featured row with ``ok = 0`` (a
# crawl-scale decode stage must quarantine bad media, not abort the
# batch).

WAV_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ok", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("rms", StringType()),  # 6dp string: exact, portable
    ]
)

BMP_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ok", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bpp", IntegerType()),
        StructField("mean_lum", StringType()),  # 6dp string
    ]
)


def decode_wav_meta(media: DataFrame) -> DataFrame:
    """REAL WAV decode (RIFF + PCM16) via mapInPandas: header fields
    plus the RMS amplitude of the samples — no audio libs, just
    ``struct`` over the container format."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        import struct

        def one(doc_id: int, b: bytes) -> dict:
            bad = {
                "doc_id": doc_id, "ok": 0, "sample_rate": None,
                "n_channels": None, "bits": None, "n_samples": None,
                "duration_ms": None, "rms": None,
            }
            try:
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    return bad
                pos, fmt, data = 12, None, None
                while pos + 8 <= len(b):
                    cid, size = b[pos:pos + 4], struct.unpack(
                        "<I", b[pos + 4:pos + 8]
                    )[0]
                    body = b[pos + 8:pos + 8 + size]
                    if cid == b"fmt ":
                        fmt = struct.unpack("<HHIIHH", body[:16])
                    elif cid == b"data":
                        data = body
                    pos += 8 + size + (size & 1)
                if fmt is None or data is None or fmt[0] != 1:
                    return bad  # PCM only
                _, ch, rate, _, _, bits = fmt
                if bits != 16 or ch < 1:
                    return bad
                n = len(data) // (2 * ch)
                samples = struct.unpack(f"<{n * ch}h", data[: n * ch * 2])
                rms = (
                    math.sqrt(sum(s * s for s in samples) / len(samples))
                    if samples
                    else 0.0
                )
                return {
                    "doc_id": doc_id, "ok": 1, "sample_rate": rate,
                    "n_channels": ch, "bits": bits, "n_samples": n,
                    "duration_ms": int(n * 1000 // rate),
                    "rms": f"{rms:.6f}",
                }
            except Exception:
                return bad

        for pdf in batches:
            yield pd.DataFrame(
                [one(d, bytes(p)) for d, p in zip(pdf["doc_id"], pdf["payload"])]
            )

    return media.mapInPandas(parse, WAV_META_SCHEMA)


def decode_bmp_meta(media: DataFrame) -> DataFrame:
    """REAL BMP decode (BITMAPINFOHEADER, uncompressed 24-bit) via
    mapInPandas: dimensions plus mean luminance over the pixel rows
    (honoring 4-byte row padding and bottom-up order)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def one(doc_id: int, b: bytes) -> dict:
            bad = {
                "doc_id": doc_id, "ok": 0, "width": None,
                "height": None, "bpp": None, "mean_lum": None,
            }
            try:
                if b[:2] != b"BM":
                    return bad
                off = struct.unpack("<I", b[10:14])[0]
                hsz, w, h, _, bpp, comp = struct.unpack(
                    "<IiiHHI", b[14:34]
                )
                if hsz < 40 or bpp != 24 or comp != 0 or w <= 0:
                    return bad
                rows = abs(h)
                stride = (w * 3 + 3) & ~3
                total, npx = 0, 0
                for r in range(rows):
                    base = off + r * stride
                    row = b[base:base + w * 3]
                    if len(row) < w * 3:
                        return bad
                    # ITU-R 601 integer luma over BGR triples
                    for i in range(0, w * 3, 3):
                        bl, g, rd = row[i], row[i + 1], row[i + 2]
                        total += 299 * rd + 587 * g + 114 * bl
                        npx += 1
                return {
                    "doc_id": doc_id, "ok": 1, "width": w,
                    "height": rows, "bpp": bpp,
                    "mean_lum": f"{total / (npx * 1000):.6f}",
                }
            except Exception:
                return bad

        for pdf in batches:
            yield pd.DataFrame(
                [one(d, bytes(p)) for d, p in zip(pdf["doc_id"], pdf["payload"])]
            )

    return media.mapInPandas(parse, BMP_META_SCHEMA)


PNG_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ok", IntegerType()),
        StructField("status", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bit_depth", IntegerType()),
        StructField("color_type", IntegerType()),
        StructField("mean_lum", StringType()),  # 6dp string
    ]
)


def decode_png_meta(media: DataFrame) -> DataFrame:
    """REAL PNG decode via mapInPandas — stdlib only (struct +
    zlib): IHDR fields, IDAT inflate, per-scanline unfilter (all
    five PNG filter types: None/Sub/Up/Average/Paeth), and the same
    ITU-R 601 integer mean luminance the BMP decoder reports
    (greyscale maps R=G=B). Narrows the sanctioned PIL seam: 8-bit
    greyscale (color type 0), truecolor (2) and truecolor+alpha (6,
    alpha ignored for luma) are fully decoded.

    Every non-decoding payload quarantines as ok=0 (a crawl-scale
    decode stage must never abort the batch), and ``status`` says
    WHY (r15 ADVICE #5 — downstream must distinguish policy
    quarantine from corruption):

    * ``malformed`` — bad signature/chunks, truncated or corrupt
      IDAT, unknown filter byte, zero/negative dimensions;
    * ``unsupported`` — valid PNG outside the decoded subset
      (palette/16-bit/interlaced/non-zero compression or filter
      method) — re-decodable once a fuller codec lands;
    * ``too_large`` — a VALID header whose raster exceeds the 64 MB
      inflate cap: a policy bound, not corruption — a pipeline can
      re-route these to a bigger-budget decoder instead of
      discarding them as junk.

    Tested against stdlib-GENERATED files covering every filter
    type in tests/test_real_codecs.py."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        SIG = b"\x89PNG\r\n\x1a\n"

        def one(doc_id: int, b: bytes) -> dict:
            def bad(status: str = "malformed") -> dict:
                return {
                    "doc_id": doc_id, "ok": 0, "status": status,
                    "width": None, "height": None, "bit_depth": None,
                    "color_type": None, "mean_lum": None,
                }
            try:
                if b[:8] != SIG:
                    return bad()
                pos, ihdr, idat = 8, None, b""
                while pos + 8 <= len(b):
                    size = struct.unpack(">I", b[pos:pos + 4])[0]
                    cid = b[pos + 4:pos + 8]
                    body = b[pos + 8:pos + 8 + size]
                    if cid == b"IHDR":
                        ihdr = struct.unpack(">IIBBBBB", body[:13])
                    elif cid == b"IDAT":
                        idat += body
                    elif cid == b"IEND":
                        break
                    pos += 12 + size  # len + type + crc
                if ihdr is None or not idat:
                    return bad()
                w, h, depth, ctype, comp, filt, inter = ihdr
                channels = {0: 1, 2: 3, 6: 4}.get(ctype)
                if w <= 0 or h <= 0:
                    return bad()
                if (
                    channels is None or depth != 8 or comp != 0
                    or filt != 0 or inter != 0
                ):
                    return bad("unsupported")
                bpp = channels  # bytes per pixel at depth 8
                stride = w * bpp
                need = h * (stride + 1)
                # BOUNDED inflate: a decompression-bomb IDAT (zlib
                # ratios reach ~1000:1) must not OOM-kill the Python
                # worker — that aborts the batch instead of
                # quarantining the row. The header-promised raster
                # size is ITSELF payload-controlled (IHDR w/h), so
                # cap it absolutely (64 MB ≈ a 4.6k² RGBA frame —
                # beyond any metadata-decode need) before bounding
                # the inflate to it. Distinct status: this is a
                # POLICY bound on a possibly-valid image, not
                # corruption.
                if need > 64 << 20:
                    return bad("too_large")
                raw = zlib.decompressobj().decompress(idat, need)
                if len(raw) < need:
                    return bad()
                prior = bytearray(stride)
                total, npx = 0, 0
                for r in range(h):
                    base = r * (stride + 1)
                    ftype = raw[base]
                    line = bytearray(raw[base + 1:base + 1 + stride])
                    if ftype == 1:  # Sub
                        for i in range(bpp, stride):
                            line[i] = (line[i] + line[i - bpp]) & 0xFF
                    elif ftype == 2:  # Up
                        for i in range(stride):
                            line[i] = (line[i] + prior[i]) & 0xFF
                    elif ftype == 3:  # Average
                        for i in range(stride):
                            a = line[i - bpp] if i >= bpp else 0
                            line[i] = (line[i] + ((a + prior[i]) >> 1)) & 0xFF
                    elif ftype == 4:  # Paeth
                        for i in range(stride):
                            a = line[i - bpp] if i >= bpp else 0
                            c = prior[i - bpp] if i >= bpp else 0
                            p = a + prior[i] - c
                            pa, pb, pc = (
                                abs(p - a), abs(p - prior[i]), abs(p - c)
                            )
                            pr = (
                                a if pa <= pb and pa <= pc
                                else prior[i] if pb <= pc else c
                            )
                            line[i] = (line[i] + pr) & 0xFF
                    elif ftype != 0:
                        return bad()
                    for i in range(0, stride, bpp):
                        if channels == 1:
                            rd = g = bl = line[i]
                        else:
                            rd, g, bl = line[i], line[i + 1], line[i + 2]
                        total += 299 * rd + 587 * g + 114 * bl
                        npx += 1
                    prior = line
                return {
                    "doc_id": doc_id, "ok": 1, "status": "ok",
                    "width": w, "height": h, "bit_depth": depth,
                    "color_type": ctype,
                    "mean_lum": f"{total / (npx * 1000):.6f}",
                }
            except Exception:
                return bad()

        for pdf in batches:
            yield pd.DataFrame(
                [one(d, bytes(p)) for d, p in zip(pdf["doc_id"], pdf["payload"])]
            )

    return media.mapInPandas(parse, PNG_META_SCHEMA)


JPEG_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ok", IntegerType()),
        StructField("status", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_components", IntegerType()),
        StructField("mean_lum", StringType()),  # 6dp string
    ]
)



#: JPEG zigzag scan order (T.81 Figure 5) — module-level so the Arrow
#: worker builds the decode machinery once per interpreter, not per
#: payload
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
    28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
    37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
    54, 47, 55, 62, 63,
)


def _jpeg_idct_basis():
    """IDCT basis C with C[u,x] = c(u)/2 * cos((2x+1)u*pi/16)
    (f = C^T F C) — built once, cached on the function object (numpy
    import deferred so importing this module never requires it)."""
    cached = getattr(_jpeg_idct_basis, "_c", None)
    if cached is None:
        import numpy as np

        xs = np.arange(8)
        cached = np.cos((2 * xs[None, :] + 1) * xs[:, None] * np.pi / 16)
        cached *= 0.5
        cached[0, :] *= 1 / np.sqrt(2.0)
        _jpeg_idct_basis._c = cached
    return cached


class _JpegBits:
    __slots__ = ("d", "p", "n")

    def __init__(self, d: bytes):
        self.d, self.p, self.n = d, 0, len(d)

    def bit(self) -> int:
        byte = self.p >> 3
        if byte >= self.n:
            raise ValueError("bit starve")
        v = (self.d[byte] >> (7 - (self.p & 7))) & 1
        self.p += 1
        return v

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpeg_huffdec(bits: _JpegBits, lut: dict) -> int:
    ln, code = 0, 0
    while ln < 16:
        code = (code << 1) | bits.bit()
        ln += 1
        sym = lut.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("huffman overrun")


def _jpeg_extend(v: int, t: int) -> int:
    # JPEG F.2.2.1 sign extension of a t-bit magnitude
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_one(doc_id: int, b: bytes) -> dict:
    """Decode ONE baseline JPEG payload to (dims, mean luminance).

    Scope — baseline sequential DCT (SOF0), 8-bit, Huffman: grayscale
    and YCbCr with any 1-2 sampling factors (4:4:4, 4:2:2, 4:2:0),
    optional restart intervals. JPEG's Y channel IS the ITU-R 601
    luminance the BMP/PNG decoders report, so only the Y blocks are
    dequantized + IDCT'd; the interleaved chroma blocks are
    entropy-decoded (the bitstream cannot be skipped) and discarded.
    Statuses follow decode_png_meta's contract: ``malformed`` (bad
    markers / Huffman / truncation), ``unsupported`` (progressive
    SOF2, arithmetic coding, 12-bit, hierarchical, >2 sampling —
    valid JPEGs outside the decoded subset), ``too_large`` (a valid
    header past the 16 MP metadata-decode budget — policy, not
    corruption).

    Module-level (not a closure) so the Arrow worker pickles one
    function and the IDCT basis matrix builds once per interpreter.
    """
    import struct

    import numpy as np

    def bad(status: str = "malformed") -> dict:
        return {
            "doc_id": doc_id, "ok": 0, "status": status,
            "width": None, "height": None, "n_components": None,
            "mean_lum": None,
        }

    try:
        if len(b) < 4 or b[0:2] != b"\xff\xd8":  # SOI
            return bad()
        pos = 2
        qt: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode LUT
        sof = None
        restart_interval = 0
        scan = None
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                return bad()
            marker = b[pos + 1]
            if marker == 0xFF:  # legal fill byte before a marker
                pos += 1
                continue
            if marker == 0xD8 or marker == 0x01 or (
                0xD0 <= marker <= 0xD7
            ):
                # standalone (parameterless) markers: SOI, TEM (0x01,
                # r17 ADVICE — reserved-for-temporary, legal in a
                # conformant stream), RSTn
                pos += 2
                continue
            if marker == 0xD9:  # EOI before SOS
                return bad()
            seglen = struct.unpack(">H", b[pos + 2:pos + 4])[0]
            body = b[pos + 4:pos + 2 + seglen]
            if len(body) != seglen - 2:
                return bad()
            if marker == 0xC4:  # DHT
                i = 0
                while i < len(body):
                    tc, th = body[i] >> 4, body[i] & 0xF
                    counts = list(body[i + 1:i + 17])
                    nsym = sum(counts)
                    syms = list(body[i + 17:i + 17 + nsym])
                    if len(syms) < nsym:
                        return bad()
                    # canonical codes -> {(length, code): symbol}
                    lut, code, k = {}, 0, 0
                    for ln in range(1, 17):
                        for _ in range(counts[ln - 1]):
                            lut[(ln, code)] = syms[k]
                            code += 1
                            k += 1
                        code <<= 1
                    huff[(tc, th)] = lut
                    i += 17 + nsym
            elif marker == 0xDB:  # DQT
                i = 0
                while i < len(body):
                    prec, tq = body[i] >> 4, body[i] & 0xF
                    if prec != 0:
                        return bad("unsupported")  # 16-bit tables
                    qt[tq] = list(body[i + 1:i + 65])
                    if len(qt[tq]) < 64:
                        return bad()
                    i += 65
            elif marker == 0xC0:  # SOF0 baseline
                depth, h, w, nc = struct.unpack(">BHHB", body[:6])
                if depth != 8:
                    return bad("unsupported")
                if w <= 0 or h <= 0 or nc not in (1, 3):
                    return bad()
                comps = []
                for ci in range(nc):
                    cid, samp, tq = body[6 + ci * 3:9 + ci * 3]
                    comps.append((cid, samp >> 4, samp & 0xF, tq))
                sof = (w, h, comps)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                # extended/progressive/lossless/arithmetic families
                return bad("unsupported")
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:  # SOS
                ns = body[0]
                scomps = []
                for si in range(ns):
                    cs, tables = body[1 + si * 2:3 + si * 2]
                    scomps.append((cs, tables >> 4, tables & 0xF))
                scan = (scomps, b[pos + 2 + seglen:])
                break
            # APPn / COM / others: skip
            pos += 2 + seglen
        if sof is None or scan is None:
            return bad()
        w, h, comps = sof
        if w * h > 16 << 20:
            return bad("too_large")  # 16 MP metadata-decode budget
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if hmax > 2 or vmax > 2 or any(
            c[1] not in (1, 2) or c[2] not in (1, 2) for c in comps
        ):
            return bad("unsupported")
        scomps, data = scan
        if len(scomps) != len(comps):
            return bad("unsupported")  # multi-scan non-interleaved
        by_id = {c[0]: c for c in comps}
        order = []
        for cs, td, ta in scomps:
            if cs not in by_id:
                return bad()
            _, ch, cv, tq = by_id[cs]
            if (0, td) not in huff or (1, ta) not in huff or tq not in qt:
                return bad()
            order.append((ch, cv, qt[tq], huff[(0, td)], huff[(1, ta)]))
        # Y/grey is scan component 0 in both supported modes — but
        # that holds only under the JFIF YCbCr convention (component
        # ids 1=Y, 2=Cb, 3=Cr in scan order). A conformant SOF0 file
        # in a different 3-component color space (Adobe RGB, ids
        # 'R','G','B') or unconventional ordering would otherwise
        # decode "ok" while reporting the WRONG channel's mean as
        # mean_lum (r17 ADVICE #1) — gate it to ``unsupported``.
        if len(scomps) == 3 and [s[0] for s in scomps] != [1, 2, 3]:
            return bad("unsupported")
        y_idx = 0
        if len(order) == 1:
            # T.81 A.2: a SINGLE-component scan is NON-interleaved —
            # one 8x8 data unit per MCU, ceil(w/8)*ceil(h/8) units,
            # sampling factors ignored — so a valid grayscale JPEG
            # declaring Hi=Vi=2 carries the SAME bitstream as one
            # declaring 1x1 (r17 review; pinned by the patched-
            # sampling-byte case in tests/test_real_codecs.py).
            # Treating it as an interleaved 2x2-blocks-per-MCU grid
            # would read 4x the data units and bit-starve.
            ch, cv, q0, dl, al = order[0]
            order = [(1, 1, q0, dl, al)]
            hmax = vmax = 1

        # de-stuff the entropy stream; RSTn markers both segment the
        # stream and byte-align it
        segments, cur, i = [], bytearray(), 0
        while i < len(data):
            byte = data[i]
            if byte == 0xFF:
                nxt = data[i + 1] if i + 1 < len(data) else None
                if nxt == 0x00:
                    cur.append(0xFF)
                    i += 2
                    continue
                if nxt is not None and 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                    continue
                break  # EOI or any other marker ends the scan
            cur.append(byte)
            i += 1
        segments.append(bytes(cur))

        zigzag = _JPEG_ZIGZAG
        cmat = _jpeg_idct_basis()
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        n_mcu = mcux * mcuy
        yh, yv = order[y_idx][0], order[y_idx][1]
        # padded Y raster (per-component sampling geometry)
        yw, yhh = mcux * yh * 8, mcuy * yv * 8
        yplane = np.zeros((yhh, yw), dtype=np.float64)
        pred = [0] * len(order)
        seg_i, bits = 0, _JpegBits(segments[0])
        per_seg = restart_interval or n_mcu
        for m in range(n_mcu):
            if m and restart_interval and m % per_seg == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    return bad()
                bits = _JpegBits(segments[seg_i])
                pred = [0] * len(order)
            my, mx = divmod(m, mcux)
            for ci, (ch, cv, q, dlut, alut) in enumerate(order):
                for by in range(cv):
                    for bx in range(ch):
                        t = _jpeg_huffdec(bits, dlut)
                        diff = _jpeg_extend(bits.bits(t), t) if t else 0
                        pred[ci] += diff
                        coef = [0] * 64
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _jpeg_huffdec(bits, alut)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overrun")
                            coef[k] = _jpeg_extend(bits.bits(s), s)
                            k += 1
                        if ci != y_idx:
                            continue  # chroma: entropy-decoded, dropped
                        fmat = np.zeros(64)
                        for zz, val in enumerate(coef):
                            if val:
                                fmat[zigzag[zz]] = val * q[zz]
                        fmat = fmat.reshape(8, 8)
                        px = cmat.T @ fmat @ cmat + 128.0
                        r0 = (my * yv + by) * 8
                        c0 = (mx * yh + bx) * 8
                        yplane[r0:r0 + 8, c0:c0 + 8] = px
    except Exception:
        return bad()
    # crop MCU padding to the true Y geometry, round+clamp like a
    # real decoder, mean over the declared w x h
    true_w = -(-w * yh // hmax)
    true_h = -(-h * yv // vmax)
    vis = np.clip(np.round(yplane[:true_h, :true_w]), 0, 255)
    return {
        "doc_id": doc_id, "ok": 1, "status": "ok", "width": w,
        "height": h, "n_components": len(order),
        "mean_lum": f"{float(vis.mean()):.6f}",
    }


def decode_jpeg_meta(media: DataFrame) -> DataFrame:
    """REAL baseline JPEG decode via mapInPandas — stdlib + numpy
    only (marker parse, canonical Huffman, de-stuffing, restart
    segments, dequantize + IDCT of the Y channel): dimensions,
    component count, and the mean Y luminance — the same statistic
    the BMP/PNG decoders report (JPEG's Y IS ITU-R 601 luma). Closes
    the sanctioned image-decode seam for the dominant crawl format;
    progressive/arithmetic/12-bit payloads quarantine as
    ``unsupported`` (see _jpeg_one for the full status contract).
    Tested against a from-scratch baseline ENCODER (FDCT +
    canonical Huffman + byte stuffing + restart markers) in
    tests/test_real_codecs.py — exact on DC-only rasters, within
    rounding tolerance on full-AC content."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    _jpeg_one(d, bytes(p))
                    for d, p in zip(pdf["doc_id"], pdf["payload"])
                ]
            )

    return media.mapInPandas(parse, JPEG_META_SCHEMA)
