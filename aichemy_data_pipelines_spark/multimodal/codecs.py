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
inflate + full five-filter unfiltering) at the bottom of this
module are REAL decoders over real container bytes, tested against
stdlib-generated files (tests/test_real_codecs.py). The Spark-side plumbing — schema, Arrow
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
