"""Oracle-checked multimodal query: typed-metadata extraction over a
real ``binary`` column through a real Arrow-batched Pandas UDF.

The payload is deterministic (multimodal/codecs.synthetic_media:
unhex(md5(text) || md5(reverse(text)))), so the DuckDB oracle can
recompute every byte-level feature from md5 hex arithmetic — the UDF
runs the genuine binary path, the oracle proves it bit-exact.

Scale: pure map over the media table (no shuffle); Arrow moves the
payload bytes once per batch. See multimodal/codecs.py for the
frame-sampling / resize stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aichemy_data_pipelines_spark.multimodal.codecs import (
    audio_chunks,
    decode_features,
    frame_sample,
    synthetic_media,
)

_FRAME_EVERY = 4
_FRAME_BYTES = 4
_PAYLOAD_BYTES = 32
_CHUNK_WIN = 8
_CHUNK_HOP = 4


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_features(synthetic_media(spark, sf_dir))


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage over video payloads (mime-filtered fanout
    through the same Arrow mapInPandas path): one media row → k frame
    rows, each frame a 4-byte block, stride 4; hashes recomputed by
    the oracle from the payload's hex arithmetic."""
    return frame_sample(synthetic_media(spark, sf_dir), every=_FRAME_EVERY)


def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STFT-style overlapping-window chunking over audio payloads
    (win=8 bytes, hop=4) through the Arrow mapInPandas path; hashes
    and exact byte sums recomputed by the oracle from hex arithmetic."""
    return audio_chunks(
        synthetic_media(spark, sf_dir), win=_CHUNK_WIN, hop=_CHUNK_HOP
    )


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_frames": multimodal_frames,
    "multimodal_audio_chunks": multimodal_audio_chunks,
}

# byte i of the payload, recomputed from the md5 hex strings
_HEX = "concat(md5(text), md5(reverse(text)))"
_BYTE_SUM = (
    f"list_aggregate(list_transform(range(0, 32), "
    f"i -> ('0x' || substr({_HEX}, i * 2 + 1, 2))::BIGINT), 'sum') % 256"
)

# frame f covers payload bytes [f*4, f*4+4) = hex chars [f*8+1, f*8+8]
_FRAME_IDXS = ", ".join(
    str(i)
    for i in range(0, _PAYLOAD_BYTES // _FRAME_BYTES, _FRAME_EVERY)
)

_CHUNK_IDXS = ", ".join(
    str(i)
    for i in range(
        len(range(0, _PAYLOAD_BYTES - _CHUNK_WIN + 1, _CHUNK_HOP))
    )
)

ORACLE = {
    "multimodal_audio_chunks": f"""
        SELECT doc_id,
               CAST(c AS INTEGER) AS chunk_idx,
               md5(substr({_HEX}, c * {_CHUNK_HOP * 2} + 1,
                          {_CHUNK_WIN * 2})) AS chunk_hash,
               CAST(list_aggregate(list_transform(range(0, {_CHUNK_WIN}),
                    b -> ('0x' || substr({_HEX},
                          c * {_CHUNK_HOP * 2} + b * 2 + 1, 2))::BIGINT),
                    'sum') AS BIGINT) AS byte_sum
        FROM documents, unnest([{_CHUNK_IDXS}]) AS t(c)
        WHERE doc_id % 3 = 1
    """,
    "multimodal_frames": f"""
        SELECT doc_id,
               CAST(f AS INTEGER) AS frame_idx,
               md5(substr({_HEX}, f * {_FRAME_BYTES * 2} + 1,
                          {_FRAME_BYTES * 2})) AS frame_hash
        FROM documents, unnest([{_FRAME_IDXS}]) AS t(f)
        WHERE doc_id % 3 = 2
    """,
    "multimodal_meta": f"""
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INTEGER)
                    WHEN 0 THEN 'image/png'
                    WHEN 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS mime,
               32 AS n_bytes,
               CAST(('0x' || substr(md5(text), 1, 2))::BIGINT AS INTEGER)
                 AS lead_byte,
               CAST({_BYTE_SUM} AS INTEGER) AS byte_sum_mod,
               md5(lower({_HEX})) AS phash
        FROM documents
    """,
}
