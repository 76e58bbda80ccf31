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
    decode_features,
    synthetic_media,
)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_features(synthetic_media(spark, sf_dir))


QUERIES = {"multimodal_meta": multimodal_meta}

# byte i of the payload, recomputed from the md5 hex strings
_HEX = "concat(md5(text), md5(reverse(text)))"
_BYTE_SUM = (
    f"list_aggregate(list_transform(range(0, 32), "
    f"i -> ('0x' || substr({_HEX}, i * 2 + 1, 2))::BIGINT), 'sum') % 256"
)

ORACLE = {
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
