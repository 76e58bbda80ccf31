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
from pyspark.sql import functions as F

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


_PHASH_BITS = 32
_PHASH_BANDS = 4  # 8 bits each; hamming<=3 -> >=1 identical band
_PHASH_MAX_HAMMING = 3


def image_ahash(media: DataFrame) -> DataFrame:
    """Average-hash over the (fake-)decoded image bytes: bit i set
    iff byte i is above the payload mean — the standard aHash, with
    the 8x8 DCT grid stood in for by the 32 payload bytes.

    Unlike the md5 'phash' in decode_features (identity fingerprint),
    this is LOCALITY-PRESERVING: flipping k bytes flips at most k
    bits, so near-identical images land within a small Hamming ball.
    Pure JVM expressions (transform/aggregate over the byte array) —
    no UDF, stays in whole-stage codegen, and integer-only math
    (byte*32 > sum) so there is no FP mean to disagree across
    engines.
    """
    return (
        media.where(F.col("mime") == "image/png")
        .withColumn(
            "bytes",
            F.expr(
                "transform(sequence(0, 31), i -> "
                "cast(conv(substr(hex(payload), i*2+1, 2), 16, 10) as bigint))"
            ),
        )
        .withColumn(
            "total", F.expr("aggregate(bytes, 0L, (acc, x) -> acc + x)")
        )
        .withColumn(
            "ahash",
            F.expr(
                "aggregate(transform(bytes, (b, i) -> "
                "if(b * 32 > total, shiftleft(1L, 31 - i), 0L)), "
                "0L, (acc, x) -> acc + x)"
            ),
        )
        .select("doc_id", "ahash")
    )


def image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b) image near-dup candidate pairs (hamming <= 3
    over the aHash) — the pair-level core of multimodal_image_phash,
    exposed separately so the cross-modal dedup composition
    (operators/crossmodal_ops.py) joins the SAME pair set the phash
    audit counts, never a reimplementation.

    Plan shape (same as dedup_minhash_lsh): hash is a pure map; the
    pair search is a BAND equi-join, never all-pairs — the 32-bit
    hash splits into 4 x 8-bit bands, and hamming<=3 guarantees at
    least one identical band (pigeonhole), so banding has perfect
    recall at the threshold while random pairs collide on a band
    with p ~ 4/256. Exact bit_count(xor) filter on candidates only.

    Scale: shuffle on (band_idx, band_val) — bounded fanout per
    bucket at any corpus size for non-degenerate hash distributions;
    a pathological bucket (all-identical images) is exact-dup
    territory, handled upstream by dedup_exact.
    """
    return phash_pairs_from_hashes(
        image_ahash(synthetic_media(spark, sf_dir))
    )


def phash_pairs_from_hashes(h: DataFrame) -> DataFrame:
    """Frame-level pair generation over an existing (doc_id, ahash)
    view — split out (r10 ADVICE) so multimodal_image_phash can feed
    ONE shared aHash subtree to both its per-image view and the pair
    search instead of re-deriving the decode chain per reference."""
    bands = h.select(
        "doc_id",
        "ahash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_PHASH_BANDS - 1}), b -> "
                f"named_struct('band', b, "
                f"'val', shiftright(ahash, b * 8) & 255L))"
            )
        ).alias("bv"),
    ).select("doc_id", "ahash", "bv.band", "bv.val")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
        .where(
            F.bit_count(F.expr("ha ^ hb")) <= F.lit(_PHASH_MAX_HAMMING)
        )
        .select("doc_a", "doc_b")
    )
    return pairs


def multimodal_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup audit over the image subset: per
    image, its aHash and how many OTHER images sit within Hamming
    distance 3 — the image leg of the dedup stack. Pair generation
    (banding, recall guarantee, scale notes) lives in
    image_phash_pairs; this wraps it into the per-image count view.

    The aHash frame is computed ONCE, ``localCheckpoint``-ed (tiny:
    one (doc_id, ahash) row per image), and shared by the per-image
    view AND the pair search (phash_pairs_from_hashes) — left lazy,
    the decode chain was re-embedded three times (per-image view +
    both self-join sides; r10 ADVICE), re-scanning documents per
    reference. The returned plan reads only the checkpointed RDD.
    """
    h = image_ahash(synthetic_media(spark, sf_dir)).localCheckpoint()
    pairs = phash_pairs_from_hashes(h)
    touch = pairs.select(F.col("doc_a").alias("doc_id")).unionAll(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    counts = touch.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_near_dups")
    )
    return h.join(counts, "doc_id", "left").select(
        "doc_id",
        "ahash",
        F.coalesce("n_near_dups", F.lit(0).cast("long")).alias(
            "n_near_dups"
        ),
    )


_N_FRAMES = _PAYLOAD_BYTES // _FRAME_BYTES  # 8 frames of 4 bytes
_CUT_THRESHOLD = 200  # |Δ byte-sum| above this = scene cut


def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over video payloads: consecutive-frame
    intensity deltas, flagged where the jump exceeds a threshold —
    the keyframe-selection primitive of every video curation
    pipeline (dedup at the shot level, thumbnail picking, frame
    sampling for captioning).

    Frame intensity here = exact integer byte-sum of the 4-byte
    frame block (a real decoder would use luma histograms; the
    locality-and-delta shape is the point).

    Scale: ZERO shuffle — frame i and frame i-1 both derive from
    the SAME payload row, so the pairwise delta is computed by
    exploding the frame index and slicing the row's own hex string
    twice; no per-video window, no lag, no doc_id repartition.
    Pure JVM expressions inside whole-stage codegen (no UDF).
    Output: one row per consecutive frame pair per video.
    """
    media = synthetic_media(spark, sf_dir).where(
        F.col("mime") == "video/mp4"
    )

    def intensity(frame_idx_expr: str) -> str:
        return (
            f"aggregate(transform(sequence(0, {_FRAME_BYTES - 1}), j -> "
            f"cast(conv(substr(hx, (({frame_idx_expr}) * {_FRAME_BYTES} + j) * 2 + 1, 2), "
            f"16, 10) as bigint)), 0L, (acc, x) -> acc + x)"
        )

    return (
        media.withColumn("hx", F.hex("payload"))
        .select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(1, {_N_FRAMES - 1})")
            ).alias("frame_idx"),
            F.col("hx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.expr(intensity("frame_idx")).alias("intensity"),
            F.expr(intensity("frame_idx - 1")).alias("prev_intensity"),
        )
        .select(
            "doc_id",
            "frame_idx",
            "intensity",
            F.abs(F.col("intensity") - F.col("prev_intensity")).alias(
                "delta"
            ),
            (
                F.abs(F.col("intensity") - F.col("prev_intensity"))
                > _CUT_THRESHOLD
            ).alias("is_cut"),
        )
    )


def multimodal_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality corpus audit over the REAL decode path: media
    counts, payload bytes, mean intensity proxy and DISTINCT
    perceptual hashes per mime — the intake dashboard of a multimodal
    corpus (n_media vs n_distinct_phash gap = exact-duplicate media).

    The features flow through the genuine Arrow mapInPandas decode
    stage (decode_features), then one bounded groupBy(mime) — so the
    oracle proves the UDF path end-to-end, aggregated.

    Scale: pure map + 3-group agg; countDistinct(phash) shuffles the
    hash space once (swap approx_count_distinct at 100 TB for the
    same shape).
    """
    f = decode_features(synthetic_media(spark, sf_dir))
    return f.groupBy("mime").agg(
        F.count("*").cast("long").alias("n_media"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.round(
            F.sum("byte_sum_mod").cast("double") / F.count("*"), 6
        ).alias("mean_byte_sum"),
        F.countDistinct("phash").cast("long").alias("n_distinct_phash"),
    )


QUERIES = {
    "multimodal_mix_report": multimodal_mix_report,
    "multimodal_scene_cuts": multimodal_scene_cuts,
    "multimodal_meta": multimodal_meta,
    "multimodal_frames": multimodal_frames,
    "multimodal_audio_chunks": multimodal_audio_chunks,
    "multimodal_image_phash": multimodal_image_phash,
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

def _sql_intensity(idx: str) -> str:
    return (
        f"list_aggregate(list_transform(range(0, {_FRAME_BYTES}), "
        f"j -> ('0x' || substr({_HEX}, (({idx}) * {_FRAME_BYTES} + j) * 2 + 1, 2))::BIGINT), "
        f"'sum')"
    )


# Shared CTE prefix ending in close_pairs(doc_a, doc_b) — the image
# near-dup pair set. Used by the multimodal_image_phash oracle AND
# nested by operators/crossmodal_ops.py, so the two oracles can never
# disagree about what an image near-dup pair is (the SQL twin of the
# image_phash_pairs extraction on the Spark side).
SQL_PHASH_PAIR_CTES = f"""img AS (
            SELECT doc_id,
                   list_transform(range(0, 32),
                       i -> ('0x' || substr({_HEX}, i * 2 + 1, 2))::BIGINT)
                     AS bytes
            FROM documents WHERE doc_id % 3 = 0
        ), tot AS (
            SELECT doc_id, bytes, list_aggregate(bytes, 'sum') AS total
            FROM img
        ), h AS (
            SELECT doc_id,
                   list_aggregate(list_transform(range(0, 32),
                       i -> CASE WHEN bytes[i + 1] * 32 > total
                                 THEN (1::BIGINT << (31 - i))
                                 ELSE 0::BIGINT END), 'sum') AS ahash
            FROM tot
        ), bands AS (
            SELECT doc_id, ahash, b AS band, (ahash >> (b * 8)) & 255 AS val
            FROM h, unnest([0, 1, 2, 3]) AS t(b)
        ), pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                            a.ahash AS ha, b.ahash AS hb
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
        ), close_pairs AS (
            SELECT doc_a, doc_b FROM pairs
            WHERE bit_count(xor(ha, hb)) <= {_PHASH_MAX_HAMMING}
        )"""

ORACLE = {
    "multimodal_scene_cuts": f"""
        WITH vid AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2
        ), pairs AS (
            SELECT doc_id,
                   CAST(i AS INTEGER) AS frame_idx,
                   CAST({_sql_intensity('i')} AS BIGINT) AS intensity,
                   CAST({_sql_intensity('i - 1')} AS BIGINT)
                     AS prev_intensity
            FROM vid, unnest(range(1, {_N_FRAMES})) AS t(i)
        )
        SELECT doc_id, frame_idx, intensity,
               CAST(abs(intensity - prev_intensity) AS BIGINT) AS delta,
               abs(intensity - prev_intensity) > {_CUT_THRESHOLD}
                 AS is_cut
        FROM pairs
    """,
    "multimodal_image_phash": f"""
        WITH {SQL_PHASH_PAIR_CTES}, touch AS (
            SELECT doc_a AS doc_id FROM close_pairs
            UNION ALL
            SELECT doc_b AS doc_id FROM close_pairs
        ), counts AS (
            SELECT doc_id, COUNT(*) AS n FROM touch GROUP BY doc_id
        )
        SELECT h.doc_id, CAST(h.ahash AS BIGINT) AS ahash,
               CAST(COALESCE(counts.n, 0) AS BIGINT) AS n_near_dups
        FROM h LEFT JOIN counts ON h.doc_id = counts.doc_id
    """,
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
    "multimodal_mix_report": f"""
        WITH meta AS (
            SELECT doc_id,
                   CASE CAST(doc_id % 3 AS INTEGER)
                        WHEN 0 THEN 'image/png'
                        WHEN 1 THEN 'audio/wav'
                        ELSE 'video/mp4' END AS mime,
                   32 AS n_bytes,
                   CAST({_BYTE_SUM} AS INTEGER) AS byte_sum_mod,
                   md5(lower({_HEX})) AS phash
            FROM documents
        )
        SELECT mime,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               round(CAST(SUM(byte_sum_mod) AS DOUBLE) / COUNT(*), 6)
                 AS mean_byte_sum,
               CAST(COUNT(DISTINCT phash) AS BIGINT) AS n_distinct_phash
        FROM meta GROUP BY mime
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
