"""Vector compression for the 100 TB embedding store: per-dimension
int8 scalar quantization (the storage tier FAISS calls SQ8).

At corpus scale the embedding column dominates storage (a 64-dim
float32 vector is 256 bytes/doc); 8-bit scalar quantization cuts it
4× with bounded reconstruction error (≤ (mx-mn)/255 per dimension),
and ANN pre-filtering happily runs on the quantized codes with exact
re-rank on the survivors (operators/ivf.py's shape).

Determinism: min/max are exact float32 values widened to double; the
quantization arithmetic is the identical IEEE expression in both
engines; codes are exact integers (floor, never round) — so the whole
op is hash-checkable like every relational query.

Scale: one posexplode→agg for the per-dimension stats (64 rows — the
quantizer), broadcast back, one bounded groupBy(vec_id) to reassemble
codes (state = d values per vector, NOT unbounded). Train/apply are
separable: at 100 TB the stats come from a sample and ship as a
literal, making the apply side a pure map (the IVF-centroid pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.layout import spread_small_input


def quantize_codes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-form library twin of :func:`embeddings_quantize_int8`:
    (vec_id, label, codes array<int>, code_sum) — for internal
    consumers (ANN pre-filtering, storage tiers) that want the dense
    codes rather than the driver-safe string form."""
    return embeddings_quantize_int8(spark, sf_dir).select(
        "vec_id",
        "label",
        F.expr(
            "transform(split(codes, ','), s -> cast(s as int))"
        ).alias("codes"),
        "code_sum",
    )


def embeddings_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize every embedding to int8 codes with a per-dimension
    (min, max) linear quantizer trained on the full table.

    Output: (vec_id, label, codes string, code_sum) — codes a
    comma-joined int8 vector in [0, 255] (stringified because the
    driver's pandas canonicalizer cannot sort/hash array columns —
    r04 red row), code_sum a cheap integrity checksum downstream
    stages can verify after transport.  Internal consumers use
    :func:`quantize_codes_df`, which restores the array form.
    """
    e = load_table(spark, sf_dir, "embeddings").transform(spread_small_input)
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "x")
    )
    stats = ex.groupBy("pos").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    codes = (
        ex.join(F.broadcast(stats), "pos")
        .select(
            "vec_id",
            "label",
            "pos",
            F.when(F.col("mx") == F.col("mn"), F.lit(0))
            .otherwise(
                # widen BEFORE subtracting: a float32 (mx - mn)
                # denominator against a double numerator makes
                # x == mx quantize to 254, not 255
                F.floor(
                    (F.col("x").cast("double") - F.col("mn").cast("double"))
                    / (F.col("mx").cast("double") - F.col("mn").cast("double"))
                    * 255
                )
            )
            .cast("int")
            .alias("code"),
        )
    )
    return codes.groupBy("vec_id", "label").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(pos, code))), s -> cast(s.code as string)), ',')"
        ).alias("codes"),
        F.sum("code").cast("bigint").alias("code_sum"),
    )


def embeddings_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile (count, min/max/mean norm) — the
    embedding-store health check: un-normalized stragglers, collapsed
    clusters (norm → 0) and scale drift between labels all show up
    here before they poison cosine-based retrieval.

    Determinism: each norm is sqrt of the exact-decimal self-dot
    (functions/vectors recipe), snapped to a 6dp decimal BEFORE the
    mean's sum — so the per-label accumulation is exact decimal and
    order-independent; min/max are selections (no accumulation).

    Scale: pure map for norms (JVM-side aggregate over the array),
    one tiny groupBy(label) with map-side combine — a single pass.
    """
    from aichemy_data_pipelines_spark.functions.vectors import (
        spark_dot_exact,
    )

    norm = (
        f"cast(round(sqrt({spark_dot_exact('embedding', 'embedding')}), 6)"
        " as decimal(18,6))"
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        "label", F.expr(norm).alias("nrm")
    )
    return e.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.min("nrm").cast("double").alias("min_norm"),
        F.max("nrm").cast("double").alias("max_norm"),
        F.round(
            F.sum("nrm").cast("double") / F.count("*"), 6
        ).alias("mean_norm"),
    )


QUERIES = {
    "embeddings_quantize_int8": embeddings_quantize_int8,
    "embeddings_norm_stats": embeddings_norm_stats,
}

ORACLE = {
    "embeddings_norm_stats": """
        WITH ex AS (
            SELECT vec_id, label, unnest(embedding) AS x
            FROM embeddings
        ), norms AS (
            SELECT label,
                   CAST(round(sqrt(
                       CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,12))
                                * CAST(CAST(x AS DOUBLE) AS DECIMAL(18,12)))
                            AS DOUBLE)
                   ), 6) AS DECIMAL(18,6)) AS nrm
            FROM ex GROUP BY vec_id, label
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(MIN(nrm) AS DOUBLE) AS min_norm,
               CAST(MAX(nrm) AS DOUBLE) AS max_norm,
               round(CAST(SUM(nrm) AS DOUBLE) / COUNT(*), 6) AS mean_norm
        FROM norms GROUP BY label
    """,
    "embeddings_quantize_int8": """
        WITH ex AS (
            SELECT vec_id, label,
                   unnest(range(0, len(embedding))) AS pos,
                   unnest(embedding) AS x
            FROM embeddings
        ), stats AS (
            SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY pos
        ), codes AS (
            SELECT e.vec_id, e.label, e.pos,
                   CASE WHEN s.mx = s.mn THEN 0
                        ELSE CAST(floor((CAST(e.x AS DOUBLE) - CAST(s.mn AS DOUBLE))
                                        / (CAST(s.mx AS DOUBLE) - CAST(s.mn AS DOUBLE))
                                        * 255) AS INTEGER)
                   END AS code
            FROM ex e JOIN stats s ON e.pos = s.pos
        )
        SELECT vec_id, label,
               string_agg(CAST(code AS VARCHAR), ',' ORDER BY pos)
                 AS codes,
               CAST(SUM(code) AS BIGINT) AS code_sum
        FROM codes GROUP BY vec_id, label
    """,
}
