"""Cross-modal dedup composition: one verdict table over BOTH dedup
legs — text MinHash-LSH candidate pairs (operators/dedup.py) and
image perceptual-hash pairs (operators/multimodal_ops.py) — so a
multimodal-corpus owner sees, per candidate pair, WHICH modality
flagged it and whether the evidence agrees.

Real-world shape: interleaved image-text corpora (LAION-style) dedup
each modality independently, then reconcile — an image pair whose
captions also near-dup ('both') is a much stronger duplicate signal
than either leg alone, while 'image_only' (same image, different
text) and 'text_only' (same boilerplate caption, different images)
drive different keep/drop policies.

Composed VERBATIM from the two member operators (the
screens_matrix/ann_recall_eval pattern): the Spark side calls
dedup_minhash_lsh and image_phash_pairs; the oracle nests the
minhash oracle and the shared SQL_PHASH_PAIR_CTES prefix, so the
composition can never drift from the members it composes.

Scale: both member pair sets are banded candidate generations
(bounded-fanout equi-joins, never all-pairs — see the members'
docstrings); the reconciliation is one full-outer equi-join on the
pair key, sized by the candidate counts (<< corpus), not the corpus.

No reference twin: the reference pipeline is single-modality; this
extends the dedup tier per the round-8/9 verdict widening list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.operators.dedup import (
    ORACLE as _DEDUP_ORACLE,
    dedup_minhash_lsh,
)
from aichemy_data_pipelines_spark.operators.multimodal_ops import (
    SQL_PHASH_PAIR_CTES,
    image_phash_pairs,
)


def compose_pair_verdicts(text_pairs: DataFrame, image_pairs: DataFrame) -> DataFrame:
    """Full-outer reconciliation of two (doc_a, doc_b) pair sets into
    the verdict table — factored out so the three-way verdict logic
    is unit-testable on crafted pairs (the synthetic corpus's image
    leg is empty below sf0.1, so only crafted inputs exercise
    'both' / 'image_only' at test SF; see tests/test_crossmodal.py)."""
    t = text_pairs.select("doc_a", "doc_b").withColumn(
        "text_dup", F.lit(1)
    )
    i = image_pairs.select("doc_a", "doc_b").withColumn(
        "image_dup", F.lit(1)
    )
    m = t.join(i, ["doc_a", "doc_b"], "full_outer").select(
        "doc_a",
        "doc_b",
        F.coalesce("text_dup", F.lit(0)).alias("text_dup"),
        F.coalesce("image_dup", F.lit(0)).alias("image_dup"),
    )
    return m.withColumn(
        "verdict",
        F.when(
            (F.col("text_dup") == 1) & (F.col("image_dup") == 1),
            F.lit("both"),
        )
        .when(F.col("text_dup") == 1, F.lit("text_only"))
        .otherwise(F.lit("image_only")),
    )


def dedup_cross_modal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair cross-modal dedup verdicts.

    Output: (doc_a, doc_b, text_dup, image_dup, verdict) with
    verdict ∈ both | text_only | image_only, one row per pair flagged
    by EITHER leg (full outer reconciliation), doc_a < doc_b in both
    legs by construction.
    """
    return compose_pair_verdicts(
        dedup_minhash_lsh(spark, sf_dir),
        image_phash_pairs(spark, sf_dir),
    )


QUERIES = {"dedup_cross_modal": dedup_cross_modal}

ORACLE = {
    "dedup_cross_modal": f"""
        WITH text_pairs AS ({_DEDUP_ORACLE["dedup_minhash_lsh"]}),
        image_pairs AS (
            WITH {SQL_PHASH_PAIR_CTES}
            SELECT doc_a, doc_b FROM close_pairs
        ),
        m AS (
            SELECT doc_a, doc_b,
                   CASE WHEN t.flag IS NULL THEN 0 ELSE 1 END AS text_dup,
                   CASE WHEN i.flag IS NULL THEN 0 ELSE 1 END AS image_dup
            FROM (SELECT doc_a, doc_b, 1 AS flag FROM text_pairs) t
            FULL OUTER JOIN
                 (SELECT doc_a, doc_b, 1 AS flag FROM image_pairs) i
            USING (doc_a, doc_b)
        )
        SELECT doc_a, doc_b, text_dup, image_dup,
               CASE WHEN text_dup = 1 AND image_dup = 1 THEN 'both'
                    WHEN text_dup = 1 THEN 'text_only'
                    ELSE 'image_only' END AS verdict
        FROM m
    """,
}
