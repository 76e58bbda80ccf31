"""Classifier-driven curriculum mixture — the DCLM "top-k by
classifier" selection (Li et al. 2024) composed from the trained
quality student (operators/classifier_ops.py) and the deterministic
hash-acceptance sampling the mixture ops use (round-10 verdict
widening item 6c).

Shape: score every document with the distilled quality classifier,
cut the corpus into score DECILES (ntile over score DESC with doc_id
tie-break — a total order, so the binning is engine-exact), assign
each decile a fixed KEEP FRACTION from a curriculum schedule (keep
everything from the top deciles, anneal down to zero at the tail),
and accept docs inside a decile by portable hash — existing docs
never flip verdicts as the corpus grows, the property that makes the
mixture reproducible across re-runs and incremental ingests.

The published view is the per-decile AUDIT (10 rows) a curation
review signs off on: score range, budgeted ppm, realized selection.
The per-doc verdict is the same frame pre-aggregation (the
corpus-build driver would join it back as a filter).

Composed VERBATIM from docs_quality_classifier — the oracle nests
its full unrolled training chain — so the mixture can never drift
from the classifier it consumes.

Float portability: scores come 6dp-rounded from the classifier;
ntile ordering uses (score DESC, doc_id) — total, engine-exact; the
min/max per decile are exact picks of existing 6dp values; keep
fractions and the hash acceptance are exact integers (ppm).

Scale: the classifier's one corpus pass + a single ntile window over
(score, doc_id). A global ntile is one skew-free range partition at
100 TB (Spark samples boundaries); the audit agg is 10 rows. The
hash-acceptance filter is a pure map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.functions.hashing import (
    spark_hash64,
    sql_hash64,
)
from aichemy_data_pipelines_spark.operators.classifier_ops import (
    ORACLE as _CLF_ORACLE,
    docs_quality_classifier,
)

_N_BINS = 10
#: keep fraction per decile in ppm, decile 1 = highest scores — the
#: annealing schedule: full mass at the top, halving down the middle,
#: zero at the tail (the DCLM top-k shape with a soft shoulder).
_KEEP_PPM = (
    1_000_000,
    1_000_000,
    750_000,
    500_000,
    250_000,
    125_000,
    62_500,
    31_250,
    15_625,
    0,
)
_ACC_SEED = 53


def corpus_curriculum_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile curriculum-selection audit over classifier scores.

    Output: (decile, n_docs, min_score, max_score, keep_ppm,
    n_selected) — 10 rows, decile 1 = highest-scored documents.
    """
    scored = docs_quality_classifier(spark, sf_dir)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    ppm_arr = ", ".join(str(p) for p in _KEEP_PPM)
    binned = (
        scored.withColumn("decile", F.ntile(_N_BINS).over(w))
        .withColumn(
            "keep_ppm",
            F.expr(f"element_at(array({ppm_arr}), decile)").cast("long"),
        )
        .withColumn(
            "accepted",
            (
                F.expr(
                    f"{spark_hash64('cast(doc_id as string)', seed=_ACC_SEED)}"
                    " % 1000000"
                )
                < F.col("keep_ppm")
            ).cast("long"),
        )
    )
    return binned.groupBy("decile", "keep_ppm").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
        F.sum("accepted").cast("long").alias("n_selected"),
    ).select(
        "decile", "n_docs", "min_score", "max_score", "keep_ppm",
        "n_selected",
    )


QUERIES = {"corpus_curriculum_mix": corpus_curriculum_mix}

_SQL_PPM_ELEMS = ", ".join(str(p) for p in _KEEP_PPM)
_SQL_ACC = sql_hash64("CAST(doc_id AS VARCHAR)", seed=_ACC_SEED)

ORACLE = {
    "corpus_curriculum_mix": f"""
        WITH clf AS ({_CLF_ORACLE["docs_quality_classifier"]}),
        binned AS (
            SELECT doc_id, score,
                   NTILE({_N_BINS}) OVER (ORDER BY score DESC, doc_id)
                     AS decile
            FROM clf
        ), verdicts AS (
            SELECT decile, score,
                   CAST([{_SQL_PPM_ELEMS}][decile] AS BIGINT) AS keep_ppm,
                   CASE WHEN ({_SQL_ACC}) % 1000000
                             < [{_SQL_PPM_ELEMS}][decile]
                        THEN 1 ELSE 0 END AS accepted
            FROM binned
        )
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(score) AS min_score,
               MAX(score) AS max_score,
               keep_ppm,
               CAST(SUM(accepted) AS BIGINT) AS n_selected
        FROM verdicts
        GROUP BY decile, keep_ppm
    """,
}
