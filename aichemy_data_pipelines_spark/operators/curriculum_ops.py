"""Classifier-driven curriculum mixture — the DCLM "top-k by
classifier" selection (Li et al. 2024) composed from the trained
quality student (operators/classifier_ops.py) and the deterministic
hash-acceptance sampling the mixture ops use (round-10 verdict
widening item 6c).

Shape: score every document with the distilled quality classifier,
cut the corpus into score DECILES **without a global sort** — exact
percentile cutoffs (p10..p90) in one aggregate, broadcast as a
9-element literal, every doc binned by counting cutoffs below its
score (the orders_spend_deciles recipe: a naive NTILE(10) OVER
(ORDER BY score) funnels the whole corpus through ONE window task and
dies at 100 TB; the two-pass cutoff form is tiny agg → broadcast →
pure map). Each decile carries a fixed KEEP FRACTION from a
curriculum schedule (keep everything from the top deciles, anneal
down to zero at the tail), and docs inside a decile are accepted by
portable hash — existing docs never flip verdicts as the corpus
grows, the property that makes the mixture reproducible across
re-runs and incremental ingests.

The published view is the per-decile AUDIT a curation review signs
off on: doc count, score range, budgeted ppm, realized selection.
(Score ties can leave a boundary decile empty — cutoff binning
trades NTILE's equal counts for scalability; the audit shows the
realized sizes, which is the point of an audit.) The per-doc verdict
is the same frame pre-aggregation.

Composed VERBATIM from docs_quality_classifier — the oracle nests
its full unrolled training chain — so the mixture can never drift
from the classifier it consumes.

Float portability: scores come 6dp-rounded from the classifier; the
percentile cutoffs are 6dp-rounded before the strict `score > cut`
compare (the spend-deciles discipline: 6dp data against 6dp-rounded
cutoffs only collide when the interpolation hits a data point
exactly, which both engines compute exactly); keep fractions and the
hash acceptance are exact integers (ppm).

Scale: the classifier's one corpus pass + one bounded percentile
aggregate + a pure-map bin/accept + a ≤10-row agg. No global sort,
no corpus-scale shuffle after the classifier's own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
_QS = [q / 10 for q in range(1, _N_BINS)]  # 0.1 .. 0.9


def corpus_curriculum_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile curriculum-selection audit over classifier scores.

    Output: (decile, n_docs, min_score, max_score, keep_ppm,
    n_selected) — decile 1 = highest-scored documents.
    """
    # checkpoint the two-column scored frame: it feeds BOTH the
    # cutoff aggregate and the binning map — left lazy each reference
    # re-embeds the classifier's whole feature/scoring chain (the
    # r11 double-evaluation defect class; plan pinned at zero scans)
    scored = (
        docs_quality_classifier(spark, sf_dir)
        .select("doc_id", "score")
        .localCheckpoint()
    )
    qs = ", ".join(f"{q:.1f}" for q in _QS)
    cuts = scored.agg(
        F.expr(
            f"transform(percentile(score, array({qs})), c -> round(c, 6))"
        ).alias("cs")
    )
    ppm_arr = ", ".join(str(p) for p in _KEEP_PPM)
    binned = (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "score",
            # cuts ascend; a score above k cutoffs sits in decile
            # 10 - k (1 = above all nine = the top decile)
            (
                F.lit(_N_BINS)
                - F.expr("size(filter(cs, c -> score > c))")
            ).alias("decile"),
        )
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
_SQL_QS = ", ".join(f"{q:.1f}" for q in _QS)
_SQL_ACC = sql_hash64("CAST(doc_id AS VARCHAR)", seed=_ACC_SEED)

ORACLE = {
    "corpus_curriculum_mix": f"""
        WITH clf AS ({_CLF_ORACLE["docs_quality_classifier"]}),
        scored AS (SELECT doc_id, score FROM clf),
        cuts AS (
            SELECT list_transform(
                       quantile_cont(score, [{_SQL_QS}]),
                       c -> round(c, 6)) AS cs
            FROM scored
        ), binned AS (
            SELECT s.doc_id, s.score,
                   {_N_BINS} - len(list_filter(c.cs, x -> s.score > x))
                     AS decile
            FROM scored s, cuts c
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
