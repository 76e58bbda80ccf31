"""Domain-level curation cut — the C4 / RefinedWeb "by registered
domain" operations a crawl-scale corpus build runs between ingest
and tokenization:

* ``dedup_within_domain`` — exact-duplicate removal scoped to the
  document's domain (RefinedWeb dedups each crawl part / domain
  independently: cheaper than global, and template reuse inside a
  site is the dominant duplicate source);
* ``corpus_domain_rollup`` — the per-domain quality dashboard
  (doc/token counts, language spread, mean quality + pass rate,
  within-domain duplicate rate) that decides per-domain sampling
  weights and blocklists.

The test corpus has no URL column, so ``source`` is the domain key
(the same stand-in every per-source rollup in corpus_ops.py uses).
A real crawl maps ``url → registered domain`` at ingest with
functions/urls.registered_domain (pure column expression, pinned by
unit tests over literal URLs in tests/test_urls.py) and these
operators run unchanged on that column.

Scale shapes:

* ``dedup_within_domain`` fingerprints the text ONCE (sha2-256, a
  JVM-side map) and shuffles only (doc_id, domain, 64-hex fp) — the
  text column never leaves the scan stage, so the one shuffle moves
  ~80 bytes/row regardless of document size. Group cardinality is
  |distinct (domain, text)| with per-group fanout = duplicate
  multiplicity; no corpus-wide hot key exists because the window key
  includes the fingerprint.
* ``corpus_domain_rollup`` is a SINGLE pass: the quality score is
  inlined from the shared expression (functions/text.
  spark_quality_ratios — no doc_id self-join against text_quality),
  so the whole rollup is scan → map → one (domain, fp) window
  shuffle → one bounded agg on domain (|domains| ≪ |docs|). Two
  exchanges total, pinned in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
    spark_quality_score,
)

#: same bar the six-screen matrix applies (screens_ops._MIN_QUALITY)
_MIN_QUALITY = 0.40


def dedup_within_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup verdicts scoped per domain: for every document, how
    many byte-identical copies its domain holds and whether this row
    is the keeper (lowest doc_id of the copy group).

    Output: (doc_id, domain, n_copies_in_domain, keep).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("source").alias("domain"),
        F.sha2(F.col("text"), 256).alias("fp"),
    )
    w = Window.partitionBy("domain", "fp")
    return d.select(
        "doc_id",
        "domain",
        F.count("*").over(w).cast("long").alias("n_copies_in_domain"),
        (F.col("doc_id") == F.min("doc_id").over(w))
        .cast("int")
        .alias("keep"),
    )


def corpus_domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain curation profile: volume, language spread, quality
    level/pass-rate, and within-domain exact-dup rate — the table a
    corpus owner reads before setting per-domain sampling weights.

    Output: (domain, n_docs, n_langs, ws_tokens, mean_quality,
    quality_pass_rate, exact_dup_rate).
    """
    base = (
        load_table(spark, sf_dir, "documents")
        .withColumn("tokens", F.expr(SPARK_TOKENS))
        .select(
            "doc_id",
            F.col("source").alias("domain"),
            "lang",
            F.size("tokens").alias("ws"),
            F.expr(spark_quality_score("tokens", "text")).alias(
                "quality_score"
            ),
            F.sha2(F.col("text"), 256).alias("fp"),
        )
    )
    w = Window.partitionBy("domain", "fp")
    flagged = base.select(
        "domain",
        "lang",
        "ws",
        "quality_score",
        (F.col("doc_id") == F.min("doc_id").over(w))
        .cast("int")
        .alias("keep"),
    )
    return (
        flagged.groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum("ws").cast("long").alias("ws_tokens"),
            F.round(F.avg("quality_score"), 6).alias("mean_quality"),
            F.round(
                F.avg(
                    (F.col("quality_score") >= _MIN_QUALITY).cast(
                        "double"
                    )
                ),
                6,
            ).alias("quality_pass_rate"),
            F.round(
                F.avg((F.col("keep") == 0).cast("double")), 6
            ).alias("exact_dup_rate"),
        )
    )


QUERIES = {
    "dedup_within_domain": dedup_within_domain,
    "corpus_domain_rollup": corpus_domain_rollup,
}

# the oracle groups by the raw text where the operator groups by its
# sha2-256 fingerprint — identical partitions barring a SHA-256
# collision, which is the operator's documented contract
_SQL_WITHIN_DOMAIN = """
    SELECT doc_id,
           source AS domain,
           CAST(COUNT(*) OVER (PARTITION BY source, text) AS BIGINT)
               AS n_copies_in_domain,
           CASE WHEN doc_id = MIN(doc_id)
                             OVER (PARTITION BY source, text)
                THEN 1 ELSE 0 END AS keep
    FROM documents
"""

from aichemy_data_pipelines_spark.operators.textops import (  # noqa: E402
    ORACLE as _TEXT_ORACLE,
)

ORACLE = {
    "dedup_within_domain": _SQL_WITHIN_DOMAIN,
    "corpus_domain_rollup": f"""
        WITH q AS (
            SELECT doc_id, quality_score
            FROM ({_TEXT_ORACLE["text_quality"]})
        ),
        dd AS ({_SQL_WITHIN_DOMAIN})
        SELECT d.source AS domain,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT d.lang) AS BIGINT) AS n_langs,
               CAST(SUM(len({SQL_TOKENS})) AS BIGINT) AS ws_tokens,
               ROUND(AVG(q.quality_score), 6) AS mean_quality,
               ROUND(AVG(CASE WHEN q.quality_score >= {_MIN_QUALITY}
                              THEN 1.0 ELSE 0.0 END), 6)
                   AS quality_pass_rate,
               ROUND(AVG(CASE WHEN dd.keep = 0
                              THEN 1.0 ELSE 0.0 END), 6)
                   AS exact_dup_rate
        FROM documents d
        JOIN q ON d.doc_id = q.doc_id
        JOIN dd ON d.doc_id = dd.doc_id
        GROUP BY d.source
    """,
}
