"""Pipeline-parity operators: the reference DAG's control-flow
semantics (msconvert_dag.py) re-expressed as declarative DataFrame
ops, oracle-checked on the test tables.

The real file-level pipeline (binaryFile discovery, quiet-wait,
conversion stub, tar archive) lives in
``aichemy_data_pipelines_spark/pipeline/batch.py`` and is exercised
by tests/test_pipeline.py on temp directories; THESE queries isolate
each decision rule on deterministic stand-in state (modular
predicates over doc_id play the role of the filesystem ledger) so
the driver's DuckDB gate can verify the rule itself.

Reference map:
* discover_pending  ← discover_new_runs (msconvert_dag.py:176-221):
  anti-join candidates × (converted ∪ skipped), stable sort, cap.
* attempts_policy   ← _on_convert_failure (:132-158): attempt count
  escalation to a permanent skip sentinel at MAX_ATTEMPTS=3.
* verify_batch      ← verify_batch (:442-476): all-failed / over-
  threshold batch QA verdicts.
* archive_plan      ← archive_original (:346-439): skip|replace
  policy × existing-archive state → action.

Scale: discovery anti-joins shuffle only keys; ledgers are
broadcast-sized (bounded by active backlog, not corpus); verify is a
two-level agg. All patterns hold unchanged at 100 TB because the
driver tables here are metadata, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table

MAX_MAP = 100  # batch cap (ref MS_MAX_MAP)
MAX_ATTEMPTS = 3  # ref _on_convert_failure
FAIL_THRESHOLD = 10  # ref MS_FAIL_THRESHOLD


def pipeline_discover_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental discovery: candidates minus converted minus
    skipped, sorted stably, capped at MAX_MAP.

    Stand-in state: converted ≡ doc_id % 3 = 0, skip-sentinel ≡
    doc_id % 17 = 0 (the filesystem equivalents are parquet ledgers
    in pipeline/batch.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    converted = docs.where(F.col("doc_id") % 3 == 0).select("doc_id")
    skipped = docs.where(F.col("doc_id") % 17 == 0).select("doc_id")
    return (
        docs.join(converted, "doc_id", "left_anti")
        .join(skipped, "doc_id", "left_anti")
        .select("doc_id", "source", "n_chars")
        .orderBy("source", "doc_id")
        .limit(MAX_MAP)
    )


def pipeline_attempts_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry/skip escalation: attempts < MAX → retry with attempts+1,
    attempts ≥ MAX → permanent skip (write sentinel).

    Stand-in state: attempts ≡ doc_id % 5.
    """
    docs = load_table(spark, sf_dir, "documents")
    attempts = (F.col("doc_id") % 5).cast("int")
    return docs.select(
        "doc_id",
        attempts.alias("attempts"),
        F.when(attempts >= MAX_ATTEMPTS, F.lit("skip"))
        .when(attempts > 0, F.lit("retry"))
        .otherwise(F.lit("fresh"))
        .alias("action"),
        F.when(attempts >= MAX_ATTEMPTS, F.lit(1)).otherwise(F.lit(0)).alias(
            "write_sentinel"
        ),
    )


def pipeline_verify_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch QA gate per source-plate: fail if every task failed or
    failures exceed min(threshold, total).

    Stand-in state: status ≡ failed when doc_id % 10 = 0, skipped
    when doc_id % 10 IN (1, 2), else succeeded.
    """
    docs = load_table(spark, sf_dir, "documents")
    status = (
        F.when(F.col("doc_id") % 10 == 0, F.lit("failed"))
        .when((F.col("doc_id") % 10).isin(1, 2), F.lit("skipped"))
        .otherwise(F.lit("succeeded"))
    )
    per = (
        docs.withColumn("status", status)
        .groupBy("source")
        .agg(
            F.count("*").alias("total"),
            F.sum((F.col("status") == "failed").cast("int")).alias("failed"),
            F.sum((F.col("status") == "skipped").cast("int")).alias("skipped"),
            F.sum((F.col("status") == "succeeded").cast("int")).alias(
                "succeeded"
            ),
        )
    )
    threshold = F.least(F.lit(FAIL_THRESHOLD), F.col("total"))
    return per.select(
        "source",
        "total",
        "failed",
        "skipped",
        "succeeded",
        F.when((F.col("total") > 0) & (F.col("failed") == F.col("total")),
               F.lit("fail_all"))
        .when(F.col("failed") > threshold, F.lit("fail_threshold"))
        .otherwise(F.lit("ok"))
        .alias("verdict"),
    )


def pipeline_archive_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive decision table: output exists? × archive exists? ×
    policy(skip|replace) → action.

    Stand-in state: output-exists ≡ doc_id % 3 = 0 (the converted
    set), archive-exists ≡ doc_id % 6 = 0, policy ≡ replace for even
    sources ('src0', 'src2', …) else skip.
    """
    docs = load_table(spark, sf_dir, "documents")
    out_exists = (F.col("doc_id") % 3 == 0).cast("int")
    arc_exists = (F.col("doc_id") % 6 == 0).cast("int")
    policy = F.when(
        F.regexp_extract("source", "([0-9]+)$", 1).cast("int") % 2 == 0,
        F.lit("replace"),
    ).otherwise(F.lit("skip"))
    return docs.select(
        "doc_id",
        "source",
        out_exists.alias("output_exists"),
        arc_exists.alias("archive_exists"),
        policy.alias("policy"),
        F.when(out_exists == 0, F.lit("no_output_skip"))
        .when((arc_exists == 1) & (policy == "skip"), F.lit("keep_existing"))
        .when((arc_exists == 1) & (policy == "replace"), F.lit("replace"))
        .otherwise(F.lit("create"))
        .alias("action"),
    )


QUERIES = {
    "pipeline_discover_pending": pipeline_discover_pending,
    "pipeline_attempts_policy": pipeline_attempts_policy,
    "pipeline_verify_batch": pipeline_verify_batch,
    "pipeline_archive_plan": pipeline_archive_plan,
}

ORACLE = {
    "pipeline_discover_pending": f"""
        SELECT doc_id, source, n_chars
        FROM documents d
        WHERE doc_id % 3 <> 0 AND doc_id % 17 <> 0
        ORDER BY source, doc_id
        LIMIT {MAX_MAP}
    """,
    "pipeline_attempts_policy": f"""
        SELECT doc_id,
               CAST(doc_id % 5 AS INTEGER) AS attempts,
               CASE WHEN doc_id % 5 >= {MAX_ATTEMPTS} THEN 'skip'
                    WHEN doc_id % 5 > 0 THEN 'retry'
                    ELSE 'fresh' END AS action,
               CASE WHEN doc_id % 5 >= {MAX_ATTEMPTS} THEN 1 ELSE 0 END
                 AS write_sentinel
        FROM documents
    """,
    "pipeline_verify_batch": f"""
        WITH st AS (
            SELECT source,
                   CASE WHEN doc_id % 10 = 0 THEN 'failed'
                        WHEN doc_id % 10 IN (1, 2) THEN 'skipped'
                        ELSE 'succeeded' END AS status
            FROM documents
        ), per AS (
            SELECT source, COUNT(*) AS total,
                   CAST(SUM(CASE WHEN status = 'failed' THEN 1 ELSE 0 END) AS BIGINT) AS failed,
                   CAST(SUM(CASE WHEN status = 'skipped' THEN 1 ELSE 0 END) AS BIGINT) AS skipped,
                   CAST(SUM(CASE WHEN status = 'succeeded' THEN 1 ELSE 0 END) AS BIGINT) AS succeeded
            FROM st GROUP BY source
        )
        SELECT source, total, failed, skipped, succeeded,
               CASE WHEN total > 0 AND failed = total THEN 'fail_all'
                    WHEN failed > least({FAIL_THRESHOLD}, total)
                      THEN 'fail_threshold'
                    ELSE 'ok' END AS verdict
        FROM per
    """,
    "pipeline_archive_plan": """
        SELECT doc_id, source,
               CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS output_exists,
               CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END AS archive_exists,
               CASE WHEN CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER)
                         % 2 = 0
                    THEN 'replace' ELSE 'skip' END AS policy,
               CASE WHEN doc_id % 3 <> 0 THEN 'no_output_skip'
                    WHEN doc_id % 6 = 0
                         AND CAST(regexp_extract(source, '([0-9]+)$', 1)
                                  AS INTEGER) % 2 <> 0
                      THEN 'keep_existing'
                    WHEN doc_id % 6 = 0 THEN 'replace'
                    ELSE 'create' END AS action
        FROM documents
    """,
}
