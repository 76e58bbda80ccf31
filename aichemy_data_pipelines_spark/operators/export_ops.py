"""Training-data export planning — the step between corpus curation
and the tokenizer: deterministic sharding and fixed-context sequence
packing.

* ``corpus_shard_plan`` — assign every document to one of _N_SHARDS
  output shards by portable hash (stable under reruns and appends —
  a doc's shard never depends on other docs), and report per-shard
  doc/token totals plus a balance check. This is the plan a 100 TB
  corpus export runs before writing: the assignment is a pure map,
  the audit a small agg.
* ``corpus_packing_plan`` — pack each shard's documents into fixed
  _CTX-token context windows (the "sample packing" step of LLM
  training-data prep): docs are laid out in deterministic doc_id
  order, a running token cumsum assigns each doc to bin
  floor((cum - tokens) / _CTX) — i.e. a doc starts in the bin where
  its first token lands; the report gives per-bin fill. Greedy
  first-fit packing is inherently sequential; this cumsum layout is
  the order-preserving variant that distributes: one shuffle on
  shard, per-shard window state only.

Token counts use the whitespace tokenizer (functions/text.py) — the
cheap lower bound the budget ops already use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.hashing import (
    spark_hash64,
    sql_hash64,
)
from aichemy_data_pipelines_spark.functions.text import SPARK_TOKENS, SQL_TOKENS

_N_SHARDS = 16
_CTX = 2048


def _sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"size({SPARK_TOKENS})").alias("n_tokens"),
    )
    return d.withColumn(
        "shard",
        F.expr(f"{spark_hash64('cast(doc_id as string)')} % {_N_SHARDS}"),
    )


def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard export audit: (shard, n_docs, total_tokens,
    max_doc_tokens). Scale: pure map + 16-row agg."""
    return _sharded(spark, sf_dir).groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max("n_tokens").alias("max_doc_tokens"),
    )


def corpus_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(shard, bin) packing report: (shard, bin, n_docs,
    bin_tokens) for _CTX-token context windows laid out in doc_id
    order within each shard.

    Scale: one shuffle on shard; the cumsum window holds one shard's
    running total. Bin count per shard ~ shard_tokens / _CTX.
    """
    d = _sharded(spark, sf_dir)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = d.select(
        "shard",
        "n_tokens",
        F.expr(f"(sum(n_tokens) over "
               f"(partition by shard order by doc_id "
               f"rows between unbounded preceding and current row) "
               f"- n_tokens) div {_CTX}").alias("bin"),
    )
    return binned.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


def corpus_packing_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-aware packing (r17 verdict #6b): the _CTX-token
    packing plan computed over ONLY the documents the curation funnel
    keeps — ``corpus_packing_plan`` packs every document
    independently of curation, so a benchmark-contaminated or
    duplicate doc could still be laid out into a training shard even
    though ``corpus_curation_funnel`` counted it dropped. This query
    closes that gap: the packing input is the
    ``curation_flags.final`` slice (quality gate AND NOT eval-holdout
    AND NOT decontam-flagged AND dedup keep-one), so flagged docs
    cannot enter shards by construction, and the packed totals
    reconcile with the funnel's ``n_final`` / ``final_ws_tokens``
    exactly (tests/test_export_ops.py funnel-consistency pin).

    Scale: the flag table inherits each stage's optimal shape
    (pure-map quality, broadcast decontam, equi-join dedup — see
    corpus_ops.curation_flags); the packing adds the same ONE shard
    shuffle + per-shard cumsum window as corpus_packing_plan. The
    token counts reuse the flag table's ``ws`` column — no second
    tokenize pass.

    Output: (shard, bin, n_docs, bin_tokens) — the
    corpus_packing_plan shape over the curated corpus.
    """
    from aichemy_data_pipelines_spark.catalog import share_table_scan
    from aichemy_data_pipelines_spark.operators.corpus_ops import (
        curation_flags,
    )

    # the funnel's own discipline: persist ONE documents scan for the
    # flag stages past the footer-size gate (text leaves storage once)
    share_table_scan(spark, sf_dir, "documents")
    kept = (
        curation_flags(spark, sf_dir)
        .where(F.col("final"))
        .select("doc_id", F.col("ws").alias("n_tokens"))
        .withColumn(
            "shard",
            F.expr(
                f"{spark_hash64('cast(doc_id as string)')} % {_N_SHARDS}"
            ),
        )
    )
    binned = kept.select(
        "shard",
        "n_tokens",
        F.expr(f"(sum(n_tokens) over "
               f"(partition by shard order by doc_id "
               f"rows between unbounded preceding and current row) "
               f"- n_tokens) div {_CTX}").alias("bin"),
    )
    return binned.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


QUERIES = {
    "corpus_shard_plan": corpus_shard_plan,
    "corpus_packing_plan": corpus_packing_plan,
    "corpus_packing_clean": corpus_packing_clean,
}

_SQL_SHARDED = f"""
    sharded AS (
        SELECT doc_id,
               len({SQL_TOKENS}) AS n_tokens,
               {sql_hash64('CAST(doc_id AS VARCHAR)')} % {_N_SHARDS} AS shard
        FROM documents
    )"""

ORACLE = {
    "corpus_shard_plan": f"""
        WITH {_SQL_SHARDED}
        SELECT shard, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               MAX(n_tokens) AS max_doc_tokens
        FROM sharded GROUP BY shard
    """,
    "corpus_packing_plan": f"""
        WITH {_SQL_SHARDED}, binned AS (
            SELECT shard, n_tokens,
                   CAST((SUM(n_tokens) OVER (
                        PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tokens) // {_CTX} AS BIGINT) AS bin
            FROM sharded
        )
        SELECT shard, bin, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
        FROM binned GROUP BY shard, bin
    """,
}

from aichemy_data_pipelines_spark.operators import corpus_ops as _corpus_ops  # noqa: E402

# composes the curation flag CTE verbatim (the funnel/screens
# pattern): if any gate's per-stage definition drifts, the clean
# packing drifts with it — and stays reconciled with the funnel
ORACLE["corpus_packing_clean"] = f"""
    WITH {_corpus_ops._SQL_FIN}, kept AS (
        SELECT doc_id, ws AS n_tokens,
               {sql_hash64('CAST(doc_id AS VARCHAR)')} % {_N_SHARDS} AS shard
        FROM fin WHERE final
    ), binned AS (
        SELECT shard, n_tokens,
               CAST((SUM(n_tokens) OVER (
                    PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens) // {_CTX} AS BIGINT) AS bin
        FROM kept
    )
    SELECT shard, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM binned GROUP BY shard, bin
"""
