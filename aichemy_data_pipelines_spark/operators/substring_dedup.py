"""Exact-substring duplicate detection — the scalable stand-in for
suffix-array dedup (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better").

MinHash (operators/dedup.py) finds *whole-document* near-dups; this
pass finds documents sharing long VERBATIM spans (quotes, mirrored
paragraphs, templated boilerplate) even when the documents as a
whole are dissimilar. The suffix-array formulation of the paper is a
single-machine algorithm; the distributed re-expression is window
hashing:

1. slide a W-token window over every document, hash each window to
   64 bits (portable md5-derived hash, functions/hashing.py);
2. one doc-frequency pass drops windows seen in only one document
   (no duplicate evidence) and windows seen in > _MAX_DF documents
   (boilerplate — joining those would explode quadratically, and a
   span shared by hundreds of docs is template noise, not copying);
3. a self-equi-join on the window hash yields candidate pairs; the
   per-pair count of distinct shared windows measures the length of
   the shared span (k shared consecutive windows ~= a verbatim run
   of W + k - 1 tokens).

Scale: the only corpus-sized shuffles are the window-hash agg (map-
side combined) and the equi-join; the df-cap bounds join fanout at
_MAX_DF per window value, so worst-case pair fanout per window is
_MAX_DF^2 — never all-pairs. At 100 TB, W rises to ~50 tokens and
the hash shrinks the shuffle to (doc_id, int64) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.layout import spread_small_input
from aichemy_data_pipelines_spark.functions.hashing import (
    spark_hash64,
    sql_hash64,
)
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
    exploded_shingles,
    sql_shingles,
)

# 12-token windows: long enough that a shared window is copying, not
# chance (~40-word vocab -> 40^12 >> corpus windows), short enough
# that the ~60-word synthetic docs still produce overlapping spans.
_WIN = 12
_MAX_DF = 32
_MIN_SHARED = 2


def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= _MIN_SHARED verbatim W-token
    windows: (doc_a, doc_b, n_shared_windows), doc_a < doc_b.
    """
    d = (
        exploded_shingles(
            load_table(spark, sf_dir, "documents")
            .transform(spread_small_input)
            .select("doc_id", F.expr(SPARK_TOKENS).alias("tokens"))
            .where(F.size("tokens") >= _WIN),
            _WIN,
            "sh",
        )
        .select("doc_id", F.expr(spark_hash64("sh")).alias("h"))
        .distinct()
    )
    keep = (
        d.groupBy("h")
        .agg(F.count("*").alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= _MAX_DF))
        .select("h")
    )
    wf = d.join(keep, "h")
    a = wf.select(F.col("doc_id").alias("doc_a"), "h")
    b = wf.select(F.col("doc_id").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_windows"))
        .where(F.col("n_shared_windows") >= _MIN_SHARED)
    )


QUERIES = {"dedup_exact_substring": dedup_exact_substring}

ORACLE = {
    "dedup_exact_substring": f"""
        WITH tok AS (
            SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
        ), w AS (
            SELECT DISTINCT doc_id, {sql_hash64('sh')} AS h FROM (
                SELECT doc_id,
                       unnest({sql_shingles('toks', _WIN)}) AS sh
                FROM tok WHERE len(toks) >= {_WIN})
        ), keep AS (
            SELECT h FROM w GROUP BY h
            HAVING COUNT(*) BETWEEN 2 AND {_MAX_DF}
        ), wf AS (
            SELECT w.doc_id, w.h FROM w JOIN keep USING (h)
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS n_shared_windows
        FROM wf a JOIN wf b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= {_MIN_SHARED}
    """,
}
