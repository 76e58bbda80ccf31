"""Feature-hashed document embeddings (the "hashing trick",
Weinberger et al. 2009): deterministic signed hashed-token vectors
computed straight from ``documents.text``, so the similarity tier
(ANN / SemDeDup / embedding-cosine dedup) has a text-native vector
source and does not depend solely on the synthetic ``embeddings``
table.

Construction (dimension 64, matching the embeddings table so the
existing LSH hyperplanes apply unchanged):

* token → bucket ``portable_hash64(token, seed_b) % 64`` and sign
  ``±1`` from a second seeded hash — signed hashing keeps collisions
  unbiased (E[collision contribution] = 0);
* per-(doc, bucket) weight = sum of signs over token OCCURRENCES
  (a signed term-frequency);
* L2-normalize per doc, round to 6dp so both engines rank/compare
  identical doubles.

Everything derives from the portable md5 hash family
(functions/hashing.py), so the whole vectorization — not just its
consumers — is oracle-checkable in DuckDB.

The declared query ``text_hash_embeddings`` emits LONG FORM
(doc_id, pos, weight), never an array column (driver canonicalizer
constraint — see tests/test_driver_canon.py); the library entry
:func:`hashed_doc_vectors` assembles the dense ``array<double>``
consumed by the ANN stack (routed through the LSH
hyperplane/bucket machinery in tests/test_hash_embeddings.py).

Scale: one index-free token explode (map-side), one
(doc_id, bucket) shuffle with fanout ≤ 64 per doc, and one per-doc
norm aggregation — the same two-exchange shape as the other
per-document text ops.  No UDFs; all expressions are JVM codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.hashing import (
    spark_hash64,
    sql_hash64,
)
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
)

_DIM = 64
_SEED_BUCKET = 9001
_SEED_SIGN = 9002


def signed_bucket_counts(
    tokened: DataFrame, keys: list[str], token_col: str = "t"
) -> DataFrame:
    """(keys..., pos, w): signed term-frequency per hashed bucket —
    THE definition of the 64-dim hashed space.  Every producer of
    vectors in this space (document vectors here, chunk/query
    vectors in operators/rag_ops.py) MUST route through this helper:
    a formula edit applied to one copy would silently desynchronize
    retrieval scores from the document vectors sharing the space.

    *tokened* carries the key columns plus an exploded ``token_col``.
    """
    return (
        tokened.select(
            *keys,
            F.expr(
                f"{spark_hash64(token_col, seed=_SEED_BUCKET)} % {_DIM}"
            ).alias("pos"),
            F.expr(
                f"case when {spark_hash64(token_col, seed=_SEED_SIGN)} % 2 = 0 "
                "then 1 else -1 end"
            ).alias("sgn"),
        )
        .groupBy(*keys, "pos")
        .agg(F.sum("sgn").cast("bigint").alias("w"))
    )


def _signed_bucket_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, w) over whole documents.

    *docs* must carry ``doc_id`` and ``text``.
    """
    tok = docs.select(
        "doc_id", F.explode(F.expr(SPARK_TOKENS)).alias("t")
    )
    return signed_bucket_counts(tok, ["doc_id"])


def text_hash_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form normalized hashed-token vectors.

    Output: (doc_id, pos, weight) — only non-zero components (signs
    can cancel inside a bucket); weight = w / ||w||₂ rounded to 6dp.
    Docs whose every bucket cancelled (norm 0) emit no rows.
    """
    from pyspark.sql import Window

    # norm via a doc_id window, NOT a groupBy+self-join — the join
    # form evaluates the explode+agg lineage twice (two full corpus
    # scans in the physical plan); the window is one extra exchange
    # on an already-aggregated table
    w = _signed_bucket_weights(load_table(spark, sf_dir, "documents"))
    nrm = F.sqrt(
        F.sum(F.col("w") * F.col("w"))
        .over(Window.partitionBy("doc_id"))
        .cast("double")
    )
    return (
        w.withColumn("nrm", nrm)
        .where((F.col("w") != 0) & (F.col("nrm") > 0))
        .select(
            "doc_id",
            "pos",
            F.round(F.col("w") / F.col("nrm"), 6).alias("weight"),
        )
    )


def hashed_doc_vectors(
    spark: SparkSession, sf_dir: str, dim: int = _DIM
) -> DataFrame:
    """Dense library form: (doc_id, embedding array<double>) with
    ``dim`` L2-normalized components — drop-in for the similarity
    tier (same dimension as the embeddings table, so similarity.py's
    LSH hyperplanes and the cosine kernels apply unchanged)."""
    w = _signed_bucket_weights(load_table(spark, sf_dir, "documents"))
    return (
        w.groupBy("doc_id")
        .agg(
            F.expr("map_from_entries(collect_list(struct(pos, w)))").alias(
                "m"
            ),
            F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias(
                "nrm"
            ),
        )
        .where(F.col("nrm") > 0)
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, {dim - 1}), "
                "i -> round(coalesce(element_at(m, cast(i as bigint)), 0L)"
                " / nrm, 6))"
            ).alias("embedding"),
        )
    )


QUERIES = {"text_hash_embeddings": text_hash_embeddings}

ORACLE = {
    "text_hash_embeddings": f"""
        WITH tok AS (
            SELECT doc_id, unnest({SQL_TOKENS}) AS t FROM documents
        ), b AS (
            SELECT doc_id,
                   ({sql_hash64('t', seed=_SEED_BUCKET)}) % {_DIM} AS pos,
                   CASE WHEN ({sql_hash64('t', seed=_SEED_SIGN)}) % 2 = 0
                        THEN 1 ELSE -1 END AS sgn
            FROM tok
        ), w AS (
            SELECT doc_id, pos, CAST(SUM(sgn) AS BIGINT) AS w
            FROM b GROUP BY doc_id, pos
        ), n AS (
            SELECT doc_id, sqrt(CAST(SUM(w * w) AS DOUBLE)) AS nrm
            FROM w GROUP BY doc_id
        )
        SELECT w.doc_id, w.pos, round(w.w / n.nrm, 6) AS weight
        FROM w JOIN n ON w.doc_id = n.doc_id
        WHERE w.w <> 0 AND n.nrm > 0
    """,
}
