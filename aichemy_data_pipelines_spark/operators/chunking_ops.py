"""Document chunking — fixed-size sliding token windows with
overlap, the standard preprocessing for RAG indexing and
context-window packing: every document becomes ceil-spaced chunks of
``_CHUNK`` tokens starting every ``_STRIDE`` tokens (overlap =
_CHUNK - _STRIDE), the last chunk ragged, short docs one chunk.

Chunk identity is content-addressed (md5 of the space-joined token
slice), so downstream chunk-level dedup / retrieval indexes join on
the hash — and the whole op is oracle-checkable since tokenization
and hashing are the portable primitives (functions/text.py,
functions/hashing.py).

Scale: pure map + one INDEX explode (the chunk-count sequence —
explode of a tiny int range, then ONE slice per emitted row; same
O(len) rationale as functions/text.exploded_shingles).  No shuffle
at all: the operator is embarrassingly parallel over documents,
which is what makes chunking a free stage at 100 TB.

Output: (doc_id, chunk_idx, start_token, n_tokens, chunk_hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
)

_CHUNK = 64  # tokens per chunk
_STRIDE = 48  # chunk start spacing (overlap = 16)


# The chunk GEOMETRY lives in exactly one place — these four
# fragments — because downstream consumers join on content-addressed
# chunk identity (operators/rag_ops.py): a geometry edit applied to
# one copy would silently desynchronize retrieval from the chunk
# index.
def spark_last_chunk(n: str = "n") -> str:
    """Last chunk index: 0 for short docs, else ceil((n-C)/S)."""
    return (
        f"case when {n} <= {_CHUNK} then 0 "
        f"else ({n} - {_CHUNK} + {_STRIDE} - 1) div {_STRIDE} end"
    )


def sql_last_chunk(n: str = "n") -> str:
    return (
        f"CASE WHEN {n} <= {_CHUNK} THEN 0 "
        f"ELSE ({n} - {_CHUNK} + {_STRIDE} - 1) // {_STRIDE} END"
    )


def spark_chunk_slice(tokens: str = "tokens", i: str = "i") -> str:
    return f"slice({tokens}, {i} * {_STRIDE} + 1, {_CHUNK})"


def sql_chunk_slice(tokens: str = "tokens", i: str = "i") -> str:
    return (
        f"{tokens}[{i} * {_STRIDE} + 1:"
        f"{i} * {_STRIDE} + {_CHUNK}]"
    )


def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(SPARK_TOKENS).alias("tokens"))
        .withColumn("n", F.size("tokens"))
    )
    return (
        docs.select(
            "doc_id",
            "tokens",
            "n",
            F.explode(
                F.expr(f"sequence(0, {spark_last_chunk()})")
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_idx"),
            (F.col("i") * _STRIDE).cast("bigint").alias("start_token"),
            F.least(
                F.lit(_CHUNK), F.col("n") - F.col("i") * _STRIDE
            )
            .cast("bigint")
            .alias("n_tokens"),
            F.expr(
                f"md5(concat_ws(' ', {spark_chunk_slice()}))"
            ).alias("chunk_hash"),
        )
    )


def docs_duplicated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-passage report — the C4/Lee-et-al.
    "repeated span" signal at chunk granularity: any chunk hash seen
    in MORE THAN ONE document is a duplicated passage; the report
    gives its spread and the canonical (lexicographically first)
    occurrence curation would keep.

    Complements dedup_exact_substring (hashed 12-token windows, pair
    output): this is the aggregate per-passage view over the SAME
    chunk index retrieval uses, so "passage is duplicated" and
    "passage is retrievable" agree by construction.

    Scale: one chunk pass + one groupBy(chunk_hash) — the group key
    is content-addressed, so partial aggregation collapses repeats
    map-side and the shuffle carries one row per distinct passage.

    Output: (chunk_hash, n_docs, n_occurrences, first_doc,
    first_chunk).
    """
    ch = docs_chunk_windows(spark, sf_dir)
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occurrences"),
            # lexicographic struct-min = (min doc, min chunk within it)
            F.min(F.struct("doc_id", "chunk_idx")).alias("first"),
        )
        .where(F.col("n_docs") > 1)
        .select(
            "chunk_hash",
            "n_docs",
            "n_occurrences",
            F.col("first.doc_id").alias("first_doc"),
            F.col("first.chunk_idx").alias("first_chunk"),
        )
    )


QUERIES = {
    "docs_chunk_windows": docs_chunk_windows,
    "docs_duplicated_passages": docs_duplicated_passages,
}

# shared oracle chunk table: (doc_id, chunk_idx, start_token,
# n_tokens, chunk_hash) — consumed by both declared queries
_SQL_CHUNKS = f"""
        toks AS (
            SELECT doc_id, {SQL_TOKENS} AS tokens,
                   len({SQL_TOKENS}) AS n
            FROM documents
        ), idx AS (
            SELECT doc_id, tokens, n,
                   unnest(range(0, ({sql_last_chunk()}) + 1)) AS i
            FROM toks
        ), chunk_rows AS (
            SELECT doc_id,
                   CAST(i AS INTEGER) AS chunk_idx,
                   CAST(i * {_STRIDE} AS BIGINT) AS start_token,
                   CAST(least({_CHUNK}, n - i * {_STRIDE}) AS BIGINT)
                     AS n_tokens,
                   md5(array_to_string({sql_chunk_slice()}, ' '))
                     AS chunk_hash
            FROM idx
        )
"""

ORACLE = {
    "docs_chunk_windows": f"""
        WITH {_SQL_CHUNKS}
        SELECT doc_id, chunk_idx, start_token, n_tokens, chunk_hash
        FROM chunk_rows
    """,
    "docs_duplicated_passages": f"""
        WITH {_SQL_CHUNKS},
        agg AS (
            SELECT chunk_hash,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_occurrences
            FROM chunk_rows GROUP BY chunk_hash
            HAVING COUNT(DISTINCT doc_id) > 1
        ),
        firsts AS (
            SELECT chunk_hash, doc_id AS first_doc,
                   chunk_idx AS first_chunk
            FROM (
                SELECT chunk_hash, doc_id, chunk_idx,
                       row_number() OVER (
                           PARTITION BY chunk_hash
                           ORDER BY doc_id, chunk_idx
                       ) AS rn
                FROM chunk_rows
            ) WHERE rn = 1
        )
        SELECT a.chunk_hash, a.n_docs, a.n_occurrences,
               f.first_doc, f.first_chunk
        FROM agg a JOIN firsts f ON a.chunk_hash = f.chunk_hash
    """,
}
