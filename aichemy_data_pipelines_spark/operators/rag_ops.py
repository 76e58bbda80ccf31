"""RAG chunk retrieval — the composed capstone of the round-5 text
stack: documents are chunked into sliding token windows
(operators/chunking_ops.py geometry), every chunk gets a signed
feature-hashed unit vector in the SAME 64-dim hashed space as the
document vectors (operators/hash_embeddings.py seeds), and retrieval
runs as SPARSE cosine top-k through an inverted index on the hash
buckets — the lexical/dense-hybrid retrieval shape (cf. SPLADE-style
sparse retrieval) that serves RAG at corpus scale.

Query set = documents with ``doc_id % 100 == 0`` (their full text is
the "question"); corpus = every chunk of every other document.

Why this is the 100 TB shape:

* the scoring join is an equi-join on the bucket id — i.e. an
  inverted-index lookup.  Unit-normalized vectors make the dot
  product over SHARED buckets the exact cosine (absent buckets
  contribute 0), so no dense arithmetic ever touches the corpus;
* the query side is tiny and broadcast; per-bucket corpus postings
  stream through the join.  At production dimensionality (2^18+
  buckets instead of 64) the postings per bucket are sparse and the
  join prunes to exactly the classic inverted-index probe.
  PRECONDITION (enforced): broadcast is only safe because the query
  set is a bounded batch — the testdata models it as a corpus
  fraction (``doc_id % 100 == 0``), which would NOT broadcast at
  100 TB, so a guard (``spark.graft.rag.maxBroadcastQueryRows``,
  default 1e7 estimated WEIGHT rows — the side actually hinted:
  query docs × ≤_DIM nonzero weights each, doc count from a
  column-pruned scan) falls back to an unhinted join past the
  bound — misuse degrades to a shuffle plan, not an OOM;
* weights are 6dp decimals, so pair scores are EXACT decimal sums —
  order-independent, rank-stable, and hash-checkable in DuckDB.

CANDIDATE CONTRACT (inherent to inverted-index retrieval): only
chunks sharing at least one bucket with the query are candidates —
zero-overlap chunks (true cosine exactly 0) are unreachable through
the index and never ranked, exactly as in any production sparse
retriever.  A query overlapping fewer than ``_TOPK`` chunks returns
fewer rows.  The plain-Python mirror in tests/test_rag.py scores the
same candidate set.

Output: (query_doc, rk, doc_id, chunk_idx, cosine) — top ``_TOPK``
candidate chunks per query, ties broken by (doc_id, chunk_idx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
from aichemy_data_pipelines_spark.operators.chunking_ops import (
    _CHUNK,
    _STRIDE,
    spark_chunk_slice,
    spark_last_chunk,
    sql_chunk_slice,
    sql_last_chunk,
)
from aichemy_data_pipelines_spark.operators.hash_embeddings import (
    _DIM,
    _SEED_BUCKET,
    _SEED_SIGN,
    signed_bucket_counts,
)

_Q_MOD = 100  # doc_id % _Q_MOD == 0 -> query document
_TOPK = 3


def _unit_weights(tokened: DataFrame, keys: list[str]) -> DataFrame:
    """(keys..., pos, weight): signed hashed-token counts per key,
    L2-normalized, 6dp decimal — the sparse unit vector.  The bucket
    counts come from hash_embeddings.signed_bucket_counts, the ONE
    definition of the hashed space, so chunk/query vectors cannot
    drift from the document vectors sharing it."""
    w = signed_bucket_counts(
        tokened.select(*keys, F.explode(F.col("tokens")).alias("t")),
        keys,
    )
    nrm = F.sqrt(
        F.sum(F.col("w") * F.col("w"))
        .over(Window.partitionBy(*keys))
        .cast("double")
    )
    return (
        w.withColumn("nrm", nrm)
        .where((F.col("w") != 0) & (F.col("nrm") > 0))
        .select(
            *keys,
            "pos",
            F.expr(
                "cast(round(w / nrm, 6) as decimal(12,6))"
            ).alias("weight"),
        )
    )


def rag_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(SPARK_TOKENS).alias("tokens")
    )
    queries = docs.where(F.col("doc_id") % _Q_MOD == 0)
    corpus = docs.where(F.col("doc_id") % _Q_MOD != 0).withColumn(
        "n", F.size("tokens")
    )
    chunks = corpus.select(
        "doc_id",
        "n",
        "tokens",
        F.explode(
            F.expr(f"sequence(0, {spark_last_chunk()})")
        ).alias("i"),
    ).select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_idx"),
        F.expr(spark_chunk_slice()).alias("tokens"),
    )
    qw = _unit_weights(queries, ["doc_id"]).withColumnRenamed(
        "doc_id", "query_doc"
    ).withColumnRenamed("weight", "qweight")
    cw = _unit_weights(chunks, ["doc_id", "chunk_idx"])
    from aichemy_data_pipelines_spark.functions.hints import (
        DEFAULT_MAX_BROADCAST_ROWS,
        RAG_MAX_QUERY_ROWS,
        broadcast_when,
        conf_int,
    )

    # Cheap proxy for the HINTED side's size: each query doc fans out
    # to ≤ _DIM nonzero weight rows, so estimated broadcast rows =
    # doc count (column-pruned scan) × _DIM.
    n_query_docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % _Q_MOD == 0)
        .select("doc_id")
        .count()
    )
    qw_side = broadcast_when(
        qw,
        n_query_docs * _DIM,
        conf_int(spark, RAG_MAX_QUERY_ROWS, DEFAULT_MAX_BROADCAST_ROWS),
        "rag_chunk_retrieval",
    )
    scores = (
        qw_side
        .join(cw, "pos")
        .groupBy("query_doc", "doc_id", "chunk_idx")
        .agg(
            F.sum(F.expr("qweight * weight")).alias("s")
        )
    )
    rk = Window.partitionBy("query_doc").orderBy(
        F.desc("s"), "doc_id", "chunk_idx"
    )
    return (
        scores.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") <= _TOPK)
        .select(
            "query_doc",
            "rk",
            "doc_id",
            "chunk_idx",
            F.round(F.col("s").cast("double"), 6).alias("cosine"),
        )
    )


QUERIES = {"rag_chunk_retrieval": rag_chunk_retrieval}


def _sql_unit_weights(src: str, keys: str) -> str:
    """DuckDB twin of _unit_weights over a (keys..., tokens) CTE."""
    return f"""
        SELECT {keys}, pos,
               CAST(round(w / nrm, 6) AS DECIMAL(12,6)) AS weight
        FROM (
            SELECT {keys}, pos, w,
                   sqrt(CAST(SUM(w * w) OVER (PARTITION BY {keys})
                        AS DOUBLE)) AS nrm
            FROM (
                SELECT {keys},
                       ({sql_hash64('t', seed=_SEED_BUCKET)}) % {_DIM}
                         AS pos,
                       CAST(SUM(CASE WHEN
                           ({sql_hash64('t', seed=_SEED_SIGN)}) % 2 = 0
                           THEN 1 ELSE -1 END) AS BIGINT) AS w
                FROM (SELECT {keys}, unnest(tokens) AS t FROM {src})
                GROUP BY {keys}, pos
            )
        ) WHERE w <> 0 AND nrm > 0
    """


ORACLE = {
    "rag_chunk_retrieval": f"""
        WITH toks AS (
            SELECT doc_id, {SQL_TOKENS} AS tokens FROM documents
        ), qdocs AS (
            SELECT doc_id, tokens FROM toks WHERE doc_id % {_Q_MOD} = 0
        ), cdocs AS (
            SELECT doc_id, tokens, len(tokens) AS n
            FROM toks WHERE doc_id % {_Q_MOD} <> 0
        ), chunks AS (
            SELECT doc_id,
                   CAST(i AS INTEGER) AS chunk_idx,
                   {sql_chunk_slice()} AS tokens
            FROM (
                SELECT doc_id, tokens, n,
                       unnest(range(0, ({sql_last_chunk()}) + 1)) AS i
                FROM cdocs
            )
        ), qw AS (
            SELECT doc_id AS query_doc, pos, weight AS qweight
            FROM ({_sql_unit_weights("qdocs", "doc_id")})
        ), cw AS (
            {_sql_unit_weights("chunks", "doc_id, chunk_idx")}
        ), scores AS (
            SELECT qw.query_doc, cw.doc_id, cw.chunk_idx,
                   SUM(qw.qweight * cw.weight) AS s
            FROM qw JOIN cw ON qw.pos = cw.pos
            GROUP BY qw.query_doc, cw.doc_id, cw.chunk_idx
        )
        SELECT query_doc, rk, doc_id, chunk_idx,
               round(CAST(s AS DOUBLE), 6) AS cosine
        FROM (
            SELECT query_doc, doc_id, chunk_idx, s,
                   row_number() OVER (
                       PARTITION BY query_doc
                       ORDER BY s DESC, doc_id, chunk_idx
                   ) AS rk
            FROM scores
        ) WHERE rk <= {_TOPK}
    """,
}
