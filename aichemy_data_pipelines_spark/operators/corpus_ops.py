"""Corpus-curation operators over ``documents`` — the decision layer
of a training-data pipeline: which docs to KEEP (dedup verdicts),
which are CONTAMINATED (eval-set n-gram overlap), and what makes each
doc distinctive (TF-IDF-shaped term profile).

These compose the primitives in operators/dedup.py / clustering.py
into the artifacts a data curator actually ships:

* ``dedup_keep_one`` — connected components → one keeper per
  near-dup cluster (min doc_id), everything else marked for drop.
* ``decontam_ngram_overlap`` — the standard benchmark-decontamination
  pass: any training doc sharing a long word n-gram with a held-out
  eval doc is flagged, with overlap evidence counts.
* ``docs_distinct_terms`` — per-doc top terms ranked by
  (term frequency DESC, corpus document-frequency ASC) — the TF-IDF
  ordering expressed with exact integers only, so the ranking is
  bit-identical across engines (no FP log/multiply at the sort key).

Scale notes are per-operator; the common theme is that eval sets and
vocabularies are small relative to the corpus, so their sides of
every join broadcast — the corpus side never shuffles more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
    spark_shingles,
    sql_shingles,
)
from aichemy_data_pipelines_spark.operators.clustering import (
    _SQL_CLUSTERS,
    dedup_clusters,
)

# decontamination: 8-gram shingles (long enough that a shared shingle
# is evidence of copying, not chance — at ~40-word vocab the random
# 8-gram space is 40^8 ≈ 6.5e12); every 10th doc_id plays the held-out
# eval set
_DECON_N = 8
_EVAL_MOD = 10
_TOP_TERMS = 3


def dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep/drop verdict from near-dup connected
    components: the cluster representative (min doc_id = the
    cluster_id itself) is kept, every other member dropped.

    This is the artifact the dedup stack exists to produce — the
    filter a corpus build applies before tokenization.

    Scale: one broadcast-able join of the (doc_id → cluster) labels
    against the doc metadata; all the heavy lifting (LSH + jaccard +
    components) is inherited from clustering.py and stays
    equi-join-shaped.
    """
    clusters = dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        clusters.join(docs, "doc_id")
        .select(
            "doc_id",
            "source",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).cast("int").alias("keep"),
        )
    )


def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    distinct word 8-gram with the held-out eval split
    (doc_id % 10 == 0), with evidence counts.

    Output: one row per CONTAMINATED training doc —
    (doc_id, n_shared_shingles = distinct 8-grams shared with any
    eval doc, n_eval_docs = distinct eval docs hit).

    Scale: THE decontam shape for 100 TB — the eval side (benchmark
    suites, a few million n-grams at most) is broadcast to every
    executor, so the training corpus is ONE scan + ONE map-side hash
    join + one agg on doc_id; no corpus-sized shuffle of shingles.
    The explode is distinct-shingles only (bounded by doc length).
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.expr(SPARK_TOKENS).alias("tokens"))
        .where(F.size("tokens") >= _DECON_N)
        .select(
            "doc_id",
            F.explode(
                F.expr(f"array_distinct({spark_shingles('tokens', _DECON_N)})")
            ).alias("sh"),
        )
    )
    ev = d.where(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_id"), "sh"
    )
    tr = d.where(F.col("doc_id") % _EVAL_MOD != 0)
    return (
        tr.join(F.broadcast(ev), "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


def docs_distinct_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinctive terms per document: TF-IDF ordering with an
    all-integer sort key — term frequency DESC (the TF), corpus
    document frequency ASC (the IDF direction), token ASC tie-break.
    No floating-point score, so the ranking is engine-exact.

    Output: (doc_id, rk, token, tf, df).

    Scale: explode → (doc_id, token) count is one well-distributed
    shuffle; the document-frequency table is vocabulary-sized and
    broadcasts; the final top-k is a per-doc window (partition =
    doc_id — maximal parallelism, no global sort).
    """
    tok = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.explode(F.expr(SPARK_TOKENS)).alias("token"))
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        tf.join(F.broadcast(df), "token")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_TERMS)
        .select("doc_id", "rk", "token", "tf", "df")
    )


def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source training-token budget: the first question of any
    corpus build ("how many tokens do we have, and where from").

    Counts are whitespace tokens AND BPE-ish regex tokens (the two
    estimates bracket the real tokenizer), plus chars and the min/max
    doc length — all exact integers.

    Scale: pure map over the corpus (token counting is per-row HOF
    arithmetic, no explode), then one tiny agg on source — the
    map-side partial aggregation does nearly all the work, the
    shuffle carries |sources| rows per partition.
    """
    from aichemy_data_pipelines_spark.operators.textops import _BPE_RE_SPARK

    d = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "source",
            F.size(F.expr(SPARK_TOKENS)).alias("ws"),
            F.size(
                F.expr(
                    f"regexp_extract_all(trim(lower(text)), '{_BPE_RE_SPARK}', 0)"
                )
            ).alias("bpe"),
            F.length("text").alias("chars"),
        )
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws").alias("total_ws_tokens"),
        F.sum("bpe").alias("total_bpe_tokens"),
        F.sum("chars").alias("total_chars"),
        F.min("ws").alias("min_doc_tokens"),
        F.max("ws").alias("max_doc_tokens"),
    )


QUERIES = {
    "dedup_keep_one": dedup_keep_one,
    "decontam_ngram_overlap": decontam_ngram_overlap,
    "docs_distinct_terms": docs_distinct_terms,
    "corpus_token_budget": corpus_token_budget,
}

from aichemy_data_pipelines_spark.operators.textops import _BPE_RE_SQL  # noqa: E402

_T = SQL_TOKENS

ORACLE = {
    "dedup_keep_one": f"""
        WITH clusters AS ({_SQL_CLUSTERS})
        SELECT c.doc_id, d.source, c.cluster_id, c.cluster_size,
               CASE WHEN c.doc_id = c.cluster_id THEN 1 ELSE 0 END AS keep
        FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    """,
    "decontam_ngram_overlap": f"""
        WITH toks AS (
            SELECT doc_id, {_T} AS tokens FROM documents
        ), sh AS (
            SELECT doc_id,
                   unnest(list_distinct({sql_shingles('tokens', _DECON_N)}))
                     AS sh
            FROM toks WHERE len(tokens) >= {_DECON_N}
        ), ev AS (
            SELECT doc_id AS eval_id, sh FROM sh WHERE doc_id % {_EVAL_MOD} = 0
        ), tr AS (
            SELECT doc_id, sh FROM sh WHERE doc_id % {_EVAL_MOD} <> 0
        )
        SELECT tr.doc_id,
               COUNT(DISTINCT tr.sh) AS n_shared_shingles,
               COUNT(DISTINCT ev.eval_id) AS n_eval_docs
        FROM tr JOIN ev ON tr.sh = ev.sh
        GROUP BY tr.doc_id
    """,
    "corpus_token_budget": f"""
        SELECT source,
               COUNT(*) AS n_docs,
               SUM(len({_T})) AS total_ws_tokens,
               SUM(len(regexp_extract_all(trim(lower(text)),
                       '{_BPE_RE_SQL}', 0))) AS total_bpe_tokens,
               SUM(length(text)) AS total_chars,
               MIN(len({_T})) AS min_doc_tokens,
               MAX(len({_T})) AS max_doc_tokens
        FROM documents GROUP BY source
    """,
    "docs_distinct_terms": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_T}) AS token FROM documents
        ), tf AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM tok GROUP BY doc_id, token
        ), df AS (
            SELECT token, COUNT(*) AS df FROM tf GROUP BY token
        )
        SELECT doc_id, rk, token, tf, df FROM (
            SELECT tf.doc_id, tf.token, tf.tf, df.df,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, df.df ASC, tf.token ASC
                   ) AS rk
            FROM tf JOIN df ON tf.token = df.token) t
        WHERE rk <= {_TOP_TERMS}
    """,
}
