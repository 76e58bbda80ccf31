"""Corpus overlap analytics: cross-source contamination matrix and
boilerplate-shingle coverage.

Two curation diagnostics every large-scale training-data pipeline
runs before mixing corpora (C4, RefinedWeb, Dolma all ship variants):

* ``corpus_cross_contamination`` — the source×source shared-content
  matrix.  For every pair of sources, how many distinct word
  5-grams do they share, and what fraction of the smaller source's
  shingle vocabulary is shared (overlap coefficient)?  High overlap
  between two "independent" sources means the mixture weights are
  double-counting the same content — the corpus-level generalization
  of pairwise document dedup.
* ``docs_boilerplate_fraction`` — per-document fraction of word
  5-grams that are corpus-frequent (appear in >= 2 distinct
  documents).  Documents dominated by cross-document repeated
  passages are templated/boilerplate and get down-weighted or
  dropped in curation (the shingle-space analogue of C4's repeated
  line filter; the chunk-level twin is
  ``docs_duplicated_passages``).

Scale: both operators reduce to ONE shingle explode (index-exploded,
O(len) — see functions/text.py) followed by bounded aggregations.

* Contamination: (source, shingle_hash) is DISTINCT-ed before the
  self-join, so a shingle appearing in k sources fans out to at most
  C(k,2) <= C(n_sources,2) pairs — sources are a bounded registry
  (20 here; hundreds in production), never O(corpus).  The join key
  is the 60-bit shingle hash: uniform, no skew.  Output is at most
  n_sources² rows regardless of corpus size.
* Boilerplate: shingle doc-frequency is one groupBy on the hash;
  frequent shingles re-join the per-doc shingle table on the same
  uniform hash.  Per-doc stats are a (doc_id) agg.  No UDFs, no
  driver loops, every count is exact-integer so the only float is
  one final rounded division.

Reference parity: generalizes the reference's per-run duplicate
screening (dags/msconvert_dag.py:249-343 verify stage) from file
checksums to content shingles across corpus sources.
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
    exploded_shingles,
    sql_shingles,
)

_N = 5  # shingle width (tokens)
_MIN_DF = 2  # docs a shingle must appear in to count as boilerplate


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, h) distinct hashed 5-gram shingles per doc."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.expr(SPARK_TOKENS).alias("tokens"),
        )
        .where(F.expr(f"size(tokens) >= {_N}"))
    )
    sh = exploded_shingles(docs.select("doc_id", "tokens"), _N, "sh")
    # plain equi-join on doc_id — the doc->source map is O(corpus)
    # rows, never broadcastable; the hash side was just distinct-ed
    # through the same doc_id shuffle, so AQE reuses the partitioning
    return (
        sh.select("doc_id", F.expr(spark_hash64("sh")).alias("h"))
        .distinct()
        .join(docs.select("doc_id", "source"), "doc_id")
    )


def corpus_cross_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """source×source shared-shingle matrix with overlap coefficient.

    Output: (source_a, source_b, n_shared, n_a, n_b, overlap_coeff)
    for every unordered source pair sharing at least one distinct
    5-gram; overlap_coeff = n_shared / min(n_a, n_b), rounded 6dp.

    The distinct (source, h) frame is ``localCheckpoint``-ed: it is
    referenced three times below (sizes + both self-join sides), and
    left lazy each reference re-embedded the whole tokenize→shingle
    explode chain — 6+ documents scans in one physical plan (round-10
    plan audit). Checkpointed, the explode runs once and the returned
    plan reads only the checkpointed RDD (pinned in
    tests/test_plans.py).
    """
    src_sh = (
        _doc_shingles(spark, sf_dir)
        .select("source", "h")
        .distinct()
        .localCheckpoint()
    )
    sizes = src_sh.groupBy("source").agg(
        F.count("*").cast("long").alias("n_sh")
    )
    shared = (
        src_sh.alias("a")
        .join(
            src_sh.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(sizes).alias("sa"),
            F.col("source_a") == F.col("sa.source"),
        )
        .join(
            F.broadcast(sizes).alias("sb"),
            F.col("source_b") == F.col("sb.source"),
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.col("sa.n_sh").alias("n_a"),
            F.col("sb.n_sh").alias("n_b"),
            F.round(
                F.col("n_shared").cast("double")
                / F.least("sa.n_sh", "sb.n_sh"),
                6,
            ).alias("overlap_coeff"),
        )
    )


def docs_boilerplate_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-doc fraction of distinct 5-grams that are corpus-frequent.

    Output: (doc_id, n_shingles, n_boilerplate, boilerplate_frac,
    flagged) — flagged when more than half the doc's distinct
    shingles appear in >= ``_MIN_DF`` distinct documents.

    The per-doc shingle frame is ``localCheckpoint``-ed: it feeds
    BOTH the document-frequency aggregate and the per-doc join, and
    left lazy each reference re-embedded the tokenize→shingle explode
    chain — 4 documents scans per plan (r11 audit; the
    corpus_cross_contamination fix, applied to this query's shape).
    """
    sh = (
        _doc_shingles(spark, sf_dir)
        .select("doc_id", "h")
        .localCheckpoint()
    )
    bp = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= _MIN_DF)
        .select("h")
    )
    # plain shuffle join on the uniform 60-bit hash — bp is the
    # corpus-frequent shingle set, which grows with the corpus and
    # must NOT be force-broadcast; AQE may still broadcast it when
    # it is actually small
    per_doc = (
        sh.join(bp.withColumn("is_bp", F.lit(1)), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.coalesce(F.sum("is_bp"), F.lit(0))
            .cast("long")
            .alias("n_boilerplate"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_boilerplate",
        F.round(
            F.col("n_boilerplate").cast("double") / F.col("n_shingles"), 6
        ).alias("boilerplate_frac"),
        (F.col("n_boilerplate") * 2 > F.col("n_shingles")).alias("flagged"),
    )


def docs_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc ingestion novelty: fraction of the doc's distinct
    5-grams whose FIRST corpus occurrence (min doc_id, standing in
    for arrival order) is this doc.  The per-document projection of
    the Heaps growth curve (tfidf_ops.corpus_vocab_growth): a
    low-novelty doc late in the crawl is re-reading earlier content
    even if no single pair crosses a dedup threshold — dup-rate's
    leading indicator.

    Distinct from docs_boilerplate_fraction: boilerplate is the
    SYMMETRIC df≥2 signal; novelty is ORDER-AWARE (the first copy of
    a later-duplicated passage still counts as novel here).

    Output: (doc_id, n_shingles, n_novel, novelty_frac).

    Scale: reuses the one shingle explode + a (shingle → min doc)
    agg on the uniform hash; verdict is one doc_id agg. The shingle
    frame is ``localCheckpoint``-ed — referenced by both the firsts
    aggregate and the verdict join, it otherwise re-embeds the
    explode chain twice (4 documents scans, r11 audit).
    """
    sh = (
        _doc_shingles(spark, sf_dir)
        .select("doc_id", "h")
        .localCheckpoint()
    )
    firsts = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(
                F.expr("cast(first_doc = doc_id as bigint)")
            ).cast("long").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles"), 6
            ).alias("novelty_frac"),
        )
    )


QUERIES = {
    "corpus_cross_contamination": corpus_cross_contamination,
    "docs_boilerplate_fraction": docs_boilerplate_fraction,
    "docs_novelty": docs_novelty,
}

# shared oracle CTE: distinct (doc_id, source, h) hashed shingles
_SQL_DOC_SH = f"""
        toks AS (
            SELECT doc_id, source, {SQL_TOKENS} AS tokens
            FROM documents
            WHERE len({SQL_TOKENS}) >= {_N}
        ), doc_sh AS (
            SELECT DISTINCT doc_id, source,
                   {sql_hash64('sh')} AS h
            FROM (
                SELECT doc_id, source,
                       unnest({sql_shingles('tokens', _N)}) AS sh
                FROM toks
            )
        )
"""

ORACLE = {
    "corpus_cross_contamination": f"""
        WITH {_SQL_DOC_SH},
        src_sh AS (SELECT DISTINCT source, h FROM doc_sh),
        sizes AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh
            FROM src_sh GROUP BY source
        ),
        shared AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM src_sh a JOIN src_sh b
              ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT s.source_a, s.source_b, s.n_shared,
               sa.n_sh AS n_a, sb.n_sh AS n_b,
               ROUND(s.n_shared / least(sa.n_sh, sb.n_sh), 6)
                 AS overlap_coeff
        FROM shared s
        JOIN sizes sa ON s.source_a = sa.source
        JOIN sizes sb ON s.source_b = sb.source
    """,
    "docs_novelty": f"""
        WITH {_SQL_DOC_SH},
        sh AS (SELECT doc_id, h FROM doc_sh),
        firsts AS (
            SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY h
        )
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN f.first_doc = s.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               ROUND(SUM(CASE WHEN f.first_doc = s.doc_id
                              THEN 1 ELSE 0 END) / COUNT(*), 6)
                 AS novelty_frac
        FROM sh s JOIN firsts f ON s.h = f.h
        GROUP BY s.doc_id
    """,
    "docs_boilerplate_fraction": f"""
        WITH {_SQL_DOC_SH},
        sh AS (SELECT doc_id, h FROM doc_sh),
        bp AS (
            SELECT h FROM sh GROUP BY h
            HAVING COUNT(DISTINCT doc_id) >= {_MIN_DF}
        ),
        per_doc AS (
            SELECT s.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_shingles,
                   CAST(SUM(CASE WHEN b.h IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_boilerplate
            FROM sh s LEFT JOIN bp b ON s.h = b.h
            GROUP BY s.doc_id
        )
        SELECT doc_id, n_shingles, n_boilerplate,
               ROUND(n_boilerplate / n_shingles, 6) AS boilerplate_frac,
               n_boilerplate * 2 > n_shingles AS flagged
        FROM per_doc
    """,
}
