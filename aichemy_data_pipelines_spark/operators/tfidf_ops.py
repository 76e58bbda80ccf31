"""TF-IDF keyword extraction and Zipf power-law diagnostics.

* ``docs_tfidf_topterms`` — the classic per-document keyword
  extractor: top-3 terms per doc ranked by tf·idf with
  idf = ln(N/df).  Complements the corpus-level BM25 scorer
  (textops.py) with a per-document salience view — the standard
  feature for topic tagging / mixture labeling in data-curation
  pipelines.
* ``terms_zipf_fit`` — closed-form OLS fit of ln(freq) ~ ln(rank)
  over the top-100 corpus terms.  A healthy natural-language corpus
  has slope ≈ −1 (Zipf's law); templated or synthetic spam shows a
  flat or cliffed curve, so the slope is a cheap corpus-health
  gate (Gopher/Dolma-style corpus diagnostics).

Float portability (the interesting part, same recipe as
operators/dsir_ops.py): ``ln`` may differ by an ulp across libms,
so every logarithm is rounded to 9dp and cast to DECIMAL(18,9)
BEFORE entering any product or sum — all downstream aggregation is
exact decimal arithmetic, order-independent under Spark's
nondeterministic partial aggregation.  Only the final published
numbers are doubles rounded to 6dp.

Scale: one token explode feeds a (doc_id, term) count; the term
document-frequency table is smaller than the corpus but NOT bounded
— Heaps' law (see ``corpus_vocab_growth``) puts a 100 TB web corpus
at 1e8–1e9 distinct tokens, far past broadcast range, so the
tc⋈idf join is left UNHINTED: AQE broadcasts it when runtime stats
say it fits and falls back to a shuffled hash join when it doesn't
(same rationale as the corpus-frequent-shingle join in
overlap_ops.py).  The per-doc top-k is a window partitioned BY
doc_id (no global sort).  The Zipf fit keeps only the top-100 terms
— its single-partition window covers 100 rows, never the corpus.
No UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
    exploded_shingles,
    sql_shingles,
)

_TOP_K = 3  # keywords per document
_ZIPF_R = 100  # top terms entering the Zipf fit


def _term_counts(
    spark: SparkSession, sf_dir: str, by_doc: bool = False
) -> DataFrame:
    """(doc_id, term, tf) exploded token counts.

    ``by_doc``: pre-partition on doc_id BEFORE the explode —
    HashPartitioning on a prefix of the grouping keys satisfies the
    (doc, term) groupBy's ClusteredDistribution, so purely per-doc
    consumers (lexical diversity, token entropy) run their window +
    final agg on the SAME single shuffle.  Term-keyed consumers
    (tf-idf's df join) keep the default (doc, term) shuffle, which
    distributes better for the term-side join."""
    d = load_table(spark, sf_dir, "documents")
    if by_doc:
        d = d.repartition("doc_id")
    return (
        d.select("doc_id", F.explode(F.expr(SPARK_TOKENS)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def docs_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by tf·idf.

    Output: (doc_id, term, tf, score, term_rank); ties broken by
    term ascending so the ranking is total and deterministic.
    """
    tc = _term_counts(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    df = tc.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    # idf snapped to DECIMAL(18,9): tf * idf is then exact decimal
    idf = df.select(
        "term",
        F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 9)
        .cast("decimal(18,9)")
        .alias("idf"),
    )
    # No broadcast hint: the idf table is vocabulary-sized, which is
    # unbounded under Heaps' law at 100 TB.  AQE picks broadcast when
    # runtime stats allow and shuffles otherwise.
    scored = tc.join(idf, "term").select(
        "doc_id",
        "term",
        "tf",
        (F.col("tf") * F.col("idf")).alias("score_dec"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_dec").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= _TOP_K)
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(F.col("score_dec").cast("double"), 6).alias("score"),
            "term_rank",
        )
    )


def terms_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of ln(freq) on ln(rank) over the top-100 terms.

    Output: one row (n_terms, slope, intercept).  slope ≈ -1 for
    Zipfian corpora.
    """
    freqs = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.expr(SPARK_TOKENS)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    # vocabulary-bounded single-partition window: rank 1 = most
    # frequent, ties broken by term for a total order
    ranked = (
        freqs.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("freq").desc(), F.col("term").asc())
            ),
        )
        .where(F.col("rank") <= _ZIPF_R)
        .select(
            F.round(F.log(F.col("rank").cast("double")), 9)
            .cast("decimal(18,9)")
            .alias("x"),
            F.round(F.log(F.col("freq").cast("double")), 9)
            .cast("decimal(18,9)")
            .alias("y"),
        )
    )
    sums = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # exact-decimal normal equations; doubles only at the very end
    return sums.select(
        F.col("n").alias("n_terms"),
        F.round(
            (
                F.col("n") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("n") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            ),
            6,
        ).alias("slope"),
        F.round(
            (
                F.col("sy").cast("double")
                - (
                    (
                        F.col("n") * F.col("sxy").cast("double")
                        - F.col("sx").cast("double")
                        * F.col("sy").cast("double")
                    )
                    / (
                        F.col("n") * F.col("sxx").cast("double")
                        - F.col("sx").cast("double")
                        * F.col("sx").cast("double")
                    )
                )
                * F.col("sx").cast("double")
            )
            / F.col("n"),
            6,
        ).alias("intercept"),
    )


_HEAPS_BUCKET = 50  # docs per ingestion bucket


def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: bucket documents by
    ingestion order (doc_id // 50), count the DISTINCT terms whose
    FIRST occurrence falls in each bucket, plus the running
    vocabulary size.  A healthy natural corpus grows ~ n^β (β≈0.5);
    a flatlining curve means the crawl is re-reading itself —
    the vocabulary-side twin of the dup-rate-by-source report.

    Terms are word 3-grams (the unigram vocabulary of the synthetic
    corpus saturates in the first bucket; shingle vocabulary keeps
    growing, which is what the curve measures).

    Scale: term first-occurrence is one (term → min(doc_id)) agg
    over the shingle explode; the curve is a vocabulary-bounded
    aggregation and a ≤ #buckets-row window.  No corpus-scale sort.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(SPARK_TOKENS).alias("tokens"))
        .where(F.expr("size(tokens) >= 3"))
    )
    firsts = (
        exploded_shingles(docs, 3, "term")
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    curve = (
        firsts.select(
            (F.col("first_doc") / _HEAPS_BUCKET)
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_new_terms"))
    )
    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return curve.select(
        "bucket",
        "n_new_terms",
        F.sum("n_new_terms").over(w).cast("long").alias("vocab_size"),
    )


def docs_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical-diversity profile: token count, distinct
    types, type-token ratio and hapax fraction (share of types
    occurring exactly once) — the classic template/spam screens (low
    TTR = repetitive boilerplate, near-1 hapax on long docs = noise).

    Determinism: all counts are integers; TTR and hapax_frac are one
    IEEE division each, rounded 6dp.

    Scale: ONE shuffle — doc_id pre-partitioning satisfies both the
    (doc, term) groupBy and the per-doc re-agg (plan-pinned).
    """
    tc = _term_counts(spark, sf_dir, by_doc=True)
    return tc.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.round(F.count("*") / F.sum("tf"), 6).alias("ttr"),
        F.round(
            F.sum(F.expr("cast(tf = 1 as bigint)")) / F.count("*"), 6
        ).alias("hapax_frac"),
    )


def docs_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy — the information-density
    screen (near-zero entropy = a document of one repeated token;
    natural prose at this synthetic vocab sits near ln(vocab)).

    Determinism: the tfidf/dsir ln recipe — each p·ln(p) term is a
    product of two 9dp-snapped decimals (p = tf/n_tokens and its
    log), so the per-doc sum is exact decimal; entropy publishes as
    a 6dp double.

    Scale: same ONE-shuffle shape as docs_lexical_diversity — the
    doc_id pre-partitioning carries the groupBy, the per-doc total
    window AND the final agg (plan-pinned).
    """
    tc = _term_counts(spark, sf_dir, by_doc=True)
    per_doc = tc.withColumn(
        "n_tok", F.sum("tf").over(Window.partitionBy("doc_id"))
    )
    term = (
        "cast(round(tf / n_tok, 9) as decimal(18,9)) * "
        "cast(round(ln(tf / n_tok), 9) as decimal(18,9))"
    )
    return (
        per_doc.withColumn("term", F.expr(term))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(-F.sum("term").cast("double"), 6).alias("entropy"),
        )
    )


QUERIES = {
    "docs_tfidf_topterms": docs_tfidf_topterms,
    "terms_zipf_fit": terms_zipf_fit,
    "corpus_vocab_growth": corpus_vocab_growth,
    "docs_lexical_diversity": docs_lexical_diversity,
    "docs_token_entropy": docs_token_entropy,
}

_SQL_TC = f"""
        tc AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (
                SELECT doc_id, unnest({SQL_TOKENS}) AS term
                FROM documents
            )
            GROUP BY doc_id, term
        )
"""

ORACLE = {
    "docs_lexical_diversity": f"""
        WITH {_SQL_TC}
        SELECT doc_id,
               CAST(SUM(tf) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               round(COUNT(*) / SUM(tf), 6) AS ttr,
               round(SUM(CAST(tf = 1 AS BIGINT)) / COUNT(*), 6)
                 AS hapax_frac
        FROM tc GROUP BY doc_id
    """,
    "docs_token_entropy": f"""
        WITH {_SQL_TC},
        pd AS (
            SELECT doc_id, tf,
                   SUM(tf) OVER (PARTITION BY doc_id) AS n_tok
            FROM tc
        )
        SELECT doc_id,
               CAST(SUM(tf) AS BIGINT) AS n_tokens,
               round(-CAST(SUM(
                   CAST(round(tf / n_tok, 9) AS DECIMAL(18,9)) *
                   CAST(round(ln(tf / n_tok), 9) AS DECIMAL(18,9))
               ) AS DOUBLE), 6) AS entropy
        FROM pd GROUP BY doc_id
    """,
    "corpus_vocab_growth": f"""
        WITH toks AS (
            SELECT doc_id, {SQL_TOKENS} AS tokens FROM documents
            WHERE len({SQL_TOKENS}) >= 3
        ),
        firsts AS (
            SELECT term, MIN(doc_id) AS first_doc
            FROM (SELECT doc_id, unnest({sql_shingles('tokens', 3)}) AS term
                  FROM toks)
            GROUP BY term
        ),
        curve AS (
            SELECT CAST(first_doc // {_HEAPS_BUCKET} AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_new_terms
            FROM firsts GROUP BY 1
        )
        SELECT bucket, n_new_terms,
               CAST(SUM(n_new_terms) OVER (
                   ORDER BY bucket ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS vocab_size
        FROM curve
    """,
    "docs_tfidf_topterms": f"""
        WITH {_SQL_TC},
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        idf AS (
            SELECT term,
                   CAST(ROUND(ln((SELECT n_docs FROM n)
                                 / COUNT(DISTINCT doc_id)), 9)
                        AS DECIMAL(18,9)) AS idf
            FROM tc GROUP BY term
        ),
        scored AS (
            SELECT tc.doc_id, tc.term, tc.tf,
                   tc.tf * idf.idf AS score_dec
            FROM tc JOIN idf ON tc.term = idf.term
        ),
        ranked AS (
            SELECT doc_id, term, tf, score_dec,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score_dec DESC, term ASC
                   ) AS term_rank
            FROM scored
        )
        SELECT doc_id, term, tf,
               ROUND(CAST(score_dec AS DOUBLE), 6) AS score,
               CAST(term_rank AS INTEGER) AS term_rank
        FROM ranked WHERE term_rank <= {_TOP_K}
    """,
    "terms_zipf_fit": f"""
        WITH freqs AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
            FROM (SELECT unnest({SQL_TOKENS}) AS term FROM documents)
            GROUP BY term
        ),
        ranked AS (
            SELECT CAST(ROUND(ln(CAST(r AS DOUBLE)), 9)
                        AS DECIMAL(18,9)) AS x,
                   CAST(ROUND(ln(CAST(freq AS DOUBLE)), 9)
                        AS DECIMAL(18,9)) AS y
            FROM (
                SELECT freq,
                       row_number() OVER (
                           ORDER BY freq DESC, term ASC
                       ) AS r
                FROM freqs
            ) WHERE r <= {_ZIPF_R}
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM ranked
        )
        SELECT n AS n_terms,
               ROUND((n * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                 AS slope,
               ROUND((CAST(sy AS DOUBLE)
                      - ((n * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (n * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                        * CAST(sx AS DOUBLE)) / n, 6)
                 AS intercept
        FROM sums
    """,
}
