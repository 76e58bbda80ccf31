"""Text-analysis suite over the ``documents`` table (LLM-training-data
operators): token counting, quality scoring, language ID,
fingerprinting.

All per-document computation is higher-order-function expressions over
the token array — per-row JVM work, no explode, no Python UDF, no
shuffle at all until a final aggregate (these queries are pure map
jobs: at 100 TB they scale linearly with zero exchange).

Determinism: ratios are single FP divisions of exact integers, written
identically in both engines; hashes are portable md5
(functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.layout import spread_small_input
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
    STOPWORDS,
    spark_shingles,
    spark_quality_ratios,
    spark_stopword_hits,
    sql_shingles,
    sql_stopword_hits,
)

# Same regex, two literal syntaxes: Spark SQL strings process
# backslash escapes (need \\s in the literal); DuckDB's don't.
_BPE_RE_SPARK = "[a-z]+|[0-9]+|[^a-z0-9\\\\s]"
_BPE_RE_SQL = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # conditional spread before HOF-heavy per-row work: small
    # single-row-group parquet files give the scan exactly one task;
    # no-op on an already-split input (see functions/layout.py)
    return (
        load_table(spark, sf_dir, "documents")
        .transform(spread_small_input)
        .withColumn("tokens", F.expr(SPARK_TOKENS))
    )


def text_tokencount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + distinct
    token count per document.

    Scale: pure map — no shuffle, columns pruned to (doc_id, text).
    """
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.size(F.expr("array_distinct(tokens)")).alias("n_distinct_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(trim(lower(text)), '{_BPE_RE_SPARK}', 0)")
        ).alias("n_bpe_tokens"),
        F.length("text").alias("len_chars"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score per document.

    Components (all exact-integer ratios):
    * mean token length (longer ≈ richer vocabulary),
    * stopword ratio (too low = keyword spam, too high = filler),
    * distinct-token ratio (repetition detector — the batch analog of
      a dup-line filter),
    * non-alnum char ratio (boilerplate/markup detector).

    Scale: pure map; the score feeds a downstream filter predicate
    that pushes straight onto the scan.
    """
    d = _docs(spark, sf_dir)
    ratios = spark_quality_ratios("tokens", "text")
    d = d.select(
        "doc_id",
        F.col("n_chars").alias("n_chars"),
        F.size("tokens").alias("n_tokens"),
        F.expr(ratios["distinct_ratio"]).alias("distinct_ratio"),
        F.expr(ratios["stop_ratio"]).alias("stop_ratio"),
        F.expr(ratios["punct_ratio"]).alias("punct_ratio"),
    )
    return d.withColumn(
        "quality_score",
        F.round(
            F.col("distinct_ratio") * 0.5
            + F.col("stop_ratio") * 0.3
            + (1.0 - F.col("punct_ratio")) * 0.2,
            6,
        ),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID with a deterministic argmax.

    (On this synthetic corpus the vocabulary is shared across the
    ``lang`` labels, so predictions skew English — the point is the
    operator shape: per-language evidence counts + stable tie-break.)

    Scale: pure map; the per-language hit counters are k independent
    filters over one token array.
    """
    d = _docs(spark, sf_dir)
    for lang, words in STOPWORDS.items():
        d = d.withColumn(
            f"hits_{lang}", F.expr(spark_stopword_hits("tokens", words))
        )
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in STOPWORDS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in STOPWORDS:  # insertion order = deterministic tie-break
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[F.col(f"hits_{lang}") for lang in STOPWORDS],
        pred.alias("pred_lang"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: full-text md5, an order-insensitive bag
    fingerprint (md5 of sorted distinct tokens), and a winnowing-style
    shingle fingerprint (min md5 over word 5-grams).

    Scale: pure map; fingerprints become join keys for exact /
    near-dup passes (operators/dedup.py).
    """
    d = _docs(spark, sf_dir)
    sh = spark_shingles("tokens", 5)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.expr(
            "md5(concat_ws(' ', array_sort(array_distinct(tokens))))"
        ).alias("bag_md5"),
        F.expr(f"array_min(transform({sh}, s -> md5(s)))").alias(
            "min_shingle_md5"
        ),
    )


def text_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token frequency: top-50 tokens with deterministic
    tie-break — the vocabulary profile every corpus audit starts with.

    Scale: explode + count = one shuffle on token (high cardinality,
    uniform); top-k via window avoids a global sort. Skewed head
    tokens are exactly what AQE's skew split handles.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    counts = (
        d.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), "token")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 50)
        .select("rk", "token", "n")
    )


def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate: documents dominated by
    duplicate words or a single repeated bigram are boilerplate /
    spam and get dropped before training.

    Signals (all exact-integer ratios, Rae et al. 2021 §A1.1 shapes):
    - ``frac_dup_words``  = 1 - distinct/total tokens
    - ``top_bigram_frac`` = occurrences of the most frequent bigram
      over total bigrams (per-row HOF: count each distinct bigram via
      ``filter``, take ``array_max`` — O(k·n) per row on short-doc
      k, never a shuffle)
    - ``mean_word_len``   = exact char-sum / token count
    - ``keep``            = thresholded AND of the above

    Scale: pure map like the rest of the text suite — no explode, no
    shuffle; the per-row quadratic bigram count is bounded by document
    token length, not corpus size.
    """
    return repetition_metrics(_docs(spark, sf_dir))


def repetition_metrics(d: DataFrame) -> DataFrame:
    """The repetition gate over any frame with (doc_id, tokens) —
    shared by the batch query above and streaming corpus ingestion
    (streaming/corpus_ingest.py). Pure map, streamable."""
    bg = spark_shingles("tokens", 2)
    metrics = d.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.expr(
            "1.0 - cast(size(array_distinct(tokens)) as double) / size(tokens)"
        ).alias("frac_dup_words"),
        F.expr(
            f"cast(array_max(transform(array_distinct({bg}), "
            f"b -> size(filter({bg}, x -> x = b)))) as double) "
            f"/ size({bg})"
        ).alias("top_bigram_frac"),
        F.expr(
            "cast(aggregate(tokens, 0, (a, t) -> a + length(t)) as double) "
            "/ size(tokens)"
        ).alias("mean_word_len"),
    )
    return metrics.withColumn(
        "keep",
        (F.col("frac_dup_words") <= 0.55) & (F.col("top_bigram_frac") <= 0.10),
    )


def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats over the quality pipeline output —
    operator composition: quality scores feed a second aggregate.

    Scale: reuses the pure-map quality stage; one tiny agg on lang.
    """
    q = text_quality(spark, sf_dir)
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return (
        q.join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            # quality_score is already rounded to 6dp, so the decimal
            # cast is exact and the average is order-independent
            F.round(
                F.expr(
                    "cast(cast(sum(cast(quality_score as decimal(18,6))) "
                    "as decimal(38,6)) as double) / count(*)"
                ),
                6,
            ).alias("avg_quality"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# BM25 retrieval scoring: fixed query terms, k1/b at the classic
# defaults. The idf factor is the log-free "odds" form
# (N - df + 0.5) / (df + 0.5) — Robertson's idf WITHOUT the log —
# because ln() is libm-dependent and would break cross-engine value
# equality; the ranking it induces is monotonically identical for a
# fixed df. All inputs (tf, df, dl, N, Σdl) are exact integers, so
# the score is one deterministic FP expression, 6dp-rounded.
_BM25_TERMS = ("spark", "join", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75


def text_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, term) BM25 components + score for the fixed query
    terms: (doc_id, term, tf, dl, df, score).

    Scale: tf/dl are per-row HOF counts (pure map); df and the
    average doc length are one tiny agg broadcast back — the corpus
    shuffles nothing. This is the scoring half of a distributed
    search engine; the posting-list join shape is dedup's equi-join.
    """
    d = _docs(spark, sf_dir).select(
        "doc_id", "tokens", F.size("tokens").alias("dl")
    )
    terms = F.array(*[F.lit(t) for t in _BM25_TERMS])
    tf_rows = (
        d.select(
            "doc_id",
            "tokens",
            "dl",
            F.explode(terms).alias("term"),
        )
        .withColumn("tf", F.expr("size(filter(tokens, t -> t = term))"))
        .drop("tokens")
        .where(F.col("tf") > 0)
    )
    stats = tf_rows.groupBy("term").agg(F.count("*").alias("df"))
    corpus = d.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    # e-notation keeps every literal a DOUBLE in both engines (a bare
    # 0.5 parses as DECIMAL in each, but the implicit decimal→double
    # promotion points differ and shift the last ulp)
    score = (
        "round(((n_docs - df + 0.5e0) / (df + 0.5e0)) * "
        f"(tf * {_BM25_K1 + 1}e0) / "
        f"(tf + {_BM25_K1}e0 * ({1 - _BM25_B}e0 + {_BM25_B}e0 "
        "* dl * n_docs / sum_dl)), 6)"
    )
    return (
        tf_rows.join(F.broadcast(stats), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "term",
            "tf",
            "dl",
            "df",
            F.expr(score).alias("score"),
        )
    )



def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with a vowel-run syllable
    proxy (maximal [aeiou]+ groups per token) — the classic
    readability gate in text-quality stacks.  The corpus has no
    sentence punctuation, so each doc counts as one sentence:
    score = 206.835 - 1.015·words - 84.6·(syllables/words).

    Determinism: words/syllables are exact integers; the score is
    one identical IEEE double chain in both engines, rounded 6dp.
    A zero-token document (empty/punctuation-only text) gets an
    EXPLICIT NULL flesch in both engines — without the guard Spark's
    non-ANSI divide-by-zero yields NULL while DuckDB's IEEE default
    yields ±inf/NaN, so parity would silently depend on the corpus
    never containing token-less docs.

    Scale: pure map (regexp per token inside codegen), no shuffle.
    """
    d = _docs(spark, sf_dir)
    return (
        d.select(
            "doc_id",
            F.size("tokens").alias("n_words"),
            F.expr(
                "aggregate(transform(tokens, t -> "
                "size(regexp_extract_all(t, '[aeiou]+', 0))), 0, "
                "(acc, x) -> acc + x)"
            ).alias("n_syllables"),
        )
        .withColumn(
            "flesch",
            F.when(
                F.col("n_words") >= 1,
                F.round(
                    F.lit(206.835)
                    - F.lit(1.015) * F.col("n_words")
                    - F.lit(84.6)
                    * (
                        F.col("n_syllables").cast("double")
                        / F.col("n_words")
                    ),
                    6,
                ),
            ),
        )
    )


QUERIES = {
    "text_readability": text_readability,
    "text_bm25_scores": text_bm25_scores,
    "text_repetition_filter": text_repetition_filter,
    "text_ngram_stats": text_ngram_stats,
    "text_stats_by_lang": text_stats_by_lang,
    "text_tokencount": text_tokencount,
    "text_quality": text_quality,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
}

_T = SQL_TOKENS

_SQL_BM25 = f"""
    WITH d AS (
        SELECT doc_id, {_T} AS tokens, len({_T}) AS dl FROM documents
    ), tf AS (
        SELECT doc_id, dl, term,
               len(list_filter(tokens, t -> t = term)) AS tf
        FROM d, unnest([{', '.join(f"'{t}'" for t in _BM25_TERMS)}])
               AS q(term)
    ), tfpos AS (
        SELECT * FROM tf WHERE tf > 0
    ), stats AS (
        SELECT term, COUNT(*) AS df FROM tfpos GROUP BY term
    ), corpus AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
        FROM d
    )
    SELECT t.doc_id, t.term, t.tf, t.dl, s.df,
           round(((c.n_docs - s.df + 0.5e0) / (s.df + 0.5e0)) *
                 (t.tf * {_BM25_K1 + 1}e0) /
                 (t.tf + {_BM25_K1}e0 * ({1 - _BM25_B}e0 + {_BM25_B}e0
                  * t.dl * c.n_docs / c.sum_dl)), 6) AS score
    FROM tfpos t JOIN stats s USING (term), corpus c
"""

_hits = {lang: sql_stopword_hits(_T, w) for lang, w in STOPWORDS.items()}
_pred_cases = " ".join(
    f"WHEN {_hits[lang]} = greatest({', '.join(_hits[x] for x in STOPWORDS)}) "
    f"THEN '{lang}'"
    for lang in STOPWORDS
)

ORACLE = {
    "text_readability": f"""
        WITH t AS (
            SELECT doc_id, {_T} AS tokens FROM documents
        ), c AS (
            SELECT doc_id,
                   CAST(len(tokens) AS INTEGER) AS n_words,
                   CAST(COALESCE(list_aggregate(list_transform(tokens,
                        tk -> len(regexp_extract_all(tk, '[aeiou]+'))),
                        'sum'), 0) AS INTEGER) AS n_syllables
            FROM t
        )
        SELECT doc_id, n_words, n_syllables,
               CASE WHEN n_words >= 1 THEN
                   ROUND(206.835 - 1.015 * n_words
                         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words),
                         6)
               END AS flesch
        FROM c
    """,
    "text_bm25_scores": _SQL_BM25,
    "text_repetition_filter": f"""
        WITH m AS (
            SELECT doc_id,
                   len({_T}) AS n_tokens,
                   1.0 - CAST(len(list_distinct({_T})) AS DOUBLE)
                         / len({_T}) AS frac_dup_words,
                   CAST(list_max(list_transform(
                            list_distinct({sql_shingles(_T, 2)}),
                            b -> len(list_filter({sql_shingles(_T, 2)},
                                                 x -> x = b)))) AS DOUBLE)
                     / len({sql_shingles(_T, 2)}) AS top_bigram_frac,
                   CAST(list_aggregate(list_transform({_T}, t -> length(t)),
                                       'sum') AS DOUBLE)
                     / len({_T}) AS mean_word_len
            FROM documents
        )
        SELECT doc_id, n_tokens, frac_dup_words, top_bigram_frac,
               mean_word_len,
               frac_dup_words <= 0.55 AND top_bigram_frac <= 0.10 AS keep
        FROM m
    """,
    "text_ngram_stats": f"""
        WITH tok AS (
            SELECT unnest({_T}) AS token FROM documents
        ), counts AS (
            SELECT token, COUNT(*) AS n FROM tok GROUP BY token
        )
        SELECT rk, token, n FROM (
            SELECT token, n,
                   row_number() OVER (ORDER BY n DESC, token) AS rk
            FROM counts) t
        WHERE rk <= 50
    """,
    "text_stats_by_lang": f"""
        WITH q AS (
            SELECT doc_id, lang, n_chars,
                   len({_T}) AS n_tokens,
                   round(CAST(len(list_distinct({_T})) AS DOUBLE) / len({_T}) * 0.5
                         + CAST({sql_stopword_hits(_T, STOPWORDS['en'])} AS DOUBLE)
                           / len({_T}) * 0.3
                         + (1.0 - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                                  / length(text)) * 0.2,
                         6) AS quality_score
            FROM documents
        )
        SELECT lang, COUNT(*) AS n_docs,
               round(CAST(CAST(SUM(CAST(quality_score AS DECIMAL(18,6)))
                          AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*), 6)
                 AS avg_quality,
               round(AVG(n_tokens), 6) AS avg_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM q GROUP BY lang
    """,
    "text_tokencount": f"""
        SELECT doc_id,
               len({_T}) AS n_tokens,
               len(list_distinct({_T})) AS n_distinct_tokens,
               len(regexp_extract_all(trim(lower(text)), '{_BPE_RE_SQL}', 0)) AS n_bpe_tokens,
               length(text) AS len_chars
        FROM documents
    """,
    "text_quality": f"""
        SELECT doc_id, n_chars,
               len({_T}) AS n_tokens,
               CAST(len(list_distinct({_T})) AS DOUBLE) / len({_T}) AS distinct_ratio,
               CAST({sql_stopword_hits(_T, STOPWORDS['en'])} AS DOUBLE)
                 / len({_T}) AS stop_ratio,
               CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                 / length(text) AS punct_ratio,
               round(CAST(len(list_distinct({_T})) AS DOUBLE) / len({_T}) * 0.5
                     + CAST({sql_stopword_hits(_T, STOPWORDS['en'])} AS DOUBLE)
                       / len({_T}) * 0.3
                     + (1.0 - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                              / length(text)) * 0.2,
                     6) AS quality_score
        FROM documents
    """,
    "text_langid": f"""
        SELECT doc_id, lang AS labeled_lang,
               {', '.join(f'{_hits[lang]} AS hits_{lang}' for lang in STOPWORDS)},
               CASE WHEN greatest({', '.join(_hits[x] for x in STOPWORDS)}) = 0
                    THEN 'und' {_pred_cases} END AS pred_lang
        FROM documents
    """,
    "text_fingerprint": f"""
        SELECT doc_id,
               md5(text) AS text_md5,
               md5(array_to_string(list_sort(list_distinct({_T})), ' ')) AS bag_md5,
               list_aggregate(list_transform({sql_shingles(_T, 5)}, s -> md5(s)),
                              'min') AS min_shingle_md5
        FROM documents
    """,
}
