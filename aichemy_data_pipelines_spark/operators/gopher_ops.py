"""The Gopher quality rules (Rae et al. 2021, appendix A) as one
per-document rule table — the other half of the Gopher filter next
to the repetition screen (operators/textops.text_repetition_filter
covers the duplicate-line/char and top-n-gram rules; this module
covers the document-statistics rules):

1. word count within [50, 100 000]
2. mean word length within [3, 10]
3. symbol-to-word ratio ('#' or ellipsis) <= 0.1
4. fraction of lines starting with a bullet <= 0.9
5. fraction of lines ending with an ellipsis <= 0.3
6. fraction of words with >= 1 alphabetic character >= 0.8
7. >= 2 of the 8 Gopher stopwords present
   (the, be, to, of, and, that, have, with)

``docs_gopher_quality`` emits every metric, a pass flag per rule,
the failure count, and the all-rules verdict — the audit shape every
curation query in this suite uses (cf. corpus_screens_matrix), so a
corpus owner can see WHICH rule dropped a document, not just that it
was dropped.

Portability: every metric is integer arithmetic plus ONE double
division (exact int sums / exact int counts — a single deterministic
IEEE op in both engines), so the pass flags are computed on the
unrounded values and cannot straddle a rounding-mode difference;
the emitted metric columns round to 6dp like the rest of the suite.

Scale: one scan, zero shuffles — all metrics are per-row lambda
expressions inside whole-stage codegen (no explode: token and line
stats fold with ``aggregate``/``filter`` over the split arrays). At
100 TB this is the cheapest possible shape: map-only over the text
column, pipelined with whatever filter consumes the verdict.

Thresholds are the paper's, verbatim — NOT tuned to the synthetic
corpus, whose 40-word vocabulary contains only 2 of the 8 Gopher
stopwords, so rule 7 (and hence the all-rules verdict) fails
corpus-wide at test SF while ``n_failures`` and the per-rule flags
still discriminate (word-count splits it 277/223 at sf0.01). The
crafted-document unit tests pin that a conforming document passes
all 7 (tests/test_gopher_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
)

#: Gopher's document-statistics thresholds, verbatim from the paper.
_MIN_WORDS, _MAX_WORDS = 50, 100_000
_MIN_MWL, _MAX_MWL = 3.0, 10.0
_MAX_SYMBOL_RATIO = 0.1
_MAX_BULLET_FRAC = 0.9
_MAX_ELLIPSIS_FRAC = 0.3
_MIN_ALPHA_FRAC = 0.8
_MIN_STOP_HITS = 2

#: Gopher's stopword octet (NOT the langid lists — frozen separately
#: because the paper fixes these exact words).
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def docs_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule table.

    Output: (doc_id, n_words, mean_word_len, symbol_ratio,
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    n_stop_hits, pass_words, pass_word_len, pass_symbols,
    pass_bullets, pass_ellipsis, pass_alpha, pass_stops, n_failures,
    pass_gopher).
    """
    stops = ", ".join(f"'{w}'" for w in _GOPHER_STOPS)
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("tokens", F.expr(SPARK_TOKENS))
        # split on \r?\n so CRLF text leaves no trailing \r on the
        # lines — Java's '$' matches before a final \r, RE2's does
        # not, so a stray \r would make the ellipsis rule diverge
        # between engine and oracle
        .withColumn(
            "lines",
            F.expr(r"filter(split(text, '\\r?\\n'), l -> trim(l) != '')"),
        )
        .withColumn("n_words", F.size("tokens").cast("long"))
        .withColumn("n_lines", F.size("lines"))
        # exact int sum of token lengths / int count: one IEEE divide
        .withColumn(
            "mwl_raw",
            F.expr(
                "aggregate(transform(tokens, t -> length(t)), 0,"
                " (acc, v) -> acc + v) / n_words"
            ),
        )
        # '#' count + '...' count (non-overlapping, both engines
        # replace left-to-right) per word
        .withColumn(
            "sym_raw",
            F.expr(
                "((length(text) - length(replace(text, '#', '')))"
                " + (length(text) - length(replace(text, '...', ''))) / 3)"
                " / n_words"
            ),
        )
        .withColumn(
            "bullet_raw",
            F.expr(
                "case when n_lines = 0 then 0.0 else"
                " size(filter(lines, l -> trim(l) rlike '^[-*•‣]'))"
                " / n_lines end"
            ),
        )
        .withColumn(
            "ellipsis_raw",
            F.expr(
                "case when n_lines = 0 then 0.0 else"
                " size(filter(lines,"
                r" l -> trim(l) rlike '(\\.\\.\\.|…)$'))"
                " / n_lines end"
            ),
        )
        # tokens are lowercased by SPARK_TOKENS, so [a-z] suffices
        .withColumn(
            "alpha_raw",
            F.expr(
                "size(filter(tokens, t -> t rlike '[a-z]')) / n_words"
            ),
        )
        .withColumn(
            "n_stop_hits",
            F.expr(
                f"cast(size(filter(array({stops}),"
                " w -> array_contains(tokens, w))) as bigint)"
            ),
        )
    )
    # A token-less doc (n_words = 0) makes the three word-normalized
    # metrics NULL (divide-by-zero), and a NULL flag would silently
    # KEEP the doc for a consumer filtering pass_gopher = 0 — the
    # opposite of the suite's fail-closed convention (cf.
    # screens_ops.py): what a screen cannot score, it FAILS. coalesce
    # to false on the Spark side; the oracle's CASE WHEN NULL falls
    # to ELSE 0 already, so the engines stay in lockstep (pinned by
    # the crafted empty-doc test in tests/test_gopher_ops.py). The
    # metric columns themselves stay NULL in both engines — honest
    # "unscoreable", only the verdict fails closed.
    flags = {
        "pass_words": (F.col("n_words") >= _MIN_WORDS)
        & (F.col("n_words") <= _MAX_WORDS),
        "pass_word_len": F.coalesce(
            (F.col("mwl_raw") >= _MIN_MWL) & (F.col("mwl_raw") <= _MAX_MWL),
            F.lit(False),
        ),
        "pass_symbols": F.coalesce(
            F.col("sym_raw") <= _MAX_SYMBOL_RATIO, F.lit(False)
        ),
        "pass_bullets": F.col("bullet_raw") <= _MAX_BULLET_FRAC,
        "pass_ellipsis": F.col("ellipsis_raw") <= _MAX_ELLIPSIS_FRAC,
        "pass_alpha": F.coalesce(
            F.col("alpha_raw") >= _MIN_ALPHA_FRAC, F.lit(False)
        ),
        "pass_stops": F.col("n_stop_hits") >= _MIN_STOP_HITS,
    }
    n_fail = sum(
        (~flag).cast("int") for flag in flags.values()
    )
    return d.select(
        "doc_id",
        "n_words",
        F.round("mwl_raw", 6).alias("mean_word_len"),
        F.round("sym_raw", 6).alias("symbol_ratio"),
        F.round("bullet_raw", 6).alias("bullet_line_frac"),
        F.round("ellipsis_raw", 6).alias("ellipsis_line_frac"),
        F.round("alpha_raw", 6).alias("alpha_word_frac"),
        "n_stop_hits",
        *[flag.cast("int").alias(name) for name, flag in flags.items()],
        n_fail.cast("int").alias("n_failures"),
        (n_fail == 0).cast("int").alias("pass_gopher"),
    )


QUERIES = {"docs_gopher_quality": docs_gopher_quality}

_STOPS_SQL = ", ".join(f"'{w}'" for w in _GOPHER_STOPS)

ORACLE = {
    "docs_gopher_quality": f"""
        WITH base AS (
            SELECT doc_id,
                   text,
                   {SQL_TOKENS} AS tokens,
                   list_filter(string_split_regex(text, '\\r?\\n'),
                               l -> trim(l) <> '') AS lines
            FROM documents
        ), m AS (
            SELECT doc_id,
                   CAST(len(tokens) AS BIGINT) AS n_words,
                   len(lines) AS n_lines,
                   list_aggregate(list_transform(tokens, t -> len(t)),
                                  'sum') / len(tokens) AS mwl_raw,
                   ((len(text) - len(replace(text, '#', '')))
                    + (len(text) - len(replace(text, '...', ''))) / 3)
                   / len(tokens) AS sym_raw,
                   CASE WHEN len(lines) = 0 THEN 0.0 ELSE
                     len(list_filter(lines, l ->
                         regexp_matches(trim(l), '^[-*•‣]')))
                     / len(lines) END AS bullet_raw,
                   CASE WHEN len(lines) = 0 THEN 0.0 ELSE
                     len(list_filter(lines, l ->
                         regexp_matches(trim(l), '(\\.\\.\\.|…)$')))
                     / len(lines) END AS ellipsis_raw,
                   len(list_filter(tokens, t ->
                       regexp_matches(t, '[a-z]')))
                   / len(tokens) AS alpha_raw,
                   CAST(len(list_filter([{_STOPS_SQL}], w ->
                       list_contains(tokens, w))) AS BIGINT)
                     AS n_stop_hits
            FROM base
        ), f AS (
            SELECT *,
                   CASE WHEN n_words >= {_MIN_WORDS}
                         AND n_words <= {_MAX_WORDS}
                        THEN 1 ELSE 0 END AS pass_words,
                   CASE WHEN mwl_raw >= {_MIN_MWL}
                         AND mwl_raw <= {_MAX_MWL}
                        THEN 1 ELSE 0 END AS pass_word_len,
                   CASE WHEN sym_raw <= {_MAX_SYMBOL_RATIO}
                        THEN 1 ELSE 0 END AS pass_symbols,
                   CASE WHEN bullet_raw <= {_MAX_BULLET_FRAC}
                        THEN 1 ELSE 0 END AS pass_bullets,
                   CASE WHEN ellipsis_raw <= {_MAX_ELLIPSIS_FRAC}
                        THEN 1 ELSE 0 END AS pass_ellipsis,
                   CASE WHEN alpha_raw >= {_MIN_ALPHA_FRAC}
                        THEN 1 ELSE 0 END AS pass_alpha,
                   CASE WHEN n_stop_hits >= {_MIN_STOP_HITS}
                        THEN 1 ELSE 0 END AS pass_stops
            FROM m
        )
        SELECT doc_id,
               n_words,
               ROUND(mwl_raw, 6) AS mean_word_len,
               ROUND(sym_raw, 6) AS symbol_ratio,
               ROUND(bullet_raw, 6) AS bullet_line_frac,
               ROUND(ellipsis_raw, 6) AS ellipsis_line_frac,
               ROUND(alpha_raw, 6) AS alpha_word_frac,
               n_stop_hits,
               pass_words, pass_word_len, pass_symbols, pass_bullets,
               pass_ellipsis, pass_alpha, pass_stops,
               (7 - pass_words - pass_word_len - pass_symbols
                  - pass_bullets - pass_ellipsis - pass_alpha
                  - pass_stops) AS n_failures,
               CASE WHEN pass_words + pass_word_len + pass_symbols
                       + pass_bullets + pass_ellipsis + pass_alpha
                       + pass_stops = 7
                    THEN 1 ELSE 0 END AS pass_gopher
        FROM f
    """,
}
