"""Portable text primitives: tokens, shingles, stopwords.

Each primitive has a Spark fragment and a DuckDB fragment producing
identical values, so text/dedup operators can be oracle-checked
end-to-end. Tokenization = lowercase, trim, split on whitespace —
deliberately simple and locale-free.

Scale: all expressions are per-row JVM lambdas (higher-order
functions) inside codegen; no explode is required to build
signatures, so the only shuffles in the dedup pipeline are the
bucket joins.
"""

from __future__ import annotations

# lowercase+trim+whitespace-split, identical in both engines
SPARK_TOKENS = r"split(trim(lower(text)), '\\s+')"
SQL_TOKENS = r"string_split_regex(trim(lower(text)), '\s+')"


def spark_shingles(tokens: str, n: int) -> str:
    """Word n-gram shingles from a token-array column (Spark)."""
    return (
        f"transform(sequence(0, size({tokens}) - {n}), "
        f"i -> concat_ws(' ', slice({tokens}, i + 1, {n})))"
    )


def sql_shingles(tokens: str, n: int) -> str:
    """DuckDB twin: inclusive list slice + range."""
    return (
        f"list_transform(range(0, len({tokens}) - {n - 1}), "
        f"i -> array_to_string(({tokens})[i + 1:i + {n}], ' '))"
    )


# Small embedded stopword lists for the language-ID heuristic and the
# quality score. Frozen: changing them changes oracle results.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "en", "que", "los", "una"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "und", "das", "von", "ein", "mit", "zu"),
}


def spark_stopword_hits(tokens: str, words: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"size(filter({tokens}, t -> array_contains(array({arr}), t)))"


def sql_stopword_hits(tokens: str, words: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({tokens}, t -> list_contains([{arr}], t)))"


def spark_quality_ratios(tokens: str, text: str) -> dict[str, str]:
    """The three heuristic quality ratios (Spark SQL expression
    strings over a tokens-array column and the raw text column) —
    the single source of truth shared by operators/textops.
    text_quality and operators/domain_ops.corpus_domain_rollup, so
    the per-domain rollup can inline the score (no doc_id self-join)
    without risking formula drift."""
    en_hits = spark_stopword_hits(tokens, STOPWORDS["en"])
    return {
        "distinct_ratio": (
            f"cast(size(array_distinct({tokens})) as double)"
            f" / size({tokens})"
        ),
        "stop_ratio": f"cast({en_hits} as double) / size({tokens})",
        "punct_ratio": (
            f"cast(length(regexp_replace({text}, '[a-z0-9 ]', ''))"
            f" as double) / length({text})"
        ),
    }


def spark_quality_score(tokens: str, text: str) -> str:
    """The blended quality score as one expression string (same
    weights and 6-dp HALF_UP rounding as text_quality's column
    chain)."""
    r = spark_quality_ratios(tokens, text)
    return (
        f"round({r['distinct_ratio']} * 0.5 + {r['stop_ratio']} * 0.3"
        f" + (1.0 - {r['punct_ratio']}) * 0.2, 6)"
    )


def exploded_shingles(df, n: int, out: str = "s"):
    """(doc_id, <out>) rows of word n-gram shingles via INDEX explode.

    Spark's Generate re-evaluates its child expression once per
    OUTPUT row, so ``explode(<built shingle array>)`` re-builds the
    whole array per emitted shingle — O(len²) string work per
    document (measured 3-4x slower end-to-end at sf0.1). Exploding
    the integer index sequence and building ONE shingle per emitted
    row keeps it O(len).

    *df* must already carry ``doc_id`` and ``tokens`` with
    ``size(tokens) >= n`` enforced.
    """
    from pyspark.sql import functions as F

    return df.select(
        "doc_id",
        "tokens",
        F.explode(F.expr(f"sequence(0, size(tokens) - {n})")).alias("i"),
    ).select(
        "doc_id",
        F.expr(f"concat_ws(' ', slice(tokens, i + 1, {n}))").alias(out),
    )
