"""Byte-pair-encoding token counting — REAL BPE, relational apply.

Brackets ``corpus_token_budget`` (corpus_ops.py): that operator
estimates budgets from whitespace/regex token counts; this one counts
actual BPE tokens under a fixed, deterministically-trained merge
table, so budget planning can use the same unit the training run
bills in.

Two halves, both public-algorithm (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"):

* **Training** (:func:`train_bpe_merges`): distributed word-frequency
  aggregation (one groupBy shuffle over the corpus), then the classic
  greedy merge loop on the driver over the TOP-``top_words`` vocab —
  a bounded table (2000 rows), so the driver loop is O(vocab), never
  O(corpus). Fully deterministic: ties break on (pair frequency DESC,
  pair lexicographic ASC). The shipped :data:`BPE_MERGES` constant
  was produced by exactly this function over the sf0.001 corpus
  (pinned by a reproducibility test), then frozen so the operator and
  its oracle share one vocabulary.

* **Application** (:func:`text_bpe_tokencount`): NO Python in the hot
  path. Text normalizes to ``[a-z0-9 ]``, every symbol is wrapped in
  angle markers (``cat`` → ``<c><a><t>``), and each merge ``(a, b)``
  becomes one JVM-side ``replace('<a><b>' → '<ab>')`` — chained 64
  deep inside whole-stage codegen. Both Spark's ``replace`` and
  DuckDB's scan left-to-right non-overlapping, which is exactly the
  greedy order of the reference BPE regex implementation, so the
  oracle replays the merge chain bit-for-bit with the same builtin.
  Token count = number of ``<`` markers left standing. Word
  boundaries (spaces) never carry markers, so merges cannot cross
  words.

Scale: application is a pure map over documents (zero shuffles, zero
UDFs); training is one shuffle + a 2000-row collect. At 100 TB you
train once on a sample partition and broadcast nothing — the merge
table lives in the plan itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table

#: vocabulary cap for training — keeps the driver-side merge loop
#: bounded regardless of corpus size.
_TOP_WORDS = 2000
_NUM_MERGES = 64


def _normalize_sql_expr(col: str) -> str:
    """Shared Spark/DuckDB normalization: lowercase, non-alnum → one
    space, trimmed. Both engines implement this regexp identically."""
    return f"trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"


def _normalize_spark(col):
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def train_bpe_merges(
    spark: SparkSession,
    sf_dir: str,
    num_merges: int = _NUM_MERGES,
    top_words: int = _TOP_WORDS,
) -> list[tuple[str, str]]:
    """Train a BPE merge table on the ``documents`` corpus.

    Distributed part: word-frequency groupBy (the only corpus-sized
    stage). Driver part: greedy pair-merge loop over the top
    ``top_words`` (word, freq) rows — bounded, deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    freqs = (
        docs.select(
            F.explode(
                F.split(_normalize_spark(F.col("text")), " ")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(top_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r.word): int(r.freq) for r in freqs
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f_ in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f_
        if not pairs:
            break
        # deterministic: highest frequency, then lexicographic pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f_ in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f_
        vocab = new_vocab
    return merges


#: Frozen output of ``train_bpe_merges(spark, sf0.001)`` — see the
#: reproducibility test in tests/test_bpe.py. Regenerate with
#: ``python -m aichemy_data_pipelines_spark.operators.bpe_ops``.
BPE_MERGES: list[tuple[str, str]] = [
    ('e', 'r'), ('o', 'r'), ('i', 'n'), ('o', 'w'), ('s', 't'),
    ('l', 'u'), ('a', 'r'), ('p', 'ar'), ('m', 'er'), ('a', 't'),
    ('a', 'n'), ('c', 'an'), ('s', 'can'), ('c', 'o'), ('co', 'lu'),
    ('colu', 'm'), ('colum', 'n'), ('d', 'ow'), ('in', 'dow'),
    ('w', 'indow'), ('d', 'er'), ('or', 'der'), ('or', 't'),
    ('s', 'ort'), ('par', 't'), ('u', 'p'), ('a', 'g'), ('ag', 'g'),
    ('a', 'lu'), ('alu', 'e'), ('v', 'alue'), ('in', 'e'),
    ('l', 'ine'), ('e', 'y'), ('k', 'ey'), ('j', 'o'), ('jo', 'in'),
    ('g', 'e'), ('mer', 'ge'), ('er', 'y'), ('g', 'r'), ('gr', 'o'),
    ('gro', 'up'), ('q', 'u'), ('qu', 'ery'), ('c', 't'),
    ('ct', 'or'), ('e', 'ctor'), ('v', 'ector'), ('a', 's'),
    ('as', 'h'), ('h', 'ash'), ('l', 'ow'), ('s', 'low'),
    ('a', 'm'), ('e', 'am'), ('r', 'eam'), ('st', 'ream'),
    ('f', 'i'), ('fi', 'l'), ('fil', 't'), ('filt', 'er'),
    ('a', 'st'), ('f', 'ast'),
]


def _apply_merges_spark(col):
    """``cat`` → ``<c><a><t>`` then the merge chain, JVM-side."""
    s = F.regexp_replace(_normalize_spark(col), "([a-z0-9])", "<$1>")
    for a, b in BPE_MERGES:
        s = F.replace(s, F.lit(f"<{a}><{b}>"), F.lit(f"<{a}{b}>"))
    return s


def _apply_merges_sql(col: str) -> str:
    s = f"regexp_replace({_normalize_sql_expr(col)}, '([a-z0-9])', '<\\1>', 'g')"
    for a, b in BPE_MERGES:
        s = f"replace({s}, '<{a}><{b}>', '<{a}{b}>')"
    return s


def text_bpe_tokencount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token count under :data:`BPE_MERGES`, plus the
    whitespace word count it brackets (BPE count is always >= words,
    <= characters)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = _normalize_spark(F.col("text"))
    sym = _apply_merges_spark(F.col("text"))
    return docs.select(
        "doc_id",
        (
            F.length(sym) - F.length(F.replace(sym, F.lit("<"), F.lit("")))
        ).cast("long").alias("n_bpe_tokens"),
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long")
        .alias("n_words"),
    )


def _oracle_bpe_tokencount() -> str:
    sym = _apply_merges_sql("text")
    norm = _normalize_sql_expr("text")
    return f"""
        SELECT doc_id,
               length({sym}) - length(replace({sym}, '<', ''))
                   AS n_bpe_tokens,
               CASE WHEN {norm} = '' THEN 0
                    ELSE length({norm}) - length(replace({norm}, ' ', '')) + 1
               END AS n_words
        FROM documents
    """


QUERIES = {
    "text_bpe_tokencount": text_bpe_tokencount,
}

ORACLE = {
    "text_bpe_tokencount": _oracle_bpe_tokencount(),
}


if __name__ == "__main__":
    from aichemy_data_pipelines_spark.session import get_spark

    sp = get_spark(app_name="bpe-train")
    sp.sparkContext.setLogLevel("ERROR")
    print(train_bpe_merges(sp, "/root/testdata/sf0.001"))
