"""Unicode / mojibake normalization stats — the ftfy-style encoding
health screen a crawl corpus runs before tokenization (r16 verdict
#4b): per document, how far the text is from NFC-normal form and how
many encoding-damage artifacts it carries (replacement characters,
UTF-8-decoded-as-Latin-1 markers, stray C0 controls). Documents
flagged here went through a broken decode somewhere upstream; a
curation pass either re-decodes or drops them.

The synthetic corpus is clean ASCII, so — exactly like
operators/urls_ops.py synthesizes noisy URLs — the query synthesizes
a deterministic per-document noise suffix IN-PLAN from md5(doc_id)
hex-digit parities, identically in both engines: a combining-accent
sequence (``e`` + U+0301, which NFC composes to one codepoint — the
denormalization signal), a U+FFFD replacement character, the classic
``Ã©`` mojibake pair (é through a Latin-1 misdecode), and a BEL
control. The synthesis is test input, not operator logic: a
production run points the same stats at the raw text column.

Engine notes:

* non-ASCII noise atoms are string literals (``\\u`` escapes in this
  source), NOT ``chr(codepoint)`` calls: Spark's chr() is mod-256
  while DuckDB's is codepoint-true, so chr(769)/chr(65533) silently
  diverge (see the atoms block); the BEL control stays ``chr(7)``
  (≤ 255 agrees) so no raw control byte lands in the query text;
* artifact counts are length-minus-replace arithmetic (single-char
  markers) or a shared RE2/Java-compatible ``[\\x00-...]`` class via
  regexp_count / regexp_extract_all — all JVM-side, inside codegen;
* NFC length is the ONE stat Spark SQL cannot express (no builtin
  normalizer): an Arrow-vectorized ``pandas_udf`` over stdlib
  ``unicodedata`` computes it (the multimodal decode-harness
  discipline — batch-vectorized, never row-at-a-time); the DuckDB
  twin is ``length(nfc_normalize(..))``. Both implement Unicode NFC,
  and the synthesized sequences are stable BMP compositions.

Scale: pure map — no join, no shuffle; the pandas_udf is the only
Python hop and transfers one string + one int column per batch.
Counts are BIGINT in both engines (the driver hash is dtype-aware).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from aichemy_data_pipelines_spark.catalog import load_table

#: shared RE2/Java character class: C0 controls except TAB/LF/CR
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


#: noise atoms. BMP codepoints ABOVE 255 are embedded as string
#: literals (UTF-8 in the rendered SQL; \\u escapes in this source):
#: Spark's chr()/char() is mod-256 ("binary equivalent", ASCII/
#: Latin-1 only), so chr(769) silently wraps to chr(1) there while
#: DuckDB's chr() is codepoint-true — the one cross-dialect trap in
#: this module (caught by the oracle on first run). chr(7) stays a
#: chr() call (≤255 agrees in both engines) so no raw control byte
#: lands in the committed query text.
_COMBINING = "e\u0301"  # decomposed: NFC composes it to one char
_REPLACEMENT = "\ufffd"  # U+FFFD
_MOJIBAKE = "\u00c3\u00a9"  # 'A-tilde + (c)' pair: e-acute misdecoded as Latin-1


def _noisy_expr(digit) -> str:
    """``text`` + deterministic md5-parity noise suffix — one template
    rendered per dialect (``digit(k)`` → the k-th hex digit's parity
    expression), the urls_ops._raw_url_expr recipe."""
    b = {k: digit(k) for k in range(1, 5)}
    return (
        "concat(text, ' ', "
        f"(case when {b[1]} = 0 then '{_COMBINING}' else '' end), "
        f"(case when {b[2]} = 0 then '{_REPLACEMENT}' else '' end), "
        f"(case when {b[3]} = 0 then '{_MOJIBAKE}' else '' end), "
        f"(case when {b[4]} = 0 then chr(7) else '' end))"
    )


def spark_noisy_text() -> str:
    return _noisy_expr(
        digit=lambda k: (
            f"(cast(conv(substr(md5(cast(doc_id as string)), {k}, 1), "
            f"16, 10) as int) % 2)"
        )
    )


def sql_noisy_text() -> str:
    return _noisy_expr(
        digit=lambda k: (
            f"(('0x' || substr(md5(doc_id::VARCHAR), {k}, 1))::INT % 2)"
        )
    )


# LongType INSTANCE, not the "long" DDL string: the string form
# parses via the active SparkContext, which does not exist yet at
# operator-module import time (the driver imports every suite before
# it builds the session)
@pandas_udf(LongType())
def _nfc_len(s: pd.Series) -> pd.Series:
    """Codepoint length after NFC normalization (stdlib unicodedata),
    Arrow-batched. NULL-safe for generality; the corpus text column
    is non-null."""
    import unicodedata

    return s.map(
        lambda x: None
        if x is None
        else len(unicodedata.normalize("NFC", x))
    ).astype("Int64")


def text_unicode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document encoding-health stats over the synthesized noisy
    text.

    Output: (doc_id, n_chars, n_nfc_chars, nfc_delta, n_replacement,
    n_mojibake, n_control, mojibake_flag) — nfc_delta > 0 means the
    text is not NFC-normal (combining sequences an NFC pass would
    compose); the flag marks any hard damage artifact.
    """
    count1 = (
        lambda ch: f"length(noisy) - length(replace(noisy, {ch}, ''))"
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", F.expr(spark_noisy_text()).alias("noisy")
        )
        .select(
            "doc_id",
            F.length("noisy").cast("long").alias("n_chars"),
            _nfc_len(F.col("noisy")).alias("n_nfc_chars"),
            # literal atom, not chr(65533): Spark chr wraps mod 256
            F.expr(count1(f"'{_REPLACEMENT}'")).cast("long").alias(
                "n_replacement"
            ),
            F.expr(count1(f"'{_MOJIBAKE[0]}'")).cast("long").alias(
                "n_mojibake"
            ),
            F.regexp_count("noisy", F.lit(_CTRL_RE))
            .cast("long")
            .alias("n_control"),
        )
        .select(
            "doc_id",
            "n_chars",
            "n_nfc_chars",
            (F.col("n_chars") - F.col("n_nfc_chars")).alias("nfc_delta"),
            "n_replacement",
            "n_mojibake",
            "n_control",
            (
                (F.col("n_replacement") > 0)
                | (F.col("n_mojibake") > 0)
                | (F.col("n_control") > 0)
            ).alias("mojibake_flag"),
        )
    )


QUERIES = {"text_unicode_stats": text_unicode_stats}

ORACLE = {
    "text_unicode_stats": f"""
        WITH noisy AS (
            SELECT doc_id, {sql_noisy_text()} AS noisy
            FROM documents
        ), stats AS (
            SELECT doc_id,
                   CAST(length(noisy) AS BIGINT) AS n_chars,
                   CAST(length(nfc_normalize(noisy)) AS BIGINT)
                     AS n_nfc_chars,
                   CAST(length(noisy)
                        - length(replace(noisy, chr(65533), ''))
                        AS BIGINT) AS n_replacement,
                   CAST(length(noisy)
                        - length(replace(noisy, chr(195), ''))
                        AS BIGINT) AS n_mojibake,
                   CAST(len(regexp_extract_all(noisy, '{_CTRL_RE}'))
                        AS BIGINT) AS n_control
            FROM noisy
        )
        SELECT doc_id, n_chars, n_nfc_chars,
               n_chars - n_nfc_chars AS nfc_delta,
               n_replacement, n_mojibake, n_control,
               n_replacement > 0 OR n_mojibake > 0 OR n_control > 0
                 AS mojibake_flag
        FROM stats
    """,
}
