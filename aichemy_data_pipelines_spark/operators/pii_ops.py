"""PII detection + redaction over the ``documents`` table — the
compliance stage every training-data pipeline runs before text ships
to a tokenizer (emails, phone numbers, IP addresses → typed mask
tokens).

The synthetic corpus contains no real PII, so the operator first
*injects* deterministic PII spans derived from ``doc_id`` (identical
CASE/concat arithmetic in Spark and the DuckDB oracle), then scrubs
them back out. This makes the redaction path fully hash-checkable:
per-document match counts, the cleaned text's md5, and the cleaned
length must all agree bit-for-bit between engines.

Scale: pure map — regexp_extract_all / regexp_replace are per-row JVM
regex work inside whole-stage codegen; no shuffle, no UDF, columns
pruned to (doc_id, text). At 100 TB this is the embarrassingly
parallel stage; throughput is regex cost × corpus bytes, linear in
executors.

Regex portability: patterns avoid backslash classes entirely
(``[0-9]`` not ``\\d``, ``[.]`` not ``\\.``) so the same literal is a
valid Java regex (Spark) and RE2 regex (DuckDB) with identical
semantics, and Spark SQL string-literal escape processing can't bite.
DuckDB's ``regexp_replace`` is first-match-only by default — the
oracle passes the ``'g'`` flag explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.layout import spread_small_input

# No backslashes: identical literal in Java regex and RE2.
EMAIL_RE = "[a-z0-9]+@[a-z0-9.]+[a-z]"
PHONE_RE = "[+]1-555-[0-9]{4}"
IP_RE = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"

# Deterministic PII injection: identical SQL in both engines.
# ~1/2 of docs get an email, ~1/3 a phone, ~1/5 an IP.
_RAW = """concat(text,
    CASE WHEN doc_id % 2 = 0
         THEN concat(' reach user', CAST(doc_id AS VARCHAR), '@mail.example.com')
         ELSE '' END,
    CASE WHEN doc_id % 3 = 0
         THEN concat(' call +1-555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
         ELSE '' END,
    CASE WHEN doc_id % 5 = 0
         THEN concat(' from 10.', CAST(doc_id % 256 AS VARCHAR), '.0.',
                     CAST(doc_id % 100 AS VARCHAR))
         ELSE '' END)"""


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and mask emails / phone numbers / IPv4 addresses.

    Output: (doc_id, n_emails, n_phones, n_ips, clean_len, clean_md5).
    Counts come from ``regexp_extract_all`` on the raw text;
    redaction applies email → phone → ip in a fixed order (mask
    tokens contain no digits, so later patterns can't re-match
    earlier masks).
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .transform(spread_small_input)
        .select("doc_id", F.expr(_RAW.replace("VARCHAR", "STRING")).alias("raw"))
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IP_RE,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(raw, '{EMAIL_RE}', 0)")).alias(
            "n_emails"
        ),
        F.size(F.expr(f"regexp_extract_all(raw, '{PHONE_RE}', 0)")).alias(
            "n_phones"
        ),
        F.size(F.expr(f"regexp_extract_all(raw, '{IP_RE}', 0)")).alias("n_ips"),
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


QUERIES = {"text_pii_scrub": text_pii_scrub}

ORACLE = {
    "text_pii_scrub": f"""
        WITH raw AS (
            SELECT doc_id, {_RAW} AS raw FROM documents
        ), clean AS (
            SELECT doc_id, raw,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g'),
                           '{PHONE_RE}', '<PHONE>', 'g'),
                       '{IP_RE}', '<IP>', 'g') AS clean
            FROM raw
        )
        SELECT doc_id,
               len(regexp_extract_all(raw, '{EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(raw, '{PHONE_RE}')) AS n_phones,
               len(regexp_extract_all(raw, '{IP_RE}')) AS n_ips,
               length(clean) AS clean_len,
               md5(clean) AS clean_md5
        FROM clean
    """,
}
