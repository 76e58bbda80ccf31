"""Repeated-LINE removal — the C4/RefinedWeb line-level dedup pass
(r15 verdict #5a): lines whose content recurs across the corpus are
navigation chrome / boilerplate / licensing banners, and the curation
step removes every occurrence EXCEPT the first (order-aware keep-one,
the same canonical-copy convention as chunking_ops.
docs_duplicated_passages) before any document-level pass runs.

This is the LINE-granularity twin of ``dedup_remove_spans``
(substring_dedup.py: hashed sliding token windows, span output) and
the ACTING counterpart of ``docs_boilerplate_fraction``
(overlap_ops.py measures the repeated-shingle signal; this operator
removes it and reports what the cleaned document becomes).

Line identity: the synthetic corpus is single-line (documents.text
carries no newlines), so a "line" here is a fixed non-overlapping
``_LINE_TOKENS``-token segment — deterministic, content-addressed
(md5 of the space-joined slice), and oracle-expressible; a real crawl
corpus would split on newlines first and feed the same frequency /
keep-first machinery (the segmenter is the only corpus-specific
piece).

Output (one row per document): ``(doc_id, n_lines, n_removed,
removed_frac, cleaned_hash)`` — cleaned_hash is md5 of the kept
segments re-joined in order (md5('') for a fully-boilerplate doc), so
downstream exact-dedup can run on cleaned content without
materializing it.

Scale: one index explode (sequence + ONE slice per emitted row — the
functions/text.exploded_shingles rationale), one groupBy on the
uniform md5 hash for corpus frequency + first occurrence, one hash
join back, one per-doc aggregate. The group key is content-addressed
so partial aggregation collapses repeats map-side; no UDFs, no
driver loops.

Reference parity: generalizes the reference's per-run duplicate
screening (dags/msconvert_dag.py:442-476 verify stage) from file
checksums to line-level content, the granularity crawl curation
actually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
)

_LINE_TOKENS = 10  # tokens per line-proxy segment
_MIN_DF = 2  # distinct docs a line must appear in to be boilerplate


def _spark_last_seg(n: str = "n") -> str:
    """Last segment index: 0 for short docs (including empty), else
    (n-1) div L — the chunking_ops guard shape so both engines emit
    exactly ceil(n/L) segments (and one empty segment for n = 0)."""
    return (
        f"case when {n} <= {_LINE_TOKENS} then 0 "
        f"else ({n} - 1) div {_LINE_TOKENS} end"
    )


def _sql_last_seg(n: str = "n") -> str:
    return (
        f"CASE WHEN {n} <= {_LINE_TOKENS} THEN 0 "
        f"ELSE ({n} - 1) // {_LINE_TOKENS} END"
    )


def dedup_repeated_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(SPARK_TOKENS).alias("tokens"))
        .withColumn("n", F.size("tokens"))
        .select(
            "doc_id",
            "tokens",
            F.explode(
                F.expr(f"sequence(0, {_spark_last_seg()})")
            ).alias("seg_idx"),
        )
        .select(
            "doc_id",
            F.col("seg_idx").cast("int").alias("seg_idx"),
            F.expr(
                f"concat_ws(' ', slice(tokens, "
                f"seg_idx * {_LINE_TOKENS} + 1, {_LINE_TOKENS}))"
            ).alias("seg_text"),
        )
        .withColumn("h", F.md5("seg_text"))
        # referenced by the frequency aggregate AND the verdict join —
        # left lazy each reference re-embeds the tokenize+slice explode
        # (the overlap_ops localCheckpoint rationale)
        .localCheckpoint()
    )
    freq = segs.groupBy("h").agg(
        F.countDistinct("doc_id").alias("df"),
        # order-aware keep-one: the canonical copy is the
        # lexicographically first (doc, segment) occurrence
        F.min(F.struct("doc_id", "seg_idx")).alias("first"),
    )
    verdicts = segs.join(freq, "h").withColumn(
        "removed",
        (F.col("df") >= _MIN_DF)
        & ~(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("seg_idx") == F.col("first.seg_idx"))
        ),
    )
    return verdicts.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("removed").cast("long")).cast("long").alias("n_removed"),
        F.round(
            F.sum(F.col("removed").cast("double")) / F.count("*"), 6
        ).alias("removed_frac"),
        F.expr(
            "md5(concat_ws(' ', transform(array_sort(collect_list("
            "case when not removed then struct(seg_idx, seg_text) end"
            ")), s -> s.seg_text)))"
        ).alias("cleaned_hash"),
    )


QUERIES = {"dedup_repeated_lines": dedup_repeated_lines}

ORACLE = {
    "dedup_repeated_lines": f"""
        WITH toks AS (
            SELECT doc_id, {SQL_TOKENS} AS tokens,
                   len({SQL_TOKENS}) AS n
            FROM documents
        ), segs AS (
            SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
                   array_to_string(
                       tokens[i * {_LINE_TOKENS} + 1:
                              i * {_LINE_TOKENS} + {_LINE_TOKENS}],
                       ' ') AS seg_text
            FROM (SELECT doc_id, tokens,
                         unnest(range(0, ({_sql_last_seg()}) + 1)) AS i
                  FROM toks)
        ), hashed AS (
            SELECT doc_id, seg_idx, seg_text, md5(seg_text) AS h
            FROM segs
        ), freq AS (
            SELECT h, COUNT(DISTINCT doc_id) AS df,
                   MIN({{'doc_id': doc_id, 'seg_idx': seg_idx}}) AS first
            FROM hashed GROUP BY h
        ), verdicts AS (
            SELECT s.doc_id, s.seg_idx, s.seg_text,
                   f.df >= {_MIN_DF}
                   AND NOT (s.doc_id = struct_extract(f.first, 'doc_id')
                            AND s.seg_idx =
                                struct_extract(f.first, 'seg_idx'))
                     AS removed
            FROM hashed s JOIN freq f ON s.h = f.h
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_removed,
               -- CAST ... AS DOUBLE before ROUND (r16 ADVICE #4):
               -- DuckDB's bare 1.0 is DECIMAL, so the uncast form
               -- rounds a DECIMAL quotient while Spark rounds a
               -- DOUBLE — divergent HALF_UP on an exact 6dp half-way
               -- ratio; one numeric domain on both sides (the
               -- _sql_pair_cos convention)
               ROUND(CAST(SUM(CASE WHEN removed THEN 1.0 ELSE 0.0 END)
                          AS DOUBLE) / COUNT(*), 6) AS removed_frac,
               md5(COALESCE(string_agg(
                       CASE WHEN NOT removed THEN seg_text END, ' '
                       ORDER BY seg_idx), '')) AS cleaned_hash
        FROM verdicts GROUP BY doc_id
    """,
}
