"""Exact-substring duplicate detection — the scalable stand-in for
suffix-array dedup (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better").

MinHash (operators/dedup.py) finds *whole-document* near-dups; this
pass finds documents sharing long VERBATIM spans (quotes, mirrored
paragraphs, templated boilerplate) even when the documents as a
whole are dissimilar. The suffix-array formulation of the paper is a
single-machine algorithm; the distributed re-expression is window
hashing:

1. slide a W-token window over every document, hash each window to
   64 bits (portable md5-derived hash, functions/hashing.py);
2. one doc-frequency pass drops windows seen in only one document
   (no duplicate evidence) and windows seen in > _MAX_DF documents
   (boilerplate — joining those would explode quadratically, and a
   span shared by hundreds of docs is template noise, not copying);
3. a self-equi-join on the window hash yields candidate pairs; the
   per-pair count of distinct shared windows measures the length of
   the shared span (k shared consecutive windows ~= a verbatim run
   of W + k - 1 tokens).

Scale: the only corpus-sized shuffles are the window-hash agg (map-
side combined) and the equi-join; the df-cap bounds join fanout at
_MAX_DF per window value, so worst-case pair fanout per window is
_MAX_DF^2 — never all-pairs. At 100 TB, W rises to ~50 tokens and
the hash shrinks the shuffle to (doc_id, int64) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.layout import spread_small_input
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

# 12-token windows: long enough that a shared window is copying, not
# chance (~40-word vocab -> 40^12 >> corpus windows), short enough
# that the ~60-word synthetic docs still produce overlapping spans.
_WIN = 12
_MAX_DF = 32
_MIN_SHARED = 2


def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= _MIN_SHARED verbatim W-token
    windows: (doc_a, doc_b, n_shared_windows), doc_a < doc_b.
    """
    d = (
        exploded_shingles(
            load_table(spark, sf_dir, "documents")
            .transform(spread_small_input)
            .select("doc_id", F.expr(SPARK_TOKENS).alias("tokens"))
            .where(F.size("tokens") >= _WIN),
            _WIN,
            "sh",
        )
        .select("doc_id", F.expr(spark_hash64("sh")).alias("h"))
        .distinct()
    )
    keep = (
        d.groupBy("h")
        .agg(F.count("*").alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= _MAX_DF))
        .select("h")
    )
    wf = d.join(keep, "h")
    a = wf.select(F.col("doc_id").alias("doc_a"), "h")
    b = wf.select(F.col("doc_id").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_windows"))
        .where(F.col("n_shared_windows") >= _MIN_SHARED)
    )


QUERIES = {"dedup_exact_substring": dedup_exact_substring}

ORACLE = {
    "dedup_exact_substring": f"""
        WITH tok AS (
            SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
        ), w AS (
            SELECT DISTINCT doc_id, {sql_hash64('sh')} AS h FROM (
                SELECT doc_id,
                       unnest({sql_shingles('toks', _WIN)}) AS sh
                FROM tok WHERE len(toks) >= {_WIN})
        ), keep AS (
            SELECT h FROM w GROUP BY h
            HAVING COUNT(*) BETWEEN 2 AND {_MAX_DF}
        ), wf AS (
            SELECT w.doc_id, w.h FROM w JOIN keep USING (h)
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS n_shared_windows
        FROM wf a JOIN wf b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= {_MIN_SHARED}
    """,
}


# -- Remove-span variant (Lee et al. 2022 §4: dedup by DELETING the
# duplicated span and keeping the cleaned document, not by dropping
# whole documents or merely reporting pairs) --------------------------
#
# Distributed re-expression: the document is TILED into fixed
# non-overlapping _TILE-token spans; a full tile whose hash occurs
# anywhere else in the corpus is removed unless this occurrence is
# the corpus-wide canonical first (lowest (doc_id, tile_idx)) — the
# keep-one convention of dedup_keep_one lifted from documents to
# spans. The trailing partial tile (< _TILE tokens) is never a
# removal candidate: too short to be duplicate EVIDENCE at the
# threshold, same reason dedup_exact_substring windows require _WIN
# tokens.
#
# Canonical selection uses min-aggregate over an ENCODED position key
# (doc_id * 2^20 + tile_idx — tile_idx < 2^20 holds to 12M-token
# docs), NOT a row_number window: groupBy-min partially aggregates
# map-side, so a boilerplate tile shared by millions of docs reduces
# to one (h, min_key) row per partition before the shuffle — the
# window formulation would sort the whole hot key in one task.

_TILE = _WIN  # reuse the 12-token evidence threshold
_POS_SHIFT = 1 << 20


def dedup_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document span-removal report with the cleaned text's
    fingerprint: (doc_id, n_tiles, n_removed, removed_frac,
    clean_n_tokens, clean_fp).

    clean_fp = md5 of the kept tiles re-joined in order (token-space
    text, the same normalization every dedup operator shares) — the
    VALUE check that the reconstruction is identical across engines
    without shipping the full cleaned corpus through the driver
    compare; a writer would emit the clean text column itself.
    """
    tok = (
        load_table(spark, sf_dir, "documents")
        .transform(spread_small_input)
        .select("doc_id", F.expr(SPARK_TOKENS).alias("toks"))
    )
    tiles = (
        tok.select(
            "doc_id",
            "toks",
            F.explode(
                F.expr(
                    f"sequence(0, cast(ceil(size(toks) / {_TILE}.0)"
                    " as bigint) - 1)"
                )
            ).alias("tile_idx"),
        )
        .select(
            "doc_id",
            "tile_idx",
            F.expr(
                f"concat_ws(' ', slice(toks, tile_idx * {_TILE} + 1, {_TILE}))"
            ).alias("tile_text"),
            F.expr(
                f"size(slice(toks, tile_idx * {_TILE} + 1, {_TILE}))"
            ).alias("n_toks"),
            F.expr(
                f"(tile_idx + 1) * {_TILE} <= size(toks)"
            ).alias("is_full"),
        )
        .withColumn("pos_key", F.expr(f"doc_id * {_POS_SHIFT} + tile_idx"))
    )
    full = tiles.where("is_full").withColumn(
        "h", F.expr(spark_hash64("tile_text"))
    )
    canon = full.groupBy("h").agg(F.min("pos_key").alias("canon_key"))
    marked = full.join(canon, "h").withColumn(
        "removed", F.col("pos_key") != F.col("canon_key")
    )
    merged = marked.select(
        "doc_id", "tile_idx", "tile_text", "n_toks", "removed"
    ).unionByName(
        tiles.where(~F.col("is_full")).select(
            "doc_id",
            "tile_idx",
            "tile_text",
            "n_toks",
            F.lit(False).alias("removed"),
        )
    )
    return merged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tiles"),
        F.sum(F.col("removed").cast("long")).alias("n_removed"),
        F.round(
            F.sum(F.col("removed").cast("double")) / F.count("*"), 6
        ).alias("removed_frac"),
        F.sum(
            F.when(~F.col("removed"), F.col("n_toks")).otherwise(0)
        )
        .cast("long")
        .alias("clean_n_tokens"),
        F.expr(
            "md5(array_join(transform(array_sort(collect_list("
            "case when not removed then struct(tile_idx, tile_text) end)),"
            " s -> s.tile_text), ' '))"
        ).alias("clean_fp"),
    )


QUERIES["dedup_remove_spans"] = dedup_remove_spans

ORACLE["dedup_remove_spans"] = f"""
    WITH tok AS (
        SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
    ), tiles AS (
        SELECT doc_id,
               CAST(i AS BIGINT) AS tile_idx,
               array_to_string(toks[i * {_TILE} + 1 : (i + 1) * {_TILE}],
                               ' ') AS tile_text,
               len(toks[i * {_TILE} + 1 : (i + 1) * {_TILE}]) AS n_toks,
               (i + 1) * {_TILE} <= len(toks) AS is_full,
               doc_id * {_POS_SHIFT} + i AS pos_key
        FROM (
            SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / {_TILE}.0)
                                        AS BIGINT))) AS i
            FROM tok
        )
    ), full_tiles AS (
        SELECT *, {sql_hash64('tile_text')} AS h FROM tiles WHERE is_full
    ), canon AS (
        SELECT h, MIN(pos_key) AS canon_key FROM full_tiles GROUP BY h
    ), merged AS (
        SELECT f.doc_id, f.tile_idx, f.tile_text, f.n_toks,
               f.pos_key <> c.canon_key AS removed
        FROM full_tiles f JOIN canon c USING (h)
        UNION ALL
        SELECT doc_id, tile_idx, tile_text, n_toks, false AS removed
        FROM tiles WHERE NOT is_full
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tiles,
           CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           round(SUM(CASE WHEN removed THEN 1.0 ELSE 0.0 END) / COUNT(*),
                 6) AS removed_frac,
           CAST(SUM(CASE WHEN removed THEN 0 ELSE n_toks END) AS BIGINT)
             AS clean_n_tokens,
           md5(COALESCE(string_agg(CASE WHEN NOT removed THEN tile_text END,
                                   ' ' ORDER BY tile_idx), ''))
             AS clean_fp
    FROM merged GROUP BY doc_id
"""
