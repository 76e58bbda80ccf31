"""The curation capstone: every per-document quality screen in the
suite, joined into ONE verdict matrix.

``corpus_screens_matrix`` runs the seven independent screens a
training-corpus build applies before tokenization —

1. heuristic quality score   (textops.text_quality ≥ 0.40)
2. boilerplate-shingle gate  (overlap_ops.docs_boilerplate_fraction,
                              not flagged)
3. readability               (textops.text_readability, flesch > 0)
4. LM perplexity             (lm_ops.corpus_bigram_perplexity,
                              ppl ≤ 300)
5. near-dup keep-one verdict (corpus_ops.dedup_keep_one, keep = 1)
6. DSIR domain relevance     (dsir_ops.corpus_dsir_weights,
   log-ratio ≥ the corpus mean — the absolute ``selected`` verdict
   depends on the corpus mix and can degenerate to all-false, so the
   matrix uses the self-calibrating relative form; the mean is
   snapped to DECIMAL(18,9) from exact decimal sums so the
   comparison is engine-portable)
7. blocklist                 (blocklist_ops.docs_blocklist_filter,
   not blocked — the C4-style badwords/domain cut; r17)

— and emits one row per document with each score, each pass flag,
the failure count, and the final ``kept`` verdict (all seven pass).
This is the "why was my document dropped" audit table every corpus
pipeline owes its users, and the single declarative query a
reference user would run to reproduce the whole funnel.

Oracle: composed VERBATIM from the six member oracles as
subqueries — the composition itself is the thing under test; if any
member drifts from its oracle, this query drifts too.

Scale: each member is individually 100 TB-shaped (banded dedup,
broadcast LM tables, bounded DSIR stats — see each module); the
matrix adds six doc_id equi-joins over per-doc tables, all carrying
the same key, so AQE coalesces them into one shuffle stage per
side.  The documents scan underneath is shared WHEN IT COSTS I/O:
the matrix calls ``catalog.share_table_scan``, which persists one
scan past a footer-size threshold (default 256 MB) and CacheManager
substitutes it into every member's plan, so at corpus scale the
heavy text column leaves storage once, not six times — while
page-cache-sized inputs (test SF) skip the cache, where the
substitution is a measured net slowdown. Both regimes plan-asserted
in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import (
    load_table,
    share_table_scan,
)
from aichemy_data_pipelines_spark.operators import (
    blocklist_ops,
    corpus_ops,
    dsir_ops,
    lm_ops,
    overlap_ops,
    textops,
)

_MIN_QUALITY = 0.40
_MAX_PPL = 300.0


def corpus_screens_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one persisted documents scan, substituted into every member
    # plan below by CacheManager (see module docstring)
    share_table_scan(spark, sf_dir, "documents")
    q = textops.text_quality(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    b = overlap_ops.docs_boilerplate_fraction(spark, sf_dir).select(
        "doc_id", "boilerplate_frac", F.col("flagged").alias("bp_flagged")
    )
    r = textops.text_readability(spark, sf_dir).select("doc_id", "flesch")
    p = lm_ops.corpus_bigram_perplexity(spark, sf_dir).select(
        "doc_id", "ppl"
    )
    k = corpus_ops.dedup_keep_one(spark, sf_dir).select(
        "doc_id", "keep"
    )
    dw = dsir_ops.corpus_dsir_weights(spark, sf_dir).select(
        "doc_id", F.expr("cast(dsir_logratio as decimal(18,6))").alias("lr")
    )
    # corpus-mean log-ratio, snapped to decimal — one broadcast scalar
    dmean = dw.agg(
        F.expr(
            "cast(round(cast(cast(sum(lr) as decimal(38,6)) as double) "
            "/ count(*), 9) as decimal(18,9)) as lr_mean"
        )
    )
    d = dw.crossJoin(F.broadcast(dmean)).select(
        "doc_id", (F.col("lr") >= F.col("lr_mean")).alias("selected")
    )
    bl = blocklist_ops.docs_blocklist_filter(spark, sf_dir).select(
        "doc_id", "n_term_hits", "blocked"
    )
    # LEFT joins from the documents spine: a doc too short for a
    # member screen (e.g. < 5 tokens → no boilerplate row, < 2 → no
    # perplexity row) must still get an audit row.  Un-scoreable
    # screens FAIL CLOSED (coalesce(flag, false)) — conservative
    # curation drops what it cannot score, and the verdict says why.
    spine = load_table(spark, sf_dir, "documents").select("doc_id")
    m = (
        spine.join(q, "doc_id", "left")
        .join(b, "doc_id", "left")
        .join(r, "doc_id", "left")
        .join(p, "doc_id", "left")
        .join(k, "doc_id", "left")
        .join(d, "doc_id", "left")
        .join(bl, "doc_id", "left")
        .select(
            "doc_id",
            "quality_score",
            "boilerplate_frac",
            "flesch",
            "ppl",
            "n_term_hits",
            F.coalesce(
                F.col("quality_score") >= _MIN_QUALITY, F.lit(False)
            ).alias("pass_quality"),
            F.coalesce(~F.col("bp_flagged"), F.lit(False)).alias(
                "pass_boilerplate"
            ),
            F.coalesce(F.col("flesch") > 0.0, F.lit(False)).alias(
                "pass_readability"
            ),
            F.coalesce(F.col("ppl") <= _MAX_PPL, F.lit(False)).alias(
                "pass_ppl"
            ),
            F.coalesce(F.col("keep") == 1, F.lit(False)).alias(
                "pass_dedup"
            ),
            F.coalesce(F.col("selected"), F.lit(False)).alias("pass_dsir"),
            F.coalesce(~F.col("blocked"), F.lit(False)).alias(
                "pass_blocklist"
            ),
        )
    )
    flags = [
        "pass_quality",
        "pass_boilerplate",
        "pass_readability",
        "pass_ppl",
        "pass_dedup",
        "pass_dsir",
        "pass_blocklist",
    ]
    n_failed = None
    for f in flags:
        t = F.when(F.col(f), 0).otherwise(1)
        n_failed = t if n_failed is None else n_failed + t
    return m.withColumn(
        "n_failed", n_failed.cast("int")
    ).withColumn("kept", F.col("n_failed") == 0)


QUERIES = {"corpus_screens_matrix": corpus_screens_matrix}

# member oracles embedded verbatim as subqueries; LEFT joins +
# fail-closed COALESCE mirror the operator's short-doc handling
_FLAG_SQL = """
    COALESCE(q.quality_score >= {minq}, FALSE) AS pass_quality,
    COALESCE(NOT b.flagged, FALSE) AS pass_boilerplate,
    COALESCE(r.flesch > 0.0, FALSE) AS pass_readability,
    COALESCE(p.ppl <= {maxppl}, FALSE) AS pass_ppl,
    COALESCE(k.keep = 1, FALSE) AS pass_dedup,
    COALESCE(d.selected, FALSE) AS pass_dsir,
    COALESCE(NOT bl.blocked, FALSE) AS pass_blocklist
""".format(minq=_MIN_QUALITY, maxppl=_MAX_PPL)

ORACLE = {
    "corpus_screens_matrix": f"""
        WITH q AS ({textops.ORACLE["text_quality"]}),
        b AS ({overlap_ops.ORACLE["docs_boilerplate_fraction"]}),
        r AS ({textops.ORACLE["text_readability"]}),
        p AS ({lm_ops.ORACLE["corpus_bigram_perplexity"]}),
        k AS ({corpus_ops.ORACLE["dedup_keep_one"]}),
        dw AS (
            SELECT doc_id,
                   CAST(dsir_logratio AS DECIMAL(18,6)) AS lr
            FROM ({dsir_ops.ORACLE["corpus_dsir_weights"]})
        ),
        dmean AS (
            SELECT CAST(ROUND(CAST(CAST(SUM(lr) AS DECIMAL(38,6))
                                   AS DOUBLE) / COUNT(*), 9)
                        AS DECIMAL(18,9)) AS lr_mean
            FROM dw
        ),
        d AS (
            SELECT doc_id, lr >= (SELECT lr_mean FROM dmean) AS selected
            FROM dw
        ),
        bl AS ({blocklist_ops.ORACLE["docs_blocklist_filter"]}),
        m AS (
            SELECT s.doc_id, q.quality_score, b.boilerplate_frac,
                   r.flesch, p.ppl, bl.n_term_hits,
                   {_FLAG_SQL}
            FROM (SELECT doc_id FROM documents) s
            LEFT JOIN q ON s.doc_id = q.doc_id
            LEFT JOIN b ON s.doc_id = b.doc_id
            LEFT JOIN r ON s.doc_id = r.doc_id
            LEFT JOIN p ON s.doc_id = p.doc_id
            LEFT JOIN k ON s.doc_id = k.doc_id
            LEFT JOIN d ON s.doc_id = d.doc_id
            LEFT JOIN bl ON s.doc_id = bl.doc_id
        )
        SELECT *,
               CAST((CASE WHEN pass_quality THEN 0 ELSE 1 END)
                    + (CASE WHEN pass_boilerplate THEN 0 ELSE 1 END)
                    + (CASE WHEN pass_readability THEN 0 ELSE 1 END)
                    + (CASE WHEN pass_ppl THEN 0 ELSE 1 END)
                    + (CASE WHEN pass_dedup THEN 0 ELSE 1 END)
                    + (CASE WHEN pass_dsir THEN 0 ELSE 1 END)
                    + (CASE WHEN pass_blocklist THEN 0 ELSE 1 END)
                    AS INTEGER) AS n_failed,
               (CASE WHEN pass_quality THEN 0 ELSE 1 END)
                    + (CASE WHEN pass_boilerplate THEN 0 ELSE 1 END)
                    + (CASE WHEN pass_readability THEN 0 ELSE 1 END)
                    + (CASE WHEN pass_ppl THEN 0 ELSE 1 END)
                    + (CASE WHEN pass_dedup THEN 0 ELSE 1 END)
                    + (CASE WHEN pass_dsir THEN 0 ELSE 1 END)
                    + (CASE WHEN pass_blocklist THEN 0 ELSE 1 END) = 0
                 AS kept
        FROM m
    """,
}
