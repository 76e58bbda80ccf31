"""DSIR-style data selection: hashed n-gram importance weights
(Data Selection via Importance Resampling, Xie et al. 2023).

The paper's recipe for picking pretraining data that "looks like" a
target domain: model target and raw corpora as bag-of-hashed-ngram
multinomials, weight each raw document by its average per-token
log-likelihood ratio, and resample by weight.  Here the target
distribution is the English slice (``lang = 'en'``) and features are
hashed unigrams over ``_B`` = 1024 buckets (portable md5 hashing, so
the whole estimator replays in DuckDB).

Portability of the floating-point chain (the interesting part):

* per-bucket probabilities use add-one smoothing —
  ``(c + 1) / (T + B)`` — where c, T, B are exact integers, so the
  double division is identically rounded in both engines;
* ``ln`` may differ by an ulp between libms, so each bucket's
  log-ratio is rounded to 9dp and cast to ``DECIMAL(18,9)`` BEFORE
  any aggregation;
* the per-doc sum is ``Σ count_in_doc × lr`` in exact decimal
  arithmetic — order-independent, so Spark's nondeterministic
  partial-agg order cannot flip low bits the way a double sum would;
* only the final per-token average is a double, rounded to 6dp.

Scale: one token explode (map-side) + one bucket agg (1024 groups,
partial-agg collapses it), two broadcast scalars (corpus totals), a
broadcast join of the 1024-row log-ratio table against per-doc
bucket counts, one (doc_id) agg.  No UDFs, no driver loop; the
estimator is two bounded aggregations regardless of corpus size —
exactly why DSIR is the importance-sampling method that runs at
100 TB.

Output: (doc_id, n_tokens, dsir_logratio, selected) — ``selected``
is the paper's resampling verdict reduced to its deterministic core
(keep docs that look more target than raw, logratio >= 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.hashing import (
    spark_hash64,
    sql_hash64,
)
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
)

_B = 1024  # hashed feature buckets
_SEED = 7301
_TGT_LANG = "en"


def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucketed = docs.select(
        "doc_id",
        "lang",
        F.explode(F.expr(SPARK_TOKENS)).alias("t"),
    ).select(
        "doc_id",
        "lang",
        F.expr(f"{spark_hash64('t', seed=_SEED)} % {_B}").alias("b"),
    )
    # aggregate per (doc, bucket) FIRST; the global bucket stats then
    # derive from this table (1024-group rollup of an already-reduced
    # input) instead of re-running the token explode — the physical
    # plan pays ONE explode, and a production run would persist
    # doc_buckets so the two downstream consumers (stats action +
    # final join) share the materialization
    doc_buckets = bucketed.groupBy("doc_id", "lang", "b").agg(
        F.count("*").alias("cnt")
    )
    # ONE bounded action materializes the estimator: the bucket stats
    # are ≤ _B rows regardless of corpus size, so they collect to the
    # driver and re-enter the plan as literals (the IVF-centroid
    # pattern) — the corpus-side lineage is then evaluated exactly
    # once, instead of riding along inside the broadcast side's plan
    stats = (
        doc_buckets.groupBy("b")
        .agg(
            F.sum("cnt").cast("bigint").alias("c_raw"),
            F.sum(
                F.expr(
                    f"case when lang = '{_TGT_LANG}' then cnt else 0 end"
                )
            )
            .cast("bigint")
            .alias("c_tgt"),
        )
        .collect()
    )
    t_raw = sum(r.c_raw for r in stats)
    t_tgt = sum(r.c_tgt for r in stats)
    counts = spark.createDataFrame(
        [(r.b, r.c_raw, r.c_tgt) for r in stats],
        "b bigint, c_raw bigint, c_tgt bigint",
    )
    # 9dp-rounded decimal log-ratio per bucket: kills cross-libm ulp
    # noise before the (exact, order-independent) decimal aggregation
    lr = counts.select(
        "b",
        F.expr(
            f"cast(round(ln((c_tgt + 1) / cast({t_tgt + _B} as double))"
            f" - ln((c_raw + 1) / cast({t_raw + _B} as double)), 9)"
            " as decimal(18,9))"
        ).alias("lr"),
    )
    return (
        doc_buckets.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            # decimal(10,0) keeps the product at precision 29 —
            # inside Spark's 38 cap, so no precision-loss rescale
            # (which rounds differently across engines) can kick in
            F.sum(
                F.expr("cast(cnt as decimal(10,0)) * lr")
            ).alias("s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("s").cast("double") / F.col("n_tokens"), 6
            ).alias("dsir_logratio"),
            (F.col("s") >= 0).alias("selected"),
        )
    )


QUERIES = {"corpus_dsir_weights": corpus_dsir_weights}

ORACLE = {
    "corpus_dsir_weights": f"""
        WITH tok AS (
            SELECT doc_id, lang, unnest({SQL_TOKENS}) AS t FROM documents
        ), bk AS (
            SELECT doc_id, lang,
                   ({sql_hash64('t', seed=_SEED)}) % {_B} AS b
            FROM tok
        ), counts AS (
            SELECT b,
                   CAST(COUNT(*) AS BIGINT) AS c_raw,
                   CAST(SUM(CASE WHEN lang = '{_TGT_LANG}' THEN 1
                            ELSE 0 END) AS BIGINT) AS c_tgt
            FROM bk GROUP BY b
        ), totals AS (
            SELECT CAST(SUM(c_raw) AS BIGINT) AS t_raw,
                   CAST(SUM(c_tgt) AS BIGINT) AS t_tgt
            FROM counts
        ), lr AS (
            SELECT b,
                   CAST(round(ln((c_tgt + 1) / CAST(t_tgt + {_B} AS DOUBLE))
                        - ln((c_raw + 1) / CAST(t_raw + {_B} AS DOUBLE)), 9)
                     AS DECIMAL(18,9)) AS lr
            FROM counts, totals
        ), db AS (
            SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM bk GROUP BY doc_id, b
        ), agg AS (
            SELECT db.doc_id,
                   CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                   SUM(CAST(cnt AS DECIMAL(10,0)) * lr.lr) AS s
            FROM db JOIN lr ON db.b = lr.b
            GROUP BY db.doc_id
        )
        SELECT doc_id, n_tokens,
               round(CAST(s AS DOUBLE) / n_tokens, 6) AS dsir_logratio,
               s >= 0 AS selected
        FROM agg
    """,
}
