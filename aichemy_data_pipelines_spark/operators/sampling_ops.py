"""Dataset sampling / splitting operators for training pipelines.

Both are HASH-deterministic (portable md5, functions/hashing.py) —
the property that matters at scale: assignments are reproducible
across runs, engines, and cluster sizes, and adding new rows never
reshuffles existing assignments (unlike rand()-seeded sampling,
which changes with partitioning).

* ``sample_split`` — 80/10/10 train/val/test by hash(doc_id) mod 100
  + per-split counts (the audit view).
* ``sample_stratified`` — keep ≤ K docs per source, chosen by hash
  order (deterministic pseudo-random, balanced across strata).

Scale: pure map + bounded aggs / one window per stratum. The split
column usually becomes a partition column on write (dynamic
partition overwrite in sources/formats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.hashing import spark_hash64, sql_hash64

_PER_SOURCE_K = 12


def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split assignment + size audit per split."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(f"{spark_hash64('cast(doc_id as string)')} % 100")
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≤ K docs per source, selected by portable-hash order (with
    doc_id tiebreak so the choice is total)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(spark_hash64("cast(doc_id as string)", seed=7))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.withColumn("pick_rank", F.row_number().over(w))
        .where(F.col("pick_rank") <= _PER_SOURCE_K)
        .select("source", "pick_rank", "doc_id")
    )


def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: sample the corpus down to a target
    mixture (here: equal doc share per source at half the corpus
    size) with hash-deterministic acceptance — the data-mixing stage
    that sets training-set domain weights.

    Per source: acceptance threshold (ppm, exact integer arithmetic)
    ``min(1e6, budget_per_source * 1e6 / n_i)``; a doc is kept iff
    ``hash(doc_id) % 1e6 < thr``. Deterministic, engine-portable, and
    stable under corpus growth (existing docs never flip).

    Output: (source, n_docs, accept_ppm, n_sampled) — the audit view.

    Scale: one tiny per-source count, thresholds broadcast back, then
    a pure-map filter + one bounded agg. No corpus-scale shuffle —
    the filter runs at scan time.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    totals = counts.agg(
        F.sum("n_docs").alias("n_total"), F.count("*").alias("n_sources")
    )
    thr = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn(
            "accept_ppm",
            F.expr(
                "least(cast(1000000 as bigint), "
                "(n_total div (2 * n_sources)) * 1000000 div n_docs)"
            ),
        )
        .select("source", "n_docs", "accept_ppm")
    )
    h = F.expr(f"{spark_hash64('cast(doc_id as string)', seed=13)} % 1000000")
    return (
        docs.join(F.broadcast(thr), "source")
        .withColumn("_h", h)
        .groupBy("source", "n_docs", "accept_ppm")
        .agg(
            F.sum(F.expr("cast(_h < accept_ppm as bigint)")).alias(
                "n_sampled"
            )
        )
    )


_RESERVOIR_K = 25
_RES_SEED = 29


def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted random sample without replacement, k=25, weight =
    n_chars — the Efraimidis–Spirakis (A-ES) reservoir scheme with a
    deterministic hash in place of rand(): each doc draws
    u = (hash(doc_id) % 1e6 + 1)/1e6 and gets key = -ln(u)/weight;
    the k SMALLEST keys form the sample.  Longer documents are
    proportionally more likely to be drawn, and the draw is
    reproducible across runs/engines/cluster sizes.

    Float portability: -ln(u) is rounded to 9dp decimal (ulp-proof,
    the dsir_ops.py recipe); the single division to double is
    identical IEEE arithmetic in both engines.

    Scale: key assignment is a pure map; the k smallest keys come
    from ``orderBy().limit(k)``, which Spark executes as
    TakeOrderedAndProject — per-partition top-k then a k-row merge
    on the driver, NO global sort/shuffle.  The rank window then
    runs on k rows.  This is exactly how a 100 TB weighted sample
    stays one scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = f"(({spark_hash64('cast(doc_id as string)', seed=_RES_SEED)}) % 1000000 + 1) / 1000000.0"
    keyed = docs.select(
        "doc_id",
        "n_chars",
        (
            F.expr(f"cast(round(-ln({u}), 9) as decimal(18,9))").cast(
                "double"
            )
            / F.col("n_chars").cast("double")
        ).alias("key"),
    )
    topk = keyed.orderBy("key", "doc_id").limit(_RESERVOIR_K)
    return topk.select(
        F.row_number()
        .over(Window.orderBy("key", "doc_id"))
        .alias("sample_rank"),
        "doc_id",
        "n_chars",
        F.round("key", 9).alias("priority"),
    )


_MIX_TAU = "0.7"  # temperature exponent (UniMax/mT5-style rebalancing)


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights, w_s ∝ (n_s/N)^τ
    with τ=0.7 — the standard multilingual/multi-domain rebalancing
    rule (mT5/UniMax): τ<1 upweights small sources toward uniform
    without drowning large ones.

    Float portability (the tfidf/dsir ln recipe): (n_s/N)^τ is
    computed as exp(τ·ln(n_s/N)) with BOTH transcendentals snapped to
    9dp decimals — ln before the exact-decimal τ product, exp after —
    so normalization sums exact decimals; the published frac/weight
    are 6dp doubles from identical IEEE divisions.

    Scale: one per-source count (map-side combined, |sources| rows),
    then all arithmetic runs on the aggregated frame — window over
    |sources| rows, no second corpus pass.
    """
    counts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    total = Window.partitionBy()  # |sources| rows — bounded frame
    p = (
        counts.withColumn("n_total", F.sum("n_docs").over(total))
        .withColumn(
            "p_dec",
            F.expr(
                "cast(round(exp(cast("
                f"cast(round(ln(n_docs / n_total), 9) as decimal(18,9)) "
                f"* cast({_MIX_TAU} as decimal(2,1)) "
                "as double)), 9) as decimal(18,9))"
            ),
        )
        .withColumn("p_sum", F.sum("p_dec").over(total))
    )
    return p.select(
        "source",
        "n_docs",
        F.round(F.col("n_docs") / F.col("n_total"), 6).alias("frac"),
        F.round(
            F.col("p_dec").cast("double") / F.col("p_sum").cast("double"),
            6,
        ).alias("weight"),
    )


QUERIES = {
    "corpus_temperature_mix": corpus_temperature_mix,
    "sample_weighted_reservoir": sample_weighted_reservoir,
    "sample_split": sample_split,
    "sample_stratified": sample_stratified,
    "corpus_mixture_sample": corpus_mixture_sample,
}

_H = sql_hash64("CAST(doc_id AS VARCHAR)")
_H7 = sql_hash64("CAST(doc_id AS VARCHAR)", seed=7)

_H29 = sql_hash64("CAST(doc_id AS VARCHAR)", seed=_RES_SEED)

ORACLE = {
    "corpus_temperature_mix": f"""
        WITH counts AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        ), p AS (
            SELECT source, n_docs,
                   SUM(n_docs) OVER () AS n_total,
                   CAST(round(exp(CAST(
                       CAST(round(ln(n_docs / (SUM(n_docs) OVER ())), 9)
                            AS DECIMAL(18,9))
                       * CAST({_MIX_TAU} AS DECIMAL(2,1))
                   AS DOUBLE)), 9) AS DECIMAL(18,9)) AS p_dec
            FROM counts
        )
        SELECT source, n_docs,
               round(n_docs / n_total, 6) AS frac,
               round(CAST(p_dec AS DOUBLE) /
                     CAST(SUM(p_dec) OVER () AS DOUBLE), 6) AS weight
        FROM p
    """,
    "sample_weighted_reservoir": f"""
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   CAST(CAST(ROUND(-ln((({_H29}) % 1000000 + 1)
                                       / 1000000.0), 9)
                             AS DECIMAL(18,9)) AS DOUBLE)
                     / CAST(n_chars AS DOUBLE) AS key
            FROM documents
        ),
        topk AS (
            SELECT doc_id, n_chars, key
            FROM keyed ORDER BY key, doc_id LIMIT {_RESERVOIR_K}
        )
        SELECT CAST(row_number() OVER (ORDER BY key, doc_id) AS INTEGER)
                 AS sample_rank,
               doc_id, n_chars, ROUND(key, 9) AS priority
        FROM topk
    """,
    "sample_split": f"""
        WITH s AS (
            SELECT n_chars,
                   CASE WHEN ({_H}) % 100 < 80 THEN 'train'
                        WHEN ({_H}) % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT split, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM s GROUP BY split
    """,
    "sample_stratified": f"""
        SELECT source, pick_rank, doc_id FROM (
            SELECT source, doc_id,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY ({_H7}), doc_id) AS pick_rank
            FROM documents) t
        WHERE pick_rank <= {_PER_SOURCE_K}
    """,
    "corpus_mixture_sample": f"""
        WITH counts AS (
            SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ), totals AS (
            SELECT SUM(n_docs) AS n_total, COUNT(*) AS n_sources FROM counts
        ), thr AS (
            SELECT source, n_docs,
                   CAST(least(CAST(1000000 AS BIGINT),
                         (n_total // (2 * n_sources)) * 1000000 // n_docs)
                     AS BIGINT) AS accept_ppm
            FROM counts, totals
        )
        SELECT d.source, t.n_docs, t.accept_ppm,
               CAST(SUM(CASE WHEN ({sql_hash64("CAST(doc_id AS VARCHAR)", seed=13)})
                                  % 1000000 < t.accept_ppm
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM documents d JOIN thr t ON d.source = t.source
        GROUP BY d.source, t.n_docs, t.accept_ppm
    """,
}
