"""Hashed bigram-LM perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020): train a small language model on a
trusted target slice, score every document's perplexity under it,
and let curation keep the low-perplexity (fluent) tail.

The LM here is the 100 TB-shaped reduction of KenLM: token unigrams
and bigrams are HASHED into fixed bucket spaces (``_B1`` = 1024 /
``_B2`` = 4096, portable md5), so the trained model is two bounded
count tables no matter the corpus size — they collect to the driver
and re-enter the plan as broadcast literals (the same pattern as
operators/dsir_ops.py / the IVF centroids).  Training slice =
``lang = 'en'``; add-one smoothing;
``p(w | prev) ≈ (c_bi(bucket(prev w)) + 1) / (c_uni(bucket(prev)) + _B2)``.

Float portability (same discipline as dsir_ops): each per-bigram log
probability is rounded to 9dp and cast to DECIMAL before the exact
decimal per-doc sum, so Spark's partial-agg order can't flip bits;
only the final mean/exp are doubles, rounded to 6dp.

Scale: bigrams come from the O(len) index-explode shingle path (no
window, no shuffle — adjacency never leaves the row); scoring is two
broadcast equi-joins against the literal count tables + one (doc_id)
agg.  Docs with fewer than 2 tokens carry no bigrams and are scored
NULL (they face the length gates instead).

Output: (doc_id, n_bigrams, avg_logprob, ppl).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table, share_frame
from aichemy_data_pipelines_spark.functions.hashing import (
    spark_hash64,
    sql_hash64,
)
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
)

_B1 = 1024  # unigram (history) buckets
_B2 = 4096  # bigram buckets
_SEED_UNI = 8101
_SEED_BI = 8102
_TGT_LANG = "en"


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, b1, b2) — one row per bigram occurrence, via
    the O(len) index explode (the shingle pattern)."""
    toks = docs.select(
        "doc_id", "lang", F.expr(SPARK_TOKENS).alias("tokens")
    ).where(F.size("tokens") >= 2)
    return toks.select(
        "doc_id",
        "lang",
        "tokens",
        F.explode(F.expr("sequence(0, size(tokens) - 2)")).alias("i"),
    ).select(
        "doc_id",
        "lang",
        F.expr(
            f"{spark_hash64('element_at(tokens, i + 1)', seed=_SEED_UNI)}"
            f" % {_B1}"
        ).alias("b1"),
        F.expr(
            spark_hash64(
                "concat_ws(' ', slice(tokens, i + 1, 2))", seed=_SEED_BI
            )
            + f" % {_B2}"
        ).alias("b2"),
    )


def corpus_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    bi = _doc_bigrams(load_table(spark, sf_dir, "documents"))
    # train with ONE pass over the target slice: reduce to (b1, b2)
    # pair counts (bounded by _B1 x _B2 regardless of corpus size),
    # localCheckpoint the reduction, and roll BOTH marginals up from
    # it — without the checkpoint the two collects would each re-run
    # the corpus token explode
    tgt_pairs = (
        bi.where(F.col("lang") == _TGT_LANG)
        .groupBy("b1", "b2")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    uni_rows = tgt_pairs.groupBy("b1").agg(
        F.sum("c").cast("bigint").alias("c")
    ).collect()
    bi_rows = tgt_pairs.groupBy("b2").agg(
        F.sum("c").cast("bigint").alias("c")
    ).collect()
    uni = spark.createDataFrame(
        [(r.b1, r.c) for r in uni_rows] or [(None, None)],
        "b1 bigint, c_uni bigint",
    )
    bigr = spark.createDataFrame(
        [(r.b2, r.c) for r in bi_rows] or [(None, None)],
        "b2 bigint, c_bi bigint",
    )
    return score_bigrams(bi, uni, bigr)


def score_bigrams(bi: DataFrame, uni: DataFrame, bigr: DataFrame) -> DataFrame:
    """Score (doc_id, b1, b2) bigram rows against trained marginal
    tables — THE smoothing/logprob/perplexity chain, shared by the
    inline operator and the persisted LM index
    (pipeline/lm_index.py) so the two cannot drift."""
    scored = (
        bi.join(F.broadcast(uni), "b1", "left")
        .join(F.broadcast(bigr), "b2", "left")
        .select(
            "doc_id",
            F.expr(
                f"cast(round(ln((coalesce(c_bi, 0) + 1)"
                f" / cast(coalesce(c_uni, 0) + {_B2} as double)), 9)"
                " as decimal(18,9))"
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("lp").alias("s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.col("s").cast("double") / F.col("n_bigrams"), 6
            ).alias("avg_logprob"),
            F.round(
                F.exp(-F.col("s").cast("double") / F.col("n_bigrams")), 6
            ).alias("ppl"),
        )
    )


def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail split (Wenzek et al. 2020): each
    scored document is bucketed by where its LM perplexity falls
    against its LANGUAGE's tertile cutoffs — the standard quality
    prior a crawl pipeline attaches before sampling (head = lowest
    perplexity = most fluent).

    Output: (doc_id, lang, ppl, bucket ∈ head|middle|tail) — only
    documents the LM can score (≥ 2 tokens), like the member query.

    Scale: CCNet's own shape — the cutoffs are a per-language
    AGGREGATE (two exact percentiles over |docs-per-lang| values,
    partial-merge, no global sort) broadcast back onto the corpus,
    so bucketing adds ONE bounded agg + a map-side join to the
    perplexity chain. The windowed alternative (ntile over a
    per-lang total sort) would be a corpus-wide sort per language —
    deliberately avoided. Cutoffs and ppl are both 6-dp-rounded so
    the boundary comparison is engine-exact.

    The scored chain ``j`` feeds BOTH the cutoff aggregate and the
    final bucketing join; left lazy, the full tokenize → pair-explode
    → LM-join chain over ``documents.text`` would run twice per query
    (r8/r9 verdict #1) — 2× the single most expensive scan at 100 TB.
    share_frame persists the (doc_id, lang, ppl) result — tiny, three
    columns per doc — behind the same footer-size condition as the
    capstones' shared scan, so one perplexity subtree is evaluated
    (plan-asserted in tests/test_plans.py) while page-cache-sized test
    inputs keep the measured-faster raw path.
    """
    p = corpus_bigram_perplexity(spark, sf_dir).select("doc_id", "ppl")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = share_frame(spark, p.join(d, "doc_id"), sf_dir, "documents")
    cuts = j.groupBy("lang").agg(
        F.round(F.expr("percentile(ppl, cast(1 as double)/3)"), 6).alias(
            "c1"
        ),
        F.round(F.expr("percentile(ppl, cast(2 as double)/3)"), 6).alias(
            "c2"
        ),
    )
    return j.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "ppl",
        F.when(F.col("ppl") <= F.col("c1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def corpus_perplexity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LANGUAGE bigram LMs — CCNet's actual design (Wenzek et al.
    2020 §3: one KenLM per language, each trained on its own target
    slice, with per-language head/middle/tail cuts), closing the loop
    the English-only ``corpus_bigram_perplexity`` leaves open (r17
    verdict #6a): every document is scored under ITS detected
    language's LM — a Spanish doc's fluency is judged against Spanish
    bigram statistics, not English ones — then bucketed against its
    language's tertiles (the ``corpus_perplexity_buckets`` recipe,
    now with language-matched perplexities underneath).

    Training: ONE pass reduces the corpus to (lang, b1, b2) pair
    counts — bounded by |langs| · _B1 · _B2 buckets regardless of
    corpus size (langs are ISO codes: ~10² at web scale → ≤ 400k
    marginal rows ≈ 10 MB, still the collect-to-driver / re-enter-as-
    broadcast-literal trained-artifact shape). Scoring is two
    broadcast equi-joins on (lang, bucket) + one (doc_id) agg; the
    tertile cutoffs are a per-language bounded aggregate broadcast
    back (never a corpus-wide sort). Same 9dp-decimal logprob / 6dp
    double rounding discipline as the member chain, so both engines
    agree bit-for-bit.

    Output: (doc_id, lang, n_bigrams, avg_logprob, ppl, bucket).
    """
    bi = _doc_bigrams(load_table(spark, sf_dir, "documents"))
    pairs = (
        bi.groupBy("lang", "b1", "b2")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    uni_rows = pairs.groupBy("lang", "b1").agg(
        F.sum("c").cast("bigint").alias("c")
    ).collect()
    bi_rows = pairs.groupBy("lang", "b2").agg(
        F.sum("c").cast("bigint").alias("c")
    ).collect()
    uni = spark.createDataFrame(
        [(r.lang, r.b1, r.c) for r in uni_rows] or [(None, None, None)],
        "lang string, b1 bigint, c_uni bigint",
    )
    bigr = spark.createDataFrame(
        [(r.lang, r.b2, r.c) for r in bi_rows] or [(None, None, None)],
        "lang string, b2 bigint, c_bi bigint",
    )
    scored = (
        bi.join(F.broadcast(uni), ["lang", "b1"], "left")
        .join(F.broadcast(bigr), ["lang", "b2"], "left")
        .select(
            "doc_id",
            "lang",
            F.expr(
                f"cast(round(ln((coalesce(c_bi, 0) + 1)"
                f" / cast(coalesce(c_uni, 0) + {_B2} as double)), 9)"
                " as decimal(18,9))"
            ).alias("lp"),
        )
    )
    p = (
        scored.groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("lp").alias("s"),
        )
        .select(
            "doc_id",
            "lang",
            "n_bigrams",
            F.round(
                F.col("s").cast("double") / F.col("n_bigrams"), 6
            ).alias("avg_logprob"),
            F.round(
                F.exp(-F.col("s").cast("double") / F.col("n_bigrams")), 6
            ).alias("ppl"),
        )
    )
    j = share_frame(spark, p, sf_dir, "documents")
    cuts = j.groupBy("lang").agg(
        F.round(F.expr("percentile(ppl, cast(1 as double)/3)"), 6).alias(
            "c1"
        ),
        F.round(F.expr("percentile(ppl, cast(2 as double)/3)"), 6).alias(
            "c2"
        ),
    )
    return j.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "n_bigrams",
        "avg_logprob",
        "ppl",
        F.when(F.col("ppl") <= F.col("c1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


QUERIES = {
    "corpus_bigram_perplexity": corpus_bigram_perplexity,
    "corpus_perplexity_buckets": corpus_perplexity_buckets,
    "corpus_perplexity_by_lang": corpus_perplexity_by_lang,
}

_SQL_BI = f"""
        SELECT doc_id, lang,
               ({sql_hash64("tokens[i + 1]", seed=_SEED_UNI)}) % {_B1} AS b1,
               ({sql_hash64(
                   "array_to_string(tokens[i + 1:i + 2], ' ')",
                   seed=_SEED_BI,
               )}) % {_B2} AS b2
        FROM (
            SELECT doc_id, lang, tokens,
                   unnest(range(0, len(tokens) - 1)) AS i
            FROM (
                SELECT doc_id, lang, {SQL_TOKENS} AS tokens
                FROM documents
            ) WHERE len(tokens) >= 2
        )
"""

ORACLE = {
    "corpus_bigram_perplexity": f"""
        WITH bi AS ({_SQL_BI}),
        uni AS (
            SELECT b1, CAST(COUNT(*) AS BIGINT) AS c_uni
            FROM bi WHERE lang = '{_TGT_LANG}' GROUP BY b1
        ), bigr AS (
            SELECT b2, CAST(COUNT(*) AS BIGINT) AS c_bi
            FROM bi WHERE lang = '{_TGT_LANG}' GROUP BY b2
        ), scored AS (
            SELECT bi.doc_id,
                   CAST(round(ln((COALESCE(bigr.c_bi, 0) + 1)
                        / CAST(COALESCE(uni.c_uni, 0) + {_B2} AS DOUBLE)),
                        9) AS DECIMAL(18,9)) AS lp
            FROM bi
            LEFT JOIN uni ON bi.b1 = uni.b1
            LEFT JOIN bigr ON bi.b2 = bigr.b2
        ), agg AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   SUM(lp) AS s
            FROM scored GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams,
               round(CAST(s AS DOUBLE) / n_bigrams, 6) AS avg_logprob,
               round(exp(-CAST(s AS DOUBLE) / n_bigrams), 6) AS ppl
        FROM agg
    """,
}

ORACLE["corpus_perplexity_by_lang"] = f"""
    WITH bi AS ({_SQL_BI}),
    uni AS (
        SELECT lang, b1, CAST(COUNT(*) AS BIGINT) AS c_uni
        FROM bi GROUP BY lang, b1
    ), bigr AS (
        SELECT lang, b2, CAST(COUNT(*) AS BIGINT) AS c_bi
        FROM bi GROUP BY lang, b2
    ), scored AS (
        SELECT bi.doc_id, bi.lang,
               CAST(round(ln((COALESCE(bigr.c_bi, 0) + 1)
                    / CAST(COALESCE(uni.c_uni, 0) + {_B2} AS DOUBLE)),
                    9) AS DECIMAL(18,9)) AS lp
        FROM bi
        LEFT JOIN uni ON bi.lang = uni.lang AND bi.b1 = uni.b1
        LEFT JOIN bigr ON bi.lang = bigr.lang AND bi.b2 = bigr.b2
    ), p AS (
        SELECT doc_id, lang,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               round(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6)
                 AS avg_logprob,
               round(exp(-CAST(SUM(lp) AS DOUBLE) / COUNT(*)), 6) AS ppl
        FROM scored GROUP BY doc_id, lang
    ), cuts AS (
        SELECT lang,
               round(quantile_cont(ppl, CAST(1 AS DOUBLE)/3), 6) AS c1,
               round(quantile_cont(ppl, CAST(2 AS DOUBLE)/3), 6) AS c2
        FROM p GROUP BY lang
    )
    SELECT p.doc_id, p.lang, p.n_bigrams, p.avg_logprob, p.ppl,
           CASE WHEN p.ppl <= cuts.c1 THEN 'head'
                WHEN p.ppl <= cuts.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM p JOIN cuts ON p.lang = cuts.lang
"""

ORACLE["corpus_perplexity_buckets"] = f"""
    WITH p AS ({ORACLE["corpus_bigram_perplexity"]}),
    j AS (
        SELECT p.doc_id, d.lang, p.ppl
        FROM p JOIN documents d ON p.doc_id = d.doc_id
    ), cuts AS (
        SELECT lang,
               round(quantile_cont(ppl, CAST(1 AS DOUBLE)/3), 6) AS c1,
               round(quantile_cont(ppl, CAST(2 AS DOUBLE)/3), 6) AS c2
        FROM j GROUP BY lang
    )
    SELECT j.doc_id, j.lang, j.ppl,
           CASE WHEN j.ppl <= cuts.c1 THEN 'head'
                WHEN j.ppl <= cuts.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM j JOIN cuts ON j.lang = cuts.lang
"""
