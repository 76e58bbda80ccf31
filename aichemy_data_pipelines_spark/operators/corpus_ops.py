"""Corpus-curation operators over ``documents`` — the decision layer
of a training-data pipeline: which docs to KEEP (dedup verdicts),
which are CONTAMINATED (eval-set n-gram overlap), and what makes each
doc distinctive (TF-IDF-shaped term profile).

These compose the primitives in operators/dedup.py / clustering.py
into the artifacts a data curator actually ships:

* ``dedup_keep_one`` — connected components → one keeper per
  near-dup cluster (min doc_id), everything else marked for drop.
* ``decontam_ngram_overlap`` — the standard benchmark-decontamination
  pass: any training doc sharing a long word n-gram with a held-out
  eval doc is flagged, with overlap evidence counts.
* ``docs_distinct_terms`` — per-doc top terms ranked by
  (term frequency DESC, corpus document-frequency ASC) — the TF-IDF
  ordering expressed with exact integers only, so the ranking is
  bit-identical across engines (no FP log/multiply at the sort key).

Scale notes are per-operator; the common theme is that genuinely
bounded sides (benchmark eval sets, query batches) broadcast behind a
row-count guard that falls back to a shuffle join past a configurable
threshold, while UNBOUNDED sides (vocabularies, document-frequency
tables — Heaps' law puts a 100 TB corpus at 1e8–1e9 distinct tokens)
are left unhinted so AQE picks the join strategy from runtime stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import (
    load_table,
    share_table_scan,
)
from aichemy_data_pipelines_spark.functions.layout import spread_small_input
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
    exploded_shingles,
    sql_shingles,
)
from aichemy_data_pipelines_spark.operators.clustering import (
    _SQL_CLUSTERS,
    dedup_clusters,
)

# decontamination: 8-gram shingles (long enough that a shared shingle
# is evidence of copying, not chance — at ~40-word vocab the random
# 8-gram space is 40^8 ≈ 6.5e12); every 10th doc_id plays the held-out
# eval set
_DECON_N = 8
_EVAL_MOD = 10
_TOP_TERMS = 3


def dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep/drop verdict from near-dup connected
    components: the cluster representative (min doc_id = the
    cluster_id itself) is kept, every other member dropped.

    This is the artifact the dedup stack exists to produce — the
    filter a corpus build applies before tokenization.

    Scale: one broadcast-able join of the (doc_id → cluster) labels
    against the doc metadata; all the heavy lifting (LSH + jaccard +
    components) is inherited from clustering.py and stays
    equi-join-shaped.
    """
    clusters = dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        clusters.join(docs, "doc_id")
        .select(
            "doc_id",
            "source",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).cast("int").alias("keep"),
        )
    )


def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    distinct word 8-gram with the held-out eval split
    (doc_id % 10 == 0), with evidence counts.

    Output: one row per CONTAMINATED training doc —
    (doc_id, n_shared_shingles = distinct 8-grams shared with any
    eval doc, n_eval_docs = distinct eval docs hit).

    Scale: THE decontam shape for 100 TB — the eval side (benchmark
    suites, a few million n-grams at most) is broadcast to every
    executor, so the training corpus is ONE scan + ONE map-side hash
    join + one agg on doc_id; no corpus-sized shuffle of shingles.
    The explode is distinct-shingles only (bounded by doc length).

    PRECONDITION (enforced): the broadcast is only safe because the
    eval split is benchmark-sized — a held-out suite, not a corpus
    fraction.  The testdata models it as ``doc_id % 10 == 0``, which
    is 10% of the corpus and would NOT broadcast at 100 TB; a guard
    (``spark.graft.decontam.maxBroadcastEvalRows``, default 1e7
    estimated SHINGLE rows — the side actually hinted, estimated as
    eval chars / 6 ≈ eval tokens ≥ distinct shingles, from a cheap
    column-pruned scan) falls back to an unhinted join —
    AQE/shuffle — past the bound, so misuse degrades to a slower
    plan instead of an OOM.
    """
    from aichemy_data_pipelines_spark.functions.hints import (
        DECONTAM_MAX_EVAL_ROWS,
        DEFAULT_MAX_BROADCAST_ROWS,
        broadcast_when,
        conf_int,
    )
    base = load_table(spark, sf_dir, "documents")
    # Cheap proxy for the HINTED side's size (the exploded distinct
    # shingles, ≤ eval token count): eval char total / 6 on a
    # column-pruned scan — no second pass over the derivation.
    est_eval_rows = int(
        (
            base.where(F.col("doc_id") % _EVAL_MOD == 0)
            .agg(F.coalesce(F.sum("n_chars"), F.lit(0)).alias("c"))
            .first()["c"]
        )
        // 6
    )
    d = exploded_shingles(
        base.transform(spread_small_input)
        .select("doc_id", F.expr(SPARK_TOKENS).alias("tokens"))
        .where(F.size("tokens") >= _DECON_N),
        _DECON_N,
        "sh",
    ).distinct()
    ev = d.where(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_id"), "sh"
    )
    tr = d.where(F.col("doc_id") % _EVAL_MOD != 0)
    ev_side = broadcast_when(
        ev,
        est_eval_rows,
        conf_int(spark, DECONTAM_MAX_EVAL_ROWS, DEFAULT_MAX_BROADCAST_ROWS),
        "decontam_ngram_overlap",
    )
    return (
        tr.join(ev_side, "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


def docs_distinct_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinctive terms per document: TF-IDF ordering with an
    all-integer sort key — term frequency DESC (the TF), corpus
    document frequency ASC (the IDF direction), token ASC tie-break.
    No floating-point score, so the ranking is engine-exact.

    Output: (doc_id, rk, token, tf, df).

    Scale: explode → (doc_id, token) count is one well-distributed
    shuffle; the document-frequency table is vocabulary-sized, which
    is UNBOUNDED at 100 TB (Heaps' law: 1e8–1e9 distinct tokens on a
    web corpus), so the tf⋈df join is deliberately unhinted — AQE
    broadcasts it when runtime stats say it fits and shuffles
    otherwise; the final top-k is a per-doc window (partition =
    doc_id — maximal parallelism, no global sort).
    """
    tok = (
        load_table(spark, sf_dir, "documents")
        .transform(spread_small_input)
        .select("doc_id", F.explode(F.expr(SPARK_TOKENS)).alias("token"))
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        tf.join(df, "token")  # unhinted: vocabulary-sized, AQE decides
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_TERMS)
        .select("doc_id", "rk", "token", "tf", "df")
    )


def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source training-token budget: the first question of any
    corpus build ("how many tokens do we have, and where from").

    Counts are whitespace tokens AND BPE-ish regex tokens (the two
    estimates bracket the real tokenizer), plus chars and the min/max
    doc length — all exact integers.

    Scale: pure map over the corpus (token counting is per-row HOF
    arithmetic, no explode), then one tiny agg on source — the
    map-side partial aggregation does nearly all the work, the
    shuffle carries |sources| rows per partition.
    """
    from aichemy_data_pipelines_spark.operators.textops import _BPE_RE_SPARK

    d = (
        load_table(spark, sf_dir, "documents")
        .transform(spread_small_input)
        .select(
            "source",
            F.size(F.expr(SPARK_TOKENS)).alias("ws"),
            F.size(
                F.expr(
                    f"regexp_extract_all(trim(lower(text)), '{_BPE_RE_SPARK}', 0)"
                )
            ).alias("bpe"),
            F.length("text").alias("chars"),
        )
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws").alias("total_ws_tokens"),
        F.sum("bpe").alias("total_bpe_tokens"),
        F.sum("chars").alias("total_chars"),
        F.min("ws").alias("min_doc_tokens"),
        F.max("ws").alias("max_doc_tokens"),
    )


def curation_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation verdicts — the flag table every curation
    consumer shares: (doc_id, source, ws, q_keep, is_eval, contam,
    dedup_keep, final). Flags are independent (not sequential
    subtraction), ``final`` is their conjunction. Used by
    ``corpus_curation_funnel`` (audit agg) and the corpus-build
    driver (pipeline/corpus_build.py, the materializing twin)."""
    from aichemy_data_pipelines_spark.operators.textops import (
        text_repetition_filter,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.expr(SPARK_TOKENS)).alias("ws")
    )
    quality = text_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("q_keep")
    )
    contam = decontam_ngram_overlap(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("contam")
    )
    keep1 = dedup_keep_one(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("dedup_keep")
    )
    return (
        docs.join(quality, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .join(keep1, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "ws",
            F.coalesce("q_keep", F.lit(False)).alias("q_keep"),
            (F.col("doc_id") % _EVAL_MOD == 0).alias("is_eval"),
            F.coalesce("contam", F.lit(False)).alias("contam"),
            (F.coalesce("dedup_keep", F.lit(1)) == 1).alias("dedup_keep"),
        )
        .withColumn(
            "final",
            F.col("q_keep")
            & ~F.col("is_eval")
            & ~F.col("contam")
            & F.col("dedup_keep"),
        )
    )


def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation funnel, composed from the shipped
    stages: quality gate (Gopher-style repetition filter) → eval
    holdout → benchmark decontamination → near-dup keep-one — with a
    per-source audit of every drop reason and the final token yield.

    This is the "one query a corpus owner runs" view: each gate is
    counted independently (flags, not sequential subtraction, so the
    numbers don't depend on gate order) and ``n_final`` applies the
    conjunction.

    Scale: each stage keeps its own optimal shape (pure-map quality,
    broadcast decontam, equi-join dedup); the funnel adds only
    doc_id-keyed left joins of flag tables + one tiny agg on source.
    The documents scan under the stages is persisted ONCE past the
    footer-size threshold (catalog.share_table_scan, default 256 MB)
    and CacheManager substitutes it into each stage's plan, so at
    corpus scale the text column is read from storage once;
    page-cache-sized inputs skip the cache (a measured net slowdown
    there — see catalog.py).
    """
    share_table_scan(spark, sf_dir, "documents")
    return curation_flags(spark, sf_dir).groupBy("source").agg(
        F.count("*").alias("n_raw"),
        F.sum(F.expr("cast(not q_keep as bigint)")).alias("n_fail_quality"),
        F.sum(F.expr("cast(is_eval as bigint)")).alias("n_eval_heldout"),
        F.sum(F.expr("cast(contam as bigint)")).alias("n_contaminated"),
        F.sum(F.expr("cast(not dedup_keep as bigint)")).alias(
            "n_dup_dropped"
        ),
        F.sum(F.expr("cast(final as bigint)")).alias("n_final"),
        F.sum(F.expr("case when final then ws else 0 end")).alias(
            "final_ws_tokens"
        ),
    )


def corpus_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source near-dup rate from the keep-one verdicts — the
    first chart in any dedup report: which ingestion sources are
    flooding the corpus with duplicates.

    Scale: inherits the dedup stack; the report itself is one
    bounded-cardinality agg on source.

    Output: (source, n_docs, n_dropped, dup_rate).
    """
    v = dedup_keep_one(spark, sf_dir)
    return v.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(1 - F.col("keep")).alias("n_dropped"),
        F.round(F.sum(1 - F.col("keep")) / F.count("*"), 6).alias(
            "dup_rate"
        ),
    )


def corpus_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BYTES saved by dedup per source — the number a dedup report
    actually leads with (storage + training-compute savings), the
    size-weighted companion of corpus_dup_rate_by_source's doc
    counts: a source dropping a few huge duplicates outranks one
    dropping many tiny ones.

    Composed from dedup_keep_one's verdicts joined back to doc sizes
    (one definition of "dropped"; the oracle composes the cluster
    CTE the same way).

    Output: (source, total_chars, chars_dropped, savings_rate).

    Scale: inherits the dedup stack; the join back to sizes is
    doc_id-keyed and the report is one bounded agg on source.
    """
    v = dedup_keep_one(spark, sf_dir)
    sizes = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    return (
        v.join(sizes, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(
                F.col("n_chars") * (1 - F.col("keep"))
            ).cast("long").alias("chars_dropped"),
            F.round(
                F.sum(F.col("n_chars") * (1 - F.col("keep")))
                / F.sum("n_chars"),
                6,
            ).alias("savings_rate"),
        )
    )


def docs_length_percentiles_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact doc-length (n_chars) quartiles + p95 per source — the
    length-distribution audit every corpus intake runs (truncated
    scrapes collapse the upper tail; template farms collapse the
    IQR to a point).

    Determinism: exact linear-interpolation percentiles
    (Spark ``percentile`` ↔ DuckDB ``quantile_cont``, the
    events_percentiles recipe), rounded 6dp; counts exact.

    Scale: exact per-group percentiles sort within each source
    group — fine for bounded group counts; the 100 TB path swaps
    approx_percentile (t-digest, map-side mergeable) into the same
    output shape.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.round(F.expr("percentile(n_chars, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 6).alias("p95"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


def decontam_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic benchmark decontamination: flag training vectors whose
    embedding cosine to ANY held-out eval vector (vec_id % 10 == 0,
    the suite's eval-split convention) reaches 0.35 — the paraphrase
    leak that n-gram decontamination (decontam_ngram_overlap) cannot
    see, run on the same split so the two reports compose.

    Output: one row per CONTAMINATED training vector —
    (vec_id, n_eval_hits = eval vectors at/above the bar,
    max_cosine = the strongest leak).

    Scale: the canonical semantic-decontam shape — the eval side is a
    benchmark suite (thousands-to-millions of vectors), so it
    BROADCASTS and the training corpus is ONE scan through a
    broadcast nested-loop join; no corpus-sized shuffle, no pairwise
    materialization beyond each train-row × eval-block product.
    Recall is exact (every train/eval pair is scored — decontam wants
    no LSH misses). Cost is O(|train| x |eval| x dim) multiply-adds,
    linear in the corpus for a fixed suite. The same row-count guard
    as the n-gram pass (``spark.graft.decontam.maxBroadcastEvalRows``)
    drops the hint past the bound, degrading to an AQE-planned join
    instead of an OOM. Norms are computed once per side, not per
    pair; dot products are decimal-exact (portable), rounded to 8dp
    before the threshold like every cosine in the suite.

    Cost control: the exact-decimal fold is ~an order of magnitude
    more arithmetic than a double fold, so every pair is first
    scored with a plain DOUBLE cosine and only pairs within 1e-6 of
    the bar are re-scored exactly. Lossless by margin analysis: the
    double cosine differs from the true value by ≲1e-12 relative
    (per-dim float products are exact in doubles; only summation
    order varies), so any pair whose exact 8-dp-rounded cosine
    reaches the bar has a double cosine ≥ bar − 5e-9 − 1e-12, far
    inside the 1e-6 gate — the prefilter can only discard pairs the
    exact test would also discard. Pinned by a boundary-pair test
    in tests/test_decontam_embedding.py.
    """
    from aichemy_data_pipelines_spark.functions.hints import (
        DECONTAM_MAX_EVAL_ROWS,
        DEFAULT_MAX_BROADCAST_ROWS,
        broadcast_when,
        conf_int,
    )
    from aichemy_data_pipelines_spark.functions.vectors import (
        spark_cosine,
        spark_dot_exact,
    )

    e = load_table(spark, sf_dir, "embeddings")
    norm = f"sqrt({spark_dot_exact('embedding', 'embedding')})"
    ev = e.where(F.col("vec_id") % _EVAL_MOD == 0).select(
        F.col("embedding").alias("ve"),
        F.expr(norm).alias("ne"),
    )
    n_eval = ev.count()
    tr = (
        e.where(F.col("vec_id") % _EVAL_MOD != 0)
        .transform(spread_small_input)
        .select(
            "vec_id",
            F.col("embedding").alias("va"),
            F.expr(norm).alias("na"),
        )
    )
    dot = spark_dot_exact("va", "ve")
    return (
        tr.crossJoin(
            broadcast_when(
                ev,
                n_eval,
                conf_int(
                    spark,
                    DECONTAM_MAX_EVAL_ROWS,
                    DEFAULT_MAX_BROADCAST_ROWS,
                ),
                "decontam_embedding eval split",
            )
        )
        .where(
            F.expr(spark_cosine("va", "ve")) >= _DECON_COS - 1e-6
        )
        .withColumn(
            "cosine", F.round(F.expr(f"try_divide({dot}, na * ne)"), 8)
        )
        .where(F.col("cosine") >= _DECON_COS)
        .groupBy("vec_id")
        .agg(
            F.count("*").cast("long").alias("n_eval_hits"),
            F.max("cosine").alias("max_cosine"),
        )
    )


#: semantic-leak bar — calibrated so paraphrase-level similarity in
#: the synthetic embedding space trips it while unrelated vectors
#: (max train→eval cosine p50 ≈ 0.28) do not
_DECON_COS = 0.35


def decontam_token_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level decontamination report: for every contaminated
    training doc, HOW MUCH of it is contaminated — total covered
    tokens, the longest contaminated token run, and both as fractions
    of the doc — the numbers a model card actually reports
    (``decontam_ngram_overlap`` gives binary hits + shingle counts,
    not span extent).

    Semantics: a token position is contaminated when it is covered by
    any word ``_DECON_N``-gram the doc shares with the held-out eval
    split (doc_id % ``_EVAL_MOD`` == 0). Matching shingle START
    positions are merged gaps-and-islands style: starts ``i`` and
    ``i'`` belong to one run when ``i' − i <= _DECON_N`` (their
    covered spans overlap or touch), so each island covers exactly
    ``max(i) − min(i) + _DECON_N`` tokens and islands are disjoint —
    summing them is the exact covered-token count, no double count.

    Output: one row per contaminated training doc — (doc_id,
    n_tokens, n_islands, contaminated_tokens, contaminated_frac,
    longest_run, longest_frac).

    Scale: the decontam_ngram_overlap shape plus per-doc windows —
    the eval side broadcasts behind the same row-count guard
    (``spark.graft.decontam.maxBroadcastEvalRows``), so the corpus is
    ONE scan + map-side hash join; the islands windows and final agg
    all partition by doc_id, so the matched-positions frame (tiny —
    only contaminated docs' hit positions) shuffles ONCE on doc_id
    and every later step reuses that partitioning.
    """
    from aichemy_data_pipelines_spark.functions.hints import (
        DECONTAM_MAX_EVAL_ROWS,
        DEFAULT_MAX_BROADCAST_ROWS,
        broadcast_when,
        conf_int,
    )

    base = load_table(spark, sf_dir, "documents")
    # same hinted-side size proxy as decontam_ngram_overlap: eval
    # chars / 6 ≈ eval tokens ≥ distinct eval shingles
    est_eval_rows = int(
        (
            base.where(F.col("doc_id") % _EVAL_MOD == 0)
            .agg(F.coalesce(F.sum("n_chars"), F.lit(0)).alias("c"))
            .first()["c"]
        )
        // 6
    )
    toks = (
        base.transform(spread_small_input)
        .select("doc_id", F.expr(SPARK_TOKENS).alias("tokens"))
        .where(F.size("tokens") >= _DECON_N)
    )
    # positional variant of functions.text.exploded_shingles: explode
    # the index sequence (O(len), not O(len^2) — see that docstring)
    # and KEEP the start position i
    pos_sh = toks.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        "tokens",
        F.explode(
            F.expr(f"sequence(0, size(tokens) - {_DECON_N})")
        ).alias("i"),
    ).select(
        "doc_id",
        "n_tokens",
        "i",
        F.expr(f"concat_ws(' ', slice(tokens, i + 1, {_DECON_N}))").alias(
            "sh"
        ),
    )
    ev = (
        pos_sh.where(F.col("doc_id") % _EVAL_MOD == 0)
        .select("sh")
        .distinct()
    )
    tr = pos_sh.where(F.col("doc_id") % _EVAL_MOD != 0)
    hits = tr.join(
        broadcast_when(
            ev,
            est_eval_rows,
            conf_int(
                spark, DECONTAM_MAX_EVAL_ROWS, DEFAULT_MAX_BROADCAST_ROWS
            ),
            "decontam_token_report",
        ),
        "sh",
    ).select("doc_id", "n_tokens", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    lag_i = F.lag("i").over(w)
    islands = hits.withColumn(
        "new_isl",
        F.when(
            lag_i.isNull() | (F.col("i") - lag_i > _DECON_N), 1
        ).otherwise(0),
    ).withColumn(
        "island_id",
        F.sum("new_isl").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = islands.groupBy("doc_id", "n_tokens", "island_id").agg(
        (F.max("i") - F.min("i") + F.lit(_DECON_N)).alias("run_len")
    )
    return runs.groupBy("doc_id", "n_tokens").agg(
        F.count("*").cast("long").alias("n_islands"),
        F.sum("run_len").cast("long").alias("contaminated_tokens"),
        F.round(
            F.sum("run_len") / F.col("n_tokens").cast("double"), 6
        ).alias("contaminated_frac"),
        F.max("run_len").cast("long").alias("longest_run"),
        F.round(
            F.max("run_len") / F.col("n_tokens").cast("double"), 6
        ).alias("longest_frac"),
    )


def decontam_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE contamination extent — the table a model card
    actually prints: for every training source, docs screened, docs
    contaminated, the contamination rate, the share of training
    tokens covered by eval-shared n-grams, and the mean/max
    longest-contaminated-run fraction (composing
    ``decontam_token_report``; short docs with no possible 8-gram
    count as screened-and-clean).

    Determinism: the per-doc fractions are 6dp-rounded doubles; their
    MEAN goes through an exact decimal(10,6) sum (the
    events_anomaly_zscore recipe) so partial-agg order cannot move
    the 6th digit; token shares divide exact integer sums. Sources
    with zero contaminated docs report NULL mean/max (no evidence,
    not 0).

    Scale: the token report's own shape plus one tokenize pass over
    the training split and a |sources|-bounded aggregate.
    """
    rep = decontam_token_report(spark, sf_dir).select(
        "doc_id", "contaminated_tokens", "longest_frac"
    )
    tr = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % _EVAL_MOD != 0)
        .select(
            "doc_id",
            "source",
            F.size(F.expr(SPARK_TOKENS)).cast("long").alias("n_tokens"),
        )
    )
    return (
        tr.join(rep, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count("longest_frac").cast("long").alias("n_contaminated"),
            F.round(
                F.count("longest_frac")
                / F.count("*").cast("double"),
                6,
            ).alias("contamination_rate"),
            F.round(
                F.sum(
                    F.coalesce("contaminated_tokens", F.lit(0))
                ).cast("double")
                / F.sum("n_tokens"),
                6,
            ).alias("contaminated_token_share"),
            F.round(
                F.expr(
                    "cast(sum(cast(longest_frac as decimal(10,6))) "
                    "as double)"
                )
                / F.count("longest_frac"),
                6,
            ).alias("mean_longest_frac"),
            F.max("longest_frac").alias("max_longest_frac"),
        )
    )


QUERIES = {
    "decontam_token_report": decontam_token_report,
    "decontam_source_rollup": decontam_source_rollup,
    "corpus_dedup_savings": corpus_dedup_savings,
    "decontam_embedding": decontam_embedding,
    "docs_length_percentiles_by_source": docs_length_percentiles_by_source,
    "dedup_keep_one": dedup_keep_one,
    "corpus_dup_rate_by_source": corpus_dup_rate_by_source,
    "decontam_ngram_overlap": decontam_ngram_overlap,
    "docs_distinct_terms": docs_distinct_terms,
    "corpus_token_budget": corpus_token_budget,
    "corpus_curation_funnel": corpus_curation_funnel,
}

from aichemy_data_pipelines_spark.functions.vectors import sql_dot_exact  # noqa: E402
from aichemy_data_pipelines_spark.operators.textops import _BPE_RE_SQL  # noqa: E402

_T = SQL_TOKENS

ORACLE = {
    "docs_length_percentiles_by_source": """
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(n_chars) AS BIGINT) AS min_chars,
               round(quantile_cont(n_chars, 0.25), 6) AS p25,
               round(quantile_cont(n_chars, 0.5), 6) AS p50,
               round(quantile_cont(n_chars, 0.75), 6) AS p75,
               round(quantile_cont(n_chars, 0.95), 6) AS p95,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars
        FROM documents GROUP BY source
    """,
    "dedup_keep_one": f"""
        WITH clusters AS ({_SQL_CLUSTERS})
        SELECT c.doc_id, d.source, c.cluster_id, c.cluster_size,
               CASE WHEN c.doc_id = c.cluster_id THEN 1 ELSE 0 END AS keep
        FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    """,
    "corpus_dedup_savings": f"""
        WITH clusters AS ({{_SQL_CLUSTERS}}),
        v AS (
            SELECT c.doc_id, d.source, d.n_chars,
                   CASE WHEN c.doc_id = c.cluster_id THEN 1 ELSE 0 END
                     AS keep
            FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
        )
        SELECT source,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_chars * (1 - keep)) AS BIGINT)
                 AS chars_dropped,
               round(CAST(SUM(n_chars * (1 - keep)) AS DOUBLE)
                     / SUM(n_chars), 6) AS savings_rate
        FROM v GROUP BY source
    """.format(_SQL_CLUSTERS=_SQL_CLUSTERS),
    "corpus_dup_rate_by_source": f"""
        WITH clusters AS ({{_SQL_CLUSTERS}}),
        v AS (
            SELECT c.doc_id, d.source,
                   CASE WHEN c.doc_id = c.cluster_id THEN 1 ELSE 0 END
                     AS keep
            FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
        )
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(1 - keep) AS BIGINT) AS n_dropped,
               round(CAST(SUM(1 - keep) AS DOUBLE) / COUNT(*), 6)
                 AS dup_rate
        FROM v GROUP BY source
    """.format(_SQL_CLUSTERS=_SQL_CLUSTERS),
    "decontam_ngram_overlap": f"""
        WITH toks AS (
            SELECT doc_id, {_T} AS tokens FROM documents
        ), sh AS (
            SELECT doc_id,
                   unnest(list_distinct({sql_shingles('tokens', _DECON_N)}))
                     AS sh
            FROM toks WHERE len(tokens) >= {_DECON_N}
        ), ev AS (
            SELECT doc_id AS eval_id, sh FROM sh WHERE doc_id % {_EVAL_MOD} = 0
        ), tr AS (
            SELECT doc_id, sh FROM sh WHERE doc_id % {_EVAL_MOD} <> 0
        )
        SELECT tr.doc_id,
               COUNT(DISTINCT tr.sh) AS n_shared_shingles,
               COUNT(DISTINCT ev.eval_id) AS n_eval_docs
        FROM tr JOIN ev ON tr.sh = ev.sh
        GROUP BY tr.doc_id
    """,
    "decontam_token_report": f"""
        WITH toks AS (
            SELECT doc_id, {_T} AS tokens FROM documents
        ), t2 AS (
            SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
                   tokens
            FROM toks WHERE len(tokens) >= {_DECON_N}
        ), pos AS (
            SELECT doc_id, n_tokens,
                   unnest(range(0, len(tokens) - {_DECON_N - 1})) AS i,
                   unnest({sql_shingles('tokens', _DECON_N)}) AS sh
            FROM t2
        ), ev AS (
            SELECT DISTINCT sh FROM pos WHERE doc_id % {_EVAL_MOD} = 0
        ), hits AS (
            SELECT p.doc_id, p.n_tokens, p.i
            FROM pos p JOIN ev ON p.sh = ev.sh
            WHERE p.doc_id % {_EVAL_MOD} <> 0
        ), isl AS (
            SELECT doc_id, n_tokens, i,
                   CASE WHEN lag(i) OVER w IS NULL
                          OR i - lag(i) OVER w > {_DECON_N}
                        THEN 1 ELSE 0 END AS new_isl
            FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY i)
        ), isl2 AS (
            SELECT doc_id, n_tokens, i,
                   SUM(new_isl) OVER (
                       PARTITION BY doc_id ORDER BY i
                       ROWS UNBOUNDED PRECEDING) AS island_id
            FROM isl
        ), runs AS (
            SELECT doc_id, n_tokens, island_id,
                   MAX(i) - MIN(i) + {_DECON_N} AS run_len
            FROM isl2 GROUP BY doc_id, n_tokens, island_id
        )
        SELECT doc_id, n_tokens,
               COUNT(*) AS n_islands,
               CAST(SUM(run_len) AS BIGINT) AS contaminated_tokens,
               round(CAST(SUM(run_len) AS DOUBLE) / n_tokens, 6)
                 AS contaminated_frac,
               CAST(MAX(run_len) AS BIGINT) AS longest_run,
               round(CAST(MAX(run_len) AS DOUBLE) / n_tokens, 6)
                 AS longest_frac
        FROM runs GROUP BY doc_id, n_tokens
    """,
    "corpus_token_budget": f"""
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(len({_T})) AS BIGINT) AS total_ws_tokens,
               CAST(SUM(len(regexp_extract_all(trim(lower(text)),
                       '{_BPE_RE_SQL}', 0))) AS BIGINT) AS total_bpe_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               MIN(len({_T})) AS min_doc_tokens,
               MAX(len({_T})) AS max_doc_tokens
        FROM documents GROUP BY source
    """,
    "docs_distinct_terms": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_T}) AS token FROM documents
        ), tf AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM tok GROUP BY doc_id, token
        ), df AS (
            SELECT token, COUNT(*) AS df FROM tf GROUP BY token
        )
        SELECT doc_id, rk, token, tf, df FROM (
            SELECT tf.doc_id, tf.token, tf.tf, df.df,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, df.df ASC, tf.token ASC
                   ) AS rk
            FROM tf JOIN df ON tf.token = df.token) t
        WHERE rk <= {_TOP_TERMS}
    """,
}

from aichemy_data_pipelines_spark.operators import textops as _textops  # noqa: E402

# The funnel oracle composes the already-verified stage oracles as
# derived tables (DuckDB allows WITH/WITH RECURSIVE inside them), so
# the end-to-end numbers are checked against the same per-stage
# definitions the individual queries verify.
# composes the token report's oracle verbatim (the screens/funnel
# pattern): if the per-doc extent drifts, the rollup drifts with it
ORACLE["decontam_source_rollup"] = f"""
    WITH rep AS ({ORACLE["decontam_token_report"]}), tr AS (
        SELECT doc_id, source, CAST(len({_T}) AS BIGINT) AS n_tokens
        FROM documents WHERE doc_id % {_EVAL_MOD} <> 0
    )
    SELECT tr.source,
           COUNT(*) AS n_docs,
           CAST(COUNT(rep.longest_frac) AS BIGINT) AS n_contaminated,
           round(CAST(COUNT(rep.longest_frac) AS DOUBLE) / COUNT(*), 6)
             AS contamination_rate,
           round(CAST(SUM(COALESCE(rep.contaminated_tokens, 0))
                      AS DOUBLE) / SUM(tr.n_tokens), 6)
             AS contaminated_token_share,
           round(CAST(SUM(CAST(rep.longest_frac AS DECIMAL(10,6)))
                      AS DOUBLE) / COUNT(rep.longest_frac), 6)
             AS mean_longest_frac,
           MAX(rep.longest_frac) AS max_longest_frac
    FROM tr LEFT JOIN rep ON rep.doc_id = tr.doc_id
    GROUP BY tr.source
"""

# the curation flags + final-verdict CTE chain, shared between the
# funnel oracle and export_ops' contamination-aware packing oracle
# (r18) so the two compose the SAME per-stage definitions — emits
# ``fin(source, doc_id, ws, q_keep, is_eval, contam, dedup_keep,
# final)``
_SQL_FIN = f"""flags AS (
            SELECT d.source, d.doc_id, len({_T}) AS ws,
                   COALESCE(q.keep, FALSE) AS q_keep,
                   d.doc_id % {_EVAL_MOD} = 0 AS is_eval,
                   c.doc_id IS NOT NULL AS contam,
                   COALESCE(k.keep, 1) = 1 AS dedup_keep
            FROM documents d
            LEFT JOIN ({_textops.ORACLE["text_repetition_filter"]}) q
              ON q.doc_id = d.doc_id
            LEFT JOIN ({ORACLE["decontam_ngram_overlap"]}) c
              ON c.doc_id = d.doc_id
            LEFT JOIN ({ORACLE["dedup_keep_one"]}) k
              ON k.doc_id = d.doc_id
        ), fin AS (
            SELECT *,
                   q_keep AND NOT is_eval AND NOT contam AND dedup_keep
                     AS final
            FROM flags
        )"""

ORACLE["corpus_curation_funnel"] = f"""
        WITH {_SQL_FIN}
        SELECT source,
               COUNT(*) AS n_raw,
               CAST(SUM(CASE WHEN NOT q_keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_fail_quality,
               CAST(SUM(CASE WHEN is_eval THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_eval_heldout,
               CAST(SUM(CASE WHEN contam THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_contaminated,
               CAST(SUM(CASE WHEN NOT dedup_keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_dropped,
               CAST(SUM(CASE WHEN final THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_final,
               CAST(SUM(CASE WHEN final THEN ws ELSE 0 END) AS BIGINT)
                 AS final_ws_tokens
        FROM fin GROUP BY source
"""

ORACLE["decontam_embedding"] = f"""
    WITH ev AS (
        SELECT embedding AS ve FROM embeddings
        WHERE vec_id % {_EVAL_MOD} = 0
    ), tr AS (
        SELECT vec_id, embedding AS va FROM embeddings
        WHERE vec_id % {_EVAL_MOD} <> 0
    ), expl AS (
        SELECT vec_id, pair_id, unnest(va) AS xa, unnest(ve) AS xe
        FROM (
            SELECT tr.vec_id, row_number() OVER () AS pair_id,
                   tr.va, ev.ve
            FROM tr, ev
        ) p
    ), dots AS (
        SELECT vec_id, pair_id,
               {sql_dot_exact('xa', 'xe')} AS dae,
               {sql_dot_exact('xa', 'xa')} AS daa,
               {sql_dot_exact('xe', 'xe')} AS dee
        FROM expl GROUP BY vec_id, pair_id
    ), cos AS (
        SELECT vec_id,
               round(dae / (sqrt(daa) * sqrt(dee)), 8) AS c
        FROM dots
    )
    SELECT vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
           MAX(c) AS max_cosine
    FROM cos WHERE c >= {_DECON_COS}
    GROUP BY vec_id
"""
