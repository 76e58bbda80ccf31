"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` merge the per-module suites under
``aichemy_data_pipelines_spark.operators`` (see SURVEY.md §2 for the
inventory). ``entry`` runs the flagship Q3-style query at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from aichemy_data_pipelines_spark.operators.tpch import q3_shipping_priority

    return q3_shipping_priority(spark, "/root/testdata/sf0.001")


def _suites():
    from aichemy_data_pipelines_spark.operators import tpch

    modules = [tpch]
    try:
        from aichemy_data_pipelines_spark.operators import timeseries

        modules.append(timeseries)
    except ImportError:
        pass
    for name in ("dedup", "similarity", "textops", "relational_ext", "clustering", "streaming_ops", "analytics_ext", "quality_ops", "sampling_ops", "ivf", "approx_ops", "corpus_ops", "vector_ops", "pii_ops", "pq", "sketch_ops", "substring_dedup", "ivfpq", "insights_ops", "export_ops", "ml_ops", "bpe_ops", "semdedup"):
        try:
            mod = __import__(
                f"aichemy_data_pipelines_spark.operators.{name}", fromlist=[name]
            )
            modules.append(mod)
        except ImportError:
            pass
    try:
        from aichemy_data_pipelines_spark.operators import pipeline_ops

        modules.append(pipeline_ops)
    except ImportError:
        pass
    try:
        from aichemy_data_pipelines_spark.operators import multimodal_ops

        modules.append(multimodal_ops)
    except ImportError:
        pass
    return modules


# The driver's CORRECTNESS snapshot covers the FIRST 50 entries of
# ``queries()`` in iteration order.  Rounds 1-3 sampled the relational /
# time-series / dedup / text head repeatedly while 58 declared queries
# never received a driver row.  This window lists, explicitly, the 50
# queries that should receive rows THIS round (round 4): the whole
# pipeline / streaming / corpus / PQ-IVF / quality / insights / export /
# multimodal surface, plus the three operators new this round
# (events_asof_join_bucketed, text_bpe_tokencount,
# multimodal_image_phash).  Everything not listed (already-attested
# suites + deferred simple ops: sample_split, sample_stratified,
# corpus_mixture_sample, dq_null_profile, dq_value_ranges,
# part_price_histogram, events_anomaly_zscore, events_salted_distinct,
# events_decision_stump, events_linear_trend, orders_yoy_growth)
# follows behind in suite order.  ROUND-5 ROTATION: put the still-
# never-driver-checked set first — the 11 deferred ops above plus the
# four added after this window froze (dedup_semantic,
# events_heavy_hitters_cms, ann_knn_graph, dedup_incremental) — then
# backfill with the r01-only-attested relational_ext queries.
_DRIVER_WINDOW = [
    # §2.3 pipeline parity
    "pipeline_discover_pending", "pipeline_attempts_policy",
    "pipeline_verify_batch", "pipeline_archive_plan",
    # §2.3 streaming (batch-mode twins)
    "streaming_click_attribution", "streaming_dedup_keys",
    "streaming_upsert_totals", "streaming_enriched_segments",
    "streaming_tumbling_window", "streaming_session_window",
    "streaming_user_totals",
    # §2.7d corpus curation / export
    "dedup_keep_one", "corpus_dup_rate_by_source",
    "decontam_ngram_overlap", "docs_distinct_terms",
    "corpus_token_budget", "corpus_curation_funnel",
    "corpus_shard_plan", "corpus_packing_plan",
    # §2.5 quantized / composed ANN
    "embeddings_pq_encode", "ann_pq_adc_topk", "ann_ivf_topk",
    "ann_ivf_pq_topk", "embeddings_quantize_int8",
    # dedup extensions
    "dedup_exact_substring", "dedup_clusters_star",
    "dedup_graph_triangles", "docs_pagerank",
    # sketches / approx
    "events_hll_rollup", "events_approx_percentiles",
    "distinct_counts_approx",
    # text / quality / analytics
    "text_pii_scrub", "dq_orphan_check", "dq_k_anonymity",
    "orders_retention_cohorts", "compliance_delete_plan",
    # §2.7c insights + ML
    "events_dau_mau", "parts_abc_analysis", "parts_copurchase",
    "customer_rfm", "events_markov_transitions",
    # new this round
    "events_asof_join_bucketed", "text_bpe_tokencount",
    "multimodal_image_phash",
    # §2.7 multimodal
    "multimodal_meta", "multimodal_frames", "multimodal_audio_chunks",
    # §2.7b relational tail
    "customer_scd2", "orders_incremental_agg", "orders_merge_upsert",
]


def _window_order(merged: dict) -> dict:
    ordered = {k: merged[k] for k in _DRIVER_WINDOW if k in merged}
    ordered.update((k, v) for k, v in merged.items() if k not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _suites():
        merged.update(mod.QUERIES)
    return _window_order(merged)


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _suites():
        merged.update(mod.ORACLE)
    return _window_order(merged)
