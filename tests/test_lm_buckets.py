"""lm_ops.corpus_perplexity_buckets: bucket-order semantics (head =
lowest perplexity within the language, buckets partition each
language's scored docs into balanced tertiles). Value parity vs the
DuckDB oracle runs separately via tests/test_oracle_parity.py."""

from __future__ import annotations

from collections import defaultdict

from aichemy_data_pipelines_spark.operators.lm_ops import (
    corpus_perplexity_buckets,
)

SF_SMOKE = "/root/testdata/sf0.001"


def test_buckets_are_ordered_balanced_tertiles_per_lang(spark):
    rows = corpus_perplexity_buckets(spark, SF_SMOKE).collect()
    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        by_lang[r.lang][r.bucket].append(r.ppl)
    assert by_lang, "no scored documents"
    for lang, buckets in by_lang.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        # order: every head ppl <= every middle ppl <= every tail ppl
        if buckets["head"] and buckets["middle"]:
            assert max(buckets["head"]) <= min(buckets["middle"]), lang
        if buckets["middle"] and buckets["tail"]:
            assert max(buckets["middle"]) <= min(buckets["tail"]), lang
        # balance: tertile sizes differ by at most 1 per cutoff side
        # (exact percentile cutoffs on distinct-ish values)
        n = sum(len(v) for v in buckets.values())
        if n >= 6:
            for b in ("head", "middle", "tail"):
                assert abs(len(buckets[b]) - n / 3) <= 2, (lang, b)
