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


def test_perplexity_by_lang_uses_language_matched_lms(spark):
    """r18 (r17 verdict #6a): corpus_perplexity_by_lang must score
    every doc under ITS language's bigram LM — same bigram extent as
    the English-LM member query, but language-matched statistics: on
    the English slice the per-lang LM IS the English LM (identical
    ppl), while non-English docs get their own models (lower ppl
    than under the mismatched English LM for a typical corpus slice,
    since their own bigrams are in-distribution). Buckets are
    per-language tertiles: each language splits ~1/3 per bucket."""
    from collections import Counter

    from aichemy_data_pipelines_spark.operators.lm_ops import (
        corpus_bigram_perplexity,
        corpus_perplexity_by_lang,
    )

    per = {r.doc_id: r for r in corpus_perplexity_by_lang(spark, SF_SMOKE).collect()}
    en = {r.doc_id: r for r in corpus_bigram_perplexity(spark, SF_SMOKE).collect()}
    assert set(per) == set(en)  # same scoreable extent (>= 2 tokens)
    langs = {r.lang for r in per.values()}
    assert len(langs) >= 2, "smoke corpus should be multilingual"
    for d, r in per.items():
        assert r.n_bigrams == en[d].n_bigrams
        if r.lang == "en":
            # the en slice's LM is trained on exactly the same slice
            assert r.ppl == en[d].ppl
    # non-English docs are genuinely scored by a DIFFERENT model
    # than the English LM (the synthetic corpus shares its token
    # vocabulary across langs, so fit direction isn't asserted —
    # smaller slices smooth harder; only model identity is)
    non_en = [
        (r.ppl, en[d].ppl) for d, r in per.items() if r.lang != "en"
    ]
    assert non_en
    assert any(p != q for p, q in non_en)
    # per-language tertile buckets: every language has all three
    # buckets and no bucket exceeds half the language's docs (loose)
    by_lang = Counter((r.lang, r.bucket) for r in per.values())
    for lang in langs:
        n = sum(v for (lg, _), v in by_lang.items() if lg == lang)
        for b in ("head", "middle", "tail"):
            assert by_lang[(lang, b)] >= 1, (lang, b)
            assert by_lang[(lang, b)] <= 0.5 * n + 1
