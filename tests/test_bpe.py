"""BPE tokenizer: training reproducibility, bracketing invariants,
and greedy-merge semantics of the relational apply chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.operators.bpe_ops import (
    BPE_MERGES,
    _apply_merges_spark,
    text_bpe_tokencount,
    train_bpe_merges,
)
from tests.conftest import SF_SMOKE


#: md5 over the sf0.001 corpus text (ordered by doc_id) the frozen
#: BPE_MERGES constant was trained on. The test-data generator may
#: re-emit tables between rounds; if the TEXT actually changed, the
#: reproducibility assertion is vacuous against the new corpus, so
#: skip with re-freeze instructions instead of failing spuriously.
_TRAINED_CORPUS_MD5 = "70f85e987a7a15be744728d3f9c9c2fa"


def test_training_reproduces_frozen_constant(spark):
    """The shipped merge table IS train_bpe_merges(sf0.001) — the
    operator and oracle share a vocabulary nobody hand-edited."""
    import duckdb
    import pytest as _pytest

    cur = duckdb.sql(
        "select md5(string_agg(text, '|' order by doc_id)) from "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchone()[0]
    if cur != _TRAINED_CORPUS_MD5:
        _pytest.skip(
            "sf0.001 corpus text changed since BPE_MERGES was frozen; "
            "re-freeze: python -m aichemy_data_pipelines_spark."
            "operators.bpe_ops, paste into BPE_MERGES, update "
            "_TRAINED_CORPUS_MD5"
        )
    assert train_bpe_merges(spark, SF_SMOKE) == BPE_MERGES


def test_bpe_counts_bracketed(spark):
    """words <= bpe tokens <= alnum chars, with equality impossible
    on a real corpus (some merges must fire)."""
    got = text_bpe_tokencount(spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id",
        F.length(
            F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")
        ).alias("n_alnum"),
    )
    j = got.join(docs, "doc_id")
    n = j.count()
    assert n > 0
    assert j.where(F.col("n_bpe_tokens") < F.col("n_words")).count() == 0
    assert j.where(F.col("n_bpe_tokens") > F.col("n_alnum")).count() == 0
    # merges actually fire corpus-wide
    assert j.where(F.col("n_bpe_tokens") < F.col("n_alnum")).count() > 0


def test_merge_chain_is_greedy_left_to_right(spark):
    """'<a><b>' replace chains must merge non-overlapping left-to-
    right — the reference BPE order. 'erer' under merge (e,r) must
    become two 'er' tokens, not three tokens."""
    df = spark.createDataFrame([("erer",), ("sort sort",), ("",)], "text string")
    out = df.select(_apply_merges_spark(F.col("text")).alias("s")).collect()
    assert out[0].s == "<er><er>"
    # 'sort': s+ort both trained -> single token per word, space kept
    assert out[1].s == "<sort> <sort>"
    assert out[2].s == ""


def test_bpe_brackets_token_budget(spark):
    """The point of the operator: BPE-based budget sits between the
    word-count floor and char-count ceiling corpus_token_budget uses."""
    tot = text_bpe_tokencount(spark, SF_SMOKE).agg(
        F.sum("n_bpe_tokens").alias("bpe"), F.sum("n_words").alias("words")
    ).collect()[0]
    assert 0 < tot.words < tot.bpe
