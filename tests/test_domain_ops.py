"""operators/domain_ops.py: within-domain scoping semantics that the
sf corpus can't pin (it has no cross-domain byte-identical pairs) —
crafted duplicates across two domains, plus the rollup's arithmetic
on the same tiny table. Oracle parity at sf0.01 runs separately via
tests/test_oracle_parity.py like every other query."""

from __future__ import annotations

from aichemy_data_pipelines_spark.operators.domain_ops import (
    corpus_domain_rollup,
    dedup_within_domain,
)

_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_dedup_is_scoped_to_the_domain(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "the same text", "en", "a.com", 13),
            (2, "the same text", "en", "a.com", 13),
            (5, "the same text", "en", "a.com", 13),
            (3, "the same text", "en", "b.com", 13),  # other domain
            (4, "something else", "en", "a.com", 14),
        ],
    )
    got = {
        r.doc_id: (r.n_copies_in_domain, r.keep)
        for r in dedup_within_domain(spark, sf).collect()
    }
    # a.com's copy group keeps ONLY its lowest doc_id
    assert got[1] == (3, 1)
    assert got[2] == (3, 0)
    assert got[5] == (3, 0)
    # the byte-identical doc in b.com is NOT part of a.com's group
    assert got[3] == (1, 1)
    assert got[4] == (1, 1)


def test_rollup_counts_and_rates(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "alpha beta gamma", "en", "a.com", 16),
            (2, "alpha beta gamma", "en", "a.com", 16),
            (3, "delta epsilon", "de", "a.com", 13),
            (4, "zeta", "en", "b.com", 4),
        ],
    )
    got = {r.domain: r for r in corpus_domain_rollup(spark, sf).collect()}
    a, b = got["a.com"], got["b.com"]
    assert (a.n_docs, a.n_langs, a.ws_tokens) == (3, 2, 8)
    assert (b.n_docs, b.n_langs, b.ws_tokens) == (1, 1, 1)
    # one of a.com's three docs is a within-domain exact dup
    assert round(a.exact_dup_rate, 6) == round(1 / 3, 6)
    assert b.exact_dup_rate == 0.0
    # rates are fractions of docs passing the 0.40 quality bar
    assert 0.0 <= a.quality_pass_rate <= 1.0
