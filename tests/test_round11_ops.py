"""Ground-truth tests for the round-11 widening operators:
text_langid_classifier (trained softmax distillation), decontam_bloom
(space-bounded Bloom decontamination), corpus_curriculum_mix
(classifier-driven curriculum selection).

Cross-engine value parity is covered by tests/test_oracle_parity.py /
tests/driver_canon.py — these tests pin the SEMANTICS: the student
genuinely learns, the Bloom screen has exact recall against the exact
pass, the curriculum schedule is enforced.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE


def test_langid_student_learns_past_base_rate(spark):
    """The distilled softmax must beat always-predict-majority AND
    produce mixed predictions — a student collapsed onto the majority
    class scores exactly the base rate and is not a classifier."""
    from aichemy_data_pipelines_spark.operators.langid_ops import (
        text_langid_classifier,
    )

    rows = text_langid_classifier(spark, SF_ORACLE).collect()
    n = len(rows)
    agree = sum(r.agree for r in rows) / n
    teacher_counts: dict[str, int] = {}
    for r in rows:
        teacher_counts[r.teacher_lang] = (
            teacher_counts.get(r.teacher_lang, 0) + 1
        )
    base = max(teacher_counts.values()) / n
    assert agree > base, (agree, base)
    preds = {r.pred_lang for r in rows}
    assert len(preds) >= 2, f"student collapsed onto {preds}"
    # the minority class it learned must be a real teacher class
    assert preds <= set(teacher_counts), (preds, teacher_counts)


def test_langid_scores_are_valid_probabilities(spark):
    from aichemy_data_pipelines_spark.operators.langid_ops import (
        text_langid_classifier,
    )

    bad = (
        text_langid_classifier(spark, SF_SMOKE)
        .where((F.col("score") < 0.2 - 1e-9) | (F.col("score") > 1.0))
        .count()
    )
    # the winning softmax probability over 5 classes is >= 1/5
    assert bad == 0


def test_bloom_decontam_exact_recall(spark):
    """One-sided error pin: every doc the EXACT pass flags must be
    bloom-contaminated, and its bloom hit count must be >= the exact
    shared-shingle count (false positives allowed, false negatives
    never — the property that makes the Bloom screen a safe 100 TB
    substitute)."""
    from aichemy_data_pipelines_spark.operators.bloom_ops import (
        decontam_bloom,
    )
    from aichemy_data_pipelines_spark.operators.corpus_ops import (
        decontam_ngram_overlap,
    )

    exact = {
        r.doc_id: r.n_shared_shingles
        for r in decontam_ngram_overlap(spark, SF_SMOKE).collect()
    }
    assert exact, "fixture has no exact contamination to check against"
    bloom = {
        r.doc_id: (r.n_bloom_hits, r.contaminated)
        for r in decontam_bloom(spark, SF_SMOKE).collect()
    }
    for doc_id, n_shared in exact.items():
        n_hits, contaminated = bloom[doc_id]
        assert contaminated, f"doc {doc_id}: exact-flagged, bloom-missed"
        assert n_hits >= n_shared, (doc_id, n_hits, n_shared)


def test_bloom_decontam_covers_all_training_docs(spark):
    """The audit view includes zero-hit docs: one row per training
    doc that can shingle (>= 8 tokens), none for eval docs."""
    from aichemy_data_pipelines_spark.operators.bloom_ops import (
        _EVAL_MOD,
        _N,
        decontam_bloom,
    )
    from aichemy_data_pipelines_spark.catalog import load_table
    from aichemy_data_pipelines_spark.functions.text import SPARK_TOKENS

    out = decontam_bloom(spark, SF_SMOKE)
    assert out.where(F.col("doc_id") % _EVAL_MOD == 0).count() == 0
    want = (
        load_table(spark, SF_SMOKE, "documents")
        .where(F.col("doc_id") % _EVAL_MOD != 0)
        .where(F.size(F.expr(SPARK_TOKENS)) >= _N)
        .count()
    )
    assert out.count() == want


def test_bloom_standalone_gate_matches_decontam_bloom(spark):
    """The standalone ingest-gate entry points (bloom_bits_from_docs
    + bloom_contaminated_ids) intentionally MIRROR decontam_bloom's
    membership semantics instead of sharing a helper (their docstring
    explains the plan-shape reason) — so this parity pin is the
    dual-maintenance guard (r15 ADVICE #3): building the bit set from
    the eval split and screening the training split through the
    standalone gate must flag EXACTLY the doc set decontam_bloom
    marks contaminated."""
    from aichemy_data_pipelines_spark.catalog import load_table
    from aichemy_data_pipelines_spark.operators.bloom_ops import (
        _EVAL_MOD,
        bloom_bits_from_docs,
        bloom_contaminated_ids,
        decontam_bloom,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    bits = bloom_bits_from_docs(
        docs.where(F.col("doc_id") % _EVAL_MOD == 0)
    )
    standalone = {
        r.doc_id
        for r in bloom_contaminated_ids(
            docs.where(F.col("doc_id") % _EVAL_MOD != 0), bits
        ).collect()
    }
    inline = {
        r.doc_id
        for r in decontam_bloom(spark, SF_SMOKE)
        .where("contaminated")
        .collect()
    }
    assert standalone == inline, (
        f"gate/decontam verdict drift: only gate "
        f"{sorted(standalone - inline)[:5]}, only decontam "
        f"{sorted(inline - standalone)[:5]}"
    )


def test_curriculum_schedule_enforced(spark):
    """Decile 1 keeps everything (ppm=1e6 accepts every hash), decile
    10 keeps nothing, selection never exceeds the bin, the bins
    partition the corpus, and NO global-sort window is in the plan
    (the orders_spend_deciles scale contract)."""
    from aichemy_data_pipelines_spark.operators.curriculum_ops import (
        _KEEP_PPM,
        corpus_curriculum_mix,
    )

    df = corpus_curriculum_mix(spark, SF_SMOKE)
    rows = {r.decile: r for r in df.collect()}
    # cutoff binning can leave a boundary decile empty under heavy
    # score ties — present deciles must be valid ids, and the top and
    # bottom of the schedule must materialize on this fixture
    assert set(rows) <= set(range(1, 11))
    assert 1 in rows and 10 in rows
    assert rows[1].n_selected == rows[1].n_docs  # ppm 1e6 = keep all
    assert rows[10].n_selected == 0  # ppm 0 = drop all
    for d, r in rows.items():
        assert r.keep_ppm == _KEEP_PPM[d - 1]
        assert 0 <= r.n_selected <= r.n_docs
        assert r.min_score <= r.max_score
    # score ranges descend with the decile id (non-strict at ties)
    present = sorted(rows)
    for a, b in zip(present, present[1:]):
        assert rows[a].min_score >= rows[b].min_score
        assert rows[a].max_score >= rows[b].max_score
    total = sum(r.n_docs for r in rows.values())
    from aichemy_data_pipelines_spark.catalog import load_table

    assert total == load_table(spark, SF_SMOKE, "documents").count()
    # the 100 TB contract: no single-partition global-sort window
    # (\b: "percentile" — the op's bounded aggregate — contains the
    # substring "ntile")
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bntile\b", plan.lower())
