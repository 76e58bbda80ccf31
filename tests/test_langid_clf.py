"""Langid student-quality pins — the langid_ops module-docstring
claims, asserted: at sf0.01 the trained softmax student must beat the
majority-class base rate against its teacher and keep real minority
(``und``) recall and precision, i.e. it genuinely learns the boundary
instead of collapsing to the dominant class. Measured values (0.934
accuracy vs 0.906 base rate, und recall 18/47, precision 18/22) leave
headroom below the pins."""

from __future__ import annotations

from collections import Counter

from aichemy_data_pipelines_spark.operators.langid_ops import (
    text_langid_classifier,
)

SF_001 = "/root/testdata/sf0.01"


def test_langid_student_beats_base_rate_with_minority_recall(spark):
    rows = text_langid_classifier(spark, SF_001).collect()
    n = len(rows)
    assert n > 0
    acc = sum(r.agree for r in rows) / n
    base_rate = max(Counter(r.teacher_lang for r in rows).values()) / n
    assert acc >= 0.92, f"student accuracy {acc:.3f} under the pin"
    assert acc > base_rate, (
        f"student ({acc:.3f}) must beat the majority-class baseline "
        f"({base_rate:.3f}) — otherwise it learned nothing"
    )
    und_true = [r for r in rows if r.teacher_lang == "und"]
    und_pred = [r for r in rows if r.pred_lang == "und"]
    tp = sum(1 for r in und_true if r.pred_lang == "und")
    assert und_true, "corpus plants und docs by construction"
    assert tp / len(und_true) >= 0.25, (
        f"und recall {tp}/{len(und_true)} collapsed — the class "
        "weight (_UND_WT) is not doing its job"
    )
    assert und_pred and tp / len(und_pred) >= 0.6, (
        f"und precision {tp}/{len(und_pred)} under the pin"
    )
