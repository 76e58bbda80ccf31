"""operators/classifier_ops.py: the trained quality student must
genuinely LEARN its teacher (not collapse to the base rate) and obey
the fixed-depth plan contract. Oracle value-parity at sf0.01 runs via
tests/test_oracle_parity.py like every other query."""

from __future__ import annotations

from aichemy_data_pipelines_spark.operators.classifier_ops import (
    _K,
    docs_quality_classifier,
)
from tests.conftest import SF_SMOKE, SF_ORACLE


def test_classifier_learns_past_base_rate(spark):
    """At sf0.01 the student must beat predicting the majority class
    AND emit BOTH classes — an all-one/all-zero model (the degenerate
    failure of a bad lr/step choice) fails here even though it would
    still hash-match its own oracle."""
    rows = docs_quality_classifier(spark, SF_ORACLE).collect()
    assert len(rows) == 500
    pos = sum(r.label for r in rows)
    base = max(pos, len(rows) - pos) / len(rows)
    acc = sum(1 for r in rows if r.pred == r.label) / len(rows)
    assert acc > base + 0.05, f"acc {acc} vs base rate {base}"
    preds = {r.pred for r in rows}
    assert preds == {0, 1}, f"degenerate predictions: {preds}"
    assert all(0.0 <= r.score <= 1.0 for r in rows)


def test_classifier_plan_is_flat(spark):
    """The training loop must NOT lazy-chain weights through the
    plan: chaining doubles the logical plan per step (measured 380
    parquet scans at 6 steps). With persisted features + driver-held
    literal weights, the RETURNED plan contains exactly the two
    feature derivations (score join + label spine) regardless of
    _STEPS."""
    df = docs_quality_classifier(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    assert n_scans <= 2, f"{n_scans} parquet scans — lineage blowup"
    assert len(plan) < 100_000, "plan size blowup"
    spark.catalog.clearCache()


def test_classifier_weight_update_is_exact_decimal():
    """The driver-side w − LR·g update must be exact Decimal — a
    float update would drift from the oracle's in-SQL decimal
    arithmetic after a few steps."""
    from decimal import Decimal

    w = Decimal(0)
    g = Decimal("0.000000123")
    assert w - 8 * g == Decimal("-0.000000984")
    # scale is preserved (no float contamination)
    assert (w - 8 * g).as_tuple().exponent == -9


def test_feature_space_is_bounded(spark):
    """Feature j ranges over exactly [0, _K+1]: _K hashed buckets +
    length + bias — the gradient aggregate is bounded regardless of
    corpus size."""
    from aichemy_data_pipelines_spark.operators.classifier_ops import (
        _features,
    )

    js = {r.j for r in _features(spark, SF_SMOKE).select("j").distinct().collect()}
    assert js <= set(range(_K + 2))
    assert _K in js and _K + 1 in js  # dense features always present


def test_dense_fold_accumulator_matches_sum_bitwise(spark):
    """_Z_DENSE's row-local fold must reproduce Sum(w*x) BIT-FOR-BIT
    (its docstring's claim, and the oracle's arithmetic). The
    accumulator must sit at decimal(37,18) — the element-product
    type: a decimal(38,18) accumulator widens (38,18)+(37,18) to
    (38,17) under allowPrecisionLoss, rounding every partial sum at
    scale 17 (45/50 rows on this data diverge from Sum by 1e-18 —
    the r14 advisor's repro). A scale-17 z feeds the 9dp sigmoid, so
    any doc whose p flips at the boundary diverges the whole trained
    model from the DuckDB oracle at scale."""
    import decimal
    import random

    from pyspark.sql import functions as F

    from aichemy_data_pipelines_spark.operators.classifier_ops import (
        _Z_DENSE,
        _w_literal,
    )

    rng = random.Random(7)
    k = _K + 2

    def dec9():
        return decimal.Decimal(rng.randrange(-(10**9), 10**9)).scaleb(-9)

    ws = [dec9() for _ in range(k)]
    rows = [
        (i, [dec9() for _ in range(k)]) for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, f"doc_id int, xs array<decimal(18,9)>"
    )
    wlit = _w_literal(ws)
    ref = (
        df.select("doc_id", F.posexplode("xs").alias("j", "x"))
        .withColumn("w", F.expr(wlit)[F.col("j")])
        .groupBy("doc_id")
        .agg(F.sum(F.expr("w * x")).alias("z_ref"))
    )
    got = df.select(
        "doc_id", F.expr(_Z_DENSE.format(ws=wlit)).alias("z_fold")
    )
    bad = (
        ref.join(got, "doc_id")
        .where("cast(z_ref as string) <> cast(z_fold as string)")
        .count()
    )
    assert bad == 0, f"{bad}/50 rows diverge from the Sum aggregate"


def test_langid_logit_fold_matches_sum_bitwise(spark):
    """langid_ops._z_cols carries the same fold; pin its accumulator
    type the same way (one class is enough — the expression template
    is shared across classes)."""
    import decimal
    import random

    from pyspark.sql import functions as F

    from aichemy_data_pipelines_spark.operators import langid_ops

    rng = random.Random(11)
    k = langid_ops._K + 2

    def dec9():
        return decimal.Decimal(rng.randrange(-(10**9), 10**9)).scaleb(-9)

    weights = {
        (c, j): dec9()
        for c in range(langid_ops._N_CLASSES)
        for j in range(k)
    }
    rows = [(i, 0, [dec9() for _ in range(k)]) for i in range(50)]
    df = spark.createDataFrame(
        rows, "doc_id int, y int, xs array<decimal(18,9)>"
    )
    zc = df.select("doc_id", *langid_ops._z_cols(weights))
    from aichemy_data_pipelines_spark.operators.classifier_ops import (
        _w_literal,
    )

    for c in (0, langid_ops._N_CLASSES - 1):
        wlit = _w_literal(weights[(c, j)] for j in range(k))
        ref = (
            df.select("doc_id", F.posexplode("xs").alias("j", "x"))
            .withColumn("w", F.expr(wlit)[F.col("j")])
            .groupBy("doc_id")
            .agg(F.sum(F.expr("w * x")).alias("z_ref"))
        )
        bad = (
            ref.join(zc.select("doc_id", f"z{c}"), "doc_id")
            .where(f"cast(z_ref as string) <> cast(z{c} as string)")
            .count()
        )
        assert bad == 0, f"class {c}: {bad}/50 logits diverge from Sum"
