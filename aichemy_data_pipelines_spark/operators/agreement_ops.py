"""Cross-generator agreement evals — queries that compose OTHER
operators' outputs to watch for drift between interchangeable
implementations. Lives in its own module (rather than inside
ivf.py/dedup.py) deliberately: an eval that imports BOTH generators
would otherwise drag each one's helper closure into the other's
attestation stamps (the _helper_sources transitivity), resetting
attestation age for queries whose behavior never changed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_generator_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-set agreement between the TWO near-dup candidate
    generators — banded-LSH (dedup.dedup_embedding_cosine) and
    IVF-routed (ivf.dedup_embedding_ivf) — as a first-class one-row
    query: the drift alarm a deployment running both paths (banded
    default, IVF past the B clamp / wall budget — BASELINE.md r16
    A/B) watches before trusting either. Precision is 1.0 on both
    sides by construction (exact threshold re-check), so agreement
    here is RECALL overlap: a collapse in either generator moves
    jaccard, and because the oracle nests both committed member
    oracles verbatim (the screens_matrix / ann_recall_eval pattern),
    the eval can never drift from the operators it evaluates.

    Output: (n_banded, n_ivf, n_both, jaccard) — jaccard over the
    emitted (id_a, id_b) pair sets, 6dp.

    Scale: a full-outer equi-join of two OUTPUT-sized pair frames +
    one bounded aggregate on top of the members' own plans.
    """
    from aichemy_data_pipelines_spark.operators.dedup import (
        dedup_embedding_cosine,
    )
    from aichemy_data_pipelines_spark.operators.ivf import (
        dedup_embedding_ivf,
    )

    b = dedup_embedding_cosine(spark, sf_dir).select(
        "id_a", "id_b", F.lit(1).alias("in_b")
    )
    i = dedup_embedding_ivf(spark, sf_dir).select(
        "id_a", "id_b", F.lit(1).alias("in_i")
    )
    return (
        b.join(i, ["id_a", "id_b"], "full_outer")
        .agg(
            F.sum(F.coalesce("in_b", F.lit(0))).cast("long").alias(
                "n_banded"
            ),
            F.sum(F.coalesce("in_i", F.lit(0))).cast("long").alias("n_ivf"),
            F.sum(
                (
                    F.col("in_b").isNotNull() & F.col("in_i").isNotNull()
                ).cast("long")
            )
            .cast("long")
            .alias("n_both"),
        )
        .select(
            "n_banded",
            "n_ivf",
            "n_both",
            F.round(
                F.col("n_both")
                / (F.col("n_banded") + F.col("n_ivf") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


QUERIES = {"dedup_generator_agreement": dedup_generator_agreement}

ORACLE: dict = {}


def _register_oracles() -> None:
    """Nests BOTH committed near-dup oracle texts so the agreement
    eval is computed end-to-end in DuckDB from the same definitions
    the driver checks the members against. Import-time; neither
    member module imports this one, so no cycle exists."""
    from aichemy_data_pipelines_spark.operators.dedup import (
        ORACLE as _DEDUP_ORACLE,
    )
    from aichemy_data_pipelines_spark.operators.ivf import (
        ORACLE as _IVF_ORACLE,
    )

    ORACLE["dedup_generator_agreement"] = f"""
        WITH banded AS ({_DEDUP_ORACLE["dedup_embedding_cosine"]}),
        ivfp AS ({_IVF_ORACLE["dedup_embedding_ivf"]}),
        agg AS (
            SELECT
                (SELECT COUNT(*) FROM banded) AS n_banded,
                (SELECT COUNT(*) FROM ivfp) AS n_ivf,
                (SELECT COUNT(*) FROM banded b
                 JOIN ivfp i ON b.id_a = i.id_a AND b.id_b = i.id_b)
                  AS n_both
        )
        SELECT CAST(n_banded AS BIGINT) AS n_banded,
               CAST(n_ivf AS BIGINT) AS n_ivf,
               CAST(n_both AS BIGINT) AS n_both,
               ROUND(n_both / (n_banded + n_ivf - n_both), 6) AS jaccard
        FROM agg
    """


_register_oracles()
