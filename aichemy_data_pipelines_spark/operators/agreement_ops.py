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



def _set_agreement(b: DataFrame, i: DataFrame, keys: list[str]) -> DataFrame:
    """Shared agreement aggregate: full-outer join two marker frames
    (``in_b`` / ``in_i`` literals) on ``keys`` → one row
    (n_banded, n_ivf, n_both, jaccard). Counts coalesce to 0 OUTSIDE
    the sums too (r16 ADVICE #2: on an empty union the join is EMPTY
    and SUM over zero rows is NULL while the DuckDB twin's scalar
    COUNTs say 0), and jaccard of two empty sets is an explicit NULL
    in lockstep with _SQL_AGREEMENT_TAIL — without the guard the
    empty case is 0/0: an ANSI DIVIDE_BY_ZERO crash here, an
    engine-dependent value in the oracle."""
    return (
        b.join(i, keys, "full_outer")
        .agg(
            F.coalesce(F.sum(F.coalesce("in_b", F.lit(0))), F.lit(0))
            .cast("long")
            .alias("n_banded"),
            F.coalesce(F.sum(F.coalesce("in_i", F.lit(0))), F.lit(0))
            .cast("long")
            .alias("n_ivf"),
            F.coalesce(
                F.sum(
                    (
                        F.col("in_b").isNotNull()
                        & F.col("in_i").isNotNull()
                    ).cast("long")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_both"),
        )
        .select(
            "n_banded",
            "n_ivf",
            "n_both",
            F.when(
                F.col("n_banded") + F.col("n_ivf") - F.col("n_both") > 0,
                F.round(
                    F.col("n_both")
                    / (
                        F.col("n_banded")
                        + F.col("n_ivf")
                        - F.col("n_both")
                    ),
                    6,
                ),
            )
            .otherwise(F.lit(None).cast("double"))
            .alias("jaccard"),
        )
    )


#: the oracle twin of _set_agreement's count/jaccard tail — reads an
#: ``agg(n_banded, n_ivf, n_both)`` CTE
_SQL_AGREEMENT_TAIL = """
        SELECT CAST(n_banded AS BIGINT) AS n_banded,
               CAST(n_ivf AS BIGINT) AS n_ivf,
               CAST(n_both AS BIGINT) AS n_both,
               CASE WHEN n_banded + n_ivf - n_both > 0
                    THEN ROUND(n_both / (n_banded + n_ivf - n_both), 6)
                    ELSE CAST(NULL AS DOUBLE) END AS jaccard
        FROM agg
"""


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
    return _set_agreement(b, i, ["id_a", "id_b"])


def ann_knn_graph_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-set agreement between the TWO k-NN graph generators —
    banded-LSH (similarity.ann_knn_graph) and IVF-routed
    (ivf.ann_knn_graph_ivf) — the graph twin of
    ``dedup_generator_agreement`` (r17, closing the r16 verdict's #1:
    the routed escape existed for near-dup *pairs* but not the top-k
    *graph*, leaving ann_knn_graph alone on the banded tier's
    ~N^1.6 wall / post-clamp recall exposure). Both sides re-rank
    exactly, so disagreement is pure CANDIDATE-ROUTING recall: an
    edge in one set and not the other was never surfaced by the
    other's buckets/probes. A deployment switching the graph to the
    routed generator at scale watches this number first.

    Output: (n_banded, n_ivf, n_both, jaccard) — jaccard over the
    DIRECTED (vec_id, nbr_id) edge sets (rank/cosine excluded: the
    same neighbor at a different rank is still agreement), 6dp;
    NULL on the two-empty-graphs degenerate case.

    Scale: a full-outer equi-join of two OUTPUT-sized (≤ N·k) edge
    frames + one bounded aggregate on top of the members' own plans.
    """
    from aichemy_data_pipelines_spark.operators.ivf import (
        ann_knn_graph_ivf,
    )
    from aichemy_data_pipelines_spark.operators.similarity import (
        ann_knn_graph,
    )

    b = ann_knn_graph(spark, sf_dir).select(
        "vec_id", "nbr_id", F.lit(1).alias("in_b")
    )
    i = ann_knn_graph_ivf(spark, sf_dir).select(
        "vec_id", "nbr_id", F.lit(1).alias("in_i")
    )
    return _set_agreement(b, i, ["vec_id", "nbr_id"])


def ann_graph_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge recall of BOTH k-NN graph generators against the exact
    top-3 neighbors, per query vector — the graph tier's acceptance
    harness as a first-class query (the ann_recall_eval /
    ann_ivf_recall_eval pattern applied to the graph shape): a
    deployment choosing between the banded and routed graph
    generators (BASELINE.md r17 decision rule) reads THIS number at
    its own scale before switching.

    Exact truth is query-bounded (the ann_cosine_topk vectors,
    rk ≤ 3), so the eval adds only a ≤ 3·|Q|-row comparison on top
    of the two generators' own plans; both graph sides restrict to
    the query vectors' edges.

    Output: (query_id, n_exact, banded_hits, routed_hits,
    banded_recall, routed_recall) — 6dp recalls; the oracle nests
    all three committed member oracles verbatim, so the eval can
    never drift from the operators it evaluates.
    """
    from aichemy_data_pipelines_spark.operators.ivf import (
        ann_knn_graph_ivf,
    )
    from aichemy_data_pipelines_spark.operators.similarity import (
        _N_QUERIES,
        ann_cosine_topk,
        ann_knn_graph,
    )

    exact = (
        ann_cosine_topk(spark, sf_dir)
        .where(F.col("rk") <= 3)
        .select("query_id", "cand_id")
    )
    b = (
        ann_knn_graph(spark, sf_dir)
        .where(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("nbr_id").alias("b_hit"),
        )
    )
    i = (
        ann_knn_graph_ivf(spark, sf_dir)
        .where(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("nbr_id").alias("i_hit"),
        )
    )
    return (
        exact.join(
            b,
            (exact.query_id == b.query_id) & (exact.cand_id == b.b_hit),
            "left",
        )
        .drop(b.query_id)
        .join(
            i,
            (exact.query_id == i.query_id) & (exact.cand_id == i.i_hit),
            "left",
        )
        .drop(i.query_id)
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.count("b_hit").cast("long").alias("banded_hits"),
            F.count("i_hit").cast("long").alias("routed_hits"),
            F.round(F.count("b_hit") / F.count("*"), 6).alias(
                "banded_recall"
            ),
            F.round(F.count("i_hit") / F.count("*"), 6).alias(
                "routed_recall"
            ),
        )
    )


QUERIES = {
    "dedup_generator_agreement": dedup_generator_agreement,
    "ann_knn_graph_agreement": ann_knn_graph_agreement,
    "ann_graph_recall_eval": ann_graph_recall_eval,
}

ORACLE: dict = {}


def _register_oracles() -> None:
    """Nests the committed member oracle texts so each agreement
    eval is computed end-to-end in DuckDB from the same definitions
    the driver checks the members against. Import-time; no member
    module imports this one, so no cycle exists. The jaccard CASE
    guard (r16 ADVICE #2) makes the two-empty-sets degenerate case
    an explicit NULL in lockstep with the Spark side instead of an
    engine-dependent 0/0."""
    from aichemy_data_pipelines_spark.operators.dedup import (
        ORACLE as _DEDUP_ORACLE,
    )
    from aichemy_data_pipelines_spark.operators.ivf import (
        ORACLE as _IVF_ORACLE,
    )
    from aichemy_data_pipelines_spark.operators.similarity import (
        ORACLE as _SIM_ORACLE,
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
        {_SQL_AGREEMENT_TAIL}
    """

    from aichemy_data_pipelines_spark.operators.similarity import (
        _N_QUERIES as _NQ,
    )

    ORACLE["ann_graph_recall_eval"] = f"""
        WITH exact_all AS ({_SIM_ORACLE["ann_cosine_topk"]}),
        exact AS (SELECT * FROM exact_all WHERE rk <= 3),
        bg AS (
            SELECT vec_id AS query_id, nbr_id
            FROM ({_SIM_ORACLE["ann_knn_graph"]})
            WHERE vec_id < {_NQ}
        ),
        ig AS (
            SELECT vec_id AS query_id, nbr_id
            FROM ({_IVF_ORACLE["ann_knn_graph_ivf"]})
            WHERE vec_id < {_NQ}
        )
        SELECT e.query_id,
               CAST(COUNT(*) AS BIGINT) AS n_exact,
               CAST(COUNT(b.nbr_id) AS BIGINT) AS banded_hits,
               CAST(COUNT(i.nbr_id) AS BIGINT) AS routed_hits,
               round(COUNT(b.nbr_id) / COUNT(*), 6) AS banded_recall,
               round(COUNT(i.nbr_id) / COUNT(*), 6) AS routed_recall
        FROM exact e
        LEFT JOIN bg b
          ON e.query_id = b.query_id AND e.cand_id = b.nbr_id
        LEFT JOIN ig i
          ON e.query_id = i.query_id AND e.cand_id = i.nbr_id
        GROUP BY e.query_id
    """

    ORACLE["ann_knn_graph_agreement"] = f"""
        WITH banded AS ({_SIM_ORACLE["ann_knn_graph"]}),
        ivfg AS ({_IVF_ORACLE["ann_knn_graph_ivf"]}),
        agg AS (
            SELECT
                (SELECT COUNT(*) FROM banded) AS n_banded,
                (SELECT COUNT(*) FROM ivfg) AS n_ivf,
                (SELECT COUNT(*) FROM banded b
                 JOIN ivfg i ON b.vec_id = i.vec_id
                            AND b.nbr_id = i.nbr_id) AS n_both
        )
        {_SQL_AGREEMENT_TAIL}
    """


_register_oracles()
