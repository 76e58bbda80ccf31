"""IVF-style ANN: coarse quantizer → inverted lists → in-list exact
re-rank. The second classic ANN architecture next to LSH
(operators/similarity.py) — this is the FAISS-IVF shape on
DataFrames.

Stages (all declarative):
1. centroids — per-list (here: the corpus' ``label`` partition, i.e.
   a pre-trained coarse quantizer) per-dimension means, computed with
   EXACT decimal sums and rounded to 6dp so both engines hold
   bit-identical centroid vectors;
2. probe — each query scores all centroids (decimal-exact cosine vs
   the rounded centroids) and keeps its top-2 lists (nprobe=2);
3. search — equi-join query×list → exact cosine re-rank → top-3.

Scale: centroids are a tiny broadcast (n_lists × dim); the only big
join is the probe equi-join on list id with fanout N·nprobe/n_lists;
at 100 TB you train the quantizer once (k-means on a sample) and
this query never changes.

Recall here is bounded by LIST QUALITY: on this synthetic corpus the
``label`` partition is not cosine-cohesive (a query's true nearest
neighbors scatter uniformly across labels), so recall ≈ nprobe /
n_lists (~30% measured at nprobe=2, floor-asserted in
tests/test_similarity.py). With a real k-means quantizer on clustered
data, the same plan delivers the usual IVF recall curve — the knob
is nprobe, the plan does not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.vectors import spark_dot_exact

_N_QUERIES = 10
_NPROBE = 2
_TOP_K = 3
_DIM = 64


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label, per-dimension exact-decimal means, rounded to 6dp,
    reassembled into ordered centroid arrays."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    )
    per_dim = dims.groupBy("label", "pos").agg(
        F.round(
            F.expr(
                "cast(sum(cast(cast(x as double) as decimal(18,12))) as double)"
            )
            / F.count("*"),
            6,
        ).alias("c")
    )
    return per_dim.groupBy("label").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, c))), s -> s.c)"
        ).alias("centroid")
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: nprobe=2 lists per query, exact cosine top-3."""
    e = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    cents = _centroids(spark, sf_dir)

    norm = f"sqrt({spark_dot_exact('embedding', 'embedding')})"
    q = e.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.expr(norm).alias("qn"),
    )
    # probe: score every centroid, keep top-nprobe lists
    cdot = spark_dot_exact("qv", "centroid")
    cnorm = f"sqrt({spark_dot_exact('centroid', 'centroid')})"
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("c_cos"), "label"
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("c_cos", F.round(F.expr(f"{cdot} / (qn * {cnorm})"), 8))
        .withColumn("prk", F.row_number().over(wq))
        .where(F.col("prk") <= _NPROBE)
        .select("query_id", "qv", "qn", "label")
    )
    # search inside the probed lists
    c = e.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        F.expr(norm).alias("cn"),
        "label",
    )
    dot = spark_dot_exact("qv", "cv")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        F.broadcast(probes)
        .join(c, "label")
        .where(F.col("query_id") != F.col("cand_id"))
        .withColumn("cosine", F.round(F.expr(f"{dot} / (qn * cn)"), 8))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_K)
        .select("query_id", "rk", "cand_id", "cosine")
    )


QUERIES = {"ann_ivf_topk": ann_ivf_topk}

_DECD = "CAST(CAST({v} AS DOUBLE) AS DECIMAL(18,12))"


def _sql_pair_cos(a: str, b: str) -> str:
    da, db = _DECD.format(v=a), _DECD.format(v=b)
    return (
        f"round(CAST(SUM({da} * {db}) AS DOUBLE) / "
        f"(sqrt(CAST(SUM({da} * {da}) AS DOUBLE)) * "
        f"sqrt(CAST(SUM({db} * {db}) AS DOUBLE))), 8)"
    )


ORACLE = {
    "ann_ivf_topk": f"""
        WITH dims AS (
            SELECT label, x.pos, x.val FROM (
                SELECT label,
                       unnest(list_transform(embedding,
                              (v, i) -> {{'pos': i - 1, 'val': v}})) AS x
                FROM embeddings)
        ), cent AS (
            SELECT label, pos,
                   round(CAST(SUM(CAST(CAST(val AS DOUBLE)
                                       AS DECIMAL(18,12))) AS DOUBLE)
                         / COUNT(*), 6) AS c
            FROM dims GROUP BY label, pos
        ), cvec AS (
            SELECT label, list(c ORDER BY pos) AS centroid FROM cent
            GROUP BY label
        ), qc AS (
            SELECT q.vec_id AS query_id, cv.label,
                   unnest(q.embedding) AS xa, unnest(cv.centroid) AS xb
            FROM embeddings q, cvec cv WHERE q.vec_id < {_N_QUERIES}
        ), qscore AS (
            SELECT query_id, label, {_sql_pair_cos('xa', 'xb')} AS c_cos
            FROM qc GROUP BY query_id, label
        ), probes AS (
            SELECT query_id, label FROM (
                SELECT query_id, label,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY c_cos DESC, label) AS prk
                FROM qscore) t
            WHERE prk <= {_NPROBE}
        ), pairs AS (
            SELECT p.query_id, c.vec_id AS cand_id,
                   q.embedding AS qv, c.embedding AS cv
            FROM probes p
            JOIN embeddings q ON q.vec_id = p.query_id
            JOIN embeddings c ON c.label = p.label
            WHERE p.query_id <> c.vec_id
        ), expl AS (
            SELECT query_id, cand_id, unnest(qv) AS xa, unnest(cv) AS xb
            FROM pairs
        ), cos AS (
            SELECT query_id, cand_id, {_sql_pair_cos('xa', 'xb')} AS cosine
            FROM expl GROUP BY query_id, cand_id
        )
        SELECT query_id, rk, cand_id, cosine FROM (
            SELECT query_id, cand_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rk
            FROM cos) t
        WHERE rk <= {_TOP_K}
    """,
}
