"""IVF-PQ: the composed FAISS-style ANN index — IVF k-means lists
route each query to nprobe inverted lists (operators/ivf.py), and
candidates inside the probed lists are scored by PQ asymmetric
distance (operators/pq.py) instead of full-dimension arithmetic.

This is the shape a 100 TB vector store actually serves: the coarse
quantizer bounds WHICH vectors are touched (N·nprobe/K of the
corpus), PQ bounds the COST per touched vector (M table lookups on
int codes, the raw vectors never leave storage). Both training
chains are the deterministic k-means recipes of the component
modules, so even the composed index is oracle-checked end-to-end.

Scale: probes and the per-query M×K distance tables are tiny
broadcasts; the corpus-side work is two bounded equi-joins
(list_id fanout N·nprobe/K, then code join fanout M rows/candidate)
and one bounded groupBy. No full-dimension dot product touches the
corpus at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.functions.layout import (
    spread_small_input,
)
from aichemy_data_pipelines_spark.functions.vectors import spark_dot_exact
from aichemy_data_pipelines_spark.operators import ivf as _ivf
from aichemy_data_pipelines_spark.operators import pq as _pq

_N_QUERIES = 10
_NPROBE = 2
_TOP_K = 3


def _probe_lists(
    e: DataFrame, cents: DataFrame, nprobe: int = _NPROBE
) -> DataFrame:
    """(query_id, list_id) nprobe routing — the exact probe set the
    composed index searches; exposed so tests can assert the ADC
    candidates' lists are contained in it."""
    qnorm = f"sqrt({spark_dot_exact('qv', 'qv')})"
    q = e.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cdot = spark_dot_exact("qv", "centroid")
    cnorm = f"sqrt({spark_dot_exact('centroid', 'centroid')})"
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), "list_id")
    return (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "c_cos",
            F.round(
                F.expr(f"try_divide({cdot}, ({qnorm}) * ({cnorm}))"), 8
            ),
        )
        .withColumn("prk", F.row_number().over(wq))
        .where(F.col("prk") <= nprobe)
        .select("query_id", "list_id")
    )


def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nprobe=2 IVF routing + PQ-ADC scoring, top-3 per query.

    Output: (query_id, rk, cand_id, adc_d2), rk by ascending ADC
    distance, ties to lower cand_id; the query itself is excluded.
    """
    # --- IVF side: trained lists + per-query probe set -------------
    k = _ivf.corpus_list_count(spark, sf_dir)
    cents, lists = _ivf._kmeans(spark, sf_dir, k=k)
    e = _ivf.load_table(spark, sf_dir, "embeddings")
    probes = _probe_lists(e, cents, nprobe=_ivf.n_probe(k))

    # --- PQ side: trained codebooks, corpus codes, query tables ----
    subs = _pq._subs(spark, sf_dir).transform(spread_small_input)
    # r15: driver-trained literal codebook over the bounded sample
    pq_cents = _pq.train_codebook(spark, sf_dir)
    codes = _pq._assign(subs, pq_cents).select(
        F.col("vec_id").alias("cand_id"), "s", "code"
    )
    dtab = (
        subs.where(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "s", "sub")
        .join(F.broadcast(pq_cents), "s")
        .select(
            "query_id",
            "s",
            F.col("cid").alias("code"),
            F.expr(_pq._d2("sub", "cent")).alias("d2"),
        )
    )

    # --- compose: probed candidates scored by ADC ------------------
    cand = (
        F.broadcast(probes)
        .join(lists.select("vec_id", "list_id"), "list_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "cand_id")
    return (
        cand.join(codes, "cand_id")
        .join(F.broadcast(dtab), ["query_id", "s", "code"])
        .groupBy("query_id", "cand_id")
        .agg(
            F.expr(
                "sum(cast(round(d2 * 100000000) as bigint)) / 100000000"
            ).alias("adc_d2")
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_K)
        .select("query_id", "rk", "cand_id", "adc_d2")
    )


def _residual_subs(vec_col: str) -> str:
    """Subspace slices of a residual array column (Spark dialect)."""
    return (
        f"transform(sequence(0, {_pq._M - 1}), "
        f"s -> slice({vec_col}, s * {_pq._SUBDIM} + 1, {_pq._SUBDIM}))"
    )


#: vector − assigned coarse centroid, per dim (deterministic IEEE
#: double subtraction in both engines) — ONE definition for the
#: corpus, training-sample and query sides, so the three residual
#: derivations cannot drift apart
_RESIDUAL_EXPR = (
    "zip_with({vec}, centroid, (x, c) -> cast(x as double) - c)"
)


def ann_ivf_pq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the actual FAISS IVFPQ
    layout: each vector is PQ-coded as (vector − its coarse
    centroid), so the codebooks spend their bits on the
    within-list displacement instead of re-describing the coarse
    position the list id already carries; at query time the ADC
    table is built per probed list from the QUERY's residual
    against that list's centroid, so distances compare residuals in
    the same frame. Identical ADC shape to ann_ivf_pq_topk (M table
    lookups per candidate), better codes at the same bit budget.

    Residuals are plain double subtraction (deterministic IEEE in
    both engines); the PQ chain then rides the existing
    exact-decimal recipe unchanged, so even the residual training
    is oracle-checked. Scale: residual computation is a pure map
    over the assignment join (centroids broadcast); the per-query
    ADC tables grow nprobe× (one per probed list) but stay
    |Q|·nprobe·M·K rows — still a tiny broadcast.

    Output: (query_id, rk, cand_id, adc_d2), rk by ascending ADC
    distance over residual codes, ties to lower cand_id.
    """
    k = _ivf.corpus_list_count(spark, sf_dir)
    cents, lists = _ivf._kmeans(spark, sf_dir, k=k)
    e = _ivf.load_table(spark, sf_dir, "embeddings")
    probes = _probe_lists(e, cents, nprobe=_ivf.n_probe(k))

    # corpus residuals vs the assigned coarse centroid, sliced into
    # the M subspaces (one pure-map stage; centroids broadcast)
    resid = (
        lists.join(F.broadcast(cents), "list_id")
        .select(
            "vec_id",
            F.expr(_RESIDUAL_EXPR.format(vec="embedding")).alias("rvec"),
        )
        .transform(spread_small_input)
    )
    rsubs = resid.select(
        "vec_id",
        F.posexplode(F.expr(_residual_subs("rvec"))).alias("s", "sub"),
    )

    # PQ training on the residual sample (r15, driver Lloyd): the
    # md5-leading _TRAIN_PER_CODE·_K vectors' RESIDUALS collect
    # (bounded at any corpus size) and train in the driver via the
    # same engine-bit-identical arithmetic as the raw chain
    sample = (
        lists.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h")
        .limit(_pq._TRAIN_PER_CODE * _pq._K)
        .join(F.broadcast(cents), "list_id")
        .select(
            "h",
            F.expr(_RESIDUAL_EXPR.format(vec="embedding")).alias("rvec"),
        )
        .collect()
    )
    pq_cents = _pq._cents_frame(
        spark,
        _pq._pq_lloyd_py([(r.h, list(r.rvec)) for r in sample]),
    )
    codes = _pq._assign(rsubs, pq_cents).select(
        F.col("vec_id").alias("cand_id"), "s", "code"
    )

    # per-(query, probed list) residual → M×K ADC table (broadcast)
    qres = (
        probes.join(
            e.where(F.col("vec_id") < _N_QUERIES).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qv"),
            ),
            "query_id",
        )
        .join(F.broadcast(cents), "list_id")
        .select(
            "query_id",
            "list_id",
            F.expr(_RESIDUAL_EXPR.format(vec="qv")).alias("rvec"),
        )
    )
    qsubs = qres.select(
        "query_id",
        "list_id",
        F.posexplode(F.expr(_residual_subs("rvec"))).alias("s", "sub"),
    )
    dtab = qsubs.join(F.broadcast(pq_cents), "s").select(
        "query_id",
        "list_id",
        "s",
        F.col("cid").alias("code"),
        F.expr(_pq._d2("sub", "cent")).alias("d2"),
    )

    cand = (
        F.broadcast(probes)
        .join(lists.select("vec_id", "list_id"), "list_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "list_id", F.col("vec_id").alias("cand_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "cand_id")
    return (
        cand.join(codes, "cand_id")
        .join(F.broadcast(dtab), ["query_id", "list_id", "s", "code"])
        .groupBy("query_id", "cand_id")
        .agg(
            F.expr(
                "sum(cast(round(d2 * 100000000) as bigint)) / 100000000"
            ).alias("adc_d2")
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_K)
        .select("query_id", "rk", "cand_id", "adc_d2")
    )


QUERIES = {
    "ann_ivf_pq_topk": ann_ivf_pq_topk,
    "ann_ivf_pq_residual_topk": ann_ivf_pq_residual_topk,
}

# IVF training chain with i-prefixed CTE names so it can share one
# WITH clause with the PQ training chain (both canonically use
# seeds/cent0/a1/cent1). K and the training sample are in-plan, in
# lockstep with ivf._KMEANS_CTES.
_IVF_CTES = f"""ink AS ({_ivf._SQL_NK}), iranked AS (
            SELECT vec_id, embedding,
                   md5(CAST(vec_id AS VARCHAR)) AS h,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR))) AS rn
            FROM embeddings
        ), iseeds AS (
            SELECT h, embedding FROM iranked, ink WHERE rn <= ink.k
        ), itrain AS (
            SELECT vec_id, embedding FROM iranked, ink
            WHERE rn <= ink.k * {_ivf._TRAIN_PER_LIST}
        ), icent0 AS (
            SELECT row_number() OVER (ORDER BY h) AS list_id,
                   list_transform(embedding,
                                  x -> round(CAST(x AS DOUBLE), 6)) AS centroid
            FROM iseeds
        ), {_ivf._sql_assign_ctes('icent0', 'ia1', src='itrain')},
        {_ivf._sql_mean_ctes('ia1', 'icent1')},
        {_ivf._sql_assign_ctes('icent1', 'ia2', src='itrain')},
        {_ivf._sql_mean_ctes('ia2', 'icent2')},
        {_ivf._sql_assign_ctes('icent2', 'ilists')}"""

ORACLE = {
    "ann_ivf_pq_topk": f"""
        WITH {_IVF_CTES},
        {_pq._PQ_TRAIN_CTES},
        {_pq._sql_assign_ctes("cent1", "a2")},
        qc AS (
            SELECT q.vec_id AS query_id, cv.list_id,
                   unnest(q.embedding) AS xa, unnest(cv.centroid) AS xb
            FROM embeddings q, icent2 cv WHERE q.vec_id < {_N_QUERIES}
        ), qscore AS (
            SELECT query_id, list_id,
                   {_ivf._sql_pair_cos('xa', 'xb')} AS c_cos
            FROM qc GROUP BY query_id, list_id
        ), probes AS (
            SELECT query_id, list_id FROM (
                SELECT query_id, list_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY c_cos DESC, list_id) AS prk
                FROM qscore) t, ink nk
            WHERE prk <= {_ivf._SQL_NPROBE}
        ), dtab_x AS (
            SELECT sb.vec_id AS query_id, sb.s, c.cid AS code,
                   unnest(sb.sub) AS xa, unnest(c.cent) AS xb
            FROM subs sb JOIN cent1 c ON sb.s = c.s
            WHERE sb.vec_id < {_N_QUERIES}
        ), dtab AS (
            SELECT query_id, s, code, {_pq._sql_d2()} AS d2
            FROM dtab_x GROUP BY query_id, s, code
        ), cand AS (
            SELECT p.query_id, l.vec_id AS cand_id
            FROM probes p JOIN ilists l ON l.list_id = p.list_id
            WHERE p.query_id <> l.vec_id
        ), adc AS (
            SELECT c.query_id, c.cand_id,
                   SUM(CAST(round(d.d2 * 100000000) AS BIGINT))
                     / 100000000 AS adc_d2
            FROM cand c
            JOIN a2 a ON a.vec_id = c.cand_id
            JOIN dtab d ON d.query_id = c.query_id
                       AND d.s = a.s AND d.code = a.code
            GROUP BY c.query_id, c.cand_id
        )
        SELECT query_id, rk, cand_id, adc_d2 FROM (
            SELECT query_id, cand_id, adc_d2,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc_d2, cand_id) AS rk
            FROM adc) t
        WHERE rk <= {_TOP_K}
    """,
}


# Residual IVF-PQ oracle: the PQ training tail (seeds→cent0→a1→cent1
# over the CTE named ``subs``) is pq._SQL_TRAIN_TAIL verbatim — here
# ``subs`` holds coarse-RESIDUAL slices, so even the residual
# codebook training is oracle-checked. Residuals are plain double
# subtraction (deterministic IEEE in both engines); DuckDB lists are
# 1-indexed, hence centroid[pos + 1].
_SQL_UNNEST_POSVAL = (
    "unnest(list_transform(embedding, "
    "(v, i) -> {'pos': i - 1, 'val': v})) AS x"
)

ORACLE["ann_ivf_pq_residual_topk"] = f"""
        WITH {_IVF_CTES},
        resid_d AS (
            SELECT l.vec_id, l.list_id, x.pos,
                   CAST(x.val AS DOUBLE) - c.centroid[x.pos + 1] AS rv
            FROM ilists l
            JOIN (SELECT vec_id, {_SQL_UNNEST_POSVAL}
                  FROM embeddings) e ON e.vec_id = l.vec_id
            JOIN icent2 c ON c.list_id = l.list_id
        ), resid AS (
            SELECT vec_id, list(rv ORDER BY pos) AS rvec
            FROM resid_d GROUP BY vec_id, list_id
        ), subs AS (
            SELECT vec_id, s,
                   rvec[s * {_pq._SUBDIM} + 1 : s * {_pq._SUBDIM}
                        + {_pq._SUBDIM}] AS sub
            FROM resid,
                 unnest([{", ".join(str(s) for s in range(_pq._M))}])
                   AS t(s)
        ), {_pq._SQL_TRAIN_TAIL},
        {_pq._sql_assign_ctes("cent1", "a2")},
        qc AS (
            SELECT q.vec_id AS query_id, cv.list_id,
                   unnest(q.embedding) AS xa, unnest(cv.centroid) AS xb
            FROM embeddings q, icent2 cv WHERE q.vec_id < {_N_QUERIES}
        ), qscore AS (
            SELECT query_id, list_id,
                   {_ivf._sql_pair_cos('xa', 'xb')} AS c_cos
            FROM qc GROUP BY query_id, list_id
        ), probes AS (
            SELECT query_id, list_id FROM (
                SELECT query_id, list_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY c_cos DESC, list_id) AS prk
                FROM qscore) t, ink nk
            WHERE prk <= {_ivf._SQL_NPROBE}
        ), qresid_d AS (
            SELECT p.query_id, p.list_id, x.pos,
                   CAST(x.val AS DOUBLE) - c.centroid[x.pos + 1] AS rv
            FROM probes p
            JOIN (SELECT vec_id, {_SQL_UNNEST_POSVAL}
                  FROM embeddings) e ON e.vec_id = p.query_id
            JOIN icent2 c ON c.list_id = p.list_id
        ), qresid AS (
            SELECT query_id, list_id, list(rv ORDER BY pos) AS rvec
            FROM qresid_d GROUP BY query_id, list_id
        ), qsubs AS (
            SELECT query_id, list_id, s,
                   rvec[s * {_pq._SUBDIM} + 1 : s * {_pq._SUBDIM}
                        + {_pq._SUBDIM}] AS sub
            FROM qresid,
                 unnest([{", ".join(str(s) for s in range(_pq._M))}])
                   AS t(s)
        ), dtab_x AS (
            SELECT q.query_id, q.list_id, q.s, c.cid AS code,
                   unnest(q.sub) AS xa, unnest(c.cent) AS xb
            FROM qsubs q JOIN cent1 c ON q.s = c.s
        ), dtab AS (
            SELECT query_id, list_id, s, code, {_pq._sql_d2()} AS d2
            FROM dtab_x GROUP BY query_id, list_id, s, code
        ), cand AS (
            SELECT p.query_id, p.list_id, l.vec_id AS cand_id
            FROM probes p JOIN ilists l ON l.list_id = p.list_id
            WHERE p.query_id <> l.vec_id
        ), adc AS (
            SELECT c.query_id, c.cand_id,
                   SUM(CAST(round(d.d2 * 100000000) AS BIGINT))
                     / 100000000 AS adc_d2
            FROM cand c
            JOIN a2 a ON a.vec_id = c.cand_id
            JOIN dtab d ON d.query_id = c.query_id
                       AND d.list_id = c.list_id
                       AND d.s = a.s AND d.code = a.code
            GROUP BY c.query_id, c.cand_id
        )
        SELECT query_id, rk, cand_id, adc_d2 FROM (
            SELECT query_id, cand_id, adc_d2,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc_d2, cand_id) AS rk
            FROM adc) t
        WHERE rk <= {_TOP_K}
    """
