"""Product quantization (PQ) for the embedding store: split each
64-dim vector into M=4 subspaces of 16 dims, train a K=4-centroid
codebook per subspace with the same deterministic k-means used by the
IVF coarse quantizer (operators/ivf.py), and encode every vector as
M small codes — the FAISS-PQ storage/ANN tier (IVF = routing, SQ8 =
linear compression, PQ = codebook compression; together the standard
triad).

Compression: 4 codes × 2 bits of codebook id here (toy K; production
K=256 → 4 bytes/vector vs 256 — a 64× cut). ADC search then scores
candidates from M table lookups instead of a 64-dim dot product.

Determinism (same recipe as ivf.py, so even TRAINING is
oracle-checked): seeds are the K vectors with smallest md5(vec_id);
assignment minimizes the exact-decimal L2² (computed as
``d(a,a) - 2·d(a,b) + d(b,b)`` from portable decimal dots, rounded to
8dp, ties to the lower code); one unrolled Lloyd step recomputes
centroids as exact-decimal 6dp means.

Scale: training (r15) is genuinely sample-bounded — the md5-leading
_TRAIN_PER_CODE·_K vectors collect to the driver and Lloyd runs
there with engine-bit-identical arithmetic (train_codebook /
_pq_lloyd_py; the ivf.py r15 recipe), where the pre-r15 chain's
training MEAN folded every corpus subvector per step; codebooks are
M×K rows — a literal. Encoding is the only corpus-scale stage: per
(vector, subspace) a K-way broadcast scoring + one bounded
groupBy(vec_id) to reassemble codes (M values per key). At 100 TB
the codebooks ship as literals and encoding is a pure map over the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.layout import (
    freeze_small,
    spread_small_input,
)
from aichemy_data_pipelines_spark.functions.vectors import (
    spark_dot_exact,
    sql_dot_exact,
)

_M = 4  # subspaces
_SUBDIM = 16  # dims per subspace (64-dim embeddings)
_K = 4  # centroids per sub-codebook
# r15: codebooks train on the md5-leading _TRAIN_PER_CODE·_K vector
# sample (the FAISS per-subquantizer training discipline; the ivf.py
# r15 recipe one tier down) — the training mean previously folded
# EVERY corpus subvector, a full-corpus decimal aggregate per Lloyd
# step at any scale. The sample is collected and Lloyd runs in the
# driver with engine-bit-identical arithmetic (ivf._q12/_jvm_round);
# encoding still covers the full corpus. Oracles compute the same
# sample in-plan (pranked/tsubs CTEs).
_TRAIN_PER_CODE = 64  # 64·4 = 256 training vectors


def _subs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long form (vec_id, label, s, sub): one row per subspace slice."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_M - 1}), "
                f"s -> slice(embedding, s * {_SUBDIM} + 1, {_SUBDIM}))"
            )
        ).alias("s", "sub"),
    )


def _d2(a: str, b: str) -> str:
    """Portable L2² from three exact-decimal dots (see module doc)."""
    return (
        f"round({spark_dot_exact(a, a)} - 2 * {spark_dot_exact(a, b)} "
        f"+ {spark_dot_exact(b, b)}, 8)"
    )


def _assign(subs: DataFrame, cents: DataFrame) -> DataFrame:
    """Min-L2 code per (vec_id, s), ties to the lower code id.

    The self-dots of ``_d2`` are precomputed once per subvector / per
    centroid instead of per (subvector, centroid) PAIR — the decimal
    aggregate HOF is interpreted BigDecimal work and dominated encode
    cost. Identical values: same dots, same (aa − 2·ab) + bb
    association, same 8dp round."""
    ab = spark_dot_exact("sub", "cent")
    sa = subs.withColumn("aa", F.expr(spark_dot_exact("sub", "sub")))
    ca = cents.withColumn("bb", F.expr(spark_dot_exact("cent", "cent")))
    w = Window.partitionBy("vec_id", "s").orderBy("d2", "cid")
    return (
        sa.join(F.broadcast(ca), "s")
        .withColumn("d2", F.expr(f"round(aa - 2 * ({ab}) + bb, 8)"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        # pass the input columns through unchanged (label-carrying
        # for the raw-vector chain, label-less for the r15 residual
        # chain in ivfpq.py) + the winning code
        .select(*subs.columns, F.col("cid").alias("code"))
    )


def _mean_cents(assign: DataFrame) -> DataFrame:
    """Per-(subspace, code) 6dp exact-decimal mean centroids."""
    dims = assign.select(
        "s", "code", F.posexplode("sub").alias("pos", "x")
    )
    per_dim = dims.groupBy("s", "code", "pos").agg(
        F.round(
            F.expr(
                "cast(sum(cast(cast(x as double) as decimal(18,12))) as double)"
            )
            / F.count("*"),
            6,
        ).alias("c")
    )
    return per_dim.groupBy("s", F.col("code").alias("cid")).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, c))), p -> p.c)"
        ).alias("cent")
    )


def embeddings_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the M sub-codebooks (deterministic k-means, 1 Lloyd
    step) and encode every vector as its M PQ codes.

    Output: (vec_id, label, codes string) — codes the M PQ codes
    comma-joined (stringified because the driver's pandas
    canonicalizer cannot sort/hash array columns — r04 red row).
    """
    subs = _subs(spark, sf_dir).transform(spread_small_input)
    # r15: driver-trained literal codebook over the bounded sample
    # (see the _TRAIN_PER_CODE constants note)
    cents = train_codebook(spark, sf_dir)
    coded = _assign(subs, cents)
    return coded.groupBy("vec_id", "label").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(s, code))), p -> cast(p.code as string)), ',')"
        ).alias("codes")
    )


_N_QUERIES = 10
_ADC_TOP_K = 3


def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC (asymmetric distance computation) search over the PQ
    codes: each query precomputes an M×K distance table against the
    sub-codebooks; a candidate's approximate L2² is then the SUM of M
    table lookups — no full-dimension arithmetic per pair.

    Scale: the distance tables are |Q|×M×K rows (tiny, broadcast);
    the corpus-side work is an equi-join of the code table (M rows
    per vector, integer keys) with the broadcast tables + a bounded
    groupBy — exactly how a 100 TB PQ index serves queries. Exact
    re-rank of the ADC top-k (ivf.py's shape) is the optional tail.

    Output: (query_id, rk, cand_id, adc_d2), rk by ascending ADC
    distance, ties to lower cand_id.
    """
    subs = _subs(spark, sf_dir).transform(spread_small_input)
    # r15: driver-trained literal codebook over the bounded sample
    cents = train_codebook(spark, sf_dir)
    codes = _assign(subs, cents).select("vec_id", "s", "code")

    # per-query M×K distance table (broadcast)
    dtab = (
        subs.where(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "s", "sub")
        .join(F.broadcast(cents), "s")
        .select(
            "query_id",
            "s",
            F.col("cid").alias("code"),
            F.expr(_d2("sub", "cent")).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "cand_id")
    return (
        codes.withColumnRenamed("vec_id", "cand_id")
        .join(F.broadcast(dtab), ["s", "code"])
        .where(F.col("query_id") != F.col("cand_id"))
        .groupBy("query_id", "cand_id")
        # integer-1e8ths sum: the M components are 8dp-rounded, so
        # scaling to bigint makes the sum exact and order-independent
        .agg(
            F.expr(
                "sum(cast(round(d2 * 100000000) as bigint)) / 100000000"
            ).alias("adc_d2")
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _ADC_TOP_K)
        .select("query_id", "rk", "cand_id", "adc_d2")
    )


QUERIES = {
    "embeddings_pq_encode": embeddings_pq_encode,
    "ann_pq_adc_topk": ann_pq_adc_topk,
}


def _sql_d2() -> str:
    return (
        f"round({sql_dot_exact('xa', 'xa')} - 2 * {sql_dot_exact('xa', 'xb')} "
        f"+ {sql_dot_exact('xb', 'xb')}, 8)"
    )


def _sql_assign_ctes(cent: str, out: str, src: str = "subs") -> str:
    """Emit ``{out}(vec_id, s, code)`` assigning each subvector of
    ``{src}`` to its min-L2 centroid in ``{cent}(s, cid, cent)``."""
    return f"""{out}_x AS (
            SELECT sb.vec_id, sb.s, c.cid,
                   unnest(sb.sub) AS xa, unnest(c.cent) AS xb
            FROM {src} sb JOIN {cent} c ON sb.s = c.s
        ), {out}_d AS (
            SELECT vec_id, s, cid, {_sql_d2()} AS d2
            FROM {out}_x GROUP BY vec_id, s, cid
        ), {out} AS (
            SELECT vec_id, s, cid AS code FROM (
                SELECT vec_id, s, cid,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY d2, cid) AS rk
                FROM {out}_d) t
            WHERE rk = 1
        )"""


_SQL_MEAN_CTES = """m_p AS (
            SELECT a.s, a.code AS cid, x.pos,
                   round(CAST(SUM(CAST(CAST(x.val AS DOUBLE)
                                       AS DECIMAL(18,12))) AS DOUBLE)
                         / COUNT(*), 6) AS c
            FROM a1 a JOIN (
                SELECT vec_id, s,
                       unnest(list_transform(sub,
                              (v, i) -> {'pos': i - 1, 'val': v})) AS x
                FROM tsubs) sb ON sb.vec_id = a.vec_id AND sb.s = a.s
            GROUP BY a.s, a.code, x.pos
        ), cent1 AS (
            SELECT s, cid, list(c ORDER BY pos) AS cent FROM m_p
            GROUP BY s, cid
        )"""


# training tail (sample → seeds → cent0 → a1 Lloyd → cent1) over
# whatever frame the WITH clause names ``subs`` — raw-vector slices
# here, coarse-residual slices in ivfpq's r15 residual index. The
# r15 training sample (pranked/tsubs: the md5-leading
# _TRAIN_PER_CODE·_K vectors) is computed in-plan, in lockstep with
# the Spark side's driver-collected sample.
_SQL_TRAIN_TAIL = f"""pranked AS (
            SELECT vec_id,
                   row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR))) AS rn
            FROM embeddings
        ), tsubs AS (
            SELECT sb.* FROM subs sb
            JOIN pranked p ON p.vec_id = sb.vec_id
            WHERE p.rn <= {_TRAIN_PER_CODE * _K}
        ), seeds AS (
            SELECT md5(CAST(vec_id AS VARCHAR)) AS h, vec_id
            FROM embeddings ORDER BY h LIMIT {_K}
        ), seedids AS (
            SELECT row_number() OVER (ORDER BY h) - 1 AS cid, vec_id
            FROM seeds
        ), cent0 AS (
            SELECT sb.s, sd.cid,
                   list_transform(sb.sub,
                                  x -> round(CAST(x AS DOUBLE), 6)) AS cent
            FROM seedids sd JOIN subs sb ON sb.vec_id = sd.vec_id
        ), {_sql_assign_ctes("cent0", "a1", src="tsubs")},
        {_SQL_MEAN_CTES}"""

# shared training chain: subs → seeds → cent0 → a1 (Lloyd) → cent1
_PQ_TRAIN_CTES = f"""subs AS (
            SELECT vec_id, label, s,
                   embedding[s * {_SUBDIM} + 1 : s * {_SUBDIM} + {_SUBDIM}]
                     AS sub
            FROM embeddings,
                 unnest([{", ".join(str(s) for s in range(_M))}]) AS t(s)
        ), {_SQL_TRAIN_TAIL}"""


ORACLE = {
    "ann_pq_adc_topk": f"""
        WITH {_PQ_TRAIN_CTES},
        {_sql_assign_ctes("cent1", "a2")},
        dtab_x AS (
            SELECT sb.vec_id AS query_id, sb.s, c.cid AS code,
                   unnest(sb.sub) AS xa, unnest(c.cent) AS xb
            FROM subs sb JOIN cent1 c ON sb.s = c.s
            WHERE sb.vec_id < {_N_QUERIES}
        ), dtab AS (
            SELECT query_id, s, code, {_sql_d2()} AS d2
            FROM dtab_x GROUP BY query_id, s, code
        ), adc AS (
            SELECT d.query_id, a.vec_id AS cand_id,
                   SUM(CAST(round(d.d2 * 100000000) AS BIGINT))
                     / 100000000 AS adc_d2
            FROM a2 a JOIN dtab d ON d.s = a.s AND d.code = a.code
            WHERE d.query_id <> a.vec_id
            GROUP BY d.query_id, a.vec_id
        )
        SELECT query_id, rk, cand_id, adc_d2 FROM (
            SELECT query_id, cand_id, adc_d2,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc_d2, cand_id) AS rk
            FROM adc) t
        WHERE rk <= {_ADC_TOP_K}
    """,
    "embeddings_pq_encode": f"""
        WITH {_PQ_TRAIN_CTES},
        {_sql_assign_ctes("cent1", "a2")}
        SELECT e.vec_id, e.label,
               string_agg(CAST(a.code AS VARCHAR), ',' ORDER BY a.s)
                 AS codes
        FROM a2 a JOIN embeddings e ON e.vec_id = a.vec_id
        GROUP BY e.vec_id, e.label
    """,
}


def _pq_lloyd_py(sample: list) -> list:
    """Driver Lloyd for the PQ codebooks over the md5-ordered sample
    [(h, [vector floats])] — returns [(s, cid, [cent doubles])]
    identical to the in-cluster chain (seeds → one Lloyd step →
    6dp means), by the ivf._lloyd_py exactness recipe: scale-12
    decimals as ints, exact int dots, correctly-rounded
    decimal→double (int/int true division), JVM shortest-repr
    HALF_UP rounding. d2 replicates _d2: the three exact dots cast
    to double FIRST, then IEEE double (aa − 2·ab + bb), then
    round(·, 8); ties to the lower cid. A cid whose cluster empties
    drops from the codebook (the groupBy semantics)."""
    from aichemy_data_pipelines_spark.operators.ivf import (
        _jvm_round,
        _q12,
    )

    ordered = sorted(sample, key=lambda t: t[0])
    vecs = [[float(x) for x in emb] for _, emb in ordered]
    subs = [
        [v[s * _SUBDIM : (s + 1) * _SUBDIM] for s in range(_M)]
        for v in vecs
    ]
    q = [[[_q12(x) for x in sub] for sub in v] for v in subs]

    out = []
    for s in range(_M):
        cents = [
            (cid, [float(_jvm_round(x, 6)) for x in subs[cid][s]])
            for cid in range(min(_K, len(vecs)))
        ]
        cq = [
            (cid, [_q12(x) for x in c], None) for cid, c in cents
        ]
        cq = [
            (cid, ci, sum(a * a for a in ci)) for cid, ci, _ in cq
        ]
        members: dict = {}
        for i in range(len(q)):
            qi = q[i][s]
            aa = sum(a * a for a in qi) / 10**24
            best = None  # (d2_decimal, cid)
            for cid, ci, bb_int in cq:
                ab = sum(a * b for a, b in zip(qi, ci)) / 10**24
                bb = bb_int / 10**24
                d2 = _jvm_round(aa - 2 * ab + bb, 8)
                if best is None or (d2, cid) < best:
                    best = (d2, cid)
            members.setdefault(best[1], []).append(i)
        for cid in sorted(members):
            idxs = members[cid]
            c = []
            for pos in range(_SUBDIM):
                ssum = sum(q[i][s][pos] for i in idxs)
                m = (ssum / 10**12) / len(idxs)
                c.append(float(_jvm_round(m, 6)))
            out.append((s, cid, c))
    return out


def train_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained PQ codebook as a literal (s, cid, cent) frame —
    driver Lloyd over the collected md5-leading _TRAIN_PER_CODE·_K
    sample (bounded at any corpus size)."""
    e = load_table(spark, sf_dir, "embeddings")
    rows = (
        e.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h")
        .limit(_TRAIN_PER_CODE * _K)
        .select("h", "embedding")
        .collect()
    )
    return _cents_frame(
        spark, _pq_lloyd_py([(r.h, list(r.embedding)) for r in rows])
    )


def _cents_frame(spark: SparkSession, rows: list) -> DataFrame:
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    return spark.createDataFrame(
        rows,
        StructType(
            [
                StructField("s", IntegerType(), False),
                StructField("cid", IntegerType(), False),
                StructField("cent", ArrayType(DoubleType()), False),
            ]
        ),
    )


def _train_codebook_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The in-cluster reference chain over the SAME training sample —
    retained only for the driver-parity pin
    (tests/test_similarity.py::test_pq_driver_lloyd_matches_spark);
    not on any query path."""
    e = load_table(spark, sf_dir, "embeddings")
    tids = (
        e.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h")
        .limit(_TRAIN_PER_CODE * _K)
        .select("vec_id")
    )
    subs = _subs(spark, sf_dir).transform(spread_small_input)
    tsubs = subs.join(tids, "vec_id")
    seeds = (
        e.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h")
        .limit(_K)
        .select(
            (F.row_number().over(Window.orderBy("h")) - 1).alias("cid"),
            "vec_id",
        )
    )
    cent0 = tsubs.join(seeds, "vec_id").select(
        "s",
        "cid",
        F.expr("transform(sub, x -> round(cast(x as double), 6))").alias(
            "cent"
        ),
    )
    return freeze_small(_mean_cents(_assign(tsubs, cent0)))
