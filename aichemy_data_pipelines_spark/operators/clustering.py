"""Near-duplicate clustering: connected components over the LSH
candidate graph — the step that turns pairwise near-dup hits into
keep-one-per-group decisions for a training corpus.

Algorithm (Spark-first iterative min-label propagation, the core of
GraphX/GraphFrames connected components):

1. nodes = all documents, label = own doc_id;
2. edges = LSH candidate pairs with exact Jaccard ≥ threshold
   (operators/dedup.py), symmetrized;
3. repeat: every node takes min(own label, neighbors' labels) until a
   fixpoint — the loop is a DRIVER loop over a handful of iterations
   (graph diameter), not over data; each iteration is one shuffle on
   doc_id.

The DuckDB oracle computes the same components with a recursive CTE
(transitive closure + min reachable), so even this iterative
operator is value-checked, not just rows-counted.

Scale: per iteration one equi-join + one agg on doc_id; iterations =
near-dup cluster diameter, which for dedup graphs is tiny (chains of
near-identical docs). For web-scale graphs swap in the
large-star/small-star variant — same join shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.operators.dedup import (
    _SQL_LSH_PAIRS,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
)

_JACCARD_MIN = 0.5
_MAX_ITERS = 20


def _make_ckpt(spark: SparkSession, reliable_dir: str | None):
    """Per-round lineage cut for the iterative loops.

    Default: ``localCheckpoint`` — executor-storage-backed, zero
    infra, right for local/bench runs.  Scale: on a 1000-executor
    cluster a LOST EXECUTOR forfeits its localCheckpoint blocks and
    the whole iteration (no lineage left to recompute from) — pass
    ``reliable_dir`` (HDFS/S3 path) to use reliable ``checkpoint()``
    to durable storage instead, which survives executor loss at the
    cost of a write per round.

    Lifecycle contract for ``reliable_dir``: the CALLER owns it.
    Spark does not delete reliable checkpoints unless
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (off
    by default), and each iteration writes one corpus-scale copy —
    delete the dir after the result is materialized, or point
    recurring runs at a dated path they vacuum.  The session's
    previous checkpoint dir is restored by ``_restore_ckpt_dir`` so
    the setting doesn't leak into unrelated jobs in the session.
    """
    if reliable_dir is None:
        return lambda df: df.localCheckpoint()
    spark.sparkContext.setCheckpointDir(reliable_dir)
    return lambda df: df.checkpoint(eager=True)


def _prev_ckpt_dir(spark: SparkSession) -> str | None:
    opt = spark.sparkContext._jsc.sc().getCheckpointDir()  # noqa: SLF001
    return opt.get() if opt.isDefined() else None


def _restore_ckpt_dir(spark: SparkSession, prev: str | None) -> None:
    """Put back the caller's checkpoint dir (session-global state).
    An unset dir cannot be restored to None through the public API;
    leaving ours in place then is harmless for correctness but noted
    in _make_ckpt's contract."""
    if prev is not None:
        spark.sparkContext.setCheckpointDir(prev)


def dedup_clusters(
    spark: SparkSession,
    sf_dir: str,
    reliable_dir: str | None = None,
) -> DataFrame:
    """Connected components over jaccard≥0.5 LSH pairs; every doc
    gets a cluster id (= min doc_id in its component; singletons are
    their own cluster) and the cluster size.

    ``reliable_dir``: durable checkpoint location for cluster runs —
    see ``_make_ckpt`` (localCheckpoint default dies with a lost
    executor mid-iteration)."""
    # the label-propagation loop runs many small shuffles; a caller
    # session's default 200 partitions would mean 200 tiny tasks per
    # iteration — pin to the session's core count for this job, and
    # restore the caller's setting afterwards (the loop materializes
    # every intermediate via persist/count, so the conf has done its
    # job by the time we return the final lazy plan)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    prev_ckpt = _prev_ckpt_dir(spark)
    try:
        return _dedup_clusters_inner(spark, sf_dir, reliable_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if reliable_dir is not None:
            _restore_ckpt_dir(spark, prev_ckpt)


def _dedup_clusters_inner(
    spark: SparkSession, sf_dir: str, reliable_dir: str | None = None
) -> DataFrame:
    ckpt = _make_ckpt(spark, reliable_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = (
        dedup_ngram_jaccard(spark, sf_dir)
        .where(F.col("jaccard") >= _JACCARD_MIN)
        .select("doc_a", "doc_b")
    )
    # checkpoint (NOT persist): each round's result must TRUNCATE
    # the logical plan, or round N's plan embeds rounds 1..N-1 and
    # Catalyst analysis (DeduplicateRelations) blows the heap after a
    # handful of rounds — persist caches data but keeps full lineage.
    # ckpt = localCheckpoint by default, reliable checkpoint() when
    # reliable_dir is set (see _make_ckpt).
    edges = ckpt(pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ))

    labels = ckpt(docs.select("doc_id", F.col("doc_id").alias("label")))
    for _ in range(_MAX_ITERS):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = ckpt(
            labels.join(neighbor_min, labels.doc_id == neighbor_min.doc_a, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            "cluster_size",
        )
    )


def dedup_clusters_star(
    spark: SparkSession,
    sf_dir: str,
    _iters_out: list | None = None,
    reliable_dir: str | None = None,
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — the web-scale variant of dedup_clusters: converges in
    O(log² n) rounds on ANY graph shape, where plain min-label
    propagation needs O(diameter) rounds (a long near-dup chain = a
    long schedule).

    large-star: every node's strictly-larger neighbors re-attach to
    the min of its neighborhood; small-star: orient edges toward the
    smaller id, then all smaller-or-equal neighbors re-attach to the
    min. Both are one groupBy + one join on node id — the same
    equi-join shapes as the simple variant, just fewer rounds.

    Output contract (and DuckDB oracle) is IDENTICAL to
    dedup_clusters: (doc_id, cluster_id = component min, cluster_size).
    ``_iters_out`` (tests) receives the converged round count.
    ``reliable_dir``: durable checkpoint location (see ``_make_ckpt``
    — localCheckpoint default forfeits the iteration on executor
    loss at cluster scale).
    """
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    prev_ckpt = _prev_ckpt_dir(spark)
    try:
        return _dedup_clusters_star_inner(
            spark, sf_dir, _iters_out, reliable_dir
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if reliable_dir is not None:
            _restore_ckpt_dir(spark, prev_ckpt)


def _large_star(edges: DataFrame) -> DataFrame:
    """edges: directed pairs; treated as symmetric neighborhoods."""
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(
            F.col("dst").alias("src"),
            F.least(F.col("src"), F.col("mn")).alias("dst"),
        )
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()
    mins = oriented.groupBy("src").agg(F.min("dst").alias("mn"))
    joined = oriented.join(mins, "src")
    to_nbrs = joined.where(F.col("dst") != F.col("mn")).select(
        F.col("dst").alias("src"), F.col("mn").alias("dst")
    )
    to_self = mins.where(F.col("src") != F.col("mn")).select(
        "src", F.col("mn").alias("dst")
    )
    return to_nbrs.union(to_self).distinct()


def _dedup_clusters_star_inner(
    spark: SparkSession,
    sf_dir: str,
    _iters_out: list | None,
    reliable_dir: str | None = None,
) -> DataFrame:
    ckpt = _make_ckpt(spark, reliable_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = (
        dedup_ngram_jaccard(spark, sf_dir)
        .where(F.col("jaccard") >= _JACCARD_MIN)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    # checkpoint per round: truncates lineage so round N's plan
    # doesn't embed rounds 1..N-1 (see _dedup_clusters_inner note).
    edges = ckpt(pairs)
    n_edges = edges.count()
    iters = 0
    for _ in range(_MAX_ITERS):
        iters += 1
        new_edges = ckpt(_small_star(_large_star(edges)))
        # both sides are distinct sets (each star op ends in distinct),
        # so equal cardinality + empty one-sided difference ⇒ set
        # equality; counts on checkpointed frames are near-free
        n_new = new_edges.count()
        changed = (
            n_new != n_edges
            or new_edges.exceptAll(edges).limit(1).count() > 0
        )
        edges, n_edges = new_edges, n_new
        if not changed:
            break
    if _iters_out is not None:
        _iters_out.append(iters)

    # converged: stars — every non-root points straight at its
    # component min; roots and singletons label themselves
    roots = edges.groupBy("src").agg(F.min("dst").alias("lbl"))
    labels = docs.join(
        roots, docs.doc_id == roots.src, "left"
    ).select(
        "doc_id", F.coalesce(F.col("lbl"), F.col("doc_id")).alias("label")
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        "doc_id", F.col("label").alias("cluster_id"), "cluster_size"
    )


_PR_ITERS = 3
_PR_SCALE = 100_000_000  # ranks in integer 1e-8ths — exact, portable
_PR_DAMP_NUM = 85  # damping 0.85 as an integer ratio
_PR_BASE = 15_000_000  # (1 - d) * scale


def docs_pagerank(
    spark: SparkSession,
    sf_dir: str,
    reliable_dir: str | None = None,
) -> DataFrame:
    """PageRank centrality over the LSH candidate-pair graph — ranks
    the 'canonical' documents inside near-duplicate neighborhoods
    (high-degree hubs of boilerplate score high; useful as a keep-one
    tiebreaker and a template-detector).

    ALL arithmetic is integer: ranks are scaled to 1e-8ths,
    contributions use floor division by degree, damping is
    ``base + 85·sum // 100``. Floating-point PageRank is
    summation-order-dependent and therefore not engine-comparable;
    integer PageRank is bit-exact in any engine — which is how this
    iterative algorithm gets a full value-checked oracle (unrolled to
    the same 3 iterations in SQL).

    Scale: per iteration one equi-join (edges ⋈ ranks on src) + one
    agg on dst — the standard distributed PageRank shape; iterations
    are a driver loop. Degrees/dangling handling: the candidate graph
    is symmetrized so every node has degree ≥ 1.

    The edge and degree frames are checkpointed (``_make_ckpt`` —
    localCheckpoint by default, durable ``checkpoint()`` when the
    caller passes ``reliable_dir``, same contract as dedup_clusters)
    BEFORE the loop: left lazy, every iteration's plan re-embeds the
    whole MinHash-LSH candidate chain per edge reference — a
    round-10 plan audit measured 28 documents scans in the
    3-iteration plan (the same lineage trap the CC operators already
    cut per round). Checkpointed, the chain is evaluated once and
    the final plan contains ZERO parquet scans (plan-asserted in
    tests/test_plans.py).
    """
    from aichemy_data_pipelines_spark.operators.dedup import (
        dedup_minhash_lsh,
    )

    prev_ckpt = _prev_ckpt_dir(spark)
    try:
        ckpt = _make_ckpt(spark, reliable_dir)
        pairs = dedup_minhash_lsh(spark, sf_dir)
        edges = ckpt(
            pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionAll(
                pairs.selectExpr("doc_b AS src", "doc_a AS dst")
            )
        )
        deg = ckpt(edges.groupBy("src").agg(F.count("*").alias("deg")))
    finally:
        if reliable_dir is not None:
            _restore_ckpt_dir(spark, prev_ckpt)
    ranks = deg.select("src", F.lit(_PR_SCALE).cast("bigint").alias("rank"))
    for _ in range(_PR_ITERS):
        contribs = (
            edges.join(ranks, "src")
            .join(deg, "src")
            .select("dst", F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = contribs.select(
            F.col("dst").alias("src"),
            F.expr(f"{_PR_BASE} + ({_PR_DAMP_NUM} * s) div 100").alias(
                "rank"
            ),
        )
    return ranks.select(F.col("src").alias("doc_id"), "rank")


def dedup_graph_triangles(
    spark: SparkSession,
    sf_dir: str,
    reliable_dir: str | None = None,
) -> DataFrame:
    """Triangle census of the near-dup candidate graph: edges,
    wedges (paths of length 2, Σ d·(d-1)/2), triangles, and the
    global clustering coefficient 3T/W — the standard shape metric
    that tells template-cluster graphs (dense, coeff→1) from chained
    false-positive graphs (sparse, coeff→0).

    Scale: the classic two-join triangle enumeration over edges
    ordered doc_a < doc_b — each triangle counted exactly once; join
    fanout is bounded by per-node candidate degree (already bounded
    by the LSH banding), never all-pairs. Degrees/wedges are one agg.

    Output: one row (n_edges, n_wedges, n_triangles, clustering_coeff).

    The edge set is checkpointed (``_make_ckpt`` — localCheckpoint
    default, durable with ``reliable_dir``, same contract as
    dedup_clusters): the enumeration references it SIX times (two
    degree projections, the edge count, the three-way self-join),
    and left lazy each reference re-embeds the whole MinHash-LSH
    chain — a round-10 plan audit measured 12 documents scans in one
    plan. Checkpointed, the chain runs once and the final plan has
    ZERO parquet scans (plan-asserted in tests/test_plans.py).
    """
    prev_ckpt = _prev_ckpt_dir(spark)
    try:
        e = _make_ckpt(spark, reliable_dir)(
            dedup_minhash_lsh(spark, sf_dir)
        )
    finally:
        if reliable_dir is not None:
            _restore_ckpt_dir(spark, prev_ckpt)
    deg = (
        e.select(F.col("doc_a").alias("v"))
        .unionAll(e.select(F.col("doc_b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    counts = deg.agg(
        F.expr("sum(d * (d - 1) div 2)").alias("n_wedges")
    )
    edges = e.agg(F.count("*").alias("n_edges"))
    tri = (
        e.alias("e1")
        .join(
            e.alias("e2"),
            F.col("e1.doc_b") == F.col("e2.doc_a"),
        )
        .join(
            e.alias("e3"),
            (F.col("e1.doc_a") == F.col("e3.doc_a"))
            & (F.col("e2.doc_b") == F.col("e3.doc_b")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        edges.crossJoin(counts)
        .crossJoin(tri)
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.round(
                    3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
                ),
            ).alias("clustering_coeff"),
        )
    )



def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-structure report over the connected components:
    per cluster size, how many clusters, how many docs they hold,
    and how many docs dedup would drop (size − 1 per cluster) — the
    one-page summary a curation run publishes ("N docs in M dup
    clusters, K dropped").

    Scale: reduces the per-doc cluster table to ≤ max-cluster-size
    rows via two bounded aggs; inherits the CC operator's
    O(log² n)-round plan (see dedup_clusters).
    """
    clusters = dedup_clusters(spark, sf_dir)
    per_cluster = clusters.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("size")
    )
    return (
        per_cluster.groupBy("size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .select(
            "size",
            "n_clusters",
            (F.col("size") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("size") - 1) * F.col("n_clusters")).alias(
                "n_dropped"
            ),
        )
    )


QUERIES = {
    "dedup_clusters": dedup_clusters,
    "dedup_cluster_stats": dedup_cluster_stats,
    "dedup_clusters_star": dedup_clusters_star,
    "dedup_graph_triangles": dedup_graph_triangles,
    "docs_pagerank": docs_pagerank,
}

_SQL_CLUSTERS = f"""
        WITH pairs_base AS ({_SQL_LSH_PAIRS}),
        jacc AS (
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(trim(lower(text)), '\\s+') AS tokens
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       list_transform(range(0, len(tokens) - 2),
                           i -> array_to_string(tokens[i + 1:i + 3], ' '))
                         AS shingles
                FROM toks WHERE len(tokens) >= 3
            ), ds AS (
                SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh
            ), counts AS (
                SELECT doc_id, COUNT(*) AS n_sh FROM ds GROUP BY doc_id
            ), inter AS (
                SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
                FROM pairs_base p
                JOIN ds sa ON p.doc_a = sa.doc_id
                JOIN ds sb ON p.doc_b = sb.doc_id AND sa.s = sb.s
                GROUP BY p.doc_a, p.doc_b
            )
            SELECT p.doc_a, p.doc_b
            FROM pairs_base p
            JOIN inter i ON p.doc_a = i.doc_a AND p.doc_b = i.doc_b
            JOIN counts ca ON p.doc_a = ca.doc_id
            JOIN counts cb ON p.doc_b = cb.doc_id
            WHERE round(CAST(i.n_inter AS DOUBLE)
                        / (ca.n_sh + cb.n_sh - i.n_inter), 6) >= {_JACCARD_MIN}
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM jacc
            UNION
            SELECT doc_b, doc_a FROM jacc
        ),
        reach AS (
            WITH RECURSIVE r(a, b) AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src
            )
            SELECT * FROM r
        ),
        comp AS (
            SELECT d.doc_id,
                   least(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
            GROUP BY d.doc_id
        )
        SELECT c.doc_id, c.cluster_id, s.cluster_size
        FROM comp c
        JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
              FROM comp GROUP BY cluster_id) s
          ON c.cluster_id = s.cluster_id
    """

def _sql_pr_iter(prev: str, out: str) -> str:
    return f"""{out} AS (
            SELECT e.dst AS src,
                   CAST({_PR_BASE} + ({_PR_DAMP_NUM} *
                       SUM(r.rank // d.deg)) // 100 AS BIGINT) AS rank
            FROM edges e
            JOIN {prev} r ON r.src = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
        )"""


_SQL_PAGERANK = f"""
        WITH pairs AS ({_SQL_LSH_PAIRS}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM pairs
        ), deg AS (
            SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
        ), r0 AS (
            SELECT src, CAST({_PR_SCALE} AS BIGINT) AS rank FROM deg
        ), {_sql_pr_iter("r0", "r1")},
        {_sql_pr_iter("r1", "r2")},
        {_sql_pr_iter("r2", "r3")}
        SELECT src AS doc_id, rank FROM r3
"""


ORACLE = {
    "dedup_clusters": _SQL_CLUSTERS,
    "dedup_cluster_stats": f"""
        WITH base AS ({_SQL_CLUSTERS}),
        per_cluster AS (
            SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size
            FROM base GROUP BY cluster_id
        )
        SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(size * COUNT(*) AS BIGINT) AS n_docs,
               CAST((size - 1) * COUNT(*) AS BIGINT) AS n_dropped
        FROM per_cluster GROUP BY size
    """,
    # identical contract — the star variant must produce the very same
    # components, so it shares the recursive-CTE oracle
    "dedup_clusters_star": _SQL_CLUSTERS,
    "dedup_graph_triangles": f"""
        WITH e AS ({_SQL_LSH_PAIRS}),
        deg AS (
            SELECT v, COUNT(*) AS d FROM (
                SELECT doc_a AS v FROM e
                UNION ALL SELECT doc_b AS v FROM e) _u
            GROUP BY v
        ), w AS (
            SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
            FROM deg
        ), ne AS (
            SELECT COUNT(*) AS n_edges FROM e
        ), tri AS (
            SELECT COUNT(*) AS n_triangles
            FROM e e1
            JOIN e e2 ON e1.doc_b = e2.doc_a
            JOIN e e3 ON e1.doc_a = e3.doc_a AND e2.doc_b = e3.doc_b
        )
        SELECT ne.n_edges, w.n_wedges, tri.n_triangles,
               CASE WHEN w.n_wedges > 0
                    THEN round(3.0 * tri.n_triangles / w.n_wedges, 6)
               END AS clustering_coeff
        FROM ne, w, tri
    """,
    "docs_pagerank": _SQL_PAGERANK,
}
