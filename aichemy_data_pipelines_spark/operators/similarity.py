"""Similarity search over the ``embeddings`` table.

Two paths, as a real vector pipeline has:

* ``ann_cosine_topk`` — brute-force exact cosine top-k for a small
  query set: broadcast the queries, scan the corpus once, rank per
  query. The correctness baseline.
* ``ann_lsh_topk`` — BANDED random-hyperplane LSH with in-band
  multiprobe: B independent plane families each produce a
  ``planes``-bit signature (AND within a band); a query probes, in
  EVERY band, its own bucket plus each Hamming-1 neighbor; the
  candidate set is the UNION over bands (OR across bands) — the same
  B×R OR-construction the MinHash dedup uses (dedup.py, 16 bands of
  4), re-expressed for hyperplanes. Candidates = one equi-join on a
  composite (band, signature) int key; exact cosine re-rank after.
  BOTH parameters are corpus-size-derived: the per-band bit width
  ``n_planes(N)`` holds bucket density constant, and the OR-width
  ``bands_for_planes(planes)`` buys back the recall the growing
  AND-width costs (r16 — see the constants block).

  Why bands: the bit width is DERIVED from the corpus size
  (``n_planes``: ceil(log2(n / target_block)), clamped to [4, 16])
  so bucket density stays constant as the corpus grows — but a
  SINGLE growing signature loses recall monotonically (per-plane
  agreement p ⇒ one band with Hamming-1 probes detects a pair with
  q = p^R + R·p^(R-1)·(1-p), which decays like p^R; measured on the
  sf0.1 corpus, going 4→6 planes halved near-dup recall). B
  independent bands restore it: P(detect) = 1 − (1−q)^B. At p = 0.63
  (this corpus's cosine ≈ 0.4 neighbors) and R = 6, q ≈ 0.28 alone
  but P ≈ 0.74 with B = 4 and ≈ 0.93 with B = 8 (the r15 frontier
  point, kept for planes ≤ 6; r16 grows B with the plane count — see
  the measured frontier at the _BANDS_BY_PLANES constant); tighter
  real-world neighbors (cosine ≥ 0.9 ⇒ p ≥ 0.9) hold P ≈ 1 well
  past R = 10.

Hyperplane weights are derived from md5 in PYTHON (hashlib) and
inlined as literals into both engines' queries, so even the
"random" projection is oracle-checkable. Dot products are
decimal-exact (functions/vectors.py); cosines are rounded to 8dp
before ranking so both engines rank identical values.

Scale: the brute-force path is O(|Q|·N) with broadcast queries (no
shuffle of the corpus); banded LSH drops it to
O(|Q| · B·(R+1) · N/2^R) expected — with 2^R ∝ N the candidate
space stays ~linear in N (a log-factor from R growing). A pair can
meet in up to B bands, so candidates are de-duplicated with a
map-side-combinable (query, cand) aggregate before ranking (the
oracle's DISTINCT twin).
"""

from __future__ import annotations

import hashlib
import warnings

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.layout import spread_small_input
from aichemy_data_pipelines_spark.functions.vectors import (
    spark_dot,
    spark_dot_exact,
)

_N_QUERIES = 10  # vec_id < 10 are the query vectors
_TOP_K = 5
# Plane count is SCALE-ADAPTIVE (round-12 verdict #1): a fixed bit
# width turns 10x data into ~100x candidate pairs, because expected
# bucket size n/2^bits grows linearly with the corpus. Instead the
# bit width derives from the corpus size so buckets hold ~_TARGET_BLOCK
# vectors at any scale: planes = clamp(ceil(log2(n / target)), 4, 16).
# With 2^planes ∝ n, candidate pairs scale ~linearly in n instead of
# quadratically. The floor keeps the tiny test corpora on the
# historical 4-bit behavior; the ceiling (65k buckets × target 32 ≈
# 2M vectors) is where a production deployment would shard the corpus
# or move to the trained IVF index (ivf.py) anyway. The knob is
# ``spark.aichemy.lsh.targetBlock`` — the DuckDB oracles compute the
# SAME formula in-plan from COUNT(*) at the default target, so Spark
# and oracle stay in lockstep; a non-default conf raises a warning
# (corpus_plane_count) because the committed oracle SQL cannot see it.
#
# The OR-width B is SCALE-ADAPTIVE too (round-15 verdict #1 — the
# last documented-but-unbuilt scale knob): per-band detection decays
# like p^planes while planes grows with log2(N), so a FIXED B loses
# recall as the corpus grows (the r15 frontier measured pair recall
# 0.869 at sf0.1/planes=6 falling to 0.301 on the 10x corpus/
# planes=10 at fixed B=8). The measured per-extra-plane detection
# decay on this corpus is δ ≈ 2/3 (per-band q 0.224 at planes=6 →
# 0.0438 at planes=10, BASELINE.md frontier), so holding the overall
# OR-detection P = 1-(1-q)^B needs B growing by ~3/2 per extra plane:
#
#     B(planes) = clamp(ceil(8 · 1.5^(planes-6)), 8, 48)
#
# frozen below as the _BANDS_BY_PLANES literal (13 rows) so BOTH
# engines share exact integers instead of trusting POWER()'s float
# rounding at a ceil boundary. Anchors: planes<=6 (<= sf0.1 scale)
# stays on the r15 frontier point B=8; planes=10 (the 10x stress
# corpus) gets B=41, which restores the measured pair recall to
# ~0.84 at ~5x the fixed-B=8 candidate budget (see BASELINE.md's r16
# frontier extension). The clamp at 48 (planes>=11, N >= 64k/block
# 32) is where the construction's honest cost curve — B grows
# geometrically in planes, i.e. ~N^0.59 at δ=2/3 — stops being the
# right trade and a deployment routes near-dup candidates through
# the trained IVF index instead (ivf.dedup_embedding_ivf: recall
# governed by nprobe/K routing, not signature agreement); the r15
# frontier already documents that this corpus's threshold (cosine
# 0.25 ⇒ p ≈ 0.58) is adversarially loose, while real near-dup bars
# (cosine >= 0.9 ⇒ p >= 0.9) hold recall ≈ 1 at B=8 far past
# planes=16.
_MIN_PLANES = 4
_MAX_PLANES = 16
_MIN_BANDS = 8
_MAX_BANDS = 48
_BANDS_BY_PLANES = {
    4: 8,
    5: 8,
    6: 8,
    7: 12,
    8: 18,
    9: 27,
    10: 41,
    11: 48,
    12: 48,
    13: 48,
    14: 48,
    15: 48,
    16: 48,
}
# composite bucket key = band * stride + band-signature; in-band
# Hamming-1 flips touch only bits < _MAX_PLANES, so XOR on the
# composite key stays inside the band's key space
_BAND_STRIDE = 1 << _MAX_PLANES
_TARGET_BLOCK = 32
_DIM = 64


def n_planes(n_rows: int, target_block: int = _TARGET_BLOCK) -> int:
    """Corpus-size-derived per-band hyperplane count (see module
    constants)."""
    import math

    raw = math.ceil(math.log2(max(n_rows / float(target_block), 1.0)))
    return min(_MAX_PLANES, max(_MIN_PLANES, raw))


def bands_for_planes(planes: int) -> int:
    """Corpus-size-derived OR-width: the frozen _BANDS_BY_PLANES row
    for this plane count (= clamp(ceil(8 · 1.5^(planes-6)), 8, 48);
    the formula/table equivalence is pinned in
    tests/test_similarity.py::test_bands_formula_pins)."""
    return _BANDS_BY_PLANES[planes]


def _conf_target_block(spark: SparkSession) -> int:
    return int(
        spark.conf.get("spark.aichemy.lsh.targetBlock", str(_TARGET_BLOCK))
    )


def corpus_plane_count(spark: SparkSession, sf_dir: str) -> int:
    """Plane count for the embeddings corpus at ``sf_dir`` — one
    metadata-cheap parquet count, then the deterministic formula both
    engines share. A non-default ``spark.aichemy.lsh.targetBlock``
    changes only the Spark side — the committed oracle SQL hardcodes
    the default — so it warns loudly instead of silently failing the
    driver's value gate (round-12 advice #3)."""
    target = _conf_target_block(spark)
    if target != _TARGET_BLOCK:
        warnings.warn(
            f"spark.aichemy.lsh.targetBlock={target} diverges from the "
            f"default {_TARGET_BLOCK} baked into the DuckDB oracles; "
            "oracle parity for the LSH queries WILL fail under this "
            "conf (test/eval use only)",
            stacklevel=2,
        )
    n = load_table(spark, sf_dir, "embeddings").count()
    return n_planes(n, target)


def corpus_lsh_params(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(planes, bands) for the embeddings corpus at ``sf_dir`` — ONE
    corpus count feeding both deterministic formulas; the DuckDB
    oracles recompute the same pair in-plan (``_sql_nparam``)."""
    planes = corpus_plane_count(spark, sf_dir)
    return planes, bands_for_planes(planes)


def probe_xors(planes: int) -> list[int]:
    """In-band probe offsets: own bucket + all Hamming-1 neighbors."""
    return [0] + [1 << p for p in range(planes)]


#: one persisted sig frame per (query, sf_dir) key — repeated
#: invocations (bench min-of-3, the driver's multi-pass contract,
#: recall sweeps) swap the cache instead of leaking one
#: MEMORY_AND_DISK copy per call (r15 self-review finding #3).
#: Entries carry the DATA FINGERPRINT (size+mtime of the embeddings
#: parquet) they were built against: Spark's CacheManager substitutes
#: any canonically-equal subplan with a persisted InMemoryRelation,
#: so a still-persisted frame built on a since-rewritten table would
#: silently serve STALE signatures to the NEXT query over the same
#: path (r15 verdict #4). Any entry whose fingerprint no longer
#: matches its table is evicted before a new frame persists, and the
#: cache is bounded (oldest-out) so long daemon/CLI sessions over
#: many sf_dirs cannot accumulate unbounded persisted copies (r15
#: ADVICE #1). Unpersisting is always safe: a still-held reference
#: just recomputes lazily.
_SIG_CACHE: dict = {}  # (name, sf_dir) -> (fingerprint, table, DataFrame)
_SIG_CACHE_MAX = 4


def _embeddings_fingerprint(sf_dir: str, table: str = "embeddings") -> str:
    """size:mtime_ns fingerprint of ``table``'s parquet under
    ``sf_dir`` (single file or directory tree) — cheap os.stat walk,
    no Spark job."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(path)
    except OSError:
        return "absent"
    if not os.path.isdir(path):
        return f"{st.st_size}:{st.st_mtime_ns}"
    total, newest = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                s = os.stat(os.path.join(root, f))
            except OSError:
                continue
            total += s.st_size
            newest = max(newest, s.st_mtime_ns)
    return f"{total}:{newest}"


def release_sig_frames() -> None:
    """Drain every cached signature frame (unpersist + drop) — the
    explicit release hook for daemon/CLI lifecycles that rewrite
    tables between operations (r15 ADVICE #1)."""
    for _fp, _table, df in _SIG_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass  # session may already be gone
    _SIG_CACHE.clear()


def persist_sig_frame(name: str, sf_dir: str, df, table: str = "embeddings"):
    """Persist + eagerly fill ``df`` (MEMORY_AND_DISK), releasing (a)
    the frame a previous invocation under the same key left, (b) any
    frame over the same ``sf_dir`` whose data fingerprint went stale
    (rewritten table — see _SIG_CACHE), and (c) the oldest entry when
    the cache is full. ``table`` names the parquet the frame derives
    from, so staleness tracks the RIGHT input (r18: the minhash band
    frame derives from documents, not embeddings)."""
    from pyspark import StorageLevel

    fp = _embeddings_fingerprint(sf_dir, table)
    # memoize fingerprints within this call (r18 ADVICE #3): the
    # os.walk behind directory-parquet fingerprints would otherwise
    # re-run per cached same-sf_dir entry on every invocation
    fp_memo: dict[str, str] = {table: fp}
    for k in list(_SIG_CACHE):
        ent_fp, ent_table, ent_df = _SIG_CACHE[k]
        # staleness is judged against the entry's OWN source table —
        # entries over different tables under one sf_dir must not
        # evict each other on a cross-table fingerprint mismatch
        if ent_table not in fp_memo and k[1] == sf_dir:
            fp_memo[ent_table] = _embeddings_fingerprint(sf_dir, ent_table)
        if k == (name, sf_dir) or (
            k[1] == sf_dir and ent_fp != fp_memo[ent_table]
        ):
            _SIG_CACHE.pop(k)
            try:
                ent_df.unpersist()
            except Exception:
                pass  # session may already be gone
    while len(_SIG_CACHE) >= _SIG_CACHE_MAX:
        _, _, old = _SIG_CACHE.pop(next(iter(_SIG_CACHE)))
        try:
            old.unpersist()
        except Exception:
            pass
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    _SIG_CACHE[(name, sf_dir)] = (fp, table, df)
    return df


def _plane_weights() -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign of md5("p:d") parity, one
    family of _MAX_PLANES planes per band (band b owns global rows
    [b·_MAX_PLANES, (b+1)·_MAX_PLANES)). A band uses the first
    ``planes`` rows of its family, so growing the corpus only APPENDS
    planes — and growing the BAND COUNT only appends families — the
    shared prefix keeps signatures comparable across scales. Band 0
    is byte-identical to the pre-banding plane set. The table covers
    the _MAX_BANDS clamp; the DuckDB oracles compute the same parity
    in-plan from md5 instead of inlining it (``_sql_signature``)."""
    planes = []
    for p in range(_MAX_BANDS * _MAX_PLANES):
        row = []
        for d in range(_DIM):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1 if int(h, 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


_PLANES = _plane_weights()


def _spark_signature(vec: str, planes: int = _MIN_PLANES, band: int = 0) -> str:
    """``planes``-bit LSH signature expression from band ``band``'s
    plane family (Spark dialect)."""
    off = band * _MAX_PLANES
    terms = []
    for p, weights in enumerate(_PLANES[off : off + planes]):
        arr = ", ".join(str(w) for w in weights)
        proj = (
            f"cast(aggregate(zip_with({vec}, array({arr}), "
            f"(x, w) -> cast(cast(x as double) as decimal(18,12)) "
            f"* cast(w as decimal(2,0))), "
            f"cast(0 as decimal(38,12)), "
            f"(acc, v) -> cast(acc + v as decimal(38,12))) as double)"
        )
        terms.append(f"(case when ({proj}) >= 0 then {1 << p} else 0 end)")
    return " + ".join(terms)


def _spark_sig_keys(vec: str, planes: int, bands: int) -> str:
    """Array of the ``bands`` composite (band·stride + signature)
    bucket keys — ONE pure-map column per vector."""
    elems = ", ".join(
        f"({b * _BAND_STRIDE} + ({_spark_signature(vec, planes, b)}))"
        for b in range(bands)
    )
    return f"array({elems})"


def _spark_probe_keys(planes: int, bands: int) -> str:
    """Probe-key array over a ``sigs`` column: every band's own
    bucket + Hamming-1 flips — B·(planes+1) keys."""
    return ", ".join(
        f"int(sigs[{b}] ^ {x})"
        for b in range(bands)
        for x in probe_xors(planes)
    )


def _spark_member_keys(bands: int) -> str:
    """Corpus-side key array: each band's own bucket — B keys."""
    return ", ".join(f"int(sigs[{b}])" for b in range(bands))


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for the first 10 vectors.

    Scale: queries broadcast (tiny), corpus scanned once, per-query
    ranking via window — no corpus shuffle at all. The per-row cost
    is O(|Q|·dim) JVM work inside codegen.
    """
    e = load_table(spark, sf_dir, "embeddings").transform(spread_small_input)
    # norms once per VECTOR, not per pair — 3x less decimal work for
    # bit-identical cosines (norm is the same double either way)
    norm = f"sqrt({spark_dot_exact('embedding', 'embedding')})"
    q = e.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.expr(norm).alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        F.expr(norm).alias("cn"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    dot = spark_dot_exact("qv", "cv")
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("cand_id"))
        # try_divide (r16): a zero-norm query or corpus vector gets
        # NULL cosines (ranked last / never top-k) instead of raising
        # ANSI DIVIDE_BY_ZERO — doubles included under the session
        # default
        .withColumn(
            "cosine", F.round(F.expr(f"try_divide({dot}, qn * cn)"), 8)
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOP_K)
        .select("query_id", "rk", "cand_id", "cosine")
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH ANN top-3: composite (band, signature) equi-join,
    in-band Hamming-1 multiprobe, exact cosine re-rank on the unioned
    candidates.

    Scale: the signature array is a pure-map column; queries explode
    to B·(planes+1) probe keys (queries are the small side — the
    corpus explodes only B×); the candidate join is an equi-join on
    one int key with expected fanout B·(planes+1)·N/2^planes. A pair
    can meet in up to B bands, so a (query, cand) max-aggregate
    (map-side combinable) dedups candidates before the ranking
    window. Recall asserted against the exact baseline in
    tests/test_similarity.py at the plane-count floor
    (test_lsh_recall_floor); the shared banded sig/probe machinery
    is additionally pinned at a FORCED elevated plane count through
    ann_knn_graph and dedup_embedding_cosine
    (test_banded_recall_floor_at_elevated_plane_count).
    """
    planes, bands = corpus_lsh_params(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "sigs", F.expr(_spark_sig_keys("embedding", planes, bands))
    )
    norm = f"sqrt({spark_dot_exact('embedding', 'embedding')})"
    q = e.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.expr(norm).alias("qn"),
        F.explode(
            F.expr(f"array({_spark_probe_keys(planes, bands)})")
        ).alias("sig"),
    )
    c = e.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        F.expr(norm).alias("cn"),
        F.explode(F.expr(f"array({_spark_member_keys(bands)})")).alias("sig"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    dot = spark_dot_exact("qv", "cv")
    return (
        F.broadcast(q)
        .join(c, "sig")
        .where(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cosine", F.round(F.expr(f"try_divide({dot}, qn * cn)"), 8)
        )
        .groupBy("query_id", "cand_id")
        .agg(F.max("cosine").alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("query_id", "rk", "cand_id", "cosine")
    )


_KNN_K = 3


def ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL-corpus k-NN graph (k=3) over the banded LSH buckets — the
    building block of graph-based dedup (connect the graph, then
    clustering.py's connected components label it) and of SemDeDup-
    style neighborhood analyses.

    Unlike ``ann_lsh_topk`` (a small query set probing the corpus),
    here EVERY vector is a query: the corpus explodes to its
    B·(planes+1) probe keys on the left and its B member keys on the
    right (rows, not vectors — Tungsten shares the array ref) and
    self-joins on the composite key — candidate fanout
    B·(planes+1)·N²/2^planes, and the per-band plane count DOES grow
    with log₂(N) (corpus_plane_count) to hold per-bucket density
    constant, so the fanout stays ~B·(planes+1)·N·_TARGET_BLOCK; the
    plan (pure-map signatures, one equi-join, per-key top-k window)
    never changes. A pair meeting in several bands is de-duplicated
    by the (vec, nbr) max-aggregate before the re-rank.

    Edges are directed (a → its top-k); k-NN graphs are asymmetric by
    nature. Recall vs the exact graph is the LSH trade, asserted in
    tests/test_similarity.py.
    """
    planes, bands = corpus_lsh_params(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "sigs", F.expr(_spark_sig_keys("embedding", planes, bands))
    )
    # The sig frame is evaluated TWICE (probe side a, member side b)
    # and each evaluation pays B·planes interpreted decimal folds
    # per row — at the r15 B=8 that is the dominant per-row cost, so
    # cache it once (eager fill, else the join's two subtrees race
    # and both recompute). Same-session A/B at sf0.1: candidate
    # stage 11.5/10.9 s plain vs 8.1/6.9 s shared, identical
    # outputs (BASELINE.md r15). Unconditional — the catalog's
    # share gate is an I/O-size heuristic and this win is compute-
    # bound; MEMORY_AND_DISK spills rather than OOMs at corpus
    # scale, and the keyed swap releases the previous invocation's
    # cache (no per-call leak).
    e = persist_sig_frame("ann_knn_graph", sf_dir, e)
    # Candidate pass scores with a plain DOUBLE cosine: the exact-
    # decimal fold is interpreted BigDecimal work ~an order of
    # magnitude costlier per pair, and the candidate volume is
    # B·(planes+1)·N·block — it dominated the query (measured 131 s
    # at sf0.1 with exact dots on every candidate vs 28 s this way;
    # 344 s vs 64 s on the 10x corpus).
    # Lossless by margin analysis (the decontam_embedding recipe):
    # |double cosine − exact cosine| ≲ 3e-12 (per-dim float products
    # are exact in doubles; only summation order varies), so any pair
    # the exact 8dp ranking puts in the top-K has a double cosine
    # within 2·3e-12 + 5e-9 of the double kth — far inside the 1e-6
    # keep-margin below; dropped pairs are provably outranked by K
    # strictly-better pairs at 8dp. Survivors (≈ N·K + boundary ties)
    # are re-scored with the exact-decimal dot via two join-backs —
    # shuffling the OUTPUT-sized survivor frame plus the corpus
    # arrays once beats folding decimals over every candidate.
    # Boundary behavior pinned in tests/test_similarity.py.
    norm = f"sqrt({spark_dot_exact('embedding', 'embedding')})"
    a = e.select(
        "vec_id",
        F.col("embedding").alias("va"),
        F.expr(norm).alias("na"),
        F.explode(
            F.expr(f"array({_spark_probe_keys(planes, bands)})")
        ).alias("sig"),
    )
    b = e.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("vb"),
        F.expr(norm).alias("nb"),
        F.explode(F.expr(f"array({_spark_member_keys(bands)})")).alias("sig"),
    )
    # exact norms (already doubles) hoist once per side — each
    # candidate pays ONE double fold, not a three-fold double cosine
    cand = (
        a.join(b, "sig")
        .where(F.col("vec_id") != F.col("nbr_id"))
        # try_divide + NULL drop (r16): a zero-norm vector's
        # candidates score NULL and are dropped HERE — the vector
        # simply emits no edges ("no measurable neighbors") and can
        # never reach the bare-'/' exact re-rank below — instead of
        # raising ANSI DIVIDE_BY_ZERO (which covers doubles) on the
        # first zero embedding a user corpus carries
        .withColumn(
            "dcos",
            F.expr(f"try_divide({spark_dot('va', 'vb')}, na * nb)"),
        )
        .where(F.col("dcos").isNotNull())
        .groupBy("vec_id", "nbr_id")
        .agg(F.max("dcos").alias("dcos"))
    )
    wd = Window.partitionBy("vec_id").orderBy(F.desc("dcos"), "nbr_id")
    kth = F.max(F.when(F.col("drk") == _KNN_K, F.col("dcos"))).over(
        Window.partitionBy("vec_id")
    )
    surv = (
        cand.withColumn("drk", F.row_number().over(wd))
        .withColumn("kth", kth)
        .where(
            (F.col("drk") <= _KNN_K)
            | F.col("kth").isNull()
            | (F.col("dcos") >= F.col("kth") - 1e-6)
        )
        .select("vec_id", "nbr_id")
    )
    norm = f"sqrt({spark_dot_exact('embedding', 'embedding')})"
    ea = e.select(
        "vec_id",
        F.col("embedding").alias("va"),
        F.expr(norm).alias("na"),
    )
    eb = e.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("vb"),
        F.expr(norm).alias("nb"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), "nbr_id")
    dot = spark_dot_exact("va", "vb")
    return (
        surv.join(ea, "vec_id")
        .join(eb, "nbr_id")
        .withColumn(
            "cosine", F.round(F.expr(f"try_divide({dot}, na * nb)"), 8)
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _KNN_K)
        .select("vec_id", "rk", "nbr_id", "cosine")
    )


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_knn_graph": ann_knn_graph,
}


def _sql_cosine(alias_a: str, alias_b: str) -> str:
    """DuckDB exact-cosine over zipped unnests, 8dp-rounded."""
    dec = "CAST(CAST({v} AS DOUBLE) AS DECIMAL(18,12))"
    da, db = dec.format(v="xa"), dec.format(v="xb")
    return (
        f"round(CAST(SUM({da} * {db}) AS DOUBLE) / "
        f"(sqrt(CAST(SUM({da} * {da}) AS DOUBLE)) * "
        f"sqrt(CAST(SUM({db} * {db}) AS DOUBLE))), 8)"
    )


def _sql_nparam() -> str:
    """DuckDB twin of ``corpus_lsh_params`` — the adaptive per-band
    bit width ``np`` AND the adaptive OR-width ``nb`` computed
    IN-PLAN, so the oracle follows the corpus size exactly as the
    Spark side's driver-side count does. ``nb`` reads the frozen
    _BANDS_BY_PLANES table as a CASE ladder (exact integers; no
    POWER() float at a ceil boundary). Emits a one-row CTE body
    ``(np, nb)``."""
    case_nb = " ".join(
        f"WHEN {p} THEN {_BANDS_BY_PLANES[p]}"
        for p in range(_MIN_PLANES, _MAX_PLANES + 1)
    )
    return (
        f"SELECT np, CASE np {case_nb} END AS nb FROM ("
        f"SELECT LEAST({_MAX_PLANES}, GREATEST({_MIN_PLANES}, "
        f"CAST(CEIL(LOG2(GREATEST(COUNT(*) / {_TARGET_BLOCK}.0, 1.0))) "
        f"AS INT))) AS np FROM embeddings)"
    )


# probe list for a composite (band·stride + sig) key: own bucket +
# one in-band flip per ACTIVE plane — flips touch only bits <
# _MAX_PLANES, so the band part of the key survives the XOR (DuckDB
# dialect; ``np`` must be in scope via nparam)
_SQL_PROBES = (
    "unnest(list_prepend(sig, "
    "list_transform(range(0, np), p -> xor(sig, 1 << p))))"
)


def _sql_signature() -> str:
    """DuckDB signatures with BOTH adaptive parameters in-plan: the
    ±1 plane weights are recomputed from the same md5 parity the
    Python table inlines (``_plane_weights``: sign of
    int(md5("p:d"),16) % 2 ⇔ parity of the LAST hex digit), the
    active planes are gated by ``np`` and the active bands by ``nb``
    — planes/bands beyond the adaptive counts never exist, exactly
    like the Spark side never emitting them. (The pre-r16 form
    inlined all weight lists as literals and unrolled one UNION ALL
    arm per band; with the OR-width now scale-adaptive up to
    _MAX_BANDS=48 that text would be ~50x larger, while this form is
    constant-size and equal by the md5-parity pin in
    tests/test_oracle_parity.py.) ``sigs`` holds one row per
    (vector, active band) carrying the composite band·stride +
    signature key — the exploded twin of the Spark side's sig-key
    array."""
    return f"""
        nparam AS ({_sql_nparam()}),
        edim AS (
            SELECT vec_id, u.d AS d, u.val AS val FROM (
                SELECT vec_id,
                       unnest(list_transform(embedding,
                              (v, i) -> {{'d': i - 1, 'val': v}})) AS u
                FROM embeddings)
        ),
        planes AS (
            SELECT g.g, d.d,
                   CASE WHEN instr('02468ace',
                        substr(md5(g.g::VARCHAR || ':' || d.d::VARCHAR),
                               32, 1)) > 0
                        THEN 1 ELSE -1 END AS w
            FROM range({_MAX_BANDS * _MAX_PLANES}) g(g),
                 range({_DIM}) d(d), nparam
            WHERE g.g < nparam.nb * {_MAX_PLANES}
              AND g.g % {_MAX_PLANES} < nparam.np
        ),
        projs AS (
            SELECT e.vec_id,
                   CAST(p.g // {_MAX_PLANES} AS INT) AS band,
                   CAST(p.g % {_MAX_PLANES} AS INT) AS bit,
                   SUM(CAST(CAST(e.val AS DOUBLE) AS DECIMAL(18,12))
                       * CAST(p.w AS DECIMAL(2,0))) AS s
            FROM edim e JOIN planes p ON p.d = e.d
            GROUP BY e.vec_id, band, bit
        ),
        sigs AS (
            SELECT vec_id,
                   CAST(band * {_BAND_STRIDE}
                        + SUM(CASE WHEN CAST(s AS DOUBLE) >= 0
                                   THEN 1 << bit ELSE 0 END)
                        AS BIGINT) AS sig
            FROM projs GROUP BY vec_id, band
        )
    """


ORACLE = {
    "ann_cosine_topk": f"""
        WITH pairs AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   q.embedding AS qv, c.embedding AS cv
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {_N_QUERIES}
        ), expl AS (
            SELECT query_id, cand_id, unnest(qv) AS xa, unnest(cv) AS xb
            FROM pairs
        ), cos AS (
            SELECT query_id, cand_id, {_sql_cosine('xa', 'xb')} AS cosine
            FROM expl GROUP BY query_id, cand_id
        )
        SELECT query_id, rk, cand_id, cosine FROM (
            SELECT query_id, cand_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rk
            FROM cos) t
        WHERE rk <= {_TOP_K}
    """,
    "ann_lsh_topk": f"""
        WITH {_sql_signature()},
        probes AS (
            SELECT vec_id, {_SQL_PROBES} AS probe
            FROM sigs, nparam WHERE vec_id < {_N_QUERIES}
        ), pairs AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id,
                   q.embedding AS qv, c.embedding AS cv
            FROM probes p
            JOIN embeddings q ON q.vec_id = p.vec_id
            JOIN sigs sc ON sc.sig = p.probe
            JOIN embeddings c ON c.vec_id = sc.vec_id
            WHERE q.vec_id <> c.vec_id
        ), expl AS (
            SELECT query_id, cand_id, unnest(qv) AS xa, unnest(cv) AS xb
            FROM pairs
        ), cos AS (
            SELECT query_id, cand_id, {_sql_cosine('xa', 'xb')} AS cosine
            FROM expl GROUP BY query_id, cand_id
        )
        SELECT query_id, rk, cand_id, cosine FROM (
            SELECT query_id, cand_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rk
            FROM cos) t
        WHERE rk <= 3
    """,
    "ann_knn_graph": f"""
        WITH {_sql_signature()},
        probes AS (
            SELECT vec_id, {_SQL_PROBES} AS probe
            FROM sigs, nparam
        ), pairs AS (
            SELECT DISTINCT q.vec_id AS vec_id, c.vec_id AS nbr_id,
                   q.embedding AS qv, c.embedding AS cv
            FROM probes p
            JOIN embeddings q ON q.vec_id = p.vec_id
            JOIN sigs sc ON sc.sig = p.probe
            JOIN embeddings c ON c.vec_id = sc.vec_id
            WHERE q.vec_id <> c.vec_id
        ), expl AS (
            SELECT vec_id, nbr_id, unnest(qv) AS xa, unnest(cv) AS xb
            FROM pairs
        ), cos AS (
            SELECT vec_id, nbr_id, {_sql_cosine('xa', 'xb')} AS cosine
            FROM expl GROUP BY vec_id, nbr_id
        )
        SELECT vec_id, rk, nbr_id, cosine FROM (
            -- cosine IS NOT NULL: the Spark candidate pass DROPS
            -- NULL-dcos rows (r16 try_divide hardening — a zero-norm
            -- vector emits no edges), while DuckDB's 0-division
            -- yields NULL and would otherwise RANK those rows into
            -- the top-k on a degenerate corpus (r17 review); parity
            -- pinned on the zero-norm corpus in tests
            SELECT vec_id, nbr_id, cosine,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cosine DESC, nbr_id) AS rk
            FROM cos WHERE cosine IS NOT NULL) t
        WHERE rk <= {_KNN_K}
    """,
}


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the LSH index against the exact baseline, per
    query — the evaluation harness every ANN deployment runs before
    trusting an index, expressed as a first-class query.

    Composed VERBATIM from ann_cosine_topk (ground truth) and
    ann_lsh_topk (the index under test); the oracle nests both
    oracle texts as CTEs, so the eval can never drift from the
    operators it evaluates (the screens_matrix pattern).

    Output: (query_id, n_exact, n_hits, recall) — recall@3: both
    sides truncated to their top-3 before comparing; n_hits = exact
    top-3 neighbors the index also returned.  LSH's candidate
    contract means a query may return fewer than 3 rows, which
    recall penalizes correctly.

    Scale: both inputs are query-bounded (constant _N_QUERIES);
    the comparison join and agg run on ≤ 3·|Q| rows.
    """
    # both sides truncated to the same k: the exact baseline emits
    # top-5, the LSH index top-3 — recall@3 compares like with like
    exact = (
        ann_cosine_topk(spark, sf_dir)
        .where(F.col("rk") <= 3)
        .select("query_id", "cand_id")
    )
    approx = ann_lsh_topk(spark, sf_dir).select(
        "query_id", F.col("cand_id").alias("hit_id")
    )
    return (
        exact.join(
            approx,
            (exact.query_id == approx.query_id)
            & (exact.cand_id == approx.hit_id),
            "left",
        )
        .groupBy(exact.query_id.alias("query_id"))
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.count("hit_id").cast("long").alias("n_hits"),
            F.round(
                F.count("hit_id") / F.count("*"), 6
            ).alias("recall"),
        )
    )


QUERIES["ann_recall_eval"] = ann_recall_eval

ORACLE["ann_recall_eval"] = f"""
    WITH exact_all AS ({ORACLE["ann_cosine_topk"]}),
    exact AS (SELECT * FROM exact_all WHERE rk <= 3),
    approx AS ({ORACLE["ann_lsh_topk"]})
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(a.cand_id) AS BIGINT) AS n_hits,
           round(COUNT(a.cand_id) / COUNT(*), 6) AS recall
    FROM exact e
    LEFT JOIN approx a
      ON e.query_id = a.query_id AND e.cand_id = a.cand_id
    GROUP BY e.query_id
"""
