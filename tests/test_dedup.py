"""MinHash/LSH semantic guarantees: known-near-dup recall and
candidate precision against brute-force exact Jaccard (DuckDB).

These pin the 16-band × 4-row parameterization: shrinking the
signature (or a windowing bug) collapses recall; widening bands or a
densification-style correlation bug collapses precision.
"""

from __future__ import annotations

import duckdb

from aichemy_data_pipelines_spark.functions.text import SQL_TOKENS, sql_shingles
from aichemy_data_pipelines_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
)
from tests.conftest import SF_SMOKE


def _true_pairs(threshold: float) -> set[tuple[int, int]]:
    """All-pairs exact 3-shingle Jaccard at sf0.001 (500 docs) —
    brute force is fine here, it's the ORACLE for the LSH shortcut."""
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    q = f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKENS} AS tokens FROM documents),
    sh AS (SELECT doc_id, {sql_shingles('tokens', 3)} AS shingles
           FROM toks WHERE len(tokens) >= 3),
    ds AS (SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS ni
      FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT da, db
    FROM inter JOIN counts ca ON da = ca.doc_id
               JOIN counts cb ON db = cb.doc_id
    WHERE CAST(ni AS DOUBLE) / (ca.n + cb.n - ni) >= {threshold}
    """
    return {(r[0], r[1]) for r in con.sql(q).fetchall()}


def test_lsh_recall_on_high_jaccard_pairs(spark):
    # P(band match) at j=0.8 is 1-(1-0.8^4)^16 ≈ 0.9996 — every
    # true near-dup pair must surface as a candidate
    truth = _true_pairs(0.8)
    assert truth, "fixture data should contain near-dup pairs"
    cand = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()
    }
    missed = truth - cand
    assert not missed, f"LSH missed true near-dups: {sorted(missed)[:10]}"


def test_lsh_candidate_precision(spark):
    # 16×4 banding at j<0.3 has P(candidate) < 1%: the candidate set
    # must not contain junk pairs (the old 4×2 config, or an OPH
    # densification bug, floods this with zero-overlap pairs)
    rows = dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    assert rows
    junk = [r for r in rows if r.jaccard < 0.3]
    assert len(junk) <= max(1, len(rows) // 10), (
        f"candidate set is {len(junk)}/{len(rows)} low-jaccard junk"
    )


def test_embedding_dedup_fanout_bounded(spark):
    """The candidate space must be (label, band, sig)-blocked, not
    label-all-pairs: every surviving pair meets in SOME band within
    Hamming distance 1 (the banded-OR contract — r13's B=4 rewrite
    means pairs may meet in bands 1-3 while band 0 disagrees), and
    the multiprobe join's total candidate fanout summed over ALL
    bands undercuts the unbounded label-block all-pairs count."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from aichemy_data_pipelines_spark.catalog import load_table
    from aichemy_data_pipelines_spark.operators.dedup import (
        dedup_embedding_cosine,
    )
    from aichemy_data_pipelines_spark.operators.similarity import (
        _spark_signature,
        bands_for_planes,
        corpus_plane_count,
    )

    planes = corpus_plane_count(spark, SF_SMOKE)
    _N_BANDS = bands_for_planes(planes)
    e = load_table(spark, SF_SMOKE, "embeddings")
    for band in range(_N_BANDS):
        e = e.withColumn(
            f"sig{band}",
            F.expr(_spark_signature("embedding", planes, band)),
        )
    sig_cols = [f"sig{b}" for b in range(_N_BANDS)]
    sigs = {
        r.vec_id: tuple(r[c] for c in sig_cols)
        for r in e.select("vec_id", *sig_cols).collect()
    }
    pairs = dedup_embedding_cosine(spark, SF_SMOKE).collect()
    assert pairs
    for r in pairs:
        min_ham = min(
            bin(sa ^ sb).count("1")
            for sa, sb in zip(sigs[r.id_a], sigs[r.id_b])
        )
        assert min_ham <= 1, (
            f"pair ({r.id_a},{r.id_b}) min-over-bands hamming {min_ham} > 1"
        )

    # fanout model: expected multiprobe cost is
    # 2·B·(planes+1)/2^planes · label_allpairs (each vector's probes
    # cover (planes+1) of the 2^planes in-band buckets, per band,
    # cross-block pairs counted from both sides) — ~2.5x at the
    # 4-plane floor, shrinking as planes grows with the corpus. The
    # pinned invariants are therefore:
    #  (a) per band, signature blocking STRICTLY splits every label:
    #      Σ_sig n(n-1)/2 < label all-pairs — a join that degenerates
    #      to label-all-pairs (sig dropped from the key / constant
    #      signature) fails here;
    #  (b) the total probe fanout stays under the non-discriminating
    #      degenerate cost B · label_allpairs — the banded OR never
    #      costs more than B broadcast-everything passes.
    by_label = e.groupBy("label").count().collect()
    label_allpairs = sum(r["count"] * (r["count"] - 1) // 2 for r in by_label)
    assert label_allpairs > 0
    labels = {r.vec_id: r.label for r in e.select("vec_id", "label").collect()}
    blocks: dict[tuple, int] = defaultdict(int)
    for vid, sg in sigs.items():
        for band in range(_N_BANDS):
            blocks[(labels[vid], band, sg[band])] += 1
    same_block = defaultdict(int)
    fanout = 0
    for (label, band, sig), n in blocks.items():
        same_block[band] += n * (n - 1) // 2
        fanout += n * (n - 1) // 2
        for bit in range(planes):
            other = blocks.get((label, band, sig ^ (1 << bit)), 0)
            # summed from both sides, so each cross-block pair counts twice
            fanout += n * other
    for band in range(_N_BANDS):
        assert same_block[band] < label_allpairs, (
            f"band {band}: signature blocking does not split labels "
            f"({same_block[band]} same-block pairs >= {label_allpairs})"
        )
    assert fanout < _N_BANDS * label_allpairs, (
        f"banded multiprobe fanout {fanout} >= degenerate "
        f"B x label all-pairs {_N_BANDS * label_allpairs}"
    )


def test_star_components_match_and_converge_fast(spark):
    """large-star/small-star must produce byte-identical components to
    min-label propagation, converging within the O(log^2 n) budget —
    NOT the O(diameter) rounds the simple variant needs."""
    from aichemy_data_pipelines_spark.operators.clustering import (
        dedup_clusters,
        dedup_clusters_star,
    )

    simple = sorted(
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in dedup_clusters(spark, SF_SMOKE).collect()
    )
    iters = []
    star = sorted(
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in dedup_clusters_star(spark, SF_SMOKE, _iters_out=iters).collect()
    )
    assert star == simple
    assert iters and iters[0] <= 6, f"star CC took {iters} rounds"


def test_exact_substring_pairs_share_verbatim_windows(spark):
    """Every reported pair must genuinely share >= _MIN_SHARED
    distinct 12-token windows — re-derived in pure Python from the
    raw text (independent of both engines' hash/join machinery)."""
    import re

    from aichemy_data_pipelines_spark.operators.substring_dedup import (
        _MIN_SHARED,
        _WIN,
        dedup_exact_substring,
    )

    rows = dedup_exact_substring(spark, SF_SMOKE).collect()
    assert rows, "expected shared-span pairs in the synthetic corpus"
    con = duckdb.connect()
    texts = dict(
        con.sql(
            "SELECT doc_id, text FROM "
            f"read_parquet('{SF_SMOKE}/documents.parquet')"
        ).fetchall()
    )

    def windows(doc_id: int) -> set[str]:
        toks = re.split(r"\s+", texts[doc_id].strip().lower())
        return {
            " ".join(toks[i : i + _WIN])
            for i in range(len(toks) - _WIN + 1)
        }

    for r in rows:
        shared = windows(r.doc_a) & windows(r.doc_b)
        assert len(shared) == r.n_shared_windows >= _MIN_SHARED, (
            r.doc_a,
            r.doc_b,
            r.n_shared_windows,
            len(shared),
        )


def test_fast_minhash_recall_matches_portable(spark):
    """The xxhash64 fast path has no DuckDB oracle; pin its
    semantics instead — it must recover every true Jaccard>=0.8
    pair, exactly like the portable md5 family."""
    from aichemy_data_pipelines_spark.operators.dedup import (
        dedup_minhash_lsh_fast,
    )

    truth = _true_pairs(0.8)
    fast = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh_fast(spark, SF_SMOKE).collect()
    }
    missed = truth - fast
    assert not missed, f"fast LSH missed true near-dups: {sorted(missed)[:10]}"


def test_dedup_semantic_verdict_rule(spark):
    """SemDeDup greedy keep-lowest-id: a vector is dropped iff some
    LOWER-id vector in its k-means list sits at cosine >= tau —
    verified against an independent brute-force recomputation."""
    from decimal import Decimal

    from aichemy_data_pipelines_spark.operators.ivf import _kmeans
    from aichemy_data_pipelines_spark.operators.semdedup import (
        _TAU,
        dedup_semantic,
    )

    sf = SF_SMOKE
    got = {r.vec_id: r for r in dedup_semantic(spark, sf).collect()}
    assert len(got) == 500
    _, lists = _kmeans(spark, sf)
    rows = lists.collect()
    by_list: dict[int, list] = {}
    for r in rows:
        by_list.setdefault(r.list_id, []).append(r)

    def cos(a, b):
        da = [Decimal(str(float(x))) for x in a]
        db = [Decimal(str(float(x))) for x in b]
        num = float(sum(x * y for x, y in zip(da, db)))
        la = float(sum(x * x for x, x2 in zip(da, da)))
        lb = float(sum(x * x for x, x2 in zip(db, db)))
        return round(num / (la**0.5 * lb**0.5), 8)

    import random

    rng = random.Random(3)
    for lid, members in by_list.items():
        sample = rng.sample(members, min(8, len(members)))
        for m in sample:
            n_dups = sum(
                1
                for o in members
                if o.vec_id < m.vec_id
                and cos(m.embedding, o.embedding) >= _TAU
            )
            assert got[m.vec_id].n_sem_dups == n_dups, m.vec_id
            assert got[m.vec_id].keep == (n_dups == 0)


def test_incremental_dedup_consistent_with_full_lsh(spark):
    """Batch-vs-corpus incremental screening must agree with the full
    all-pairs LSH restricted to (batch, corpus) pairs — the index cut
    changes the plan, never the verdicts."""
    from aichemy_data_pipelines_spark.operators.dedup import (
        _INCR_MOD,
        dedup_incremental,
        dedup_minhash_lsh,
    )

    full = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()
    }
    expected: dict[int, int] = {}
    for a, b in full:
        a_new, b_new = a % _INCR_MOD == 0, b % _INCR_MOD == 0
        if a_new and not b_new:
            expected[a] = expected.get(a, 0) + 1
        elif b_new and not a_new:
            expected[b] = expected.get(b, 0) + 1

    got = {
        r.doc_id: r.n_corpus_matches
        for r in dedup_incremental(spark, SF_SMOKE).collect()
    }
    assert len(got) == 50  # every batch doc gets a verdict
    for doc_id, n in got.items():
        assert n == expected.get(doc_id, 0), doc_id
    assert any(n > 0 for n in got.values())  # some dups found


def test_containment_dominates_jaccard(spark):
    """On every candidate pair: max(containment_a, containment_b)
    >= jaccard (set algebra), containments bounded in [0,1], and the
    planted exact dups reach containment 1.0 on both sides."""
    from aichemy_data_pipelines_spark.operators.dedup import (
        dedup_containment,
        dedup_ngram_jaccard,
    )
    from tests.conftest import SF_SMOKE

    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    }
    rows = dedup_containment(spark, SF_SMOKE).collect()
    assert set(jac) == {(r.doc_a, r.doc_b) for r in rows}
    assert rows
    saw_full = False
    for r in rows:
        assert 0.0 <= r.containment_a <= 1.0
        assert 0.0 <= r.containment_b <= 1.0
        assert max(r.containment_a, r.containment_b) >= jac[(r.doc_a, r.doc_b)] - 1e-9
        if max(r.containment_a, r.containment_b) == 1.0:
            saw_full = True
    assert saw_full, (
        "planted near-dups must reach containment 1.0 on the contained side"
    )


def test_cluster_stats_consistency(spark):
    """Histogram totals must reconcile with the per-doc cluster table
    and the keep-one verdicts."""
    from aichemy_data_pipelines_spark.operators.clustering import (
        dedup_cluster_stats,
    )
    from aichemy_data_pipelines_spark.operators.corpus_ops import dedup_keep_one
    from tests.conftest import SF_SMOKE

    stats = dedup_cluster_stats(spark, SF_SMOKE).collect()
    n_docs_total = spark.read.parquet(
        f"{SF_SMOKE}/documents.parquet"
    ).count()
    assert sum(r.n_docs for r in stats) == n_docs_total
    for r in stats:
        assert r.n_docs == r.size * r.n_clusters
        assert r.n_dropped == (r.size - 1) * r.n_clusters
    dropped = sum(r.n_dropped for r in stats)
    keep = dedup_keep_one(spark, SF_SMOKE).collect()
    assert dropped == sum(1 for r in keep if not r.keep)


def test_reliable_checkpoint_path_matches_local(spark, tmp_path):
    """dedup_clusters(reliable_dir=...) must produce the identical
    labeling through durable checkpoint() (the cluster-scale path —
    localCheckpoint forfeits the iteration on executor loss) and
    actually materialize checkpoint data under the given dir."""
    import os

    from aichemy_data_pipelines_spark.operators.clustering import (
        dedup_clusters,
        dedup_clusters_star,
    )

    base = sorted(
        tuple(r) for r in dedup_clusters(spark, SF_SMOKE).collect()
    )
    ck = str(tmp_path / "ckpt")
    rel = sorted(
        tuple(r)
        for r in dedup_clusters(spark, SF_SMOKE, reliable_dir=ck).collect()
    )
    assert rel == base
    assert any(os.scandir(ck)), "no reliable checkpoint data written"

    ck2 = str(tmp_path / "ckpt_star")
    rel_star = sorted(
        tuple(r)
        for r in dedup_clusters_star(
            spark, SF_SMOKE, reliable_dir=ck2
        ).collect()
    )
    assert rel_star == base
