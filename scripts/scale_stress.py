"""10x scale-stress smoke (round-11 verdict task #5): synthesize a
deterministic ~10x documents/embeddings corpus under /tmp (the
read-only testdata is never touched), run the corpus/dedup/ANN panel
once at both scales IN THE SAME SESSION, and report wall-time ratios
plus plan-scan regressions — the closest this sandbox gets to
validating the per-operator "Scale:" notes empirically.

Synthesis (all deterministic, no RNG):
* documents: 10 copies; copy i shifts doc_id by i*10^7 and prefixes
  EVERY token with ``c<i>`` (regexp_replace with a capture group), so
  copies share no shingles — the corpus grows 10x with the same
  intra-copy duplicate structure instead of drowning in cross-copy
  exact dups (which would measure pair-explosion, not scaling).
  n_chars is recomputed from the rewritten text.
* embeddings: 10 copies; copy i shifts vec_id by i*10^7 and ROTATES
  the vector by i positions — decorrelates copies so the cosine /
  ANN ops scale in corpus size, not in cross-copy near-dup pairs.
* the other eight tables are byte-copied so any query can load them.

Usage: python scripts/scale_stress.py [--skip-heavy]
Writes /tmp/scale10x/, prints one line per (query, scale) and a
final ratio table. Ratios well above ~10x on a 10x corpus flag a
superlinear plan (the defect class tests/test_plans.py's scan
budgets pin); sublinear ratios are parallelism slack at test scale.

--x100 (r18, r17 verdict #4): second-decade stress — synthesize a
100x corpus (~500k documents / 200k embeddings, fits the sandbox)
under /tmp/scale100x and run the SCALE-CRITICAL panel only (both
pair generators, the routed graph generator, minhash, incremental
dedup/screen, screens matrix) at sf0.1 vs 100x. This is the regime
where the constructions' clamps actually engage: K hits the
_MAX_LISTS=1024 clamp (N/64 = 3125 > 1024 — lists grow past
_TARGET_LIST and nprobe sits at the 192 tier) and the banded tier
runs at planes=11+ where its B clamp starts costing recall — the
decision rules recorded in BASELINE.md are exercised, not
extrapolated. The banded k-NN GRAPH is EXCLUDED by default (its
measured ~N^1.6 wall curve predicts a multi-hour run at 100x — the
routed twin is the committed generator there; pass
--include-banded-graph to price it anyway). Embedding decorrelation
at 100 copies composes two orthogonal transforms (cyclic rotation
i mod dim, first-coordinate negation for i >= dim) — orthogonal ⇒
intra-copy cosine structure is preserved exactly while cross-copy
cosines scramble, the same rationale as the 10x rotation.
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale10x"
COPIES = 10
SHIFT = 10_000_000

DST100 = "/tmp/scale100x"
# the 100x scale-critical panel (r17 verdict #4): candidate
# generation + incremental screening + the composed screens capstone
# — the ops whose 100 TB stories rest on clamps that only engage in
# the second decade
PANEL100 = [
    "dedup_minhash_lsh",
    "dedup_incremental",
    "ann_incremental_screen",
    "dedup_embedding_cosine",
    "dedup_embedding_ivf",
    "ann_knn_graph_ivf",
    "corpus_screens_matrix",
]

PANEL = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "corpus_cross_contamination",
    "docs_boilerplate_fraction",
    "text_quality",
    "docs_gopher_quality",
    "text_langid_classifier",
    "decontam_bloom",
    "decontam_ngram_overlap",
    "decontam_token_report",
    "decontam_source_rollup",
    "dedup_lsh_fast_parity",
    "corpus_curriculum_mix",
    "corpus_perplexity_buckets",
    # the six screens members individually (r11 verdict #7: attribute
    # the matrix's 10x ratio member-by-member), then the matrix
    "text_readability",
    "corpus_bigram_perplexity",
    "dedup_keep_one",
    "corpus_dsir_weights",
    "corpus_screens_matrix",
    "embeddings_pq_encode",
    "ann_ivf_topk",
    "ann_pq_adc_topk",
    "dedup_embedding_cosine",
    # the banded-LSH and incremental-screen lines (r12 verdict #3)
    "ann_knn_graph",
    "ann_incremental_screen",
    "ann_cosine_topk",
    # the IVF-ROUTED twins (r17): both near-dup/graph generators ride
    # the panel so every future stress run re-prices the banded-vs-
    # routed decision rule recorded in BASELINE.md
    "dedup_embedding_ivf",
    "ann_knn_graph_ivf",
]
HEAVY = {"corpus_screens_matrix", "corpus_perplexity_buckets"}


def synthesize(spark, dst: str = DST, copies: int = COPIES) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for i in range(copies):
        c = docs
        if i > 0:
            c = (
                c.withColumn("doc_id", F.col("doc_id") + i * SHIFT)
                .withColumn(
                    "text",
                    F.regexp_replace("text", "([a-z0-9]+)", f"c{i}$1"),
                )
                .withColumn("n_chars", F.length("text"))
            )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.coalesce(8 if copies <= 10 else 16).write.mode(
        "overwrite"
    ).parquet(f"{dst}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for i in range(copies):
        c = emb
        if i > 0:
            # per-copy ORTHOGONAL transform (preserves intra-copy
            # cosines exactly, scrambles cross-copy ones): cyclic
            # rotation by i mod dim; past dim copies, compose a
            # first-coordinate negation (also orthogonal) so copy
            # dim+j never equals copy j
            c = c.withColumn("vec_id", F.col("vec_id") + i * SHIFT)
            rot = i % dim
            if rot:
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {rot + 1}, "
                        f"size(embedding) - {rot}), "
                        f"slice(embedding, 1, {rot}))"
                    ),
                )
            if i >= dim:
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, j) -> "
                        "case when j = 0 then cast(-x as float) "
                        "else x end)"
                    ),
                )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.coalesce(8 if copies <= 10 else 16).write.mode(
        "overwrite"
    ).parquet(f"{dst}/embeddings.parquet")

    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")


def scan_counts(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return dict(
        Counter(re.findall(r"Scan parquet .*?(\w+)\.parquet", plan))
    )


def main() -> None:
    skip_heavy = "--skip-heavy" in sys.argv
    x100 = "--x100" in sys.argv
    import __spark_entry__ as entry
    from aichemy_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="scale_stress")
    spark.sparkContext.setLogLevel("ERROR")
    if x100:
        label_big, dst, copies = "100x", DST100, 100
        panel = list(PANEL100)
        if "--include-banded-graph" in sys.argv:
            panel.insert(panel.index("ann_knn_graph_ivf"), "ann_knn_graph")
    else:
        label_big, dst, copies = "10x", DST, COPIES
        panel = PANEL
    print(f"synthesizing {label_big} corpus under", dst)
    t0 = time.time()
    synthesize(spark, dst, copies)
    print(f"synthesis done in {time.time() - t0:.1f}s")
    for t in ("documents", "embeddings"):
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"  {t}: {n} rows")

    qs = {}
    for mod in entry._suites():
        qs.update(mod.QUERIES)
    results = {}
    for name in panel:
        if skip_heavy and name in HEAVY:
            continue
        row = {}
        for label, sf_dir in (("sf0.1", SRC), (label_big, dst)):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            row[label] = dt
            row[f"rows_{label}"] = n
            row[f"scans_{label}"] = scan_counts(df)
            print(f"{name:32s} {label:5s} {dt:8.2f}s rows={n}")
        results[name] = row
    print(
        f"\n=== ratio table ({label_big} corpus / sf0.1, same session) ==="
    )
    print(
        f"{'query':34s} {'sf0.1':>8s} {label_big:>9s} {'ratio':>7s}"
        "  scan regress?"
    )
    for name, r in results.items():
        ratio = (
            r[label_big] / r["sf0.1"] if r["sf0.1"] > 0 else float("inf")
        )
        regress = (
            "YES " + str(r[f"scans_{label_big}"])
            if r[f"scans_{label_big}"] != r["scans_sf0.1"]
            else "no"
        )
        print(
            f"{name:34s} {r['sf0.1']:7.2f}s {r[label_big]:8.2f}s "
            f"{ratio:6.1f}x  {regress}"
        )


if __name__ == "__main__":
    main()
