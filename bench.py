#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Warm-up protocol: before timing, each headline query runs once at
sf0.001 (plus one q6 run at SF_DIR) so codegen/JIT compilation and
file-listing caches are warm; the timed section then executes each
query at SF_DIR with ``collect()`` (results are small aggregates /
top-k) over N_PASSES=3 passes and records the per-query MINIMUM.
Timings therefore measure steady-state scan + shuffle + result-fetch
latency, not first-compile cost or scheduler-noise tails: measured
run-to-run noise on this rig is ±10-20% per query (see BASELINE.md's
variance table), and min-of-3 cuts most of it. BENCH_r01-r03 were
single-pass; the comparison is conservative (min-of-N <= any single
pass of the same distribution).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: scan-heavy (q1/q6), join-heavy (q5/q9/q18), window
# (sessionize/topk), dedup (minhash), similarity (ann), text.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q9_product_profit",
    "q18_large_volume_customer",
    "events_sessionize",
    "events_topk_per_user",
    "events_asof_join",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality",
]

# Corpus/LLM-data panel (r06 verdict #6): the headline set is
# relational/dedup-heavy, so the curation tier had no cross-round
# perf signal. Six representative ops, SAME min-of-N protocol,
# reported as a SECOND corpus_suite_total field — the frozen
# headline set above is untouched, keeping r01..r06 comparable.
CORPUS_SUITE = [
    "corpus_screens_matrix",
    "corpus_curation_funnel",
    "dedup_incremental",
    "ann_ivf_pq_topk",
    "text_bpe_tokencount",
    "corpus_bigram_perplexity",
]


def main() -> None:
    from aichemy_data_pipelines_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs]
    corpus_names = [n for n in CORPUS_SUITE if n in qs]
    # Warm codegen/JIT per operator family at the smallest SF so the
    # timed section measures steady-state throughput at SF_DIR, not
    # first-compile latency. (Same generated classes; 100x less data.)
    warm_sf = "/root/testdata/sf0.001"
    # Warm and time the HEADLINE set before any corpus query touches
    # the JVM: r07's protocol warmed the corpus suite first, which
    # put the headline loop under code-cache/GC pressure (IVF-PQ
    # training, BPE tables, screens-matrix codegen) that r01..r06
    # never had, confounding the cross-round comparison.
    for warm in names:
        qs[warm](spark, warm_sf).collect()
    qs["q6_revenue_forecast"](spark, SF_DIR).collect()

    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    samples: dict[str, list[float]] = {
        n: [] for n in names + corpus_names
    }
    for _ in range(n_passes):
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).collect()
            samples[name].append(round(time.perf_counter() - t0, 3))
    # Corpus panel second: its own warm-up, then its timed passes.
    for warm in corpus_names:
        qs[warm](spark, warm_sf).collect()
    for _ in range(n_passes):
        for name in corpus_names:
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).collect()
            samples[name].append(round(time.perf_counter() - t0, 3))

    # End-to-end corpus-build (r07 verdict #8): the MATERIALIZING
    # path (funnel verdicts → curated snapshot + sharded export, two
    # atomic table commits) gets its own perf signal — its member
    # queries alone don't time the write/commit side. Fresh output
    # dir per run, min-of-2, reported as a separate field so the
    # frozen headline/corpus sets stay comparable.
    import shutil
    import tempfile

    from aichemy_data_pipelines_spark.pipeline.corpus_build import (
        CorpusBuildConfig,
        CorpusBuildPipeline,
    )

    def _build_once(sfd: str) -> float:
        out = tempfile.mkdtemp(prefix="bench_corpus_build_")
        try:
            t0 = time.perf_counter()
            CorpusBuildPipeline(
                spark, CorpusBuildConfig(sf_dir=sfd, output_dir=out)
            ).build_once()
            return round(time.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(out, ignore_errors=True)

    _build_once(warm_sf)
    build_runs = [_build_once(SF_DIR) for _ in range(2)]

    timings = {n: min(samples[n]) for n in names}
    corpus_timings = {n: min(samples[n]) for n in corpus_names}
    # Cross-protocol honesty (r04 ADVICE): r01-r03 recorded a single
    # pass, r04+ headline min-of-N. Report the per-pass totals and
    # first-pass total alongside so protocol effect and real speedup
    # stay separable in cross-round comparisons.
    pass_totals = [
        round(sum(samples[n][i] for n in names), 3) for i in range(n_passes)
    ]
    mean = sum(pass_totals) / n_passes
    stdev = (
        sum((t - mean) ** 2 for t in pass_totals) / (n_passes - 1)
    ) ** 0.5 if n_passes > 1 else 0.0

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    # Canary normalization (r8 verdict #6): cross-round totals move
    # ±30% with rig noise alone (BASELINE.md variance table). q6 (pure
    # scan+agg, plan untouched since r01) and q1 (scan-heavy, likewise
    # frozen) are rig canaries: dividing the total by each cancels the
    # rig's common-mode speed, so a cross-round ratio change signals a
    # real plan change, not a quieter machine. Interpretation rule in
    # BASELINE.md.
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "canary_q6_sec": timings.get("q6_revenue_forecast"),
                "canary_q1_sec": timings.get("q1_pricing_summary"),
                "total_per_q6": round(
                    total / timings["q6_revenue_forecast"], 3
                )
                if timings.get("q6_revenue_forecast")
                else None,
                "total_per_q1": round(
                    total / timings["q1_pricing_summary"], 3
                )
                if timings.get("q1_pricing_summary")
                else None,
                "protocol": f"per-query min of {n_passes} passes",
                "single_pass_total_first": pass_totals[0],
                "single_pass_totals": pass_totals,
                "single_pass_mean": round(mean, 3),
                "single_pass_stdev": round(stdev, 3),
                "corpus_suite_total": round(
                    sum(corpus_timings.values()), 3
                ),
                "corpus_queries": corpus_timings,
                "corpus_build_sec": min(build_runs),
                "corpus_build_runs": build_runs,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
