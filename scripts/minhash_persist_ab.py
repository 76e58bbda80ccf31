"""A/B: dedup_minhash_lsh band-frame persist vs lazy re-evaluation.

Usage: python scripts/minhash_persist_ab.py [sf_dir] [n_passes]

Times collect() of the SAME pair query built two ways, alternating
A/B per pass in one session (warm JIT for both), reporting min/median.
The verdict-r18 question: does one evaluation + an eager
MEMORY_AND_DISK fill + cached reads beat two lazy evaluations of the
signature chain (one per join side) at the given SF?
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from aichemy_data_pipelines_spark.session import get_spark
    from aichemy_data_pipelines_spark.operators import dedup

    spark = get_spark(app_name="minhash_persist_ab")
    spark.sparkContext.setLogLevel("ERROR")

    # the operator itself is share-gated (r19) — force the gate ON
    # for the persisted arm so this stays a persist-vs-lazy A/B at
    # any SF; the lazy arm builds the ungated chain directly
    def persisted():
        spark.conf.set("spark.graft.shareScan.minInputBytes", "0")
        try:
            return dedup.dedup_minhash_lsh(spark, sf_dir)
        finally:
            spark.conf.unset("spark.graft.shareScan.minInputBytes")

    def lazy():
        return dedup._band_pairs(
            dedup._spark_band_keys(dedup._docs_with_shingles(spark, sf_dir))
        )

    # warm both plans (codegen/JIT) at the smallest SF
    warm = "/root/testdata/sf0.001"
    dedup.dedup_minhash_lsh(spark, warm).collect()
    dedup._band_pairs(
        dedup._spark_band_keys(dedup._docs_with_shingles(spark, warm))
    ).collect()

    t: dict[str, list[float]] = {"persisted": [], "lazy": []}
    for i in range(n):
        for label, build in (("persisted", persisted), ("lazy", lazy)):
            spark.sparkContext.setJobDescription(f"{label} pass {i}")
            t0 = time.perf_counter()
            build().collect()
            t[label].append(round(time.perf_counter() - t0, 3))
    for label, xs in t.items():
        print(
            f"{label:9s} min={min(xs):.3f} med={statistics.median(xs):.3f}"
            f" all={xs}"
        )


if __name__ == "__main__":
    main()
