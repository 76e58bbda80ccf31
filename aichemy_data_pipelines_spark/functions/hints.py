"""Join-strategy hint guards.

``F.broadcast`` is an ORDER, not a suggestion: Spark will build the
broadcast relation even when it is far past safe size, and the failure
mode at 100 TB is a driver/executor OOM hours into a job.  The rule
this module encodes:

* Hint broadcast ONLY for sides with a *stated, checked* bound
  (a benchmark eval split, a query batch, a fixed top-N) — and check
  the bound at runtime with a cheap count so a misuse fails over to a
  shuffle join loudly instead of OOMing silently.
* Leave genuinely unbounded-but-usually-smallish sides (vocabularies,
  document-frequency tables) UNHINTED and let AQE pick broadcast from
  runtime statistics when it actually fits.

``broadcast_when`` implements the first rule.  Callers count a cheap
proxy of the side (a column-pruned scan) rather than the exploded
side itself, so the guard costs one metadata-cheap job, not a second
pass over the heavy derivation — but the THRESHOLD is stated in
estimated rows OF THE HINTED SIDE, so every caller must scale its
proxy by the per-row fanout of the derivation it actually
broadcasts (shingles per doc, weights per query, bands per doc).
A doc-count guard against a doc-count bound would admit multi-GB
exploded broadcasts — the exact OOM this module exists to prevent.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# Conf keys (override per-session to tighten/loosen the guards; tests
# set them to 0 to force the fallback path).  Every bound is in
# estimated ROWS OF THE BROADCAST SIDE — callers convert their cheap
# proxy (doc counts, char sums) into that unit before comparing.
DECONTAM_MAX_EVAL_ROWS = "spark.graft.decontam.maxBroadcastEvalRows"
RAG_MAX_QUERY_ROWS = "spark.graft.rag.maxBroadcastQueryRows"
DEDUP_MAX_BATCH_ROWS = "spark.graft.dedup.maxBroadcastBatchRows"
COMPLIANCE_MAX_COHORT = "spark.graft.compliance.maxBroadcastCohort"
# ~10M smallish rows ≈ low-hundreds of MB broadcast relation — the
# conventional upper edge of safe for a forced broadcast
DEFAULT_MAX_BROADCAST_ROWS = 10_000_000


def conf_int(spark: SparkSession, key: str, default: int) -> int:
    """Integer session conf with a default (unset → default)."""
    return int(spark.conf.get(key, str(default)))


def broadcast_when(
    side: DataFrame, n_proxy: int, max_rows: int, what: str
) -> DataFrame:
    """Return ``F.broadcast(side)`` when the measured proxy count is
    within the stated bound, else the unhinted ``side`` (AQE / shuffle
    join) with a loud warning.

    ``n_proxy`` is a cheap upper-bound-ish cardinality for the side —
    e.g. the number of eval *documents* guarding a broadcast of their
    exploded shingles.  The caller documents the precondition; this
    enforces it.
    """
    if n_proxy <= max_rows:
        return F.broadcast(side)
    log.warning(
        "%s: small-side proxy count %d exceeds broadcast guard %d; "
        "falling back to an unhinted join (AQE/shuffle). If this side "
        "is genuinely bounded, raise the guard conf.",
        what,
        n_proxy,
        max_rows,
    )
    return side
