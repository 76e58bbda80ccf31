"""Bloom-filter benchmark decontamination — the space-bounded twin of
``corpus_ops.decontam_ngram_overlap`` for eval suites too large to
broadcast exactly (the 100 TB decontamination path; round-10 verdict
widening item 6b).

The exact pass broadcasts the eval set's distinct 8-gram shingles —
correct while a benchmark suite is benchmark-sized, and guarded to
fall back to a shuffle when it is not. At frontier scale the
"eval" side can be every released benchmark plus every held-out
split: billions of shingles, too big to broadcast as strings. The
Bloom filter caps that side at a CONSTANT ``_M`` bit positions
(here 2^16; a production run sizes M to its false-positive budget):

* BUILD: each distinct eval shingle sets ``_KH`` = 3 bit positions —
  the three low 16-bit limbs of its portable 60-bit md5 base
  (functions/hashing.py), so the k hash functions cost ZERO extra
  hashing over the one md5/shingle the dedup stack already pays.
  The bit set is ≤ ``_M`` rows BY CONSTRUCTION — genuinely
  constant-bounded, broadcastable at any corpus size (unlike the
  exact pass's row-count-guarded eval side).
* PROBE: each training shingle computes the same 3 positions and is
  bloom-positive iff ALL 3 are set — an equi-join against the bit
  set + a count-equals-k check per shingle. One-sided error by
  construction: every truly-shared shingle hits (no false
  negatives — the property decontamination needs), and a clean
  shingle false-positives with p ≈ (set_bits/M)^3.

Output: one row per TRAINING doc — (doc_id, n_shingles,
n_bloom_hits, contaminated). Zero-hit docs are included (the audit
view a release gate wants); ``contaminated`` flags ≥ 1 hit. Compare
with decontam_ngram_overlap to measure the realized false-positive
rate (tests/test_round11_ops.py::test_bloom_decontam_exact_recall
pins exact-pass recall = 100%).

Float portability: everything is integer (bit positions, counts) —
the whole query is hash-exact with no rounding discipline needed.

Scale: the eval side collapses to ≤ ``_M`` integer rows before its
ONE broadcast; the training side is one shingle explode (index-
exploded, O(len)) fanned 3× to probe rows, one map-side hash join,
two bounded aggs. No corpus-sized shuffle of shingle STRINGS ever
happens — only 2-byte positions move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.layout import spread_small_input
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
    exploded_shingles,
    sql_shingles,
)

_N = 8  # shingle width — same evidence bar as decontam_ngram_overlap
_EVAL_MOD = 10  # doc_id % 10 == 0 plays the held-out eval split
_M = 65536  # bit-space size = one 16-bit limb's range
_KH = 3  # hash functions = the three low md5 limbs

# the portable 60-bit md5 base (functions/hashing.py recipe) and its
# three low 16-bit limbs — one md5 per shingle, zero extra hashing
_SPARK_BASE = "cast(conv(substr(md5(sh),1,15),16,10) as bigint)"
_SQL_BASE = "('0x' || substr(md5(sh),1,15))::BIGINT"


def _spark_positions(df: DataFrame) -> DataFrame:
    """(doc_id, sh-hash base h, pos): 3 probe rows per shingle."""
    return (
        df.select("doc_id", F.expr(_SPARK_BASE).alias("h"))
        .select(
            "doc_id",
            "h",
            F.explode(
                F.expr(
                    "array(h % 65536, (h div 65536) % 65536, "
                    "(h div 4294967296) % 65536)"
                )
            ).alias("pos"),
        )
    )


def decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination screen over the training split.

    Output: (doc_id, n_shingles, n_bloom_hits, contaminated) — one
    row per training doc; n_shingles counts its distinct 8-grams,
    n_bloom_hits those that are bloom-positive against the eval
    filter (includes Bloom false positives — the screen's documented
    one-sided error), contaminated = n_bloom_hits > 0.
    """
    d = exploded_shingles(
        load_table(spark, sf_dir, "documents")
        .transform(spread_small_input)
        .select("doc_id", F.expr(SPARK_TOKENS).alias("tokens"))
        .where(F.size("tokens") >= _N),
        _N,
        "sh",
    ).distinct()
    bits = (
        _spark_positions(d.where(F.col("doc_id") % _EVAL_MOD == 0))
        .select("pos")
        .distinct()
    )
    tr = _spark_positions(d.where(F.col("doc_id") % _EVAL_MOD != 0))
    hits = (
        tr.join(
            # ≤ _M rows BY CONSTRUCTION — the hint needs no row-count
            # guard, which is the entire point of the Bloom variant
            F.broadcast(bits.withColumn("set_", F.lit(1))),
            "pos",
            "left",
        )
        .groupBy("doc_id", "h")
        .agg(
            (F.sum(F.coalesce("set_", F.lit(0))) == _KH)
            .cast("int")
            .alias("hit")
        )
    )
    return hits.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.sum("hit").cast("long").alias("n_bloom_hits"),
        (F.sum("hit") > 0).alias("contaminated"),
    )


QUERIES = {"decontam_bloom": decontam_bloom}

_SQL_POS = """
        SELECT doc_id, h,
               unnest([h % 65536, (h // 65536) % 65536,
                       (h // 4294967296) % 65536]) AS pos
        FROM (SELECT doc_id, {base} AS h FROM {src})
"""

ORACLE = {
    "decontam_bloom": f"""
        WITH toks AS (
            SELECT doc_id, {SQL_TOKENS} AS tokens FROM documents
        ), d AS (
            SELECT DISTINCT doc_id, sh FROM (
                SELECT doc_id, unnest({sql_shingles('tokens', _N)}) AS sh
                FROM toks WHERE len(tokens) >= {_N}
            )
        ), bits AS (
            SELECT DISTINCT pos FROM (
                {_SQL_POS.format(base=_SQL_BASE,
                                 src=f"(SELECT * FROM d WHERE doc_id % {_EVAL_MOD} = 0)")}
            )
        ), tr AS (
            {_SQL_POS.format(base=_SQL_BASE,
                             src=f"(SELECT * FROM d WHERE doc_id % {_EVAL_MOD} <> 0)")}
        ), hits AS (
            SELECT tr.doc_id, tr.h,
                   CASE WHEN SUM(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END)
                             = {_KH} THEN 1 ELSE 0 END AS hit
            FROM tr LEFT JOIN bits b ON tr.pos = b.pos
            GROUP BY tr.doc_id, tr.h
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(hit) AS BIGINT) AS n_bloom_hits,
               SUM(hit) > 0 AS contaminated
        FROM hits GROUP BY doc_id
    """,
}


def bloom_bits_from_docs(docs: DataFrame) -> DataFrame:
    """Build the eval-side Bloom bit set from an arbitrary benchmark
    frame (doc_id, text). NOTE: the bits-construction and the
    hits-test below intentionally mirror decontam_bloom's inline
    CTE-shaped plan rather than factoring it out — decontam_bloom
    derives its eval AND train sides from ONE shared shingle frame
    (a shared-scan plan these standalone entry points cannot have),
    so a shared helper would force the worse plan on it. Any change
    to the membership semantics (_KH, the coalesce default, the
    distinct placement) must land in BOTH places.

    One distinct ``pos`` row per set bit —
    ≤ ``_M`` rows BY CONSTRUCTION, broadcastable at any eval-suite
    size. This is the artifact the streaming ingest gate
    (streaming/corpus_ingest.ingest_batch) holds frozen across
    micro-batches: build once when the stream starts, reject
    bloom-positive docs at ingest ever after."""
    d = exploded_shingles(
        docs.select("doc_id", F.expr(SPARK_TOKENS).alias("tokens")).where(
            F.size("tokens") >= _N
        ),
        _N,
        "sh",
    ).distinct()
    return _spark_positions(d).select("pos").distinct()


def bloom_contaminated_ids(batch: DataFrame, bits: DataFrame) -> DataFrame:
    """(doc_id) rows of ``batch`` docs that are bloom-positive
    against the eval bit set ``bits`` — some shingle hits all
    ``_KH`` positions (one-sided: every truly-shared shingle hits;
    clean docs can false-positive at p ≈ (set_bits/_M)^_KH, the
    documented Bloom trade a release gate accepts)."""
    d = exploded_shingles(
        batch.select("doc_id", F.expr(SPARK_TOKENS).alias("tokens")).where(
            F.size("tokens") >= _N
        ),
        _N,
        "sh",
    ).distinct()
    return (
        _spark_positions(d)
        .join(
            F.broadcast(bits.withColumn("set_", F.lit(1))), "pos", "left"
        )
        .groupBy("doc_id", "h")
        .agg((F.sum(F.coalesce("set_", F.lit(0))) == _KH).alias("hit"))
        .where("hit")
        .select("doc_id")
        .distinct()
    )
