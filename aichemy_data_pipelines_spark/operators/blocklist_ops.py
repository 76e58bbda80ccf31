"""Blocklist document filter — the C4-style badwords/domain cut real
crawl pipelines run alongside URL canonicalization (r16 verdict #4a):
a frozen term blocklist and a frozen source/domain blocklist, each
document scored by how hard it hits them, with a single blocked
verdict the curation funnel can consume (it joins
``corpus_screens_matrix`` as the seventh screen).

Design (Spark-first, oracle-exact):

* the TERM list is tiny and frozen, so it inlines as literals into a
  pure-map column expression — ``n_term_hits`` counts occurrences
  (``filter`` over the token array), ``n_distinct_terms`` counts which
  blocklist entries appear at all (an unrolled CASE sum over the
  frozen terms — exactly portable, no reliance on either engine's
  list_intersect dedup semantics). At a production 10k-entry list the
  same plan swaps the literal array for a broadcast join against the
  exploded token column; the verdict shape is unchanged.
* the DOMAIN list keys on ``source`` (the corpus's domain column —
  operators/domain_ops.py convention); a real crawl keys on
  functions/urls.registered_domain over its url column.
* verdict: blocked ⟺ domain blocked OR ≥ ``_MAX_TERM_HITS`` term
  occurrences — count-thresholded like C4's badwords pass, so a
  single incidental use does not censor a document.

Scale: one pure-map pass inside whole-stage codegen — no join, no
shuffle, no UDF; the cheapest screen in the matrix, which is why
crawls run blocklists first. ``_BLOCK_TERMS`` includes a term the
test corpus never contains ("leak") — real blocklists carry mostly
absent terms, and the zero-hit path must stay correct.

Reference parity: the reference screens its inputs by configured
glob/extension allowlists (dags/msconvert_dag.py:176-221 discovery);
term/domain blocklists are the crawl-scale generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.text import (
    SPARK_TOKENS,
    SQL_TOKENS,
)

#: frozen blocklists — changing them changes oracle results
_BLOCK_TERMS = ("slow", "dup", "leak")
_BLOCK_SOURCES = ("src7", "src13")
#: occurrence threshold: fewer hits than this (and a clean domain)
#: keeps the document
_MAX_TERM_HITS = 3


def docs_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document blocklist verdict.

    Output: (doc_id, source, n_term_hits, n_distinct_terms,
    domain_blocked, blocked).
    """
    terms = ", ".join(f"'{t}'" for t in _BLOCK_TERMS)
    hits = (
        f"size(filter({SPARK_TOKENS}, "
        f"t -> array_contains(array({terms}), t)))"
    )
    distinct = " + ".join(
        f"(case when array_contains({SPARK_TOKENS}, '{t}') "
        "then 1 else 0 end)"
        for t in _BLOCK_TERMS
    )
    srcs = ", ".join(f"'{s}'" for s in _BLOCK_SOURCES)
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.expr(hits).cast("int").alias("n_term_hits"),
            F.expr(distinct).cast("int").alias("n_distinct_terms"),
            F.expr(f"source in ({srcs})").alias("domain_blocked"),
        )
        .withColumn(
            "blocked",
            F.col("domain_blocked")
            | (F.col("n_term_hits") >= _MAX_TERM_HITS),
        )
    )


QUERIES = {"docs_blocklist_filter": docs_blocklist_filter}


def _sql_blocklist_core() -> str:
    """The verdict SELECT body, shared between the standalone oracle
    and corpus_screens_matrix's seventh-screen CTE."""
    terms = ", ".join(f"'{t}'" for t in _BLOCK_TERMS)
    distinct = " + ".join(
        f"(CASE WHEN list_contains({SQL_TOKENS}, '{t}') "
        "THEN 1 ELSE 0 END)"
        for t in _BLOCK_TERMS
    )
    srcs = ", ".join(f"'{s}'" for s in _BLOCK_SOURCES)
    return f"""
        SELECT doc_id, source,
               CAST(len(list_filter({SQL_TOKENS},
                        t -> list_contains([{terms}], t)))
                    AS INTEGER) AS n_term_hits,
               CAST({distinct} AS INTEGER) AS n_distinct_terms,
               source IN ({srcs}) AS domain_blocked,
               source IN ({srcs})
                 OR len(list_filter({SQL_TOKENS},
                        t -> list_contains([{terms}], t)))
                    >= {_MAX_TERM_HITS} AS blocked
        FROM documents
    """


ORACLE = {"docs_blocklist_filter": _sql_blocklist_core()}
