"""URL canonicalization + URL-level dedup (r15 verdict #5b) — the
cheapest highest-frequency dedup cut real crawl pipelines run FIRST:
the same page is fetched under scheme/case/www/default-port/
trailing-slash/param-order/tracking-param/fragment variants, and
keying the crawl by canonical URL collapses them before any content
byte is compared.

The canonicalizer is ``functions/urls.canonical_url`` (pure column
expressions — regex + array HOFs, no UDF); this module's
``sql_canonical_url`` is its DuckDB twin, so the whole pass is
oracle-checked end-to-end. Parity over adversarial literal URLs
(userinfo, IPv6, bare hosts, tracking-only queries) is additionally
pinned in tests/test_urls.py.

The test corpus carries no URL column (functions/urls.py module
docstring), so ``urls_canonical_dedup`` SYNTHESIZES a deterministic
noisy URL per document IN-PLAN from md5 bits of doc_id — identically
in both engines — covering every variant class above. The synthesis
is test input, not operator logic: a production run points the same
canonicalize → keep-one plan at a real url column.

Scale: canonicalization is a pure map (regex inside whole-stage
codegen); the keep-one is ONE groupBy on the canonical string —
content-addressed, uniform, map-side combinable. No UDFs, no joins,
no driver state: this is a free pass at 100 TB, which is exactly why
crawls run it first.

Reference parity: the reference keys its discovery/verify ledger by
normalized file path (dags/msconvert_dag.py:176-221); canonical-URL
keying is the crawl-scale generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.urls import (
    _HOST6_RE,
    _HOST_RE,
    _PATH_RE,
    _PORT6_RE,
    _PORT_RE,
    _QUERY_RE,
    _SCHEME_RE,
    canonical_url,
)


def _raw_url_expr(digit, strcast) -> str:
    """Deterministic noisy URL from md5(doc_id) hex-digit parities —
    one template rendered per dialect (``digit(k)`` → the k-th hex
    digit's parity expression, ``strcast(x)`` → string cast), so the
    two engines cannot drift. Variants covered: scheme http/https ×
    case noise, www. prefix, host case noise, explicit DEFAULT port,
    trailing slash, param order, utm_* tracking params, fragment."""
    b = {k: digit(k) for k in range(1, 10)}
    sch = f"(case when {b[1]} = 0 then 'https' else 'http' end)"
    host = (
        f"concat((case when {b[3]} = 0 then 'www.' else '' end), "
        f"source, '.Example.COM')"
    )
    return (
        "concat("
        f"(case when {b[2]} = 0 then upper({sch}) else {sch} end), "
        "'://', "
        f"(case when {b[4]} = 0 then upper({host}) else {host} end), "
        f"(case when {b[5]} = 0 then (case when {b[1]} = 0 "
        "then ':443' else ':80' end) else '' end), "
        f"'/docs/', {strcast('doc_id % 10')}, "
        f"(case when {b[6]} = 0 then '/' else '' end), "
        "'?', "
        f"(case when {b[7]} = 0 then "
        f"concat('ref=', {strcast('doc_id % 3')}, '&utm_source=feed') "
        f"else concat('utm_source=feed&ref=', {strcast('doc_id % 3')}) "
        "end), "
        f"(case when {b[8]} = 0 then '&utm_campaign=x' else '' end), "
        f"(case when {b[9]} = 0 then '#top' else '' end))"
    )


def spark_raw_url() -> str:
    return _raw_url_expr(
        digit=lambda k: (
            f"(cast(conv(substr(md5(cast(doc_id as string)), {k}, 1), "
            f"16, 10) as int) % 2)"
        ),
        strcast=lambda x: f"cast({x} as string)",
    )


def sql_raw_url() -> str:
    return _raw_url_expr(
        digit=lambda k: (
            f"(('0x' || substr(md5(doc_id::VARCHAR), {k}, 1))::INT % 2)"
        ),
        strcast=lambda x: f"CAST({x} AS VARCHAR)",
    )


def sql_canonical_url(u: str) -> str:
    """DuckDB twin of functions/urls.canonical_url over the string
    expression ``u`` — same regexes, same tracking-param substr
    checks, same assembly order. Every regexp_extract is COALESCEd:
    DuckDB returns NULL (not '') on a no-match/non-participating
    group, and a NULL component would NULL the whole concat."""

    def ext(pattern: str) -> str:
        return f"COALESCE(regexp_extract({u}, '{pattern}', 1), '')"

    scheme0 = f"lower({ext(_SCHEME_RE)})"
    scheme = f"(CASE WHEN {scheme0} = '' THEN 'http' ELSE {scheme0} END)"
    host6 = ext(_HOST6_RE)
    hostp = f"regexp_replace({ext(_HOST_RE)}, " r"'\.+$', '')"
    # bracketed IPv6 keeps its brackets in the canonical form (the
    # functions/urls.canonical_url r17 contract — a non-default port
    # needs them); plain hosts strip trailing dots and leading www.
    host = (
        f"(CASE WHEN {host6} <> '' THEN '[' || lower({host6}) || ']' "
        f"ELSE regexp_replace(lower({hostp}), '^www\\.', '') END)"
    )
    port0 = (
        f"(CASE WHEN {host6} <> '' THEN {ext(_PORT6_RE)} "
        f"ELSE {ext(_PORT_RE)} END)"
    )
    port = (
        f"(CASE WHEN ({scheme} = 'http' AND {port0} = '80') "
        f"OR ({scheme} = 'https' AND {port0} = '443') "
        f"OR {port0} = '' THEN '' ELSE ':' || {port0} END)"
    )
    path = f"regexp_replace({ext(_PATH_RE)}, '/+$', '')"
    kept = (
        f"list_filter(string_split({ext(_QUERY_RE)}, "
        "'&'), p -> p <> '' AND substr(p, 1, 4) <> 'utm_' "
        "AND substr(p, 1, 6) <> 'gclid=' AND p <> 'gclid' "
        "AND substr(p, 1, 7) <> 'fbclid=' AND p <> 'fbclid')"
    )
    # COALESCE: DuckDB's array_to_string of an EMPTY list is NULL
    q0 = f"COALESCE(array_to_string(list_sort({kept}), '&'), '')"
    query = f"(CASE WHEN {q0} = '' THEN '' ELSE '?' || {q0} END)"
    return f"({scheme} || '://' || {host} || {port} || {path} || {query})"


def urls_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL keep-one over the synthesized per-document URL
    column: one row per canonical URL with its crawl-duplicate spread.

    Output: (canonical_url, n_urls, n_raw_variants, keep_id) —
    n_urls = fetches collapsing to this key, n_raw_variants =
    distinct raw spellings among them, keep_id = min doc_id (the
    canonical copy curation keeps).
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .withColumn("raw_url", F.expr(spark_raw_url()))
        .withColumn("canonical_url", canonical_url(F.col("raw_url")))
    )
    return d.groupBy("canonical_url").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.countDistinct("raw_url").cast("long").alias("n_raw_variants"),
        F.min("doc_id").alias("keep_id"),
    )


QUERIES = {"urls_canonical_dedup": urls_canonical_dedup}

ORACLE = {
    "urls_canonical_dedup": f"""
        WITH raw AS (
            SELECT doc_id, {sql_raw_url()} AS raw_url
            FROM documents
        ), canon AS (
            SELECT doc_id, raw_url,
                   {sql_canonical_url('raw_url')} AS canonical_url
            FROM raw
        )
        SELECT canonical_url,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_raw_variants,
               MIN(doc_id) AS keep_id
        FROM canon GROUP BY canonical_url
    """,
}
