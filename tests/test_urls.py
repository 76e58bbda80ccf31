"""functions/urls.py: URL → registered-domain extraction, pinned on
literal URLs (the test corpus carries no URL column — see the module
docstring; operators/domain_ops.py keys on ``source`` instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.functions.urls import (
    registered_domain,
    url_host,
)

CASES = [
    # (url, host, registered_domain)
    ("https://docs.example.com/a/b?q=1#f", "docs.example.com", "example.com"),
    ("http://example.com", "example.com", "example.com"),
    ("https://a.b.news.example.co.uk/x", "a.b.news.example.co.uk", "example.co.uk"),
    ("http://shop.example.com.au", "shop.example.com.au", "example.com.au"),
    ("ftp://User:pw@Files.Example.ORG:2121/pub", "files.example.org", "example.org"),
    ("//cdn.example.net/lib.js", "cdn.example.net", "example.net"),
    ("example.org/path", "example.org", "example.org"),
    ("www.sub.example.io", "www.sub.example.io", "example.io"),
    ("http://192.168.10.1:8080/admin", "192.168.10.1", "192.168.10.1"),
    ("http://localhost:3000", "localhost", "localhost"),
    ("https://co.uk", "co.uk", "co.uk"),
    # scheme-less host:port — ':8080' must not parse as a scheme
    ("example.com:8080/x", "example.com", "example.com"),
    ("localhost:3000", "localhost", "localhost"),
    # trailing-dot FQDN normalizes (would otherwise emit 'com.')
    ("https://example.com./x", "example.com", "example.com"),
    ("sub.example.org.", "sub.example.org", "example.org"),
    # bracketed IPv6: the plain grab would stop at the first ':'
    ("https://[2001:db8::1]:8080/x", "2001:db8::1", "2001:db8::1"),
    ("//[::1]/health", "::1", "::1"),
]


def test_host_and_registered_domain_on_literals(spark):
    df = spark.createDataFrame(
        [(u,) for u, _, _ in CASES], "url string"
    ).select(
        "url",
        url_host("url").alias("host"),
        registered_domain("url").alias("dom"),
    )
    got = {r.url: (r.host, r.dom) for r in df.collect()}
    for url, host, dom in CASES:
        assert got[url] == (host, dom), (url, got[url], (host, dom))


def test_registered_domain_is_codegen_expression(spark):
    """The extraction must stay JVM-side: no python UDF (BatchEvalPython)
    in the plan — it's regexp+split inside whole-stage codegen."""
    df = spark.range(1).select(
        registered_domain(
            F.lit("https://x.example.com/p")
        ).alias("d")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


CANON_CASES = [
    # (raw, canonical) — the r16 canonicalizer's contract
    ("HTTPS://WWW.Example.COM:443/docs/3/?utm_source=x&ref=2#top",
     "https://example.com/docs/3?ref=2"),
    ("http://example.com:80/", "http://example.com"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),
    ("example.com/a/b/", "http://example.com/a/b"),
    ("https://user:pw@sub.example.org./x?b=2&a=1",
     "https://sub.example.org/x?a=1&b=2"),
    ("https://example.com?utm_source=f&utm_campaign=x&gclid=1&fbclid=2",
     "https://example.com"),
    ("https://example.com/x?gclid", "https://example.com/x"),
    ("https://example.com/x?ref=&a=1", "https://example.com/x?a=1&ref="),
    ("//cdn.example.net/lib.js", "http://cdn.example.net/lib.js"),
    # bracketed IPv6 (r17, r16 ADVICE #3): brackets KEPT, non-default
    # ports re-attached via the IPv6-aware port branch — ':8080' and
    # ':9090' variants of the same address must key DIFFERENT pages
    ("https://[2001:db8::1]:8080/x", "https://[2001:db8::1]:8080/x"),
    ("https://[2001:db8::1]:9090/x", "https://[2001:db8::1]:9090/x"),
    ("https://[2001:DB8::1]:443/x", "https://[2001:db8::1]/x"),
    ("//[::1]/health", "http://[::1]/health"),
    ("https://www.example.com///", "https://example.com"),
    ("http://example.com#frag-only", "http://example.com"),
    # fragment-only '?' (r17, r16 ADVICE #1): SPA-route fragments must
    # not leak their content into the canonical query
    ("http://example.com/#/route?page=2", "http://example.com"),
    ("HTTP://example.com#a?b=1", "http://example.com"),
    # a second '?' is query CONTENT, not a new query (first-'?' rule)
    ("http://example.com/p?a=1?b=2", "http://example.com/p?a=1?b=2"),
]


def test_canonical_url_on_literals(spark):
    from aichemy_data_pipelines_spark.functions.urls import canonical_url

    df = spark.createDataFrame(
        [(u,) for u, _ in CANON_CASES], "url string"
    ).select("url", canonical_url("url").alias("canon"))
    got = {r.url: r.canon for r in df.collect()}
    for url, want in CANON_CASES:
        assert got[url] == want, (url, got[url], want)


def test_sql_canonical_url_matches_spark(spark):
    """The DuckDB twin (operators/urls_ops.sql_canonical_url) must
    canonicalize every literal case to the same string — the parity
    that lets urls_canonical_dedup be driver-oracle-checked."""
    import duckdb

    from aichemy_data_pipelines_spark.operators.urls_ops import (
        sql_canonical_url,
    )

    con = duckdb.connect()
    for url, want in CANON_CASES:
        got = con.sql(
            f"SELECT {sql_canonical_url('u')} AS c FROM "
            f"(SELECT ? AS u)", params=[url]
        ).fetchone()[0]
        assert got == want, (url, got, want)


def test_canonical_url_is_codegen_expression(spark):
    from aichemy_data_pipelines_spark.functions.urls import canonical_url

    df = spark.range(1).select(
        canonical_url(
            F.lit("https://WWW.Example.com/a/?utm_source=x&b=1")
        ).alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
