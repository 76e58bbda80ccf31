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
