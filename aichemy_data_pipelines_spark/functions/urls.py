"""URL → registered-domain extraction for domain-level curation.

The C4 / RefinedWeb corpus recipes cut quality and dedup decisions
"by registered domain" (the eTLD+1: ``docs.example.co.uk`` →
``example.co.uk``), so a crawl-scale engine needs the extraction as
a cheap, JVM-side column expression — one regexp + one split per
row, no UDF, fully inside whole-stage codegen.

Public-suffix handling is the bounded heuristic used by most
pipeline implementations: a short list of common multi-label
suffixes (``co.uk``-style second-level registries) promotes the cut
to three labels; everything else is eTLD+1 = last two labels. The
full Mozilla public-suffix list is a ~10k-entry broadcast join in
production; the registry below is deliberately small and editable.

The test corpus carries no URL column (documents key their feed by
``source``, which the domain-level operators treat as the domain —
see operators/domain_ops.py), so these expressions are pinned by
unit tests over literal URLs (tests/test_urls.py) rather than a
driver oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: common multi-label registries: a domain registered UNDER one of
#: these needs three labels to identify the registrant
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "co.nz",
)

#: scheme-optional authority grab: ``https://user@host:8080/p?q`` →
#: ``host``; also protocol-relative ``//host/p`` and bare
#: ``host:8080/p``. A scheme is only stripped together with its
#: ``//`` — a bare ``scheme:`` alternative would swallow the host of
#: scheme-less ``host:port`` inputs (``example.com:8080`` parses as
#: scheme ``example.com`` under RFC 3986's charset, returning the
#: PORT as the host). Group 1 stops at the first ``:``, ``/``, ``?``
#: or ``#``.
_HOST_RE = (
    r"^(?:[A-Za-z][A-Za-z0-9+.-]*://|//)?(?:[^/@?#]*@)?([^:/?#]+)"
)
#: bracketed IPv6 authority (``https://[2001:db8::1]:8080/x``) — the
#: plain grab would stop at the first ``:`` inside the address
_HOST6_RE = (
    r"^(?:[A-Za-z][A-Za-z0-9+.-]*://|//)?(?:[^/@?#]*@)?\[([^\]]+)\]"
)


def url_host(url: Column | str) -> Column:
    """Lower-cased hostname of a URL-ish string ('' when absent).
    Trailing-dot FQDNs (``example.com.``) are normalized to the
    dotless form so they don't split into an empty last label;
    bracketed IPv6 literals come back without the brackets."""
    c = F.col(url) if isinstance(url, str) else url
    host6 = F.regexp_extract(c, _HOST6_RE, 1)
    return F.lower(
        F.when(host6 != "", host6).otherwise(
            F.regexp_replace(
                F.regexp_extract(c, _HOST_RE, 1), r"\.+$", ""
            )
        )
    )


#: tracking parameters dropped by canonicalization — checked with
#: plain substr/equality (portable to the DuckDB oracle verbatim;
#: LIKE would need '_'-escaping in both dialects)
_TRACKING_PREFIXES = ("utm_", "gclid", "fbclid")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_PORT_RE = (
    r"^(?:[A-Za-z][A-Za-z0-9+.-]*://|//)?(?:[^/@?#]*@)?[^:/?#]+:([0-9]+)"
)
#: bracketed-IPv6 port — the plain grab stops at the address's own
#: colons, so without this branch ':8080' and ':9090' variants of
#: the same IPv6 authority canonicalized identically (r16 ADVICE #3:
#: unlike the www/slash rules, that merges genuinely DIFFERENT pages)
_PORT6_RE = (
    r"^(?:[A-Za-z][A-Za-z0-9+.-]*://|//)?(?:[^/@?#]*@)?\[[^\]]+\]"
    r":([0-9]+)"
)
# path group is OPTIONAL ((...)? not (...)): with a mandatory group,
# a path-less authority ("https://example.com?x") makes the engine
# BACKTRACK out of the optional scheme match and capture
# "//example.com" as the path — the optional group removes the
# backtracking incentive in both engines (Java regex and RE2 return
# '' / non-participating for the absent group)
_PATH_RE = r"^(?:[A-Za-z][A-Za-z0-9+.-]*://|//)?[^/?#]*(/[^?#]*)?"
# anchored prefix scan (r16 ADVICE #1): [^#?]* cannot cross a '#' OR
# a '?', so the group captures from the FIRST '?' and only when it
# precedes any '#' — a fragment-only '?' (SPA routes like
# http://host/#/route?page=2) no longer leaks fragment content into
# the canonical query. The unanchored predecessor (\?([^#]*)) matched
# the '?' inside the fragment.
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def canonical_url(url: Column | str) -> Column:
    """Crawl-grade URL canonicalization as a pure column expression —
    the keep-one key for URL-level dedup, the cheapest
    highest-frequency cut real crawl pipelines (C4/RefinedWeb/Dolma
    variants) run before any content pass:

    - scheme lower-cased ('' → http);
    - host lower-cased via :func:`url_host` (userinfo/trailing-dot
      handled there), leading ``www.`` stripped; bracketed IPv6
      literals KEEP their brackets (the canonical form must carry a
      non-default port, and ``[::1]:8080`` is the only unambiguous
      spelling);
    - default ports dropped (80 for http, 443 for https; others
      kept — via the IPv6-aware branch for bracketed authorities);
    - path: trailing slashes stripped (``/`` → '');
    - query: tracking params dropped (utm_*, gclid, fbclid),
      remainder SORTED and re-joined (param order is not identity);
    - fragment dropped.

    All regex/HOF, no UDF, inside whole-stage codegen; the DuckDB
    twin is operators/urls_ops.sql_canonical_url — parity pinned over
    literal URLs in tests/test_urls.py and by the driver oracle for
    ``urls_canonical_dedup``.
    """
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(c, _SCHEME_RE, 1))
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    host6 = F.lower(F.regexp_extract(c, _HOST6_RE, 1))
    host = F.when(
        host6 != "", F.concat(F.lit("["), host6, F.lit("]"))
    ).otherwise(F.regexp_replace(url_host(c), r"^www\.", ""))
    port = F.when(
        host6 != "", F.regexp_extract(c, _PORT6_RE, 1)
    ).otherwise(F.regexp_extract(c, _PORT_RE, 1))
    port = F.when(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(
        F.regexp_extract(c, _PATH_RE, 1), r"/+$", ""
    )
    rawq = F.regexp_extract(c, _QUERY_RE, 1)
    params = F.split(rawq, "&")
    kept = F.filter(
        params,
        lambda p: (p != "")
        & (F.substring(p, 1, 4) != "utm_")
        & (F.substring(p, 1, 6) != "gclid=")
        & (p != "gclid")
        & (F.substring(p, 1, 7) != "fbclid=")
        & (p != "fbclid"),
    )
    query = F.concat_ws("&", F.array_sort(kept))
    query = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), query)
    )
    return F.concat(scheme, F.lit("://"), host, port, path, query)


def registered_domain(url: Column | str) -> Column:
    """eTLD+1 of a URL or bare hostname, as a pure column expression.

    - IPv4 literals pass through whole (no registrant to cut to);
      IPv6 literals contain no dots so they pass through via the
      single-label rule (dotted IPv4-mapped forms are the known
      exception and would be cut — irrelevant to crawl keying).
    - Single-label hosts (``localhost``) pass through whole.
    - Hosts under a :data:`MULTI_LABEL_SUFFIXES` registry keep three
      labels; everything else keeps two.
    """
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    is_ipv4 = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return (
        F.when(is_ipv4 | (n <= 1), host)
        .when((n >= 3) & last2.isin(*MULTI_LABEL_SUFFIXES), last3)
        .otherwise(last2)
    )
