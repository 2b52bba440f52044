"""URL canonicalization as pure codegen Columns — the crawl-frontier
dedup rules (RFC 3986 §6 syntax-based normalization, the subset every
crawler applies before frontier/seen-set membership):

- scheme and host lowercased
- default ports stripped (:80 http, :443 https)
- fragment removed
- duplicate slashes in the path collapsed; trailing slash dropped on
  non-root paths; empty path → '/'
- query parameters sorted by name (stable lexicographic on the whole
  `k=v` token) so `?b=2&a=1` and `?a=1&b=2` collapse

Unreserved percent-decoding is deliberately OUT of scope (it needs a
%XX table walk; these are the high-yield, always-safe rules).
Everything is regexp/split/array_sort/concat — zero Python, scan-speed
at 100 TB — and each rule has a DuckDB twin in plans/crawl.py so the
whole ruleset is oracle-hash-verified.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_parts(url: Column) -> tuple[Column, Column, Column, Column]:
    """(scheme, authority, path, query) — fragment dropped, scheme and
    authority lowercased."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    authority = F.lower(
        F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    path = F.regexp_extract(
        no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    query = F.regexp_extract(no_frag, r"\?([^#]*)", 1)
    return scheme, authority, path, query


def _strip_default_port(scheme: Column, authority: Column) -> Column:
    return (
        F.when(
            (scheme == "http") & authority.endswith(":80"),
            authority.substr(F.lit(1), F.length(authority) - 3),
        )
        .when(
            (scheme == "https") & authority.endswith(":443"),
            authority.substr(F.lit(1), F.length(authority) - 4),
        )
        .otherwise(authority)
    )


def _normalize_path(path: Column) -> Column:
    collapsed = F.regexp_replace(path, "/{2,}", "/")
    no_trail = F.when(
        (F.length(collapsed) > 1) & collapsed.endswith("/"),
        collapsed.substr(F.lit(1), F.length(collapsed) - 1),
    ).otherwise(collapsed)
    return F.when(F.length(no_trail) == 0, F.lit("/")).otherwise(no_trail)


def _normalize_query(query: Column) -> Column:
    return F.when(F.length(query) == 0, F.lit("")).otherwise(
        F.concat(
            F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&")
        )
    )


def canonical_url(url: Column) -> Column:
    """url → canonical URL string, one Column expression."""
    scheme, authority, path, query = url_parts(url)
    return F.concat(
        scheme,
        F.lit("://"),
        _strip_default_port(scheme, authority),
        _normalize_path(path),
        _normalize_query(query),
    )


def url_host(url: Column) -> Column:
    """Lowercased host with any port stripped."""
    _, authority, _, _ = url_parts(url)
    return F.regexp_replace(authority, r":\d+$", "")
