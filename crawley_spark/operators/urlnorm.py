"""Aggressive URL canonicalization and duplicate-URL clustering.

A crawl frontier at web scale is full of URL aliases — ``http`` vs
``https`` is handled by the fetch layer, but ``www.`` prefixes, default
ports, fragments, tracking parameters (``utm_*``, ``gclid``, ``fbclid``),
query-parameter order, and trailing slashes all multiply the same page
into distinct frontier entries and duplicate documents. The engine's
``cleanURL`` kernel (kernels/clean.py) is deliberately Go-``net/url``
bug-compatible *normalization* (reference: internal/links/clean.go) and
must not collapse these; this module is the separate, lossy
*canonicalization* used for dedup keys and cluster reports — the
distinction every production crawler keeps (canonical key for identity,
original URL for fetching).

Everything is pure JVM column expressions over the Java∩RE2-identical
regex subset (the house rule from textstats/pii), so the DuckDB oracle
recomputes the same canonical form independently. Scope (documented): the
transform assumes absolute ``scheme://host[:port]/path[?query][#frag]``
URLs without userinfo — exactly what the crawl engine emits after
cleanURL — and leaves percent-encoding untouched (case-normalizing
escapes without decoding them is a different, riskier transform).

Canonicalization steps, in order:

1. scheme and host lowercased; fragment stripped (first ``#`` onward)
2. default port stripped (``:80`` for http, ``:443`` for https)
3. leading ``www.`` stripped from the host (flag, default on)
4. tracking params dropped: name matches ``TRACKING_PARAM_RE``
5. remaining query params sorted bytewise (order-insensitive identity)
6. empty path -> ``/``; trailing slash stripped from non-root paths

Scale shape: ``canonicalize_url`` is a zero-shuffle projection;
``url_canonical_clusters`` adds one map-side-combined shuffle on the
canonical key with bounded per-key state (count + min — deliberately NOT
``collect_set`` of the variants, which would be unbounded per-key state
at 10^10 URLs; the per-url mapping output serves that need streamed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query-parameter names dropped by canonicalization; Java-regex∩RE2-
# identical so the oracle applies the same pattern (the pii.py rule)
TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid|msclkid|ref|mc_eid)(=.*)?$"

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonicalize_url(url: Column, strip_www: bool = True) -> Column:
    """Canonical dedup key for an absolute URL (see module docstring)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    # strip scheme, then fragment
    rest = F.regexp_replace(
        F.regexp_replace(url, _SCHEME_RE, ""), "#.*$", ""
    )
    authority = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    # default ports; other ports kept
    host = F.when(
        scheme == "http", F.regexp_replace(authority, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(authority, ":443$", "")
    ).otherwise(authority)
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    pathq = F.substring(rest, F.length(authority) + F.lit(1), F.lit(2_000_000_000))
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    query = F.when(
        F.instr(pathq, "?") > 0,
        F.substring(pathq, F.instr(pathq, "?") + F.lit(1), F.lit(2_000_000_000)),
    ).otherwise(F.lit(""))

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit(""))
        & ~p.rlike(TRACKING_PARAM_RE),
    )
    query_c = F.array_join(F.array_sort(params), "&")

    path_c = F.when(path == "", F.lit("/")).when(
        (path != "/") & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - F.lit(1)),
    ).otherwise(path)

    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path_c,
        F.when(query_c != "", F.concat(F.lit("?"), query_c)).otherwise(
            F.lit("")
        ),
    )


def url_canonical_map(
    df: DataFrame, url_col: str = "url", strip_www: bool = True
) -> DataFrame:
    """(url, canon_url) projection — zero shuffle; the streamed variant
    listing (join targets back to their canonical key without unbounded
    aggregate state)."""
    return df.select(
        F.col(url_col).alias("url"),
        canonicalize_url(F.col(url_col), strip_www=strip_www).alias(
            "canon_url"
        ),
    )


def url_canonical_clusters(
    df: DataFrame, url_col: str = "url", strip_www: bool = True
) -> DataFrame:
    """One row per canonical URL: (canon_url, n_urls, n_distinct_urls,
    rep_url) with rep_url = bytewise-min original (deterministic
    representative). One map-side-combined shuffle on canon_url; per-key
    state is three scalars, never a variant list."""
    m = url_canonical_map(df, url_col=url_col, strip_www=strip_www)
    return m.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("url").alias("n_distinct_urls"),
        F.min("url").alias("rep_url"),
    )
