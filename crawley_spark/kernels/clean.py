"""URL canonicalization kernels.

Ports ``cleanURL`` (/root/reference/internal/links/clean.go:7-33),
``resolveRef`` (/root/reference/internal/crawler/util.go:229-243) and the
``handleStatic`` closure (/root/reference/internal/crawler/crawler.go:324-339).
"""

from __future__ import annotations

from functools import lru_cache

from . import gourl
from .gourl import GoURL, URLError

JS_SCHEME = "javascript"
DOUBLE_DASH = "//"


def _clean_url_uncached(base: GoURL, link: str) -> tuple[str, bool]:
    """clean.go:7-33 — parse, resolve hostless links against base, reject
    javascript:, inherit scheme, default path to '/', strip fragment."""
    try:
        u = gourl.parse(link)
    except URLError:
        return "", False
    if u.host == "":
        u = base.resolve_reference(u)
        if u.host == "":
            return "", False
    if u.scheme == JS_SCHEME:
        return "", False
    if u.scheme == "":
        u.scheme = base.scheme
    if u.path == "":
        u.path = "/"
        u.raw_path = ""
    u.fragment = ""
    u.raw_fragment = ""
    return u.string(), True


@lru_cache(maxsize=131072)
def _clean_url_scheme_host(scheme: str, host: str, link: str) -> tuple[str, bool]:
    """Memoized path for links whose resolution depends only on the base's
    scheme(+host): root-relative ('/x' → merge ignores the base path, RFC
    3986 §5.2.3) and host-full links ('scheme://…', '//host/…' — only the
    scheme can be inherited). Hit rate is high: the same nav/footer links
    repeat across every page of a site."""
    b = GoURL()
    b.scheme = scheme
    b.host = host
    return _clean_url_uncached(b, link)


import re as _re

_SCHEME_ABS = _re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")


def clean_url(base: GoURL, link: str) -> tuple[str, bool]:
    if link.startswith("/") or _SCHEME_ABS.match(link):
        # '/x' (root-relative: merge ignores base path), '//host/x'
        # (scheme-relative) and 'scheme://…' — base path never involved
        return _clean_url_scheme_host(base.scheme, base.host, link)
    return _clean_url_uncached(base, link)


def resolve_ref(base: str, uri: str) -> tuple[str, bool]:
    """util.go:229-243 — resolve uri against base, both given as strings."""
    try:
        b = gourl.parse(base)
    except URLError:
        return "", False
    try:
        u = gourl.parse(uri)
    except URLError:
        return "", False
    return b.resolve_reference(u).string(), True


def handle_static(page_url: str, page_scheme: str, s: str) -> tuple[str, bool]:
    """crawler.go:324-339 — resolution rule for JS/CSS-discovered strings:
    ``//x`` gets the current page's scheme prepended (NOTE: the reference
    concatenates ``base.Scheme+s`` with no colon, yielding e.g.
    ``http//static/x`` — reproduced bug-compatibly); strings containing
    ``//`` pass through untouched; everything else resolves relative to the
    page URL."""
    if s.startswith(DOUBLE_DASH):
        return page_scheme + s, True
    if DOUBLE_DASH in s:
        return s, True
    return resolve_ref(page_url, s)
