"""URL canonicalization kernels.

Ports ``cleanURL`` (/root/reference/internal/links/clean.go:7-33),
``resolveRef`` (/root/reference/internal/crawler/util.go:229-243) and the
``handleStatic`` closure (/root/reference/internal/crawler/crawler.go:324-339).
"""

from __future__ import annotations

from . import gourl
from .gourl import GoURL, URLError

JS_SCHEME = "javascript"
DOUBLE_DASH = "//"


def clean_url(base: GoURL, link: str) -> tuple[str, bool]:
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
