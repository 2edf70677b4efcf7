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
    repeat across every page of a site. The clean root-relative concat
    shape short-circuits before the parse+resolve (late r05: this fast
    path moved INSIDE the memo from clean_url, so repeats cost one
    C-level cache hit instead of a recompute — ~1.4 µs → ~0.17 µs on the
    bench link distribution)."""
    if (
        link.startswith("/")
        and not link.startswith("//")
        and (scheme == "http" or scheme == "https")
        and _FAST_REL_RE.match(link) is not None
        and not _has_dot_segment(link)
        and _FAST_HOST_RE.match(host) is not None
    ):
        return scheme + "://" + host + link, True
    b = GoURL()
    b.scheme = scheme
    b.host = host
    return _clean_url_uncached(b, link)


import re as _re

_SCHEME_ABS = _re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")

# Fast paths (differentially fuzzed vs the slow path in
# tests/test_urlfast_diff.py): the two overwhelmingly common link shapes on
# real pages reduce to string concatenation —
#
# * root-relative '/a/b' of untouched-by-escaping chars, no dot segments →
#   resolve_reference copies base scheme/host/user and takes the path
#   verbatim; with a clean http(s) base and no userinfo the canonical form
#   is just scheme://host + link.
# * absolute http(s)://host/path of the same char set → cleanURL is the
#   identity (modulo '' path → '/').
_FAST_REL_RE = _re.compile(r"^/[A-Za-z0-9._~$&+,;=:@\-/]*$")
_FAST_HOST_RE = _re.compile(r"^[A-Za-z0-9.\-]+(?::[0-9]+)?$")
from .gourl import _FAST_ABS_RE  # noqa: E402


def _has_dot_segment(path: str) -> bool:
    return (
        "/./" in path
        or "/../" in path
        or path.endswith(("/.", "/.."))
        or path.startswith(("./", "../"))
    )


def clean_url(base: GoURL, link: str) -> tuple[str, bool]:
    # Root-relative links ('/x', the dominant shape) flow to the memoized
    # scheme+host route below — its front now carries the concat fast path,
    # so repeats are C-level cache hits (late r05; was an inline recompute).
    m = _FAST_ABS_RE.match(link)
    if m is not None:
        path = m.group(3)
        if path == "":
            return link + "/", True
        if path[0] == "/":
            return link, True
    if base.user is None and (link.startswith("/") or _SCHEME_ABS.match(link)):
        # '/x' (root-relative: merge ignores base path), '//host/x'
        # (scheme-relative) and 'scheme://…' — base path never involved.
        # (base.user must be absent: resolution copies userinfo too.)
        # Degenerate empty-authority-empty-path forms ('//', '//?q',
        # 'http://#f') DO resolve to the base's own path (RFC 3986 §5.3) —
        # those must take the uncached full-base path.
        i = link.find("//")
        if i in (0, link.find("://") + 1 if "://" in link else -2):
            tail = link[i + 2 :]
            if tail == "" or tail[0] in "?#":
                return _clean_url_uncached(base, link)
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
