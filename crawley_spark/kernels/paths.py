"""Path/classification kernels ported from the reference's crawler utilities.

Each function cites the Go reference it reproduces
(``/root/reference/internal/crawler/util.go``).  Pure Python — these are the
row kernels behind the engine's vectorized UDFs and also power the pure-Python
reference interpreter used as the parity oracle.
"""

from __future__ import annotations

from .gourl import GoURL

# parsable extensions — util.go:33-46
PARSABLE_EXTS = frozenset(
    {".asp", ".aspx", ".cgi", ".htm", ".html", ".jsp", ".php", ".pl", ".xhtml", ".xml", ".js", ".css"}
)
HTML_EXTS = frozenset({".asp", ".aspx", ".cgi", ".htm", ".html", ".jsp", ".php", ".pl", ".xhtml"})

FILE_EXT_JS = ".js"
FILE_EXT_CSS = ".css"

CONTENT_HTML = "text/html"
CONTENT_CSS = "text/css"
CONTENT_JS = "application/javascript"


def path_clean(p: str) -> str:
    """Go ``path.Clean`` (lexical)."""
    if p == "":
        return "."
    rooted = p.startswith("/")
    out: list[str] = []
    for seg in p.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if out and out[-1] != "..":
                out.pop()
            elif not rooted:
                out.append("..")
        else:
            out.append(seg)
    s = "/".join(out)
    if rooted:
        s = "/" + s
    if s == "":
        return "/" if rooted else "."
    return s


def file_ext(v: str) -> str:
    """Go ``path.Ext``/``filepath.Ext`` on linux: suffix beginning at the
    final dot in the final slash-separated element; "" if none."""
    for i in range(len(v) - 1, -1, -1):
        c = v[i]
        if c == "/":
            return ""
        if c == ".":
            return v[i:]
    return ""


def path_split(v: str) -> tuple[str, str]:
    """Go ``path.Split``: split after the final slash."""
    i = v.rfind("/")
    return v[: i + 1], v[i + 1 :]


def web_ext(v: str) -> str:
    """util.go:152-158 — extension with any query string stripped first."""
    p = v.split("?", 1)[0]
    return file_ext(p)


def can_parse(v: str) -> bool:
    """util.go:160-171 — headless-mode fetch gate on the URL path."""
    _, tmp = path_split(v)
    if tmp == "":
        return True
    tmp = web_ext(tmp)
    if tmp == "":
        return True
    return tmp.lower() in PARSABLE_EXTS


def is_sitemap(s: str) -> bool:
    """util.go:173-180."""
    return s.endswith("sitemap.xml") or s.endswith("sitemap-index.xml")


def is_resource(v: str) -> bool:
    """util.go:182-193 — has a file extension in its last path element."""
    _, tmp = path_split(v)
    if tmp == "":
        return False
    return web_ext(tmp) != ""


def _mime_type(v: str) -> str:
    """Minimal mime.ParseMediaType: media type before ';', trimmed+lowered;
    '' when unparseable (empty or missing '/')."""
    t = v.split(";", 1)[0].strip().lower()
    if "/" not in t:
        return ""
    return t


def is_html(v: str) -> bool:
    """util.go:195-202 (content-type based)."""
    return _mime_type(v) == CONTENT_HTML


def is_js(v: str, n: str) -> bool:
    """util.go:204-211 — content-type or .js extension."""
    if _mime_type(v) == CONTENT_JS:
        return True
    return web_ext(n) == FILE_EXT_JS


def is_css(v: str, n: str) -> bool:
    """util.go:213-220."""
    if _mime_type(v) == CONTENT_CSS:
        return True
    return web_ext(n) == FILE_EXT_CSS


from functools import lru_cache


@lru_cache(maxsize=65536)
def relative_depth(base: str, sub: str) -> tuple[int, bool]:
    """util.go:123-150 — extra non-empty path segments of sub below base."""
    bn = path_clean(base)
    sn = path_clean(sub)
    if len(sn) < len(bn):
        return 0, False
    if not sn.startswith(bn):
        return 0, False
    n = sum(1 for f in sn[len(bn) :].split("/") if f != "")
    return n, True


def can_crawl(a: GoURL, b: GoURL, d: int, subdomains: bool) -> bool:
    """util.go:74-121 — scope (host / dot-suffix subdomain) + depth gate."""
    if a.host != b.host:
        if not subdomains:
            return False
        domain_a = a.host.split(".")
        domain_b = b.host.split(".")
        if len(domain_a) >= len(domain_b):
            return False
        j = len(domain_b) - 1
        for i in range(len(domain_a) - 1, -1, -1):
            if j < 0:
                break
            if domain_a[i] != domain_b[j]:
                return False
            j -= 1
    apath = a.path or "/"
    bpath = b.path or "/"
    depth, found = relative_depth(apath, bpath)
    if not found:
        return False
    if d >= 0 and depth > d:
        return False
    return True


def url_path(url: str) -> str:
    """Path portion of an absolute URL string (cheap split, no validation)."""
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    if slash == -1:
        return ""
    return rest[slash:].split("?", 1)[0]


def content_class(url: str, path: str | None = None) -> str:
    """Corpus-mode content class, derived from the URL exactly as the
    reference's headless path does (FIXTURES.md §1; util.go:160-220 with no
    HTTP headers available):

    - ``sitemap`` — url ends with sitemap.xml / sitemap-index.xml (checked on
      the full url string, matching crawler.go:353)
    - ``js`` / ``css`` — by path extension
    - ``html`` — extensionless or an html-family extension (server-side pages
      are assumed served as text/html, as the reference test servers do)
    - ``none`` — parsable but unextractable (bare .xml that is not a sitemap)
    """
    if is_sitemap(url):
        return "sitemap"
    if path is None:
        path = url_path(url)
    ext = web_ext(path_split(path)[1]).lower()
    if ext == FILE_EXT_JS:
        return "js"
    if ext == FILE_EXT_CSS:
        return "css"
    if ext == "" or ext in HTML_EXTS:
        return "html"
    return "none"


def fnv64(s: str) -> int:
    """FNV-1 64-bit (reference urlhash, util.go:222-227). Kept for parity
    debugging; the Spark engine keys its seen-set on xxhash64(lower(url))
    per BASELINE.json north_rule — set-equality is on URL strings."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8", "surrogateescape"):
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        h ^= b
    return h


def url_seen_key(s: str) -> str:
    """Dedup key = lowercased full URL string (util.go:224)."""
    return s.lower()
