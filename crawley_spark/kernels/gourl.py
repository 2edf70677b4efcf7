"""Go ``net/url``-compatible URL parsing/serialization.

The reference engine (s0rg/crawley) canonicalizes every discovered link with
Go's ``net/url`` (``/root/reference/internal/links/clean.go:7-33``,
``/root/reference/internal/crawler/util.go:229-243``).  To emit byte-identical
URL strings we re-implement the subset of ``net/url`` behavior the crawl path
exercises: ``Parse``, ``ResolveReference``, ``String`` — including Go's
percent-escape validation, scheme detection, opaque URLs, RawPath/RawFragment
round-tripping and RFC 3986 dot-segment removal.

Pure Python, no Spark imports — this module is the hot kernel invoked from
Arrow-batched pandas UDFs (one call per string; vectorization happens a layer
up).
"""

from __future__ import annotations

__all__ = ["GoURL", "URLError", "parse", "resolve_path"]

# escape modes (mirrors net/url encoding constants)
MODE_PATH = 1
MODE_PATH_SEGMENT = 2
MODE_HOST = 3
MODE_USERPASS = 5
MODE_QUERY = 6
MODE_FRAGMENT = 7

_HEX = "0123456789ABCDEF"
_UNRESERVED_MARKS = "-_.~"
_HOST_OK = "!$&'()*+,;=:[]<>\""
_SUBDELIMS = "$&+,/:;=?@"


class URLError(ValueError):
    """Raised where Go's url.Parse would return an error."""


def _is_hex(c: str) -> bool:
    return c in "0123456789abcdefABCDEF"


def _unhex(c: str) -> int:
    return int(c, 16)


def _should_escape(c: str, mode: int) -> bool:
    # mirrors net/url shouldEscape (url.go)
    if "a" <= c <= "z" or "A" <= c <= "Z" or "0" <= c <= "9":
        return False
    if mode == MODE_HOST and c in _HOST_OK:
        return False
    if c in _UNRESERVED_MARKS:
        return False
    if c in _SUBDELIMS:
        if mode == MODE_PATH:
            return c == "?"
        if mode == MODE_PATH_SEGMENT:
            return c in "/;,?"
        if mode == MODE_USERPASS:
            return c in "@/?#"
        if mode == MODE_QUERY:
            return True
        if mode == MODE_FRAGMENT:
            return False
    if mode == MODE_FRAGMENT and c in "!()*":
        return False
    return True


# -- fast paths: per-mode byte regexes (C-speed scans of the common case) --
import re as _re

_NEEDS_ESCAPE_RE: dict = {}
_CTL_RE = _re.compile(r"[\x00-\x1f\x7f]")


def _needs_escape_re(mode: int):
    pat = _NEEDS_ESCAPE_RE.get(mode)
    if pat is None:
        chars = [chr(b) for b in range(0x80) if _should_escape(chr(b), mode)]
        pat = _re.compile("[^\x00-\x7f]|[" + _re.escape("".join(chars)) + "]")
        _NEEDS_ESCAPE_RE[mode] = pat
    return pat


def unescape(s: str, mode: int) -> str:
    """Mirrors net/url unescape: validates %XX sequences, decodes them."""
    i, n = 0, len(s)
    has_pct = False
    while i < n:
        c = s[i]
        if c == "%":
            has_pct = True
            if i + 2 >= n or not _is_hex(s[i + 1]) or not _is_hex(s[i + 2]):
                bad = s[i : i + 3]
                raise URLError(f'invalid URL escape "{bad}"')
            if mode == MODE_HOST and _unhex(s[i + 1]) < 8 and s[i : i + 3] != "%25":
                raise URLError(f'invalid URL escape "{s[i:i+3]}"')
            i += 3
        else:
            if mode == MODE_HOST and ord(c) < 0x80 and _should_escape(c, mode):
                raise URLError(f"invalid character {c!r} in host name")
            i += 1
    if not has_pct:
        return s
    # decode percent escapes byte-wise (input may contain raw non-ASCII which
    # stays as-is; escapes decode to bytes which we re-join as utf-8 with
    # surrogateescape to stay lossless like Go's byte strings)
    out = bytearray()
    i = 0
    bs = s.encode("utf-8", "surrogateescape")
    n = len(bs)
    while i < n:
        b = bs[i]
        if b == 0x25 and i + 2 < n:  # '%'
            h1, h2 = chr(bs[i + 1]), chr(bs[i + 2])
            if _is_hex(h1) and _is_hex(h2):
                out.append(_unhex(h1) * 16 + _unhex(h2))
                i += 3
                continue
        out.append(b)
        i += 1
    return out.decode("utf-8", "surrogateescape")


def escape(s: str, mode: int) -> str:
    if not _needs_escape_re(mode).search(s):
        return s
    bs = s.encode("utf-8", "surrogateescape")
    out = []
    for b in bs:
        c = chr(b)
        if _should_escape(c, mode):
            out.append("%" + _HEX[b >> 4] + _HEX[b & 15])
        else:
            out.append(c)
    return "".join(out)


def _contains_ctl_byte(s: str) -> bool:
    return _CTL_RE.search(s) is not None


def _get_scheme(rawurl: str):
    # mirrors net/url getScheme
    for i, c in enumerate(rawurl):
        if "a" <= c <= "z" or "A" <= c <= "Z":
            continue
        if "0" <= c <= "9" or c in "+-.":
            if i == 0:
                return "", rawurl
            continue
        if c == ":":
            if i == 0:
                raise URLError("missing protocol scheme")
            return rawurl[:i].lower(), rawurl[i + 1 :]
        return "", rawurl
    return "", rawurl


def _valid_optional_port(port: str) -> bool:
    if port == "":
        return True
    if port[0] != ":":
        return False
    return all("0" <= c <= "9" for c in port[1:])


def _parse_host(host: str) -> str:
    if host.startswith("["):
        i = host.rfind("]")
        if i < 0:
            raise URLError("missing ']' in host")
        colon_port = host[i + 1 :]
        if not _valid_optional_port(colon_port):
            raise URLError(f'invalid port "{colon_port}" after host')
    else:
        i = host.rfind(":")
        if i != -1:
            colon_port = host[i:]
            if not _valid_optional_port(colon_port):
                raise URLError(f'invalid port "{colon_port}" after host')
    return unescape(host, MODE_HOST)


def _valid_encoded(s: str, mode: int) -> bool:
    # mirrors net/url validEncoded (used by EscapedPath/EscapedFragment)
    for c in s:
        if c in "!$&'()*+,;=:@[]":
            continue
        if c == "%":
            continue
        if _should_escape(c, mode):
            return False
    return True


class GoURL:
    __slots__ = (
        "scheme",
        "opaque",
        "user",
        "host",
        "path",
        "raw_path",
        "omit_host",
        "force_query",
        "raw_query",
        "fragment",
        "raw_fragment",
    )

    def __init__(self):
        self.scheme = ""
        self.opaque = ""
        self.user = None  # raw userinfo string or None
        self.host = ""
        self.path = ""
        self.raw_path = ""
        self.omit_host = False
        self.force_query = False
        self.raw_query = ""
        self.fragment = ""
        self.raw_fragment = ""

    # -- path / fragment setters (mirror setPath / setFragment) --
    def set_path(self, p: str) -> None:
        path = unescape(p, MODE_PATH)
        self.path = path
        self.raw_path = "" if escape(path, MODE_PATH) == p else p

    def set_fragment(self, f: str) -> None:
        frag = unescape(f, MODE_FRAGMENT)
        self.fragment = frag
        self.raw_fragment = "" if escape(frag, MODE_FRAGMENT) == f else f

    def escaped_path(self) -> str:
        if self.raw_path != "" and _valid_encoded(self.raw_path, MODE_PATH):
            try:
                if unescape(self.raw_path, MODE_PATH) == self.path:
                    return self.raw_path
            except URLError:
                pass
        if self.path == "*":
            return "*"
        return escape(self.path, MODE_PATH)

    def escaped_fragment(self) -> str:
        if self.raw_fragment != "" and _valid_encoded(self.raw_fragment, MODE_FRAGMENT):
            try:
                if unescape(self.raw_fragment, MODE_FRAGMENT) == self.fragment:
                    return self.raw_fragment
            except URLError:
                pass
        return escape(self.fragment, MODE_FRAGMENT)

    def string(self) -> str:
        buf = []
        if self.scheme != "":
            buf.append(self.scheme)
            buf.append(":")
        if self.opaque != "":
            buf.append(self.opaque)
        else:
            if self.scheme != "" or self.host != "" or self.user is not None:
                if self.omit_host and self.host == "" and self.user is None:
                    pass
                else:
                    if self.host != "" or self.path != "" or self.user is not None:
                        buf.append("//")
                    if self.user is not None:
                        buf.append(self.user)
                        buf.append("@")
                    if self.host != "":
                        buf.append(escape(self.host, MODE_HOST))
            path = self.escaped_path()
            if path != "" and path[0] != "/" and self.host != "":
                buf.append("/")
            if not buf:
                segment = path.split("/", 1)[0]
                if ":" in segment:
                    buf.append("./")
            buf.append(path)
        if self.force_query or self.raw_query != "":
            buf.append("?")
            buf.append(self.raw_query)
        if self.fragment != "":
            buf.append("#")
            buf.append(self.escaped_fragment())
        return "".join(buf)

    __str__ = string

    def copy(self) -> "GoURL":
        u = GoURL()
        for k in GoURL.__slots__:
            setattr(u, k, getattr(self, k))
        return u

    # -- ResolveReference (mirrors net/url) --
    def resolve_reference(self, ref: "GoURL") -> "GoURL":
        url = ref.copy()
        if ref.scheme == "":
            url.scheme = self.scheme
        if ref.scheme != "" or ref.host != "" or ref.user is not None:
            # absoluteURI or net_path
            url.set_path(resolve_path(ref.escaped_path(), ""))
            return url
        if ref.opaque != "":
            url.user = None
            url.host = ""
            url.path = ""
            return url
        if ref.path == "" and not ref.force_query and ref.raw_query == "":
            url.raw_query = self.raw_query
            if ref.fragment == "":
                url.fragment = self.fragment
                url.raw_fragment = self.raw_fragment
        # abs_path or rel_path
        url.host = self.host
        url.user = self.user
        url.set_path(resolve_path(self.escaped_path(), ref.escaped_path()))
        return url


def resolve_path(base: str, ref: str) -> str:
    """RFC 3986 §5.2.3/§5.2.4 merge + remove_dot_segments, with Go's
    guarantee of a leading '/' on non-empty results (net/url resolvePath)."""
    if ref == "":
        full = base
    elif ref[0] != "/":
        i = base.rfind("/")
        full = base[: i + 1] + ref
    else:
        full = ref
    if full == "":
        return ""
    out: list[str] = []
    inp = full
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            if inp[0] == "/":
                j = inp.find("/", 1)
            else:
                j = inp.find("/")
            if j == -1:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:j])
                inp = inp[j:]
    rv = "".join(out)
    if rv == "":
        return "/"
    if rv[0] != "/":
        rv = "/" + rv
    return rv


# Fast-path: lowercase http(s) URL whose host/path consist only of characters
# that BOTH unescape and escape(MODE_HOST/MODE_PATH) leave untouched, with no
# %-escapes, userinfo, query, fragment or IPv6 literal. For these the slow
# parse reduces to field assignment (path kept verbatim — url.Parse does NOT
# remove dot segments, only ResolveReference does, so they're allowed here).
# Verified equivalent to the slow path by the differential fuzz test in
# tests/test_urlfast_diff.py.
_FAST_ABS_RE = _re.compile(
    r"^(http|https)://([A-Za-z0-9.\-]+(?::[0-9]+)?)([/A-Za-z0-9._~$&+,;=:@\-]*)$"
)


def parse(rawurl: str) -> GoURL:
    """Mirrors url.Parse: splits the fragment off first, then parses."""
    m = _FAST_ABS_RE.match(rawurl)
    if m is not None and (m.group(3) == "" or m.group(3)[0] == "/"):
        u = GoURL()
        u.scheme = m.group(1)
        u.host = m.group(2)
        u.path = m.group(3)
        return u
    return parse_slow(rawurl)


def parse_slow(rawurl: str) -> GoURL:
    """The full net/url-parity parser (fast-path bypass for tests)."""
    frag_idx = rawurl.find("#")
    if frag_idx >= 0:
        u_part, frag = rawurl[:frag_idx], rawurl[frag_idx + 1 :]
    else:
        u_part, frag = rawurl, ""
    url = _parse(u_part, via_request=False)
    if frag != "":
        url.set_fragment(frag)
    return url


def _parse(rawurl: str, via_request: bool) -> GoURL:
    if _contains_ctl_byte(rawurl):
        raise URLError("net/url: invalid control character in URL")
    if rawurl == "" and via_request:
        raise URLError("empty url")
    url = GoURL()
    if rawurl == "*":
        url.path = "*"
        return url
    scheme, rest = _get_scheme(rawurl)
    url.scheme = scheme
    if rest.endswith("?") and "?" not in rest[:-1]:
        url.force_query = True
        rest = rest[:-1]
    else:
        cut = rest.find("?")
        if cut >= 0:
            rest, url.raw_query = rest[:cut], rest[cut + 1 :]
    if not rest.startswith("/"):
        if url.scheme != "":
            # rootless path per RFC 3986 → opaque
            url.opaque = rest
            return url
        if via_request:
            raise URLError("invalid URI for request")
        segment = rest.split("/", 1)[0]
        if ":" in segment:
            raise URLError("first path segment in URL cannot contain colon")
    if (url.scheme != "" or (not via_request and not rest.startswith("///"))) and rest.startswith("//"):
        authority, rest = rest[2:], ""
        i = authority.find("/")
        if i >= 0:
            authority, rest = authority[:i], authority[i:]
        # split userinfo
        at = authority.rfind("@")
        if at >= 0:
            userinfo, hostpart = authority[:at], authority[at + 1 :]
            if ":" in userinfo:
                u, _, p = userinfo.partition(":")
                unescape(u, MODE_USERPASS)
                unescape(p, MODE_USERPASS)
            else:
                unescape(userinfo, MODE_USERPASS)
            url.user = userinfo
            url.host = _parse_host(hostpart)
        else:
            url.host = _parse_host(authority)
    elif url.scheme != "" and rest.startswith("/"):
        url.omit_host = True
    url.set_path(rest)
    return url
