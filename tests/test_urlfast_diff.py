"""Differential fuzz: the URL fast paths (gourl.parse / clean_url) must be
byte-equivalent to the full net/url-parity slow paths on every input. The
slow paths are anchored to Go behavior by the ported golden vectors
(test_kernels_url.py); these tests anchor the fast paths to the slow paths.
"""

from __future__ import annotations

import random

import pytest

from crawley_spark.kernels import gourl
from crawley_spark.kernels.clean import _clean_url_uncached, clean_url
from crawley_spark.kernels.gourl import URLError


def _fields(u):
    return {s: getattr(u, s) for s in u.__slots__}


def _parse_both(s):
    try:
        fast = gourl.parse(s)
    except URLError:
        fast = None
    try:
        slow = gourl.parse_slow(s)
    except URLError:
        slow = None
    return fast, slow


# alphabet biased toward URL structure + the chars the fast regexes admit/reject
_ALPHA = (
    "abcXYZ019" * 3
    + "/./../:@-._~!$&'()*+,;=%?#[]\\ \té☃\"<>{}|^`"
)


def _rand_str(rnd, maxlen=24):
    n = rnd.randrange(maxlen)
    return "".join(rnd.choice(_ALPHA) for _ in range(n))


def _rand_url(rnd):
    shape = rnd.randrange(6)
    if shape == 0:
        return _rand_str(rnd)
    host = "".join(rnd.choice("abz09.-") for _ in range(rnd.randrange(1, 8)))
    path = _rand_str(rnd, 16)
    if shape == 1:
        return f"http://{host}{path}"
    if shape == 2:
        return f"https://{host}:{rnd.randrange(100)}{path}"
    if shape == 3:
        return "/" + _rand_str(rnd, 16)
    if shape == 4:
        return "//" + host + path
    return f"HtTp://{host}{path}"


def test_parse_fast_matches_slow_fuzz():
    rnd = random.Random(4242)
    checked = 0
    for _ in range(30000):
        s = _rand_url(rnd)
        fast, slow = _parse_both(s)
        if slow is None:
            assert fast is None, s
            continue
        assert fast is not None, s
        assert _fields(fast) == _fields(slow), s
        assert fast.string() == slow.string(), s
        checked += 1
    assert checked > 10000


def test_parse_fast_matches_slow_vectors():
    for s in [
        "http://h0.test",
        "http://h0.test/",
        "http://h0.test/p/1",
        "http://h.test/a b",
        "http://h.test/a%20b",
        "http://h.test/a/../b",
        "http://h.test/a//b::@$&+,;=",
        "https://h.test:8080/x",
        "http://user@h.test/x",
        "http://h.test/x?q=1",
        "http://h.test/x#f",
        "HTTP://H.TEST/X",
        "http://[::1]:80/x",
        "javascript:alert(1)",
        "*",
        "",
    ]:
        fast, slow = _parse_both(s)
        assert (fast is None) == (slow is None), s
        if slow is not None:
            assert _fields(fast) == _fields(slow), s
            assert fast.string() == slow.string(), s


def _bases():
    out = []
    for b in [
        "http://h0.test",
        "http://h0.test/sub/dir",
        "https://h.test:8080/x",
        "http://user@h.test/x",
        "ftp://h.test/x",
        "http://xn--nxasmq6b.test/x",
    ]:
        out.append(gourl.parse_slow(b))
    return out


def test_clean_url_fast_matches_slow_fuzz():
    rnd = random.Random(777)
    bases = _bases()
    for _ in range(20000):
        link = _rand_url(rnd)
        base = rnd.choice(bases)
        assert clean_url(base, link) == _clean_url_uncached(base, link), (
            base.string(),
            link,
        )


def test_clean_url_fast_matches_slow_vectors():
    bases = _bases()
    links = [
        "/p123",
        "/",
        "/a/b/c",
        "/a/../b",
        "/./a",
        "/a/.",
        "//host/x",
        "//",
        "///x",
        "//?q=1",
        "//#f",
        "http://",
        "http://#f",
        "http://?q=1",
        "/a b",
        "/a%20b",
        "/a?q=1",
        "/a#f",
        "http://x.test",
        "http://x.test/y",
        "http://x.test/y/../z",
        "HTTP://x.test/y",
        "relative/path",
        "javascript:void(0)",
        "/a:b@c$&+,;=~._-",
    ]
    for base in bases:
        for link in links:
            assert clean_url(base, link) == _clean_url_uncached(base, link), (
                base.string(),
                link,
            )


def test_fast_paths_actually_hit(monkeypatch):
    """Guard against silently losing the fast paths to a regex typo: the
    slow fallbacks are patched to raise, so these calls only succeed if the
    fast paths handled them (ADVICE r01 — asserting equal *outputs* could
    not distinguish fast from fallback)."""
    from crawley_spark.kernels import clean as clean_mod

    def boom(*a, **kw):  # pragma: no cover - should never run
        raise AssertionError("slow fallback invoked for a fast-path input")

    monkeypatch.setattr(gourl, "parse_slow", boom)
    monkeypatch.setattr(clean_mod, "_clean_url_uncached", boom)
    u = gourl.parse("http://h0.test/p/1")
    assert u.path == "/p/1" and u.host == "h0.test"
    base = gourl.parse("http://h0.test")
    assert clean_url(base, "/p9")[0] == "http://h0.test/p9"
    # and the fallback is genuinely reachable for a non-fast input
    monkeypatch.undo()
    assert gourl.parse("HTTP://x.test/y").host == "x.test"
