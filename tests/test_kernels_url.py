"""Golden vectors ported from the reference's URL/path unit tests.

clean_url:        /root/reference/internal/links/clean_test.go:28-35
relative_depth:   /root/reference/internal/crawler/util_test.go:65-101
can_crawl:        util_test.go:114-167
is_resource/can_parse/is_sitemap/is_js: util_test.go:34-63, 169-232
urlhash determinism: util_test.go:234-244
"""

import pytest

from crawley_spark.kernels import gourl
from crawley_spark.kernels.clean import clean_url, handle_static, resolve_ref
from crawley_spark.kernels.paths import (
    can_crawl,
    can_parse,
    content_class,
    fnv64,
    is_js,
    is_resource,
    is_sitemap,
    relative_depth,
    url_seen_key,
)

TEST_BASE = gourl.parse("http://test/")


# -- clean_test.go:28-35 --
@pytest.mark.parametrize(
    "link,want,ok",
    [
        ("[%]", "", False),
        ("http://", "", False),
        ("javascript://result", "", False),
        ("result", "http://test/result", True),
        ("//result", "http://result/", True),
        ("/?foo=bar", "http://test/?foo=bar", True),
        ("/api/v1/user", "http://test/api/v1/user", True),
    ],
)
def test_clean_url(link, want, ok):
    got, got_ok = clean_url(TEST_BASE, link)
    assert got_ok == ok
    if ok:
        assert got == want


# -- gourl round-trip sanity (Go net/url serialization corners) --
@pytest.mark.parametrize(
    "raw,out",
    [
        ("http://test/", "http://test/"),
        ("http://test", "http://test"),
        ("http://test/a b", "http://test/a%20b"),
        ("http://test/a%20b", "http://test/a%20b"),
        ("http://test/a!b", "http://test/a!b"),
        ("http://test/p?q=Test Hello", "http://test/p?q=Test Hello"),
        ("HTTP://Test/Path", "http://Test/Path"),
        ("http://test/a/../b", "http://test/a/../b"),
    ],
)
def test_gourl_roundtrip(raw, out):
    assert gourl.parse(raw).string() == out


def test_gourl_errors():
    for bad in ["%", "[%]", "http://host:bad/", "http://te st/", "ht\ntp://x"]:
        with pytest.raises(gourl.URLError):
            gourl.parse(bad)


def test_resolve_reference_dot_segments():
    base = gourl.parse("http://test/a/b/c")
    assert base.resolve_reference(gourl.parse("../d")).string() == "http://test/a/d"
    assert base.resolve_reference(gourl.parse("./e")).string() == "http://test/a/b/e"
    assert base.resolve_reference(gourl.parse("..")).string() == "http://test/a/"
    assert base.resolve_reference(gourl.parse("//other/x")).string() == "http://other/x"
    assert base.resolve_reference(gourl.parse("?q=1")).string() == "http://test/a/b/c?q=1"


# -- util_test.go:65-101 --
@pytest.mark.parametrize(
    "base,sub,depth,found",
    [
        ("/", "/a", 1, True),
        ("/a", "/b", 0, False),
        ("/a/b", "/c", 0, False),
        ("/a", "/a/b", 1, True),
        ("/a", "/a/b/c", 2, True),
        ("/a/b/c", "/d/b/c/a", 0, False),
    ],
)
def test_relative_depth(base, sub, depth, found):
    assert relative_depth(base, sub) == (depth, found)


# -- util_test.go:114-167 --
_BASE = gourl.parse("http://test/some/path")
_CASES = {
    "badh": gourl.parse("http://other/path"),
    "url0": gourl.parse("http://test/some"),
    "url1": gourl.parse("http://test/some/path/even"),
    "url2": gourl.parse("http://test/some/path/even/more"),
    "url3": gourl.parse("http://test"),
    "url4": gourl.parse("http://abc.test/some"),
    "url5": gourl.parse("http://abc.test/some/path"),
    "url6": gourl.parse("http://abc.test/some/path/even"),
}


@pytest.mark.parametrize(
    "u,d,subdomains,want",
    [
        ("url0", 1, False, False),
        ("url1", 0, False, False),
        ("url1", 1, False, True),
        ("url2", 0, False, False),
        ("url2", 1, False, False),
        ("url2", 2, False, True),
        ("url2", 3, False, True),
        ("badh", 1, False, False),
        ("url0", -1, False, False),
        ("url1", -1, False, True),
        ("url2", -1, False, True),
        ("url3", 0, False, False),
        ("url4", 1000, True, False),
        ("url5", -1, True, True),
        ("url5", -1, False, False),
        ("url6", 1, True, True),
        ("url6", 0, True, False),
    ],
)
def test_can_crawl(u, d, subdomains, want):
    assert can_crawl(_BASE, _CASES[u], d, subdomains) == want


# -- util_test.go:169-232 --
@pytest.mark.parametrize(
    "v,want",
    [("/some/path", False), ("/some/other/path/", False), ("/path/to/some/resource.zip", True)],
)
def test_is_resource(v, want):
    assert is_resource(v) == want


@pytest.mark.parametrize(
    "v,want",
    [
        ("/some/path", True),
        ("/some/other/path/", True),
        ("/some/resource.html", True),
        ("/path/to/some/resource.zip", False),
    ],
)
def test_can_parse(v, want):
    assert can_parse(v) == want


@pytest.mark.parametrize(
    "v,want",
    [
        ("/some/path", False),
        ("/some/other/path/sitemap.xml", True),
        ("/some/resource.html", False),
        ("/path/to/some/sitemap-index.xml", True),
    ],
)
def test_is_sitemap(v, want):
    assert is_sitemap(v) == want


# -- util_test.go:34-63 --
@pytest.mark.parametrize(
    "ctype,name,want",
    [
        ("text/html", "test.html", False),
        ("application/javascript", "test.js", True),
        ("application/javascript", "test.html", True),
        ("text/html", "test.js", True),
        ("", "test.html", False),
        ("", "test.js", True),
        ("", "test.js?v=1", True),
    ],
)
def test_is_js(ctype, name, want):
    assert is_js(ctype, name) == want


def test_urlhash_stable():
    v = "http://test/some/path?foo"
    assert fnv64(url_seen_key(v)) == fnv64(url_seen_key(v))
    # FNV-1 64 known vector: fnv-1("a") = 0xaf63bd4c8601b7be
    assert fnv64("a") == 0xAF63BD4C8601B7BE


# -- handleStatic (crawler.go:324-339), incl. the no-colon scheme-concat quirk --
def test_handle_static():
    assert handle_static("http://t/p", "http", "//static/x.png") == ("http//static/x.png", True)
    assert handle_static("http://t/p", "http", "http://x/y") == ("http://x/y", True)
    assert handle_static("http://t/a/p", "http", "rel/y") == ("http://t/a/rel/y", True)
    assert handle_static("http://t/a/p", "http", "/abs") == ("http://t/abs", True)


def test_resolve_ref():
    assert resolve_ref("http://t/a/b", "c")[0] == "http://t/a/c"
    assert resolve_ref("http://t/a/b", "/c")[0] == "http://t/c"


# -- corpus content-class rule (FIXTURES.md §1) --
@pytest.mark.parametrize(
    "url,want",
    [
        ("http://t/", "html"),
        ("http://t", "html"),
        ("http://t/a/b", "html"),
        ("http://t/x.html", "html"),
        ("http://t/x.php", "html"),
        ("http://t/x.js", "js"),
        ("http://t/x.js?v=1", "js"),
        ("http://t/x.css", "css"),
        ("http://t/sitemap.xml", "sitemap"),
        ("http://t/sub/sitemap-index.xml", "sitemap"),
        ("http://t/x.xml", "none"),
        ("http://t/x.zip", "none"),
    ],
)
def test_content_class(url, want):
    assert content_class(url) == want
