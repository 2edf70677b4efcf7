"""End-to-end crawl scenarios ported from the reference's crawler_test.go
(fixture bodies verbatim), run against the pure-Python reference interpreter.

These pin the interpreter to the Go behavior; the Spark engine is then tested
for byte-exact parity against the interpreter (test_engine_parity.py).
"""

import pytest

from crawley_spark.config import CrawlConfig
from crawley_spark.interp import Page, crawl

SEED = "http://test.host:8080"  # mirrors httptest's host:port-style seed (no trailing /)


def pages_everywhere(body, urls):
    return {u: Page(body=body, content_type="text/html") for u in urls}


# -- TestCrawlerOK (crawler_test.go:56-124) --
def test_ok_basic():
    body = """
<html>
<a href="result">here</a>
<img src="http://other.host/image.bmp"/>
<iframe src="some/deep/path"/>
</html>"""
    pages = {SEED: Page(body=body, content_type="text/html")}
    # the reference's catch-all server returns the same body for every path;
    # add the followed pages too (links are all-seen, so no new output)
    pages[f"{SEED}/result"] = Page(body=body, content_type="text/html")
    pages[f"{SEED}/some/deep/path"] = Page(body=body, content_type="text/html")
    out = crawl(pages, SEED, CrawlConfig(depth=1, no_head=False))
    assert len(out.results) == 3
    assert out.results[0].endswith("/result")
    assert out.results[1] == "http://other.host/image.bmp"
    assert out.results[2].endswith("/deep/path")


# -- TestCrawlerBadLink (crawler_test.go:126-134) --
def test_bad_seed():
    with pytest.raises(Exception):
        crawl({}, "%", CrawlConfig(depth=1))


# -- TestCrawlerRobots (crawler_test.go:174-294) --
ROBOTS_BODY = """useragent: a
disallow: /a
disallow: /c
user-agent: b
disallow: /b
sitemap: http://other.host/sitemap.xml"""


def _robots_pages():
    body = '<html><a href="/a">a</a><a href="/b">b</a><a href="/c">c</a></html>'
    return {
        SEED: Page(body=body, content_type="text/html"),
        f"{SEED}/robots.txt": Page(body=ROBOTS_BODY),
        f"{SEED}/a": Page(body='<html><a href="http://a">a</a></html>', content_type="text/html"),
        f"{SEED}/b": Page(body='<html><a href="http://b">b</a></html>', content_type="text/html"),
        f"{SEED}/c": Page(body='<html><a href="http://c">c</a></html>', content_type="text/html"),
    }


def test_robots_ua_a():
    out = crawl(
        _robots_pages(),
        SEED,
        CrawlConfig(user_agent="a", robots_policy="respect", depth=1, no_head=False),
    )
    res = set(out.results)
    assert len(res) == 5
    assert "http://other.host/sitemap.xml" in res
    assert "http://b/" in res
    assert "http://a/" not in res
    assert "http://c/" not in res


def test_robots_ua_b():
    out = crawl(
        _robots_pages(),
        SEED,
        CrawlConfig(user_agent="b", robots_policy="respect", depth=1, no_head=False),
    )
    res = set(out.results)
    assert len(res) == 6
    assert "http://b/" not in res
    assert {"http://other.host/sitemap.xml", "http://a/", "http://c/"} <= res


# -- TestCrawlerRobotsErr500 / Err400 (crawler_test.go:296-372) --
def test_robots_500_denies_all():
    pages = {
        SEED: Page(body="", content_type="text/html"),
        f"{SEED}/robots.txt": Page(body=None, status=500),
    }
    out = crawl(pages, SEED, CrawlConfig(depth=1, robots_policy="respect", no_head=False))
    assert out.results == []


def test_robots_400_allows_all():
    pages = {
        SEED: Page(body="", content_type="text/html"),
        f"{SEED}/robots.txt": Page(body=None, status=403),
    }
    out = crawl(pages, SEED, CrawlConfig(depth=1, robots_policy="respect", no_head=False))
    assert out.results == []  # empty body → no links either way


def test_robots_missing_allows_all():
    pages = {SEED: Page(body='<a href="/x">x</a>', content_type="text/html")}
    out = crawl(pages, SEED, CrawlConfig(depth=1, robots_policy="respect", no_head=False))
    assert [r.split("/")[-1] for r in out.results] == ["x"]


# -- TestCrawlerDirsHide / DirsOnly (crawler_test.go:426-505) --
def test_dirs_hide():
    body = '<html><a href="/a">a</a><a href="/b">b</a><a href="/c.jpg"/>c.jpg</a></html>'
    pages = pages_everywhere(body, [SEED, f"{SEED}/a", f"{SEED}/b"])
    out = crawl(pages, SEED, CrawlConfig(depth=0, dirs_policy="hide", no_head=False))
    assert len(out.results) == 1
    assert out.results[0].endswith("c.jpg")


def test_dirs_only():
    body = '<html><a href="/a">a</a><a href="/b.gif">b.gif</a><a href="/c.jpg">c.jpg</a></html>'
    pages = pages_everywhere(body, [SEED, f"{SEED}/a"])
    out = crawl(pages, SEED, CrawlConfig(depth=2, dirs_policy="only", no_head=False))
    assert len(out.results) == 1
    assert out.results[0].endswith("a")


# -- TestCrawlerNoHeads (crawler_test.go:507-547) --
def test_no_heads():
    body = '<html><a href="/a">a</a><a href="/b.gif">b.gif</a></html>'
    pages = pages_everywhere(body, [SEED, f"{SEED}/a"])
    out = crawl(pages, SEED, CrawlConfig(depth=0, no_head=True, dirs_policy="only"))
    assert len(out.results) == 1
    assert out.results[0].endswith("a")


# -- TestCrawlerSitemap (crawler_test.go:620-679) --
def test_sitemap():
    body_xml = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
\t<loc>http://hello/foo</loc>
  </url>
</urlset>"""
    robot = f"useragent: a\ndisallow: /a\nuser-agent: b\ndisallow: /b\nsitemap: {SEED}/sitemap.xml"
    pages = {
        SEED: Page(body='<html><a href="/a">a</a></html>', content_type="text/html"),
        f"{SEED}/robots.txt": Page(body=robot),
        f"{SEED}/sitemap.xml": Page(body=body_xml),
        f"{SEED}/a": Page(body='<html><a href="/a">a</a></html>', content_type="text/html"),
    }
    out = crawl(
        pages, SEED, CrawlConfig(user_agent="a", no_head=True, depth=1, robots_policy="crawl")
    )
    assert any("hello" in r for r in out.results)


# -- TestCrawlerFilterTags (crawler_test.go:681-710) --
def test_filter_tags():
    body = '<html><a href="link">ok</a><img src="bad"/><iframe src="ok"/></html>'
    pages = {SEED: Page(body=body, content_type="text/html")}
    out = crawl(pages, SEED, CrawlConfig(no_head=True, depth=1, tags=("a", "iframe")))
    assert out.results
    assert not any("bad" in r for r in out.results)


# -- TestCrawlerIgnored (crawler_test.go:712-752) --
def test_ignored():
    pages = {
        SEED: Page(body='<html><a href="/a">a</a><a href="/b">b</a></html>', content_type="text/html"),
        f"{SEED}/a": Page(body='<html><a href="http://a">a</a></html>', content_type="text/html"),
        f"{SEED}/b": Page(body='<html><a href="http://b">b</a></html>', content_type="text/html"),
    }
    out = crawl(pages, SEED, CrawlConfig(depth=1, ignored=("b",), no_head=False))
    assert "http://b/" not in out.results
    assert "http://a/" in out.results  # /a was crawled


# -- TestCrawlerScanJSURL / Inline (crawler_test.go:800-878) --
def test_scan_js_external():
    pages = {
        SEED: Page(body='<html><script src="test.js"></script></html>', content_type="text/html"),
        f"{SEED}/test.js": Page(body='function() { url = "/api/v1/user"; }', content_type="application/javascript"),
    }
    out = crawl(pages, SEED, CrawlConfig(depth=1, no_head=True, scan_js=True))
    assert any(r.endswith("/api/v1/user") for r in out.results)


def test_scan_js_inline():
    pages = {
        SEED: Page(
            body='<html><body><script>var foo = "http://test.me/";</script></body></html>',
            content_type="text/html",
        )
    }
    out = crawl(pages, SEED, CrawlConfig(depth=1, no_head=True, scan_js=True))
    assert "http://test.me/" in out.results


# -- TestCrawlerScanCSSURL / NoCT / Inline (crawler_test.go:880-967, 987-1022) --
def test_scan_css_external():
    pages = {
        SEED: Page(
            body='<html><link href="test.css" rel="stylesheet" type="text/css"/></html>',
            content_type="text/html",
        ),
        f"{SEED}/test.css": Page(body="foo {bar:url(//static/test.png);}", content_type="text/css"),
    }
    out = crawl(pages, SEED, CrawlConfig(depth=1, no_head=True, scan_css=True))
    assert any(r.endswith("test.png") for r in out.results)


def test_scan_css_no_content_type():
    pages = {
        SEED: Page(
            body='<html><link href="test.css" rel="stylesheet" type="text/css"/></html>',
            content_type="text/html",
        ),
        f"{SEED}/test.css": Page(body="foo {bar:url(//static/test2.png);}"),  # class by extension
    }
    out = crawl(pages, SEED, CrawlConfig(depth=1, no_head=True, scan_css=True))
    assert any(r.endswith("test2.png") for r in out.results)


def test_scan_css_inline():
    body = '<html><head><style>\nbody {background: url("test.png");}\n</style></head><body></body></html>'
    pages = {SEED: Page(body=body, content_type="text/html")}
    out = crawl(pages, SEED, CrawlConfig(depth=1, no_head=True, scan_css=True))
    assert any(r.endswith("test.png") for r in out.results)


# -- seed-canonical-variant quirk (crawler.go:97-98): the seen set is seeded
# with the *raw* seed string, so the canonical form with trailing '/' is
# re-emitted when discovered --
def test_seed_canonical_variant_reemitted():
    pages = {SEED: Page(body=f'<html><a href="{SEED}/">self</a></html>', content_type="text/html")}
    out = crawl(pages, SEED, CrawlConfig(depth=1, no_head=False))
    assert out.results == [f"{SEED}/"]


# -- dedup: first occurrence wins, case-insensitive key --
def test_dedup_case_insensitive():
    body = '<html><a href="http://X/p">1</a><a href="http://x/P">2</a><a href="http://x/p">3</a></html>'
    pages = {SEED: Page(body=body, content_type="text/html")}
    out = crawl(pages, SEED, CrawlConfig(depth=1, no_head=False))
    assert out.results == ["http://X/p"]
