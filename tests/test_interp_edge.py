"""Edge-behavior scenarios for the interpreter: full per-tag extraction
end-to-end, brute comments, static-link resolution quirks, unicode/query
URLs, depth semantics."""

from crawley_spark.config import CrawlConfig
from crawley_spark.interp import Page, crawl

SEED = "http://t"


def _run(body, cfg=None, extra=None, seed=SEED):
    pages = {seed: Page(body=body, content_type="text/html")}
    if extra:
        pages.update(extra)
    return crawl(pages, seed, cfg or CrawlConfig(depth=1, no_head=True))


def test_all_tags_extracted_in_document_order():
    body = (
        '<html>'
        '<a href="/a">a</a>'
        '<img src="/i.png"/>'
        '<iframe src="/f"></iframe>'
        '<script src="/s.js"></script>'
        '<form action="/form"></form>'
        '<object data="/o.swf"></object>'
        '<track src="/t.vtt"/>'
        '<video poster="/p.jpg" src="/v.mp4"></video>'
        '<audio src="/au.ogg"></audio>'
        '<link href="/l.css"/>'
        '</html>'
    )
    out = _run(body)
    assert out.results == [
        f"{SEED}/a",
        f"{SEED}/i.png",
        f"{SEED}/f",
        f"{SEED}/s.js",
        f"{SEED}/form",
        f"{SEED}/o.swf",
        f"{SEED}/t.vtt",
        f"{SEED}/v.mp4",  # video: src first, then poster (html.go:166-167)
        f"{SEED}/p.jpg",
        f"{SEED}/au.ogg",
        f"{SEED}/l.css",
    ]


def test_picture_source_srcset():
    body = '<picture><source srcset="/art.webp" src="/no.png"/></picture>'
    out = _run(body)
    assert out.results == [f"{SEED}/art.webp"]


def test_brute_comment_url_not_canonicalized():
    # comment URLs bypass cleanURL: fragment kept, case kept (html.go:112)
    body = '<html><!-- HTTP://Ex.Com/Page#frag --></html>'
    out = _run(body, CrawlConfig(depth=1, no_head=True, brute=True))
    assert out.results == ["HTTP://Ex.Com/Page#frag"]


def test_fragment_stripped_and_dedup():
    body = '<a href="/x#one">1</a><a href="/x#two">2</a><a href="/x">3</a>'
    out = _run(body)
    assert out.results == [f"{SEED}/x"]


def test_query_preserved():
    body = '<a href="/search?q=a+b&amp;lang=en">q</a>'
    out = _run(body)
    assert out.results == [f"{SEED}/search?q=a+b&lang=en"]


def test_unicode_path_escaped_like_go():
    body = '<a href="/café/page">c</a>'
    out = _run(body)
    assert out.results == [f"{SEED}/caf%C3%A9/page"]


def test_depth_is_path_based_not_hops():
    # /a/b/c is path-depth 3 — rejected at depth 1 even when discovered
    # directly from the seed page
    body = '<a href="/a/b/c">deep</a><a href="/a">ok</a>'
    extra = {f"{SEED}/a": Page(body='<a href="/a/b/c">deep</a>', content_type="text/html")}
    out = _run(body, CrawlConfig(depth=1, no_head=True), extra)
    assert set(out.results) == {f"{SEED}/a/b/c", f"{SEED}/a"}  # emitted
    assert f"{SEED}/a/b/c" not in out.fetched  # never crawled


def test_js_page_static_links_crawled_only_with_scan_css():
    # staticHandler tags candidates as <link> → crawled iff ScanCSS
    # (crawler.go:281-283 — bug-compatible)
    extra = {
        f"{SEED}/app.js": Page(body='var u = "/found/by/js";', content_type="application/javascript"),
        f"{SEED}/found/by/js": Page(body='<a href="/never">n</a>', content_type="text/html"),
    }
    body = '<script src="/app.js"></script>'
    out = _run(body, CrawlConfig(depth=-1, no_head=True, scan_js=True), extra)
    assert f"{SEED}/found/by/js" in out.results
    assert f"{SEED}/found/by/js" not in out.fetched
    out2 = _run(body, CrawlConfig(depth=-1, no_head=True, scan_js=True, scan_css=True), extra)
    assert f"{SEED}/found/by/js" in out2.fetched


def test_scheme_relative_static_gets_concat_quirk():
    extra = {f"{SEED}/s.css": Page(body="a {b: url(//cdn/x.png);}", content_type="text/css")}
    body = '<link href="/s.css"/>'
    out = _run(body, CrawlConfig(depth=-1, no_head=True, scan_css=True), extra)
    assert "http//cdn/x.png" in out.results  # reference's missing-colon concat


def test_empty_disallow_line_ignored():
    pages = {
        SEED: Page(body='<a href="/a">a</a>', content_type="text/html"),
        f"{SEED}/robots.txt": Page(body="user-agent: *\ndisallow:\ndisallow: /b"),
    }
    out = crawl(pages, SEED, CrawlConfig(depth=1, no_head=True, robots_policy="respect"))
    # '/b' injected as robots link; empty disallow dropped (parser.go:67-71)
    assert f"{SEED}/b" in out.results
    assert f"{SEED}/a" in out.results


def test_sitemap_offsite_emitted_not_crawled():
    pages = {
        SEED: Page(body="<html></html>", content_type="text/html"),
        f"{SEED}/robots.txt": Page(body="sitemap: http://other/sitemap.xml"),
    }
    out = crawl(pages, SEED, CrawlConfig(depth=1, no_head=True, robots_policy="crawl"))
    assert out.results == ["http://other/sitemap.xml"]
    assert "http://other/sitemap.xml" not in out.fetched
