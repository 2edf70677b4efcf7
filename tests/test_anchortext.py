"""Anchor-text kernel + aggregation (kernels/anchorx.py,
operators/anchortext.py)."""

from crawley_spark.kernels.anchorx import extract_anchors
from crawley_spark.kernels.gourl import parse
from crawley_spark.operators.anchortext import (
    anchor_text_agg,
    extract_anchor_pairs,
)


BASE = parse("http://h.test/dir/page")


def test_kernel_basic_and_resolution():
    html = '<html><body><a href="/abs">Click  here</a>' \
           '<a href="rel">rel text</a></body></html>'
    got = extract_anchors(html, BASE)
    assert got == [
        ("http://h.test/abs", "Click here"),
        ("http://h.test/dir/rel", "rel text"),
    ]


def test_kernel_entities_and_nested_markup():
    html = '<a href="/x">A &amp; B <b>bold</b> end</a>'
    assert extract_anchors(html, BASE) == [("http://h.test/x", "A & B bold end")]


def test_kernel_implicit_close_and_eof():
    html = '<a href="/one">first <a href="/two">second'
    assert extract_anchors(html, BASE) == [
        ("http://h.test/one", "first"),
        ("http://h.test/two", "second"),
    ]


def test_kernel_missing_or_bad_href():
    html = '<a>no href</a><a href="">empty</a><a href="/ok"></a>'
    assert extract_anchors(html, BASE) == [("http://h.test/ok", "")]


def test_agg_counts_and_top_text_tiebreak(spark):
    pages = [
        ("http://h.test/p1", '<a href="/t">good</a><a href="/t">good</a>'),
        ("http://h.test/p2", '<a href="/t">bad</a><a href="/t">aaa</a>'),
        ("http://h.test/p3", '<a href="/u">only</a>'),
    ]
    df = spark.createDataFrame(pages, ["url", "html"])
    out = {r["target_url"]: r for r in anchor_text_agg(df).collect()}
    t = out["http://h.test/t"]
    assert t["n_anchors"] == 4 and t["n_unique_texts"] == 3
    assert t["top_text"] == "good" and t["top_text_count"] == 2
    u = out["http://h.test/u"]
    assert (u["n_anchors"], u["top_text"]) == (1, "only")
    # tie on count -> bytewise-smallest text wins
    df2 = spark.createDataFrame(
        [("http://h.test/p", '<a href="/t">zz</a><a href="/t">aa</a>')],
        ["url", "html"],
    )
    r = anchor_text_agg(df2).collect()[0]
    assert r["top_text"] == "aa" and r["top_text_count"] == 1


def test_pairs_binary_html_and_null(spark):
    df = spark.createDataFrame(
        [
            ("http://h.test/p", '<a href="/x">t</a>'.encode()),
            ("http://h.test/q", None),
        ],
        "url string, html binary",
    )
    got = extract_anchor_pairs(df).collect()
    assert [(r["target_url"], r["anchor_text"]) for r in got] == [
        ("http://h.test/x", "t")
    ]


def test_plan_html_never_crosses_exchange(spark):
    df = spark.createDataFrame(
        [("http://h.test/p", '<a href="/x">t</a>')], ["url", "html"]
    )
    plan = anchor_text_agg(df)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "html" not in line, line
    assert "SinglePartition" not in plan


def test_canonical_targets(spark):
    """rel=canonical extraction (operators/canonical.py): first-wins,
    case-insensitive token-list rel, entity decode, relative resolution,
    missing/unresolvable declarations -> self-canonical, group rollup."""
    from crawley_spark.operators.canonical import canonical_groups, canonical_targets

    pages = [
        # relative + entity + a second tag that must lose
        ("http://a.test/p1",
         '<head><link rel="canonical" href="/c?x=1&amp;y=2">'
         '<link rel="canonical" href="/WRONG"></head>'),
        # multi-token case-insensitive rel, absolute cross-host
        ("http://a.test/p2",
         '<head><link rel="Alternate CANONICAL" href="http://b.test/c"></head>'),
        # rel token that merely CONTAINS the word must not match
        ("http://a.test/p3", '<head><link rel="canonicalish" href="/no"></head>'),
        # no declaration
        ("http://a.test/p4", "<body>hi</body>"),
        # link without href
        ("http://a.test/p5", '<head><link rel="canonical"></head>'),
        # same canonical as p1 (group of 2 + the declared count)
        ("http://a.test/p6",
         '<head><link rel="canonical" href="http://a.test/c?x=1&y=2"></head>'),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    t = {r["url"]: r for r in canonical_targets(df).collect()}
    assert t["http://a.test/p1"]["canonical_url"] == "http://a.test/c?x=1&y=2"
    assert t["http://a.test/p1"]["had_tag"] and not t["http://a.test/p1"]["is_self"]
    assert t["http://a.test/p2"]["canonical_url"] == "http://b.test/c"
    for u in ("http://a.test/p3", "http://a.test/p4", "http://a.test/p5"):
        assert t[u]["canonical_url"] == u and not t[u]["had_tag"] and t[u]["is_self"]
    g = {r["canonical_url"]: r for r in canonical_groups(canonical_targets(df)).collect()}
    grp = g["http://a.test/c?x=1&y=2"]
    assert grp["n_members"] == 2 and grp["n_declared"] == 2
    assert grp["first_member"] == "http://a.test/p1"
