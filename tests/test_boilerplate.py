"""Boilerpipe-style block segmentation + NumWordsRules classification
(operators/boilerplate.py): kernel fixtures, every decision-tree leaf,
seeded brute parity vs a pure-Python tree mirror, and the one-exchange
plan pin."""

import random

import pytest
from pyspark.sql import functions as F

from crawley_spark.operators.boilerplate import (
    classify_blocks,
    extract_main_content,
    html_text_blocks,
    text_blocks_df,
)

# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def test_blocks_basic_segmentation():
    html = "<div>one two</div><p>three four five</p>"
    assert html_text_blocks(html) == [
        ("one two", 2, 0),
        ("three four five", 3, 0),
    ]


def test_blocks_inline_tags_keep_block_open():
    html = "<p>one <b>two</b> <span>three</span> four</p>"
    assert html_text_blocks(html) == [("one two three four", 4, 0)]


def test_blocks_anchor_words_counted_per_element():
    # two adjacent anchors must yield two words, never a merged one
    html = "<p><a href='/x'>home</a><a href='/y'>about</a> extra</p>"
    assert html_text_blocks(html) == [("homeabout extra", 2, 2)]
    html2 = "<p><a href='/x'>home</a> <a href='/y'>about</a> extra</p>"
    assert html_text_blocks(html2) == [("home about extra", 3, 2)]


def test_blocks_script_style_skipped_and_entities():
    html = "<p>a &amp; b</p><script>var x = 'nope';</script><p>c</p>"
    assert html_text_blocks(html) == [("a & b", 3, 0), ("c", 1, 0)]


def test_blocks_boundary_inside_anchor():
    # the words before the boundary attribute to the flushed block, the
    # rest to the next one; the anchor stays open across the flush
    html = "<p><a href='/x'>one two<p>three</a> four</p>"
    assert html_text_blocks(html) == [("one two", 2, 2), ("three four", 2, 1)]


def test_blocks_br_hr_flush_and_empty_dropped():
    html = "<p>one<br>two<hr/>three</p><div>  </div>"
    assert html_text_blocks(html) == [
        ("one", 1, 0),
        ("two", 1, 0),
        ("three", 1, 0),
    ]


def test_blocks_whitespace_collapsed():
    html = "<p>  one\n\t two   three </p>"
    assert html_text_blocks(html) == [("one two three", 3, 0)]


# ---------------------------------------------------------------------------
# decision tree — every leaf
# ---------------------------------------------------------------------------


def _mirror_tree(prev, curr, nxt):
    """Straight-line Python transcription of the published tree (word
    counts and anchor counts as (n_words, n_anchor_words) tuples)."""
    pw, pa = prev
    cw, ca = curr
    nw, _ = nxt
    if ca * 1_000_000 > cw * 333_333:
        return False
    if pa * 1_000_000 <= pw * 555_556:
        if cw > 16:
            return True
        if nw > 15:
            return True
        return pw > 4
    if cw > 40:
        return True
    return nw > 17


LEAF_CASES = [
    # (prev, curr, next) -> expected
    ((0, 0), (10, 9), (0, 0), False),   # curr ld > 1/3 -> boiler
    ((0, 0), (17, 0), (0, 0), True),    # prev-low, curr > 16 -> content
    ((0, 0), (5, 0), (16, 0), True),    # prev-low, short, next > 15
    ((5, 0), (5, 0), (5, 0), True),     # prev-low, short, prev > 4
    ((4, 0), (5, 0), (5, 0), False),    # prev-low, short, all small -> boiler
    ((9, 6), (41, 0), (0, 0), True),    # prev-high, curr > 40 -> content
    ((9, 6), (40, 0), (18, 0), True),   # prev-high, next > 17 -> content
    ((9, 6), (40, 0), (17, 0), False),  # prev-high, both small -> boiler
    # exactly 1/3 density is strictly ABOVE the published 0.333333 constant
    # (1*1e6 = 1_000_000 > 3*333_333 = 999_999) -> boiler; one word more
    # drops below it
    ((3, 1), (3, 1), (3, 1), False),
    ((5, 0), (4, 1), (16, 0), True),
]


def test_tree_leaves_mirror():
    for prev, curr, nxt, want in LEAF_CASES:
        assert _mirror_tree(prev, curr, nxt) is want, (prev, curr, nxt)


def test_classify_blocks_every_leaf(spark):
    rows = []
    for i, (prev, curr, nxt, _) in enumerate(LEAF_CASES):
        for j, (w, a) in enumerate((prev, curr, nxt)):
            if w:
                rows.append((i, j, "x " * w, w, a))
    df = spark.createDataFrame(
        rows,
        "doc_id long, block_idx int, block_text string, n_words long, "
        "n_anchor_words long",
    )
    got = {
        (r.doc_id, r.block_idx): r.is_content
        for r in classify_blocks(df, "doc_id").collect()
    }
    for i, (prev, curr, nxt, want) in enumerate(LEAF_CASES):
        if curr[0]:
            assert got[(i, 1)] is want, (i, prev, curr, nxt)


# ---------------------------------------------------------------------------
# end-to-end + brute parity
# ---------------------------------------------------------------------------


def _page(rng):
    """Random page: nav, content paragraphs, link lists, short crumbs."""
    wl = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    parts = []
    for _ in range(rng.randrange(1, 8)):
        kind = rng.randrange(3)
        if kind == 0:  # link list
            links = " ".join(
                f"<a href='/{i}'>{rng.choice(wl)}</a>" for i in range(rng.randrange(1, 5))
            )
            parts.append(f"<div>{links} {rng.choice(wl)}</div>")
        elif kind == 1:  # paragraph
            n = rng.randrange(1, 60)
            words = " ".join(rng.choice(wl) for _ in range(n))
            parts.append(f"<p>{words}</p>")
        else:  # paragraph with an inline link
            n = rng.randrange(1, 20)
            words = " ".join(rng.choice(wl) for _ in range(n))
            parts.append(
                f"<p>{words} <a href='/x'>{rng.choice(wl)} {rng.choice(wl)}</a></p>"
            )
    return "".join(parts)


def test_classify_brute_parity(spark):
    rng = random.Random(11)
    pages = [(i, _page(rng)) for i in range(30)]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = sorted(
        (r.doc_id, r.block_idx, r.block_text, r.n_words, r.n_anchor_words, r.is_content)
        for r in classify_blocks(text_blocks_df(df, "doc_id", "html"), "doc_id").collect()
    )
    want = []
    for pid, html in pages:
        blocks = html_text_blocks(html)
        feats = [(w, a) for _, w, a in blocks]
        for j, (text, w, a) in enumerate(blocks):
            prev = feats[j - 1] if j > 0 else (0, 0)
            nxt = feats[j + 1] if j + 1 < len(feats) else (0, 0)
            want.append((pid, j, text, w, a, _mirror_tree(prev, (w, a), nxt)))
    assert got == sorted(want)


def test_extract_main_content_end_to_end(spark):
    nav = "<div><a href='/a'>home</a> <a href='/b'>about</a></div>"
    # 45 > 40 words: content even on the prev-high-density branch
    body = "<p>" + " ".join(f"w{i}" for i in range(45)) + "</p>"
    rel = "<p><a href='/r'>more related pages</a> here</p>"
    tail = "<p>copyright notice</p>"
    df = spark.createDataFrame(
        [(1, nav + body + rel + tail), (2, nav)], "doc_id long, html string"
    )
    rows = {r.doc_id: r for r in extract_main_content(df, "doc_id", "html").collect()}
    # nav (ld 1) and rel (ld 3/4) boiler by density; copyright boiler via
    # the prev-high branch (prev = rel); only the long paragraph survives
    r1 = rows[1]
    assert (r1.n_blocks, r1.n_content_blocks, r1.n_content_words) == (4, 1, 45)
    assert r1.main_text == " ".join(f"w{i}" for i in range(45))
    # all-boilerplate page survives with empty main text
    r2 = rows[2]
    assert (r2.n_blocks, r2.n_content_blocks, r2.main_text) == (1, 0, "")


def test_main_content_plan_one_exchange(spark):
    """The classify window and the rollup group on the same document key:
    the hash exchange must appear ONCE and be reused (and never a
    SinglePartition)."""
    df = spark.createDataFrame([(1, "<p>a b c</p>")], "doc_id long, html string")
    plan = (
        extract_main_content(df, "doc_id", "html")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
