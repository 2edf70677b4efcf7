"""Redirect-chain resolution tests (operators/redirects.py)."""

import pytest

from crawley_spark.operators.redirects import resolve_redirects


def _run(spark, rows, max_hops=4):
    df = spark.createDataFrame(rows, "url string, status int, location string")
    return {
        r["url"]: (r["final_url"], r["n_hops"], r["terminal"])
        for r in resolve_redirects(df, max_hops=max_hops).collect()
    }


def test_redirect_fixture_matrix(spark):
    got = _run(
        spark,
        [
            ("a", 301, "b"),
            ("b", 301, "c"),
            ("c", 200, None),
            ("d", 302, "ext"),  # off-corpus target
            ("e", 301, "e"),  # self-loop
            ("f", 200, None),
            ("g", 307, "h"),
            ("h", 308, "g"),  # 2-cycle
            ("i", 301, None),  # 3xx without Location: terminal at itself
        ],
    )
    assert got["a"] == ("c", 2, "ok")
    assert got["b"] == ("c", 1, "ok")
    assert got["c"] == ("c", 0, "ok")
    assert got["d"] == ("ext", 1, "dangling")
    assert got["e"] == ("e", 4, "max_hops")
    assert got["f"] == ("f", 0, "ok")
    assert got["g"] == ("g", 4, "max_hops")
    assert got["h"] == ("h", 4, "max_hops")
    assert got["i"] == ("i", 0, "ok")


def test_redirect_chain_of_exactly_max_hops_resolves(spark):
    """A chain whose length equals max_hops lands on its terminal on the
    last step and must classify ok, not max_hops."""
    rows = [("u0", 301, "u1"), ("u1", 301, "u2"), ("u2", 301, "u3"), ("u3", 200, None)]
    got = _run(spark, rows, max_hops=3)
    assert got["u0"] == ("u3", 3, "ok")
    # one hop short: still mid-chain
    got2 = _run(spark, rows, max_hops=2)
    assert got2["u0"] == ("u2", 2, "max_hops")


def test_redirect_brute_parity(spark):
    """Seeded random redirect graph vs a straight-line Python mirror."""
    import random

    rng = random.Random(11)
    n = 60
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.4:
            rows.append((f"u{i}", 301, f"u{rng.randrange(n + 10)}"))
        else:
            rows.append((f"u{i}", 200, None))
    max_hops = 5
    got = _run(spark, rows, max_hops=max_hops)
    edges = {u: loc for u, st, loc in rows if 300 <= st <= 399 and loc}
    known = {u for u, _, _ in rows}
    for u, _, _ in rows:
        cur, hops = u, 0
        while hops < max_hops and cur in edges:
            cur = edges[cur]
            hops += 1
        term = (
            "max_hops" if cur in edges else ("ok" if cur in known else "dangling")
        )
        assert got[u] == (cur, hops, term), u


def test_redirect_validation(spark):
    df = spark.createDataFrame([("a", 200, None)], "url string, status int, location string")
    with pytest.raises(ValueError):
        resolve_redirects(df, max_hops=0)
