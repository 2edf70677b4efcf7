"""Crawl-snapshot analytics (operators/snapshot.py): epoch delta and
Cho/Garcia-Molina change-rate estimation."""

import math

import pytest

from crawley_spark.operators.snapshot import (
    change_rate,
    crawl_delta,
    crawl_delta_summary,
)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


# ---------------------------------------------------------------- delta


def test_delta_statuses(spark):
    a = _mk(
        spark,
        [("u1", "same"), ("u2", "old"), ("u3", "gone")],
        ["url", "text"],
    )
    b = _mk(
        spark,
        [("u1", "same"), ("u2", "new"), ("u4", "fresh")],
        ["url", "text"],
    )
    out = {r["url"]: r for r in crawl_delta(a, b).collect()}
    assert out["u1"]["status"] == "unchanged"
    assert out["u2"]["status"] == "changed"
    assert out["u3"]["status"] == "removed"
    assert out["u4"]["status"] == "added"
    assert out["u3"]["digest_b"] is None
    assert out["u4"]["digest_a"] is None
    assert out["u1"]["digest_a"] == out["u1"]["digest_b"]


def test_delta_precomputed_digest_col(spark):
    a = _mk(spark, [("u1", "d1"), ("u2", "d2")], ["url", "h"])
    b = _mk(spark, [("u1", "d1"), ("u2", "dX")], ["url", "h"])
    out = {
        r["url"]: r["status"]
        for r in crawl_delta(a, b, digest_col="h").collect()
    }
    assert out == {"u1": "unchanged", "u2": "changed"}


def test_delta_summary_counts(spark):
    a = _mk(spark, [(f"u{i}", f"t{i}") for i in range(10)], ["url", "text"])
    # 0-5 kept (0-2 changed), 6-9 removed, v0-v2 added
    b_rows = [(f"u{i}", f"t{i}x" if i < 3 else f"t{i}") for i in range(6)]
    b_rows += [(f"v{i}", "new") for i in range(3)]
    b = _mk(spark, b_rows, ["url", "text"])
    s = {
        r["status"]: r["n_urls"]
        for r in crawl_delta_summary(crawl_delta(a, b)).collect()
    }
    assert s == {"added": 3, "changed": 3, "removed": 4, "unchanged": 3}


def test_delta_plan_carries_digests_not_text(spark):
    """The full-outer join exchanges must not carry the text column — the
    digest is computed map-side (the 100 TB shape)."""
    a = _mk(spark, [("u1", "body a")], ["url", "text"])
    b = _mk(spark, [("u1", "body b")], ["url", "text"])
    plan = crawl_delta(a, b)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


# ----------------------------------------------------------- change rate


def _brute_change_rate(history, now_epoch):
    """Straight-line Python mirror of the documented estimator."""
    per = {}
    for url, epoch, digest in history:
        per.setdefault(url, []).append((epoch, digest))
    out = {}
    for url, obs in per.items():
        obs.sort()
        n = len(obs) - 1
        x = sum(1 for i in range(1, len(obs)) if obs[i][1] != obs[i - 1][1])
        last = obs[-1][0]
        age = now_epoch - last
        if n > 0:
            lam = int(
                math.floor(-1e6 * math.log((n - x + 0.5) / (n + 0.5)) + 0.5)
            )
            pr = int(math.floor(1e6 * (1 - math.exp(-(lam / 1e6) * age)) + 0.5))
        else:
            lam = pr = None
        out[url] = (len(obs), n, x, last, lam, age, pr)
    return out


def test_change_rate_brute_parity(spark):
    """Random-ish deterministic history: Spark output equals the pure-Python
    mirror for every url, including the single-fetch NULL path."""
    history = []
    for u in range(20):
        n_fetches = 1 + (u % 5)
        for e in range(n_fetches):
            # digest changes when (u * 7 + e) % 3 == 0 (deterministic churn)
            version = sum(1 for k in range(e + 1) if (u * 7 + k) % 3 == 0)
            history.append((f"u{u}", e, f"d{u}-{version}"))
    df = _mk(spark, history, ["url", "epoch", "digest"])
    now = max(e for _, e, _ in history)
    got = {
        r["url"]: (
            r["n_obs"],
            r["n_intervals"],
            r["n_changes"],
            r["last_epoch"],
            r["lambda_micro"],
            r["age"],
            r["pr_stale_micro"],
        )
        for r in change_rate(df, now_epoch=now).collect()
    }
    assert got == _brute_change_rate(history, now)


def test_change_rate_known_values(spark):
    # u: 4 fetches, 3 intervals, 2 changes -> lambda = -ln(1.5/3.5)*1e6
    rows = [("u", 0, "a"), ("u", 1, "b"), ("u", 2, "b"), ("u", 3, "c")]
    df = _mk(spark, rows, ["url", "epoch", "digest"])
    r = change_rate(df, now_epoch=5).collect()[0]
    assert r["n_intervals"] == 3 and r["n_changes"] == 2
    assert r["lambda_micro"] == int(
        math.floor(-1e6 * math.log(1.5 / 3.5) + 0.5)
    )
    assert r["age"] == 2
    expected_pr = int(
        math.floor(1e6 * (1 - math.exp(-(r["lambda_micro"] / 1e6) * 2)) + 0.5)
    )
    assert r["pr_stale_micro"] == expected_pr


def test_change_rate_all_changed_is_finite(spark):
    """X = n would be a log(0) pole without the 0.5 bias correction."""
    rows = [("u", 0, "a"), ("u", 1, "b"), ("u", 2, "c")]
    df = _mk(spark, rows, ["url", "epoch", "digest"])
    r = change_rate(df, now_epoch=2).collect()[0]
    assert r["lambda_micro"] == int(math.floor(-1e6 * math.log(0.5 / 2.5) + 0.5))
    assert r["age"] == 0 and r["pr_stale_micro"] == 0


def test_change_rate_single_fetch_null(spark):
    df = _mk(spark, [("u", 7, "a")], ["url", "epoch", "digest"])
    r = change_rate(df).collect()[0]  # now_epoch defaults to max epoch
    assert r["n_intervals"] == 0
    assert r["lambda_micro"] is None and r["pr_stale_micro"] is None
    assert r["age"] == 0


def test_change_rate_never_changed_low_rate(spark):
    rows = [("u", e, "same") for e in range(5)]
    df = _mk(spark, rows, ["url", "epoch", "digest"])
    r = change_rate(df, now_epoch=10).collect()[0]
    # X = 0 over 4 intervals: lambda = -ln(4.5/4.5) = 0 exactly
    assert r["n_changes"] == 0 and r["lambda_micro"] == 0
    assert r["pr_stale_micro"] == 0


def test_change_rate_no_global_sort(spark):
    """The lag window must hash-partition by url, never plan a global sort
    (no SinglePartition / range partitioning in any exchange)."""
    rows = [("u%d" % u, e, "d") for u in range(8) for e in range(3)]
    df = _mk(spark, rows, ["url", "epoch", "digest"])
    plan = (
        change_rate(df, now_epoch=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "rangepartitioning" not in plan.lower()
