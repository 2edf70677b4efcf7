"""Hybrid driver-local small-wave fast path (operators/local_wave.py).

The engine runs tiny BFS waves on the driver (one pushed-down corpus scan,
pure-Python extract/dedup/order over the exact driver-resident seen set)
and big waves on Spark. These tests pin that hybrid ≡ pure-Spark ≡
interpreter byte-for-byte — emission order, seen set, and state tables —
across all-driver runs, mixed driver↔Spark transitions in both directions,
the seen-cap overflow handoff, and resume (which never uses the driver
path but must read driver-written state).
"""

import pytest

from crawley_spark import interp
from crawley_spark.config import CrawlConfig
from crawley_spark.engine import crawl as spark_crawl

from .conftest import pages_to_df
from .scenarios import SCENARIOS
from .test_engine_parity import synth_site


def _driver_iters(report):
    return {
        r["iter"]
        for r in report.metrics().collect()
        if r["metric"] == "driver_path"
    }


def _run(spark, pages, seed, cfg, **kw):
    report = spark_crawl(spark, pages_to_df(spark, pages), seed, cfg, **kw)
    results = report.result_urls("run0")
    seen = {r["url_key"]: r["url"] for r in report.seen("run0").collect()}
    driver_iters = _driver_iters(report)
    n_iters = report.iterations
    report.state.cleanup()
    return results, seen, driver_iters, n_iters


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_scenario_parity_hybrid(spark, name):
    pages, seed, cfg = SCENARIOS[name]
    want = interp.crawl(pages, seed, cfg)
    results, seen, driver_iters, _ = _run(spark, pages, seed, cfg)
    assert results == want.results, f"{name}: emission order mismatch"
    assert seen == want.seen, f"{name}: seen set mismatch"


def test_synth_all_driver_parity(spark):
    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True, scan_js=True)
    want = interp.crawl(pages, "http://h0.example", cfg)
    results, seen, driver_iters, n_iters = _run(
        spark, pages, "http://h0.example", cfg
    )
    assert results == want.results
    assert seen == want.seen
    # the whole site is tiny: every iteration should have taken the fast path
    assert driver_iters, "hybrid never engaged on a tiny site"
    assert len(driver_iters) == n_iters


def test_mixed_transitions_parity(spark):
    """driver → Spark (wave outgrows the threshold) → driver (tail shrinks
    back under it): both handoffs preserve exact order + seen state."""
    # broad middle (root fans out to 8, each fans to 8 more) so mid waves
    # exceed the threshold, then a 1-wide chain tail so late waves shrink
    # back under it
    pages = {"http://t.example": interp.Page(
        body="".join(f'<a href="/p{i}">p</a>' for i in range(8)),
        content_type="text/html",
    )}
    for i in range(8):
        pages[f"http://t.example/p{i}"] = interp.Page(
            body="".join(f'<a href="/q{i}_{j}">q</a>' for j in range(8))
            + ('<a href="/c0">c</a>' if i == 0 else ""),
            content_type="text/html",
        )
        for j in range(8):
            pages[f"http://t.example/q{i}_{j}"] = interp.Page(
                body="<html>leaf</html>", content_type="text/html"
            )
    for k in range(5):
        pages[f"http://t.example/c{k}"] = interp.Page(
            body=f'<a href="/c{k + 1}">n</a>', content_type="text/html"
        )
    cfg = CrawlConfig(depth=-1, no_head=True)
    want = interp.crawl(pages, "http://t.example", cfg)
    results, seen, driver_iters, n_iters = _run(
        spark, pages, "http://t.example", cfg, driver_wave_rows=2
    )
    assert results == want.results
    assert seen == want.seen
    spark_iters = set(range(1, n_iters + 1)) - driver_iters
    assert driver_iters and spark_iters, (
        f"expected a mix of driver and Spark iterations, got driver={driver_iters}"
        f" of {n_iters}"
    )
    # the head wave (1 seed URL) is driver-side; at least one later driver
    # iteration follows a Spark one (the shrink-back handoff)
    assert 1 in driver_iters
    assert any(i - 1 in spark_iters for i in driver_iters if i > 1), (
        "no Spark→driver handoff exercised"
    )


def test_seen_cap_overflow_hands_off(spark):
    """A wave that pushes the driver seen set past driver_seen_cap disables
    the fast path permanently; the crawl finishes pure-Spark, still exact."""
    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True)
    want = interp.crawl(pages, "http://h0.example", cfg)
    results, seen, driver_iters, n_iters = _run(
        spark, pages, "http://h0.example", cfg, driver_seen_cap=10
    )
    assert results == want.results
    assert seen == want.seen
    # once disabled it must never come back, even for tiny tail waves
    if driver_iters:
        assert max(driver_iters) < n_iters or len(driver_iters) == n_iters


def test_hybrid_matches_pure_spark_state(spark):
    """Beyond interpreter parity: the hybrid run's full state tables
    (results incl. seq + iteration, seen incl. bucket) match pure-Spark."""
    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True, scan_js=True)
    df = pages_to_df(spark, pages)
    hy = spark_crawl(spark, df, "http://h0.example", cfg)
    ps = spark_crawl(spark, df, "http://h0.example", cfg, driver_wave_rows=0)
    for table in ("results", "seen"):
        a = sorted(tuple(r) for r in getattr(hy, table)("run0").collect())
        b = sorted(tuple(r) for r in getattr(ps, table)("run0").collect())
        assert a == b, f"{table} table diverged"
    assert hy.iterations == ps.iterations
    hy.state.cleanup()
    ps.state.cleanup()


def test_multi_run_hybrid(spark):
    pages = synth_site()
    seeds = {"a": "http://h0.example", "b": "http://h1.example/p3"}
    cfg = CrawlConfig(depth=2, no_head=True)
    report = spark_crawl(spark, pages_to_df(spark, pages), seeds, cfg)
    for run_id, seed in seeds.items():
        want = interp.crawl(pages, seed, cfg)
        assert report.result_urls(run_id) == want.results, run_id
        got_seen = {r["url_key"]: r["url"] for r in report.seen(run_id).collect()}
        assert got_seen == want.seen, run_id
    report.state.cleanup()


def test_quotas_disable_hybrid(spark):
    """Politeness deferral semantics live in the Spark operators; any quota
    keeps the crawl pure-Spark."""
    pages = synth_site()
    cfg = CrawlConfig(depth=1, no_head=True, delay_ms=100)
    report = spark_crawl(
        spark, pages_to_df(spark, pages), "http://h0.example", cfg,
        politeness_budget_ms=300,
    )
    assert not _driver_iters(report)
    report.state.cleanup()


def test_resume_reads_driver_written_state(spark, tmp_path):
    """A crawl whose early iterations ran driver-side checkpoints the same
    tables; a resumed run (pure-Spark by design) finishes it exactly."""
    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True)
    want = interp.crawl(pages, "http://h0.example", cfg)
    ck = str(tmp_path / "ck")
    partial = spark_crawl(
        spark, pages_to_df(spark, pages), "http://h0.example", cfg,
        checkpoint_dir=ck, max_iterations=2,
    )
    assert partial.iterations == 2
    assert _driver_iters(partial), "head waves should have run driver-side"
    resumed = spark_crawl(
        spark, pages_to_df(spark, pages), "http://h0.example", cfg,
        checkpoint_dir=ck, resume=True,
    )
    assert not _driver_iters(resumed) - _driver_iters(partial)
    assert resumed.result_urls("run0") == want.results
    got_seen = {r["url_key"]: r["url"] for r in resumed.seen("run0").collect()}
    assert got_seen == want.seen
