"""Spark engine ≡ pure-Python reference interpreter, byte-exact.

For every ported scenario (tests/scenarios.py) and a larger synthetic site,
the engine's emitted-URL *sequence* (ordered by seq) and final URL-seen *set*
must equal the interpreter's (SURVEY.md §3.4 canonical workers=1 FIFO order).
"""

import pytest

from crawley_spark import interp
from crawley_spark.engine import crawl as spark_crawl
from crawley_spark.config import CrawlConfig
from crawley_spark.interp import Page

from .conftest import pages_to_df
from .scenarios import SCENARIOS


def run_both(spark, pages, seed, cfg, **kw):
    # pin the pure-Spark path: these tests validate the distributed
    # machinery; the hybrid driver path has its own suite (test_driver_wave)
    kw.setdefault("driver_wave_rows", 0)
    want = interp.crawl(pages, seed, cfg)
    report = spark_crawl(spark, pages_to_df(spark, pages), seed, cfg, **kw)
    got_results = report.result_urls("run0")
    got_seen = {r["url_key"]: r["url"] for r in report.seen("run0").collect()}
    report.state.cleanup()
    return want, got_results, got_seen


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_scenario_parity(spark, name):
    pages, seed, cfg = SCENARIOS[name]
    want, got_results, got_seen = run_both(spark, pages, seed, cfg)
    assert got_results == want.results, f"{name}: emission order mismatch"
    assert got_seen == want.seen, f"{name}: seen set mismatch"


def synth_site(n_hosts=3, pages_per_host=12, links_per_page=5):
    """Deterministic multi-host site with cross links, resources, js/css."""
    pages = {}
    hosts = [f"http://h{i}.example" for i in range(n_hosts)]
    for hi, h in enumerate(hosts):
        for p in range(pages_per_host):
            links = []
            for k in range(links_per_page):
                tgt = (p * 7 + k * 3 + hi) % pages_per_host
                href = f"/p{tgt}" if k % 2 == 0 else f"{hosts[(hi + k) % n_hosts]}/p{tgt}"
                links.append(f'<a href="{href}">l{k}</a>')
            links.append(f'<img src="/img{p}.png"/>')
            links.append(f'<script src="/s{p % 3}.js"></script>')
            body = f"<html><body>page {h}/p{p} {' '.join(links)}</body></html>"
            pages[f"{h}/p{p}"] = Page(body=body, content_type="text/html")
        pages[h] = Page(
            body=f'<html><a href="/p0">root</a><a href="/p1">n</a></html>',
            content_type="text/html",
        )
        for j in range(3):
            pages[f"{h}/s{j}.js"] = Page(
                body=f'var a = "/api/{j}"; var b = "http://h{j}.example/deep";',
                content_type="application/javascript",
            )
    return pages


@pytest.mark.parametrize(
    "cfg",
    [
        CrawlConfig(depth=2, no_head=True),
        CrawlConfig(depth=-1, no_head=True, scan_js=True),
        CrawlConfig(depth=3, no_head=True, dirs_policy="hide"),
    ],
    ids=["depth2", "unlimited_js", "hide"],
)
def test_synth_site_parity(spark, cfg):
    pages = synth_site()
    want, got_results, got_seen = run_both(spark, pages, "http://h0.example", cfg)
    assert got_results == want.results
    assert got_seen == want.seen


def test_multi_run(spark):
    pages = synth_site()
    seeds = {"a": "http://h0.example", "b": "http://h1.example/p3"}
    cfg = CrawlConfig(depth=2, no_head=True)
    report = spark_crawl(spark, pages_to_df(spark, pages), seeds, cfg, driver_wave_rows=0)
    for run_id, seed in seeds.items():
        want = interp.crawl(pages, seed, cfg)
        assert report.result_urls(run_id) == want.results, run_id
        got_seen = {r["url_key"]: r["url"] for r in report.seen(run_id).collect()}
        assert got_seen == want.seen, run_id
    report.state.cleanup()


def test_politeness_deferral_preserves_sets(spark):
    """Quota-based deferral must not change the URL-seen set or the emitted
    URL *set* (order may shift — documented divergence, operators/politeness)."""
    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True, delay_ms=100)
    want = interp.crawl(pages, "http://h0.example", cfg)
    report = spark_crawl(
        spark, pages_to_df(spark, pages), "http://h0.example", cfg, politeness_budget_ms=300
    )
    assert set(report.result_urls("run0")) == set(want.results)
    got_seen = {r["url_key"] for r in report.seen("run0").collect()}
    assert got_seen == set(want.seen)
    # deferral actually happened (some iteration deferred > 0)
    deferred = {
        r["iter"]: r["value"]
        for r in report.metrics().filter("metric = 'deferred'").collect()
    }
    assert any(v > 0 for v in deferred.values())
    report.state.cleanup()


def test_politeness_salted_precap_equals_unsalted(spark):
    """The big-wave salted pre-cap (schedule(salt_buckets=...)) must produce
    EXACTLY the unsalted (now, deferred) split — structural argument in the
    docstring: a bucket-rank > quota row has true slot > quota, and every
    true top-quota row survives its own bucket's top-quota."""
    from crawley_spark.operators.politeness import schedule

    rows = (
        [("run0", "mega", f"http://mega/{i:04d}", i) for i in range(300)]
        + [("run0", "b", f"http://b/{i}", i) for i in range(7)]
        + [("run1", "mega", f"http://mega/r1/{i:03d}", i) for i in range(40)]
        + [("run1", "c", f"http://c/{i}", i) for i in range(3)]
    )
    f = spark.createDataFrame(rows, "run_id string, host string, url string, rank long")
    for quotas in ({"run0": 5, "run1": 2}, {"run0": 5, "run1": None}):
        for buckets in (8, 64, 1024):  # incl. buckets >> rows-per-host
            now_p, def_p = schedule(f, quotas)
            now_s, def_s = schedule(f, quotas, salt_buckets=buckets)
            key = lambda df: sorted(tuple(r) for r in df.collect())
            assert key(now_s) == key(now_p), (quotas, buckets)
            assert key(def_s) == key(def_p), (quotas, buckets)


def test_resume_mid_crawl(spark, tmp_path):
    """Kill after iteration k, resume from checkpoint → identical output."""
    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True)
    want = interp.crawl(pages, "http://h0.example", cfg)
    ck = str(tmp_path / "ck")
    partial = spark_crawl(
        spark, pages_to_df(spark, pages), "http://h0.example", cfg,
        checkpoint_dir=ck, max_iterations=2, driver_wave_rows=0,
    )
    assert partial.iterations == 2
    resumed = spark_crawl(
        spark, pages_to_df(spark, pages), "http://h0.example", cfg,
        checkpoint_dir=ck, resume=True, driver_wave_rows=0,
    )
    assert resumed.result_urls("run0") == want.results
    got_seen = {r["url_key"]: r["url"] for r in resumed.seen("run0").collect()}
    assert got_seen == want.seen


@pytest.mark.parametrize(
    "kw",
    [
        dict(bloom_min_seen=0),  # bucket-pruned broadcast semi-join path
        dict(bloom_min_seen=0, semi_broadcast_rows=0),  # pruned shuffle fallback
        dict(bloom_prefilter=False, direct_broadcast_seen_rows=0),  # plain shuffle anti-join
        dict(bloom_prefilter=False),  # broadcast-seen anti-join (small seen)
    ],
    ids=["semi_join", "pruned_shuffle", "plain_shuffle", "broadcast_seen"],
)
def test_seen_join_strategies_parity(spark, kw):
    """Every seen anti-join strategy (engine.py step 4) must produce the
    byte-identical emission order + seen set of the reference interpreter."""
    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True)
    want, got_results, got_seen = run_both(spark, pages, "http://h0.example", cfg, **kw)
    assert got_results == want.results, kw
    assert got_seen == want.seen, kw


def test_seen_partitioned_layout_and_compaction(spark, tmp_path):
    """Seen deltas land bucket-partitioned (pb= dirs), compaction folds them
    into one committed snapshot, pruned reads return exactly the requested
    buckets, and the final state still matches the interpreter."""
    import os

    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True)
    want = interp.crawl(pages, "http://h0.example", cfg)
    ck = str(tmp_path / "ck")
    report = spark_crawl(
        spark, pages_to_df(spark, pages), "http://h0.example", cfg,
        checkpoint_dir=ck, compact_every=2, driver_wave_rows=0,
    )
    assert report.iterations >= 3, "site too small to exercise compaction"
    # compaction committed + bucket-partitioned snapshot exists
    c = report.state.manifest["seen_compact"]
    assert c >= 0
    snap = os.path.join(ck, "seen_compact", f"upto={c}")
    pb_dirs = [d for d in os.listdir(snap) if d.startswith("pb=")]
    assert pb_dirs, "expected pb= partition dirs in the compacted snapshot"
    # full read (compact + deltas) equals the interpreter's seen set
    got_seen = {r["url_key"]: r["url"] for r in report.seen("run0").collect()}
    assert got_seen == want.seen
    assert report.result_urls("run0") == want.results
    # pruned read: a correct superset of the requested buckets' rows (the
    # snapshot prunes to pb= dirs; unpartitioned recent deltas are read
    # whole by design) and strictly smaller than the full table
    all_rows = report.state.seen().collect()
    buckets = sorted({r["bucket"] for r in all_rows})[:2]
    pruned = {tuple(r) for r in report.state.seen(buckets=buckets).collect()}
    wanted = {tuple(r) for r in all_rows if r["bucket"] in set(buckets)}
    assert wanted <= pruned <= {tuple(r) for r in all_rows}
    assert len(pruned) < len(all_rows), "bucket pruning read the whole table"


def test_resume_after_simulated_crash(spark, tmp_path, monkeypatch):
    """Crash inside the pipelined commit window: iteration k+1's table
    writes are durable but its manifest commit never happened (the engine
    commits one iteration behind while pipelining). Resume from the stale
    manifest must replay the uncommitted tail over the leftover dirs
    (idempotent overwrites) and still match the interpreter exactly."""
    from crawley_spark.sources.state import CrawlState

    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True)
    want = interp.crawl(pages, "http://h0.example", cfg)
    ck = str(tmp_path / "ck")

    real_commit = CrawlState.commit

    def commit_drops_tail(self, iteration, *a, **kw):
        # commits for iteration >= 2 are swallowed: every write for the
        # later iterations lands on disk, the manifest stays at 1 — the
        # harshest version of dying between write completion and commit
        if iteration >= 2:
            return None
        return real_commit(self, iteration, *a, **kw)

    monkeypatch.setattr(CrawlState, "commit", commit_drops_tail)
    crashed = spark_crawl(
        spark, pages_to_df(spark, pages), "http://h0.example", cfg,
        checkpoint_dir=ck, driver_wave_rows=0,
    )
    assert crashed.iterations >= 3, "site too small to leave uncommitted dirs"
    monkeypatch.setattr(CrawlState, "commit", real_commit)

    state = CrawlState(spark, ck)
    assert state.load_manifest() and state.manifest["iteration"] == 1
    resumed = spark_crawl(
        spark, pages_to_df(spark, pages), "http://h0.example", cfg,
        checkpoint_dir=ck, resume=True, driver_wave_rows=0,
    )
    assert resumed.result_urls("run0") == want.results
    got_seen = {r["url_key"]: r["url"] for r in resumed.seen("run0").collect()}
    assert got_seen == want.seen


def test_resume_after_compaction(spark, tmp_path):
    """Kill after compaction has run, resume → identical output (the compact
    pointer + delta read path must survive the restart)."""
    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True)
    want = interp.crawl(pages, "http://h0.example", cfg)
    ck = str(tmp_path / "ck")
    partial = spark_crawl(
        spark, pages_to_df(spark, pages), "http://h0.example", cfg,
        checkpoint_dir=ck, max_iterations=4, compact_every=2, driver_wave_rows=0,
    )
    assert partial.state.manifest["seen_compact"] >= 0
    resumed = spark_crawl(
        spark, pages_to_df(spark, pages), "http://h0.example", cfg,
        checkpoint_dir=ck, resume=True, compact_every=2, driver_wave_rows=0,
    )
    assert resumed.result_urls("run0") == want.results
    got_seen = {r["url_key"]: r["url"] for r in resumed.seen("run0").collect()}
    assert got_seen == want.seen


def test_exception_mid_crawl_releases_pool_and_cache(spark, monkeypatch):
    """A Spark job failing mid-crawl must not leak the finalize thread pool,
    in-flight futures, or the persisted wave (VERDICT r02 "what's wrong" #3
    / ADVICE r02): the loop's finally drains or cancels pending work and
    shuts the pool down, and the injected error still propagates."""
    import crawley_spark.engine as eng
    from crawley_spark.sources.state import CrawlState

    pools = []
    real_tpe = eng.ThreadPoolExecutor

    class RecordingPool(real_tpe):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            pools.append(self)

    monkeypatch.setattr(eng, "ThreadPoolExecutor", RecordingPool)

    real_write = CrawlState.write

    def failing_write(self, table, iteration, df):
        if table == "results" and iteration >= 2:
            raise RuntimeError("injected write failure")
        return real_write(self, table, iteration, df)

    monkeypatch.setattr(CrawlState, "write", failing_write)

    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True)
    with pytest.raises(RuntimeError, match="injected write failure"):
        spark_crawl(spark, pages_to_df(spark, pages), "http://h0.example", cfg, driver_wave_rows=0)
    assert pools, "engine did not construct its pool through the patched class"
    assert all(p._shutdown for p in pools), "thread pool leaked on exception"
    # the persisted candidate wave was released (cancel path unpersists)
    jsc = spark.sparkContext._jsc.sc()
    cached = [
        jsc.getRDDStorageInfo()[i].name()
        for i in range(len(jsc.getRDDStorageInfo()))
    ]
    assert not any("mapInPandas" in (n or "") for n in cached), cached


def test_frontier_cap_bounded_queue(spark):
    """Q3 opt-in deterministic analogue of the reference's bounded queues
    (SURVEY §2.6): per-iteration fresh enqueues per run are capped in
    canonical order, the tail is dropped with a metric, dropped URLs stay
    in seen (insert-then-maybe-drop, crawler.go linkHandler), and a
    never-binding cap reproduces the lossless crawl exactly."""
    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True)
    pdf = pages_to_df(spark, pages)
    base = spark_crawl(spark, pdf, "http://h0.example", cfg)
    base_results = base.result_urls("run0")
    base.state.cleanup()

    big = spark_crawl(spark, pdf, "http://h0.example", cfg, frontier_cap=10**6)
    assert big.result_urls("run0") == base_results
    big.state.cleanup()

    capped = spark_crawl(spark, pdf, "http://h0.example", cfg, frontier_cap=3)
    rows = capped.metrics().collect()
    enq = [r["value"] for r in rows if r["metric"] == "enqueued"]
    dropped = sum(r["value"] for r in rows if r["metric"] == "dropped_overflow")
    assert all(v <= 3 for v in enq), enq  # single run → ≤ cap fresh/iteration
    assert dropped > 0
    capped_results = capped.result_urls("run0")
    capped.state.cleanup()
    # a lossy crawl discovers strictly less, never something new
    assert set(capped_results) < set(base_results)
