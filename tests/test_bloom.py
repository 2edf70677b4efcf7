"""Bloom-prefilter correctness: the prefilter must never change results
(false positives fall back to the exact join; the shard set must cover every
seen key, including bootstrap-seeded raw seed strings)."""

from pyspark.sql import functions as F

from crawley_spark import interp
from crawley_spark.config import CrawlConfig
from crawley_spark.engine import crawl as spark_crawl
from crawley_spark.interp import Page

from .conftest import pages_to_df
from .test_engine_parity import synth_site


def test_seed_rediscovery_not_reemitted(spark):
    """Pages link back to the *raw* seed string; its key is in the bootstrap
    seen set (crawler.go:97-98) and must be bloom-covered, else it would be
    wrongly re-emitted as definitely-new."""
    seed = "http://t"
    pages = {
        seed: Page(body=f'<a href="/a">a</a>', content_type="text/html"),
        f"{seed}/a": Page(body=f'<a href="{seed}">home</a><a href="/b">b</a>', content_type="text/html"),
        f"{seed}/b": Page(body=f'<a href="{seed}">home</a>', content_type="text/html"),
    }
    cfg = CrawlConfig(depth=-1, no_head=True)
    want = interp.crawl(pages, seed, cfg)
    report = spark_crawl(spark, pages_to_df(spark, pages), seed, cfg, bloom_prefilter=True, bloom_min_seen=0, driver_wave_rows=0)
    assert report.result_urls("run0") == want.results
    assert seed not in report.result_urls("run0")
    report.state.cleanup()


def test_bloom_on_off_identical(spark):
    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True, scan_js=True)
    df = pages_to_df(spark, pages)
    on = spark_crawl(spark, df, "http://h0.example", cfg, bloom_prefilter=True, bloom_min_seen=0, driver_wave_rows=0)
    off = spark_crawl(spark, df, "http://h0.example", cfg, bloom_prefilter=False, driver_wave_rows=0)
    assert on.result_urls("run0") == off.result_urls("run0")
    seen_on = {r["url_key"] for r in on.seen("run0").collect()}
    seen_off = {r["url_key"] for r in off.seen("run0").collect()}
    assert seen_on == seen_off
    # FP metric recorded and sane: false positives are a small fraction of
    # the new candidates
    fps = sum(
        r["value"] for r in on.metrics().filter("metric = 'bloom_false_positives'").collect()
    )
    new_total = on.seen("run0").count()
    assert fps <= max(2, new_total // 20)
    on.state.cleanup()
    off.state.cleanup()


def test_bloom_resume_covers_prior_iterations(spark, tmp_path):
    pages = synth_site()
    cfg = CrawlConfig(depth=-1, no_head=True)
    want = interp.crawl(pages, "http://h0.example", cfg)
    ck = str(tmp_path / "ck")
    spark_crawl(spark, pages_to_df(spark, pages), "http://h0.example", cfg,
                checkpoint_dir=ck, max_iterations=2, bloom_min_seen=0, driver_wave_rows=0)
    resumed = spark_crawl(spark, pages_to_df(spark, pages), "http://h0.example", cfg,
                          checkpoint_dir=ck, resume=True, bloom_min_seen=0, driver_wave_rows=0)
    assert resumed.result_urls("run0") == want.results
