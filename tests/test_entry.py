"""Driver-contract smoke: entry() runs the flagship crawl on sf0.001 and the
CLI crawls a parquet corpus end-to-end."""

import subprocess
import sys

from pyspark.sql import functions as F


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"run_id", "seq", "url", "iter"}
    # per-run seq is dense from 0
    for run in {r["run_id"] for r in rows}:
        seqs = sorted(r["seq"] for r in rows if r["run_id"] == run)
        assert seqs == list(range(len(seqs)))


def test_text_invariant_query(spark):
    import __spark_entry__ as e

    row = e.queries()["text_invariant"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_pages"] > 0
    assert row["n_mismatch"] == 0


def test_prep_pipeline_funnel(spark):
    """The end-to-end prep capstone (late r05): the funnel is monotone
    non-increasing and every stage keeps something at sf0.001."""
    import __spark_entry__ as e

    row = e.queries()["prep_pipeline"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_input"] >= row["n_after_c4"] >= row["n_after_gopher"] >= row["n_after_dedup"]
    assert row["n_after_dedup"] > 0


def test_queries_oracle_keys_subset(spark):
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20


def test_cli_end_to_end(spark, tmp_path):
    """python -m crawley_spark over a parquet corpus prints URLs in order."""
    from crawley_spark.interp import Page, crawl as icrawl
    from crawley_spark.config import CrawlConfig

    from .conftest import pages_to_df

    seed = "http://cli.test"
    pages = {
        seed: Page(body='<a href="/a">a</a><a href="/b.png">b</a>', content_type="text/html"),
        f"{seed}/a": Page(body='<a href="/c">c</a>', content_type="text/html"),
    }
    corpus = str(tmp_path / "pages")
    pages_to_df(spark, pages).write.parquet(corpus)
    want = icrawl(pages, seed, CrawlConfig(depth=1, no_head=True))
    out = subprocess.run(
        [sys.executable, "-m", "crawley_spark", "--corpus", corpus,
         "-depth", "1", "-headless", "-silent", seed],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "2",
             "PYSPARK_PYTHON": sys.executable},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.splitlines() == want.results


def test_fineweb_pipeline_funnel(spark):
    """The full published-order capstone (closing r05): monotone funnel,
    every stage keeps something, and the planted German/PII docs genuinely
    exercise the language gate and the masking count at sf0.001."""
    import __spark_entry__ as e

    row = e.queries()["fineweb_pipeline"](spark, "/root/testdata/sf0.001").collect()[0]
    assert (
        row["n_input"]
        >= row["n_after_lang"]
        >= row["n_after_c4"]
        >= row["n_after_gopher"]
        >= row["n_after_neardup"]
    )
    assert row["n_after_neardup"] > 0
    assert row["n_after_lang"] < row["n_input"]  # the German plant is dropped
    assert row["n_docs_with_pii"] >= 0 and row["n_emails"] >= row["n_docs_with_pii"]
    assert len(row["final_md5"]) == 32


def test_scheduler_pipeline_funnel(spark):
    """Crawl-scheduler capstone (closing r05): trap gate drops the planted
    traps, the per-host cap + global batch cut bind, Hamilton quotas tile
    the budget exactly (n_wave == budget == sum quota), and the wave is a
    strict subset of the batch (wave_md5 != batch_md5)."""
    import __spark_entry__ as e

    row = e.queries()["scheduler_pipeline"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_frontier"] > row["n_after_traps"]  # planted traps dropped
    assert row["n_after_traps"] > row["n_selected"]  # batch cut binds
    assert row["n_selected"] == 150 and row["n_hosts"] >= 2
    assert row["budget"] == row["n_selected"] // 2 == row["n_wave"]
    assert row["wave_md5"] != row["batch_md5"]
    assert len(row["wave_md5"]) == 32 and len(row["batch_md5"]) == 32
