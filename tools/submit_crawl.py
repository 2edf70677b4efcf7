"""spark-submit entry point (north_rule: "run via spark-submit --py-files on
multi-executor clusters"). The package arrives via --py-files; nothing here
imports from a checkout path.

    tools/submit.sh [seed_url] [corpus.parquet]

On a real cluster the same invocation takes --master yarn/k8s and the corpus
is an Iceberg table; locally it runs on local[N] against a parquet corpus
(a synthetic one is generated when no corpus path is given).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> int:
    seed = sys.argv[1] if len(sys.argv) > 1 else "http://h0.test"
    corpus = sys.argv[2] if len(sys.argv) > 2 else None

    spark = SparkSession.builder.appName("crawley-spark-submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from crawley_spark.config import CrawlConfig
    from crawley_spark.engine import crawl
    from crawley_spark.sources.pages import prepare_pages

    if corpus:
        pages = spark.read.parquet(corpus)
    else:
        from crawley_spark.corpus import synth_corpus

        pages = synth_corpus(spark, n_pages=4000, n_hosts=8, links_per_page=8, body_words=24)
    pages = prepare_pages(pages)

    report = crawl(spark, pages, {"run0": seed}, CrawlConfig(depth=-1, no_head=True))
    urls = report.result_urls("run0")
    for u in urls[:20]:
        print(u)
    print(f"# {len(urls)} urls, {report.iterations} iterations", file=sys.stderr)
    report.state.cleanup()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
