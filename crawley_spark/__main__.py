"""CLI mirroring the reference's flag surface (cmd/crawley/main.go:173-208),
crawling a parquet pages corpus instead of the live web:

    python -m crawley_spark --corpus /path/pages.parquet \
        [-depth N] [-robots ignore|crawl|respect] [-dirs show|hide|only]
        [-tag a,iframe] [-ignore pat] [-brute] [-js] [-css] [-all]
        [-headless] [-subdomains] [-delay 150ms] [-timeout 5s]
        [-workers N] [-user-agent UA] [-skip-ssl] [-proxy-auth user:pass]
        [-header 'K: v'|@file] [-cookie 'k=v'|@file] [-silent] [-version]
        <seed_url>

Prints discovered URLs line-per-URL in canonical crawl order (stdout),
config/progress to stderr — the reference's stdout/stderr contract
(main.go:76-90).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

from . import __version__
from .config import CrawlConfig
from .functions.clientconf import list_values, smart_values
from .session import get_spark


def _duration_ms(s: str) -> int:
    """Go-style duration ('150ms', '5s', '2m', bare int = ms)."""
    m = re.fullmatch(r"(\d+(?:\.\d+)?)(ms|s|m|h)?", s)
    if not m:
        raise argparse.ArgumentTypeError(f"bad duration: {s}")
    mult = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000}[m.group(2) or "ms"]
    return int(float(m.group(1)) * mult)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="crawley_spark", add_help=True)
    ap.add_argument(
        "--corpus", required=False,
        help="pages corpus path: parquet, .warc/.warc.gz capture files, "
        "or .jsonl/.ndjson(.gz) page dumps",
    )
    ap.add_argument("--checkpoint", default=None, help="crawl state dir (resume with --resume)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("-depth", "--depth", type=int, default=0)
    ap.add_argument("-workers", "--workers", type=int, default=4)
    ap.add_argument("-delay", "--delay", type=_duration_ms, default=150)
    ap.add_argument("-timeout", "--timeout", type=_duration_ms, default=5000)
    ap.add_argument("-tag", "--tag", action="append", default=[])
    ap.add_argument("-ignore", "--ignore", action="append", default=[])
    ap.add_argument("-robots", "--robots", default="ignore")
    ap.add_argument("-dirs", "--dirs", default="show")
    ap.add_argument("-brute", "--brute", action="store_true")
    ap.add_argument("-js", "--js", action="store_true")
    ap.add_argument("-css", "--css", action="store_true")
    ap.add_argument("-all", "--all", dest="scan_all", action="store_true")
    ap.add_argument("-headless", "--headless", action="store_true")
    ap.add_argument("-subdomains", "--subdomains", action="store_true")
    ap.add_argument("-silent", "--silent", action="store_true")
    ap.add_argument("-skip-ssl", "--skip-ssl", dest="skip_ssl", action="store_true")
    ap.add_argument("-user-agent", "--user-agent", dest="user_agent", default=None)
    ap.add_argument("-proxy-auth", "--proxy-auth", dest="proxy_auth", default="")
    ap.add_argument("-header", "--header", action="append", default=[])
    ap.add_argument("-cookie", "--cookie", action="append", default=[])
    ap.add_argument("-version", "--version", action="store_true")
    ap.add_argument("seed", nargs="?")
    args = ap.parse_args(argv)

    if args.version:
        print(f"crawley_spark {__version__}")
        return 0
    if not args.seed or not args.corpus:
        ap.print_usage(sys.stderr)
        return 1

    # headers/cookies are Smart values ('@file' loads line-per-value,
    # main.go:96-117); tags/ignored are List values (CSV-expanding,
    # main.go:178-179); proxy-auth becomes a client header (options.go:112)
    cfg = CrawlConfig(
        depth=args.depth,
        workers=args.workers,
        delay_ms=args.delay,
        timeout_ms=args.timeout,
        robots_policy=args.robots,
        dirs_policy=args.dirs,
        brute=args.brute,
        scan_js=args.js or args.scan_all,
        scan_css=args.css or args.scan_all,
        subdomains=args.subdomains,
        no_head=args.headless,
        skip_ssl=args.skip_ssl,
        tags=tuple(list_values(args.tag)),
        ignored=tuple(list_values(args.ignore)),
        headers=tuple(smart_values(args.header)),
        cookies=tuple(smart_values(args.cookie)),
        **({"user_agent": args.user_agent} if args.user_agent else {}),
    ).with_proxy_auth(args.proxy_auth).validated()

    spark = get_spark("crawley-cli")
    spark.sparkContext.setLogLevel("ERROR")
    if not args.silent:
        print(cfg.dump(), file=sys.stderr)

    from .engine import crawl

    # .warc/.warc.gz corpora (Common Crawl's native container) route
    # through the WARC source; .jsonl/.ndjson dumps through the JSONL
    # source; anything else is a parquet pages table
    _dir_files = os.listdir(args.corpus) if os.path.isdir(args.corpus) else []
    _warc_exts = (".warc", ".warc.gz")
    _jsonl_exts = (".jsonl", ".jsonl.gz", ".ndjson", ".ndjson.gz")
    if args.corpus.rstrip("/").endswith(_warc_exts) or any(
        f.endswith(_warc_exts) for f in _dir_files
    ):
        from .sources.warc import pages_from_warc

        pages = pages_from_warc(spark, args.corpus)
    elif args.corpus.rstrip("/").endswith(_jsonl_exts) or any(
        f.endswith(_jsonl_exts) for f in _dir_files
    ):
        from .sources.pages import pages_from_jsonl

        pages = pages_from_jsonl(spark, args.corpus)
    else:
        pages = spark.read.parquet(args.corpus)
    report = crawl(
        spark, pages, args.seed, cfg, checkpoint_dir=args.checkpoint, resume=args.resume
    )
    for url in report.result_urls("run0"):
        print(url)
    if not args.silent:
        m = {r["metric"]: r["value"] for r in report.metrics().groupBy("metric").sum("value")
             .withColumnRenamed("sum(value)", "value").collect()}
        print(f"[crawley_spark] iterations={report.iterations} "
              f"fetched={m.get('frontier_in', 0)} emitted={m.get('emitted', 0)}", file=sys.stderr)
    if args.checkpoint is None:
        report.state.cleanup()
    return 0


if __name__ == "__main__":
    sys.exit(main())
