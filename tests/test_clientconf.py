"""Client-config utility vectors ported from client/cookie_test.go,
client/header_test.go, values/list_test.go, values/smart_test.go."""

from crawley_spark.functions.clientconf import (
    list_values,
    parse_cookies,
    parse_headers,
    proxy_auth_header,
    smart_values,
)


def test_parse_cookies():
    got = parse_cookies(["NAME1=VALUE1;NAME2=ENCODED%20VALUE;", "NAME3=VALUE3"])
    assert got == [("NAME1", "VALUE1"), ("NAME2", "ENCODED%20VALUE"), ("NAME3", "VALUE3")]
    got = parse_cookies(["", "NAME=", "=VALUE", ";;", "===", " VALID = COOKIE "])
    assert got == [("NAME", ""), ("VALID", "COOKIE")]
    assert parse_cookies(["some_file.txt"]) == []


def test_parse_headers():
    assert parse_headers(["foo: bar", "test: me"]) == [("foo", "bar"), ("test", "me")]
    assert parse_headers(["   one: 1", "junk-key:", "two   : 2  ", ":junk-val"]) == [
        ("one", "1"),
        ("two", "2"),
    ]


def test_proxy_auth_header():
    # util_test.go:246-257
    assert proxy_auth_header("user:pass") == "Proxy-Authorization: Basic dXNlcjpwYXNz"


def test_list_values():
    assert list_values(["a", "b,c", "d"]) == ["a", "b", "c", "d"]


def test_smart_values(tmp_path):
    f = tmp_path / "vals.txt"
    f.write_text("one\ntwo\n")
    assert smart_values(["plain", f"@{f.name}"], root=str(tmp_path)) == ["plain", "one", "two"]


def test_cli_flag_surface_parity(tmp_path, monkeypatch):
    """Flag-for-flag parity with cmd/crawley/main.go:173-208: every reference
    flag parses, and -skip-ssl / -proxy-auth / -header / -cookie are carried
    into the CrawlConfig (headers/cookies Smart-load '@' files like
    values/smart.go; proxy auth becomes the client header, options.go:112)."""
    import argparse

    from crawley_spark.__main__ import main

    hdr_file = tmp_path / "hdrs"
    hdr_file.write_text("X-From-File: 1\nX-Other: 2\n")

    captured = {}

    def fake_crawl(spark, pages, seed, cfg, **kw):
        captured["cfg"] = cfg
        raise SystemExit(0)  # stop before running Spark

    monkeypatch.setattr("crawley_spark.engine.crawl", fake_crawl)
    monkeypatch.setattr(
        "crawley_spark.__main__.get_spark",
        lambda *a, **kw: type(
            "S",
            (),
            {
                "sparkContext": type("C", (), {"setLogLevel": lambda self, l: None})(),
                "read": type("R", (), {"parquet": lambda self, p: None})(),
            },
        )(),
    )
    argv = [
        "--corpus", "/dev/null", "-depth", "2", "-workers", "8",
        "-delay", "200ms", "-timeout", "6s", "-tag", "a,iframe",
        "-ignore", "x,y", "-robots", "respect", "-dirs", "hide",
        "-brute", "-js", "-css", "-headless", "-subdomains",
        "-skip-ssl", "-proxy-auth", "user:pass",
        "-header", f"@{hdr_file}", "-header", "X-Inline: 3",
        "-cookie", "k=v", "-silent", "http://h0.test",
    ]
    try:
        main(argv)
    except SystemExit:
        pass
    cfg = captured["cfg"]
    assert cfg.depth == 2 and cfg.workers == 8
    assert cfg.delay_ms == 200 and cfg.timeout_ms == 6000
    assert cfg.robots_policy == "respect" and cfg.dirs_policy == "hide"
    assert cfg.brute and cfg.scan_js and cfg.scan_css and cfg.subdomains
    assert cfg.skip_ssl
    assert cfg.tags == ("a", "iframe") and cfg.ignored == ("x", "y")
    assert cfg.cookies == ("k=v",)
    assert "X-From-File: 1" in cfg.headers and "X-Other: 2" in cfg.headers
    assert "X-Inline: 3" in cfg.headers
    assert cfg.headers[-1] == proxy_auth_header("user:pass")
