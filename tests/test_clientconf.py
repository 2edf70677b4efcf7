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
