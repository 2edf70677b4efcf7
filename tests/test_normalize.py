"""Unicode normalization (operators/normalize.py)."""

import random
import unicodedata

import pytest

from crawley_spark.operators.normalize import (
    CONTROL_RANGES,
    FORMAT_RANGES,
    WS_RANGES,
    duckdb_char_class,
    normalize_str,
    normalize_text,
)


class TestKernel:
    def test_nfc_composition(self):
        assert normalize_str("café") == "café"
        assert normalize_str("naïve") == "naïve"

    def test_control_and_format_drop(self):
        assert normalize_str("a\x00b\x07c\x7fd\x85e") == "abcde"
        assert normalize_str("zero​width­soft﻿bom") == "zerowidthsoftbom"
        assert normalize_str("rtl‮ovr‬") == "rtlovr"

    def test_whitespace_collapse_and_trim(self):
        assert normalize_str("  a \t\r\n b c　d  ") == "a b c d"
        assert normalize_str("     ") == ""

    def test_format_char_bridging_whitespace(self):
        # drop runs before collapse: " ​ " must become one space
        assert normalize_str("a ​ b") == "a b"

    def test_edge_strip_is_ascii_space_only(self):
        # U+1680 OGHAM SPACE MARK is outside the WS table on BOTH sides;
        # bare str.strip() would eat it and diverge from the SQL oracle
        assert normalize_str(" x ") == " x "

    def test_idempotent(self):
        random.seed(7)
        pool = (
            [chr(random.randrange(0x20, 0x2FF)) for _ in range(40)]
            + ["​", "\x07", " ", "　", "é", " ", "\t"]
        )
        for _ in range(200):
            s = "".join(random.choice(pool) for _ in range(random.randrange(0, 60)))
            n = normalize_str(s)
            assert normalize_str(n) == n

    def test_tables_cover_their_categories(self):
        # every code point in the tables really is Cc / Cf / whitespace-ish
        for a, b in CONTROL_RANGES:
            for cp in range(a, b + 1):
                assert unicodedata.category(chr(cp)) == "Cc"
        for a, b in FORMAT_RANGES:
            for cp in range(a, b + 1):
                assert unicodedata.category(chr(cp)) == "Cf"
        for a, b in WS_RANGES:
            for cp in range(a, b + 1):
                c = chr(cp)
                assert c.isspace() or unicodedata.category(c) == "Zs"

    def test_duckdb_char_class_shape(self):
        cls = duckdb_char_class([(0x07, 0x07), (0x200B, 0x200F)])
        assert cls == "[\\x{0007}\\x{200B}-\\x{200F}]"


class TestOperator:
    def test_matches_kernel_and_flags(self, spark):
        rows = [
            (0, "plain ascii stays"),
            (1, "café  double  space"),
            (2, "\x07ctl​fmt"),
            (3, None),
            (4, ""),
            (5, "   "),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in normalize_text(df).collect()}
        for i, s in rows:
            if s is None:
                assert got[i].norm is None and got[i].changed is None
                assert got[i].n_chars_after is None
                continue
            n = normalize_str(s)
            assert got[i].norm == n
            assert got[i].changed == (s != n)
            assert got[i].n_chars_before == len(s)
            assert got[i].n_chars_after == len(n)
        assert got[0].changed is False and got[1].changed is True
        assert got[5].norm == "" and got[5].changed is True

    def test_random_brute_parity(self, spark):
        random.seed(11)
        pool = "ab \t ​\x07é　﻿"
        rows = [
            (i, "".join(random.choice(pool) for _ in range(random.randrange(0, 30))))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r.norm for r in normalize_text(df).collect()}
        assert got == {i: normalize_str(s) for i, s in rows}
