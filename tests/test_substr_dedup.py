"""exact_substring_dedup (operators/dedup.py) — Lee et al. 2021 ExactSubstr
semantics via duplicated-L-gram interval marking. Parity is forced against a
straight-line Python mirror (gram Counter + coverage union), across both
reconstruction impls and both key paths."""

import random

import pytest

from crawley_spark.operators.dedup import exact_substring_dedup


def _mirror(texts: dict, L: int):
    from collections import Counter

    grams = Counter()
    for t in texts.values():
        for p in range(len(t) - L + 1):
            grams[t[p : p + L]] += 1
    out = {}
    for i, t in texts.items():
        cov = set()
        for p in range(len(t) - L + 1):
            if grams[t[p : p + L]] >= 2:
                cov.update(range(p, p + L))
        out[i] = (
            len(t),
            len(cov),
            "".join(ch for j, ch in enumerate(t) if j not in cov),
        )
    return out


def _run(spark, texts, L, **kw):
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_chars"], r["n_removed"], r["kept_text"])
        for r in exact_substring_dedup(df, min_len=L, **kw).collect()
    }


SHARED = " the quick brown fox jumps over the lazy dog"


@pytest.mark.parametrize("impl", ["sql", "arrow"])
@pytest.mark.parametrize("hash_grams", [True, False])
def test_planted_fixture_all_paths(spark, impl, hash_grams):
    # prefixes end in DISTINCT chars — a common prefix-suffix would extend
    # the duplicated region left of SHARED (the maximal-substring semantics)
    texts = {
        0: "alpha beta gamma deltaX" + SHARED,  # cross-doc dup with 1
        1: "epsilon zeta eta thetaY" + SHARED,
        2: "iota kappa xyzrepeatphrase xyzrepeatphrase mu",  # within-doc dup
        3: "short",                               # < L: untouched
        4: "",                                    # empty: untouched
        5: SHARED.strip(),                        # whole doc duplicated...
        6: SHARED.strip(),                        # ...both copies emptied
    }
    L = 12
    exp = _mirror(texts, L)
    got = _run(spark, texts, L, impl=impl, hash_grams=hash_grams)
    assert got == exp
    # the planted semantics, asserted explicitly (not just via the mirror):
    assert got[0][2] == "alpha beta gamma deltaX" and got[1][2] == "epsilon zeta eta thetaY"
    assert "xyzrepeatphrase" not in got[2][2]     # both in-doc copies cut
    assert got[3] == (5, 0, "short") and got[4] == (0, 0, "")
    assert got[5][2] == "" and got[6][2] == ""    # remove-all, no survivor


def test_brute_parity_random(spark):
    rng = random.Random(13)
    words = ["ab", "cd", "efg", "hij", "klm", "xy", "zw"]
    texts = {}
    for i in range(25):
        t = " ".join(rng.choice(words) for _ in range(rng.randint(0, 30)))
        if i % 4 == 0:
            t += " PLANTEDLONGPASSAGE COMMON TO MANY"
        texts[i] = t
    L = 10
    exp = _mirror(texts, L)
    assert _run(spark, texts, L) == exp
    assert _run(spark, texts, L, impl="sql") == exp


def test_unicode_chars_are_positions(spark):
    # positions are CHARACTERS, not bytes, on both the gram and the
    # reconstruction side — a multibyte prefix must not shift coverage
    texts = {
        0: "日本語のテキスト" + SHARED,
        1: "ascii prefix here " + SHARED,
        2: "ünïcödé " + "ZQXJKVWPYB REPEATED TAIL",
        3: "other doc with " + "ZQXJKVWPYB REPEATED TAIL",
    }
    L = 15
    exp = _mirror(texts, L)
    for impl in ("sql", "arrow"):
        assert _run(spark, texts, L, impl=impl) == exp


def test_overlapping_run_merges(spark):
    # 'aaaa...' self-overlapping grams must cover the whole run exactly once
    texts = {0: "x" + "a" * 40 + "y", 1: "unrelated content without repeats"}
    L = 8
    exp = _mirror(texts, L)
    got = _run(spark, texts, L)
    assert got == exp
    assert got[0] == (42, 40, "xy")


def test_validation_errors(spark):
    df = spark.createDataFrame([(0, "t")], "doc_id long, text string")
    with pytest.raises(ValueError):
        exact_substring_dedup(df, min_len=1)
    with pytest.raises(ValueError):
        exact_substring_dedup(df, impl="nope")
