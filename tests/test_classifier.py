"""Naive-Bayes distillation (operators/classifier.py) — brute parity
against a straight-line Python mirror of the documented integer rules,
separability, prior-only scoring, the pruned-vocab fallback, and the
one-class guard."""

import math
import random

import pytest
from pyspark.sql import functions as F

from crawley_spark.operators.classifier import naive_bayes_distill


def _mirror(texts: dict, labels: dict, min_count: int = 1):
    import re
    from collections import Counter

    def toks(t):
        return re.findall(r"[a-z]+", t.lower())

    def model(ids):
        c = Counter()
        for i in ids:
            c.update(toks(texts[i]))
        n = sum(c.values())
        v = sum(1 for t in c if c[t] >= min_count)
        nv = float(n + v + 1)
        kept = {t: k for t, k in c.items() if k >= min_count}
        s = {t: round_half(1e6 * math.log(nv / (k + 1.0))) for t, k in kept.items()}
        s_unk = int(math.floor(1e6 * math.log(nv) + 0.5))
        return s, s_unk

    def round_half(x):  # engines' HALF_UP on positive values
        return int(math.floor(x + 0.5))

    pos = [i for i in texts if labels[i]]
    neg = [i for i in texts if not labels[i]]
    sp, up = model(pos)
    sn, un = model(neg)
    prior = int(math.floor(1e6 * math.log(len(pos) / len(neg)) + 0.5))
    out = {}
    for i, t in texts.items():
        tt = toks(t)
        m = sum(sn.get(tok, un) - sp.get(tok, up) for tok in tt) + prior
        out[i] = (1 if labels[i] else -1, len(tt), m, m > 0, (m > 0) == labels[i])
    return out


def _run(spark, texts, labels, **kw):
    rows = [(i, texts[i], labels[i]) for i in texts]
    df = spark.createDataFrame(rows, "doc_id long, text string, lab boolean")
    return {
        r["doc_id"]: (r["y"], r["n_tokens"], r["margin_micro"], r["pred_keep"], r["correct"])
        for r in naive_bayes_distill(df, label_col="lab", **kw).collect()
    }


def test_brute_parity_random(spark):
    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "the", "und", "delta"]
    texts, labels = {}, {}
    for i in range(40):
        labels[i] = rng.random() < 0.6
        pool = words + (["the", "of"] if labels[i] else ["und", "der"])
        texts[i] = " ".join(rng.choice(pool) for _ in range(rng.randint(0, 20)))
    got = _run(spark, texts, labels)
    assert got == _mirror(texts, labels)


def test_separable_task_and_prior_only(spark):
    texts = {i: ("goodword filler" if i % 2 == 0 else "badword filler") for i in range(20)}
    texts[20] = ""  # zero tokens: scores prior only
    labels = {i: i % 2 == 0 for i in range(20)}
    labels[20] = True
    got = _run(spark, texts, labels)
    exp = _mirror(texts, labels)
    assert got == exp
    # the separable pair is fully learned
    assert all(got[i][4] for i in range(20))
    # prior-only margin for the empty doc: ln(11/10) > 0 → predicted keep
    assert got[20][1] == 0 and got[20][2] == exp[20][2] and got[20][3]


def test_min_count_prunes_to_unseen_fallback(spark):
    texts = {
        0: "common common rare1",
        1: "common common rare2",
        2: "common common",
        3: "common other other",
    }
    labels = {0: True, 1: True, 2: False, 3: False}
    got = _run(spark, texts, labels, min_count=2)
    assert got == _mirror(texts, labels, min_count=2)


def test_one_class_raises(spark):
    df = spark.createDataFrame([(0, "x", True), (1, "y", True)], "doc_id long, text string, lab boolean")
    with pytest.raises(ValueError):
        naive_bayes_distill(df, label_col="lab")


def test_negative_prior_sign_safe(spark):
    # n_pos < n_neg → negative prior: the floor(x+0.5) form on both sides
    texts = {i: "w" + str(i % 3) for i in range(10)}
    labels = {i: i < 3 for i in range(10)}
    got = _run(spark, texts, labels)
    exp = _mirror(texts, labels)
    assert got == exp
    assert exp[5][2] < 0  # the majority-negative class yields negative margins
