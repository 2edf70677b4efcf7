"""BM25 ranking (operators/search.py): brute parity vs a straight-line
Python mirror, fixtures for the published behaviors, and plan pins."""

import math

import pytest

from crawley_spark.operators.search import bm25_topk


def _brute_bm25(docs, queries, k, k1_milli=1200, b_milli=750):
    """Pure-Python mirror of the documented arithmetic (same parse tree)."""
    tok_lists = {i: [t for t in txt.lower().split() if t.isalpha()] for i, txt in docs.items()}
    # mirror [a-z]+ extraction: split punctuation-free fixtures only
    n_docs = len(docs)
    l_total = sum(len(v) for v in tok_lists.values())
    k1 = float(k1_milli)
    b_frac = b_milli / 1000.0
    out = {}
    for qid, qtext in queries.items():
        terms, seen = [], set()
        for tok in qtext.lower().split():
            run = "".join(ch for ch in tok if "a" <= ch <= "z")
            if run and run not in seen:
                seen.add(run)
                terms.append(run)
        scores = {}
        for t in terms:
            df = sum(1 for v in tok_lists.values() if t in v)
            if df == 0:
                continue
            idf = int(
                math.floor(
                    1e6 * math.log(1.0 + (float(n_docs) - df + 0.5) / (df + 0.5))
                    + 0.5
                )
            )
            for i, v in tok_lists.items():
                tf = v.count(t)
                if tf == 0:
                    continue
                tfnorm = (tf * (k1 + 1000.0)) / (
                    tf * 1000.0
                    + k1
                    * (
                        (1.0 - b_frac)
                        + b_frac * (len(v) * float(n_docs) / float(l_total))
                    )
                )
                scores[i] = scores.get(i, 0) + int(math.floor(idf * tfnorm + 0.5))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(r + 1, i, s) for r, (i, s) in enumerate(ranked)]
    return out


def _run(spark, docs, queries, k=10, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], ["doc_id", "text"]
    )
    rows = bm25_topk(df, queries, k=k, **kw).collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score_micro"])
        )
    return got


def test_brute_parity_seeded(spark):
    """30-doc deterministic corpus, 3 queries: Spark == Python mirror."""
    vocab = ["spark", "crawl", "index", "rank", "web", "page", "link", "text"]
    docs = {
        i: " ".join(vocab[(i * 7 + j) % len(vocab)] for j in range((i % 6) + 2))
        for i in range(30)
    }
    queries = {"q1": "spark rank", "q2": "web", "q3": "crawl crawl index"}
    got = _run(spark, docs, queries, k=5)
    assert got == _brute_bm25(docs, queries, k=5)


def test_rare_term_outranks_common(spark):
    docs = {
        1: "common common common",
        2: "common rare",
        3: "common common",
    }
    got = _run(spark, docs, {"q": "rare common"})
    # doc 2 has the rare term: must rank first
    assert got["q"][0][1] == 2


def test_length_normalization(spark):
    """Same tf, shorter doc wins under b > 0."""
    docs = {1: "hit pad pad pad pad pad pad pad", 2: "hit pad"}
    got = _run(spark, docs, {"q": "hit"})
    assert [d for _, d, _ in got["q"]] == [2, 1]
    # and with b = 0 the two tie -> doc_id ascending tiebreak
    got0 = _run(spark, docs, {"q": "hit"}, b_milli=0)
    assert [d for _, d, _ in got0["q"]] == [1, 2]
    assert got0["q"][0][2] == got0["q"][1][2]


def test_zero_match_docs_absent_and_unknown_term_ignored(spark):
    docs = {1: "alpha beta", 2: "gamma delta"}
    got = _run(spark, docs, {"q": "alpha zzznotfound"})
    assert [d for _, d, _ in got["q"]] == [1]


def test_k_truncation_and_tiebreak(spark):
    docs = {i: "same text here" for i in range(1, 8)}
    got = _run(spark, docs, {"q": "same"}, k=3)
    assert [d for _, d, _ in got["q"]] == [1, 2, 3]


def test_query_term_dedup(spark):
    """Repeated query terms must not double-count (dedup per query)."""
    docs = {1: "hit miss", 2: "miss miss"}
    once = _run(spark, docs, {"q": "hit"})
    twice = _run(spark, docs, {"q": "hit hit HIT"})
    assert once == twice


def test_corpus_never_shuffled_on_content(spark):
    """The only exchanges carry partial aggregates / scored minority rows —
    no text column crosses an exchange, and the query-term joins
    broadcast."""
    docs = {i: f"word{i % 4} filler text" for i in range(50)}
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], ["doc_id", "text"]
    )
    plan = (
        bm25_topk(df, {"q": "word1 filler"})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line
    assert "BroadcastExchange" in plan


def test_empty_query_raises(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_topk(df, {"q": "123 !!"})


# ---------------------------------------------------------------------------
# tf-idf top-k keywords (operators/search.py, closing r05)


def _brute_tfidf(docs, k):
    """Pure-Python mirror of the documented arithmetic (same parse tree,
    HALF_UP via floor(x+0.5) on values that can be negative only at exact
    0 — ln(N/df) >= 0 always since df <= N)."""
    import re

    tok_lists = {i: re.findall("[a-z]+", (t or "").lower()) for i, t in docs.items()}
    n_docs = len(docs)
    dfreq = {}
    for v in tok_lists.values():
        for t in set(v):
            dfreq[t] = dfreq.get(t, 0) + 1
    out = {}
    for i, v in tok_lists.items():
        if not v:
            continue
        dl = len(v)
        scores = []
        for t in set(v):
            tf = v.count(t)
            x = 1e6 * ((float(tf) / float(dl)) * math.log(float(n_docs) / float(dfreq[t])))
            scores.append((t, tf, int(math.floor(x + 0.5))))
        ranked = sorted(scores, key=lambda s: (-s[2], s[0]))[:k]
        out[i] = [(r + 1, t, tf, s) for r, (t, tf, s) in enumerate(ranked)]
    return out


def _run_tfidf(spark, docs, k=5, **kw):
    from crawley_spark.operators.search import tfidf_topk

    df = spark.createDataFrame([(i, t) for i, t in docs.items()], ["doc_id", "text"])
    got = {}
    for r in sorted(tfidf_topk(df, k=k, **kw).collect(), key=lambda r: (r["doc_id"], r["rank"])):
        got.setdefault(r["doc_id"], []).append((r["rank"], r["tok"], r["tf"], r["tfidf_micro"]))
    return got


def test_tfidf_brute_parity(spark):
    """40-doc deterministic corpus: Spark == Python mirror at several k,
    through both the broadcast and the sort-merge df-join paths."""
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    docs = {
        i: " ".join(vocab[(i * 5 + j * 3) % len(vocab)] for j in range((i % 7) + 1))
        for i in range(40)
    }
    docs[40] = ""  # zero-token doc: absent from output
    for k in (1, 3, 100):
        got = _run_tfidf(spark, docs, k=k)
        assert got == _brute_tfidf(docs, k)
        assert 40 not in got
    # forced sort-merge (vocab > gate) must agree with broadcast
    assert _run_tfidf(spark, docs, k=3, max_vocab_broadcast=1) == _brute_tfidf(docs, 3)


def test_tfidf_everywhere_term_scores_zero(spark):
    docs = {0: "common rare", 1: "common", 2: "common common"}
    got = _run_tfidf(spark, docs, k=5)
    d0 = {t: s for _, t, _, s in got[0]}
    assert d0["common"] == 0  # df == N => ln 1
    assert d0["rare"] > 0
    # rank order: rare first in doc 0; common ranks via tok-ASC among zeros
    assert got[0][0][1] == "rare"


def test_tfidf_plan_no_global_sort(spark):
    from crawley_spark.operators.search import tfidf_topk

    df = spark.createDataFrame(
        [(i, f"w{i % 5} w{(i * 3) % 7} common") for i in range(30)],
        ["doc_id", "text"],
    )
    out = tfidf_topk(df, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_inverted_index_layout_and_lookup(spark):
    from crawley_spark.operators.search import build_inverted_index, lookup_postings

    rows = [
        (10, "alpha beta alpha"),
        (3, "alpha gamma"),
        (7, "alpha beta"),
        (1, "delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = {(r["tok"], r["chunk"]): r for r in
           build_inverted_index(df, chunk_size=2).collect()}
    # alpha: df 3 over ids {3,7,10} → chunks [3,7] and [10], df on both rows
    assert idx[("alpha", 0)]["postings"] == [3, 7] and idx[("alpha", 0)]["df"] == 3
    assert idx[("alpha", 1)]["postings"] == [10] and idx[("alpha", 1)]["n_postings"] == 1
    # within-doc repetition does not duplicate postings
    assert idx[("beta", 0)]["postings"] == [7, 10]
    assert idx[("delta", 0)]["postings"] == [1]
    got = {r["tok"]: (r["df"], r["postings"]) for r in
           lookup_postings(build_inverted_index(df, chunk_size=2),
                           ["alpha", "delta", "absent"]).collect()}
    assert got == {"alpha": (3, [3, 7, 10]), "delta": (1, [1])}  # absent: no row


def test_inverted_index_brute_parity(spark):
    import random
    import re
    from collections import defaultdict

    from crawley_spark.operators.search import build_inverted_index

    rng = random.Random(9)
    words = ["w%d" % i for i in range(12)]
    rows = [(i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 15))))
            for i in range(30)]
    post = defaultdict(set)
    for i, t in rows:
        for tok in re.findall(r"[a-z]+", t.lower()):
            post[tok].add(i)
    K = 4
    exp = {}
    for tok, ids in post.items():
        ids = sorted(ids)
        for c in range(0, (len(ids) + K - 1) // K):
            exp[(tok, c)] = (len(ids), ids[c * K : (c + 1) * K])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["tok"], r["chunk"]): (r["df"], r["postings"]) for r in
           build_inverted_index(df, chunk_size=K).collect()}
    assert got == exp

    import pytest

    with pytest.raises(ValueError):
        build_inverted_index(df, chunk_size=0)
