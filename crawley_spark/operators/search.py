"""BM25 full-text ranking over the crawled corpus.

The crawl exists to be searched: BM25 (Robertson/Spärck Jones, the
Okapi TREC-3 form) is the ranking function every production index —
Lucene/Elasticsearch included — runs over exactly the (url, text) table
this engine produces. This module is the Spark-first batch shape: score a
set of keyword queries against the whole corpus in one pass and return
top-k per query.

Numerics follow the repo's integer-exact discipline where sums cross
partitions: the per-(doc, term) contribution is rounded once to an
integer micro-score and the per-doc total is an exact BIGINT sum, so
results are bit-identical under any partitioning and the DuckDB oracle
recomputes them hash-exactly. The float surface inside one contribution
(a fixed parse-tree of IEEE-double ops + one ``ln``) is deterministic per
engine and written identically on both sides — the same accepted libm
surface as operators/lmscore.py. ``k1``/``b`` are milli-integer knobs so
the expression contains no non-representable decimal literals.

    idf_micro(t) = round(1e6 * ln(1 + (N - df + 0.5) / (df + 0.5)))
    tfnorm(d,t)  = tf*(k1+1000) / (tf*1000 + k1*(1 - b/1000 + (b/1000)*(dl*N/L)))
    score(d)     = sum_t round(idf_micro(t) * tfnorm(d,t))      # BIGINT

with N = corpus doc count, L = total corpus token count (so dl*N/L is the
doc's length relative to the mean, computed from two exact integers), tf
the term count in the doc, dl the doc token count. The ``+ 1`` inside the
log keeps idf positive for df > N/2 terms (the Lucene fix), so HALF_UP
rounding agrees across engines (both round positive halves up).

Scale shape (100 TB corpus, handful of queries): one corpus tokenize scan
produces both per-doc lengths and, via a broadcast semi-join with the
query-term list, the (doc, term, tf) minority — the corpus is never
shuffled on content; the only exchanges carry (doc_id, long) partial
aggregates and the scored minority. df(t) is a map-side-combined count
over that minority. Top-k per query is a window over the scored minority
hash-partitioned by query_id (bounded: queries are few, candidates are
the docs containing at least one query term). Tokenization is the
``[a-z]+`` JVM regex shared with lmscore — the one construct Java and
RE2 read identically.

No reference counterpart (s0rg/crawley emits URL lists; it has no index
or ranking stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawley_spark.operators.lmscore import _tokens

DEFAULT_K1_MILLI = 1200  # Okapi k1 = 1.2
DEFAULT_B_MILLI = 750  # Okapi b = 0.75


def bm25_topk(
    df: DataFrame,
    queries: dict[str, str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1_milli: int = DEFAULT_K1_MILLI,
    b_milli: int = DEFAULT_B_MILLI,
) -> DataFrame:
    """Top-k BM25 results per query.

    ``queries`` maps query_id -> whitespace-joined keyword string; terms
    are lowercased ``[a-z]+`` tokens (the corpus tokenizer), deduplicated
    per query. Returns (query_id, rank, doc_id, score_micro) with rank
    1..k ordered by (score_micro DESC, doc_id ASC) — the deterministic
    tiebreak that keeps results reproducible across partitionings.

    Docs matching zero query terms never enter the candidate set (BM25
    gives them score 0; they are absent, not ranked).
    """
    spark = df.sparkSession
    term_rows = []
    for qid, qtext in queries.items():
        seen = set()
        for tok in qtext.lower().split():
            # mirror the corpus tokenizer: keep [a-z]+ runs only
            run = "".join(ch for ch in tok if "a" <= ch <= "z")
            if run and run not in seen:
                seen.add(run)
                term_rows.append((qid, run))
    if not term_rows:
        raise ValueError("no query terms after tokenization")
    qterms = spark.createDataFrame(term_rows, ["query_id", "tok"])

    toks = _tokens(df, text_col, id_col).filter(F.col("tok").isNotNull())
    # one scalar row: N docs (incl. zero-token docs) and L total tokens
    stats = df.agg(F.count(F.lit(1)).alias("n")).collect()[0]
    n_docs = int(stats["n"])
    l_total = int(toks.count())
    if n_docs == 0 or l_total == 0:
        raise ValueError("empty corpus")

    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    # candidate minority: corpus tokens matching any query term
    matched = toks.join(
        F.broadcast(qterms.select("tok").distinct()), "tok", "inner"
    )
    tf = matched.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.countDistinct(id_col).alias("df"))
    idf = dfreq.select(
        "tok",
        F.round(
            F.lit(1e6)
            * F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
        )
        .cast("long")
        .alias("idf_micro"),
    )

    k1 = float(k1_milli)
    b_frac = b_milli / 1000.0  # exact for the milli-knob grid
    scored_terms = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, id_col)
        .select(
            id_col,
            "tok",
            F.round(
                F.col("idf_micro")
                * (
                    (F.col("tf") * F.lit(k1 + 1000.0))
                    / (
                        F.col("tf") * F.lit(1000.0)
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b_frac)
                            + F.lit(b_frac)
                            * (
                                F.col("dl")
                                * F.lit(float(n_docs))
                                / F.lit(float(l_total))
                            )
                        )
                    )
                )
            )
            .cast("long")
            .alias("term_score_micro"),
        )
    )
    doc_scores = (
        scored_terms.join(F.broadcast(qterms), "tok")
        .groupBy("query_id", id_col)
        .agg(F.sum("term_score_micro").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        doc_scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col(id_col),
            "score_micro",
        )
    )
