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


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    max_vocab_broadcast: int = 2_000_000,
) -> DataFrame:
    """Per-document top-k tf-idf keywords — the corpus-analytics staple
    (salient-term extraction for tagging, clustering labels, search
    snippets) over the crawled (id, text) table.

    Classic normalized form, rounded ONCE per (doc, term) to an integer
    micro-score so ranking is bit-identical under any partitioning and a
    DuckDB oracle recomputes it hash-exactly (the bm25_topk float
    discipline — one fixed parse tree of IEEE-double ops + one ``ln``,
    written identically on both sides):

        tfidf_micro(d,t) = round(1e6 * ((tf/dl) * ln(N/df)))

    with tf the term count in the doc, dl the doc's token count, N the
    corpus doc count, df the term's document frequency. Terms appearing in
    every document score exactly 0 (ln 1) and still rank deterministically
    via the (score DESC, tok ASC) tiebreak.

    Returns (id, rank, tok, tf, tfidf_micro), rank 1..k per document.

    Scale shape: one tokenize scan; (doc, term, tf) and df(t) are both
    map-side-combined aggregates; dl derives from tf (no second scan); the
    df table broadcasts while the vocabulary is at most
    ``max_vocab_broadcast`` rows (the lmscore gate — above it Spark plans a
    token-keyed sort-merge join); top-k is a window partitioned by doc
    over each doc's own distinct-term rows — bounded, never a global sort.
    """
    toks = _tokens(df, text_col, id_col).filter(F.col("tok").isNotNull())
    n_docs = int(df.count())
    if n_docs == 0:
        raise ValueError("empty corpus")
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    v = int(dfreq.count())
    if max_vocab_broadcast and v <= max_vocab_broadcast:
        dfreq = F.broadcast(dfreq)
    scored = (
        tf.join(dfreq, "tok")
        .join(dl, id_col)
        .select(
            id_col,
            "tok",
            F.col("tf").cast("long").alias("tf"),
            F.round(
                F.lit(1e6)
                * (
                    (F.col("tf").cast("double") / F.col("dl").cast("double"))
                    * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
                )
            )
            .cast("long")
            .alias("tfidf_micro"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_micro").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("long").alias("rank"),
            "tok",
            "tf",
            "tfidf_micro",
        )
    )


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


DEFAULT_POSTINGS_CHUNK = 4096


def build_inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = DEFAULT_POSTINGS_CHUNK,
) -> DataFrame:
    """Sharded inverted index — the physical artifact a search deployment
    builds from the crawled corpus (public structure: Lucene/ES segment
    posting lists; chunked "skip-block" layout). One row per (term,
    chunk): ``(tok, chunk, df, n_postings, postings)`` with postings =
    ascending doc ids, ``chunk`` assigned by that order so chunk 0 holds
    the df smallest ids, and ``df`` the term's total document frequency
    repeated on every chunk row (the lookup never needs a second table).

    The chunking is the scale point: a stopword's posting list at corpus
    scale is "every document" — collecting it into ONE array row is
    unbounded executor state. Chunk assignment is a per-term window
    (hash-partitioned by tok — bounded by the term's own df, never a
    global sort) and each collected array is ≤ ``chunk_size`` ids.
    Exchanges carry (tok, doc_id) scalars (one distinct + the window +
    one bounded collect per chunk). Tokens are the shared [a-z]+ regex.
    """
    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")
    toks = _tokens(df, text_col, id_col).filter(F.col("tok").isNotNull())
    occ = toks.select(F.col(id_col).cast("long").alias("did"), "tok").distinct()
    w = Window.partitionBy("tok").orderBy("did")
    ranked = occ.withColumn("rn", F.row_number().over(w)).withColumn(
        "chunk", ((F.col("rn") - 1) / chunk_size).cast("long")
    )
    return (
        ranked.groupBy("tok", "chunk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_postings"),
            F.sort_array(F.collect_list("did")).alias("postings"),
        )
        .join(
            occ.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df")),
            "tok",
        )
        .select("tok", "chunk", "df", "n_postings", "postings")
    )


def lookup_postings(index: DataFrame, terms: list) -> DataFrame:
    """(tok, df, postings) for the probe terms — chunks re-merged in chunk
    order. The probe list is a broadcast literal filter (isin), so the
    index is scanned once with the predicate pushed down; absent terms
    yield no row (the caller's semantics for a zero-df term)."""
    merged = (
        index.filter(F.col("tok").isin([str(t) for t in terms]))
        .groupBy("tok", "df")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("chunk").alias("c"), F.col("postings").alias("p")))
                    ),
                    lambda s: s["p"],
                )
            ).alias("postings")
        )
    )
    return merged.select("tok", "df", "postings")
