"""Unigram language-model perplexity scoring (CCNet-style quality signal).

Real webtext pipelines (CCNet, RefinedWeb, Dolma) score every document with
a language model trained on a trusted corpus and keep the low-perplexity
head — the single most-used model-based quality filter after the heuristic
(Gopher/C4) rules.  This module is the Spark-first shape of that stage with
a deterministic, oracle-checkable model: a Laplace-smoothed unigram LM
trained on the corpus itself (or a caller-supplied ``train_df``).

Numerics are the repo's integer-exact discipline: every token type gets an
integer micro-nat surprisal ``s = round(1e6 * ln((N+V+1)/(c+1)))`` computed
once in the model table, and a document's score is the exact BIGINT sum of
its tokens' surprisals — order-independent, so Spark's arbitrary partition
sum order cannot perturb a hash-compared result the way a float sum would.
The derived ``ppl_milli`` (milli-perplexity, BIGINT) is a deterministic
function of two exact integers.

Scale shape (100 TB): tokenize with one JVM ``regexp_extract_all`` +
``explode_outer`` (no Python), count types with one map-side-combined
shuffle, broadcast the model (vocab is bounded by ``min_count`` /
``max_vocab_broadcast`` — above it Spark falls back to a sort-merge join on
token), and aggregate per-doc partials before the only per-doc shuffle
((id, long, long) rows, one per doc per task).  The N/V scalars are one
bounded single-row ``collect``.

No reference counterpart (s0rg/crawley has no text-quality stage); the
operator follows the published CCNet recipe re-expressed with a
closed-form unigram model so a SQL oracle can recompute it exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Lowercased ASCII letter runs: the one tokenizer construct Java regex and
# RE2/DuckDB interpret identically (same reasoning as textstats.BPE_TOKEN_RE).
LM_TOKEN_RE = "[a-z]+"


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok) rows; docs with zero tokens keep one row with tok = NULL
    (explode_outer) so the per-doc aggregate never loses a document."""
    return df.select(
        F.col(id_col),
        F.explode_outer(
            F.expr(f"regexp_extract_all(lower({text_col}), '{LM_TOKEN_RE}', 0)")
        ).alias("tok"),
    )


def unigram_model(
    train_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> tuple[DataFrame, int, int]:
    """Train the smoothed unigram surprisal table.

    Returns ``(model, s_unk, v_kept)``: model = (tok, s) with
    ``s = round(1e6 * ln((N+V+1)/(c+1)))`` micro-nats, where N = total
    training tokens (all types), V = kept types (count >= min_count), and
    ``s_unk = round(1e6 * ln(N+V+1))`` is the unseen-token surprisal
    (c = 0 in the same formula).  ``min_count`` prunes the vocab for scale
    (pruned types score as unseen); the probabilities are Laplace
    p(t) = (c_t + 1)/(N + V + 1), a proper distribution over V types + one
    unseen class.
    """
    toks = _tokens(train_df, text_col, id_col).filter(F.col("tok").isNotNull())
    cnts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = cnts.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("c") >= min_count, 1).otherwise(0)).alias("v"),
    ).collect()[0]
    n_total = int(tot["n"] or 0)
    v_kept = int(tot["v"] or 0)
    nv = float(n_total + v_kept + 1)
    kept = cnts.filter(F.col("c") >= min_count) if min_count > 1 else cnts
    model = kept.select(
        "tok",
        F.round(F.lit(1e6) * F.log(F.lit(nv) / (F.col("c") + F.lit(1.0))))
        .cast("long")
        .alias("s"),
    )
    # driver-side constant: floor(x+0.5) = the engines' positive HALF_UP,
    # not Python round()'s half-even
    s_unk = int(math.floor(1e6 * math.log(nv) + 0.5))
    return model, s_unk, v_kept


def dsir_weights(
    df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
    max_vocab_broadcast: int = 2_000_000,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public knowledge): score
    every raw document by how target-like it is under two generative
    models, ``log w(d) = log p_target(d) - log p_raw(d)``, here with the
    module's oracle-checkable Laplace unigram LMs:

        logw_micro(d) = sum_tokens (s_raw(t) - s_target(t))     # BIGINT

    since s = -ln p in integer micro-nats, the per-token difference IS the
    log-probability ratio; positive totals mean "more target-like than
    corpus-like" (resample/keep head), negative the opposite. Tokens unseen
    by either model take that model's unseen-class surprisal, so the weight
    is defined for every document. The exact-integer per-type differences
    make the per-doc sum order-independent — bit-identical under any
    partitioning, DuckDB-recomputable hash-exactly.

    Returns (id, n_tokens, logw_micro); zero-token docs score 0 (the ratio
    of two empty products — neutral, neither kept nor dropped first).

    Scale shape: both model trainings are one map-side-combined type-count
    shuffle each (the target side is the SMALL trusted set); the two
    surprisal tables merge full-outer on token into one diff table whose
    size is the union vocabulary — broadcast under ``max_vocab_broadcast``
    (above it a token-keyed sort-merge join); scoring is the lm_perplexity
    shape: tokenize scan, diff-table join, one (id, long, long) per-doc
    aggregate exchange.
    """
    model_t, s_unk_t, v_t = unigram_model(target_df, text_col, id_col, min_count)
    model_r, s_unk_r, v_r = unigram_model(df, text_col, id_col, min_count)
    # per-type micro-nat log ratio: d(t) = s_raw(t) - s_target(t), with the
    # respective unseen-class surprisal standing in for an absent type
    diff = (
        model_t.select("tok", F.col("s").alias("_st"))
        .join(model_r.select("tok", F.col("s").alias("_sr")), "tok", "full_outer")
        .select(
            "tok",
            (
                F.coalesce(F.col("_sr"), F.lit(s_unk_r))
                - F.coalesce(F.col("_st"), F.lit(s_unk_t))
            )
            .cast("long")
            .alias("_d"),
        )
    )
    if max_vocab_broadcast and (v_t + v_r) <= max_vocab_broadcast:
        diff = F.broadcast(diff)
    toks = _tokens(df, text_col, id_col)
    joined = toks.join(diff, "tok", "left")
    unk_diff = s_unk_r - s_unk_t  # token in neither vocab (min_count-pruned)
    return joined.groupBy(id_col).agg(
        F.count("tok").cast("long").alias("n_tokens"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("tok").isNotNull(),
                    F.coalesce(F.col("_d"), F.lit(unk_diff)),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("logw_micro"),
    )


def lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
    min_count: int = 1,
    max_vocab_broadcast: int = 2_000_000,
) -> DataFrame:
    """Per-document LM score: (id, n_tokens, nats_micro, ppl_milli).

    ``nats_micro`` is the exact BIGINT sum of per-token micro-nat
    surprisals; ``ppl_milli = round(1000 * exp((nats_micro/1e6)/n_tokens))``
    (NULL for zero-token docs).  Lower is better; filter with e.g.
    ``.filter("ppl_milli <= threshold")`` for the CCNet head/middle split.

    Trains on ``train_df`` (default: ``df`` itself — self-scoring, the
    oracle-checked configuration).  The model join broadcasts while the
    vocab is at most ``max_vocab_broadcast`` rows; past that Spark plans a
    token-keyed sort-merge join (vocab no longer fits an executor).
    """
    model, s_unk, v_kept = unigram_model(
        train_df if train_df is not None else df, text_col, id_col, min_count
    )
    # the V scalar is already known from unigram_model's single-row agg —
    # no extra job for the broadcast decision
    if max_vocab_broadcast and v_kept <= max_vocab_broadcast:
        model = F.broadcast(model)
    toks = _tokens(df, text_col, id_col)
    joined = toks.join(model, "tok", "left")
    scored = joined.groupBy(id_col).agg(
        F.count("tok").alias("n_tokens"),  # count() skips the NULL outer row
        F.coalesce(
            F.sum(
                F.when(
                    F.col("tok").isNotNull(), F.coalesce(F.col("s"), F.lit(s_unk))
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("nats_micro"),
    )
    return scored.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("nats_micro"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.lit(1000.0)
                * F.exp((F.col("nats_micro") / F.lit(1e6)) / F.col("n_tokens"))
            ).cast("long"),
        ).alias("ppl_milli"),
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    min_count: int = 1,
    max_vocab_broadcast: int = 2_000_000,
    cutoff_sample_permille: int | None = None,
    cutoff_salt: str = "pplcut",
) -> DataFrame:
    """CCNet-style head/middle/tail perplexity bucketing (Wenzek et al.
    2020, public knowledge): train a per-language LM, score every document,
    split each language's documents into three equal-mass buckets by
    perplexity, keep the low-perplexity head (or sample buckets at
    different rates downstream).  This is the published step that turns
    ``lm_perplexity``'s raw scores into a usable corpus partition.

    Model: the module's Laplace unigram LM, trained PER LANGUAGE (CCNet
    trains one KenLM per language; here the partition key is
    ``lang_col``): for each (lang, tok), ``s = round(1e6 *
    ln((N_lang + V_lang + 1)/(c + 1)))`` micro-nats; per-doc score and
    ``ppl_milli`` exactly as :func:`lm_perplexity`.

    Buckets: per language, ``cutoff_k`` (k = 1, 2) is the smallest
    ppl_milli value whose cumulative doc count reaches k/3 of the
    language's scored docs — integer-cross-multiplied (``3*cum >= k*n``),
    never a float quantile.  bucket = 'head' when ppl <= cutoff_1,
    'middle' when <= cutoff_2, else 'tail'; ties share a value so they
    share a bucket (deterministic — unlike NTILE's arbitrary tie split),
    and zero-token docs (ppl NULL) land in 'tail' (CCNet drops them from
    the LM head; keeping them tail-bucketed preserves every input row).

    Scale shape (100 TB): per-(lang, tok) counts are one map-side-combined
    shuffle; per-lang (N, V, s_unk) is a bounded collect (one row per
    language); the model joins broadcast under ``max_vocab_broadcast``;
    scoring aggregates per-doc partials map-side so the only per-doc
    exchange carries (id, lang, long, long).  Cutoffs come from a
    cumulative window over the DISTINCT (lang, ppl_milli) aggregate — not
    the docs — but distinct ppl values can approach doc count at corpus
    scale, so ``cutoff_sample_permille`` computes the cutoffs from a
    deterministic md5-bucket document sample instead (CCNet's actual
    published practice: quantiles from a sample, thresholds applied to the
    full corpus).  The oracle-checked configuration is the exact full-data
    path (sample=None).  The bucket-assignment join broadcasts a
    one-row-per-language cutoff table.

    Returns (id_col, lang_col, n_tokens, ppl_milli, bucket).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.col(lang_col),
        F.explode_outer(
            F.expr(f"regexp_extract_all(lower({text_col}), '{LM_TOKEN_RE}', 0)")
        ).alias("tok"),
    )
    cnts = (
        toks.filter(F.col("tok").isNotNull())
        .groupBy(lang_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # one row per language: N (total tokens), V (kept types), unseen-class
    # surprisal — bounded by the language inventory, a driver-safe collect
    lang_rows = (
        cnts.groupBy(lang_col)
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.when(F.col("c") >= min_count, 1).otherwise(0)).alias("v"),
        )
        .collect()
    )
    lang_stats = {
        r[lang_col]: (int(r["n"]), int(r["v"])) for r in lang_rows
    }
    spark = df.sparkSession
    sunk_df = F.broadcast(
        spark.createDataFrame(
            [
                (lg, float(n + v + 1), int(math.floor(1e6 * math.log(n + v + 1) + 0.5)))
                for lg, (n, v) in sorted(lang_stats.items())
            ]
            or [("", 1.0, 0)],
            f"{lang_col} string, _nv double, _s_unk long",
        )
    )
    kept = cnts.filter(F.col("c") >= min_count) if min_count > 1 else cnts
    model = kept.join(sunk_df.select(lang_col, "_nv"), lang_col).select(
        lang_col,
        "tok",
        F.round(F.lit(1e6) * F.log(F.col("_nv") / (F.col("c") + F.lit(1.0))))
        .cast("long")
        .alias("_s"),
    )
    if max_vocab_broadcast and sum(v for _, v in lang_stats.values()) <= max_vocab_broadcast:
        model = F.broadcast(model)
    joined = toks.join(model, [lang_col, "tok"], "left").join(
        sunk_df.select(lang_col, "_s_unk"), lang_col, "left"
    )
    scored = (
        joined.groupBy(id_col, lang_col)
        .agg(
            F.count("tok").cast("long").alias("n_tokens"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("tok").isNotNull(),
                        F.coalesce(F.col("_s"), F.col("_s_unk"), F.lit(0)),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("_nats"),
        )
        .select(
            id_col,
            lang_col,
            "n_tokens",
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.lit(1000.0)
                    * F.exp((F.col("_nats") / F.lit(1e6)) / F.col("n_tokens"))
                ).cast("long"),
            ).alias("ppl_milli"),
        )
    )
    cut_src = scored.filter(F.col("ppl_milli").isNotNull())
    if cutoff_sample_permille is not None:
        # deterministic md5-bucket sample (the stratified_sample construct,
        # dedup.md5_low60): same salt + id -> same sample every run, so the
        # cutoffs are stable and DuckDB can reproduce the selection
        from .dedup import md5_low60

        bucket_expr = (
            md5_low60(F.concat(F.lit(cutoff_salt), F.col(id_col).cast("string")))
            % 1000
        )
        cut_src = cut_src.filter(bucket_expr < F.lit(int(cutoff_sample_permille)))
    vals = cut_src.groupBy(lang_col, "ppl_milli").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w = Window.partitionBy(lang_col).orderBy("ppl_milli")
    cum = vals.withColumn("_cum", F.sum("_cnt").over(w))
    tots = cum.groupBy(lang_col).agg(F.max("_cum").alias("_n"))
    cuts = (
        cum.join(F.broadcast(tots), lang_col)
        .groupBy(lang_col)
        .agg(
            F.min(
                F.when(F.col("_cum") * 3 >= F.col("_n"), F.col("ppl_milli"))
            ).alias("_cut1"),
            F.min(
                F.when(F.col("_cum") * 3 >= F.col("_n") * 2, F.col("ppl_milli"))
            ).alias("_cut2"),
        )
    )
    return (
        scored.join(F.broadcast(cuts), lang_col, "left")
        .select(
            id_col,
            lang_col,
            "n_tokens",
            "ppl_milli",
            F.when(F.col("ppl_milli").isNull(), F.lit("tail"))
            .when(F.col("ppl_milli") <= F.col("_cut1"), F.lit("head"))
            .when(F.col("ppl_milli") <= F.col("_cut2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


# Jelinek-Mercer interpolation weight for the bigram term, an exact rational
# so both engines compute ln() of identical doubles: lambda = 3/4.
JM_LAMBDA_NUM = 3
JM_LAMBDA_DEN = 4


def bigram_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
    max_model_broadcast: int = 2_000_000,
) -> DataFrame:
    """Interpolated bigram LM perplexity (Jelinek-Mercer smoothing, Chen &
    Goodman 1999 — public knowledge): one modelling step closer to CCNet's
    KenLM than :func:`lm_perplexity`, with the same integer micro-nat /
    hash-exact-oracle discipline.

    Model, with lam = 3/4 and the module's Laplace unigram
    p_uni(w) = (c_w + 1)/(N + V + 1):

    * observed bigram (w1, w2):
      ``p = lam * c(w1,w2)/c(w1) + (1-lam) * p_uni(w2)``
    * unobserved bigram, SEEN history w1: the first term is zero, so
      ``p = (1-lam) * p_uni(w2)`` — a function of w2 alone, carried as a
      second column of the unigram table (no per-history fallback rows);
    * history w1 with no training continuations (unseen in train, or only
      ever document-final there — c(w1,.) = 0 either way, so the bigram
      MLE is undefined): back off to the proper unigram, ``p = p_uni(w2)``;
    * the first token of a document is scored by the unigram (doc-initial
      context; no synthetic BOS token).

    For every seen history this sums to exactly 1 over V types + the
    unseen class (lam + (1-lam)), so the model is a proper distribution.
    Each surprisal is a SINGLE ``round(1e6 * -ln(p))`` from IEEE doubles
    both engines build identically — never a sum of two rounded halves —
    so per-doc BIGINT sums are order-independent and DuckDB-recomputable.

    Scale shape (100 TB): tokens come from one JVM ``regexp_extract_all``;
    bigram pairs are built IN THE ARRAY DOMAIN (one ``transform`` over the
    token array) and exploded once — no positional self-join, no window;
    bigram counts are one map-side-combined shuffle; both model tables
    broadcast under ``max_model_broadcast`` total rows (past that Spark
    plans sort-merge joins on the token keys); the only per-doc exchange
    carries (id, long, long) partial aggregates.

    Returns (id_col, n_tokens, nats_micro, ppl_milli) — same contract as
    :func:`lm_perplexity` (ppl NULL for zero-token docs).
    """
    lam = JM_LAMBDA_NUM / JM_LAMBDA_DEN
    one_m_lam = 1.0 - lam
    tdf = train_df if train_df is not None else df

    def _arr(frame):
        return frame.select(
            F.col(id_col),
            F.expr(
                f"regexp_extract_all(lower({text_col}), '{LM_TOKEN_RE}', 0)"
            ).alias("_a"),
        )

    # --- unigram side (counts, N, V, per-type surprisal + fallback col) ---
    utoks = _arr(tdf).select(F.explode("_a").alias("tok"))
    ucnts = utoks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = ucnts.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")).collect()[0]
    n_total = int(tot["n"] or 0)
    v_kept = int(tot["v"] or 0)
    nv = float(n_total + v_kept + 1)
    # s_uni = -ln(p_uni), s_fb = -ln((1-lam) * p_uni): each its own single round
    uni = ucnts.select(
        F.col("tok").alias("w2"),
        (F.col("c") + F.lit(1.0)).alias("_c1f"),
        F.round(F.lit(1e6) * F.log(F.lit(nv) / (F.col("c") + F.lit(1.0))))
        .cast("long")
        .alias("_s_uni"),
        F.round(
            F.lit(1e6) * F.log(F.lit(nv) / (F.lit(one_m_lam) * (F.col("c") + F.lit(1.0))))
        )
        .cast("long")
        .alias("_s_fb"),
    )
    s_unk = int(math.floor(1e6 * math.log(nv) + 0.5))
    s_unk_fb = int(math.floor(1e6 * math.log(nv / one_m_lam) + 0.5))

    # --- bigram side: counts of (w1, w2) and history totals c(w1) ---
    pairs_t = (
        _arr(tdf)
        .filter(F.size("_a") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(2, size(_a)), i ->"
                    " struct(element_at(_a, i - 1) AS w1, element_at(_a, i) AS w2))"
                )
            ).alias("_p")
        )
        .select("_p.w1", "_p.w2")
    )
    bcnts = pairs_t.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    hcnts = bcnts.groupBy("w1").agg(F.sum("c2").alias("c1"))
    # s_bi = -ln(lam * c2/c1 + (1-lam) * p_uni(w2)); p_uni(w2) = _c1f / nv
    bi = (
        bcnts.join(hcnts, "w1")
        .join(uni.select("w2", "_c1f"), "w2")
        .select(
            "w1",
            "w2",
            F.round(
                F.lit(-1e6)
                * F.log(
                    F.lit(lam) * (F.col("c2") / F.col("c1"))
                    + F.lit(one_m_lam) * (F.col("_c1f") / F.lit(nv))
                )
            )
            .cast("long")
            .alias("_s_bi"),
        )
    )
    uni_score = uni.select("w2", "_s_uni", "_s_fb")
    # seen-history membership for the unseen-w1 backoff branch
    hist = hcnts.select(F.col("w1"), F.lit(True).alias("_h"))
    if max_model_broadcast and (v_kept * 2) <= max_model_broadcast:
        uni_score = F.broadcast(uni_score)
        hist = F.broadcast(hist)
    # unique bigrams <= total training tokens (n_total), a scalar we already
    # hold — a conservative gate that costs no extra job or recompute
    if max_model_broadcast and n_total <= max_model_broadcast:
        bi = F.broadcast(bi)

    # --- scoring stream: first token as (w1 NULL), then each adjacent pair ---
    arr = _arr(df)
    first = arr.select(
        F.col(id_col),
        F.lit(None).cast("string").alias("w1"),
        F.try_element_at("_a", F.lit(1)).alias("w2"),  # NULL for empty arrays
    )
    pairs = arr.filter(F.size("_a") >= 2).select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(2, size(_a)), i ->"
                " struct(element_at(_a, i - 1) AS w1, element_at(_a, i) AS w2))"
            )
        ).alias("_p"),
    ).select(id_col, "_p.w1", "_p.w2")
    stream = first.unionByName(pairs)
    scored = (
        stream.join(bi, ["w1", "w2"], "left")
        .join(uni_score, "w2", "left")
        .join(hist, "w1", "left")
        .select(
            id_col,
            "w2",
            F.when(F.col("w2").isNull(), F.lit(None).cast("long"))
            .when(  # doc-initial token: unigram
                F.col("w1").isNull(), F.coalesce("_s_uni", F.lit(s_unk))
            )
            .when(F.col("_s_bi").isNotNull(), F.col("_s_bi"))
            .when(  # seen history, unobserved bigram: (1-lam) * p_uni(w2)
                F.col("_h"), F.coalesce("_s_fb", F.lit(s_unk_fb))
            )
            .otherwise(F.coalesce("_s_uni", F.lit(s_unk)))  # unseen history
            .alias("_s"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("w2").cast("long").alias("n_tokens"),
        F.coalesce(F.sum("_s"), F.lit(0)).cast("long").alias("nats_micro"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "nats_micro",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.lit(1000.0)
                * F.exp((F.col("nats_micro") / F.lit(1e6)) / F.col("n_tokens"))
            ).cast("long"),
        ).alias("ppl_milli"),
    )
