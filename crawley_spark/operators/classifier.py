"""Naive-Bayes quality/language classifier distillation — the
train-a-model-to-mimic-a-filter stage of modern web pipelines (public
knowledge: CCNet trains a fastText classifier against Wikipedia;
FineWeb-Edu distills an annotator into a small classifier and filters the
corpus with it). The teacher is any boolean label column; the student is a
multinomial naive-Bayes log-likelihood-ratio scorer over the shared
``[a-z]+`` token stream:

    margin_micro(d) = Σ_t (s_neg(t) − s_pos(t)) + prior_micro
    pred_keep(d)    = margin_micro > 0

with s_± the module-standard Laplace unigram surprisals in integer
micro-nats (:func:`crawley_spark.operators.lmscore.unigram_model` — the
same tables lm_perplexity and dsir_weights already oracle) and
``prior_micro = floor(1e6·ln(n_pos/n_neg) + 0.5)``. The per-token
difference IS ln(p_pos/p_neg), so the margin is the exact NB decision
value in summed integer micro-nats.

Why closed-form NB and not an iterative learner: training is ONE counting
pass per class — deterministic, order-independent, bit-identical under any
partitioning, and the DuckDB oracle replays it exactly (two generated
model CTEs + a diff join, the dsir_weights shape). An SGD/perceptron
learner is either float (last-ulp engine divergence — unverifiable) or
integer-batch (which limit-cycles on realistic class structure — measured
during this round and discarded); NB is also the classic text-classifier
baseline the fastText pipeline generalizes.

Scale shape: ONE tokenize scan trains BOTH class models (per-(tok, class)
counts combine map-side — the two-pass per-class formulation cost a full
extra corpus scan plus four more count actions, measured 3× slower at
sf0.1), one class-size aggregate, then scoring = a second tokenize scan +
diff join + one (id, long, long) per-doc aggregate; the per-type diff
table broadcasts under ``max_vocab_broadcast`` (token-keyed sort-merge
above it, the lmscore gate). Driver holds only the model scalars and the
prior (the pagerank discipline). ``min_count`` prunes each class's
vocabulary independently; a type below it scores as that class's unseen
class, so every document scores.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lmscore import LM_TOKEN_RE, _tokens


def naive_bayes_distill(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
    max_vocab_broadcast: int = 2_000_000,
) -> DataFrame:
    """One row per doc: (id, y, n_tokens, margin_micro, pred_keep,
    correct). ``y`` ∈ {+1, −1} from the boolean teacher ``label_col``;
    zero-token docs score prior-only (the proper NB value for an empty
    document). Both classes must be non-empty (a one-class corpus has no
    ratio to learn — raises)."""
    # ONE corpus pass trains BOTH class models: tokenize once, count per
    # (tok, class) with map-side combine — at 100 TB this is the difference
    # between two full scans and one (the r05 bench caught the naive
    # two-unigram_model version re-scanning the corpus 6×: 25.8 s → ~8 s
    # at sf0.1). Class sizes ride the same labeled projection.
    lab = F.col(label_col)
    sizes = df.agg(
        F.sum(F.when(lab, 1).otherwise(0)).alias("np"),
        F.sum(F.when(~lab, 1).otherwise(0)).alias("nn"),
    ).collect()[0]
    n_pos, n_neg = int(sizes["np"] or 0), int(sizes["nn"] or 0)
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"naive_bayes_distill needs both classes non-empty (pos={n_pos}, neg={n_neg})"
        )
    toks_l = df.select(
        F.col(id_col),
        lab.alias("_y"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{LM_TOKEN_RE}', 0)")
        ).alias("tok"),
    )
    cnts = toks_l.groupBy("tok").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("cp"),
        F.sum(F.when(~F.col("_y"), 1).otherwise(0)).alias("cn"),
    )
    cnts = cnts.localCheckpoint(eager=False)  # totals agg + diff both read it
    tot = cnts.agg(
        F.sum("cp").alias("tp"),
        F.sum(F.when(F.col("cp") >= min_count, 1).otherwise(0)).alias("vp"),
        F.sum("cn").alias("tn"),
        F.sum(F.when(F.col("cn") >= min_count, 1).otherwise(0)).alias("vn"),
        F.count(F.lit(1)).alias("vocab"),
    ).collect()[0]
    nv_p = float(int(tot["tp"] or 0) + int(tot["vp"] or 0) + 1)
    nv_n = float(int(tot["tn"] or 0) + int(tot["vn"] or 0) + 1)
    s_unk_p = int(math.floor(1e6 * math.log(nv_p) + 0.5))
    s_unk_n = int(math.floor(1e6 * math.log(nv_n) + 0.5))
    # floor(x+0.5): the engines' HALF_UP for the lmscore driver constants;
    # the oracle writes the same floor form so a negative prior cannot hit
    # the round-half-away-from-zero tie divergence
    prior_micro = int(math.floor(1e6 * math.log(n_pos / n_neg) + 0.5))
    # per-type LLR in micro-nats: s = -ln p, so s_neg - s_pos = ln(p_pos/p_neg)
    # (the unigram_model surprisal expression, inlined per class with the
    # same rounding parse tree; a class count below min_count means that
    # class treats the type as unseen)
    sp = F.when(
        F.col("cp") >= min_count,
        F.round(F.lit(1e6) * F.log(F.lit(nv_p) / (F.col("cp") + F.lit(1.0)))).cast("long"),
    ).otherwise(F.lit(s_unk_p))
    sn = F.when(
        F.col("cn") >= min_count,
        F.round(F.lit(1e6) * F.log(F.lit(nv_n) / (F.col("cn") + F.lit(1.0)))).cast("long"),
    ).otherwise(F.lit(s_unk_n))
    diff = cnts.select("tok", (sn - sp).cast("long").alias("_llr"))
    if int(tot["vocab"] or 0) <= max_vocab_broadcast:
        diff = F.broadcast(diff)
    toks = _tokens(df, text_col, id_col)
    # a type pruned from BOTH models (min_count > 1) is absent from the
    # diff table: its LLR is the difference of the two unseen surprisals,
    # not zero. _tokens uses explode_outer (zero-token docs keep one
    # NULL-token row), so the fallback must gate on a REAL token — an empty
    # doc's sum is 0 and its margin prior-only
    unk_llr = F.lit(int(s_unk_n - s_unk_p)).cast("long")
    scored = (
        toks.join(diff, "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("tok")).cast("long").alias("n_tokens"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("tok").isNotNull(),
                        F.coalesce(F.col("_llr"), unk_llr),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("_sum_llr"),
        )
    )
    labels = df.select(
        F.col(id_col),
        F.when(F.col(label_col), 1).otherwise(-1).cast("int").alias("y"),
    )
    out = labels.join(scored, id_col, "left").select(
        id_col,
        "y",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        (F.coalesce(F.col("_sum_llr"), F.lit(0)) + F.lit(prior_micro))
        .cast("long")
        .alias("margin_micro"),
    )
    return out.withColumn("pred_keep", F.col("margin_micro") > 0).withColumn(
        "correct", F.col("pred_keep") == (F.col("y") > 0)
    )
