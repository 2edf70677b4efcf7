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

Scale shape: two map-side-combined type-count shuffles (one per class —
each reads only its class's docs), the per-type diff table broadcast under
``max_vocab_broadcast`` (token-keyed sort-merge above it, the lmscore
gate), scoring = one tokenize scan + diff join + one (id, long, long)
per-doc aggregate. Driver holds only the four model scalars and the prior
(the pagerank discipline). ``min_count`` prunes both vocabularies for
scale; pruned/unseen types take the class's unseen surprisal, so every
document scores.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lmscore import _tokens, unigram_model


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
    pos = df.filter(F.col(label_col))
    neg = df.filter(~F.col(label_col))
    n_pos = pos.count()
    n_neg = neg.count()
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"naive_bayes_distill needs both classes non-empty (pos={n_pos}, neg={n_neg})"
        )
    model_p, s_unk_p, _ = unigram_model(pos, text_col, id_col, min_count)
    model_n, s_unk_n, _ = unigram_model(neg, text_col, id_col, min_count)
    # floor(x+0.5): the engines' HALF_UP for the lmscore driver constants;
    # the oracle writes the same floor form so a negative prior cannot hit
    # the round-half-away-from-zero tie divergence
    prior_micro = int(math.floor(1e6 * math.log(n_pos / n_neg) + 0.5))
    # per-type LLR in micro-nats: s = -ln p, so s_neg - s_pos = ln(p_pos/p_neg)
    diff = (
        model_p.select("tok", F.col("s").alias("_sp"))
        .join(model_n.select("tok", F.col("s").alias("_sn")), "tok", "full_outer")
        .select(
            "tok",
            (
                F.coalesce(F.col("_sn"), F.lit(s_unk_n))
                - F.coalesce(F.col("_sp"), F.lit(s_unk_p))
            )
            .cast("long")
            .alias("_llr"),
        )
    )
    vocab = diff.count()
    if vocab <= max_vocab_broadcast:
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
