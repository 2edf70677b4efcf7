"""Text-analysis operators for training-data pipelines over the
``documents`` table: token counting, quality scoring, language-ID heuristic,
document fingerprinting.

All hot-path logic is pure ``pyspark.sql.functions`` column expressions —
JVM-side, whole-stage-codegen-friendly, no Python in the loop. Each operator
has a DuckDB-oracle-checkable equivalent in __spark_entry__.oracle_sql
(integer/string outputs only — no float hashing hazards).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count(text: Column) -> Column:
    """Whitespace-token count (space-split, empty tokens dropped)."""
    return F.size(F.filter(F.split(text, " "), lambda x: x != F.lit(""))).cast("long")


# BPE-style pre-tokenizer classes: letter runs, single digits, single
# punctuation marks — the GPT-2-ish split shape, kept to constructs that
# Java regex and RE2 (DuckDB) interpret identically so the count is
# SQL-oracle-checkable.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: letter runs count once, digits and punctuation
    count per character (subword-budget estimate for LLM pipelines) —
    a single JVM-side ``regexp_count``, no Python."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("long")


def bpe_token_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: list | None = None,
    check_roundtrip: bool = False,
) -> DataFrame:
    """True merge-table BPE token count (VERDICT r03 #4) — the real encoder
    (functions/bpe.py: byte-level, GPT-2-shaped pre-tokenizer, deterministic
    built-in vocab or a caller-supplied merge list), kept alongside the
    ``token_count_bpe`` regexp estimate.

    Arrow-batched ``mapInPandas``: the merge table travels in the closure
    (a few KB), one encoder with a per-word memo is built per task, and the
    scan projects only (id, text) so column pruning holds. With
    ``check_roundtrip`` each doc is also decoded back and compared
    byte-exactly (BPE is lossless by construction) — the operator's
    self-verifying invariant, priced at one extra pass per doc."""
    import pandas as pd

    spark = df.sparkSession
    out_schema = f"{id_col} long, n_tokens_bpe long" + (
        ", roundtrip_ok boolean" if check_roundtrip else ""
    )
    merge_list = merges  # closure capture; None -> deterministic default

    def run(batches):
        from ..functions.bpe import decode, make_encoder

        enc = make_encoder(merge_list)
        for pdf in batches:
            texts = pdf[text_col]
            counts, rts = [], []
            for t in texts:
                if t is None:
                    counts.append(None)
                    rts.append(None)
                    continue
                toks = enc(t)
                counts.append(len(toks))
                if check_roundtrip:
                    rts.append(decode(toks) == t)
            out = {id_col: pdf[id_col], "n_tokens_bpe": pd.array(counts, dtype="Int64")}
            if check_roundtrip:
                out["roundtrip_ok"] = pd.array(rts, dtype="boolean")
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def occurrences(text: Column, sub: str) -> Column:
    """Occurrence count of a literal substring via the length/replace trick
    (portable to ANSI SQL)."""
    return ((F.length(text) - F.length(F.replace(text, F.lit(sub), F.lit("")))) / len(sub)).cast(
        "long"
    )


def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc integer quality signals: chars, tokens, sentence-ish marks,
    commas, digits-proxy. Downstream filters compose on these."""
    t = F.col(text_col)
    return df.select(
        F.col("doc_id"),
        F.length(t).cast("long").alias("n_chars"),
        token_count(t).alias("n_tokens"),
        occurrences(t, ".").alias("n_periods"),
        occurrences(t, ",").alias("n_commas"),
        occurrences(t, " the ").alias("n_the"),
    )


# Per-language stopword markers for the argmax heuristic (VERDICT r03 #5
# widened 4 -> 12). Markers are space-delimited high-frequency function
# words chosen to be distinctive for their language (collisions like
# it/fr 'il' resolve by the other two markers; ties break deterministically
# by language-code order). The oracle SQL is GENERATED from this same table
# (__spark_entry__._lang_id_oracle) so Spark and DuckDB always agree on the
# marker set while DuckDB independently recomputes counts and argmax.
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    # de/nl and es/pt are the confusable pairs (VERDICT r04 #7): 'die' is
    # both the German article and a Dutch demonstrative, es/pt share
    # 'como'/'de' — each of the four carries a 4th pair-disambiguating
    # marker (negation particles and plural articles are near-disjoint)
    "de": [" der ", " und ", " die ", " nicht "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " de la ", " los "],
    "it": [" il ", " che ", " della "],
    "pt": [" uma ", " como ", " não ", " para o "],
    "nl": [" het ", " een ", " van de ", " niet "],
    "sv": [" och ", " att ", " det "],
    "pl": [" się ", " nie ", " jest "],
    "tr": [" bir ", " ve ", " için "],
    "id": [" yang ", " dan ", " untuk "],
    "ru": [" и ", " не ", " что "],
}
_LANG_MARKERS = LANG_MARKERS  # back-compat alias


def lang_score(text: Column, lang: str) -> Column:
    s = F.lit(0).cast("long")
    for m in _LANG_MARKERS[lang]:
        s = s + occurrences(text, m)
    return s


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: argmax of per-language marker counts,
    'und' (undetermined) when all scores are zero. Deterministic tie-break by
    language code order."""
    t = F.lower(F.col(text_col))
    scored = df.select(
        F.col("doc_id"),
        *[lang_score(t, lang).alias(f"score_{lang}") for lang in sorted(_LANG_MARKERS)],
    )
    langs = sorted(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return scored.select(
        "doc_id",
        F.when(best > 0, pred).otherwise(F.lit("und")).alias("pred_lang"),
        best.alias("best_score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text. Exact-dedup key robust to spacing/case."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select(F.col("doc_id"), F.md5(norm).alias("fp"))
