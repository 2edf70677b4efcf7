"""Crawl-snapshot analytics: epoch-to-epoch delta and change-rate-driven
recrawl scheduling.

A continuous crawler re-fetches the web forever; the two questions its
scheduler asks between epochs are "what changed since the last crawl?"
(delta — drives incremental index updates and WARC re-export) and "how
often does each page change?" (change-rate estimation — drives the
revisit budget; Cho & Garcia-Molina, "Estimating Frequency of Change",
ACM TOIT 2003). The reference crawls one site once and needs neither; at
Common-Crawl scale they are the operators the recrawl loop actually runs.

Numerics follow the repo's integer-exact discipline: digests are md5
strings computed map-side (the join exchanges never carry page text), the
change-rate estimator is stored in integer micro-units, and the staleness
probability is an integer micro-probability — so every output column
hash-compares bit-identically across partitionings and engines (the only
cross-engine float surface is ln/exp, the same accepted libm surface as
operators/lmscore.py).

Scale shape:

- ``crawl_delta``: both epochs are reduced map-side to (url, digest)
  before the single full-outer hash join on url — at 100 TB the exchange
  carries two strings per page, never bodies. No window, no sort.
- ``recrawl_priority``: the history table is hash-partitioned by url with
  an in-partition sort by epoch (``Window.partitionBy(url).orderBy``) —
  one shuffle, no global sort; per-url state is two counters, so the
  aggregate is map-side-combinable after the lag. Estimator per url with
  n observed consecutive intervals and X of them changed (unit interval):

      lambda_micro   = round(-1e6 * ln((n - X + 0.5) / (n + 0.5)))
      pr_stale_micro = round(1e6 * (1 - exp(-(lambda_micro/1e6) * age)))

  the 0.5 terms are the Cho/Garcia-Molina bias correction, which also
  keeps the estimator finite when X = n (every fetch changed).

No reference counterpart (s0rg/crawley is a single-epoch crawler); cited
for contrast: its Crawler.Run performs exactly one BFS pass
(crawler.go:84-120) with no persistence between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# status codes, ordered for the summary rollup
DELTA_STATUSES = ("added", "changed", "removed", "unchanged")


def crawl_delta(
    df_a: DataFrame,
    df_b: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    digest_col: str | None = None,
) -> DataFrame:
    """Per-URL delta between crawl epoch A (older) and epoch B (newer).

    Returns (url, status, digest_a, digest_b) with status in
    ``DELTA_STATUSES``: ``added`` = in B only, ``removed`` = in A only,
    ``changed`` / ``unchanged`` = in both, by content digest.

    If ``digest_col`` is given it is used as the precomputed content
    digest; otherwise ``md5(text_col)`` is computed map-side so the join
    exchange carries (url, 32-char digest) rows, never page bodies.
    Inputs must be unique per url (a crawl result set is; duplicate urls
    would cross-join in the full-outer join).
    """

    def _digests(df: DataFrame, alias: str) -> DataFrame:
        d = F.col(digest_col) if digest_col else F.md5(F.col(text_col))
        return df.select(F.col(url_col).alias("url"), d.alias(alias))

    a = _digests(df_a, "digest_a")
    b = _digests(df_b, "digest_b")
    joined = a.join(b, "url", "full_outer")
    return joined.select(
        "url",
        F.when(F.col("digest_a").isNull(), F.lit("added"))
        .when(F.col("digest_b").isNull(), F.lit("removed"))
        .when(F.col("digest_a") == F.col("digest_b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        "digest_a",
        "digest_b",
    )


def crawl_delta_summary(delta: DataFrame) -> DataFrame:
    """One row per status with its count — the epoch report line. Map-side
    partial aggregation; the exchange carries four (string, long) rows per
    task."""
    return delta.groupBy("status").agg(F.count(F.lit(1)).alias("n_urls"))


def change_rate(
    history: DataFrame,
    url_col: str = "url",
    epoch_col: str = "epoch",
    digest_col: str = "digest",
    now_epoch: int | None = None,
) -> DataFrame:
    """Per-URL Poisson change-rate estimate from a (url, epoch, digest)
    fetch history.

    Consecutive observed fetches of the same url form ``n_intervals``
    unit-length intervals, ``n_changes`` of which saw a digest change.
    Output columns (all BIGINT):

    - ``n_obs``       — fetches observed for the url
    - ``n_intervals`` — n_obs - 1
    - ``n_changes``   — intervals whose digest differs from the previous
    - ``last_epoch``  — most recent fetch epoch
    - ``lambda_micro``— round(-1e6 * ln((n - X + 0.5)/(n + 0.5))), the
      bias-corrected Cho/Garcia-Molina estimator in micro-changes/epoch;
      NULL when n_intervals = 0 (a single fetch carries no information)
    - ``age``         — now_epoch - last_epoch (``now_epoch`` defaults to
      the history's max epoch, computed as one scalar aggregate)
    - ``pr_stale_micro`` — round(1e6 * (1 - exp(-(lambda_micro/1e6)*age))),
      the probability the page changed since its last fetch; NULL when
      lambda is NULL. This is the recrawl-priority key: schedule the
      highest pr_stale first.

    The lag runs inside a hash(url) partition sorted by epoch — one
    shuffle, no global sort; ties on (url, epoch) are invalid input
    (a url is fetched at most once per epoch).
    """
    if now_epoch is None:
        row = history.agg(F.max(epoch_col).alias("m")).collect()[0]
        now_epoch = int(row["m"] if row["m"] is not None else 0)

    w = Window.partitionBy(url_col).orderBy(epoch_col)
    lagged = history.select(
        F.col(url_col).alias("url"),
        F.col(epoch_col).cast("long").alias("epoch"),
        F.col(digest_col).alias("digest"),
    ).withColumn("prev_digest", F.lag("digest").over(w))

    per_url = lagged.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.when(F.col("prev_digest").isNotNull(), 1).otherwise(0)).alias(
            "n_intervals"
        ),
        F.sum(
            F.when(
                F.col("prev_digest").isNotNull()
                & (F.col("digest") != F.col("prev_digest")),
                1,
            ).otherwise(0)
        ).alias("n_changes"),
        F.max("epoch").alias("last_epoch"),
    )

    n = F.col("n_intervals").cast("double")
    x = F.col("n_changes").cast("double")
    lam_micro = F.when(
        F.col("n_intervals") > 0,
        F.round(
            F.lit(-1e6) * F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5)))
        ).cast("long"),
    )
    scored = per_url.withColumn("lambda_micro", lam_micro).withColumn(
        "age", (F.lit(now_epoch) - F.col("last_epoch")).cast("long")
    )
    pr = F.when(
        F.col("lambda_micro").isNotNull(),
        F.round(
            F.lit(1e6)
            * (
                F.lit(1.0)
                - F.exp(
                    -(F.col("lambda_micro") / F.lit(1e6))
                    * F.col("age").cast("double")
                )
            )
        ).cast("long"),
    )
    return scored.select(
        "url",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("n_intervals").cast("long").alias("n_intervals"),
        F.col("n_changes").cast("long").alias("n_changes"),
        F.col("last_epoch").cast("long").alias("last_epoch"),
        "lambda_micro",
        "age",
        pr.alias("pr_stale_micro"),
    )
