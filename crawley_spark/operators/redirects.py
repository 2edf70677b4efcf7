"""HTTP redirect-chain resolution — the frontier post-processing step a
web-scale crawl runs over its fetch results (beyond-reference: the Go
reference delegates redirects to net/http's client, which follows up to 10
hops invisibly; a distributed crawl records per-fetch (status, Location)
rows and resolves chains as data).

Semantics (the published crawler rule — bounded redirect following, cf.
curl --max-redirs / net/http's 10-hop cap): starting from every url,
follow ``url -> location`` edges of 3xx rows for at most ``max_hops``
steps; classify the terminal:

* ``ok``        — landed on a fetched page that is not a redirect;
* ``dangling``  — landed on a URL with no fetch row (off-corpus target);
* ``max_hops``  — still on a redirect after ``max_hops`` steps (covers
  loops, exactly how real crawlers give up on cycles).

``n_hops`` counts the edges actually taken. Everything is deterministic —
no wall clock, no sampling — so a SQL oracle replays the hops as
``max_hops`` generated chained CTEs (the pagerank/crawl_bfs pattern).

Scale shape: the redirect edge table R (one row per 3xx fetch, a small
minority of a real corpus) is the only join side that repeats; each hop
joins the STILL-PENDING minority against R on the current cursor —
exchanges carry (url, cur, hops) scalars, never bodies — and resolved rows
leave the loop immediately (their results union at the end), so hop k
touches only chains of length >= k: total work is O(sum of chain lengths),
not O(n · max_hops). A fixed small ``max_hops`` (default 10, net/http's
cap) keeps the plan depth bounded; per-hop localCheckpoint keeps lineage
flat on long chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_HOPS_DEFAULT = 10  # net/http's published default redirect cap


def resolve_redirects(
    pages: DataFrame,
    *,
    url_col: str = "url",
    status_col: str = "status",
    location_col: str = "location",
    max_hops: int = MAX_HOPS_DEFAULT,
) -> DataFrame:
    """Resolve every page's redirect chain. ``pages``: one row per fetched
    URL with its HTTP status and (for 3xx) the Location target. Returns
    (url, final_url, n_hops, terminal)."""
    if max_hops < 1:
        raise ValueError(f"resolve_redirects: max_hops must be >= 1 (got {max_hops})")
    edges = (
        pages.filter(
            (F.col(status_col) >= 300)
            & (F.col(status_col) <= 399)
            & F.col(location_col).isNotNull()
        )
        .select(F.col(url_col).alias("_src"), F.col(location_col).alias("_dst"))
        .localCheckpoint(eager=False)
    )
    known = pages.select(F.col(url_col).alias("_known")).distinct()
    state = pages.select(
        F.col(url_col).alias("url"),
        F.col(url_col).alias("cur"),
        F.lit(0).cast("long").alias("n_hops"),
    )
    resolved = []
    for _hop in range(max_hops):
        j = state.join(edges, state["cur"] == edges["_src"], "left")
        resolved.append(
            j.filter(F.col("_src").isNull()).select("url", "cur", "n_hops")
        )
        state = (
            j.filter(F.col("_src").isNotNull())
            .select(
                "url",
                F.col("_dst").alias("cur"),
                (F.col("n_hops") + 1).alias("n_hops"),
            )
            .localCheckpoint(eager=False)
        )
    # one classification for everyone: a cursor with an outgoing redirect
    # edge after max_hops is still mid-chain (incl. loops) -> 'max_hops';
    # rows that exited early have no outgoing edge by construction, so the
    # edge re-join is a no-op for them — and a chain of length EXACTLY
    # max_hops that landed on a terminal classifies ok/dangling, not
    # max_hops (the oracle states the identical rule)
    allrows = resolved[0]
    for r in resolved[1:]:
        allrows = allrows.unionByName(r)
    allrows = allrows.unionByName(state)
    out_edges = edges.select(F.col("_src").alias("_out")).distinct()
    return (
        allrows.join(out_edges, allrows["cur"] == out_edges["_out"], "left")
        .join(known, allrows["cur"] == known["_known"], "left")
        .select(
            "url",
            F.col("cur").alias("final_url"),
            "n_hops",
            F.when(F.col("_out").isNotNull(), F.lit("max_hops"))
            .when(F.col("_known").isNotNull(), F.lit("ok"))
            .otherwise(F.lit("dangling"))
            .alias("terminal"),
        )
    )
