"""Link-graph analytics for crawl frontier prioritization: host graph
aggregation, degree tables, and an integer-exact distributed PageRank.

A production frontier at 10^10 URLs cannot fetch breadth-first forever —
scheduling by authority (PageRank over the host graph, the classic
crawl-ordering signal since Cho/Garcia-Molina/Page 1998) is what keeps a
bounded fetch budget on the pages that matter. The reference crawls one
site and needs none of this; at Common-Crawl scale it is the operator the
scheduler actually calls.

Arithmetic is INTEGER by design: ranks are "micro-rank" units that always
sum-combine exactly, so (a) results are bit-identical regardless of
partitioning, task order, or cluster size, and (b) the DuckDB oracle can
recompute the whole iteration hash-exactly (floating PageRank can differ
in the last ulp across engines — integer ranks cannot). The update rule,
with integer division at exactly two documented points:

    contrib(u->v) = rank(u) // outdeg(u)                 (per edge)
    rank'(v)      = ((100-d)*(SCALE//N) + d*sum_in(v)) // 100

Dangling-node mass (outdeg 0) is dropped, not redistributed — the standard
sparse-graph simplification; documented, mirrored by the oracle, and
irrelevant to ordering quality at crawl scale.

Scale shape (same discipline as operators/cluster.py): the edge table is
hash-partitioned by ``src`` once and persisted; every iteration re-shuffles
only the (node, rank) table — two (long, long) exchanges per round (join
by src, re-aggregate by dst), fixed round count, no driver collect, and
each round's rank table is cut with ``localCheckpoint`` so lineage stays
flat (swap for persist+unpersist on a multi-node cluster, same note as the
engine carry). Exchanges are pinned scalar-only by
tests/test_linkgraph.py::test_rank_exchanges_carry_scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# total rank mass in micro-rank units; large enough that rank // outdeg
# keeps ~6 significant digits for a 1e6-node graph with outdeg ~100
RANK_SCALE = 10**12
DEFAULT_DAMPING = 85  # percent
DEFAULT_ITERATIONS = 3

# edge-table persist gate, same rationale as cluster.BIG_GRAPH_NODES: below
# this the persist costs more than the re-scan it saves (warm-A/B'd there)
BIG_GRAPH_EDGES = 200_000

# driver-local fast path, same rationale (and thresholds) as
# cluster.SMALL_GRAPH_NODES: below this the per-iteration DataFrame rounds
# are pure Spark-job floor (~0.3-0.5 s each for microseconds of integer
# arithmetic), and because ranks are integers the driver replay is EXACT —
# parity is forced through both paths in tests/test_linkgraph.py. The edge
# cap guards dense small-n graphs where the collect itself would be the
# problem; past either cap the distributed rounds run.
SMALL_GRAPH_NODES = 4096
SMALL_GRAPH_EDGES = 1_000_000


def _driver_pagerank(node_ids, edge_rows, iterations, damping, base, teleport):
    """The documented update rule, straight-line Python over collected
    (src, dst) rows. Python ``//`` == Spark ``div`` on the all-nonnegative
    values involved, so the result is bit-identical to the distributed
    rounds. Edges whose src is outside ``node_ids`` contribute nothing and
    masses for dsts outside it are dropped — exactly what the distributed
    joins do."""
    from collections import Counter

    outd = Counter(s for s, _ in edge_rows)
    rank = {v: base for v in node_ids}
    for _ in range(iterations):
        mass = Counter()
        for s, d in edge_rows:
            r = rank.get(s)
            if r is not None:
                mass[d] += r // outd[s]
        rank = {v: (teleport + damping * mass[v]) // 100 for v in node_ids}
    return rank


def host_graph(
    edges: DataFrame, src_col: str = "src_host", dst_col: str = "dst_host"
) -> DataFrame:
    """Aggregate raw link edges into the weighted host graph:
    (src_host, dst_host, n_links), self-loops dropped. One map-side-partial
    shuffle on the (src, dst) pair; mega-host skew combines before the
    exchange because the aggregate is a plain count."""
    return (
        edges.filter(F.col(src_col) != F.col(dst_col))
        .groupBy(F.col(src_col).alias("src_host"), F.col(dst_col).alias("dst_host"))
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def degrees(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(node, out_deg, in_deg) over distinct edges; nodes with no edges get
    zeros (left joins against the two partial-agg degree tables)."""
    e = edges.select("src", "dst").distinct()
    out_d = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("out_deg"))
    in_d = e.groupBy(F.col("dst").alias("node")).agg(F.count(F.lit(1)).alias("in_deg"))
    return (
        nodes.select("node")
        .join(out_d, "node", "left")
        .join(in_d, "node", "left")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def prioritize_frontier(
    frontier: DataFrame,
    host_ranks: DataFrame,
    *,
    batch_size: int,
    per_host_cap: int,
    host_col: str = "host",
    rank_col: str = "rank",
    url_col: str = "url",
    salt_buckets: int = 64,
) -> DataFrame:
    """Select the next fetch batch by host authority — the scheduler step
    that consumes :func:`pagerank`. Each frontier URL joins its host's
    rank (broadcast: the rank table is one row per host, tiny next to a
    10^10-row frontier; hosts not yet ranked default to 0 — newly
    discovered domains still get fetched, last), a per-host ``slot``
    window caps picks per host (politeness — keyed on host, the same key
    the politeness scheduler already uses), and the global ``batch_size``
    cut is ``orderBy(rank desc, url).limit`` — Spark compiles that to
    TakeOrderedAndProject, the two-stage distributed top-k (per-partition
    heads, then one driver-side merge of K rows), never a full global
    sort. Ties are total-ordered by (rank, url) so the selected SET is
    deterministic at any parallelism.

    Skew: a mega-host (one host holding 10^8+ frontier rows) would put
    its whole row set through a single window task, so the per-host cap
    runs in TWO stages — first a per-(host, url-salt) local cap over
    ``salt_buckets`` buckets (bounds any single task's sort to
    rows/bucket and cuts a mega-host to ≤ cap·salt_buckets candidates),
    then the exact per-host window over the survivors. Exactness is
    structural: every url in a host's true top-``per_host_cap`` is also
    in its own bucket's top-``per_host_cap``, so stage 1 never drops a
    winner (salted ≡ unsalted pinned in tests). ``salt_buckets=1``
    disables stage 1.

    Returns the selected rows with ``rank`` (long) and ``slot`` (long)
    appended."""
    from pyspark.sql import Window

    ranks = host_ranks.select(
        F.col(host_col), F.col(rank_col).cast("long").alias("_hrank")
    )
    j = frontier.join(F.broadcast(ranks), host_col, "left").withColumn(
        "_hrank", F.coalesce("_hrank", F.lit(0))
    )
    if salt_buckets > 1:
        w1 = Window.partitionBy(
            host_col, F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets))
        ).orderBy(F.col(url_col))
        j = (
            j.withColumn("_s1", F.row_number().over(w1))
            .filter(F.col("_s1") <= per_host_cap)
            .drop("_s1")
        )
    w = Window.partitionBy(host_col).orderBy(F.col(url_col))
    capped = (
        j.withColumn("slot", F.row_number().over(w).cast("long"))
        .filter(F.col("slot") <= per_host_cap)
        .withColumnRenamed("_hrank", rank_col)
    )
    return capped.orderBy(F.col(rank_col).desc(), F.col(url_col)).limit(batch_size)


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    iterations: int = DEFAULT_ITERATIONS,
    damping: int = DEFAULT_DAMPING,
    scale: int = RANK_SCALE,
    small_graph_nodes: int = SMALL_GRAPH_NODES,
    stats: dict | None = None,
) -> DataFrame:
    """Integer-exact PageRank. ``nodes``: (node long); ``edges``:
    (src long, dst long), deduplicated internally. Returns
    (node, rank long) after ``iterations`` rounds from the uniform start
    ``SCALE // N``. Fixed iteration count, not convergence-tested: the
    scheduler wants a stable priority signal, and a fixed count is what
    makes the oracle expressible as ``iterations`` chained CTEs.

    Graphs with ≤ ``small_graph_nodes`` nodes (and a bounded edge count)
    replay the identical integer rule on the driver instead of launching
    2·iterations shuffles — exact by construction (pass 0 to force the
    distributed path; tests do, to pin its plan shape). ``stats`` (optional
    dict) receives ``{"mode": "driver"|"distributed", "nodes": n}``."""
    n_nodes = nodes.count()  # driver scalar, needed for the base term
    if n_nodes == 0:
        return nodes.select(F.col("node"), F.lit(0).cast("long").alias("rank"))
    base = scale // n_nodes
    teleport = (100 - damping) * base

    e = edges.select("src", "dst").distinct()
    n_edges = e.count()
    if n_nodes <= small_graph_nodes and n_edges <= SMALL_GRAPH_EDGES:
        node_ids = [r[0] for r in nodes.select("node").collect()]
        edge_rows = [(r[0], r[1]) for r in e.collect()]
        rank = _driver_pagerank(
            node_ids, edge_rows, iterations, damping, base, teleport
        )
        if stats is not None:
            stats.update(mode="driver", nodes=n_nodes)
        return nodes.sparkSession.createDataFrame(
            [(v, rank[v]) for v in node_ids], "node long, rank long"
        )
    if stats is not None:
        stats.update(mode="distributed", nodes=n_nodes)
    big = n_edges > BIG_GRAPH_EDGES
    if big:
        shuffle_n = int(
            nodes.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        e = e.repartition(shuffle_n, "src").persist()
    out_d = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # out_deg rides the edge table keyed by src — computed once, reused
    # every round; only (node, rank) moves per iteration
    e_deg = e.join(out_d, "src")
    if big:
        e_deg = e_deg.persist()

    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank"))
    try:
        for _ in range(iterations):
            contribs = (
                e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
                .select(
                    F.col("dst").alias("node"),
                    # integer `div`, NOT double `/`+cast: a double quotient
                    # one ulp under an integer boundary would truncate
                    # differently than the oracle's integer division
                    F.expr("rank div out_deg").alias("contrib"),
                )
                .groupBy("node")
                .agg(F.sum("contrib").alias("in_mass"))
            )
            ranks = (
                nodes.select("node")
                .join(contribs, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(teleport)
                        + F.lit(damping) * F.coalesce("in_mass", F.lit(0))
                    )
                    .cast("long")
                    .alias("_num"),
                )
                .select("node", F.expr("_num div 100").alias("rank"))
                .localCheckpoint(eager=True)
            )
    finally:
        # release the big-graph cache on every exit path (the cluster.py
        # leak ADVICE r04 flagged — don't reintroduce it here)
        if big:
            e.unpersist()
            e_deg.unpersist()
    return ranks


HITS_SCALE = 10**6
HITS_ITERATIONS = 3


def _driver_hits(node_ids, edge_rows, iterations, scale):
    """Straight-line replay of the documented integer HITS rule (Python
    ``//`` == Spark ``div`` == DuckDB ``//`` on the all-nonnegative values
    involved)."""
    from collections import defaultdict

    n = len(node_ids)
    base = scale // n
    h = {v: base for v in node_ids}
    a = {v: 0 for v in node_ids}
    for _ in range(iterations):
        raw = defaultdict(int)
        for s, d in edge_rows:
            raw[d] += h.get(s, 0)
        tot = sum(raw.values())
        a = {v: (raw.get(v, 0) * scale // tot if tot else 0) for v in node_ids}
        raw = defaultdict(int)
        for s, d in edge_rows:
            raw[s] += a.get(d, 0)
        tot = sum(raw.values())
        h = {v: (raw.get(v, 0) * scale // tot if tot else 0) for v in node_ids}
    return a, h


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    iterations: int = HITS_ITERATIONS,
    scale: int = HITS_SCALE,
    small_graph_nodes: int = SMALL_GRAPH_NODES,
    stats: dict | None = None,
) -> DataFrame:
    """Integer-exact HITS (Kleinberg 1999 — hubs and authorities, the
    complementary crawl-ordering signal to PageRank: authorities are
    where content concentrates, hubs are the directory pages a crawler
    mines for links). Per iteration:

        a_raw(v) = Σ_{(u,v)∈E} h(u);  a(v) = a_raw(v)·SCALE // Σ a_raw
        h_raw(u) = Σ_{(u,v)∈E} a(v);  h(u) = h_raw(u)·SCALE // Σ h_raw

    The per-step integer renormalization replaces the published L2
    normalization — same fixpoint direction, but exact: every value is a
    BIGINT and the trunc-division is identical on Spark/DuckDB/Python, so
    ranks are bit-identical under any partitioning and the oracle replays
    the rounds as generated CTEs (the pagerank discipline). Returns
    (node, authority, hub) after the fixed ``iterations``.

    Overflow bound: after each rescale Σv = SCALE (minus truncation), so
    raw sums are ≤ SCALE·max_degree and the rescale numerator ≤
    SCALE²·max_degree/Σ — with SCALE = 1e6 safe to per-node degree ~1e6,
    far beyond any real host graph (document-level graphs cap in-degree
    by dedup).

    Scale shape = pagerank's: the edge table is deduped once,
    hash-clustered + persisted past BIG_GRAPH_EDGES; each half-step is
    one scalar-carrying join + map-side-partial aggregate; the
    normalizer is a one-row aggregate broadcast back (no driver scalar
    per round); per-round localCheckpoint keeps lineage flat. Graphs ≤
    ``small_graph_nodes`` replay the identical rule on the driver (pass
    0 to force the distributed path)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("authority"),
            F.lit(0).cast("long").alias("hub"),
        )
    base = scale // n_nodes
    e = edges.select("src", "dst").distinct()
    n_edges = e.count()
    if n_nodes <= small_graph_nodes and n_edges <= SMALL_GRAPH_EDGES:
        node_ids = [r[0] for r in nodes.select("node").collect()]
        edge_rows = [(r[0], r[1]) for r in e.collect()]
        a, h = _driver_hits(node_ids, edge_rows, iterations, scale)
        if stats is not None:
            stats.update(mode="driver", nodes=n_nodes)
        return nodes.sparkSession.createDataFrame(
            [(v, a[v], h[v]) for v in node_ids],
            "node long, authority long, hub long",
        )
    if stats is not None:
        stats.update(mode="distributed", nodes=n_nodes)
    cached = None
    if n_edges > BIG_GRAPH_EDGES:
        shuffle_n = int(
            nodes.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        cached = e.repartition(shuffle_n, "src").persist()
        e = cached

    def _rescale(raw: DataFrame, col: str) -> DataFrame:
        tot = raw.agg(F.sum("v").alias("_s"))
        return (
            nodes.select("node")
            .join(raw, "node", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "node",
                F.when(
                    F.col("_s") > 0,
                    F.expr(f"(coalesce(v, 0) * {int(scale)}) div _s"),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias(col),
            )
            .localCheckpoint(eager=True)
        )

    h = nodes.select("node", F.lit(base).cast("long").alias("h"))
    a = None
    try:
        for _ in range(iterations):
            a_raw = (
                e.join(h.select(F.col("node").alias("src"), "h"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("h").alias("v"))
            )
            a = _rescale(a_raw, "a")
            h_raw = (
                e.join(a.select(F.col("node").alias("dst"), "a"), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("a").alias("v"))
            )
            h = _rescale(h_raw, "h")
    finally:
        if cached is not None:
            cached.unpersist()
    return (
        a.join(h, "node")
        .select("node", F.col("a").alias("authority"), F.col("h").alias("hub"))
    )
