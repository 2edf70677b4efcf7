"""Near-duplicate cluster consolidation (VERDICT r03 "next" #1) — the step
after pair generation that a real dedup pipeline actually runs: connected
components over the (doc_a, doc_b) outputs of
``near_duplicates_{minhash,simhash,embedding}``, then one canonical
keep/drop decision per cluster. This is the batch twin of
``streaming/dedup.py``'s keep-first suppression, computed exactly.

Algorithm: iterative **min-label propagation with pointer jumping** on
DataFrames — no driver-side union-find, no GraphFrames dependency, nothing
collected. Each round:

1. *propagate*: every node's label becomes the min over its own label and
   its neighbors' labels (one shuffle: edge⋈label join + groupBy-min with
   map-side partial agg);
2. *pointer-jump*: ``label[v] := label[label[v]]`` (one self-join on the
   label table) — the path-compression step that turns the propagation's
   O(diameter) rounds into O(log diameter): a chain of 2^k nodes converges
   in ~k+2 rounds instead of 2^k (tests/test_cluster.py pins the bound).

Labels are node ids and only ever decrease, so ``sum(label)`` is strictly
monotone while anything changes — convergence is detected by one cheap
aggregate per round (no compare join). Each round's label table is cut with
``localCheckpoint(eager=True)``: the next round and the convergence agg
read materialized blocks, and the lineage does not grow with iterations
(the classic iterative-algorithm failure mode on Spark). On a multi-node
cluster swap the cut for ``persist(MEMORY_AND_DISK)`` + unpersist if
executor loss must not restart the job (same note as the engine's carry).

Scale shape: the label table holds only nodes that appear in pairs — for a
near-dup pipeline that is the duplicated minority, not the corpus. Every
step is an equi-join/groupBy on (id | label) scalars; per-round cost is
2-3 bounded shuffles of (long, long) rows, and the round count is
logarithmic in the largest cluster's diameter. A degenerate giant cluster
(template mass: millions of mutually-similar docs) has small diameter by
construction — LSH pair generation emits near-cliques — so it converges in
2-3 rounds; the long-chain worst case is what pointer jumping bounds.

Small graphs (≤ ``SMALL_GRAPH_NODES`` nodes) skip the rounds entirely: an
exact driver-local union-find over the collected edge list (VERDICT r04
"next" #5) — at that size the iterative path is pure Spark-job-scheduling
floor, and per-micro-batch callers (streaming keep-first dedup) need the
consolidation to cost one collect, not log(n) jobs. Both paths are
parity-forced in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_ITER = 50

# node count above which the per-round propagate join stops broadcasting the
# label table (≈ Spark's 10 MB autoBroadcastJoinThreshold at 2 longs/row,
# conservatively low) — only then does pre-clustering the edge table by the
# join key pay for its one extra shuffle + cache
BIG_GRAPH_NODES = 200_000

# VERDICT r04 "next" #5: below this node count the whole pair graph is a
# driver-trivial object (≤ 4096 nodes × 2 longs), and the iterative
# DataFrame rounds are pure Spark-job floor — each round costs ~0.2-0.5 s of
# scheduling for microseconds of actual work. A driver-local union-find is
# exact (parity forced through both paths in tests/test_cluster.py) and
# turns the consolidation's per-round floor into one collect. The edge
# cap guards the degenerate small-n/dense-clique case where n² edges would
# make the collect itself the problem; past it the distributed path runs.
SMALL_GRAPH_NODES = 4096
SMALL_GRAPH_EDGES = 1_000_000


def _driver_components(edge_rows):
    """Exact union-find with path compression over collected (u, v) rows;
    union-by-min-root keeps the invariant that every tree's root is the
    minimum id of its component, so ``find(x)`` IS the canonical label."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in edge_rows:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return [(x, find(x)) for x in parent]


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = DEFAULT_MAX_ITER,
    stats: dict | None = None,
    big_graph_nodes: int = BIG_GRAPH_NODES,
    small_graph_nodes: int = SMALL_GRAPH_NODES,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``; component =
    the smallest node id reachable from the node (the canonical cluster
    label). Ids must be integral (longs). ``stats`` (optional dict) receives
    ``{"iterations": n, "nodes": n, "mode": "driver"|"distributed"}`` for
    convergence-bound tests/metrics.

    Graphs with ≤ ``small_graph_nodes`` nodes (and a bounded edge count)
    take an exact driver-local union-find instead of the iterative rounds —
    the per-round Spark job floor dominates tiny graphs; pass 0 to force
    the distributed path (tests do, to pin its convergence bounds).

    Raises after ``max_iter`` rounds without convergence — with pointer
    jumping that bound is ~log2(longest chain) + 3, so 50 covers any input
    that fits on a cluster (2^47 nodes); hitting it means a bug, not a big
    graph."""
    edges = (
        pairs.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .unionByName(
            pairs.select(F.col(dst).cast("long").alias("u"), F.col(src).cast("long").alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
    )
    # duplicate pairs across bands/tables would multiply the propagate join
    # output; one distinct up front bounds it (pair generators already
    # dropDuplicates, but composed inputs may union several of them)
    edges = edges.dropDuplicates(["u", "v"]).localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("u").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)
    n_nodes = labels.count()
    if n_nodes <= small_graph_nodes:
        # one direction suffices for union-find; halves the collect
        half = edges.filter(F.col("u") < F.col("v"))
        edge_rows = half.limit(SMALL_GRAPH_EDGES + 1).collect()
        if len(edge_rows) <= SMALL_GRAPH_EDGES:
            comp = _driver_components([(r[0], r[1]) for r in edge_rows])
            if stats is not None:
                stats["iterations"] = 0
                stats["nodes"] = n_nodes
                stats["mode"] = "driver"
            spark = pairs.sparkSession
            return spark.createDataFrame(comp, "id long, component long")
        # fell through: tiny node set but a near-complete clique — the
        # distributed rounds handle it in O(1) iterations anyway
    edges_cached = None
    if n_nodes > big_graph_nodes:
        # Big graph: the label table no longer broadcasts, so every round's
        # propagate join would re-shuffle the FULL edge set (the big side:
        # band pairs can be many × nodes), log(diameter) times. Cluster the
        # edges by the join key ONCE, via repartition + persist — NOT
        # localCheckpoint: InMemoryTableScan preserves the cached plan's
        # outputPartitioning, while this build's LogicalRDD (what
        # localCheckpoint produces) drops it (verified empirically by
        # tests/test_cluster.py::test_propagate_join_exchanges_labels_only).
        # Below the threshold the labels broadcast each round, the edge
        # partitioning is irrelevant, and the checkpointed row blocks scan
        # faster than the columnar cache — a warm A/B on the bench pair
        # graph measured persist ~10-15% slower there (BENCH.md r04), so
        # the repartition+persist is gated, not unconditional.
        edges_cached = edges.repartition(F.col("u")).persist()
        edges = edges_cached
    prev_sum = None
    iterations = 0
    # try/finally: the non-convergence raise (or any mid-loop failure) must
    # not leak the persisted big-graph edge table in the cache for the
    # session's lifetime (ADVICE r04)
    try:
        for _ in range(max_iter):
            iterations += 1
            # 1. propagate: min label over self + in-neighbors
            prop = edges.join(labels, edges.u == labels.id).select(
                F.col("v").alias("id"), F.col("comp")
            )
            new = (
                labels.select("id", "comp")
                .unionByName(prop)
                .groupBy("id")
                .agg(F.min("comp").alias("comp"))
            )
            # 2. pointer-jump: comp := comp[comp] (comp is itself a node id,
            # so the self-join always matches; coalesce guards the
            # theoretical miss so a bug surfaces as a wrong label, never a
            # dropped node)
            jump = new.select(F.col("id").alias("cid"), F.col("comp").alias("ccomp"))
            new = (
                new.join(jump, new.comp == jump.cid, "left")
                .select("id", F.coalesce("ccomp", "comp").alias("comp"))
                .localCheckpoint(eager=True)
            )
            # labels only decrease ⟹ sum strictly decreases iff any changed
            s = new.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]
            labels = new
            if s == prev_sum:
                break
            prev_sum = s
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds "
                f"({n_nodes} nodes) — this indicates a bug, not a large graph"
            )
    finally:
        # the final labels are an eager localCheckpoint (independent of the
        # edge cache), so the big-graph cache is always releasable here
        if edges_cached is not None:
            edges_cached.unpersist()
    if stats is not None:
        stats["iterations"] = iterations
        stats["nodes"] = n_nodes
        stats["mode"] = "distributed"
    return labels.select(F.col("id"), F.col("comp").alias("component"))


def consolidate_near_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    score_col: str | None = None,
    max_iter: int = DEFAULT_MAX_ITER,
    stats: dict | None = None,
    small_graph_nodes: int = SMALL_GRAPH_NODES,
) -> DataFrame:
    """One row per doc of ``df``: (id_col, component, keep_id, is_kept) —
    the canonical keep/drop decision per near-dup cluster (the batch twin of
    streaming keep-first).

    * ``component``: the cluster's canonical label (min member id); docs in
      no pair are their own singleton component.
    * ``keep_id``: the cluster's keeper — min id by default; with
      ``score_col`` (e.g. a quality_stats score carried on ``df``) the
      max-score member, ties broken by min id (deterministic).
    * ``is_kept``: the filter a pipeline applies (`WHERE is_kept`).

    Shape: components over the pair minority, then two scalar equi-joins
    (labels onto df; keeper table onto components). Nothing driver-side."""
    comp = connected_components(
        pairs, src, dst, max_iter=max_iter, stats=stats,
        small_graph_nodes=small_graph_nodes,
    )
    ids = df.select(F.col(id_col).cast("long").alias(id_col), *( [F.col(score_col)] if score_col else [] ))
    labeled = ids.join(comp, ids[id_col] == comp.id, "left").select(
        F.col(id_col),
        F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        *([F.col(score_col)] if score_col else []),
    )
    if score_col:
        best = F.max(
            F.struct(F.col(score_col).alias("s"), (-F.col(id_col)).alias("ni"))
        ).alias("m")
        keepers = (
            labeled.groupBy("component")
            .agg(best)
            .select("component", (-F.col("m.ni")).alias("keep_id"))
        )
    else:
        keepers = labeled.groupBy("component").agg(F.min(id_col).alias("keep_id"))
    return (
        labeled.join(keepers, on="component")
        .select(
            id_col,
            "component",
            "keep_id",
            (F.col(id_col) == F.col("keep_id")).alias("is_kept"),
        )
    )
