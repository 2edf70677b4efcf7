"""Near-dup cluster consolidation (operators/cluster.py, VERDICT r03 #1):
connected components over pair outputs + canonical keep/drop per cluster.

Pins: exactness vs a brute-force union-find on random graphs, the
pointer-jumping convergence bound (~log2(longest chain) + small constant),
degenerate giant-cluster boundedness, empty/self-loop/duplicate-edge edge
cases, and the score-based keeper rule (max score, ties -> min id)."""

import math
import random
import re

import pytest
from pyspark.sql import functions as F

from crawley_spark.operators.cluster import (
    connected_components,
    consolidate_near_duplicates,
)


def _uf_components(n_nodes, edges):
    """Brute-force union-find: {node: min-reachable-id} over nodes 0..n-1
    restricted to nodes appearing in edges (matching connected_components'
    contract)."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for u, v in edges:
        nodes.update((u, v))
    for x in nodes:
        parent[x] = x
    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # path-compress fully, then relabel each root to min member id
    comp_members = {}
    for x in nodes:
        comp_members.setdefault(find(x), []).append(x)
    out = {}
    for members in comp_members.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _pairs_df(spark, edges):
    if not edges:
        return spark.createDataFrame([], "doc_a long, doc_b long")
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "doc_a long, doc_b long"
    )


def test_components_match_union_find(spark):
    """Parity forced through BOTH paths (VERDICT r04 #5): the driver-local
    union-find fast path (default at 300 nodes) and the distributed
    iterative path (small_graph_nodes=0) must both equal the brute-force
    reference on the same random graphs."""
    rng = random.Random(42)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(220)]
    expect = _uf_components(n, [e for e in edges if e[0] != e[1]])
    stats_drv, stats_dist = {}, {}
    got_driver = {
        r["id"]: r["component"]
        for r in connected_components(
            _pairs_df(spark, edges), stats=stats_drv
        ).collect()
    }
    got_dist = {
        r["id"]: r["component"]
        for r in connected_components(
            _pairs_df(spark, edges), stats=stats_dist, small_graph_nodes=0
        ).collect()
    }
    assert stats_drv["mode"] == "driver" and stats_dist["mode"] == "distributed"
    assert got_driver == expect
    assert got_dist == expect


def test_components_big_graph_path_identical(spark):
    """big_graph_nodes=0 forces the edges repartition+persist path (the
    shape the operator takes when the label table is too big to broadcast);
    results must be identical to the default broadcast-era path."""
    rng = random.Random(7)
    n = 250
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(180)]
    expect = _uf_components(n, [e for e in edges if e[0] != e[1]])
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            _pairs_df(spark, edges), big_graph_nodes=0, small_graph_nodes=0
        ).collect()
    }
    assert got == expect


def test_chain_pointer_jump_bound(spark):
    """A path graph of 2^k+1 nodes is the worst case for plain label
    propagation (O(n) rounds); pointer jumping must converge in
    ~log2(n) + small-constant rounds."""
    n = 257  # chain 0-1-2-...-256 (diameter 256)
    edges = [(i, i + 1) for i in range(n - 1)]
    stats = {}
    out = connected_components(_pairs_df(spark, edges), stats=stats,
                               small_graph_nodes=0)
    rows = out.collect()
    assert all(r["component"] == 0 for r in rows) and len(rows) == n
    bound = math.ceil(math.log2(n)) + 4  # log rounds + init/detect slack
    assert stats["iterations"] <= bound, stats


def test_giant_cluster_bounded(spark):
    """Degenerate template-mass shape: one cluster containing every node
    (star + random chords, as LSH near-clique output looks). Must converge
    in a handful of rounds regardless of size."""
    rng = random.Random(7)
    n = 2000
    edges = [(0, i) for i in range(1, n)] + [
        (rng.randrange(n), rng.randrange(n)) for _ in range(500)
    ]
    stats = {}
    out = connected_components(_pairs_df(spark, edges), stats=stats,
                               small_graph_nodes=0)
    assert out.filter(F.col("component") != 0).count() == 0
    assert out.count() == n
    assert stats["iterations"] <= 5, stats


def test_self_loops_and_duplicate_edges(spark):
    edges = [(1, 1), (2, 3), (3, 2), (2, 3), (4, 4)]
    got = {
        r["id"]: r["component"]
        for r in connected_components(_pairs_df(spark, edges)).collect()
    }
    # self-loop-only nodes still get labeled (they appear in pairs)...
    # actually (1,1)/(4,4) are filtered as u==v, so 1 and 4 vanish from the
    # label table entirely — consolidate coalesces them to singletons.
    assert got == {2: 2, 3: 2}


def test_consolidate_default_min_id_keeper(spark):
    docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    pairs = _pairs_df(spark, [(3, 7), (7, 9), (2, 5)])
    out = consolidate_near_duplicates(docs, pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 10
    for d in (3, 7, 9):
        assert by_id[d]["component"] == 3 and by_id[d]["keep_id"] == 3
    for d in (2, 5):
        assert by_id[d]["component"] == 2 and by_id[d]["keep_id"] == 2
    # singletons keep themselves
    for d in (0, 1, 4, 6, 8):
        assert by_id[d]["component"] == d and by_id[d]["keep_id"] == d
    kept = {r["doc_id"] for r in out if r["is_kept"]}
    assert kept == {0, 1, 2, 3, 4, 6, 8}


def test_consolidate_score_keeper_max_score_ties_min_id(spark):
    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.3)],
        "doc_id long, q double",
    )
    pairs = _pairs_df(spark, [(1, 2), (2, 3), (4, 5)])
    out = {
        r["doc_id"]: r
        for r in consolidate_near_duplicates(
            docs, pairs, score_col="q"
        ).collect()
    }
    # cluster {1,2,3}: max score 0.9 shared by 2 and 3 -> min id 2 wins
    for d in (1, 2, 3):
        assert out[d]["keep_id"] == 2
    # cluster {4,5}: 5 has the higher score
    for d in (4, 5):
        assert out[d]["keep_id"] == 5
    assert {d for d, r in out.items() if r["is_kept"]} == {2, 5}


def test_consolidate_parity_both_paths(spark):
    """consolidate_near_duplicates must give byte-identical keep/drop
    decisions through the driver fast path and the distributed rounds."""
    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    pairs = _pairs_df(spark, [(3, 7), (7, 9), (2, 5), (0, 11)])
    a = sorted(
        map(tuple, consolidate_near_duplicates(docs, pairs).collect())
    )
    b = sorted(
        map(
            tuple,
            consolidate_near_duplicates(
                docs, pairs, small_graph_nodes=0
            ).collect(),
        )
    )
    assert a == b


def test_edge_cap_falls_through_to_distributed(spark, monkeypatch):
    """Small node count but an edge list past SMALL_GRAPH_EDGES must skip
    the driver collect and run the distributed rounds (the dense-clique
    guard), with identical results."""
    from crawley_spark.operators import cluster as cl

    monkeypatch.setattr(cl, "SMALL_GRAPH_EDGES", 3)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)]
    stats = {}
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            _pairs_df(spark, edges), stats=stats
        ).collect()
    }
    assert stats["mode"] == "distributed"
    assert got == _uf_components(7, edges)


def test_empty_pairs_all_singletons(spark):
    docs = spark.range(0, 5).select(F.col("id").alias("doc_id"))
    out = consolidate_near_duplicates(docs, _pairs_df(spark, [])).collect()
    assert len(out) == 5
    assert all(r["is_kept"] and r["component"] == r["doc_id"] for r in out)


def test_nonconvergence_guard_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs_df(spark, [(i, i + 1) for i in range(64)]),
                             max_iter=2, small_graph_nodes=0)


def test_batch_twin_of_streaming_keep_first(spark):
    """The consolidation is the exact batch twin of streaming keep-first on
    a transitively-closed pair set: keeper = smallest id of each component,
    everything else suppressed — same answer the stream would give if the
    docs arrived in id order and pair generation were complete."""
    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    # chain 0~1~2 plus pair 5~6: stream keeps 0 (first), drops 1 and 2
    # (each similar to a kept-or-earlier doc via the chain), keeps 5, drops 6
    pairs = _pairs_df(spark, [(0, 1), (1, 2), (5, 6)])
    out = {r["doc_id"]: r["is_kept"]
           for r in consolidate_near_duplicates(docs, pairs).collect()}
    assert out == {0: True, 1: False, 2: False, 3: True, 4: True,
                   5: True, 6: False, 7: True}


def test_minhash_pairs_to_consolidation_pipeline(spark):
    """End-to-end composition a dedup pipeline actually runs: planted
    near-dup families -> near_duplicates_minhash pairs ->
    consolidate_near_duplicates. Each family must collapse to one kept doc
    (the min id), and unrelated docs must stay kept singletons."""
    from crawley_spark.operators.dedup import near_duplicates_minhash

    # each family gets its OWN long base text (disjoint word streams) so
    # families are near-dups internally but nowhere near each other
    bases = [
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "on the warm stone wall near the old mill by the river where water "
        "runs clear and cold over the rocks all day long in the summer sun",
        "seven silver ships sailed slowly southward past stormy seas and "
        "spice islands carrying cargo of copper cloth and candles to the "
        "capital city where crowded markets traded coins for cinnamon bark",
        "under winter moonlight the mountain village lit small lanterns "
        "along frozen paths while children counted falling snowflakes and "
        "elders told ancient stories beside the crackling cedar fireplace",
    ]
    rows = []
    # families 0..2: ids (10f, 10f+1, 10f+2) share a long text + tiny tails
    for f in range(3):
        fam = f"{bases[f]} family {f} marker {'x' * f}"
        rows += [
            (10 * f, fam),
            (10 * f + 1, fam + " tail one"),
            (10 * f + 2, fam + " tail two"),
        ]
    # unrelated singletons with disjoint vocabularies
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "uno dos tres cuatro cinco seis siete ocho nueve diez once"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = near_duplicates_minhash(docs, threshold=0.6)
    out = {
        r["doc_id"]: r
        for r in consolidate_near_duplicates(docs, pairs).collect()
    }
    assert len(out) == 11
    for f in range(3):
        ids = [10 * f, 10 * f + 1, 10 * f + 2]
        comps = {out[i]["component"] for i in ids}
        assert comps == {10 * f}, (f, comps)
        assert all(out[i]["keep_id"] == 10 * f for i in ids)
        assert [out[i]["is_kept"] for i in ids] == [True, False, False]
    for i in (100, 101):
        assert out[i]["component"] == i and out[i]["is_kept"]


def test_propagate_join_exchanges_labels_only(spark):
    """The scale property of the iteration: edges are hash(u)-clustered once
    at prep (repartition + persist — InMemoryTableScan preserves the cached
    plan's outputPartitioning; localCheckpoint's LogicalRDD does NOT in this
    build), so the per-round propagate join plan adds exactly ONE new
    exchange — the label table — and the full edge set never re-shuffles.
    The cached plan's own REPARTITION_BY_COL exchange prints inside
    InMemoryRelation; only ENSURE_REQUIREMENTS exchanges are live per-round
    work, so that's what is counted."""
    raw = _pairs_df(spark, [(i, i + 1) for i in range(200)])
    edges = (
        raw.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(raw.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .dropDuplicates(["u", "v"])
        .repartition(F.col("u"))
        .persist()
    )
    try:
        edges.count()
        labels = edges.select(F.col("u").alias("id")).distinct().withColumn(
            "comp", F.col("id")
        ).localCheckpoint(eager=True)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = edges.join(labels, edges.u == labels.id)
            plan = j._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "InMemoryTableScan" in plan, plan
        # a live edges re-shuffle would be a single-key hash(u)
        # ENSURE_REQUIREMENTS exchange; the cached plan's own internal
        # exchanges (printed inside InMemoryRelation) are keyed (u, v) or
        # REPARTITION_BY_COL, so this regex matches none of them
        assert not re.search(
            r"Exchange hashpartitioning\(u#\d+L?, \d+\), ENSURE_REQUIREMENTS", plan
        ), plan
    finally:
        edges.unpersist()
