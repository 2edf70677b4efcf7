"""Link-graph analytics (operators/linkgraph.py): integer-exact PageRank
vs a pure-Python brute mirror, degree tables, host-graph aggregation, and
the big-graph path forced through the persist gate."""

import random
from collections import Counter

from pyspark.sql import functions as F

from crawley_spark.operators import linkgraph
from crawley_spark.operators.linkgraph import (
    DEFAULT_DAMPING,
    RANK_SCALE,
    degrees,
    host_graph,
    pagerank,
    prioritize_frontier,
)


def brute_pagerank(nodes, edges, iterations=3, damping=DEFAULT_DAMPING, scale=RANK_SCALE):
    """The documented update rule, straight-line Python (floor div == Spark
    `div` on the all-positive values involved)."""
    n = len(nodes)
    base = scale // n
    tel = (100 - damping) * base
    e = sorted(set(edges))
    outd = Counter(s for s, _ in e)
    rank = {v: base for v in nodes}
    for _ in range(iterations):
        mass = Counter()
        for s, d in e:
            mass[d] += rank[s] // outd[s]
        rank = {v: (tel + damping * mass[v]) // 100 for v in nodes}
    return rank


def _dfs(spark, nodes, edges):
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    return ndf, edf


class TestPageRank:
    def test_two_node_cycle_plus_dangling(self, spark):
        nodes, edges = [0, 1, 2], [(0, 1), (1, 0), (0, 2)]
        ndf, edf = _dfs(spark, nodes, edges)
        got = {r.node: r.rank for r in pagerank(ndf, edf, iterations=2).collect()}
        assert got == brute_pagerank(nodes, edges, iterations=2)
        # node 2 is dangling: it receives mass but re-emits none (dropped)
        assert got[2] > 0

    def test_random_graph_brute_parity(self, spark):
        random.seed(23)
        nodes = list(range(40))
        edges = list(
            {
                (random.randrange(40), random.randrange(40))
                for _ in range(150)
            }
        )
        edges = [(s, d) for s, d in edges if s != d]
        # duplicate some edges: operator must dedup before outdeg
        edf_rows = edges + edges[:20]
        ndf, edf = _dfs(spark, nodes, edf_rows)
        for iters in (0, 1, 3):
            got = {r.node: r.rank for r in pagerank(ndf, edf, iterations=iters).collect()}
            assert got == brute_pagerank(nodes, edges, iterations=iters), iters

    def test_driver_vs_distributed_parity(self, spark):
        # the small-graph driver replay must be bit-identical to the
        # distributed rounds (and both to the brute mirror)
        random.seed(7)
        nodes = list(range(60))
        edges = [
            (s, d)
            for s, d in {
                (random.randrange(60), random.randrange(60)) for _ in range(200)
            }
            if s != d
        ]
        ndf, edf = _dfs(spark, nodes, edges)
        st_drv, st_dist = {}, {}
        drv = {r.node: r.rank for r in pagerank(ndf, edf, stats=st_drv).collect()}
        dist = {
            r.node: r.rank
            for r in pagerank(ndf, edf, small_graph_nodes=0, stats=st_dist).collect()
        }
        assert st_drv["mode"] == "driver" and st_dist["mode"] == "distributed"
        assert drv == dist == brute_pagerank(nodes, edges)

    def test_mass_conservation_bound(self, spark):
        # total rank never exceeds SCALE (dangling mass only leaks out)
        nodes = list(range(20))
        edges = [(i, (i * 3 + 1) % 20) for i in range(20)]
        ndf, edf = _dfs(spark, nodes, edges)
        total = (
            pagerank(ndf, edf, iterations=4)
            .agg(F.sum("rank").alias("s")).collect()[0].s
        )
        assert 0 < total <= RANK_SCALE

    def test_big_graph_path_identical(self, spark, monkeypatch):
        # force the persist/repartition gate (and past the driver fast
        # path) and pin output equality
        monkeypatch.setattr(linkgraph, "BIG_GRAPH_EDGES", 1)
        nodes = list(range(30))
        edges = [(i, (i * 7 + 3) % 30) for i in range(30) if i != (i * 7 + 3) % 30]
        ndf, edf = _dfs(spark, nodes, edges)
        got = {
            r.node: r.rank
            for r in pagerank(ndf, edf, small_graph_nodes=0).collect()
        }
        assert got == brute_pagerank(nodes, edges)

    def test_rank_exchanges_carry_scalars(self, spark):
        # the per-iteration plan must exchange only (node/src, long) columns —
        # no strings, no arrays — and never range-partition
        nodes = list(range(10))
        edges = [(i, (i + 1) % 10) for i in range(10)]
        ndf, edf = _dfs(spark, nodes, edges)
        plan = (
            pagerank(ndf, edf, iterations=1, small_graph_nodes=0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "rangepartitioning" not in plan.lower()

    def test_empty_graph(self, spark):
        ndf = spark.createDataFrame([], "node long")
        edf = spark.createDataFrame([], "src long, dst long")
        assert pagerank(ndf, edf).collect() == []


class TestDegreesAndHostGraph:
    def test_degrees(self, spark):
        ndf, edf = _dfs(spark, [0, 1, 2, 3], [(0, 1), (0, 2), (1, 2), (1, 2)])
        got = {r.node: (r.out_deg, r.in_deg) for r in degrees(ndf, edf).collect()}
        assert got == {0: (2, 0), 1: (1, 1), 2: (0, 2), 3: (0, 0)}

    def test_host_graph_counts_and_self_loops(self, spark):
        rows = [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c")]
        edf = spark.createDataFrame(rows, "src_host string, dst_host string")
        got = {
            (r.src_host, r.dst_host): r.n_links for r in host_graph(edf).collect()
        }
        assert got == {("a", "b"): 2, ("b", "c"): 1}


class TestPrioritizeFrontier:
    def _frontier(self, spark):
        # hosts a (rank 900), b (rank 100), c unranked; 4 urls each
        rows = [
            (f"http://{h}/{i}", h) for h in ("a", "b", "c") for i in range(4)
        ]
        f = spark.createDataFrame(rows, "url string, host string")
        r = spark.createDataFrame([("a", 900), ("b", 100)], "host string, rank long")
        return f, r

    def test_cap_and_rank_order(self, spark):
        f, r = self._frontier(spark)
        got = prioritize_frontier(f, r, batch_size=5, per_host_cap=2).collect()
        # top 5 of the (rank desc, url) order after a 2-per-host cap:
        # a/0 a/1 (900), b/0 b/1 (100), then the first rank-0 c url
        assert [(x.url, x.rank, x.slot) for x in got] == [
            ("http://a/0", 900, 1),
            ("http://a/1", 900, 2),
            ("http://b/0", 100, 1),
            ("http://b/1", 100, 2),
            ("http://c/0", 0, 1),
        ]

    def test_unranked_host_defaults_to_zero_not_dropped(self, spark):
        f, r = self._frontier(spark)
        got = prioritize_frontier(f, r, batch_size=100, per_host_cap=10).collect()
        assert sum(1 for x in got if x.host == "c") == 4
        assert all(x.rank == 0 for x in got if x.host == "c")

    def test_salted_precap_equals_unsalted(self, spark):
        # the two-stage skew guard must never change the selected set or
        # the slot numbers (structural: every true top-cap url survives
        # its own salt bucket's top-cap)
        rows = [
            (f"http://mega/{i:04d}", "mega") for i in range(300)
        ] + [(f"http://b/{i}", "b") for i in range(5)]
        f = spark.createDataFrame(rows, "url string, host string")
        r = spark.createDataFrame([("mega", 10), ("b", 700)], "host string, rank long")
        kw = dict(batch_size=20, per_host_cap=12)
        salted = prioritize_frontier(f, r, salt_buckets=64, **kw).collect()
        plain = prioritize_frontier(f, r, salt_buckets=1, **kw).collect()
        assert [tuple(x) for x in salted] == [tuple(x) for x in plain]
        # b's 5 urls (rank 700) lead, then mega's 12-cap fills the batch
        assert [x.host for x in salted][:5] == ["b"] * 5
        assert sum(1 for x in salted if x.host == "mega") == 12

    def test_plan_is_topk_not_global_sort(self, spark):
        # the batch cut must be TakeOrderedAndProject (two-stage top-k);
        # a single-partition global sort would serialize a 10^10 frontier
        f, r = self._frontier(spark)
        plan = (
            prioritize_frontier(f, r, batch_size=5, per_host_cap=2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "SinglePartition" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_hits_star_fixture(spark):
    """One hub pointing at three leaves: all hub mass on the center, all
    authority mass split across leaves; center authority 0, leaf hubs 0."""
    from crawley_spark.operators.linkgraph import HITS_SCALE, hits

    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src long, dst long")
    got = {r["node"]: (r["authority"], r["hub"]) for r in hits(nodes, edges).collect()}
    third = HITS_SCALE // 3
    assert got[0] == (0, HITS_SCALE)
    assert got[1] == got[2] == got[3] == (third, 0)


def test_hits_driver_distributed_parity_and_mirror(spark):
    import random

    from crawley_spark.operators.linkgraph import HITS_SCALE, _driver_hits, hits

    rng = random.Random(21)
    node_ids = list(range(40))
    edge_rows = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(120)})
    edge_rows = [(s, d) for s, d in edge_rows if s != d]
    nodes = spark.createDataFrame([(v,) for v in node_ids], "node long")
    edges = spark.createDataFrame(edge_rows, "src long, dst long")
    a, h = _driver_hits(node_ids, edge_rows, 3, HITS_SCALE)
    exp = {v: (a[v], h[v]) for v in node_ids}
    for kw in ({}, {"small_graph_nodes": 0}):
        got = {r["node"]: (r["authority"], r["hub"]) for r in hits(nodes, edges, **kw).collect()}
        assert got == exp
    # renormalization invariant: each vector sums to SCALE minus trunc slack
    assert HITS_SCALE - 40 <= sum(v[0] for v in exp.values()) <= HITS_SCALE
    assert HITS_SCALE - 40 <= sum(v[1] for v in exp.values()) <= HITS_SCALE


def test_hits_no_edges_and_validation(spark):
    import pytest

    from crawley_spark.operators.linkgraph import hits

    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    e0 = spark.createDataFrame([], "src long, dst long")
    got = {r["node"]: (r["authority"], r["hub"])
           for r in hits(nodes, e0, small_graph_nodes=0).collect()}
    assert got == {0: (0, 0), 1: (0, 0)}
    with pytest.raises(ValueError):
        hits(nodes, e0, iterations=0)
