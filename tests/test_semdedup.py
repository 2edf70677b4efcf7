"""SemDeDup (operators/semdedup.py) — integer k-means, within-cluster cosine
pairs, and the keep-most-atypical consolidation. Parity is forced against a
straight-line pure-Python mirror of the documented integer rules (seeded
random vectors), both impls ("sql" JVM HOFs / "arrow" numpy) are pinned
row-for-row identical, and the assignment stage's zero-shuffle plan shape is
pinned."""

import random

import pytest
from pyspark.sql import functions as F

from crawley_spark.operators.semdedup import (
    QUANT_SCALE,
    kmeans_integer,
    quantize_embeddings,
    semantic_duplicate_pairs,
    semdedup,
)


def _mirror_kmeans(vecs: dict, k: int, iterations: int):
    """Straight-line Python replay of the documented rules: seeds = k
    smallest ids, argmin with (dist, cid) tie-break, trunc-div update,
    empty-cluster carryover, final assignment against the last centroids."""
    ids = sorted(vecs)
    cents = [list(vecs[i]) for i in ids[:k]]
    dim = len(cents[0])

    def dist(q, c):
        return sum((a - b) * (a - b) for a, b in zip(q, c))

    def assign():
        out = {}
        for i in ids:
            ds = [dist(vecs[i], c) for c in cents]
            m = min(ds)
            out[i] = (ds.index(m), m)
        return out

    for _ in range(iterations):
        a = assign()
        sums = {}
        for i, (cid, _) in a.items():
            s = sums.setdefault(cid, [[0, 0] for _ in range(dim)])
            for d, v in enumerate(vecs[i]):
                s[d][0] += v
                s[d][1] += 1
        for cid, s in sums.items():
            cents[cid] = [
                (sv // n if sv >= 0 else -((-sv) // n)) for sv, n in s
            ]
    return assign(), cents


def _rand_vecs(n, dim, seed, lo=-500_000, hi=500_000):
    rng = random.Random(seed)
    return {i: [rng.randint(lo, hi) for _ in range(dim)] for i in range(n)}


@pytest.mark.parametrize("impl", ["sql", "arrow"])
def test_kmeans_brute_parity(spark, impl):
    vecs = _rand_vecs(40, 8, seed=7)
    pts = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "id long, q array<long>"
    )
    expect, cents = _mirror_kmeans(vecs, k=5, iterations=3)
    stats = {}
    got = {
        r["id"]: (r["cluster"], r["dist_q"])
        for r in kmeans_integer(pts, k=5, iterations=3, impl=impl, stats=stats).collect()
    }
    assert got == expect
    assert stats["centroids"] == cents


def test_kmeans_impl_parity_and_negative_sums(spark):
    # all-negative coordinates force the trunc-div sign path in the update
    vecs = _rand_vecs(30, 6, seed=11, lo=-400_000, hi=-1)
    pts = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "id long, q array<long>"
    )
    a = sorted(map(tuple, kmeans_integer(pts, k=4, iterations=2, impl="sql").collect()))
    b = sorted(map(tuple, kmeans_integer(pts, k=4, iterations=2, impl="arrow").collect()))
    expect, _ = _mirror_kmeans(vecs, k=4, iterations=2)
    assert a == b
    assert {t[0]: (t[2], t[3]) for t in a} == expect


def test_kmeans_tie_break_min_cid(spark):
    # two identical seed centroids: every point is equidistant to both and
    # must land in cluster 0 (array_position / np.argmin first-match rule)
    rows = [(0, [10, 10]), (1, [10, 10]), (2, [40, 0]), (3, [44, 2])]
    pts = spark.createDataFrame(rows, "id long, q array<long>")
    for impl in ("sql", "arrow"):
        got = {r["id"]: r["cluster"] for r in
               kmeans_integer(pts, k=2, iterations=0, impl=impl).collect()}
        assert got[0] == 0 and got[1] == 0


def test_kmeans_empty_cluster_carryover(spark):
    # seed 1 = an outlier that instantly loses all members: after one
    # update it must keep its seed coordinates (carryover), pinned via the
    # stats centroids
    rows = [(0, [0, 0]), (1, [1_000_000, 1_000_000]), (2, [2, 2]), (3, [4, 4])]
    pts = spark.createDataFrame(rows, "id long, q array<long>")
    expect, cents = _mirror_kmeans({i: v for i, v in rows}, k=2, iterations=2)
    stats = {}
    got = {
        r["id"]: (r["cluster"], r["dist_q"])
        for r in kmeans_integer(pts, k=2, iterations=2, stats=stats).collect()
    }
    assert got == expect
    assert stats["centroids"] == cents


def test_assignment_zero_shuffle_plan(spark):
    from crawley_spark.operators.semdedup import _assign_sql

    pts = spark.createDataFrame([(0, [1, 2]), (1, [3, 4])], "id long, q array<long>")
    plan = _assign_sql(pts, [[0, 0], [5, 5]])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # centroid literals fold into a projection


def test_pair_threshold_exact_boundary(spark):
    # cos(a, b) = 0.6 exactly (3-4-5 shaped): threshold 600 includes it,
    # 601 excludes it — the DECIMAL comparison is exact, not float-rounded
    a = [3, 4]
    b = [4, 3]  # dot = 24, |a|²=25, |b|²=25 → cos = 24/25 = 0.96
    rows = [(0, a, 0, 0), (1, b, 0, 0)]
    df = spark.createDataFrame(rows, "id long, q array<long>, cluster int, dist_q long")
    got = semantic_duplicate_pairs(df, threshold_milli=960).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(0, 1)]
    assert semantic_duplicate_pairs(df, threshold_milli=961).count() == 0


def test_pairs_same_cluster_only_and_negative_dot(spark):
    rows = [
        (0, [1, 0], 0, 0),
        (1, [1, 0], 1, 0),   # identical vector, different cluster: no pair
        (2, [-1, 0], 0, 0),  # opposite direction: dot < 0, no pair
    ]
    df = spark.createDataFrame(rows, "id long, q array<long>, cluster int, dist_q long")
    assert semantic_duplicate_pairs(df, threshold_milli=900).count() == 0


def test_semdedup_keeper_rules(spark):
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < 40)
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    )
    exact = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    cand = emb.unionByName(exact)
    out = {r["id"]: r for r in semdedup(cand, k=4, iterations=1, threshold_milli=990).collect()}
    assert len(out) == 45
    for i in range(5):
        # exact copy: same dist to centroid → min-id tiebreak keeps the base
        assert out[i]["is_kept"] and not out[i + 1000]["is_kept"]
        assert out[i + 1000]["keep_id"] == i
        assert out[i]["component"] == out[i + 1000]["component"] == i
    # untouched vectors are their own kept singletons
    singles = [r for i, r in out.items() if 5 <= i < 40]
    assert all(r["is_kept"] and r["keep_id"] == r["id"] for r in singles)


def test_semdedup_atypical_keeper_beats_min_id(spark):
    # planted pair where the HIGHER id is farther from the centroid: the
    # paper's rule must keep it (score wins over id)
    rows = [
        (0, [100.0, 0.0]),
        (1, [104.0, 0.0]),     # near-dup of 0, farther from the cluster mean
        (2, [98.0, 0.0]),      # pulls the centroid toward low ids
        (3, [5000.0, 5000.0]),  # second cluster seed fodder
    ]
    df = spark.createDataFrame(rows, "id long, q array<double>")
    emb = df.select(
        "id", F.transform("q", lambda x: x / QUANT_SCALE).alias("embedding")
    )
    out = {r["id"]: r for r in
           semdedup(emb, id_col="id", k=2, iterations=2, threshold_milli=999).collect()}
    grp = [r for r in out.values() if r["component"] == out[0]["component"]]
    kept = [r for r in grp if r["is_kept"]]
    assert len(kept) == 1
    far = max(grp, key=lambda r: (r["dist_q"], -r["id"]))
    assert kept[0]["id"] == far["id"]


def test_validation_errors(spark):
    pts = spark.createDataFrame([(0, [1])], "id long, q array<long>")
    with pytest.raises(ValueError):
        kmeans_integer(pts, k=0)
    with pytest.raises(ValueError):
        kmeans_integer(pts, impl="nope")
    with pytest.raises(ValueError):
        semantic_duplicate_pairs(pts.withColumn("cluster", F.lit(0)), threshold_milli=0)
    empty = pts.filter("id < 0")
    with pytest.raises(ValueError):
        kmeans_integer(empty, k=2)


def test_quantize_round_half_away(spark):
    df = spark.createDataFrame(
        [(0, [0.0000005, -0.0000005, 0.0000014])], "vec_id long, embedding array<double>"
    )
    q = quantize_embeddings(df).collect()[0]["q"]
    # 0.5 → 1 (HALF_UP), -0.5 → -1 (away from zero), 1.4 → 1
    assert q == [1, -1, 1]
