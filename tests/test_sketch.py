"""Bounded-memory corpus statistics (operators/sketch.py): count-min sketch,
HyperLogLog, and exact no-global-sort quantiles — guarantees, Python-replay
parity, merge properties, and the plan pins the module docstring promises
(bounded sketch size, no SinglePartition window in exact_quantiles)."""

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from crawley_spark.operators.sketch import (
    cms_lookup,
    count_min_sketch,
    exact_quantiles,
    hll_estimate,
    hll_registers,
)

LOW60_DEN = 1 << 60


def _low60(s: str) -> int:
    """Driver-side replica of dedup.md5_low60 (low 60 bits of the md5
    digest interpreted little-endian — DuckDB's md5_number residue)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest(), "little") % LOW60_DEN


def _toks_df(spark, words):
    return spark.createDataFrame([(w,) for w in words], "tok string")


WORDS = (
    ["alpha"] * 50
    + ["beta"] * 20
    + ["gamma"] * 7
    + ["delta"] * 3
    + [f"rare{i}" for i in range(40)]
)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_matches_python_replay(spark):
    depth, width, salt = 3, 64, "t-cms"
    sketch = dict(
        ((r.row_i, r.col), r.cnt)
        for r in count_min_sketch(
            _toks_df(spark, WORDS), "tok", depth=depth, width=width, salt=salt
        ).collect()
    )
    expected = {}
    for w in WORDS:
        for i in range(depth):
            cell = (i, _low60(f"{salt}|{i}|{w}") % width)
            expected[cell] = expected.get(cell, 0) + 1
    assert sketch == expected


def test_cms_bounded_and_partition_invariant(spark):
    depth, width = 4, 32
    df = _toks_df(spark, WORDS)
    a = count_min_sketch(df, "tok", depth=depth, width=width).collect()
    b = count_min_sketch(df.repartition(7), "tok", depth=depth, width=width).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # the finished sketch is at most depth x width rows regardless of input
    assert len(a) <= depth * width


def test_cms_lookup_guarantee_and_exactness(spark):
    """est >= true always; with width >> vocabulary the estimate is exact."""
    df = _toks_df(spark, WORDS)
    true = {w: WORDS.count(w) for w in set(WORDS)}
    probes = _toks_df(spark, list(set(WORDS)) + ["nevertoken"])

    wide = count_min_sketch(df, "tok", depth=4, width=4096)
    est_wide = dict(
        (r.tok, r.est)
        for r in cms_lookup(wide, probes, "tok", depth=4, width=4096).collect()
    )
    assert est_wide.pop("nevertoken") == 0
    assert est_wide == true

    narrow = count_min_sketch(df, "tok", depth=4, width=16)
    est_narrow = dict(
        (r.tok, r.est)
        for r in cms_lookup(narrow, probes, "tok", depth=4, width=16).collect()
    )
    assert all(est_narrow[w] >= c for w, c in true.items())
    # width 16 < 44 types: collisions must actually occur
    assert any(est_narrow[w] > c for w, c in true.items())


def test_cms_duplicate_probes_collapse(spark):
    df = _toks_df(spark, WORDS)
    sketch = count_min_sketch(df, "tok", depth=2, width=128)
    probes = _toks_df(spark, ["alpha", "alpha", "alpha"])
    rows = cms_lookup(sketch, probes, "tok", depth=2, width=128).collect()
    assert len(rows) == 1 and rows[0].tok == "alpha"


def test_cms_validation(spark):
    df = _toks_df(spark, ["x"])
    with pytest.raises(ValueError):
        count_min_sketch(df, "tok", depth=0)
    with pytest.raises(ValueError):
        count_min_sketch(df, "tok", width=0)


def test_cms_plan_broadcasts_sketch(spark):
    """The bounded sketch side of the lookup join must broadcast — probes
    are never shuffled on content."""
    df = _toks_df(spark, WORDS)
    sketch = count_min_sketch(df, "tok", depth=2, width=64)
    plan = cms_lookup(sketch, df, "tok", depth=2, width=64)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _py_registers(keys, p, salt):
    m, w = 1 << p, 60 - p
    regs = {}
    for k in keys:
        h = _low60(f"{salt}|{k}")
        b, v = h % m, h >> p
        rho = w + 1 if v == 0 else w + 1 - v.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_hll_registers_match_python_replay(spark):
    keys = [f"https://h{i % 13}.test/p{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = dict(
        (r.bucket, r.register)
        for r in hll_registers(df, "key", p=7, salt="t-hll").collect()
    )
    assert got == _py_registers(keys, 7, "t-hll")


def test_hll_duplicates_do_not_move_registers(spark):
    keys = [f"k{i}" for i in range(300)]
    one = spark.createDataFrame([(k,) for k in keys], "key string")
    tripled = one.unionByName(one).unionByName(one)
    a = sorted(map(tuple, hll_registers(one, "key", p=8).collect()))
    b = sorted(map(tuple, hll_registers(tripled, "key", p=8).collect()))
    assert a == b


def test_hll_merge_is_register_max(spark):
    """sketch(A ∪ B) == groupBy bucket max over sketch(A) + sketch(B) —
    the property that makes HLL the mergeable distinct-count primitive."""
    a_keys = [f"a{i}" for i in range(200)]
    b_keys = [f"b{i}" for i in range(150)] + a_keys[:50]
    a = spark.createDataFrame([(k,) for k in a_keys], "key string")
    b = spark.createDataFrame([(k,) for k in b_keys], "key string")
    union = hll_registers(a.unionByName(b), "key", p=8).collect()
    merged = (
        hll_registers(a, "key", p=8)
        .unionByName(hll_registers(b, "key", p=8))
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
        .collect()
    )
    assert sorted(map(tuple, union)) == sorted(map(tuple, merged))


def test_hll_estimate_matches_python_formula(spark):
    p = 8
    keys = [f"url{i}" for i in range(1000)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    regs = hll_registers(df, "key", p=p)
    row = hll_estimate(regs, p=p).first()
    m, k = 1 << p, 61 - p
    py_regs = _py_registers(keys, p, "hll-v1")
    n_zero = m - len(py_regs)
    z_scaled = n_zero * (1 << k) + sum(1 << (k - r) for r in py_regs.values())
    assert (row.m, row.n_zero, row.z_scaled) == (m, n_zero, z_scaled)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * float(m) * m * float(1 << k) / z_scaled
    est = m * math.log(m / n_zero) if (raw <= 2.5 * m and n_zero > 0) else raw
    assert row.est == math.floor(est + 0.5)
    # sanity: within 3 sigma of the published 1.04/sqrt(m) standard error
    # (m=256 -> 6.5%; the exactness claim is the formula replay above)
    assert abs(row.est - 1000) / 1000 < 3 * 1.04 / math.sqrt(m)


def test_hll_estimate_linear_counting_regime(spark):
    """Tiny cardinality (n << m) must take the linear-counting branch and
    land very close to exact."""
    df = spark.createDataFrame([(f"k{i}",) for i in range(10)], "key string")
    row = hll_estimate(hll_registers(df, "key", p=8), p=8).first()
    assert row.n_zero > 0
    assert abs(row.est - 10) <= 1


def test_hll_validation(spark):
    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError):
        hll_registers(df, "key", p=3)
    with pytest.raises(ValueError):
        hll_estimate(hll_registers(df, "key", p=8), p=6)


# ---------------------------------------------------------------------------
# exact quantiles
# ---------------------------------------------------------------------------


def _py_quantiles(vals, probs_milli):
    s = sorted(vals)
    n = len(s)
    return {q: s[(n - 1) * q // 1000] for q in probs_milli}


def test_exact_quantiles_match_sorted_positions(spark):
    rng = random.Random(17)
    vals = [rng.randrange(-(10**12), 10**12) for _ in range(2000)]
    # duplicates too — ties must still pick the value at position k
    vals += vals[:300]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    probs = [0, 10, 250, 500, 750, 990, 1000]
    got = {
        r.p_milli: (r.k, r.n, r.value)
        for r in exact_quantiles(df, "x", probs, max_buckets=64).collect()
    }
    want = _py_quantiles(vals, probs)
    n = len(vals)
    assert set(got) == set(probs)
    for q in probs:
        k, rn, v = got[q]
        assert (k, rn) == ((n - 1) * q // 1000 + 1, n)
        assert v == want[q]
    assert got[0][2] == min(vals) and got[1000][2] == max(vals)


def test_exact_quantiles_narrow_range_and_single_value(spark):
    df = spark.createDataFrame([(5,)] * 40, "x long")
    rows = exact_quantiles(df, "x", [0, 500, 1000]).collect()
    assert {r.value for r in rows} == {5}
    two = spark.createDataFrame([(1,), (2,)], "x long")
    got = {
        r.p_milli: r.value
        for r in exact_quantiles(two, "x", [0, 499, 500, 1000]).collect()
    }
    # k = (n-1)*p div 1000 + 1 (the quantile_disc position): p=500 over
    # n=2 lands on k=1, i.e. the LOWER value — the documented contract
    assert got == {0: 1, 499: 1, 500: 1, 1000: 2}


def test_exact_quantiles_empty_and_validation(spark):
    df = spark.createDataFrame([], "x long")
    assert exact_quantiles(df, "x", [500]).count() == 0
    nonempty = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        exact_quantiles(nonempty, "x", [])
    with pytest.raises(ValueError):
        exact_quantiles(nonempty, "x", [1001])


def test_exact_quantiles_plan_no_single_partition(spark):
    """The docstring promise: the boundary-bucket window is partitioned by
    bucket, so the plan NEVER contains a SinglePartition exchange (the
    global-sort anti-pattern this operator exists to avoid)."""
    rng = random.Random(3)
    df = spark.createDataFrame(
        [(rng.randrange(10**9),) for _ in range(500)], "x long"
    )
    out = exact_quantiles(df, "x", [250, 500, 750], max_buckets=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "Window" in plan
