"""allocate_crawl_budget — largest-remainder (Hamilton) budget allocation:
brute-force parity vs a straight-line Python mirror, conservation, edge
paths (zero / over-budget / K==0), tie determinism, forced boundary-bucket
path, and the no-global-sort plan pin."""

import pytest

from tests.conftest import *  # noqa: F401,F403  (spark fixture)


def brute_hamilton(counts: dict, budget: int) -> dict:
    """Reference allocation: base = floor(B*c/total), K leftover slots to
    the largest remainders, ties by host name ascending."""
    total = sum(counts.values())
    if total == 0 or budget == 0:
        return {h: 0 for h in counts}
    if budget >= total:
        return dict(counts)
    base = {h: (budget * c) // total for h, c in counts.items()}
    rem = {h: (budget * c) % total for h, c in counts.items()}
    k = budget - sum(base.values())
    order = sorted(counts, key=lambda h: (-rem[h], h))
    for h in order[:k]:
        base[h] += 1
    return base


def _run(spark, counts, budget, **kw):
    from crawley_spark.operators.budget import allocate_crawl_budget

    df = spark.createDataFrame(
        [(h, c) for h, c in counts.items()], "host string, n_frontier long"
    )
    return {
        r["host"]: r["quota"] for r in allocate_crawl_budget(df, budget, **kw).collect()
    }


def test_brute_parity_random(spark):
    import random

    rng = random.Random(42)
    for trial in range(8):
        n_hosts = rng.randint(1, 40)
        counts = {f"h{i:03d}": rng.randint(1, 50) for i in range(n_hosts)}
        total = sum(counts.values())
        for budget in {0, 1, total // 3, total - 1, total, total + 5}:
            got = _run(spark, counts, budget, n_buckets=rng.choice([1, 4, 1024]))
            want = brute_hamilton(counts, budget)
            assert got == want, (trial, budget, got, want)
            assert sum(got.values()) == min(budget, total)


def test_tie_determinism(spark):
    # equal counts => equal remainders: the degenerate all-one-bucket case;
    # leftover slots go to the alphabetically-first hosts
    counts = {f"h{i}": 10 for i in range(7)}  # total 70
    got = _run(spark, counts, budget=24)  # base 3 each (21), K=3
    want = brute_hamilton(counts, 24)
    assert got == want
    assert sum(1 for q in got.values() if q == 4) == 3
    assert {h for h, q in got.items() if q == 4} == {"h0", "h1", "h2"}


def test_k_zero_and_edges(spark):
    counts = {"a": 4, "b": 4}  # budget 4: base 2+2, K=0
    assert _run(spark, counts, 4) == {"a": 2, "b": 2}
    assert _run(spark, counts, 0) == {"a": 0, "b": 0}
    assert _run(spark, counts, 8) == {"a": 4, "b": 4}
    assert _run(spark, counts, 100) == {"a": 4, "b": 4}
    with pytest.raises(ValueError):
        _run(spark, counts, -1)


def test_zero_total(spark):
    assert _run(spark, {"a": 0, "b": 0}, 5) == {"a": 0, "b": 0}


def test_boundary_bucket_forced(spark):
    # n_buckets=1 puts every remainder in ONE bucket, forcing the whole
    # allocation through the ranked-boundary path
    import random

    rng = random.Random(7)
    counts = {f"h{i:02d}": rng.randint(1, 30) for i in range(25)}
    total = sum(counts.values())
    budget = total // 2 + 1
    assert _run(spark, counts, budget, n_buckets=1) == brute_hamilton(counts, budget)


def test_no_global_sort_plan(spark):
    """The boundary rank window partitions by the bucket key — never a
    SinglePartition exchange (the global sort the two-pass scheme avoids)."""
    from crawley_spark.operators.budget import allocate_crawl_budget

    df = spark.createDataFrame(
        [(f"h{i}", (i * 13) % 29 + 1) for i in range(40)],
        "host string, n_frontier long",
    )
    out = allocate_crawl_budget(df, budget=200)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
