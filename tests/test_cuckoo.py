"""Cuckoo-filter seen-prefilter (operators/cuckoo.py) — the north_rule
"Bloom/cuckoo" alternative. The load-bearing property is the same as
Bloom's: FALSE NEGATIVES ARE IMPOSSIBLE (a "definitely new" answer must be
true — false positives only cost an exact-join lookup)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawley_spark.config import CrawlConfig
from crawley_spark.operators import cuckoo as ck

from .conftest import pages_to_df
from .scenarios import SCENARIOS


def _hashes(n, seed):
    rng = np.random.RandomState(seed)
    h1 = rng.randint(0, 2**62, n).astype(np.uint64)
    h2 = rng.randint(0, 2**62, n).astype(np.uint64)
    return h1, h2


def _contains(blob, h1, h2):
    table, stash, nb = ck._deserialize(bytes(blob))
    t = table.reshape(nb, ck.SLOTS)
    fp = ck._fp_of(h1)
    i1 = ck._i1_of(h2, nb)
    alt = ck._alt_of(i1, fp, nb)
    hit = (t[i1] == fp[:, None]).any(axis=1) | (t[alt] == fp[:, None]).any(axis=1)
    for si, sf in stash:
        hit |= (fp == np.uint16(sf)) & ((i1 == si) | (alt == si))
    return hit


def test_no_false_negatives_and_low_fp():
    h1, h2 = _hashes(20_000, 1)
    blob = ck._build_from_hashes(h1, h2)
    assert _contains(blob, h1, h2).all(), "false negative: inserted key reported new"
    a1, a2 = _hashes(20_000, 2)
    fp_rate = _contains(blob, a1, a2).mean()
    # 8 slots × 16-bit fingerprints ⇒ ~8/2^16 ≈ 0.012% expected
    assert fp_rate < 0.01, fp_rate


def test_overflow_goes_to_stash_never_dropped(monkeypatch):
    # 64 buckets × 4 slots = 256 slots; 1000 keys vastly overflow — every
    # key must still be found (stash fallback), at any load factor
    monkeypatch.setenv("CRAWLEY_CUCKOO_BUCKETS_PER_SHARD", "64")
    h1, h2 = _hashes(1000, 3)
    blob = ck._build_from_hashes(h1, h2)
    table, stash, nb = ck._deserialize(blob)
    assert nb == 64 and len(stash) > 0
    assert _contains(blob, h1, h2).all()


def test_merge_reinserts_all_fingerprints():
    h1, h2 = _hashes(8000, 4)
    a = ck._build_from_hashes(h1[:4000], h2[:4000])
    b = ck._build_from_hashes(h1[4000:], h2[4000:])
    merged = ck.merge_bitmaps([(0, a), (0, b)])
    blob = merged[0]
    assert _contains(blob, h1, h2).all()
    # round-trips .tobytes() like the Bloom dict the engine re-merges
    again = ck.merge_bitmaps([(0, blob.tobytes())])
    assert _contains(again[0], h1, h2).all()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(1, 2500),
        seed=st.integers(0, 2**31 - 1),
        nb_pow=st.integers(4, 12),
        n_chunks=st.integers(1, 4),
    )
    def test_cuckoo_no_false_negative_fuzz(n, seed, nb_pow, n_chunks):
        """Property: for ANY key set, table size (incl. far-overloaded), and
        any split into separately-built-then-merged shards, every inserted
        key tests maybe-seen. This is the one invariant the engine's
        correctness rests on."""
        import os as _os

        prev = _os.environ.get("CRAWLEY_CUCKOO_BUCKETS_PER_SHARD")
        _os.environ["CRAWLEY_CUCKOO_BUCKETS_PER_SHARD"] = str(1 << nb_pow)
        try:
            h1, h2 = _hashes(n, seed)
            bounds = [round(i * n / n_chunks) for i in range(n_chunks + 1)]
            blobs = [
                (0, ck._build_from_hashes(h1[a:b], h2[a:b]))
                for a, b in zip(bounds, bounds[1:])
                if b > a
            ]
            merged = ck.merge_bitmaps(blobs)[0]
            assert _contains(merged, h1, h2).all()
        finally:
            if prev is None:
                _os.environ.pop("CRAWLEY_CUCKOO_BUCKETS_PER_SHARD", None)
            else:
                _os.environ["CRAWLEY_CUCKOO_BUCKETS_PER_SHARD"] = prev

except ImportError:  # pragma: no cover - hypothesis is in the base image
    pass


def test_bloom_bytes_rejected_loudly():
    with pytest.raises(ValueError, match="magic"):
        ck._deserialize(b"\x00" * 64)


def test_cuckoo_bytes_rejected_by_bloom_backend():
    """Mis-resuming cuckoo-written state under the Bloom backend must fail
    loudly, not silently OR garbage into a bitmap (false negatives)."""
    from crawley_spark.operators import bloom

    h1, h2 = _hashes(10, 5)
    blob = ck._build_from_hashes(h1, h2)
    with pytest.raises(ValueError, match="CKF1"):
        bloom.merge_bitmaps([(0, blob)])


def test_spark_build_matches_local(spark):
    from crawley_spark.sources.state import with_bucket

    rows = [("run0", f"h0.test/p{i}") for i in range(500)]
    df = ck.with_bloom_hashes(
        with_bucket(spark.createDataFrame(rows, "run_id string, url_key string"))
    )
    shards = {r["bucket"]: bytes(r["bitmap"]) for r in ck.build_shards(df).collect()}
    local = dict(ck.build_shards_local(rows))
    assert set(shards) == set(local)
    # membership equivalence for every inserted key, via the real prefilter
    bc = spark.sparkContext.broadcast(ck.merge_bitmaps(list(shards.items())))
    out = ck.prefilter(df, bc).collect()
    assert all(r["_maybe_seen"] for r in out), "distributed shard lost a key"
    bc2 = spark.sparkContext.broadcast(ck.merge_bitmaps(list(local.items())))
    out2 = ck.prefilter(df, bc2).collect()
    assert all(r["_maybe_seen"] for r in out2), "driver-built shard lost a key"


@pytest.mark.parametrize("name", ["deep_bfs", "subdomains"])
def test_engine_parity_with_cuckoo_filter(spark, monkeypatch, name):
    """The full engine, cuckoo prefilter forced active from iteration 1
    (bloom_min_seen=0), must stay byte-exact vs the reference interpreter."""
    from crawley_spark import interp
    from crawley_spark.engine import crawl as spark_crawl

    monkeypatch.setenv("CRAWLEY_SEEN_FILTER", "cuckoo")
    pages, seed, cfg = SCENARIOS[name]
    want = interp.crawl(pages, seed, cfg)
    report = spark_crawl(
        spark, pages_to_df(spark, pages), seed, cfg,
        driver_wave_rows=0, bloom_min_seen=0,
    )
    got_results = report.result_urls("run0")
    got_seen = {r["url_key"]: r["url"] for r in report.seen("run0").collect()}
    report.state.cleanup()
    assert got_results == want.results
    assert got_seen == want.seen
