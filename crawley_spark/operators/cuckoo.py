"""Partitioned cuckoo-filter shards for the URL-seen prefilter — the
"/cuckoo" alternative of north_rule's "partitioned Bloom/cuckoo URL-seen
filter". Same module contract as :mod:`crawley_spark.operators.bloom`
(``with_bloom_hashes`` / ``build_shards`` / ``build_shards_local`` /
``merge_bitmaps`` / ``prefilter``), selected per crawl via
``CRAWLEY_SEEN_FILTER=cuckoo`` (engine.py resolver). The choice must stay
constant for a crawl's lifetime — shards of the two filters are not
byte-compatible (cuckoo shards carry a ``CKF1`` magic and fail loudly on a
Bloom bitmap; do not flip the env between resume runs).

Partial-key cuckoo filter (Fan et al., CoNEXT'14 public design): per seen
bucket a table of ``nb`` (power of two) buckets × 4 slots × 16-bit
fingerprints. ``fp = h1 % 65535 + 1`` (0 = empty slot), primary index
``i1 = h2 % nb``, alternate ``i2 = i1 XOR (fp · 0x5bd1e995) mod nb`` —
relocatable from the stored fingerprint alone, which is what makes shard
*merging* (re-inserting every occupied slot) possible without the keys.

Correctness contract is the same as Bloom's: the filter answers
definitely-new / maybe-seen, and **false negatives are structurally
impossible** — an inserted fingerprint always resides in one of its two
buckets or in the shard's overflow stash (evictions exceeding MAX_KICKS
append to the stash instead of dropping; membership checks the stash too),
so "not found" really means never-inserted. False positives (≈ 8/2¹⁶ +
stash collisions) only send a row to the exact anti-join, never change
results. vs Bloom at equal memory: better FP rate at high load and
deletability (unused here — seen never shrinks); cost: insertion is a
sequential per-key loop (Bloom's build is pure vectorized OR), so Bloom
remains the default build-throughput choice and cuckoo the FP/occupancy
choice.

Lookup stays fully vectorized (two gathers + compares per batch);
``_bh1``/``_bh2`` are the same two JVM-computed xxhash64 columns Bloom
uses, so the engine's hash-projection step is filter-agnostic.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame

from ..kernels.xxh import xxh64
from ..sources.state import SEEN_BUCKETS
from .bloom import BLOOM_SCHEMA, with_bloom_hashes  # noqa: F401  (shared contract)

# 2^15 buckets × 4 slots × 2 B = 256 KiB/shard — same footprint as the
# default Bloom shard; holds ~124k keys at 95% load. Raise/lower together
# with SEEN_BUCKETS like BLOOM_BITS_PER_BUCKET.
CUCKOO_BUCKETS_PER_SHARD = int(os.environ.get("CRAWLEY_CUCKOO_BUCKETS_PER_SHARD", 1 << 15))
SLOTS = 4
MAX_KICKS = 500
_MAGIC = b"CKF1"
_FP_MULT = np.uint64(0x5BD1E995)


def _nb() -> int:
    nb = int(os.environ.get("CRAWLEY_CUCKOO_BUCKETS_PER_SHARD", CUCKOO_BUCKETS_PER_SHARD))
    if nb & (nb - 1):
        raise ValueError(f"cuckoo bucket count must be a power of two, got {nb}")
    return nb


def _fp_of(h1: np.ndarray) -> np.ndarray:
    return ((h1 % np.uint64(65535)) + np.uint64(1)).astype(np.uint16)


def _i1_of(h2: np.ndarray, nb: int) -> np.ndarray:
    return (h2 % np.uint64(nb)).astype(np.int64)


def _alt_of(i: np.ndarray, fp: np.ndarray, nb: int) -> np.ndarray:
    return ((i.astype(np.uint64) ^ (fp.astype(np.uint64) * _FP_MULT)) % np.uint64(nb)).astype(
        np.int64
    )


def _insert_all(table: np.ndarray, stash: list, i1: np.ndarray, fp: np.ndarray, nb: int) -> None:
    """Sequential cuckoo insertion with deterministic eviction (victim slot
    cycles with the kick counter — no RNG, reproducible shards for a given
    insertion order). Overflow goes to the stash, never dropped."""
    t = table.reshape(nb, SLOTS)
    for k in range(len(fp)):
        f = fp[k]
        i = int(i1[k])
        j = int(_alt_of(np.int64(i), f, nb))
        row_i, row_j = t[i], t[j]
        if (row_i == f).any() or (row_j == f).any():
            continue  # already present (same fp at one of its buckets)
        e = np.flatnonzero(row_i == 0)
        if len(e):
            row_i[e[0]] = f
            continue
        e = np.flatnonzero(row_j == 0)
        if len(e):
            row_j[e[0]] = f
            continue
        # evict: relocate victims between THEIR two buckets
        cur_i, cur_f = j, np.uint16(f)
        placed = False
        for kick in range(MAX_KICKS):
            slot = kick % SLOTS
            victim = t[cur_i, slot]
            t[cur_i, slot] = cur_f
            cur_f = victim
            cur_i = int(_alt_of(np.int64(cur_i), cur_f, nb))
            e = np.flatnonzero(t[cur_i] == 0)
            if len(e):
                t[cur_i, e[0]] = cur_f
                placed = True
                break
        if not placed:
            stash.append((cur_i, int(cur_f)))


def _serialize(table: np.ndarray, stash: list, nb: int) -> bytes:
    head = _MAGIC + np.array([nb, len(stash)], dtype="<u4").tobytes()
    sb = np.array([x for pair in stash for x in pair], dtype="<u4").tobytes()
    return head + table.astype("<u2").tobytes() + sb


def _deserialize(data: bytes):
    if data[:4] != _MAGIC:
        raise ValueError(
            "not a cuckoo shard (wrong magic) — was this state written with "
            "CRAWLEY_SEEN_FILTER=bloom? The filter choice must not change "
            "across resume runs of one crawl."
        )
    nb, n_stash = np.frombuffer(data, dtype="<u4", count=2, offset=4)
    nb, n_stash = int(nb), int(n_stash)
    off = 12
    table = np.frombuffer(data, dtype="<u2", count=nb * SLOTS, offset=off).copy()
    off += nb * SLOTS * 2
    sraw = np.frombuffer(data, dtype="<u4", count=n_stash * 2, offset=off)
    stash = [(int(sraw[2 * i]), int(sraw[2 * i + 1])) for i in range(n_stash)]
    return table, stash, nb


def _build_from_hashes(h1: np.ndarray, h2: np.ndarray) -> bytes:
    nb = _nb()
    fp = _fp_of(h1)
    i1 = _i1_of(h2, nb)
    # dedup identical (bucket-slot, fingerprint) pairs before the loop
    uniq = np.unique(np.stack([i1, fp.astype(np.int64)], axis=1), axis=0)
    table = np.zeros(nb * SLOTS, dtype=np.uint16)
    stash: list = []
    _insert_all(table, stash, uniq[:, 0], uniq[:, 1].astype(np.uint16), nb)
    return _serialize(table, stash, nb)


def build_shards(new_keys: DataFrame) -> DataFrame:
    """(bucket, bitmap) per bucket in new_keys — bitmap = serialized cuckoo
    shard. Same schema/columns contract as bloom.build_shards."""

    def build(key, pdf):
        import pandas as pd

        h1 = pdf["_bh1"].values.astype("int64").view(np.uint64)
        h2 = pdf["_bh2"].values.astype("int64").view(np.uint64)
        return pd.DataFrame({"bucket": [int(key[0])], "bitmap": [_build_from_hashes(h1, h2)]})

    return new_keys.select("bucket", "_bh1", "_bh2").groupBy("bucket").applyInPandas(
        build, BLOOM_SCHEMA
    )


def build_shards_local(rows: list) -> list:
    """Driver-side build for bootstrap rows: [(run_id, url_key)] →
    [(bucket, shard_bytes)], hashes identical to the JVM columns."""
    by_bucket: dict = {}
    for run_id, url_key in rows:
        kb = url_key.encode("utf-8", "surrogateescape")
        rb = run_id.encode("utf-8", "surrogateescape")
        bucket = (xxh64(kb, 42) % (1 << 64)) % SEEN_BUCKETS
        h1 = xxh64(kb, xxh64(rb, 42))
        h2 = xxh64(rb, xxh64(kb, 42))
        by_bucket.setdefault(bucket, []).append((h1, h2))
    out = []
    for bucket, hs in by_bucket.items():
        h1 = np.array([h[0] for h in hs], dtype=np.uint64)
        h2 = np.array([h[1] for h in hs], dtype=np.uint64)
        out.append((int(bucket), _build_from_hashes(h1, h2)))
    return out


def merge_bitmaps(shards: list) -> dict:
    """[(bucket, bytes)] from any number of iterations → {bucket: uint8
    serialized shard}. Merging re-inserts every occupied fingerprint of the
    later shards into the first (possible because the alternate bucket is
    derivable from (bucket, fp) alone); values round-trip ``.tobytes()``
    exactly like the Bloom dict the engine re-merges each iteration."""
    grouped: dict = {}
    for bucket, bm in shards:
        grouped.setdefault(bucket, []).append(bytes(bm))
    merged: dict = {}
    for bucket, blobs in grouped.items():
        table, stash, nb = _deserialize(blobs[0])
        for blob in blobs[1:]:
            t2, s2, nb2 = _deserialize(blob)
            if nb2 != nb:
                raise ValueError(f"cuckoo shard size mismatch in bucket {bucket}: {nb} vs {nb2}")
            occ = np.flatnonzero(t2)
            fps = t2[occ]
            idx = (occ // SLOTS).astype(np.int64)
            _insert_all(table, stash, idx, fps, nb)
            for si, sf in s2:
                _insert_all(
                    table, stash, np.array([si], dtype=np.int64),
                    np.array([sf], dtype=np.uint16), nb,
                )
        merged[bucket] = np.frombuffer(_serialize(table, stash, nb), dtype=np.uint8)
    return merged


def prefilter(candidates: DataFrame, bloom_bc) -> DataFrame:
    """Adds ``_maybe_seen`` exactly like bloom.prefilter: False ⇒ definitely
    new. Lookup is vectorized — two bucket gathers + fingerprint compares
    per batch; the (tiny) stash is scanned entry-wise."""

    def fn(batches):
        shards = bloom_bc.value
        parsed: dict = {}
        for pdf in batches:
            n = len(pdf)
            maybe = np.zeros(n, dtype=bool)
            if shards and n:
                h1 = pdf["_bh1"].values.astype("int64").view(np.uint64)
                h2 = pdf["_bh2"].values.astype("int64").view(np.uint64)
                buckets = pdf["bucket"].values
                for b in np.unique(buckets):
                    blob = shards.get(int(b))
                    sel = np.flatnonzero(buckets == b)
                    if blob is None:
                        continue
                    if int(b) not in parsed:
                        parsed[int(b)] = _deserialize(bytes(blob))
                    table, stash, nb = parsed[int(b)]
                    t = table.reshape(nb, SLOTS)
                    fp = _fp_of(h1[sel])
                    i1 = _i1_of(h2[sel], nb)
                    alt = _alt_of(i1, fp, nb)
                    hit = (t[i1] == fp[:, None]).any(axis=1) | (
                        t[alt] == fp[:, None]
                    ).any(axis=1)
                    for si, sf in stash:
                        hit |= (fp == np.uint16(sf)) & ((i1 == si) | (alt == si))
                    maybe[sel] = hit
            pdf = pdf.copy()
            pdf["_maybe_seen"] = maybe
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields)
    return candidates.mapInPandas(fn, schema + ", _maybe_seen boolean")
