"""Deterministic shared fixtures used by BOTH the driver-oracle queries
(`__spark_entry__._q_stream_dedup`) and the test suite
(tests/test_streaming.py) — one definition so the probed pair-graph
constants (est values, banding outcomes) cannot silently desynchronize
between the oracle pin and the pair-level tests."""

from __future__ import annotations

import random


def chain_texts() -> tuple[str, str, str]:
    """Three texts (a, b, c) whose MinHash pair graph at threshold 0.70 is
    exactly a~b, b~c, NO a~c under the dedup operator's fixed hash seed
    (probed: est(a,b)=0.81, est(b,c)=0.77, (a,c) not banded/thresholded).
    Sliding 10-of-12 word-block windows over a 200-word synthetic
    ``w<digits>`` vocabulary (nowhere near the corpus text); fully
    deterministic via the fixed RNG seed."""
    rng = random.Random(12345)
    words = [f"w{rng.randrange(10**6)}" for _ in range(200)]
    blocks = [" ".join(words[i * 12 : (i + 1) * 12]) for i in range(14)]
    a = " ".join(blocks[0:10])
    b = " ".join(blocks[1:11])
    c = " ".join(blocks[2:12])
    return a, b, c
