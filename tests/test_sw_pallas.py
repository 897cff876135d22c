"""Pallas Smith-Waterman kernel parity vs the host DP (algos.ksw.sw_score,
which is itself validated against brute force + reference clean/scaf)."""

import numpy as np

from fermi_tpu.algos.ksw import sw_score
from fermi_tpu.ops.sw_pallas import sw_score_batch


def test_sw_pallas_matches_host():
    rng = np.random.default_rng(5)
    qs, ts = [], []
    for _ in range(40):
        ql = int(rng.integers(1, 200))
        tl = int(rng.integers(1, 300))
        q = rng.integers(0, 4, ql).astype(np.int8)
        if rng.random() < 0.5:
            # overlapping pair: target contains a mutated copy of the query
            t = q.copy()
            for _ in range(int(rng.integers(0, 6))):
                t[int(rng.integers(0, ql))] = int(rng.integers(0, 4))
            pad = rng.integers(0, 4, max(0, tl - ql)).astype(np.int8)
            t = np.concatenate([t, pad])
        else:
            t = rng.integers(0, 4, tl).astype(np.int8)
        qs.append(q)
        ts.append(t)
    got = sw_score_batch(qs, ts)
    want = np.array([sw_score(q, t) for q, t in zip(qs, ts)], np.int32)
    assert np.array_equal(got, want), (got[:10], want[:10])


def test_sw_pallas_empty_and_degenerate():
    assert sw_score_batch([], []).size == 0
    one = sw_score_batch([np.array([1], np.int8)], [np.array([1], np.int8)])
    assert one[0] == 5  # single match
    z = sw_score_batch([np.array([0], np.int8)], [np.array([3], np.int8)])
    assert z[0] == 0
