"""Banded expansion kernel vs its NumPy oracle (interpret mode).

The analog of skani's AVX2-vs-scalar equivalence test
(reference: tests/tests.rs:130-144) for the anchor-expansion kernel: both
the dense and sparse (span-overflow) regimes must match the oracle
exactly on the valid slot prefix, and overflow must be flagged whenever a
tile's source window is exhausted.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skani_tpu.kernels.expand_pallas import (TILE, WBLK, expand_anchors,
                                             expand_anchors_reference)


def _mk(rng, R, P, density_choices, n_pos):
    cnt = rng.choice(density_choices, size=(R, P)).astype(np.int32)
    for r in range(R):
        cnt[r, n_pos[r]:] = 0
    offs = np.cumsum(cnt, axis=1) - cnt
    total = (offs[:, -1] + cnt[:, -1]).astype(np.int32)
    bs = rng.integers(0, 1 << 17, size=(R, P)).astype(np.int32)
    apk = rng.integers(0, 1 << 31, size=(R, P), dtype=np.int64
                       ).astype(np.int32)
    return offs, bs, apk, total


@pytest.mark.parametrize("density", [
    [0, 0, 1, 1, 1, 1, 2, 3],     # close pair: most positions emit
    [0, 1],                       # 50% share
    [0, 0, 0, 1, 2],              # sparser, multi-count
])
def test_expand_kernel_matches_oracle(density):
    rng = np.random.default_rng(hash(tuple(density)) % 2**31)
    R, P, A = 3, 4096, 4096
    offs, bs, apk, total = _mk(rng, R, P, density, [4000, 2500, 64])
    aw_r, brow_r, ovf_r = expand_anchors_reference(offs, bs, apk, total, A)
    aw, brow, ovf = map(np.asarray,
                        expand_anchors(offs, bs, apk, total, A,
                                       interpret=True))
    np.testing.assert_array_equal(ovf, ovf_r)
    for r in range(R):
        v = min(int(total[r]), A)
        np.testing.assert_array_equal(aw[r, :v], aw_r[r, :v])
        np.testing.assert_array_equal(brow[r, :v], brow_r[r, :v])


def test_expand_kernel_sparse_overflows():
    """Emitters spaced wider than the window must flag span overflow
    (the engine then falls back to the exact path for that pair)."""
    P, A = 4096, 2048
    cnt = np.zeros((1, P), np.int32)
    cnt[0, ::37] = 1              # span per tile = 37*1024 >> WBLK*128
    offs = np.cumsum(cnt, axis=1) - cnt
    total = np.array([cnt.sum()], np.int32)
    bs = np.zeros((1, P), np.int32)
    apk = np.arange(P, dtype=np.int32)[None, :]
    _aw, _brow, ovf = map(np.asarray,
                          expand_anchors(offs, bs, apk, total, A,
                                         interpret=True))
    assert ovf[0] == 1


def test_expand_kernel_window_edge():
    """Runs crossing 128-block boundaries and window restarts: every
    position emits exactly WBLK anchors, forcing the cursor to advance a
    full window's worth of sources every WBLK tiles."""
    P = 2048
    A = 2048
    cnt = np.full((1, P), 1, np.int32)
    cnt[0, 1::2] = 3              # irregular run lengths
    offs = np.cumsum(cnt, axis=1) - cnt
    total = np.array([min(int(offs[0, -1] + cnt[0, -1]), A)], np.int32)
    rng = np.random.default_rng(5)
    bs = rng.integers(0, 1 << 17, size=(1, P)).astype(np.int32)
    apk = rng.integers(0, 1 << 31, size=(1, P), dtype=np.int64
                       ).astype(np.int32)
    aw_r, brow_r, ovf_r = expand_anchors_reference(offs, bs, apk, total, A)
    aw, brow, ovf = map(np.asarray,
                        expand_anchors(offs, bs, apk, total, A,
                                       interpret=True))
    v = int(total[0])
    np.testing.assert_array_equal(aw[0, :v], aw_r[0, :v])
    np.testing.assert_array_equal(brow[0, :v], brow_r[0, :v])
    np.testing.assert_array_equal(ovf, ovf_r)
