"""Direct bit-exactness tests for the MXU one-hot gather/scatter kernels.

The kernels' exactness argument (four 8-bit planes, single-nonzero
one-hot rows, f32/int32 accumulation — see kernels/gather_pallas.py:7-16
and the _use_i8 docstring for the signed-int8 variant) is enforced here
against NumPy on adversarial int32 tables: random values including
negative bit patterns, all-ones/sign-boundary words, and boundary indices
(0, 127, 128, K-1 — the block-select edges).  BOTH plane precisions are
exercised explicitly via the kernels' `i8=` parameter: bf16 (the
documented escape hatch, SKANI_TPU_ONEHOT_I8=0) and int8 (the default).

Runs in interpreter mode everywhere; when the session backend is a real
TPU the same cases are re-run compiled (the configuration CI can't cover).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skani_tpu.kernels.gather_pallas import (mxu_row_gather,
                                             mxu_row_scatter,
                                             windowed_sorted_gather)

I8_MODES = [pytest.param(False, id="bf16"), pytest.param(True, id="int8")]


def _cases(rng, R, K, A):
    table = rng.integers(-2 ** 63, 2 ** 63, (R, K)).astype(np.int64)
    table = table.astype(np.uint64).astype(np.uint32).astype(np.int64)
    table = (table - (table >> 31 << 32)).astype(np.int32)  # full i32 range
    # seed adversarial words: sign boundaries, all-ones, byte-plane edges
    specials = np.array([0, -1, 1, 2 ** 31 - 1, -2 ** 31, 0x7F7F7F7F,
                         -0x7F7F7F80, 255, 256, 0x00FF00FF], np.int32)
    table[:, :len(specials)] = specials
    idx = rng.integers(0, K, (R, A)).astype(np.int32)
    # boundary indices: block-select edges of the two-level one-hot
    idx[:, :8] = np.array([0, 1, 127, 128, 129, K - 2, K - 1, K // 2],
                          np.int32)
    return table, idx


@pytest.mark.parametrize("i8", I8_MODES)
def test_mxu_row_gather_interpret(i8):
    # one small case: interpreter mode pays ~3s per kernel-body step
    R, K, A = 8, 256, 1024
    rng = np.random.default_rng(0)
    table, idx = _cases(rng, R, K, A)
    got = np.asarray(mxu_row_gather(table, idx, interpret=True, i8=i8))
    np.testing.assert_array_equal(got, np.take_along_axis(table, idx, 1))


@pytest.mark.parametrize("i8", I8_MODES)
def test_mxu_row_scatter_interpret(i8):
    R, K, P = 8, 256, 2048
    rng = np.random.default_rng(2)
    # unique in-range targets per row, plus out-of-range (>= K) drops
    idx = np.stack([rng.permutation(16 * K)[:P] for _ in range(R)]) \
        .astype(np.int32)
    vals, _ = _cases(rng, R, P, P)
    got = np.asarray(mxu_row_scatter(idx, vals, K, interpret=True, i8=i8))
    want = np.zeros((R, K), np.int32)
    for r in range(R):
        ok = idx[r] < K
        want[r, idx[r][ok]] = vals[r][ok]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("i8", I8_MODES)
def test_windowed_sorted_gather_interpret(i8):
    R, K, A, WB = 8, 1024, 1024, 4
    rng = np.random.default_rng(3)
    table, idx = _cases(rng, R, K, A)
    # per-row nondecreasing indices; rows 0..3 fit a WB-block window
    # ((WB-1)*128 span can never straddle more than WB 128-blocks),
    # rows 4..7 intentionally overflow it (must be flagged via ovf)
    for r in range(R):
        span = (WB - 1) * 128 if r < 4 else K
        base = int(rng.integers(0, K - span + 1))
        idx[r] = np.sort(rng.integers(base, base + span, A)).astype(np.int32)
    got, ovf = windowed_sorted_gather(table, idx, WB=WB, interpret=True,
                                      i8=i8)
    got, ovf = np.asarray(got), np.asarray(ovf)
    want = np.take_along_axis(table, idx, 1)
    assert not ovf[:4].any()
    np.testing.assert_array_equal(got[:4], want[:4])
    # overflow rows: flagged OR exact (a lucky window is allowed)
    for r in range(4, R):
        assert ovf[r] or np.array_equal(got[r], want[r])


@pytest.mark.parametrize("i8", I8_MODES)
def test_mxu_kernels_compiled_on_tpu(i8):
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU backend in this session")
    rng = np.random.default_rng(1)
    table, idx = _cases(rng, 8, 40960, 8192)
    got = np.asarray(mxu_row_gather(table, idx, i8=i8))
    np.testing.assert_array_equal(got, np.take_along_axis(table, idx, 1))

    K, P = 4096, 8192
    sidx = np.stack([rng.permutation(4 * K)[:P] for _ in range(8)]) \
        .astype(np.int32)
    svals = rng.integers(-2 ** 31, 2 ** 31, (8, P)).astype(np.int64) \
        .astype(np.int32)
    got = np.asarray(mxu_row_scatter(sidx, svals, K, i8=i8))
    want = np.zeros((8, K), np.int32)
    for r in range(8):
        ok = sidx[r] < K
        want[r, sidx[r][ok]] = svals[r][ok]
    np.testing.assert_array_equal(got, want)

    wt, wi = _cases(rng, 8, 8192, 4096)
    wi = np.sort(wi % (8 * 128), axis=1).astype(np.int32)  # fits WB=8
    gotw, ovf = windowed_sorted_gather(wt, wi, WB=8, i8=i8)
    assert not np.asarray(ovf).any()
    np.testing.assert_array_equal(np.asarray(gotw),
                                  np.take_along_axis(wt, wi, 1))
