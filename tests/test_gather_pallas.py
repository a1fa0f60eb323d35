"""Direct bit-exactness tests for the MXU one-hot gather kernel.

The kernel's exactness argument (four 8-bit bf16 planes, single-nonzero
one-hot rows, f32 accumulation — see kernels/gather_pallas.py:7-16) is
enforced here against np.take_along_axis on adversarial int32 tables:
random values including negative bit patterns, all-ones/sign-boundary
words, and boundary indices (0, 127, 128, K-1 — the block-select edges).

Runs in interpreter mode everywhere; when the session backend is a real
TPU the same cases are re-run compiled (the configuration CI can't cover).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skani_tpu.kernels.gather_pallas import mxu_row_gather


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


def test_mxu_row_gather_interpret():
    # one small case: interpreter mode pays ~3s per kernel-body step
    R, K, A = 8, 256, 1024
    rng = np.random.default_rng(0)
    table, idx = _cases(rng, R, K, A)
    got = np.asarray(mxu_row_gather(table, idx, interpret=True))
    np.testing.assert_array_equal(got, np.take_along_axis(table, idx, 1))


def test_mxu_row_gather_compiled_on_tpu():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU backend in this session")
    rng = np.random.default_rng(1)
    table, idx = _cases(rng, 8, 40960, 8192)
    got = np.asarray(mxu_row_gather(table, idx))
    np.testing.assert_array_equal(got, np.take_along_axis(table, idx, 1))
