"""Kernel shape contracts (round 5): every Pallas kernel has a
dispatch-time predicate (gather_pallas.mxu_gather_ok / mxu_scatter_ok /
windowed_gather_ok) that routes unsupported shapes to the XLA fallback
instead of crashing at Mosaic compile time — the compile-time analog of
the engine's runtime overflow-pair fallback.  These tests sweep the
shape space the round-4 failures lived in (R not divisible by 8;
big-genome table widths past the VMEM budget) and assert the kernels
are exact everywhere the predicates admit them.

Reference analog: skani's AVX2-vs-scalar identity test
(reference: tests/tests.rs:130-144) — a fast path must be bit-identical
to the reference path on every shape it claims, and must not be claimed
outside its domain.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skani_tpu.kernels.gather_pallas import (
    AT, _br_for, genome_map_gather, genome_map_gather_ok, mxu_gather_ok,
    mxu_row_gather, mxu_row_scatter, mxu_row_scatter_multi,
    mxu_row_scatter_multi_wide, mxu_scatter_ok, windowed_gather_ok,
    windowed_sorted_gather)

ON_TPU = jax.devices()[0].platform == "tpu"

# R values chosen to hit every BR branch: <8, odd, 8-divisible,
# 4-but-not-8-divisible (the round-4 crash at R=12), large
R_SWEEP = (2, 3, 8, 12, 18, 24, 256)


def test_br_always_legal():
    """The Pallas block rule: a row block must divide the array dim and
    be divisible by 8 or equal the array dim — for EVERY R."""
    for R in range(1, 512):
        br = _br_for(R)
        assert R % br == 0
        assert br % 8 == 0 or br == R, (R, br)


def test_predicates_reject_round4_crashes():
    """The two shapes that crashed on hardware at round-4 HEAD must be
    rejected by the predicates (and so take the XLA fallback)."""
    # 18 x 528384 big-genome position table: 48.79 MB VMEM block
    assert not mxu_gather_ok(18, 528384, 8192)
    # profitability bound: one-hot matmul cost scales with table width
    assert not mxu_gather_ok(32, 1 << 20, 49152)
    # the production shapes must still be admitted
    assert mxu_gather_ok(32, 49152, 49152)
    assert mxu_gather_ok(12, 40960, 49152)
    assert mxu_scatter_ok(12, 40960, 49152, V=2)


@pytest.mark.skipif(not ON_TPU, reason="Pallas block legality and VMEM "
                    "limits only bind on hardware")
@pytest.mark.parametrize("R", R_SWEEP)
def test_gather_exact_where_admitted(R):
    rng = np.random.default_rng(R)
    for K in (1024, 49152, 1 << 17):
        A = AT
        if not mxu_gather_ok(R, K, A):
            continue
        table = rng.integers(-(2 ** 31), 2 ** 31, size=(R, K),
                             dtype=np.int64).astype(np.int32)
        idx = rng.integers(0, K, size=(R, A)).astype(np.int32)
        out = np.asarray(mxu_row_gather(jnp.asarray(table),
                                        jnp.asarray(idx)))
        exp = np.take_along_axis(table, idx, axis=1)
        assert (out == exp).all(), (R, K)


@pytest.mark.skipif(not ON_TPU, reason="hardware-only")
@pytest.mark.parametrize("R", (3, 8, 12))
def test_scatter_multi_exact_where_admitted(R):
    """The round-4 crash shape class: multi-payload scatter at R not
    divisible by 8 (BR=4 was illegal at R=12)."""
    rng = np.random.default_rng(100 + R)
    P, K = 2048, 1024
    for V in (1, 2, 3):
        if not mxu_scatter_ok(R, P, K, V):
            continue
        # unique in-range targets per row plus out-of-range drops
        idx = np.zeros((R, P), np.int32)
        for r in range(R):
            perm = rng.permutation(K)[: P // 2]
            idx[r] = np.concatenate([perm, np.full(P - P // 2, K,
                                                   np.int32)])
        vals = rng.integers(-(2 ** 31), 2 ** 31, size=(R, V, P),
                            dtype=np.int64).astype(np.int32)
        exp = np.zeros((R, V, K), np.int32)
        for r in range(R):
            m = idx[r] < K
            exp[r][:, idx[r][m]] = vals[r][:, m]
        for fn in (mxu_row_scatter_multi, mxu_row_scatter_multi_wide):
            out = np.asarray(fn(jnp.asarray(idx), jnp.asarray(vals), K))
            assert (out == exp).all(), (fn.__name__, R, V)
        if V == 1:
            out1 = np.asarray(mxu_row_scatter(
                jnp.asarray(idx), jnp.asarray(vals[:, 0]), K))
            assert (out1 == exp[:, 0]).all(), R


@pytest.mark.parametrize("order", ("sorted", "shuffled"))
def test_genome_map_gather_exact(order):
    """The genome-cached map gather must be exact whether or not batch
    rows arrive grouped by genome (grouping is a speed hint only).
    Interpret mode on CPU; the real Mosaic kernel on hardware."""
    rng = np.random.default_rng(7)
    G, P, K, R = 4, 4096, 2048, 12
    if not genome_map_gather_ok(G, P, K):
        pytest.skip("not admitted")
    skid = rng.integers(0, K, (G, P)).astype(np.int32)
    a_idx = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 3, 3, 0], np.int32)
    if order == "shuffled":
        a_idx = a_idx[rng.permutation(R)]
    jw = rng.integers(-(2 ** 31), 2 ** 31, (R, K),
                      dtype=np.int64).astype(np.int32)
    out = np.asarray(genome_map_gather(
        jnp.asarray(skid), jnp.asarray(a_idx), jnp.asarray(jw),
        interpret=not ON_TPU))
    exp = np.stack([jw[r][skid[a_idx[r]]] for r in range(R)])
    assert (out == exp).all()


@pytest.mark.skipif(not ON_TPU, reason="hardware-only")
@pytest.mark.parametrize("R", (3, 8, 12))
def test_windowed_gather_exact_where_admitted(R):
    rng = np.random.default_rng(200 + R)
    U, A, WB = 16384, AT, 64
    if not windowed_gather_ok(R, U, A, WB):
        pytest.skip("not admitted")
    table = rng.integers(-(2 ** 31), 2 ** 31, size=(R, U),
                         dtype=np.int64).astype(np.int32)
    # sorted, narrow-range indices per row: the window is placed at the
    # tile min's 128-block, so a guaranteed-in-window range is
    # (WB-1)*128 (the full WB*128 can spill past the aligned window)
    base = rng.integers(0, U - WB * 128, size=(R, 1))
    idx = np.sort(base + rng.integers(0, (WB - 1) * 128, size=(R, A)),
                  axis=1).astype(np.int32)
    out, ovf = windowed_sorted_gather(jnp.asarray(table),
                                      jnp.asarray(idx), WB=WB)
    assert not np.asarray(ovf).any()
    exp = np.take_along_axis(table, idx, axis=1)
    assert (np.asarray(out) == exp).all()
