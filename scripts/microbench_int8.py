#!/usr/bin/env python3
"""int8-MXU one-hot gather/scatter A/B probe — ALL THREE kernels.

The one-hot kernels in kernels/gather_pallas.py run their plane matmuls
either in bf16 (exact for byte planes, f32 accumulation) or int8 (v5e's
MXU executes int8 x int8 -> int32 at 2x the bf16 rate; a SIGNED byte
plane is recoverable exactly with `& 0xFF` because one-hot rows have a
single nonzero).  This probe A/Bs bf16 vs int8 for mxu_row_gather,
mxu_row_scatter AND windowed_sorted_gather at production shapes, with
exactness checks against NumPy on each leg.  The precision is pinned
explicitly via each kernel's `i8=` parameter, so the ambient
SKANI_TPU_ONEHOT_I8 env value cannot skew the comparison.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from skani_tpu.kernels.gather_pallas import (mxu_row_gather,
                                             mxu_row_scatter,
                                             windowed_sorted_gather)

R = int(os.environ.get("MB_R", "32"))
K = int(os.environ.get("MB_K", "40960"))
A = int(os.environ.get("MB_A", "49152"))


def bench(fn, *args, reps=7):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    return 1e3 * best


def ab(name, fn, args, want):
    for i8 in (False, True):
        tag = "int8" if i8 else "bf16"
        try:
            got = fn(*args, i8=i8)
            got0 = np.asarray(jax.tree_util.tree_leaves(got)[0])
            ok = "exact" if np.array_equal(want, got0) else "MISMATCH"
            t = bench(jax.jit(lambda *a, _i8=i8: fn(*a, i8=_i8)), *args)
            print(f"{name} [{tag}]: {t:.2f} ms [{ok}]")
        except Exception as e:
            print(f"{name} [{tag}]: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device={dev} R={R} K={K} A={A}")
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    table_np = rng.integers(-(1 << 31), 1 << 31, (R, K),
                            dtype=np.int64).astype(np.int32)
    idx_np = rng.integers(0, K, (R, A)).astype(np.int32)
    table, idx = put(table_np), put(idx_np)
    ab("row gather   ", mxu_row_gather, (table, idx),
       np.take_along_axis(table_np, idx_np, axis=1))

    # scatter: unique in-range targets per row + out-of-range drops
    SK = 8192
    sidx_np = np.stack([rng.permutation(4 * SK)[:A] for _ in range(R)]) \
        .astype(np.int32)
    svals_np = rng.integers(-(1 << 31), 1 << 31, (R, A),
                            dtype=np.int64).astype(np.int32)
    want = np.zeros((R, SK), np.int32)
    for r in range(R):
        ok = sidx_np[r] < SK
        want[r, sidx_np[r][ok]] = svals_np[r][ok]
    ab("row scatter  ", lambda i, v, i8: mxu_row_scatter(i, v, SK, i8=i8),
       (put(sidx_np), put(svals_np)), want)

    # windowed sorted gather: per-row sorted indices within a WB window
    WB = 64
    widx_np = np.sort(idx_np % (WB * 128), axis=1).astype(np.int32)
    ab("windowed gthr", lambda t, i, i8: windowed_sorted_gather(
        t, i, WB=WB, i8=i8)[0], (table, put(widx_np)),
       np.take_along_axis(table_np, widx_np, axis=1))


if __name__ == "__main__":
    main()
