#!/usr/bin/env python3
"""int8-MXU one-hot gather/scatter probe.

The one-hot kernels in kernels/gather_pallas.py run their plane matmuls
in bf16 (exact for byte planes, f32 accumulation).  v5e's MXU executes
int8 x int8 -> int32 at 2x the bf16 rate, and one-hot rows have a single
nonzero, so a SIGNED byte plane is recoverable exactly with `& 0xFF`
after the product — if Mosaic lowers the int8 dot at all.  This probe
measures bf16 vs int8 variants of the row gather at production shapes
before any kernel is changed.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skani_tpu.kernels.gather_pallas import AT, mxu_row_gather

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


def _kern_i8(t_ref, i_ref, o_ref, *, KB, BR):
    def body(rr, _):
        tab = t_ref[pl.ds(rr, 1), :].reshape(KB, 128)
        ix = i_ref[pl.ds(rr, 1), :].reshape(AT, 1)
        hi = ix >> 7
        lo = ix & 127
        oh_hi = (hi == jax.lax.broadcasted_iota(jnp.int32, (AT, KB), 1)
                 ).astype(jnp.int8)
        oh_lo = lo == jax.lax.broadcasted_iota(jnp.int32, (AT, 128), 1)
        v = jnp.zeros((AT,), jnp.int32)
        for p in range(4):
            # signed byte plane: exact per one-hot row after & 0xFF
            plane = ((tab >> (8 * p)) & 0xFF).astype(jnp.int8)
            rows = jax.lax.dot_general(
                oh_hi, plane, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            vp = jnp.sum(jnp.where(oh_lo, rows, 0), axis=1) & 0xFF
            v = v | (vp << (8 * p))
        o_ref[pl.ds(rr, 1), :] = v.reshape(1, AT)
        return 0

    jax.lax.fori_loop(0, BR, body, 0)


def mxu_row_gather_i8(table, idx):
    Rr, Kk = table.shape
    _, Aa = idx.shape
    BR = 8 if Rr % 8 == 0 else Rr
    kern = functools.partial(_kern_i8, KB=Kk // 128, BR=BR)
    return pl.pallas_call(
        kern,
        grid=(Rr // BR, Aa // AT),
        in_specs=[pl.BlockSpec((BR, Kk), lambda r, a: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rr, Aa), jnp.int32),
    )(table, idx)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device={dev} R={R} K={K} A={A}")
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    table_np = rng.integers(-(1 << 31), 1 << 31, (R, K),
                            dtype=np.int64).astype(np.int32)
    idx_np = rng.integers(0, K, (R, A)).astype(np.int32)
    ref = np.take_along_axis(table_np, idx_np, axis=1)
    table, idx = put(table_np), put(idx_np)

    t = bench(jax.jit(mxu_row_gather), table, idx)
    print(f"bf16 one-hot gather: {t:.2f} ms")

    try:
        got = np.asarray(mxu_row_gather_i8(table, idx))
        ok = "exact" if np.array_equal(ref, got) else "MISMATCH"
        t = bench(jax.jit(mxu_row_gather_i8), table, idx)
        print(f"int8 one-hot gather: {t:.2f} ms [{ok}]")
    except Exception as e:
        print(f"int8 one-hot gather: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    main()
