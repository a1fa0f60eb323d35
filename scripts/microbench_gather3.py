#!/usr/bin/env python3
"""Probe 2: the exact forms Mosaic's dynamic-gather accepts on v5e.

Probe 1 (microbench_gather2.py) showed take_along_axis lowers in Pallas
but rejects mismatched shapes.  Here: same-shape take_along_axis along
axis=1 (lanes) and axis=0 (sublanes), at table width K, with the index
array padded to the table's shape.
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

R = int(os.environ.get("MB_R", "32"))
K = int(os.environ.get("MB_K", "126208"))


def bench(fn, *args, reps=7):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn_j(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    return 1e3 * best


def try_case(name, fn, table, idx, ref):
    try:
        got = np.asarray(fn(table, idx))
        ok = "exact" if np.array_equal(ref, got) else "MISMATCH"
        t = bench(fn, table, idx)
        print(f"{name}: {t:.1f} ms [{ok}]")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}")


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device={dev} R={R} K={K}")
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    table_np = rng.integers(-(1 << 31), 1 << 31, (R, K),
                            dtype=np.int64).astype(np.int32)
    idx_np = rng.integers(0, K, (R, K)).astype(np.int32)  # same shape
    table, idx = put(table_np), put(idx_np)
    ref = np.take_along_axis(table_np, idx_np, axis=1)

    # --- same-shape take_along_axis axis=1, one row per grid step ---
    def _kern_a1(t_ref, i_ref, o_ref, *, BR):
        def body(rr, _):
            tab = t_ref[pl.ds(rr, 1), :]
            ix = i_ref[pl.ds(rr, 1), :]
            o_ref[pl.ds(rr, 1), :] = jnp.take_along_axis(tab, ix, axis=1)
            return 0
        jax.lax.fori_loop(0, BR, body, 0)

    def g_a1(table, idx):
        R_, K_ = table.shape
        BR = 8 if R_ % 8 == 0 else R_
        kern = functools.partial(_kern_a1, BR=BR)
        spec = pl.BlockSpec((BR, K_), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(R_ // BR,),
            in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((R_, K_), jnp.int32),
        )(table, idx)

    try_case("same-shape taa axis=1 (row loop)", g_a1, table, idx, ref)

    # --- whole-block take_along_axis axis=1 (BR rows at once) ---
    def _kern_blk(t_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(t_ref[:, :], i_ref[:, :], axis=1)

    def g_blk(table, idx):
        R_, K_ = table.shape
        BR = 8 if R_ % 8 == 0 else R_
        spec = pl.BlockSpec((BR, K_), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _kern_blk, grid=(R_ // BR,),
            in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((R_, K_), jnp.int32),
        )(table, idx)

    try_case("same-shape taa axis=1 (block)", g_blk, table, idx, ref)

    # --- axis=0 gather: table (K8, 8) per row chunked... use a (512, 128)
    # tile: gather along sublanes within a (512, 128) block ---
    T0 = 512
    tab2_np = rng.integers(-(1 << 31), 1 << 31, (T0, 128),
                           dtype=np.int64).astype(np.int32)
    idx2_np = rng.integers(0, T0, (T0, 128)).astype(np.int32)
    ref2 = np.take_along_axis(tab2_np, idx2_np, axis=0)
    tab2, idx2 = put(tab2_np), put(idx2_np)

    def _kern_a0(t_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(t_ref[:, :], i_ref[:, :], axis=0)

    def g_a0(table, idx):
        spec = pl.BlockSpec((T0, 128), lambda: (0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _kern_a0,
            in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((T0, 128), jnp.int32),
        )(table, idx)

    try_case("same-shape taa axis=0 (512x128)", g_a0, tab2, idx2, ref2)

    # XLA same-shape baseline
    t_xla = bench(lambda t, i: jnp.take_along_axis(t, i, axis=1),
                  table, idx)
    print(f"XLA same-shape gather axis=1: {t_xla:.1f} ms")


if __name__ == "__main__":
    main()
