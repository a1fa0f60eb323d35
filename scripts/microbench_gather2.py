#!/usr/bin/env python3
"""Probe: does Mosaic lower a NATIVE dynamic gather inside a Pallas TPU
kernel, and how fast is it vs the MXU one-hot trick?

PERF.md's round-2/3 conclusion was that XLA gather/scatter passes at 5-9
ns/element are the wall, and 'a Mosaic-native scatter/gather primitive,
not more clever banding, is what would change this'.  This script tries
the candidate formulations Mosaic might accept:

  g1: jnp.take_along_axis(table_row, idx_tile, axis=1) in-kernel
  g2: table_row.reshape(-1)[idx] via jnp.take
  g3: one-hot MXU (gather_pallas.mxu_row_gather) -- the incumbent
  g4: XLA take_along_axis -- the baseline

Table width defaults to the bench DB's real union-axis width (~126k).
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
A = int(os.environ.get("MB_A", "40960"))
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


AT = 1024


def _kern_taa(t_ref, i_ref, o_ref, *, BR):
    def body(rr, _):
        tab = t_ref[pl.ds(rr, 1), :]            # (1, K)
        ix = i_ref[pl.ds(rr, 1), :]             # (1, AT)
        o_ref[pl.ds(rr, 1), :] = jnp.take_along_axis(tab, ix, axis=1)
        return 0
    jax.lax.fori_loop(0, BR, body, 0)


def gather_taa(table, idx):
    R_, K_ = table.shape
    _, A_ = idx.shape
    BR = 8 if R_ % 8 == 0 else R_
    kern = functools.partial(_kern_taa, BR=BR)
    return pl.pallas_call(
        kern,
        grid=(R_ // BR, A_ // AT),
        in_specs=[pl.BlockSpec((BR, K_), lambda r, a: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_, A_), jnp.int32),
    )(table, idx)


def _kern_take(t_ref, i_ref, o_ref, *, BR):
    def body(rr, _):
        tab = t_ref[pl.ds(rr, 1), :].reshape(-1)   # (K,)
        ix = i_ref[pl.ds(rr, 1), :].reshape(-1)
        o_ref[pl.ds(rr, 1), :] = jnp.take(tab, ix).reshape(1, -1)
        return 0
    jax.lax.fori_loop(0, BR, body, 0)


def gather_take(table, idx):
    R_, K_ = table.shape
    _, A_ = idx.shape
    BR = 8 if R_ % 8 == 0 else R_
    kern = functools.partial(_kern_take, BR=BR)
    return pl.pallas_call(
        kern,
        grid=(R_ // BR, A_ // AT),
        in_specs=[pl.BlockSpec((BR, K_), lambda r, a: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_, A_), jnp.int32),
    )(table, idx)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device={dev} R={R} A={A} K={K}")
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    from skani_tpu.kernels.gather_pallas import mxu_row_gather

    table = put(rng.integers(-(1 << 31), 1 << 31, (R, K),
                             dtype=np.int64).astype(np.int32))
    idx_np = rng.integers(0, K, (R, A)).astype(np.int32)
    idx = put(idx_np)
    ref = np.take_along_axis(np.asarray(table), idx_np, axis=1)

    for name, fn in (("pallas take_along_axis", gather_taa),
                     ("pallas flat take", gather_take)):
        try:
            got = np.asarray(fn(table, idx))
            ok = "exact" if np.array_equal(ref, got) else "MISMATCH"
            t = bench(fn, table, idx)
            print(f"{name}: {t:.1f} ms [{ok}]")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")

    t_mxu = bench(lambda t, i: mxu_row_gather(t, i), table, idx)
    print(f"MXU one-hot: {t_mxu:.1f} ms")
    t_xla = bench(lambda t, i: jnp.take_along_axis(t, i, axis=1),
                  table, idx)
    print(f"XLA gather: {t_xla:.1f} ms")


if __name__ == "__main__":
    main()
