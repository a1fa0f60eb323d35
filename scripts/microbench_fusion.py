#!/usr/bin/env python3
"""Per-fusion (kernel-launch) overhead probe on the live accelerator.

If each XLA fusion carries a fixed launch cost, a graph of N unfusable
elementwise stages costs N * (launch + pass); comparing N=1 vs N=16 via
optimization_barrier (which forces separate fusions) isolates the
per-fusion constant.  This decides whether phase-A golf should chase
fewer LOGICAL passes (HBM-bound) or fewer KERNELS (launch-bound).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

R = int(os.environ.get("MB_R", "32"))
A = int(os.environ.get("MB_A", "49152"))


def bench(name, fn, *args, reps=9):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn_j(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {1e3 * best:8.2f} ms", flush=True)


def chain(n):
    def f(x):
        for _ in range(n):
            x = jax.lax.optimization_barrier(x * 3 + 1)
        return jnp.sum(x)
    return f


def chain_fused(n):
    def f(x):
        for _ in range(n):
            x = x * 3 + 1
        return jnp.sum(x)
    return f


def main():
    dev = jax.devices()[0]
    print(f"device={dev} R={R} A={A}", flush=True)
    x = jax.device_put(jnp.ones((R, A), jnp.int32), dev)
    for n in (1, 2, 4, 8, 16, 32):
        bench(f"barrier chain n={n}", chain(n), x)
    bench("fused chain n=32 (1 fusion)", chain_fused(32), x)
    # cumulative-scan cost for reference
    bench("cummax (R, A)", lambda v: jnp.sum(jax.lax.cummax(v, axis=1)), x)
    bench("cumsum (R, A)", lambda v: jnp.sum(jnp.cumsum(v, axis=1)), x)
    bench("2-key sort (R, A)",
          lambda v: jnp.sum(jax.lax.sort((v, v), dimension=1,
                                         num_keys=1)[0]), x)


if __name__ == "__main__":
    main()
