#!/usr/bin/env python3
"""A/B microbenches of candidate phase-A primitive swaps on the live chip.

Measured-first rule (PERF.md): every primitive swap gets an A/B here
before landing — two 'obvious' improvements regressed in round 2.
Timing via readback (block_until_ready is a no-op on the axon tunnel);
numbers are net of nothing — compare deltas between variants, not
absolutes.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

R, A = 32, 49152
L_CAP, C_CAP = 512, 512
RC = R * C_CAP


def bench(fn, *args, reps=5):
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


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device={dev} R={R} A={A} L_CAP={L_CAP} RC={RC}")
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    flat_col = put(rng.integers(0, L_CAP, R * A).astype(np.int32))
    flat_row = put(rng.integers(0, RC, R * A).astype(np.int32))
    v1 = put(rng.integers(0, 1 << 30, R * A).astype(np.int32))
    v2 = put(rng.integers(0, 1 << 30, R * A).astype(np.int32))

    def two_i32(fc, fr, a, b):
        buf1 = jnp.zeros((L_CAP, RC + 1), jnp.int32).at[fc, fr].set(
            a, mode="drop")[:, :RC]
        buf2 = jnp.zeros((L_CAP, RC + 1), jnp.int32).at[fc, fr].set(
            b, mode="drop")[:, :RC]
        return buf1, buf2

    def one_i64(fc, fr, a, b):
        v = (a.astype(jnp.int64) << 32) | b.astype(jnp.uint32).astype(
            jnp.int64)
        buf = jnp.zeros((L_CAP, RC + 1), jnp.int64).at[fc, fr].set(
            v, mode="drop")[:, :RC]
        return (buf >> 32).astype(jnp.int32), \
            jax.lax.bitcast_convert_type(
                buf.astype(jnp.uint64).astype(jnp.uint32), jnp.int32)

    t_a = bench(two_i32, flat_col, flat_row, v1, v2)
    t_b = bench(one_i64, flat_col, flat_row, v1, v2)
    print(f"regroup: two int32 scatters {t_a:.1f} ms | "
          f"one int64 scatter + unpack {t_b:.1f} ms")

    # readback size: does transfer scale as expected?
    big = put(rng.integers(0, 1 << 30, (R, 6659)).astype(np.int32))
    small = put(rng.integers(0, 1 << 30, (R, 3587)).astype(np.int32))

    def ident(x):
        return x + 1

    f = jax.jit(ident)
    for name, arr in (("icap1024", big), ("icap512", small)):
        _ = np.asarray(f(arr))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(f(arr))
            best = min(best, time.perf_counter() - t0)
        print(f"readback {name} ({arr.nbytes >> 10} KiB): "
              f"{1e3 * best:.1f} ms")


if __name__ == "__main__":
    main()
