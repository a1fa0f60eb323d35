#!/usr/bin/env python3
"""A/B microbench for the expansion-block candidates (round-3 session 5).

Profile (scripts/profile_phase_a.py, 2026-08-18) puts the expansion at
~24-26 ms of the ~50 ms compact-DP batch: fill block ~12.5, apk gather
~5.3, bpk gather ~1-3, final unpack ~6.8 (all +-4 ms tunnel noise).
Candidates measured here at real bench shapes before landing:

  1. apk gather: mxu_row_gather vs windowed_sorted_gather (g is MONOTONE
     per row — it is a cummax forward-fill), window WB=64.
  2. elementwise unpack (aw, bw) -> (qp, rp, qc, rc, rev, w1, w2): is the
     +6.8 ms real or prefix-measurement distortion?
  3. fill block composite: jw map gather + cumsum + scatter + cummax, to
     bound what a fused variant could save.

Timing via 4-element readback (block_until_ready is a no-op on the
tunnel); compare deltas, not absolutes.
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
A = int(os.environ.get("MB_A", "49152"))
P = int(os.environ.get("MB_P", "40960"))


def bench(name, fn, *args, reps=7):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn_j(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:48s} {1e3 * best:8.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device={dev} R={R} A={A} P={P}", flush=True)
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    # monotone slot->position map (the real g is a cummax forward-fill)
    g_np = np.minimum.accumulate(
        np.sort(rng.integers(0, P, (R, A), np.int32), axis=1)[:, ::-1],
        axis=1)[:, ::-1]
    g = put(np.ascontiguousarray(g_np))
    brow = put(rng.integers(0, P, (R, A), np.int32))
    apk = put(rng.integers(0, 1 << 31, (R, P), np.int32))
    bpk = put(rng.integers(0, 1 << 31, (R, P), np.int32))

    bench("apk gather: mxu_row_gather", mxu_row_gather, apk, g)
    bench("apk gather: windowed WB=64",
          lambda t, i: windowed_sorted_gather(t, i, WB=64)[0], apk, g)
    bench("apk gather: windowed WB=32",
          lambda t, i: windowed_sorted_gather(t, i, WB=32)[0], apk, g)
    bench("bpk gather: mxu_row_gather", mxu_row_gather, bpk, brow)

    # 2. unpack composite
    aw = put(rng.integers(0, 1 << 31, (R, A), np.int32))
    bw = put(rng.integers(0, 1 << 31, (R, A), np.int32))
    valid = put((rng.random((R, A)) < 0.9))
    cid = put(rng.integers(0, 512, (R, A), np.int32))
    I32MAX = np.int32(2**31 - 1)

    def chk(*xs):
        return jnp.stack([jnp.sum(x.astype(jnp.int32)) for x in xs])

    def ident(aw, bw, valid, cid):
        return chk(aw, bw)

    def unpack(aw, bw, valid, cid):
        qp_r = aw & 0xFFFFFF
        qcc = (aw >> 24) & 0xFF
        rp_r = bw & 0xFFFFFF
        rcc = (bw >> 24) & 0xFF
        qp = jnp.where(valid, qp_r, I32MAX)
        rp = jnp.where(valid, rp_r, I32MAX)
        qc = jnp.where(valid, qcc >> 1, I32MAX)
        rc = jnp.where(valid, rcc >> 1, I32MAX)
        rev = ((qcc ^ rcc) & 1).astype(bool) & valid
        return chk(qp, rp, qc, rc, rev)

    def unpack_w12(aw, bw, valid, cid):
        qp_r = aw & 0xFFFFFF
        qcc = (aw >> 24) & 0xFF
        rp_r = bw & 0xFFFFFF
        rcc = (bw >> 24) & 0xFF
        qp = jnp.where(valid, qp_r, I32MAX)
        rp = jnp.where(valid, rp_r, I32MAX)
        rc = jnp.where(valid, rcc >> 1, I32MAX)
        rev = ((qcc ^ rcc) & 1).astype(bool) & valid
        w1 = jnp.where(valid, ((cid & 31) << 26) | (qp * 4 + rev * 2 + 1), 0)
        w2 = jnp.where(valid, (rc << 25) | rp, 0)
        return chk(w1, w2)

    bench("unpack: identity checksum", ident, aw, bw, valid, cid)
    bench("unpack: qp/rp/qc/rc/rev", unpack, aw, bw, valid, cid)
    bench("unpack: + w1/w2 packs", unpack_w12, aw, bw, valid, cid)

    # 3. fill block composite at real sparsity
    cnt_p = (rng.random((R, P)) < 0.85).astype(np.int32)
    bs_p = rng.integers(0, P, (R, P), np.int32)
    cnt_p_d, bs_p_d = put(cnt_p), put(bs_p)
    rowi = jnp.arange(R)[:, None]

    def fill_mxu(cnt_p, bs_p):
        pcols = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None, :],
                                 (R, P))
        offs_p = jnp.cumsum(cnt_p, axis=1) - cnt_p
        emit = (cnt_p > 0) & (offs_p < A)
        pk = (pcols.astype(jnp.uint32) << 16) | bs_p.astype(jnp.uint32)
        fw_i = mxu_row_scatter(jnp.where(emit, offs_p, A),
                               jax.lax.bitcast_convert_type(pk, jnp.int32),
                               A)
        fw = jax.lax.bitcast_convert_type(fw_i, jnp.uint32)
        fwm = jax.lax.cummax(fw, axis=1)
        g = jnp.minimum(fwm >> 16, jnp.uint32(P - 1)).astype(jnp.int32)
        bs = (fwm & jnp.uint32(0xFFFF)).astype(jnp.int32)
        return chk(g, bs)

    def fill_xla(cnt_p, bs_p):
        pcols = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None, :],
                                 (R, P))
        offs_p = jnp.cumsum(cnt_p, axis=1) - cnt_p
        emit = (cnt_p > 0) & (offs_p < A)
        pk = (pcols.astype(jnp.uint32) << 16) | bs_p.astype(jnp.uint32)
        fw = jnp.zeros((R, A), jnp.uint32).at[
            rowi, jnp.where(emit, offs_p, A)].max(
            jnp.where(emit, pk, jnp.uint32(0)), mode="drop")
        fwm = jax.lax.cummax(fw, axis=1)
        g = jnp.minimum(fwm >> 16, jnp.uint32(P - 1)).astype(jnp.int32)
        bs = (fwm & jnp.uint32(0xFFFF)).astype(jnp.int32)
        return chk(g, bs)

    bench("fill block: MXU scatter + cummax", fill_mxu, cnt_p_d, bs_p_d)
    bench("fill block: XLA scatter + cummax", fill_xla, cnt_p_d, bs_p_d)

    # sanity: windowed == mxu on monotone indices
    a = np.asarray(mxu_row_gather(apk, g))
    b, ovf = windowed_sorted_gather(apk, g, WB=64)
    b = np.asarray(b)
    ovf = np.asarray(ovf)
    ok = np.array_equal(a[~ovf], b[~ovf])
    print(f"windowed==mxu on non-ovf rows: {ok}  ovf_rows={int(ovf.sum())}",
          flush=True)


if __name__ == "__main__":
    main()
