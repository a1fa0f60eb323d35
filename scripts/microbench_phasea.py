#!/usr/bin/env python3
"""Per-pass A/B microbench of phase-A's remaining hot blocks on the chip.

Round-3 state (PERF.md): compact DP landed; join ~18.5 ms, expansion
~18.8 ms, chunking ~13.4 ms per 32-pair batch are what's left.  Each
block decomposes into gather / scatter / cumsum-cummax / sort passes;
this script times each pass at REAL bench shapes and A/Bs the candidate
replacements before any of them land:

  gather:  XLA flat | MXU one-hot bf16 4-matmul (current) |
           MXU one-hot int8 single wide matmul (candidate)
  scatter: XLA .at[].max fill (current) | MXU one-hot matmul (candidate)
  qp_first: full-row gather (current) | packed seg-cummax (candidate)

Timing via readback of a 4-element slice (block_until_ready is a no-op
on the axon tunnel); compare deltas between variants, not absolutes.
"""
import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

R = int(os.environ.get("MB_R", "32"))
A = int(os.environ.get("MB_A", "49152"))
P = int(os.environ.get("MB_P", "40960"))
K = int(os.environ.get("MB_K", "40960"))   # table width (dense axis)


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


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device={dev} R={R} A={A} P={P} K={K}")
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    from skani_tpu.kernels.gather_pallas import mxu_row_gather
    from skani_tpu.kernels.gather_pallas import AT

    table = put(rng.integers(-(1 << 31), 1 << 31, (R, K),
                             dtype=np.int64).astype(np.int32))
    # monotone-ish indices like the expansion's g (sorted runs)
    idx_np = np.sort(rng.integers(0, K, (R, A)).astype(np.int32), axis=1)
    idx = put(idx_np)

    t_xla = bench(lambda t, i: jnp.take_along_axis(t, i, axis=1),
                  table, idx)
    t_mxu = bench(lambda t, i: mxu_row_gather(t, i), table, idx)
    print(f"gather (R,{A}) from (R,{K}): XLA {t_xla:.1f} ms | "
          f"MXU bf16x4 {t_mxu:.1f} ms")

    # --- candidate: int8 single wide matmul gather ---
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kern_i8(t_ref, i_ref, o_ref, *, KB, BR):
        def body(rr, _):
            tab = t_ref[pl.ds(rr, 1), :].reshape(KB, 128)
            ix = i_ref[pl.ds(rr, 1), :].reshape(AT, 1)
            hi = ix >> 7
            lo = ix & 127
            oh_hi = (hi == jax.lax.broadcasted_iota(
                jnp.int32, (AT, KB), 1)).astype(jnp.int8)
            oh_lo = lo == jax.lax.broadcasted_iota(jnp.int32, (AT, 128), 1)
            wide = jnp.concatenate(
                [((tab >> (8 * p)) & 0xFF) - 128 for p in range(4)],
                axis=1).astype(jnp.int8)                      # (KB, 512)
            rows = jax.lax.dot_general(
                oh_hi, wide, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) + 128       # (AT, 512)
            v = jnp.zeros((AT,), jnp.int32)
            for p in range(4):
                vp = jnp.sum(jnp.where(oh_lo,
                                       rows[:, p * 128:(p + 1) * 128], 0),
                             axis=1)
                v = v | (vp << (8 * p))
            o_ref[pl.ds(rr, 1), :] = v.reshape(1, AT)
            return 0
        jax.lax.fori_loop(0, BR, body, 0)

    def mxu_gather_i8(table, idx):
        R_, K_ = table.shape
        _, A_ = idx.shape
        BR = 8 if R_ % 8 == 0 else R_
        kern = functools.partial(_kern_i8, KB=K_ // 128, BR=BR)
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

    try:
        ref = np.take_along_axis(np.asarray(table), idx_np, axis=1)
        got = np.asarray(mxu_gather_i8(table, idx))
        ok = "exact" if np.array_equal(ref, got) else "MISMATCH"
        t_i8 = bench(mxu_gather_i8, table, idx)
        print(f"gather MXU int8 wide: {t_i8:.1f} ms [{ok}]")
    except Exception as e:
        print(f"gather MXU int8 wide: FAILED {type(e).__name__}: {e}")

    # --- candidate: bf16 wide single matmul (4 planes, one dot) ---
    def _kern_bw(t_ref, i_ref, o_ref, *, KB, BR):
        def body(rr, _):
            tab = t_ref[pl.ds(rr, 1), :].reshape(KB, 128)
            ix = i_ref[pl.ds(rr, 1), :].reshape(AT, 1)
            hi = ix >> 7
            lo = ix & 127
            oh_hi = (hi == jax.lax.broadcasted_iota(
                jnp.int32, (AT, KB), 1)).astype(jnp.bfloat16)
            oh_lo = lo == jax.lax.broadcasted_iota(jnp.int32, (AT, 128), 1)
            wide = jnp.concatenate(
                [((tab >> (8 * p)) & 0xFF) for p in range(4)],
                axis=1).astype(jnp.bfloat16)                  # (KB, 512)
            rows = jnp.dot(oh_hi, wide,
                           preferred_element_type=jnp.float32)
            v = jnp.zeros((AT,), jnp.int32)
            for p in range(4):
                vp = jnp.sum(jnp.where(oh_lo,
                                       rows[:, p * 128:(p + 1) * 128], 0.0),
                             axis=1).astype(jnp.int32)
                v = v | (vp << (8 * p))
            o_ref[pl.ds(rr, 1), :] = v.reshape(1, AT)
            return 0
        jax.lax.fori_loop(0, BR, body, 0)

    def mxu_gather_bw(table, idx):
        R_, K_ = table.shape
        _, A_ = idx.shape
        BR = 8 if R_ % 8 == 0 else R_
        kern = functools.partial(_kern_bw, KB=K_ // 128, BR=BR)
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

    try:
        got = np.asarray(mxu_gather_bw(table, idx))
        ok = "exact" if np.array_equal(ref, got) else "MISMATCH"
        t_bw = bench(mxu_gather_bw, table, idx)
        print(f"gather MXU bf16 wide: {t_bw:.1f} ms [{ok}]")
    except Exception as e:
        print(f"gather MXU bf16 wide: FAILED {type(e).__name__}: {e}")

    # --- scatter fill (expansion): XLA .at[].max + cummax vs variants ---
    cnt = rng.integers(0, 3, (R, P)).astype(np.int32)
    offs = np.cumsum(cnt, axis=1) - cnt
    emitm = (cnt > 0) & (offs < A)
    pk = ((np.arange(P, dtype=np.uint32)[None, :] << 16)
          | rng.integers(0, 1 << 16, (R, P)).astype(np.uint32))
    offs_d = put(offs)
    emit_d = put(emitm)
    pk_d = put(pk.astype(np.int64).astype(np.int32))
    rowi = jnp.arange(R)[:, None]

    def fill_cummax(offs, emit, pkv):
        fw = jnp.zeros((R, A), jnp.int32).at[
            rowi, jnp.where(emit, offs, A)].max(
            jnp.where(emit, pkv, 0), mode="drop")
        return jax.lax.cummax(fw, axis=1)

    t_fill = bench(fill_cummax, offs_d, emit_d, pk_d)
    print(f"expansion fill scatter+cummax: XLA {t_fill:.1f} ms")

    # cumsum / cummax / sort base costs at (R, A)
    big = put(rng.integers(0, 1 << 30, (R, A)).astype(np.int32))
    t_cs = bench(lambda x: jnp.cumsum(x, axis=1), big)
    t_cm = bench(lambda x: jax.lax.cummax(x, axis=1), big)
    t_srt1 = bench(lambda x: jax.lax.sort(x, dimension=1), big)
    t_srt2 = bench(lambda x: jax.lax.sort((x, x), dimension=1,
                                          num_keys=2), big)
    print(f"(R,A) passes: cumsum {t_cs:.1f} | cummax {t_cm:.1f} | "
          f"sort1 {t_srt1:.1f} | sort2key {t_srt2:.1f} ms")

    # --- qp_first: gather vs packed cummax ---
    qc = np.sort(rng.integers(0, 4, (R, A)).astype(np.int32), axis=1)
    qp = np.sort(rng.integers(0, 1 << 24, (R, A)).astype(np.int32), axis=1)
    qc_d, qp_d = put(qc), put(qp)
    cols = jnp.arange(A, dtype=jnp.int32)[None, :]

    def qpf_gather(qc, qp):
        prev = jnp.concatenate(
            [jnp.full((R, 1), -1, jnp.int32), qc[:, :-1]], axis=1)
        seg_start = qc != prev
        seg_idx0 = jnp.maximum(
            jax.lax.cummax(jnp.where(seg_start, cols, -1), axis=1), 0)
        return jnp.take_along_axis(qp, seg_idx0, axis=1)

    def qpf_packed(qc, qp):
        prev = jnp.concatenate(
            [jnp.full((R, 1), -1, jnp.int32), qc[:, :-1]], axis=1)
        seg_start = qc != prev
        w = jnp.where(seg_start, (qc << 24) | qp, -1)
        return jax.lax.cummax(w, axis=1) & 0xFFFFFF

    ga = np.asarray(jax.jit(qpf_gather)(qc_d, qp_d))
    pa = np.asarray(jax.jit(qpf_packed)(qc_d, qp_d))
    ok = "exact" if np.array_equal(ga, pa) else "MISMATCH"
    t_g = bench(qpf_gather, qc_d, qp_d)
    t_p = bench(qpf_packed, qc_d, qp_d)
    print(f"qp_first: gather {t_g:.1f} ms | packed cummax {t_p:.1f} ms "
          f"[{ok}]")


if __name__ == "__main__":
    main()
