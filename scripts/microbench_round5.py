#!/usr/bin/env python3
"""Round-5 kernel golf: tile-size sweep for the two dominant phase-A
kernels (per the round-5 stage profile: expansion fill scatter ~10.9 ms,
ref-side one-hot gather ~8.4 ms of a ~28 ms compute batch).

Theory check: at R=32, A=49152, P=40960 the gather's plane matmuls are
~258 GMAC -> ~1.3 ms at int8 peak, yet measured ~5-8 ms.  Suspect the
per-row fori_loop + small (1024, KB) one-hot tiles starve the MXU.
Sweep the index-tile length AT (and the scatter's chunk PC) to find the
knee.

Usage: python scripts/microbench_round5.py
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
A = int(os.environ.get("MB_A", "49152"))
P = int(os.environ.get("MB_P", "40960"))


LOOP_K = int(os.environ.get("MB_LOOP", "16"))


def bench(fn, *args, reps=5):
    """Per-application cost net of the ~25-30 ms link sync floor: run the
    kernel LOOP_K times inside ONE jit (a data dependency chains the
    iterations so XLA cannot elide them), subtract a 1-iteration run."""

    def chained(k, *a):
        # xor-1 perturbation of the index arg between iterations: keeps
        # indices in-domain (and unique for scatter targets), makes each
        # iteration distinct so XLA cannot CSE them away
        out = None
        a0 = a[0]
        for _ in range(k):
            out = fn(a0, *a[1:])
            a0 = a0 ^ (out.ravel()[0] & 1).astype(a0.dtype)
        return out

    f1 = jax.jit(functools.partial(chained, 1))
    fk = jax.jit(functools.partial(chained, LOOP_K))
    for f in (f1, fk):
        _ = np.asarray(f(*args).ravel()[:4])
    t1 = tk = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(f1(*args).ravel()[:4])
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = np.asarray(fk(*args).ravel()[:4])
        tk = min(tk, time.perf_counter() - t0)
    return 1e3 * (tk - t1) / (LOOP_K - 1)


# --- gather with parametric AT ------------------------------------------
def _gkern(t_ref, i_ref, o_ref, *, KB, BR, AT):
    def body(rr, _):
        tab = t_ref[pl.ds(rr, 1), :].reshape(KB, 128)
        ix = i_ref[pl.ds(rr, 1), :].reshape(AT, 1)
        hi = ix >> 7
        lo = ix & 127
        oh_hi = (hi == jax.lax.broadcasted_iota(jnp.int32, (AT, KB), 1)
                 ).astype(jnp.int8)
        oh_lo = lo == jax.lax.broadcasted_iota(jnp.int32, (AT, 128), 1)
        tabw = jnp.concatenate(
            [((tab >> (8 * p)) & 0xFF).astype(jnp.int8) for p in range(4)],
            axis=1)
        rows4 = jnp.dot(oh_hi, tabw, preferred_element_type=jnp.int32)
        v = jnp.zeros((AT,), jnp.int32)
        for p in range(4):
            rows = rows4[:, p * 128:(p + 1) * 128]
            vp = jnp.sum(jnp.where(oh_lo, rows, 0), axis=1)
            v = v | ((vp & 0xFF) << (8 * p))
        o_ref[pl.ds(rr, 1), :] = v.reshape(1, AT)
        return 0

    jax.lax.fori_loop(0, BR, body, 0)


def gather_at(table, idx, AT, BR):
    Rl, K = table.shape
    _, Al = idx.shape
    kern = functools.partial(_gkern, KB=K // 128, BR=BR, AT=AT)
    blocks = 4 * (BR * K + 2 * BR * AT)
    return pl.pallas_call(
        kern,
        grid=(Rl // BR, Al // AT),
        in_specs=[pl.BlockSpec((BR, K), lambda r, a: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rl, Al), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(int(2.5 * blocks) + (40 << 20),
                                     16 << 20), 110 << 20)),
    )(table, idx)


# --- multi-scatter (V=2) with parametric PC -----------------------------
def _skern(i_ref, v_ref, o_ref, acc, *, KB, PC, NC, BR, V):
    W = V * 4 * 128

    def row(rr, _):
        acc[:] = jnp.zeros_like(acc)

        def chunk(c, _):
            sl = pl.ds(c * PC, PC)
            ix = i_ref[rr, sl].reshape(PC, 1)
            hi = ix >> 7
            lo = ix & 127
            m1 = (hi == jax.lax.broadcasted_iota(jnp.int32, (PC, KB), 1)
                  ).astype(jnp.int8)
            oh_lo = (lo == jax.lax.broadcasted_iota(
                jnp.int32, (PC, 128), 1)).astype(jnp.int32)
            cols = []
            for v in range(V):
                vv = v_ref[rr, v, sl].reshape(PC, 1)
                for p in range(4):
                    cols.append((oh_lo * ((vv >> (8 * p)) & 0xFF)
                                 ).astype(jnp.int8))
            vp = jnp.concatenate(cols, axis=1)
            acc[...] += jax.lax.dot_general(
                m1, vp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return 0

        jax.lax.fori_loop(0, NC, chunk, 0)
        for v in range(V):
            out = jnp.zeros((KB, 128), jnp.int32)
            for p in range(4):
                s = (v * 4 + p) * 128
                vpl = acc[:, pl.ds(s, 128)]
                out = out | ((vpl & 0xFF) << (8 * p))
            o_ref[pl.ds(rr, 1), v, :] = out.reshape(1, KB * 128)
        return 0

    jax.lax.fori_loop(0, BR, row, 0)


def scatter_pc(idx, vals, K, PC, BR):
    Rl, V, Pl = vals.shape
    kern = functools.partial(_skern, KB=K // 128, PC=PC, NC=Pl // PC,
                             BR=BR, V=V)
    blocks = 4 * (BR * Pl * (1 + V) + BR * V * K)
    scratch = (K // 128) * (V * 4 * 128) * 4
    return pl.pallas_call(
        kern,
        grid=(Rl // BR,),
        in_specs=[pl.BlockSpec((BR, Pl), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, V, Pl), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, V, K), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rl, V, K), jnp.int32),
        scratch_shapes=[pltpu.VMEM((K // 128, V * 4 * 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(int(2.5 * blocks) + scratch
                                     + (6 << 20), 16 << 20), 110 << 20)),
    )(idx, vals)


# --- gather variant: lo-select via MXU matmul against a constant
# block-diagonal ones matrix instead of 4 lane reductions ----------------
def _gkern_matsum(t_ref, i_ref, o_ref, *, KB, BR, AT):
    def body(rr, _):
        tab = t_ref[pl.ds(rr, 1), :].reshape(KB, 128)
        ix = i_ref[pl.ds(rr, 1), :].reshape(AT, 1)
        hi = ix >> 7
        lo = ix & 127
        oh_hi = (hi == jax.lax.broadcasted_iota(jnp.int32, (AT, KB), 1)
                 ).astype(jnp.int8)
        oh_lo = lo == jax.lax.broadcasted_iota(jnp.int32, (AT, 128), 1)
        tabw = jnp.concatenate(
            [((tab >> (8 * p)) & 0xFF).astype(jnp.int8) for p in range(4)],
            axis=1)
        rows4 = jnp.dot(oh_hi, tabw, preferred_element_type=jnp.int32)
        # mask built directly on the 512 lanes (no bool concat — Mosaic
        # mislowers the concatenated-select on hardware) and applied as
        # an int32 product before the int8 downcast; masked values are
        # signed bytes (-128..127) so the int8 matmul is exact
        # per-plane (AT,128)x(128,128) dots against a rank-1 ones column
        # (the single 512-contraction dot mislowered on hardware:
        # byte-plane 2 zeroed on alternating sublanes, exact in
        # interpret mode — recorded Mosaic bug)
        oh8 = oh_lo.astype(jnp.int8)
        ones_col = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
                    == 0).astype(jnp.int8)
        v = jnp.zeros((AT,), jnp.int32)
        for p in range(4):
            rows = rows4[:, p * 128:(p + 1) * 128]
            masked = (oh8.astype(jnp.int32) * rows).astype(jnp.int8)
            s = jnp.dot(masked, ones_col,
                        preferred_element_type=jnp.int32)[:, 0]
            v = v | ((s & 0xFF) << (8 * p))
        o_ref[pl.ds(rr, 1), :] = v.reshape(1, AT)
        return 0

    jax.lax.fori_loop(0, BR, body, 0)


def gather_matsum(table, idx, AT, BR):
    Rl, K = table.shape
    _, Al = idx.shape
    kern = functools.partial(_gkern_matsum, KB=K // 128, BR=BR, AT=AT)
    blocks = 4 * (BR * K + 2 * BR * AT)
    return pl.pallas_call(
        kern,
        grid=(Rl // BR, Al // AT),
        in_specs=[pl.BlockSpec((BR, K), lambda r, a: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rl, Al), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(int(2.5 * blocks) + (40 << 20),
                                     16 << 20), 110 << 20)),
    )(table, idx)


# --- gather ablations: where do the ~5.6 ms go? ------------------------
def _gkern_ablate(t_ref, i_ref, o_ref, *, KB, BR, AT, mode):
    def body(rr, _):
        tab = t_ref[pl.ds(rr, 1), :].reshape(KB, 128)
        ix = i_ref[pl.ds(rr, 1), :].reshape(AT, 1)
        hi = ix >> 7
        lo = ix & 127
        oh_hi = (hi == jax.lax.broadcasted_iota(jnp.int32, (AT, KB), 1)
                 ).astype(jnp.int8)
        if mode == "build":      # one-hot build only, no matmul
            o_ref[pl.ds(rr, 1), :] = (
                jnp.sum(oh_hi.astype(jnp.int32), axis=1)
                + lo.reshape(AT)).reshape(1, AT)
            return 0
        oh_lo = lo == jax.lax.broadcasted_iota(jnp.int32, (AT, 128), 1)
        tabw = jnp.concatenate(
            [((tab >> (8 * p)) & 0xFF).astype(jnp.int8) for p in range(4)],
            axis=1)
        rows4 = jnp.dot(oh_hi, tabw, preferred_element_type=jnp.int32)
        if mode == "matmul":     # build + matmul, skip the lo select
            o_ref[pl.ds(rr, 1), :] = rows4[:, :AT // 4].reshape(
                4, AT // 4).sum(axis=0).reshape(1, AT) \
                if AT >= 512 else rows4.sum(axis=1).reshape(1, AT)
            return 0
        v = jnp.zeros((AT,), jnp.int32)
        for p in range(4):
            rows = rows4[:, p * 128:(p + 1) * 128]
            vp = jnp.sum(jnp.where(oh_lo, rows, 0), axis=1)
            v = v | ((vp & 0xFF) << (8 * p))
        o_ref[pl.ds(rr, 1), :] = v.reshape(1, AT)
        return 0

    jax.lax.fori_loop(0, BR, body, 0)


def gather_ablate(table, idx, AT, BR, mode):
    Rl, K = table.shape
    _, Al = idx.shape
    kern = functools.partial(_gkern_ablate, KB=K // 128, BR=BR, AT=AT,
                             mode=mode)
    blocks = 4 * (BR * K + 2 * BR * AT)
    return pl.pallas_call(
        kern,
        grid=(Rl // BR, Al // AT),
        in_specs=[pl.BlockSpec((BR, K), lambda r, a: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rl, Al), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(int(2.5 * blocks) + (40 << 20),
                                     16 << 20), 110 << 20)),
    )(table, idx)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device={dev} R={R} A={A} P={P}", flush=True)
    put = lambda x: jax.device_put(jnp.asarray(x), dev)

    # gather: (R, P) table, (R, A) indices
    table_np = rng.integers(-(1 << 31), 1 << 31, (R, P),
                            dtype=np.int64).astype(np.int32)
    idx_np = rng.integers(0, P, (R, A)).astype(np.int32)
    ref = np.take_along_axis(table_np, idx_np, axis=1)
    table, idx = put(table_np), put(idx_np)

    for AT in (1024, 4096):
        try:
            fn = jax.jit(functools.partial(gather_at, AT=AT, BR=8))
            got = np.asarray(fn(table, idx))
            ok = "exact" if np.array_equal(ref, got) else "MISMATCH"
            print(f"gather AT={AT} BR=8: {bench(fn, table, idx):.2f}"
                  f" ms [{ok}]", flush=True)
        except Exception as e:
            print(f"gather AT={AT} BR=8: FAILED "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    for AT in (1024, 4096):
        try:
            fn = jax.jit(functools.partial(gather_matsum, AT=AT, BR=8))
            got = np.asarray(fn(table, idx))
            ok = "exact" if np.array_equal(ref, got) else "MISMATCH"
            print(f"gather[matsum] AT={AT}: {bench(fn, table, idx):.2f}"
                  f" ms [{ok}]", flush=True)
        except Exception as e:
            print(f"gather[matsum] AT={AT}: FAILED "
                  f"{str(e).splitlines()[0][:120]}", flush=True)

    # genome-cached map gather vs the generic one-hot at the SAME work:
    # jw (R, K) mapped through per-genome constant skid rows
    from skani_tpu.kernels.gather_pallas import (genome_map_gather,
                                                 mxu_row_gather)
    G = 8
    K = P  # kmer table width ~ position count at these shapes
    skid_np = rng.integers(0, K, (G, P)).astype(np.int32)
    # rows sorted by genome, ~4 rows per genome (triangle-like)
    ai_np = np.sort(rng.integers(0, G, R)).astype(np.int32)
    jw_np = rng.integers(-(1 << 31), 1 << 31, (R, K),
                         dtype=np.int64).astype(np.int32)
    skid_d, ai_d, jw_d = put(skid_np), put(ai_np), put(jw_np)
    gexp = np.stack([jw_np[r][skid_np[ai_np[r]]] for r in range(R)])
    try:
        fn = jax.jit(lambda s, a, j: genome_map_gather(s, a, j))
        got = np.asarray(fn(skid_d, ai_d, jw_d))
        ok = "exact" if np.array_equal(gexp, got) else "MISMATCH"
        # chain through jw (3rd arg): wrap to put jw first for bench()
        fnb = jax.jit(lambda j, s, a: genome_map_gather(s, a, j))
        print(f"gmap sorted-rows: {bench(fnb, jw_d, skid_d, ai_d):.2f} ms "
              f"[{ok}]", flush=True)
        skid_rows = put(skid_np[ai_np])
        # plain comparison: generic one-hot gather of jw at skid rows
        fng = jax.jit(lambda j, srows: mxu_row_gather(
            j, jnp.clip(srows, 0, j.shape[1] - 1)))
        got2 = np.asarray(fng(jw_d, skid_rows))
        ok2 = "exact" if np.array_equal(gexp, got2) else "MISMATCH"
        print(f"generic one-hot same work: "
              f"{bench(fng, jw_d, skid_rows):.2f} ms [{ok2}]", flush=True)
    except Exception as e:
        print(f"gmap: FAILED {str(e).splitlines()[0][:160]}", flush=True)

    for mode in ("build", "matmul"):
        for AT in (1024, 4096):
            try:
                fn = jax.jit(functools.partial(gather_ablate, AT=AT, BR=8,
                                               mode=mode))
                _ = np.asarray(fn(table, idx))
                print(f"gather[{mode}] AT={AT}: "
                      f"{bench(fn, table, idx):.2f} ms", flush=True)
            except Exception as e:
                print(f"gather[{mode}] AT={AT}: FAILED "
                      f"{str(e).splitlines()[0][:120]}", flush=True)

    # scatter: unique targets
    tgt_np = np.zeros((R, P), np.int32)
    for r in range(R):
        perm = rng.permutation(A)[:P]
        tgt_np[r] = perm
    vals_np = rng.integers(-(1 << 31), 1 << 31, (R, 2, P),
                           dtype=np.int64).astype(np.int32)
    sref = np.zeros((R, 2, A), np.int32)
    for r in range(R):
        sref[r][:, tgt_np[r]] = vals_np[r]
    tgt, vals = put(tgt_np), put(vals_np)

    for PC in (2048, 4096):
        try:
            fn = jax.jit(functools.partial(
                lambda i, v, PC, BR: scatter_pc(i, v, A, PC, BR),
                PC=PC, BR=8))
            got = np.asarray(fn(tgt, vals))
            ok = "exact" if np.array_equal(sref, got) else "MISMATCH"
            print(f"scatter PC={PC} BR=8: "
                  f"{bench(fn, tgt, vals):.2f} ms [{ok}]", flush=True)
        except Exception as e:
            print(f"scatter PC={PC} BR=8: FAILED "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
