"""Row-wise gather as an MXU one-hot kernel.

TPU gather hardware is slow (~10 ns/element via XLA at our shapes); the
MXU is not.  gather(table[r], idx[r]) decomposes as a two-level one-hot
select: `idx >> 7` picks a 128-wide block of the table row via a
(AT, K/128) @ (K/128, 128) matmul, `idx & 127` picks within the block via
a masked reduce.  EXACTNESS: "f32" MXU matmuls run at bf16 input precision,
so the int32 table is split into FOUR 8-bit planes — bf16 represents
0..255 exactly, each one-hot row has a single nonzero, and accumulation is
f32, so every plane product is exact and the OR-reconstruction is
bit-perfect for arbitrary int32 (including negative bit patterns).

Measured ~2x the XLA flat gather at (32, 57344) indices over (32, 40960)
tables; the advantage grows with index count.  Used by phase A's anchor
expansion; falls back to the XLA flat gather off-TPU.
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

AT = 1024  # index-tile length

# Shape-contract helpers (round 5): every kernel below holds whole row
# blocks in VMEM, so legality is (a) the Pallas block rule — the
# second-to-minor block dim must be divisible by 8 or equal the array
# dim — and (b) a VMEM budget for the double-buffered blocks.  Callers
# route shapes that fail either test to the XLA fallback instead of
# crashing at Mosaic compile time (the compile-time analog of the
# engine's runtime overflow-pair fallback).
_VMEM_CAP = 100 << 20   # leave headroom under the ~128 MB v5e VMEM


def _br_for(R: int) -> int:
    """Largest legal Pallas row-block count for an R-row array."""
    return 8 if R % 8 == 0 else R


def _vmem_limit(block_bytes: int, scratch_bytes: int = 0) -> int:
    """Scoped-vmem limit sized like dp_compact: 2.5x the (double-
    buffered) blocks plus scratch plus slack, clamped to the chip."""
    return min(max(int(2.5 * block_bytes) + scratch_bytes + (6 << 20),
                   16 << 20), 110 << 20)


def mxu_gather_ok(R: int, K: int, A: int,
                  max_k: int | None = None) -> bool:
    """True when mxu_row_gather both compiles and is expected to beat the
    XLA flat gather.  The one-hot matmul cost scales linearly with the
    table width K while the flat gather's does not (measured: MXU 2.7 ms
    vs XLA 13 ms at K=40960, R=32, A=49152 -> linear crossover ~190k),
    so wide tables are routed to XLA both for VMEM and for speed."""
    if K % 128 != 0 or A % AT != 0:
        return False
    if max_k is None:
        max_k = int(os.environ.get("SKANI_TPU_MXU_GATHER_MAXK",
                                   str(1 << 17)))
    if K > max_k:
        return False
    BR = _br_for(R)
    blocks = 4 * (BR * K + 2 * BR * AT)
    return 2 * blocks <= _VMEM_CAP


def mxu_scatter_ok(R: int, P: int, K: int, V: int = 1) -> bool:
    """True when the one-hot scatter kernels compile within VMEM
    (P = source width, K = target width, V = payload count)."""
    if K % 128 != 0 or P % 2048 != 0:
        return False
    BR = _br_for(R)
    blocks = 4 * (BR * P * (1 + V) + BR * V * K)
    scratch = (K // 128) * (V * 4 * 128) * 4
    return 2 * blocks + scratch <= _VMEM_CAP


def windowed_gather_ok(R: int, U: int, A: int, WB: int = 64) -> bool:
    """True when windowed_sorted_gather compiles within VMEM (the table
    block is still whole rows; only the matmul is windowed)."""
    if U % 1024 != 0 or A % AT != 0 or U < WB * 128:
        return False
    BR = _br_for(R)
    blocks = 4 * (BR * U + 2 * BR * AT)
    return 2 * blocks <= _VMEM_CAP


def _ones_col(pt):
    """(128, 128) matrix with a ones first column: contracting a masked
    (N, 128) plane against it sums the lanes ON THE MXU — measured ~20%
    faster than the VPU lane reduction it replaces at production shapes
    (scripts/microbench_round5.py gather[matsum]).  NOTE: a single
    (N, 512) x (512, 128) block-diagonal formulation of the same sum
    MISLOWERS on hardware (byte-plane 2 zeroed on alternating sublanes,
    exact in interpret mode) — keep the contraction at 128."""
    return (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) == 0
            ).astype(pt)


def _lo_select(rows4, oh_lo, i8):
    """Per-plane one-hot lane selection: v |= plane_p(rows4) at the
    oh_lo lane, planes reduced by MXU ones-column dots (see _ones_col).
    Exact: each masked plane holds signed bytes (i8) or exact small
    integers (bf16/f32), single nonzero per row."""
    n = rows4.shape[0]
    pt = jnp.int8 if i8 else jnp.bfloat16
    oc = _ones_col(pt)
    v = jnp.zeros((n,), jnp.int32)
    for p in range(4):
        rows = rows4[:, p * 128:(p + 1) * 128]
        if i8:
            masked = (oh_lo.astype(jnp.int32) * rows).astype(jnp.int8)
            s = jnp.dot(masked, oc,
                        preferred_element_type=jnp.int32)[:, 0]
            v = v | ((s & 0xFF) << (8 * p))
        else:
            masked = (oh_lo.astype(jnp.float32) * rows).astype(pt)
            s = jnp.dot(masked, oc,
                        preferred_element_type=jnp.float32)[:, 0]
            v = v | (s.astype(jnp.int32) << (8 * p))
    return v


def _use_i8() -> bool:
    """int8 plane matmuls (v5e MXU runs int8 x int8 -> int32 at 2x the
    bf16 rate).  A byte plane re-read as SIGNED int8 is still exact: each
    one-hot row/column contributes at most ONE nonzero product, so the
    signed value never mixes with another and `& 0xFF` recovers the
    original byte bit pattern.  Hardware A/B covering ALL THREE kernels
    (scripts/microbench_int8.py, PERF.md round-4 table): exact on gather,
    scatter and windowed gather; the win is small (the one-hot build, not
    the matmul, dominates) but real.  SKANI_TPU_ONEHOT_I8=0 restores bf16;
    each kernel also takes an explicit `i8=` override for A/B tests."""
    return os.environ.get("SKANI_TPU_ONEHOT_I8", "1") == "1"


def _resolve_i8(i8) -> bool:
    return _use_i8() if i8 is None else bool(i8)


def _wg_kern(t_ref, i_ref, o_ref, *, UB, WB, BR, i8):
    # windowed gather for SORTED per-row indices: each 1024-index tile
    # spans a narrow table range, so the one-hot matmul runs against a
    # WB-block window (dynamic sublane slice) instead of all UB blocks.
    # The four 8-bit planes concatenate along the lane axis so the tile
    # runs ONE (AT, WB) x (WB, 512) dot instead of four narrow ones.
    def row(rr, _):
        ix = i_ref[pl.ds(rr, 1), :]                     # (1, AT)
        lo_blk = jnp.clip(jnp.min(ix) >> 7, 0, UB - WB)
        win = t_ref[rr, pl.ds(lo_blk, WB), :]           # (WB, 128)
        rel = (ix - lo_blk * 128).reshape(AT, 1)
        hi = rel >> 7
        lo = rel & 127
        # out-of-window rel (overflow tiles, flagged by the caller in
        # XLA) hits no one-hot row and reads as 0 — the caller's per-row
        # overflow routes those pairs to the exact fallback
        pt = jnp.int8 if i8 else jnp.bfloat16
        oh_hi = (hi == jax.lax.broadcasted_iota(jnp.int32, (AT, WB), 1)
                 ).astype(pt)
        oh_lo = lo == jax.lax.broadcasted_iota(jnp.int32, (AT, 128), 1)
        winw = jnp.concatenate(
            [((win >> (8 * p)) & 0xFF).astype(pt) for p in range(4)],
            axis=1)                                      # (WB, 512)
        rows4 = jnp.dot(oh_hi, winw,
                        preferred_element_type=(jnp.int32 if i8
                                                else jnp.float32))
        v = _lo_select(rows4, oh_lo, i8)
        o_ref[pl.ds(rr, 1), :] = v.reshape(1, AT)
        return 0

    jax.lax.fori_loop(0, BR, row, 0)


def windowed_sorted_gather(table, idx, WB: int = 64,
                           interpret: bool = False, i8=None):
    """take_along_axis(table, idx, axis=1) for idx NONDECREASING per row.

    Each AT-index tile gathers from a WB*128-wide dynamically-placed
    window of the table, so cost scales with the tile's index RANGE, not
    the table width — ~15x less matmul than mxu_row_gather at the dense
    join's union-axis widths.  Returns (out, ovf) where ovf[r] is True
    when some tile's range exceeded the window (those rows' values are
    unreliable; callers must route them to an exact fallback).  The
    table width must be a multiple of 1024 and >= WB*128; index width a
    multiple of 1024."""
    R, U = table.shape
    _, A = idx.shape
    assert U % 1024 == 0 and A % AT == 0
    UB = U // 128
    assert WB <= UB
    BR = _br_for(R)
    t3 = table.reshape(R, UB, 128)
    kern = functools.partial(_wg_kern, UB=UB, WB=WB, BR=BR,
                             i8=_resolve_i8(i8))
    out = pl.pallas_call(
        kern,
        grid=(R // BR, A // AT),
        in_specs=[pl.BlockSpec((BR, UB, 128), lambda r, a: (r, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, A), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(4 * (BR * U + 2 * BR * AT))),
        interpret=interpret,
    )(t3, idx)
    # per-tile range check in XLA (cheap reductions), mirroring the
    # kernel's clamped window placement exactly
    it = idx.reshape(R, A // AT, AT)
    lo_blk = jnp.clip(jnp.min(it, axis=2) >> 7, 0, UB - WB)
    ovf = jnp.any((jnp.max(it, axis=2) >> 7) - lo_blk >= WB, axis=1)
    return out, ovf


def _kern(t_ref, i_ref, o_ref, *, KB, BR, i8):
    # full-table gather; planes concatenated along the lane axis so each
    # tile runs ONE (AT, KB) x (KB, 512) dot instead of four narrow ones
    def body(rr, _):
        tab = t_ref[pl.ds(rr, 1), :].reshape(KB, 128)
        ix = i_ref[pl.ds(rr, 1), :].reshape(AT, 1)
        hi = ix >> 7
        lo = ix & 127
        pt = jnp.int8 if i8 else jnp.bfloat16
        oh_hi = (hi == jax.lax.broadcasted_iota(jnp.int32, (AT, KB), 1)
                 ).astype(pt)
        oh_lo = lo == jax.lax.broadcasted_iota(jnp.int32, (AT, 128), 1)
        tabw = jnp.concatenate(
            [((tab >> (8 * p)) & 0xFF).astype(pt) for p in range(4)],
            axis=1)                                      # (KB, 512)
        rows4 = jnp.dot(oh_hi, tabw,
                        preferred_element_type=(jnp.int32 if i8
                                                else jnp.float32))
        v = _lo_select(rows4, oh_lo, i8)
        o_ref[pl.ds(rr, 1), :] = v.reshape(1, AT)
        return 0

    jax.lax.fori_loop(0, BR, body, 0)


def _scat_kern(i_ref, v_ref, o_ref, acc, *, P, KB, PC, NC, BR, i8):
    # one grid step = BR rows.  out[r, idx[r, p]] = val[r, p] for idx in
    # range, 0 elsewhere.  Per row, decompose out into KB 128-blocks:
    # out = M1^T @ V with M1[p, b] one-hot of idx>>7 and V[p, l] =
    # [idx&127 == l] * plane(val) — both single-nonzero per row, so bf16
    # (or signed-int8, see _use_i8) products with f32/int32 accumulation
    # are exact, as in the gather kernel below.
    pt = jnp.int8 if i8 else jnp.bfloat16

    def row(rr, _):
        acc[:] = jnp.zeros_like(acc)

        def chunk(c, _):
            sl = pl.ds(c * PC, PC)
            ix = i_ref[rr, sl].reshape(PC, 1)
            vv = v_ref[rr, sl].reshape(PC, 1)
            hi = ix >> 7
            lo = ix & 127
            m1 = (hi == jax.lax.broadcasted_iota(jnp.int32, (PC, KB), 1)
                  ).astype(pt)
            # plane multiply, not a where: Mosaic (2026-08) hits an i1
            # relayout bug broadcasting a (PC, 1) operand into a
            # (PC, 128) bool-mask select.  The mask product runs in int32
            # (Mosaic cannot legalize an int8 elementwise muli) and casts
            # down — one-hot x byte fits int8 (the one-hot factor is 0/1,
            # and the signed-byte wrap is undone by the final & 0xFF).
            oh_lo = (lo == jax.lax.broadcasted_iota(
                jnp.int32, (PC, 128), 1)).astype(jnp.int32 if i8 else pt)

            def plane(p, _):
                if i8:
                    vp = (oh_lo * ((vv >> (8 * p)) & 0xFF)).astype(pt)
                else:
                    vp = oh_lo * ((vv >> (8 * p)) & 0xFF).astype(pt)
                prod = jax.lax.dot_general(
                    m1, vp, (((0,), (0,)), ((), ())),
                    preferred_element_type=(jnp.int32 if i8
                                            else jnp.float32))  # (KB, 128)
                acc[pl.ds(p * KB, KB), :] += prod
                return 0

            jax.lax.fori_loop(0, 4, plane, 0)
            return 0

        jax.lax.fori_loop(0, NC, chunk, 0)
        v = jnp.zeros((KB, 128), jnp.int32)
        for p in range(4):
            vp = acc[pl.ds(p * KB, KB), :].astype(jnp.int32)
            v = v | ((vp & 0xFF if i8 else vp) << (8 * p))
        o_ref[pl.ds(rr, 1), :] = v.reshape(1, KB * 128)
        return 0

    jax.lax.fori_loop(0, BR, row, 0)


def mxu_row_scatter(idx, vals, K, interpret: bool = False, i8=None):
    """out[r, idx[r, p]] = vals[r, p]; zeros elsewhere.  Targets must be
    unique per row (or >= K to drop).  K a multiple of 128, the source
    width a multiple of 2048.  The MXU analog of
    `zeros((R, K)).at[rowi, idx].set(vals, mode="drop")` — measured vs
    the XLA scatter in scripts/microbench_phasea.py before landing."""
    R, P = idx.shape
    assert K % 128 == 0
    PC = 2048
    assert P % PC == 0
    BR = _br_for(R)
    i8 = _resolve_i8(i8)
    kern = functools.partial(_scat_kern, P=P, KB=K // 128, PC=PC,
                             NC=P // PC, BR=BR, i8=i8)
    scratch = 4 * (K // 128) * 128 * 4
    return pl.pallas_call(
        kern,
        grid=(R // BR,),
        in_specs=[pl.BlockSpec((BR, P), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, P), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, K), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, K), jnp.int32),
        scratch_shapes=[pltpu.VMEM((4 * (K // 128), 128),
                                   jnp.int32 if i8 else jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(4 * (2 * BR * P + BR * K),
                                         scratch)),
        interpret=interpret,
    )(idx, vals)


def _scat_multi_kern(i_ref, v_ref, o_ref, acc, *, P, KB, PC, NC, BR, V, i8):
    # V-payload variant of _scat_kern: the one-hot factors (m1, oh_lo) are
    # payload-independent and dominate the kernel cost, so scattering V
    # payloads at the same targets costs ~1 one-hot build + 4V plane
    # matmuls instead of V full scatters.
    pt = jnp.int8 if i8 else jnp.bfloat16

    def row(rr, _):
        acc[:] = jnp.zeros_like(acc)

        def chunk(c, _):
            sl = pl.ds(c * PC, PC)
            ix = i_ref[rr, sl].reshape(PC, 1)
            hi = ix >> 7
            lo = ix & 127
            m1 = (hi == jax.lax.broadcasted_iota(jnp.int32, (PC, KB), 1)
                  ).astype(pt)
            oh_lo = (lo == jax.lax.broadcasted_iota(
                jnp.int32, (PC, 128), 1)).astype(jnp.int32 if i8 else pt)
            for v in range(V):
                vv = v_ref[rr, v, sl].reshape(PC, 1)

                def plane(p, _, vv=vv, v=v):
                    if i8:
                        vp = (oh_lo * ((vv >> (8 * p)) & 0xFF)).astype(pt)
                    else:
                        vp = oh_lo * ((vv >> (8 * p)) & 0xFF).astype(pt)
                    prod = jax.lax.dot_general(
                        m1, vp, (((0,), (0,)), ((), ())),
                        preferred_element_type=(jnp.int32 if i8
                                                else jnp.float32))
                    acc[pl.ds((v * 4 + p) * KB, KB), :] += prod
                    return 0

                jax.lax.fori_loop(0, 4, plane, 0)
            return 0

        jax.lax.fori_loop(0, NC, chunk, 0)
        for v in range(V):
            out = jnp.zeros((KB, 128), jnp.int32)
            for p in range(4):
                vp = acc[pl.ds((v * 4 + p) * KB, KB), :].astype(jnp.int32)
                out = out | ((vp & 0xFF if i8 else vp) << (8 * p))
            o_ref[pl.ds(rr, 1), v, :] = out.reshape(1, KB * 128)
        return 0

    jax.lax.fori_loop(0, BR, row, 0)


def mxu_row_scatter_multi(idx, vals, K, interpret: bool = False, i8=None):
    """out[r, v, idx[r, p]] = vals[r, v, p]; zeros elsewhere.  vals is
    (R, V, P) — V payloads scattered at the SAME per-row targets for
    roughly the cost of one scatter (the one-hot build dominates; the V*4
    plane matmuls ride the MXU).  Same constraints as mxu_row_scatter."""
    R, V, P = vals.shape
    assert idx.shape == (R, P)
    assert K % 128 == 0
    PC = 2048
    assert P % PC == 0
    # Pallas block rule: the row-block must be divisible by 8 or equal R
    # (the old BR=4 shrink for V>2 was ILLEGAL at e.g. R=12 and crashed
    # at Mosaic compile time); VMEM pressure is handled by the sized
    # vmem_limit below plus the caller-side mxu_scatter_ok predicate
    BR = _br_for(R)
    i8 = _resolve_i8(i8)
    kern = functools.partial(_scat_multi_kern, P=P, KB=K // 128, PC=PC,
                             NC=P // PC, BR=BR, V=V, i8=i8)
    # double-buffered blocks exceed the default 16 MB scoped-vmem limit
    # at production shapes — size the limit like dp_compact does
    blocks = 4 * (BR * P * (1 + V) + BR * V * K)     # idx + vals + out
    scratch = (V * 4 * (K // 128)) * 128 * 4
    vmem_limit = min(max(int(2.5 * blocks) + scratch + (6 << 20), 16 << 20),
                     110 << 20)
    return pl.pallas_call(
        kern,
        grid=(R // BR,),
        in_specs=[pl.BlockSpec((BR, P), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, V, P), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, V, K), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, V, K), jnp.int32),
        scratch_shapes=[pltpu.VMEM((V * 4 * (K // 128), 128),
                                   jnp.int32 if i8 else jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(idx, vals)


def _scat_multi_wide_kern(i_ref, v_ref, o_ref, acc, *, P, KB, PC, NC, BR, V,
                          i8):
    # wide-dot variant: the V*4 plane vectors concatenate along the output
    # (lane) axis so each chunk runs ONE (PC, KB) x (PC, V*4*128) matmul
    # instead of V*4 narrow ones — fewer launches, fuller MXU tiles.
    pt = jnp.int8 if i8 else jnp.bfloat16
    W = V * 4 * 128

    def row(rr, _):
        acc[:] = jnp.zeros_like(acc)

        def chunk(c, _):
            sl = pl.ds(c * PC, PC)
            ix = i_ref[rr, sl].reshape(PC, 1)
            hi = ix >> 7
            lo = ix & 127
            m1 = (hi == jax.lax.broadcasted_iota(jnp.int32, (PC, KB), 1)
                  ).astype(pt)
            oh_lo = (lo == jax.lax.broadcasted_iota(
                jnp.int32, (PC, 128), 1)).astype(jnp.int32 if i8 else pt)
            cols = []
            for v in range(V):
                vv = v_ref[rr, v, sl].reshape(PC, 1)
                for p in range(4):
                    if i8:
                        cols.append((oh_lo * ((vv >> (8 * p)) & 0xFF)
                                     ).astype(pt))
                    else:
                        cols.append(oh_lo
                                    * ((vv >> (8 * p)) & 0xFF).astype(pt))
            vp = jnp.concatenate(cols, axis=1)            # (PC, W)
            acc[...] += jax.lax.dot_general(
                m1, vp, (((0,), (0,)), ((), ())),
                preferred_element_type=(jnp.int32 if i8 else jnp.float32))
            return 0

        jax.lax.fori_loop(0, NC, chunk, 0)
        for v in range(V):
            out = jnp.zeros((KB, 128), jnp.int32)
            for p in range(4):
                s = (v * 4 + p) * 128
                vpl = acc[:, pl.ds(s, 128)].astype(jnp.int32)
                out = out | ((vpl & 0xFF if i8 else vpl) << (8 * p))
            o_ref[pl.ds(rr, 1), v, :] = out.reshape(1, KB * 128)
        return 0

    jax.lax.fori_loop(0, BR, row, 0)


def mxu_row_scatter_multi_wide(idx, vals, K, interpret: bool = False,
                               i8=None):
    """Same contract as mxu_row_scatter_multi; wide-dot kernel layout."""
    R, V, P = vals.shape
    assert idx.shape == (R, P)
    assert K % 128 == 0
    # 4096-chunks when the source allows: same MACs, half the chunk-loop
    # iterations and fuller MXU tiles (hardware A/B: 4.23 vs 4.56 ms at
    # (32, 2, 40960) -> (32, 2, 49152), scripts/microbench_round5.py)
    PC = 4096 if P % 4096 == 0 else 2048
    assert P % PC == 0
    BR = _br_for(R)   # block rule: divisible by 8 or equal R (see multi)
    i8 = _resolve_i8(i8)
    kern = functools.partial(_scat_multi_wide_kern, P=P, KB=K // 128, PC=PC,
                             NC=P // PC, BR=BR, V=V, i8=i8)
    blocks = 4 * (BR * P * (1 + V) + BR * V * K)
    scratch = (K // 128) * (V * 4 * 128) * 4
    vmem_limit = min(max(int(2.5 * blocks) + scratch + (6 << 20), 16 << 20),
                     110 << 20)
    return pl.pallas_call(
        kern,
        grid=(R // BR,),
        in_specs=[pl.BlockSpec((BR, P), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, V, P), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, V, K), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, V, K), jnp.int32),
        scratch_shapes=[pltpu.VMEM((K // 128, V * 4 * 128),
                                   jnp.int32 if i8 else jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(idx, vals)


def _gmap_kern(a_ref, skid_ref, jw_ref, o_ref, oh_hi, oh_lo, jw4w,
               *, P, KB, PT, NP):
    # genome-cached one-hot map gather: out[r, p] = jw[r, skid[a[r], p]].
    # The one-hot factors depend only on the QUERY GENOME's constant skid
    # row, so they are (re)built in scratch only when the genome changes
    # between consecutive grid steps (the dispatcher sorts batch rows by
    # query genome) — the per-row VPU one-hot build, which dominates the
    # generic mxu_row_gather (~3.5 of ~5.6 ms at production shapes, see
    # scripts/microbench_round5.py), amortizes over all of a genome's
    # rows.  The plane matmuls still run per row on the MXU.
    r = pl.program_id(0)
    prev = a_ref[jnp.maximum(r - 1, 0)]
    rebuild = (r == 0) | (a_ref[r] != prev)

    @pl.when(rebuild)
    def _():
        sk = skid_ref[0, 0, :].reshape(P, 1)
        oh_hi[...] = ((sk >> 7) == jax.lax.broadcasted_iota(
            jnp.int32, (P, KB), 1)).astype(jnp.int8)
        oh_lo[...] = ((sk & 127) == jax.lax.broadcasted_iota(
            jnp.int32, (P, 128), 1)).astype(jnp.int8)

    tab = jw_ref[0, 0, :].reshape(KB, 128)
    jw4w[...] = jnp.concatenate(
        [((tab >> (8 * p)) & 0xFF).astype(jnp.int8) for p in range(4)],
        axis=1)                                       # (KB, 512)

    def tile(pt, _):
        sl = pl.ds(pt * PT, PT)
        rows4 = jnp.dot(oh_hi[sl, :], jw4w[...],
                        preferred_element_type=jnp.int32)   # (PT, 512)
        o_ref[0, 0, sl] = _lo_select(rows4, oh_lo[sl, :], True)
        return 0

    jax.lax.fori_loop(0, NP, tile, 0)


def genome_map_gather_ok(G: int, P: int, K: int) -> bool:
    """True when genome_map_gather compiles within VMEM: the cached
    one-hot scratch is P x (KB + 128) int8 plus the (PT, 512) i32
    matmul tile."""
    if P % 4096 != 0 or K % 128 != 0 or P >= (1 << 19):
        return False
    KB = K // 128
    kb_pad = ((KB + 127) // 128) * 128
    scratch = P * (kb_pad + 128) + KB * 512 + 4096 * 512 * 4
    blocks = 4 * (P + K + P)
    return 2 * blocks + scratch <= _VMEM_CAP


def genome_map_gather(skid, a_idx, jw, interpret: bool = False):
    """out[r, p] = jw[r, skid[a_idx[r], p]] — the join-word kmer->position
    mapping with per-GENOME one-hot caching (see _gmap_kern).  skid is
    the full (G, P) device table; a_idx (R,) int32 selects each row's
    genome (rows should be sorted by a_idx for maximal cache reuse —
    correctness does not depend on it).  Padding positions (skid == 0)
    read jw[:, 0]; callers mask with valid_p exactly as they do for the
    generic gather."""
    G, P = skid.shape
    R, K = jw.shape
    KB = K // 128
    PT = 4096
    assert P % PT == 0 and K % 128 == 0
    kern = functools.partial(_gmap_kern, P=P, KB=KB, PT=PT, NP=P // PT)
    kb_pad = ((KB + 127) // 128) * 128
    scratch = P * (kb_pad + 128) + KB * 512 + PT * 512 * 4
    vmem_limit = min(max(2 * 4 * (P + K + P) + scratch + (8 << 20),
                         16 << 20), 110 << 20)
    # unit middle axis: a (1, 1, P) block's LAST TWO dims match the
    # (G, 1, P) array, satisfying the Pallas block rule for 1-row blocks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R,),
        in_specs=[pl.BlockSpec((1, 1, P), lambda r, a_ref: (a_ref[r], 0, 0)),
                  pl.BlockSpec((1, 1, K), lambda r, a_ref: (r, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, P), lambda r, a_ref: (r, 0, 0)),
        scratch_shapes=[pltpu.VMEM((P, KB), jnp.int8),
                        pltpu.VMEM((P, 128), jnp.int8),
                        pltpu.VMEM((KB, 512), jnp.int8)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, 1, P), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(a_idx, skid.reshape(G, 1, P), jw.reshape(R, 1, K))
    return out.reshape(R, P)


def mxu_row_gather(table, idx, interpret: bool = False, i8=None):
    """take_along_axis(table, idx, axis=1) on the MXU.  Requires the table
    width to be a multiple of 128 and the index width a multiple of 1024
    (both hold for DeviceDb's 4096-padded tensors); indices must be in
    range (callers clip)."""
    R, K = table.shape
    _, A = idx.shape
    assert K % 128 == 0 and A % AT == 0
    BR = _br_for(R)
    kern = functools.partial(_kern, KB=K // 128, BR=BR, i8=_resolve_i8(i8))
    return pl.pallas_call(
        kern,
        grid=(R // BR, A // AT),
        in_specs=[pl.BlockSpec((BR, K), lambda r, a: (r, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, AT), lambda r, a: (r, a),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, A), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(4 * (BR * K + 2 * BR * AT))),
        interpret=interpret,
    )(table, idx)
