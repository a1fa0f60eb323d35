"""Banded chaining DP as a Pallas TPU kernel.

The reference's per-chunk quadratic-with-band chaining DP (reference:
src/chain.rs:838-896) over anchors regrouped to rows-per-chunk.  Two
implementations with identical semantics:

  * `_dp_pallas` — a Pallas kernel: each grid block holds a (L, RC_B) tile
    of the anchor stream in VMEM and walks the L anchor positions
    sequentially with a ring buffer (power of two > band) of the trailing
    band window, vectorized across RC_B chunk rows (lanes).  All arithmetic is int32
    (scores are integers: anchor_score minus integer gaps), bit-identical
    to the reference's float math.
  * `_dp_scan` — a lax.scan fallback (used on CPU, and the semantic
    reference for the kernel, tested in interpret mode).

Layout is TRANSPOSED relative to the rest of phase A: arrays are
(L, RC) = (anchor index within chunk, chunk row), so the sequential scan
walks the major dimension and each step is a full (lanes) vector row.

Chain ROOT (padded anchor index of the chain's first anchor) and DEPTH
(hops from the root) are propagated through the band window, which is what
lets chain extraction avoid pointer chasing entirely.

Inputs:  qp, rp (L, RC) int32 (I32MAX fill), rcv (L, RC) int32 packed
         contig*4 + reverse*2 + valid.
Outputs: dd (L, RC) int32 = score << DBITS | depth;  root (L, RC) int32.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import D_MAX_LIN_LENGTH

NEGI = -(1 << 29)  # "impossible" combined score
I32MAX = np.int32(2 ** 31 - 1)


def dbits(L: int) -> int:
    return int(np.ceil(np.log2(L + 1)))


def ring_size(band: int) -> int:
    """Ring buffer length: smallest power of two > band (so the window
    always retains the trailing `band` anchors), sublane-aligned (>= 8).
    The slow preset (c=30) yields band 83 -> ring 128; the default c=125
    yields band 20 -> ring 32."""
    return max(8, 1 << int(np.ceil(np.log2(band + 1))))


def _dp_kernel(qp_ref, rp_ref, rcv_ref, dd_ref, root_ref,
               dpw, qpw, rpw, rcvw, rootw, depw, slotw,
               *, L, band, pcl, max_gap, anchor_score, DBITS, RING,
               RING_SHIFT):
    # init ring buffers
    dpw[:] = jnp.zeros_like(dpw)
    qpw[:] = jnp.zeros_like(qpw)
    rpw[:] = jnp.zeros_like(rpw)
    rcvw[:] = jnp.zeros_like(rcvw)          # valid bit 0 -> masked
    rootw[:] = jnp.zeros_like(rootw)
    depw[:] = jnp.zeros_like(depw)
    slotw[:] = jnp.full_like(slotw, -(1 << 29))

    def step(t, _):
        qp_i = qp_ref[pl.ds(t, 1), :]       # (1, RC_B)
        rp_i = rp_ref[pl.ds(t, 1), :]
        rcv_i = rcv_ref[pl.ds(t, 1), :]

        d_q = qp_i - qpw[:]                 # (RING, RC_B) int32
        d_r_f = rp_i - rpw[:]
        rev_i = (rcv_i >> 1) & 1
        d_r = jnp.where(rev_i == 1, -d_r_f, d_r_f)
        gap = jnp.abs(d_r - d_q)
        ok = (rcvw[:] >> 1) == (rcv_i >> 1)     # same contig & orientation
        ok &= (rcvw[:] & rcv_i & 1) == 1        # both valid
        ok &= (d_q <= pcl) & (d_q != 0)
        ok &= rp_i != rpw[:]
        ok &= (d_q <= D_MAX_LIN_LENGTH) & (d_r <= D_MAX_LIN_LENGTH)
        ok &= d_r > 0
        ok &= gap <= max_gap
        ok &= slotw[:] >= jnp.maximum(t - band, 0)  # j in [t-band, t-1]
        # combined (score, j) key: ties go to the LARGEST j, matching the
        # reference's backward scan with strict '>'
        rel = slotw[:] - (t - RING)
        cand = anchor_score - gap + dpw[:]
        comb = jnp.where(ok, cand * RING + rel, NEGI)
        best = jnp.max(comb, axis=0, keepdims=True)     # (1, RC_B)
        best_val = best >> RING_SHIFT                   # floor(best / RING)
        take = best_val > 0
        onehot = ok & (comb == best)
        pick = lambda w: jnp.sum(jnp.where(onehot, w[:], 0), axis=0,
                                 keepdims=True)
        dp_t = jnp.where(take, best_val, 0)
        root_t = jnp.where(take, pick(rootw), t)
        dep_t = jnp.where(take, pick(depw) + 1, 0)

        dd_ref[pl.ds(t, 1), :] = (dp_t << DBITS) | dep_t
        root_ref[pl.ds(t, 1), :] = root_t

        s = jax.lax.rem(t, RING)
        dpw[pl.ds(s, 1), :] = dp_t
        qpw[pl.ds(s, 1), :] = qp_i
        rpw[pl.ds(s, 1), :] = rp_i
        rcvw[pl.ds(s, 1), :] = rcv_i
        rootw[pl.ds(s, 1), :] = root_t
        depw[pl.ds(s, 1), :] = dep_t
        slotw[pl.ds(s, 1), :] = jnp.full_like(slotw[pl.ds(s, 1), :], t)
        return 0

    jax.lax.fori_loop(0, L, step, 0)


def _rc_blocking(RC: int, rc_block: int):
    """Pick a lane-block size dividing RC (constructor-driven RC = R*C_CAP
    is not always a multiple of 256), padding RC up to a lane multiple if
    needed.  Padded lanes hold zeroed inputs (valid bit 0), so every
    transition is masked and the DP emits dp=0/root=t there — sliced off
    by the caller."""
    rc_pad = ((RC + 127) // 128) * 128
    if rc_pad % 256 == 0 and rc_block >= 256:
        blk = 256
    elif rc_pad >= 128:
        blk = 128
    else:
        blk = rc_pad
    return rc_pad, min(blk, rc_block if rc_block >= 128 else blk)


def _pad_lanes(x, rc_pad: int, fill):
    L, RC = x.shape
    if rc_pad == RC:
        return x
    return jnp.concatenate(
        [x, jnp.full((L, rc_pad - RC), fill, x.dtype)], axis=1)


def _dp_pallas(qp, rp, rcv, band: int, pcl: int, max_gap: int,
               anchor_score: int, rc_block: int = 256,
               interpret: bool = False):
    L, RC = qp.shape
    rc_pad, rc_block = _rc_blocking(RC, rc_block)
    if rc_pad != RC:
        qp = _pad_lanes(qp, rc_pad, I32MAX)
        rp = _pad_lanes(rp, rc_pad, I32MAX)
        rcv = _pad_lanes(rcv, rc_pad, 0)
        dd, root = _dp_pallas(qp, rp, rcv, band, pcl, max_gap,
                              anchor_score, rc_block, interpret)
        return dd[:, :RC], root[:, :RC]
    assert RC % rc_block == 0
    DBITS = dbits(L)
    RING = ring_size(band)
    kern = functools.partial(
        _dp_kernel, L=L, band=band, pcl=pcl, max_gap=max_gap,
        anchor_score=anchor_score, DBITS=DBITS, RING=RING,
        RING_SHIFT=int(np.log2(RING)))
    grid = (RC // rc_block,)
    spec = pl.BlockSpec((L, rc_block), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((L, RC), jnp.int32),
                   jax.ShapeDtypeStruct((L, RC), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((RING, rc_block), jnp.int32)
                        for _ in range(7)],
        interpret=interpret,
    )(qp, rp, rcv)


def _dp_scan(qp, rp, rcv, band: int, pcl: int, max_gap: int,
             anchor_score: int, unroll: int = 8):
    """lax.scan fallback with identical semantics on the same layout."""
    L, RC = qp.shape
    assert L % unroll == 0
    DBITS = dbits(L)
    neg = jnp.int32(NEGI)

    def dp_one(carry, x):
        dp_w, qp_w, rp_w, rcv_w, root_w, dep_w, i = carry
        qp_i, rp_i, rcv_i = x
        d_q = qp_i[None, :] - qp_w
        d_r_f = rp_i[None, :] - rp_w
        rev_i = (rcv_i >> 1) & 1
        d_r = jnp.where(rev_i[None, :] == 1, -d_r_f, d_r_f)
        gap = jnp.abs(d_r - d_q)
        ok = (rcv_w >> 1) == (rcv_i >> 1)[None, :]
        ok &= (rcv_w & rcv_i[None, :] & 1) == 1
        ok &= (d_q <= pcl) & (d_q != 0)
        ok &= rp_i[None, :] != rp_w
        ok &= (d_q <= D_MAX_LIN_LENGTH) & (d_r <= D_MAX_LIN_LENGTH)
        ok &= d_r > 0
        ok &= gap <= max_gap
        # window row w holds anchor j = i-1-w
        ok &= ((i - 1 - jnp.arange(band)) >= 0)[:, None]
        cand = jnp.where(ok, anchor_score - gap + dp_w, neg)
        best_w = jnp.argmax(cand, axis=0)
        pick = lambda w: jnp.take_along_axis(w, best_w[None, :], axis=0)[0]
        best_val = pick(cand)
        take = best_val > 0
        dp_i = jnp.where(take, best_val, 0)
        root_i = jnp.where(take, pick(root_w), i).astype(jnp.int32)
        dep_i = jnp.where(take, pick(dep_w) + 1, 0).astype(jnp.int32)

        def shift(w, new):
            return jnp.concatenate([new[None, :], w[:-1]], axis=0)

        carry = (shift(dp_w, dp_i), shift(qp_w, qp_i), shift(rp_w, rp_i),
                 shift(rcv_w, rcv_i), shift(root_w, root_i),
                 shift(dep_w, dep_i), i + 1)
        return carry, ((dp_i << DBITS) | dep_i, root_i)

    def dp_step(carry, xs):
        outs = []
        for uu in range(unroll):
            carry, o = dp_one(carry, tuple(x[uu] for x in xs))
            outs.append(o)
        return carry, (jnp.stack([o[0] for o in outs]),
                       jnp.stack([o[1] for o in outs]))

    init = (jnp.zeros((band, RC), jnp.int32),
            jnp.zeros((band, RC), jnp.int32),
            jnp.zeros((band, RC), jnp.int32),
            jnp.zeros((band, RC), jnp.int32),
            jnp.zeros((band, RC), jnp.int32),
            jnp.zeros((band, RC), jnp.int32),
            jnp.int32(0))
    xs = tuple(x.reshape(L // unroll, unroll, RC) for x in (qp, rp, rcv))
    _, (dd_u, root_u) = jax.lax.scan(dp_step, init, xs)
    return dd_u.reshape(L, RC), root_u.reshape(L, RC)


def dp_chain(qp, rp, rcv, band: int, pcl: int, max_gap: float,
             anchor_score: float, use_pallas: bool):
    """Dispatch to the Pallas kernel (TPU) or the lax.scan fallback."""
    assert float(max_gap) == float(int(max_gap))
    assert float(anchor_score) == float(int(anchor_score))
    if use_pallas:
        return _dp_pallas(qp, rp, rcv, band, pcl, int(max_gap),
                          int(anchor_score))
    return _dp_scan(qp, rp, rcv, band, pcl, int(max_gap), int(anchor_score))


# ---------------------------------------------------------------------------
# PACKED variant: two int32 inputs, one int32 output.
#
# Inputs:  qprv (L, RC) = qp << 2 | rev << 1 | valid   (qp < 2^24)
#          rprc (L, RC) = rc << 25 | rp                (rp < 2^24, rc < 64)
# Output:  ddr  (L, RC) = score << 2*EBITS | depth << EBITS | root,
#          EBITS = ceil_log2(L_CAP); requires L_CAP*anchor_score < 2^SBITS
#          with SBITS = 32 - 2*EBITS (the caller gates this statically).
#
# Semantics identical to dp_chain: the same-ref-contig requirement is
# IMPLICIT — when rc differs, |d_r| >= 2^25 - (2^24 - 1) > 2^24, so the
# d_r > 0 / d_r <= D_MAX_LIN_LENGTH / gap <= max_gap tests reject the
# transition in every sign case; rev equality is checked on bit 1 of qprv.
# Halves the DP-regroup scatters (2 instead of 3) and the padded->compact
# extraction gathers (1 instead of 2).
# ---------------------------------------------------------------------------

def _dp_kernel_packed(qprv_ref, rprc_ref, ddr_ref,
                      dpw, qprvw, rprcw, rootw, depw, slotw,
                      *, L, band, pcl, max_gap, anchor_score, EBITS, RING,
                      RING_SHIFT):
    dpw[:] = jnp.zeros_like(dpw)
    qprvw[:] = jnp.zeros_like(qprvw)        # valid bit 0 -> masked
    rprcw[:] = jnp.zeros_like(rprcw)
    rootw[:] = jnp.zeros_like(rootw)
    depw[:] = jnp.zeros_like(depw)
    slotw[:] = jnp.full_like(slotw, -(1 << 29))

    def step(t, _):
        qprv_i = qprv_ref[pl.ds(t, 1), :]   # (1, RC_B)
        rprc_i = rprc_ref[pl.ds(t, 1), :]

        d_q = (qprv_i >> 2) - (qprvw[:] >> 2)
        d_r_f = rprc_i - rprcw[:]
        rev_i = (qprv_i >> 1) & 1
        d_r = jnp.where(rev_i == 1, -d_r_f, d_r_f)
        gap = jnp.abs(d_r - d_q)
        ok = ((qprvw[:] ^ qprv_i) & 2) == 0      # same orientation
        ok &= (qprvw[:] & qprv_i & 1) == 1       # both valid
        ok &= (d_q <= pcl) & (d_q != 0)
        ok &= rprc_i != rprcw[:]
        ok &= (d_q <= D_MAX_LIN_LENGTH) & (d_r <= D_MAX_LIN_LENGTH)
        ok &= d_r > 0
        ok &= gap <= max_gap
        ok &= slotw[:] >= jnp.maximum(t - band, 0)
        rel = slotw[:] - (t - RING)
        cand = anchor_score - gap + dpw[:]
        comb = jnp.where(ok, cand * RING + rel, NEGI)
        best = jnp.max(comb, axis=0, keepdims=True)
        best_val = best >> RING_SHIFT
        take = best_val > 0
        onehot = ok & (comb == best)
        pick = lambda w: jnp.sum(jnp.where(onehot, w[:], 0), axis=0,
                                 keepdims=True)
        dp_t = jnp.where(take, best_val, 0)
        root_t = jnp.where(take, pick(rootw), t)
        dep_t = jnp.where(take, pick(depw) + 1, 0)

        ddr_ref[pl.ds(t, 1), :] = (dp_t << (2 * EBITS)) | (dep_t << EBITS) \
            | root_t

        s = jax.lax.rem(t, RING)
        dpw[pl.ds(s, 1), :] = dp_t
        qprvw[pl.ds(s, 1), :] = qprv_i
        rprcw[pl.ds(s, 1), :] = rprc_i
        rootw[pl.ds(s, 1), :] = root_t
        depw[pl.ds(s, 1), :] = dep_t
        slotw[pl.ds(s, 1), :] = jnp.full_like(slotw[pl.ds(s, 1), :], t)
        return 0

    jax.lax.fori_loop(0, L, step, 0)


def _dp_pallas_packed(qprv, rprc, band: int, pcl: int, max_gap: int,
                      anchor_score: int, EBITS: int, rc_block: int = 256,
                      interpret: bool = False):
    L, RC = qprv.shape
    rc_pad, rc_block = _rc_blocking(RC, rc_block)
    if rc_pad != RC:
        qprv = _pad_lanes(qprv, rc_pad, 0)
        rprc = _pad_lanes(rprc, rc_pad, 0)
        ddr = _dp_pallas_packed(qprv, rprc, band, pcl, max_gap,
                                anchor_score, EBITS, rc_block, interpret)
        return ddr[:, :RC]
    assert RC % rc_block == 0
    RING = ring_size(band)
    kern = functools.partial(
        _dp_kernel_packed, L=L, band=band, pcl=pcl, max_gap=max_gap,
        anchor_score=anchor_score, EBITS=EBITS, RING=RING,
        RING_SHIFT=int(np.log2(RING)))
    grid = (RC // rc_block,)
    spec = pl.BlockSpec((L, rc_block), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, RC), jnp.int32),
        scratch_shapes=[pltpu.VMEM((RING, rc_block), jnp.int32)
                        for _ in range(6)],
        interpret=interpret,
    )(qprv, rprc)


def _dp_scan_packed(qprv, rprc, band: int, pcl: int, max_gap: int,
                    anchor_score: int, EBITS: int, unroll: int = 8):
    """lax.scan fallback with identical semantics on the packed layout."""
    L, RC = qprv.shape
    assert L % unroll == 0
    neg = jnp.int32(NEGI)

    def dp_one(carry, x):
        dp_w, qprv_w, rprc_w, root_w, dep_w, i = carry
        qprv_i, rprc_i = x
        d_q = (qprv_i[None, :] >> 2) - (qprv_w >> 2)
        d_r_f = rprc_i[None, :] - rprc_w
        rev_i = (qprv_i >> 1) & 1
        d_r = jnp.where(rev_i[None, :] == 1, -d_r_f, d_r_f)
        gap = jnp.abs(d_r - d_q)
        ok = ((qprv_w ^ qprv_i[None, :]) & 2) == 0
        ok &= (qprv_w & qprv_i[None, :] & 1) == 1
        ok &= (d_q <= pcl) & (d_q != 0)
        ok &= rprc_i[None, :] != rprc_w
        ok &= (d_q <= D_MAX_LIN_LENGTH) & (d_r <= D_MAX_LIN_LENGTH)
        ok &= d_r > 0
        ok &= gap <= max_gap
        ok &= ((i - 1 - jnp.arange(band)) >= 0)[:, None]
        cand = jnp.where(ok, anchor_score - gap + dp_w, neg)
        best_w = jnp.argmax(cand, axis=0)
        pick = lambda w: jnp.take_along_axis(w, best_w[None, :], axis=0)[0]
        best_val = pick(cand)
        take = best_val > 0
        dp_i = jnp.where(take, best_val, 0)
        root_i = jnp.where(take, pick(root_w), i).astype(jnp.int32)
        dep_i = jnp.where(take, pick(dep_w) + 1, 0).astype(jnp.int32)

        def shift(w, new):
            return jnp.concatenate([new[None, :], w[:-1]], axis=0)

        carry = (shift(dp_w, dp_i), shift(qprv_w, qprv_i),
                 shift(rprc_w, rprc_i), shift(root_w, root_i),
                 shift(dep_w, dep_i), i + 1)
        return carry, (dp_i << (2 * EBITS)) | (dep_i << EBITS) | root_i

    def dp_step(carry, xs):
        outs = []
        for uu in range(unroll):
            carry, o = dp_one(carry, tuple(x[uu] for x in xs))
            outs.append(o)
        return carry, jnp.stack(outs)

    init = (jnp.zeros((band, RC), jnp.int32),
            jnp.zeros((band, RC), jnp.int32),
            jnp.zeros((band, RC), jnp.int32),
            jnp.zeros((band, RC), jnp.int32),
            jnp.zeros((band, RC), jnp.int32),
            jnp.int32(0))
    xs = tuple(x.reshape(L // unroll, unroll, RC) for x in (qprv, rprc))
    _, ddr_u = jax.lax.scan(dp_step, init, xs)
    return ddr_u.reshape(L, RC)


def dp_chain_packed(qprv, rprc, band: int, pcl: int, max_gap: float,
                    anchor_score: float, EBITS: int, use_pallas: bool):
    """Packed-layout dispatch (see block comment above)."""
    assert float(max_gap) == float(int(max_gap))
    assert float(anchor_score) == float(int(anchor_score))
    L = qprv.shape[0]
    assert L * int(anchor_score) < (1 << (32 - 2 * EBITS))
    if use_pallas:
        return _dp_pallas_packed(qprv, rprc, band, pcl, int(max_gap),
                                 int(anchor_score), EBITS)
    return _dp_scan_packed(qprv, rprc, band, pcl, int(max_gap),
                           int(anchor_score), EBITS)
