"""Banded chaining DP over the COMPACT anchor stream (no regroup pass).

The padded-layout DP (kernels/dp_pallas.py) needs anchors regrouped to
rows-per-chunk — two (R, A)-input scatters in — and its outputs gathered
back to compact order — one (R, A) extraction gather out.  At 5-9
ns/element those three random-access passes cost more than the DP itself
(PERF.md stage profile: regroup ~26 ms + extraction ~14.5 ms vs DP ~2.4
ms per 32-pair batch).

This kernel removes all three: the DP walks the anchors exactly where
phase A produced them.  The compact stream is the concatenation of
chunks (anchors of one chunk occupy consecutive columns — the anchor
sort orders by (contig, position) and chunk ids are nondecreasing), so a
sequential scan down each row with the usual band ring buffer computes
the same recurrence, provided transitions never cross a chunk boundary.
Chunk identity travels IN-BAND: 5 spare bits of the packed anchor word
carry cid mod 32, and since cids are nondecreasing and a band window
spans < 32 anchors, the mod-32 tag is unambiguous inside any window —
one XOR+mask compare rejects cross-chunk (and cross-orientation)
transitions.

Parallelism: a row is a sequential chain, but chunks are independent, so
each row's A columns split into A/S segments scanned in parallel lanes
(lane = row x segment).  A chunk crossing a segment boundary is finished
by the lane OWNING its first anchor, which scans H extra halo columns
into the next segment (H = L_CAP: longer chunks already overflow to the
exact native path, the same guard the padded layout applies).  The next
lane's scan of those columns starts mid-chunk and is wrong — discarded
by an ELEMENTWISE select (col_in_chunk > col % S picks the halo plane),
no gather.  All marshalling is dense reshape/transpose/static-slice
traffic at HBM bandwidth.

Outputs per anchor (compact order): score, and depth<<20|root where
root is the anchor's chain-root COMPACT column (A <= 2^20, depth <
L_CAP <= 2^11 — both statically guarded by the caller).

Semantics are identical to dp_chain_packed (reference:
src/chain.rs:838-896); pinned against the padded-layout scan in
tests/test_dp_compact.py and by the differential fuzz on the engine.
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import D_MAX_LIN_LENGTH
from .dp_pallas import NEGI, ring_size

CID_SHIFT = 26          # w1 bits 26-30: cid mod 32
CID_MASK = 0x1F << CID_SHIFT
QP_MASK = (1 << 24) - 1
ROOT_BITS = 20


def seg_len(A: int, l_cap: int) -> int:
    """Segment length: >= the halo (one chunk never crosses two segment
    boundaries) and dividing A (A is a multiple of 8192)."""
    s = 2048
    while s < l_cap:
        s *= 2
    return min(s, A)


def _kernel(w1_ref, w2_ref, score_ref, dr_ref,
            dpw, w1w, w2w, rootw, depw, slotw,
            *, T, band, pcl, max_gap, anchor_score, RING, RING_SHIFT,
            LB, R, S):
    # ring buffers are per-lane; lanes never interact
    dpw[:] = jnp.zeros_like(dpw)
    w1w[:] = jnp.zeros_like(w1w)            # valid bit 0 -> masked
    w2w[:] = jnp.zeros_like(w2w)
    rootw[:] = jnp.zeros_like(rootw)
    depw[:] = jnp.zeros_like(depw)
    slotw[:] = jnp.full_like(slotw, -(1 << 29))

    # global compact column of each lane's first scanned anchor
    # (2-D iota: 1-D iota does not lower on Mosaic)
    lane_g = pl.program_id(0) * LB \
        + jax.lax.broadcasted_iota(jnp.int32, (1, LB), 1)
    base_col = (lane_g // R) * S          # lane = seg * R + row

    def step(t, _):
        w1_i = w1_ref[pl.ds(t, 1), :]       # (1, LB)
        w2_i = w2_ref[pl.ds(t, 1), :]

        d_q = ((w1_i >> 2) & QP_MASK) - ((w1w[:] >> 2) & QP_MASK)
        d_r_f = w2_i - w2w[:]
        rev_i = (w1_i >> 1) & 1
        d_r = jnp.where(rev_i == 1, -d_r_f, d_r_f)
        gap = jnp.abs(d_r - d_q)
        # same chunk (cid tag) AND same orientation in one compare
        ok = ((w1w[:] ^ w1_i) & (CID_MASK | 2)) == 0
        ok &= (w1w[:] & w1_i & 1) == 1       # both valid
        ok &= (d_q <= pcl) & (d_q != 0)
        ok &= w2_i != w2w[:]
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
        root_t = jnp.where(take, pick(rootw), base_col + t)
        dep_t = jnp.where(take, pick(depw) + 1, 0)

        score_ref[pl.ds(t, 1), :] = dp_t
        dr_ref[pl.ds(t, 1), :] = (dep_t << ROOT_BITS) | root_t

        s = jax.lax.rem(t, RING)
        dpw[pl.ds(s, 1), :] = dp_t
        w1w[pl.ds(s, 1), :] = w1_i
        w2w[pl.ds(s, 1), :] = w2_i
        rootw[pl.ds(s, 1), :] = root_t
        depw[pl.ds(s, 1), :] = dep_t
        slotw[pl.ds(s, 1), :] = jnp.full_like(slotw[pl.ds(s, 1), :], t)
        return 0

    jax.lax.fori_loop(0, T, step, 0)


def _run_compact(planes, kernel, n_scratch, col_in_chunk, band, pcl,
                 max_gap, anchor_score, l_cap, interpret):
    """Shared segment-lane machinery: marshal the compact planes into the
    (steps, lanes) layout, run the scan kernel, undo the layout, and
    resolve boundary-crossing chunks from the owners' halo columns."""
    assert float(max_gap) == float(int(max_gap))
    assert float(anchor_score) == float(int(anchor_score))
    from .. import stats
    stats.add("compact_dp_traces")   # trace-time: proves the engine took
    #                                  this path (tests assert on it)
    R, A = planes[0].shape
    S = seg_len(A, l_cap)
    H = min(l_cap, S)
    assert A % S == 0 and H <= S
    assert A <= (1 << ROOT_BITS)
    assert l_cap <= (1 << 11) - 1
    RING = ring_size(band)
    assert (l_cap * int(anchor_score) + 1) * RING < (1 << 31)
    K = A // S
    T = S + H

    def marshal(x):
        xp = jnp.concatenate([x, jnp.zeros((R, H), x.dtype)], axis=1)
        segs = jnp.stack([xp[:, k * S:k * S + T] for k in range(K)],
                         axis=0)                       # (K, R, T)
        return segs.transpose(2, 0, 1).reshape(T, K * R)

    lanes = K * R
    lanes_pad = ((lanes + 127) // 128) * 128
    LB = 256 if lanes_pad % 256 == 0 else 128
    # VMEM sizing: each grid block stages (planes + 2 outputs) (T, LB)
    # int32 buffers, DOUBLE-buffered by the Mosaic pipeline, plus the ring
    # scratch.  The default scoped-vmem limit is 16 MB and production
    # shapes exceed it at LB=256 (measured: 20.19 MB requested -> compile
    # OOM on v5e), so the limit is raised explicitly to what the block
    # actually needs; v5e has 128 MB VMEM and the static caps above bound
    # the worst tier (l_cap 2047, 3 planes) near ~42 MB at LB=256.
    lb_env = int(os.environ.get("SKANI_TPU_COMPACT_LB", "0"))
    if lb_env in (128, 256) and lanes_pad % lb_env == 0:
        LB = lb_env

    def _vmem_need(lb):
        return ((len(planes) + 2) * T * lb * 4) * 2 + n_scratch * RING * lb * 4

    if _vmem_need(LB) > (96 << 20) and LB == 256:
        LB = 128
    vmem_limit = min(max(_vmem_need(LB) + (2 << 20), 16 << 20), 110 << 20)
    compiler_params = (None if interpret else
                       pltpu.CompilerParams(vmem_limit_bytes=vmem_limit))

    def padl(x):
        if lanes_pad == lanes:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((T, lanes_pad - lanes), x.dtype)], axis=1)

    ms = [padl(marshal(w)) for w in planes]

    kern = functools.partial(
        kernel, T=T, band=band, pcl=pcl, max_gap=int(max_gap),
        anchor_score=int(anchor_score), RING=RING,
        RING_SHIFT=int(np.log2(RING)), LB=LB, R=R, S=S)
    spec = pl.BlockSpec((T, LB), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    score_m, dr_m = pl.pallas_call(
        kern,
        grid=(lanes_pad // LB,),
        in_specs=[spec] * len(ms),
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((T, lanes_pad), jnp.int32),
                   jax.ShapeDtypeStruct((T, lanes_pad), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((RING, LB), jnp.int32)
                        for _ in range(n_scratch)],
        interpret=interpret,
        **({} if compiler_params is None
           else {"compiler_params": compiler_params}),
    )(*ms)

    def unmarshal(o):
        segs = o[:, :lanes].reshape(T, K, R).transpose(1, 2, 0)  # (K, R, T)
        main = segs[:, :, :S].transpose(1, 0, 2).reshape(R, A)
        halo = segs[:, :, S:]                                    # (K, R, H)
        halo = jnp.concatenate(
            [jnp.zeros((1, R, H), o.dtype), halo[:-1]], axis=0)
        halo = jnp.concatenate(
            [halo, jnp.zeros((K, R, S - H), o.dtype)], axis=2)
        halo = halo.transpose(1, 0, 2).reshape(R, A)
        return main, halo

    # a chunk crossing a segment boundary belongs to the PREVIOUS lane:
    # its anchors' correct values sit in that lane's halo columns
    ls = jnp.arange(A, dtype=jnp.int32)[None, :] % S
    fix = col_in_chunk > ls
    sm, sh = unmarshal(score_m)
    dm, dh = unmarshal(dr_m)
    return jnp.where(fix, sh, sm), jnp.where(fix, dh, dm)


def dp_chain_compact(w1, w2, col_in_chunk, band: int, pcl: int,
                     max_gap: float, anchor_score: float, l_cap: int,
                     interpret: bool = False):
    """Compact-stream DP, packed positions.  w1 (R, A) = cid_tag | qp<<2
    | rev<<1 | valid (qp < 2^24), w2 (R, A) = rc<<25 | rp.  Returns
    (score, depth<<20|root) in compact order, root = global column.

    The mod-32 cid tag is unambiguous only while a band window spans
    < 32 chunk boundaries (cids are nondecreasing) — wider bands must
    use the 3-plane variant with a full cid (dp_chain_compact_wide)."""
    assert band < 32
    return _run_compact([w1, w2], _kernel, 6, col_in_chunk, band, pcl,
                        max_gap, anchor_score, l_cap, interpret)


def dp_chain_compact_wide(w1, w2, w3, col_in_chunk, band: int, pcl: int,
                          max_gap: float, anchor_score: float, l_cap: int,
                          interpret: bool = False):
    """Compact-stream DP with a third plane; one w3 equality covers
    same-chunk AND same-ref-contig.  Two packings share this kernel:

      * wide tier (qp/rp exceed 24 bits): w1 = qp<<2|rev<<1|valid
        (qp < 2^28), w2 = rp, w3 = cid_tag<<26 | rc (rc < 2^26;
        band < 32 — no spare bits for a full cid next to a wide rc);
      * packed wide-band tier (slow preset, band >= 32): w2 = rp
        (< 2^24), w3 = cid*64 + rc (rc < 64) — the FULL cid, so no
        tag-ambiguity band limit at all."""
    return _run_compact([w1, w2, w3], _kernel_wide, 7, col_in_chunk, band,
                        pcl, max_gap, anchor_score, l_cap, interpret)


def _kernel_wide(w1_ref, w2_ref, w3_ref, score_ref, dr_ref,
                 dpw, w1w, w2w, w3w, rootw, depw, slotw,
                 *, T, band, pcl, max_gap, anchor_score, RING, RING_SHIFT,
                 LB, R, S):
    dpw[:] = jnp.zeros_like(dpw)
    w1w[:] = jnp.zeros_like(w1w)            # valid bit 0 -> masked
    w2w[:] = jnp.zeros_like(w2w)
    w3w[:] = jnp.full_like(w3w, -1)         # never equal to a real word
    rootw[:] = jnp.zeros_like(rootw)
    depw[:] = jnp.zeros_like(depw)
    slotw[:] = jnp.full_like(slotw, -(1 << 29))

    lane_g = pl.program_id(0) * LB \
        + jax.lax.broadcasted_iota(jnp.int32, (1, LB), 1)
    base_col = (lane_g // R) * S          # lane = seg * R + row

    def step(t, _):
        w1_i = w1_ref[pl.ds(t, 1), :]       # (1, LB)
        w2_i = w2_ref[pl.ds(t, 1), :]
        w3_i = w3_ref[pl.ds(t, 1), :]

        d_q = (w1_i >> 2) - (w1w[:] >> 2)
        d_r_f = w2_i - w2w[:]
        rev_i = (w1_i >> 1) & 1
        d_r = jnp.where(rev_i == 1, -d_r_f, d_r_f)
        gap = jnp.abs(d_r - d_q)
        ok = w3w[:] == w3_i                  # same chunk AND ref contig
        ok &= ((w1w[:] ^ w1_i) & 2) == 0     # same orientation
        ok &= (w1w[:] & w1_i & 1) == 1       # both valid
        ok &= (d_q <= pcl) & (d_q != 0)
        ok &= w2_i != w2w[:]
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
        root_t = jnp.where(take, pick(rootw), base_col + t)
        dep_t = jnp.where(take, pick(depw) + 1, 0)

        score_ref[pl.ds(t, 1), :] = dp_t
        dr_ref[pl.ds(t, 1), :] = (dep_t << ROOT_BITS) | root_t

        s = jax.lax.rem(t, RING)
        dpw[pl.ds(s, 1), :] = dp_t
        w1w[pl.ds(s, 1), :] = w1_i
        w2w[pl.ds(s, 1), :] = w2_i
        w3w[pl.ds(s, 1), :] = w3_i
        rootw[pl.ds(s, 1), :] = root_t
        depw[pl.ds(s, 1), :] = dep_t
        slotw[pl.ds(s, 1), :] = jnp.full_like(slotw[pl.ds(s, 1), :], t)
        return 0

    jax.lax.fori_loop(0, T, step, 0)
