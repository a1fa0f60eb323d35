"""Anchor expansion as a banded Pallas kernel.

phase A's anchor expansion maps each output anchor slot to its source
query position (run-length decode of per-position match counts) and
fetches that position's packed word and ref-run start.  The XLA form is a
scatter + two cummaxes + two full-table gathers over the (R, A) anchor
domain — ~25-30 ms per 32-pair batch at E. coli shapes, all at XLA's
~5-9 ns/element gather rate.

The key structural fact: the slot -> source mapping `g` is NONDECREASING
(anchors are emitted in source-position order, reference Anchor Ord,
src/types.rs:499-506).  So an output tile of 1024 slots draws from a
bounded, forward-moving WINDOW of source positions, and the expansion
becomes VMEM-local work:

  * g for each slot = (# window positions with offs <= slot) - 1 + base —
    a (1024 x window) compare-and-sum on the VPU;
  * the three per-slot fetches (offs[g] for the intra-run rank, ref-run
    start bs[g], packed query word apk[g]) are two-level one-hot selects:
    a (1024, WBLK) x (WBLK, 128) MXU matmul picks the 128-wide window
    row, a masked lane reduce picks within it.  int32 payloads split into
    exact 8-bit bf16 planes (cf. gather_pallas).

The window cursor carries across grid steps in SMEM scratch (TPU grids
execute sequentially, t fastest), advancing to the last slot's source
block.  A tile whose 2048-position window is exhausted while slots remain
(span overflow — only possible for distant pairs, where shared k-mers are
sparse along the query) sets the per-pair overflow flag and the engine
falls back to the exact native path for that pair.

Inputs (R, P/128, 128) int32: offs (exclusive prefix sum of per-position
match counts; nondecreasing, offs < 2^24), bs (ref-run starts < 2^24),
apk (packed ctgc<<24|pos query words).  total (R,) int32 marks the valid
anchor count per pair.  Outputs: aw (R, A) packed query word per slot,
brow (R, A) ref position-table row per slot, ovf (R, 1) span-overflow.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024     # output anchor slots per grid step
WBLK = 16       # source window, in 128-position blocks (window = 2048)


def _kern(total_ref, offs_ref, bs_ref, apk_ref, aw_ref, brow_ref, ovf_ref,
          cur_ref, *, PB):
    r = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        cur_ref[0] = 0

    cur = jnp.minimum(cur_ref[0], PB - WBLK)   # clamp keeps slices in-range
    win_offs = offs_ref[0, pl.ds(cur, WBLK), :]    # (WBLK, 128)
    win_bs = bs_ref[0, pl.ds(cur, WBLK), :]
    win_apk = apk_ref[0, pl.ds(cur, WBLK), :]

    slots = t * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    # g_local + 1 = number of window positions with offs <= slot (all
    # pre-window positions also satisfy it, by the cursor invariant)
    count = jnp.zeros((TILE, 1), jnp.int32)
    for j in range(WBLK):
        wrow = win_offs[j, :].reshape(1, 128)
        count += jnp.sum((wrow <= slots).astype(jnp.int32), axis=1,
                         keepdims=True)
    g_local = count - 1
    ghi = g_local >> 7
    glo = g_local & 127
    oh_hi = (ghi == jax.lax.broadcasted_iota(jnp.int32, (TILE, WBLK), 1)
             ).astype(jnp.bfloat16)
    lo_oh = glo == jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)

    def sel(win, planes):
        """win[g_local] per slot: exact int32 via 8-bit bf16 planes."""
        v = jnp.zeros((TILE,), jnp.int32)
        for p in range(planes):
            plane = ((win >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
            rows = jnp.dot(oh_hi, plane, preferred_element_type=jnp.float32)
            vp = jnp.sum(jnp.where(lo_oh, rows, 0.0), axis=1
                         ).astype(jnp.int32)
            v = v | (vp << (8 * p))
        return v

    offs_g = sel(win_offs, 3)
    bs_g = sel(win_bs, 3)
    aw = sel(win_apk, 4)
    rank = slots[:, 0] - offs_g
    aw_ref[0, 0, :, :] = aw.reshape(TILE // 128, 128)
    brow_ref[0, 0, :, :] = (bs_g + rank).reshape(TILE // 128, 128)

    valid = slots[:, 0] < total_ref[r]
    ovf_t = jnp.any(valid & (count[:, 0] >= WBLK * 128))
    ovf_ref[0, 0, 0, :] = jnp.full((128,), ovf_t.astype(jnp.int32))
    cur_ref[0] = cur + (g_local[TILE - 1, 0] >> 7)


def expand_anchors(offs, bs_p, apk_a, total, A: int,
                   interpret: bool = False):
    """Run-length anchor expansion (see module doc).

    offs/bs_p/apk_a: (R, P) int32 with P % 128 == 0; total: (R,) int32;
    A % 1024 == 0.  Returns (aw (R, A), brow (R, A), ovf (R,))."""
    R, P = offs.shape
    assert P % 128 == 0 and A % TILE == 0
    PB = P // 128
    assert PB >= WBLK
    T = A // TILE
    shape3 = (R, PB, 128)
    kern = functools.partial(_kern, PB=PB)
    in3 = pl.BlockSpec((1, PB, 128), lambda r, t, total: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    outw = pl.BlockSpec((1, 1, TILE // 128, 128),
                        lambda r, t, total: (r, t, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, T),
        in_specs=[in3, in3, in3],
        out_specs=(outw, outw,
                   pl.BlockSpec((1, 1, 1, 128),
                                lambda r, t, total: (r, t, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    aw, brow, ovf = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((R, T, TILE // 128, 128),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((R, T, TILE // 128, 128),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((R, T, 1, 128), jnp.int32)),
        interpret=interpret,
    )(total, offs.reshape(shape3), bs_p.reshape(shape3),
      apk_a.reshape(shape3))
    return (aw.reshape(R, A), brow.reshape(R, A),
            jnp.max(ovf.reshape(R, -1), axis=1))


def expand_anchors_reference(offs, bs_p, apk_a, total, A: int):
    """NumPy oracle with identical semantics (tests)."""
    offs = np.asarray(offs)
    bs_p = np.asarray(bs_p)
    apk_a = np.asarray(apk_a)
    total = np.asarray(total)
    R, P = offs.shape
    aw = np.zeros((R, A), np.int32)
    brow = np.zeros((R, A), np.int32)
    ovf = np.zeros(R, np.int32)
    for r in range(R):
        cur = 0
        for t in range(A // TILE):
            cur = min(cur, P // 128 - WBLK)
            w0 = cur * 128
            win = offs[r, w0:w0 + WBLK * 128]
            slots = t * TILE + np.arange(TILE)
            count = (win[None, :] <= slots[:, None]).sum(axis=1)
            gl = count - 1
            aw[r, t * TILE:(t + 1) * TILE] = apk_a[r, w0 + gl]
            brow[r, t * TILE:(t + 1) * TILE] = \
                bs_p[r, w0 + gl] + slots - offs[r, w0 + gl]
            valid = slots < total[r]
            if np.any(valid & (count >= WBLK * 128)):
                ovf[r] = 1
            cur = cur + (gl[-1] >> 7)
    return aw, brow, ovf
