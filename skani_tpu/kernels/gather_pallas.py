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

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

AT = 1024  # index-tile length


def _kern(t_ref, i_ref, o_ref, *, KB, BR):
    def body(rr, _):
        tab = t_ref[pl.ds(rr, 1), :].reshape(KB, 128)
        ix = i_ref[pl.ds(rr, 1), :].reshape(AT, 1)
        hi = ix >> 7
        lo = ix & 127
        oh_hi = (hi == jax.lax.broadcasted_iota(jnp.int32, (AT, KB), 1)
                 ).astype(jnp.bfloat16)
        oh_lo = lo == jax.lax.broadcasted_iota(jnp.int32, (AT, 128), 1)
        v = jnp.zeros((AT,), jnp.int32)
        for p in range(4):
            plane = ((tab >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
            rows = jnp.dot(oh_hi, plane, preferred_element_type=jnp.float32)
            vp = jnp.sum(jnp.where(oh_lo, rows, 0.0), axis=1
                         ).astype(jnp.int32)
            v = v | (vp << (8 * p))
        o_ref[pl.ds(rr, 1), :] = v.reshape(1, AT)
        return 0

    jax.lax.fori_loop(0, BR, body, 0)


def mxu_row_gather(table, idx, interpret: bool = False):
    """take_along_axis(table, idx, axis=1) on the MXU.  Requires the table
    width to be a multiple of 128 and the index width a multiple of 1024
    (both hold for DeviceDb's 4096-padded tensors); indices must be in
    range (callers clip)."""
    R, K = table.shape
    _, A = idx.shape
    assert K % 128 == 0 and A % AT == 0
    BR = 8 if R % 8 == 0 else R
    assert R % BR == 0
    kern = functools.partial(_kern, KB=K // 128, BR=BR)
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
        interpret=interpret,
    )(table, idx)
