"""FracMinHash seeding on TPU (batched jnp/XLA device kernel).

The device analog of the reference's AVX2 seeding kernel
(reference: src/avx2_seeding.rs:33-270): the rolling 21-mer marker window,
the k=15 seed sub-window quirk, canonical min(fwd, rc) selection, the
Thomas Wang mm_hash64 FracMinHash filter, and 'N' resume suppression
(reference: src/seeding.rs:225-323), all as vectorized device ops over the
whole contig at once.  Output is validated bit-for-bit against the NumPy
scalar spec (skani_tpu/sketch.py:fmh_seeds_np), exactly as the reference
asserts AVX2 == scalar (reference: tests/tests.rs:130-144).

TPU specifics:
  * no uint64 on device — the 64-bit Wang mix runs on uint32 (hi, lo) pairs
    (adds with carry, shifts split at the word boundary);
  * the 42-bit marker k-mer splits cleanly at the 32-bit boundary because
    tokens are 2 bits wide (forward tokens 0-4 live in hi, 5-20 in lo);
  * survivors are compacted on device (sort by keep flag + slice to a fixed
    cap) so only ~L/c entries cross the host link, not the whole contig;
  * contig lengths are bucketed to powers of two so the jit caches a handful
    of executables.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..params import K_MARKER_DNA, SketchParams

U32 = jnp.uint32
_MK = K_MARKER_DNA  # 21


# --- 64-bit arithmetic on uint32 (hi, lo) pairs ---------------------------

def _add64(a, b):
    (ah, al), (bh, bl) = a, b
    lo = al + bl
    carry = (lo < al).astype(U32)
    return (ah + bh + carry, lo)


def _shl64(a, s: int):
    ah, al = a
    if s == 0:
        return a
    if s < 32:
        return ((ah << s) | (al >> (32 - s)), al << s)
    return (al << (s - 32), jnp.zeros_like(al))


def _shr64(a, s: int):
    ah, al = a
    if s == 0:
        return a
    if s < 32:
        return (ah >> s, (al >> s) | (ah << (32 - s)))
    return (jnp.zeros_like(ah), ah >> (s - 32))


def _xor64(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def _not64(a):
    return (~a[0], ~a[1])


def _lt64(a, b):
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def _mm_hash64_pair(key):
    """Thomas Wang 64-bit mix on (hi, lo) uint32 pairs
    (reference: src/types.rs:86-96)."""
    key = _not64(_add64(key, _shl64(key, 21)))
    key = _xor64(key, _shr64(key, 24))
    key = _add64(_add64(key, _shl64(key, 3)), _shl64(key, 8))
    key = _xor64(key, _shr64(key, 14))
    key = _add64(_add64(key, _shl64(key, 2)), _shl64(key, 4))
    key = _xor64(key, _shr64(key, 28))
    key = _add64(key, _shl64(key, 31))
    return key


# --- the device kernel -----------------------------------------------------

def _seed_core(enc, n_real, k: int, c: int, marker_c: int, CAP: int):
    """enc: (Lp,) uint8 = 2-bit code | (is_n << 2); n_real: real length.

    Returns (count, kmers u32, pos u32, canon u32, keep_m u32,
    marker_hi u32, marker_lo u32) with survivors compacted to the first
    `count` entries of each CAP-length array.
    """
    Lp = enc.shape[0]
    nw = Lp - _MK + 1
    codes = (enc & 3).astype(U32)
    is_n = (enc >> 2) & 1

    fh = jnp.zeros(nw, U32)
    fl = jnp.zeros(nw, U32)
    rh = jnp.zeros(nw, U32)
    rl = jnp.zeros(nw, U32)
    for t in range(_MK):
        ct = jax.lax.dynamic_slice(codes, (t,), (nw,))
        rc = U32(3) - ct
        fbit = 2 * (_MK - 1 - t)
        if fbit >= 32:
            fh = fh | (ct << (fbit - 32))
        else:
            fl = fl | (ct << fbit)
        rbit = 2 * t
        if rbit >= 32:
            rh = rh | (rc << (rbit - 32))
        else:
            rl = rl | (rc << rbit)

    seed_mask = U32((1 << (2 * k)) - 1)
    fs = fl & seed_mask
    rs = rl & seed_mask
    canon = fs < rs
    kmer = jnp.where(canon, fs, rs)
    h = _mm_hash64_pair((jnp.zeros(nw, U32), kmer))

    thr = (2 ** 64 - 1) // c
    thr_m = (2 ** 64 - 1) // marker_c
    keep = _lt64(h, (U32(thr >> 32), U32(thr & 0xFFFFFFFF)))
    keep_m0 = _lt64(h, (U32(thr_m >> 32), U32(thr_m & 0xFFFFFFFF)))

    # N suppression (resume_ind, reference: src/seeding.rs:272-274,300):
    # window w ends at i = w + mk - 1; an N there suppresses until i + k
    iw = jnp.arange(nw, dtype=jnp.int32)
    n_at_end = jax.lax.dynamic_slice(is_n, (_MK - 1,), (nw,))
    last_n = jax.lax.cummax(
        jnp.where(n_at_end == 1, iw, -(1 << 30)))
    keep &= last_n + k <= iw
    keep &= iw < (n_real - _MK + 1)

    canon_m = (fh < rh) | ((fh == rh) & (fl < rl))
    m_hi = jnp.where(canon_m, fh, rh)
    m_lo = jnp.where(canon_m, fl, rl)
    keep_m = keep & keep_m0

    count = keep.sum()
    # compact survivors to the front (stable by window index) and truncate
    (_, kmer_s, pos_s, canon_s, keepm_s, mhi_s, mlo_s) = jax.lax.sort(
        ((~keep).astype(jnp.int32), kmer, iw.astype(U32),
         canon.astype(U32), keep_m.astype(U32), m_hi, m_lo),
        dimension=0, num_keys=1, is_stable=True)
    sl = lambda x: jax.lax.slice(x, (0,), (CAP,))
    return (count, sl(kmer_s), sl(pos_s), sl(canon_s), sl(keepm_s),
            sl(mhi_s), sl(mlo_s))


@functools.partial(jax.jit,
                   static_argnames=("k", "c", "marker_c", "CAP"))
def _seed_device(enc, n_real, k: int, c: int, marker_c: int, CAP: int):
    return _seed_core(enc, n_real, k, c, marker_c, CAP)


@functools.partial(jax.jit,
                   static_argnames=("k", "c", "marker_c", "CAP"))
def _seed_device_batch(enc, n_real, k: int, c: int, marker_c: int,
                       CAP: int):
    """Batched form: enc (B, Lp), n_real (B,) — one dispatch seeds B
    same-bucket contigs (the bulk-`sketch` path; amortizes dispatch and
    link round trips across a whole file set)."""
    return jax.vmap(
        functools.partial(_seed_core, k=k, c=c, marker_c=marker_c,
                          CAP=CAP))(enc, n_real)


# --- host wrapper (drop-in seeder) ------------------------------------------

_ENC_N = None


def _encode(seq: np.ndarray) -> np.ndarray:
    global _ENC_N
    if _ENC_N is None:
        from ..sketch import BYTE_TO_SEQ
        enc = BYTE_TO_SEQ.astype(np.uint8).copy()
        enc[ord("N")] |= 4
        enc[ord("n")] |= 4
        _ENC_N = enc
    return _ENC_N[seq]


def _bucket(L: int) -> int:
    b = 1 << 15
    while b < L:
        b <<= 1
    return b


def fmh_seeds_tpu_batch(seqs, params: SketchParams):
    """Seed MANY contigs in bucketed device batches (one dispatch per
    (bucket, chunk)); same per-contig outputs as fmh_seeds_tpu.

    The bulk analog of the reference's rayon-parallel per-file seeding
    (reference: src/file_io.rs:147-149): on a locally attached TPU the
    batch amortizes dispatch/sync cost across the whole file set; on a
    slow tunnel the link-speed probe keeps the native kernel instead."""
    k, c = params.k, params.c
    if k > 16:
        raise ValueError("Value of k > 16 for DNA; not allowed.")
    empty = (np.zeros(0, np.uint32), np.zeros(0, np.uint32),
             np.zeros(0, bool), np.zeros(0, np.uint64))
    out = [empty] * len(seqs)
    groups = {}
    for i, s in enumerate(seqs):
        if len(s) >= 2 * _MK:
            groups.setdefault(_bucket(len(s)), []).append(i)
    # bound device memory per dispatch (~64M encoded bases)
    for Lp, idxs in sorted(groups.items()):
        max_b = max(1, (64 << 20) // Lp)
        nw = Lp - _MK + 1
        CAP = int(min(nw, 8 * nw // c + 1024))
        for c0 in range(0, len(idxs), max_b):
            chunk = idxs[c0:c0 + max_b]
            B = len(chunk)
            enc = np.zeros((B, Lp), dtype=np.uint8)
            n_real = np.zeros(B, dtype=np.int32)
            for b, i in enumerate(chunk):
                s = np.asarray(seqs[i], dtype=np.uint8)
                enc[b, :len(s)] = _encode(s)
                n_real[b] = len(s)
            res = _seed_device_batch(jnp.asarray(enc),
                                     jnp.asarray(n_real), k=k, c=c,
                                     marker_c=params.marker_c, CAP=CAP)
            counts = np.asarray(res[0])
            arrs = [np.asarray(x) for x in res[1:]]
            for b, i in enumerate(chunk):
                n = int(counts[b])
                if n > CAP:   # extraordinarily repetitive: exact fallback
                    from ..sketch import fmh_seeds_np
                    out[i] = fmh_seeds_np(seqs[i], params)
                    continue
                kmer, pos, canon, keep_m, mhi, mlo = (a[b, :n]
                                                      for a in arrs)
                markers = ((mhi.astype(np.uint64) << np.uint64(32))
                           | mlo.astype(np.uint64))[keep_m.astype(bool)]
                out[i] = (kmer.astype(np.uint32),
                          (pos + (_MK - 1)).astype(np.uint32),
                          canon.astype(bool), markers)
    return out


def fmh_seeds_tpu(seq: np.ndarray, params: SketchParams):
    """Drop-in replacement for sketch.fmh_seeds_np running on the device.

    Same contract: (seed_kmers u32, positions u32, canonical bool,
    markers u64) in scan order, markers not deduplicated.
    """
    k, c = params.k, params.c
    if k > 16:
        raise ValueError("Value of k > 16 for DNA; not allowed.")
    L = len(seq)
    empty = (np.zeros(0, np.uint32), np.zeros(0, np.uint32),
             np.zeros(0, bool), np.zeros(0, np.uint64))
    if L < 2 * _MK:
        return empty
    Lp = _bucket(L)
    enc = np.zeros(Lp, dtype=np.uint8)
    enc[:L] = _encode(np.asarray(seq, dtype=np.uint8))
    nw = Lp - _MK + 1
    CAP = int(min(nw, 8 * nw // c + 1024))
    out = _seed_device(jnp.asarray(enc), L, k=k, c=c,
                       marker_c=params.marker_c, CAP=CAP)
    count = int(out[0])
    if count > CAP:   # extraordinarily repetitive input: exact fallback
        from ..sketch import fmh_seeds_np
        return fmh_seeds_np(seq, params)
    kmer, pos, canon, keep_m, mhi, mlo = (np.asarray(x[:count])
                                          for x in out[1:])
    markers = ((mhi.astype(np.uint64) << np.uint64(32))
               | mlo.astype(np.uint64))[keep_m.astype(bool)]
    return (kmer.astype(np.uint32), (pos + (_MK - 1)).astype(np.uint32),
            canon.astype(bool), markers)
