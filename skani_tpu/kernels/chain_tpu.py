"""Batched banded chaining DP on TPU.

The reference's per-chunk quadratic-with-band DP (reference:
src/chain.rs:838-896) becomes a single lax.scan over anchor index with a
ring-buffer carry of the last `band` DP scores, vectorized over an arbitrary
number of (pair, chunk) rows at once.  All score quantities are integers
(anchor_score=20 minus integer gaps), so f32 accumulation is exact and
bit-equivalent to the reference's f64.

Tie-breaking matches the reference: the backward scan with strict '>' keeps
the LARGEST eligible j among equal candidate scores; the window is laid out
j-descending so argmax's first-max rule does exactly that.

Layout: rows = chunks (padded to a bucket length L); columns = anchor index
within chunk.  Inputs are int32 (positions < 2^31) and bool.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..params import D_MAX_LIN_LENGTH


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _dp_scan(qp, rp, rcg, rev, valid, band: int, past_chain_length: int,
             max_gap: float, anchor_score: float):
    """qp/rp/rcg: (R, L) int32; rev/valid: (R, L) bool.

    Returns (scores (R, L) f32, pointers (R, L) int32 with self-pointer == own
    column index).
    """
    R, L = qp.shape
    neg = jnp.float32(-3.0e38)

    # ring buffers of the last `band` columns, index 0 == j = i-1 (descending)
    def step(carry, xs):
        dp_win, qp_win, rp_win, rcg_win, rev_win, val_win, i = carry
        qp_i, rp_i, rcg_i, rev_i, val_i = xs
        d_q = (qp_i[:, None] - qp_win).astype(jnp.float32)
        d_r_fwd = (rp_i[:, None] - rp_win).astype(jnp.float32)
        d_r = jnp.where(rev_i[:, None], -d_r_fwd, d_r_fwd)
        gap = jnp.abs(d_r - d_q)
        ok = rcg_i[:, None] == rcg_win
        ok &= d_q <= past_chain_length
        ok &= rev_i[:, None] == rev_win
        ok &= (rp_i[:, None] != rp_win) & (d_q != 0)
        ok &= (d_q <= D_MAX_LIN_LENGTH) & (d_r <= D_MAX_LIN_LENGTH)
        ok &= d_r > 0
        ok &= gap <= max_gap
        ok &= val_win & val_i[:, None]
        # window position w corresponds to j = i - 1 - w
        in_range = (i - 1 - jnp.arange(band)) >= 0
        ok &= in_range[None, :]
        cand = jnp.where(ok, anchor_score - gap + dp_win, neg)
        best_w = jnp.argmax(cand, axis=1)
        best_val = jnp.take_along_axis(cand, best_w[:, None], axis=1)[:, 0]
        take = best_val > 0.0
        dp_i = jnp.where(take, best_val, 0.0).astype(jnp.float32)
        ptr_i = jnp.where(take, i - 1 - best_w, i).astype(jnp.int32)
        # shift ring buffers (element 0 becomes current column)
        def shift(win, new):
            return jnp.concatenate([new[:, None], win[:, :-1]], axis=1)
        carry = (shift(dp_win, dp_i), shift(qp_win, qp_i),
                 shift(rp_win, rp_i), shift(rcg_win, rcg_i),
                 shift(rev_win, rev_i), shift(val_win, val_i), i + 1)
        return carry, (dp_i, ptr_i)

    init = (jnp.zeros((R, band), jnp.float32),
            jnp.zeros((R, band), jnp.int32),
            jnp.zeros((R, band), jnp.int32),
            jnp.full((R, band), -1, jnp.int32),
            jnp.zeros((R, band), bool),
            jnp.zeros((R, band), bool),
            jnp.int32(0))
    xs = (qp.T, rp.T, rcg.T, rev.T, valid.T)
    _, (dp_cols, ptr_cols) = jax.lax.scan(step, init, xs)
    return dp_cols.T, ptr_cols.T


class ChainDpTpu:
    """Host wrapper: packs ragged chunks into length buckets, runs the scan,
    scatters results back to flat per-anchor arrays."""

    BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)

    def __init__(self, backend=None):
        self.backend = backend

    def __call__(self, ac, map_params) -> Tuple[np.ndarray, np.ndarray]:
        n = len(ac.q_pos)
        scores = np.zeros(n, dtype=np.float64)
        ptr = np.arange(n, dtype=np.int64)
        if n == 0:
            return scores, ptr
        return self.run_many([(ac, map_params)])[0]

    def run_many(self, jobs: List[tuple]) -> List[Tuple[np.ndarray, np.ndarray]]:
        """jobs: list of (AnchorChunks, MapParams) -> per-job (scores, ptr).

        All chunks across all jobs sharing DP parameters are batched into
        shared bucket matrices.
        """
        # gather chunk descriptors
        rows = []  # (job_idx, chunk_start, chunk_len)
        keyed = {}
        for ji, (ac, mp) in enumerate(jobs):
            band = mp.index_chain_band
            pcl = min(mp.fragment_length // 2, mp.bp_chain_band)
            key = (band, pcl, mp.max_gap_length, mp.anchor_score)
            starts = ac.chunk_starts
            for t in range(len(starts) - 1):
                ln = int(starts[t + 1] - starts[t])
                if ln > 0:
                    keyed.setdefault(key, []).append(
                        (ji, int(starts[t]), ln))
        out = []
        for ji, (ac, _mp) in enumerate(jobs):
            n = len(ac.q_pos)
            out.append((np.zeros(n, dtype=np.float64),
                        np.arange(n, dtype=np.int64)))

        for (band, pcl, max_gap, a_score), rows in keyed.items():
            # bucket rows by padded length
            by_bucket = {}
            for r in rows:
                L = r[2]
                b = next((b for b in self.BUCKETS if L <= b), L)
                by_bucket.setdefault(b, []).append(r)
            for L, rws in by_bucket.items():
                # pad row count to a power of two to bound recompilation
                R = 1
                while R < len(rws):
                    R *= 2
                qp = np.zeros((R, L), dtype=np.int32)
                rp = np.zeros((R, L), dtype=np.int32)
                rcg = np.full((R, L), -1, dtype=np.int32)
                rev = np.zeros((R, L), dtype=bool)
                valid = np.zeros((R, L), dtype=bool)
                for w, (ji, s, ln) in enumerate(rws):
                    ac = jobs[ji][0]
                    qp[w, :ln] = ac.q_pos[s:s + ln]
                    rp[w, :ln] = ac.r_pos[s:s + ln]
                    rcg[w, :ln] = ac.r_contig[s:s + ln]
                    rev[w, :ln] = ac.reverse[s:s + ln]
                    valid[w, :ln] = True
                dp, pt = _dp_scan(jnp.asarray(qp), jnp.asarray(rp),
                                  jnp.asarray(rcg), jnp.asarray(rev),
                                  jnp.asarray(valid), int(band), int(pcl),
                                  float(max_gap), float(a_score))
                dp = np.asarray(dp)
                pt = np.asarray(pt)
                for w, (ji, s, ln) in enumerate(rws):
                    out[ji][0][s:s + ln] = dp[w, :ln]
                    out[ji][1][s:s + ln] = pt[w, :ln].astype(np.int64) + s
        return out
