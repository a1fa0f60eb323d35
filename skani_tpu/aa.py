"""Amino-acid (AAI) sketching path: 6-frame ORF detection + AA FracMinHash.

Vectorized transcription of the reference AA path (reference:
src/seeding.rs:55-223).  Reference quirks preserved:

* ORF emission requires the tracked previous stop to be nonzero for the
  forward strand, while the REVERSE strand's condition tests the FORWARD
  tracker (reference: src/seeding.rs:91 uses orf_pos_f) with a hard-coded
  gap of 45 (not ORF_SIZE);
* k-mers are emitted only once the 10-codon marker window is full
  (j >= 3*K_MARKER_AA - 1), even though the seed k is 6;
* the seed/marker thresholds both test the hash of the SEED k-mer.

AAI mode is flagged "not stable" in the reference (src/cli.rs:77); value
expectations are correspondingly loose.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .hashing import mm_hash64
from .params import K_MARKER_AA, ORF_SIZE, STOP_CODON, SketchParams
from .sketch import BYTE_TO_SEQ

_U = np.uint64


def _codon_tables(params: SketchParams):
    enc = np.array(params.acgt_to_aa_encoding, dtype=np.uint64)
    return enc


def get_orfs_np(seq: np.ndarray, params: SketchParams) -> List[Tuple[int, int, int]]:
    """6-frame ORF detection (reference: src/seeding.rs:55-112).

    Returns [(start, end, phase)] sorted by descending length, stable in the
    reference's push order (increasing end; forward before reverse).
    """
    L = len(seq)
    if L < 3:
        return []
    enc = _codon_tables(params)
    codes = BYTE_TO_SEQ[seq]
    # forward codon ending at i (i>=2): (c[i-2]<<4)|(c[i-1]<<2)|c[i]
    cf = (codes[:-2] << _U(4)) | (codes[1:-1] << _U(2)) | codes[2:]
    aa_f = enc[cf.astype(np.int64)]
    # reverse codon at i: rc(b_i) rc(b_{i-1}) rc(b_{i-2})
    cr = ((_U(3) - codes[2:]) << _U(4)) | ((_U(3) - codes[1:-1]) << _U(2)) \
        | (_U(3) - codes[:-2])
    aa_r = enc[cr.astype(np.int64)]
    # position index: codon at array idx t corresponds to i = t + 2,
    # phase = i % 3, recorded stop position = i - 2 = t.
    t_idx = np.arange(L - 2, dtype=np.int64)
    phase = (t_idx + 2) % 3

    orfs = []  # (push_order_key, start, end, phase)
    for p in range(3):
        sel = phase == p
        f_stops = t_idx[sel & (aa_f == STOP_CODON)]
        r_stops = t_idx[sel & (aa_r == STOP_CODON)]
        # forward: consecutive stop pairs with prev != 0 and gap > ORF_SIZE
        if len(f_stops) >= 2:
            prev = f_stops[:-1]
            cur = f_stops[1:]
            keep = (prev != 0) & (cur - prev > ORF_SIZE)
            for s, e in zip(prev[keep].tolist(), cur[keep].tolist()):
                orfs.append(((e, 0), s, e, p))
        # reverse: prev r-stop (or 0); requires a NONZERO forward stop at or
        # before cur (reference quirk), gap > 45
        if len(r_stops) >= 1:
            prevr = np.concatenate([[0], r_stops[:-1]])
            cur = r_stops
            if len(f_stops):
                fi = np.searchsorted(f_stops, cur, side="right") - 1
                f_ok = (fi >= 0) & (f_stops[np.maximum(fi, 0)] != 0)
            else:
                f_ok = np.zeros(len(cur), dtype=bool)
            keep = f_ok & (cur - prevr > 45)
            for s, e in zip(prevr[keep].tolist(), cur[keep].tolist()):
                orfs.append(((e, 1), s, e, p + 3))
    orfs.sort(key=lambda o: o[0])
    # stable sort by descending length (Rust sort_by is stable)
    orfs.sort(key=lambda o: -(o[2] - o[1]))
    return [(s, e, p) for _k, s, e, p in orfs]


def fmh_seeds_aa_np(seq: np.ndarray, params: SketchParams):
    """AA FracMinHash over ORFs (reference: src/seeding.rs:114-223).

    Returns (seed_kmers u32, positions u32, canonical bool, markers u64)
    in scan order (ORF by ORF), like fmh_seeds_np.
    """
    marker_k = K_MARKER_AA
    k = params.k
    if k > marker_k:
        raise ValueError(f"Value of k > {marker_k} for AA; not allowed.")
    empty = (np.zeros(0, np.uint32), np.zeros(0, np.uint32),
             np.zeros(0, bool), np.zeros(0, np.uint64))
    if len(seq) < 2 * marker_k:
        return empty
    orfs = get_orfs_np(seq, params)
    if not orfs:
        return empty
    enc = _codon_tables(params)
    codes = BYTE_TO_SEQ[seq]
    threshold = _U((2 ** 64 - 1) // params.c)
    threshold_marker = _U((2 ** 64 - 1) // params.marker_c)

    out_k, out_p, out_c, out_m = [], [], [], []
    for start, end, phase in orfs:
        rc = phase > 2
        stop = min(end + 3, len(seq))
        # codon positions: j = 2, 5, 8, ... within [start, stop)
        j_codon = np.arange(2, stop - start, 3, dtype=np.int64)
        i_codon = start + j_codon          # global nt index of codon end
        if len(i_codon) == 0:
            continue
        c0 = codes[i_codon - 2]
        c1 = codes[i_codon - 1]
        c2 = codes[i_codon]
        if not rc:
            cod = (c0 << _U(4)) | (c1 << _U(2)) | c2
        else:
            cod = ((_U(3) - c2) << _U(4)) | ((_U(3) - c1) << _U(2)) \
                | (_U(3) - c0)
        aa = enc[cod.astype(np.int64)]
        T = len(aa)
        if T < marker_k:
            continue
        # windows of 6 (seed) and 10 (marker) AAs ending at codon t
        seed_km = np.zeros(T - marker_k + 1, dtype=np.uint64)
        marker_km = np.zeros(T - marker_k + 1, dtype=np.uint64)
        off = marker_k - 1  # first emitted codon index
        for s in range(marker_k):
            v = aa[off - s:T - s]
            if not rc:
                marker_km |= v << _U(5 * s)
                if s < k:
                    seed_km |= v << _U(5 * s)
            else:
                marker_km |= v << _U(5 * (marker_k - 1 - s))
                if s < k:
                    seed_km |= v << _U(5 * (k - 1 - s))
        h = mm_hash64(seed_km)
        keep = h < threshold
        if not keep.any():
            continue
        pos = i_codon[off:][keep].astype(np.uint32)
        out_k.append(seed_km[keep].astype(np.uint32))
        out_p.append(pos)
        out_c.append(np.full(len(pos), not rc, dtype=bool))
        out_m.append(marker_km[keep & (h < threshold_marker)])
    if not out_k:
        return empty
    return (np.concatenate(out_k), np.concatenate(out_p),
            np.concatenate(out_c), np.concatenate(out_m))
