"""Host-side seed-rank tables (replaces the device phase-B rank queries).

The estimator tail needs, per 20kb chunk, counts of query-side seed
positions inside (contig, position) ranges, RESTRICTED to positions whose
k-mer survives the pair's repeat-band rules (reference: the
`positions_to_consider` bookkeeping inside src/chain.rs:608-836).  Phase A
used to sort the kept positions per pair on device and answer batched rank
queries in a second jit (one extra device round trip per batch).

The decomposition here makes the whole thing pair-independent host work:

    rank_kept(g, v) = rank_all(g, v) - rank_own_repeats(g, v)
                      - rank_shared_banned(g, v)

* rank_all: every real seed position of the query genome, sorted — cached
  per sketch.
* rank_own_repeats: positions of the query's own repetitive k-mers
  (count > band) — cached per (sketch, band); the band depends only on c.
* rank_shared_banned: positions of query k-mers that are non-repetitive in
  the query but repetitive in the REF side (count > band there).  Per
  pair, but tiny: it is the intersection of the query's k-mer list with
  the ref's repeat set (typically tens of k-mers).

All tables pack (ctg, pos) into one int64 `ctg * 2^32 + pos`, so a rank
query is a single np.searchsorted(side="right") — queries with v = -1
correctly mean "strictly before (g, 0)" under arithmetic packing.
"""
from __future__ import annotations

import numpy as np

_SHIFT = np.int64(1) << np.int64(32)


def _pack(ctg: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return ctg.astype(np.int64) * _SHIFT + pos.astype(np.int64)


def _tables(sketch, band: int):
    """Cached per-(sketch, band): (packed_all_sorted, packed_own_excl_sorted,
    repeat_kmers_sorted, kmer_counts)."""
    cache = getattr(sketch, "_rank_tables", None)
    if cache is None:
        cache = {}
        sketch._rank_tables = cache
    hit = cache.get(band)
    if hit is not None:
        return hit
    counts = np.diff(sketch.seed_starts)
    packed_all = np.sort(_pack(sketch.seed_contig, sketch.seed_pos))
    rep = counts > band
    if rep.any():
        rep_pos_mask = np.repeat(rep, counts)
        own = np.sort(_pack(sketch.seed_contig[rep_pos_mask],
                            sketch.seed_pos[rep_pos_mask]))
        rep_kmers = sketch.seed_kmers[rep]
    else:
        own = np.zeros(0, np.int64)
        rep_kmers = sketch.seed_kmers[:0]
    entry = (packed_all, own, rep_kmers, counts)
    cache[band] = entry
    return entry


def pair_banned_positions(query_sketch, ref_sketch, band: int) -> np.ndarray:
    """Sorted packed positions of query k-mers banned by the REF side's
    repeat rule (shared, query count <= band, ref count > band)."""
    qa, _qo, _qr, q_counts = _tables(query_sketch, band)
    _ra, _ro, ref_rep, _rc = _tables(ref_sketch, band)
    if len(ref_rep) == 0 or len(query_sketch.seed_kmers) == 0:
        return np.zeros(0, np.int64)
    idx = np.searchsorted(query_sketch.seed_kmers, ref_rep)
    idx = np.minimum(idx, len(query_sketch.seed_kmers) - 1)
    shared = query_sketch.seed_kmers[idx] == ref_rep
    kid = idx[shared & (q_counts[idx] <= band)]
    if len(kid) == 0:
        return np.zeros(0, np.int64)
    starts = query_sketch.seed_starts
    rows = np.concatenate([np.arange(starts[k], starts[k + 1])
                           for k in kid])
    return np.sort(_pack(query_sketch.seed_contig[rows],
                         query_sketch.seed_pos[rows]))


def rank_queries(query_sketch, ref_sketch, band: int, qc: np.ndarray,
                 qv: np.ndarray) -> np.ndarray:
    """rank_kept over the kept-position multiset for one pair; qc/qv are
    int contig ids / positions (v may be -1 for 'before contig start')."""
    packed_all, own_excl, _rep, _counts = _tables(query_sketch, band)
    banned = pair_banned_positions(query_sketch, ref_sketch, band)
    q = qc.astype(np.int64) * _SHIFT + qv.astype(np.int64)
    r = np.searchsorted(packed_all, q, side="right")
    if len(own_excl):
        r = r - np.searchsorted(own_excl, q, side="right")
    if len(banned):
        r = r - np.searchsorted(banned, q, side="right")
    return r.astype(np.int64)
