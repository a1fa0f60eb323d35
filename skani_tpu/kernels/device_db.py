"""Device-resident sketch database.

Genome sketches are uploaded once as padded tensors and stay in HBM; pair
batches index into them on device.  This is the layout the multi-host path
shards along the genome axis (each host's chips hold a slice of the DB).

Two position layouts coexist:

* CSR (kmer-grouped) order — `pos`/`ctgc` parallel to the sorted kmer
  table via `starts`/`counts`.  Within each kmer run, positions are sorted
  by (contig, position): the anchor expansion walks a ref kmer's run in
  order, so run-sortedness makes emitted anchors of one (query position,
  ref kmer) block already reference-Ord sorted.
* position-sorted order — `spos`/`sctgc`/`skid` sorted by (contig,
  position) with the owning kmer slot id alongside.  Driving the anchor
  expansion from THIS table emits anchors directly in the reference's
  Anchor sort order (types.rs:499-506 Ord), eliminating the per-pair
  5-key anchor sort entirely (see device_pipeline phase A).

When every genome fits (position < 2^24, contigs < 128), both layouts are
uploaded PRE-PACKED as single int32 words `ctgc << 24 | pos` (`apk` packed
position-sorted, `bpk` packed CSR) so each anchor needs ONE gather per
side instead of two.  `mode` selects what to upload:

* "sorted_packed" — apk, bpk, skid (the fast path)
* "sorted"        — spos, sctgc, skid + unpacked pos, ctgc
* "legacy"        — unpacked pos, ctgc only (AAI mode, where 6-frame ORFs
  can place two seeds at the same (contig, position) and the expansion
  order would not be a total sort order; or out-of-range genomes)
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

KMER_SENTINEL = np.uint32(0xFFFFFFFF)
CTG_SENTINEL = np.int32(0x3FFFFFFF)
PACK_POS_BITS = 24
# < 64 contigs so the packed-DP layout rc << 25 | rp keeps cross-contig
# position distances above every chaining threshold (see dp_pallas packed
# variant); genomes with more contigs use the unpacked "sorted" layout
PACK_MAX_CTGS = 64
PACK_RC_SHIFT = 25


def _round_up(x: int, step: int = 4096, floor: int = 4096) -> int:
    return max(floor, ((x + step - 1) // step) * step)


def db_pack_ok(sketches: Sequence) -> bool:
    """True when every genome's positions/contig counts fit the packed
    int32 `ctgc << 24 | pos` word.  The 64 KiB position margin keeps
    chunk-end coordinates (position + one 20 kb fragment) under 2^24 for
    the packed chunk-metadata word (hi << 7 | ctg << 1 | new)."""
    for s in sketches:
        if len(s.contig_lengths) > PACK_MAX_CTGS:
            return False
        if len(s.seed_pos) and int(s.seed_pos.max()) >= (
                (1 << PACK_POS_BITS) - 65536):
            return False
    return True


def db_has_duplicate_positions(sketches: Sequence) -> bool:
    """True if any genome has two seeds at the same (contig, position) —
    possible in AAI mode (6-frame ORFs), never for DNA seeds."""
    for s in sketches:
        if len(s.seed_pos) == 0:
            continue
        packed = s.seed_contig.astype(np.int64) << 32 \
            | s.seed_pos.astype(np.int64)
        if len(np.unique(packed)) != len(packed):
            return True
    return False


class DeviceDb:
    """Padded per-genome sketch tensors on device.

    K = padded unique-kmer count, P = padded seed-position count.
    kmers are sorted ascending with KMER_SENTINEL padding.
    """

    def __init__(self, sketches: Sequence, device=None,
                 mode: str = "legacy", dense_join_budget: int = 0):
        G = len(sketches)
        self.sketches = list(sketches)
        self.mode = mode
        K = _round_up(max((len(s.seed_kmers) for s in sketches), default=16))
        P = _round_up(max((len(s.seed_pos) for s in sketches), default=16))
        self.max_n_pos = max((len(s.seed_pos) for s in sketches), default=16)
        kmers = np.full((G, K), KMER_SENTINEL, dtype=np.uint32)
        starts = np.zeros((G, K), dtype=np.int32)
        counts = np.zeros((G, K), dtype=np.int32)
        pos = np.zeros((G, P), dtype=np.int32)
        ctgc = np.full((G, P), CTG_SENTINEL * 2, dtype=np.int32)
        srt = mode in ("sorted", "sorted_packed")
        if srt:
            spos = np.zeros((G, P), dtype=np.int32)
            sctgc = np.full((G, P), CTG_SENTINEL * 2, dtype=np.int32)
            skid = np.zeros((G, P), dtype=np.int32)
        # contig-id packing (contig*2 + canonical bit, and contig*4 + flags
        # on device) requires small contig indices
        max_ctgs = max((len(s.contig_lengths) for s in sketches), default=0)
        assert max_ctgs < (1 << 28), "too many contigs for device packing"
        n_kmers = np.zeros(G, dtype=np.int32)
        n_pos = np.zeros(G, dtype=np.int32)
        for g, s in enumerate(sketches):
            nk = len(s.seed_kmers)
            npos = len(s.seed_pos)
            kmers[g, :nk] = s.seed_kmers
            starts[g, :nk] = s.seed_starts[:-1]
            counts[g, :nk] = np.diff(s.seed_starts)
            kid = np.repeat(np.arange(nk, dtype=np.int32),
                            np.diff(s.seed_starts))
            # CSR with runs sorted by (contig, position) — see module doc
            order = np.lexsort((s.seed_pos, s.seed_contig, kid))
            p = s.seed_pos[order].astype(np.int64)
            c2 = (s.seed_contig[order].astype(np.int32) * 2
                  + s.seed_canon[order].astype(np.int32))
            pos[g, :npos] = p
            ctgc[g, :npos] = c2
            if srt:
                sorder = np.lexsort((p, c2 >> 1))
                spos[g, :npos] = p[sorder]
                sctgc[g, :npos] = c2[sorder]
                skid[g, :npos] = kid[order][sorder]
            n_kmers[g] = nk
            n_pos[g] = npos
        self.K, self.P, self.G = K, P, G
        dev = device or jax.devices()[0]
        put = lambda x: jax.device_put(jnp.asarray(x), dev)
        self.kmers = put(kmers)
        self.starts = put(starts)
        self.counts = put(counts)
        self.n_kmers = put(n_kmers)
        self.n_pos = put(n_pos)
        if mode == "sorted_packed":
            self.apk = put((sctgc << PACK_POS_BITS) | spos)
            self.bpk = put((ctgc << PACK_POS_BITS) | pos)
            self.skid = put(skid)
            self.arrays = dict(kmers=self.kmers, starts=self.starts,
                               counts=self.counts, apk=self.apk,
                               bpk=self.bpk, skid=self.skid,
                               n_pos=self.n_pos)
            # Dense GLOBAL-AXIS join tables (the all-pairs posting-list
            # amortization): the union of every genome's kmers is ranked
            # once; each genome stores its kmers as union ranks (gid) and
            # a dense (cnt << 17 | start) word per union slot — the
            # per-pair sorted-merge join then collapses to ONE row gather.
            # Memory is G x |union| x 4 bytes, so only built under budget
            # (0 disables); absent kmers hold 0 (present => cnt >= 1).
            # cheap upper bound first: skip the DB-wide unique entirely
            # when even the bound can't fit the budget
            u_bound = sum(len(s.seed_kmers) for s in sketches)
            if dense_join_budget and G * u_bound * 4 <= dense_join_budget \
                    * 8 and P < (1 << 17):
                union = np.unique(np.concatenate(
                    [s.seed_kmers for s in sketches]
                    or [np.zeros(0, np.uint32)]))
                U = _round_up(max(len(union), 128), 128, 128)
            else:
                union, U = None, 1 << 62
            if union is not None and dense_join_budget \
                    and G * U * 4 <= dense_join_budget and P < (1 << 17):
                gid = np.full((G, K), -1, dtype=np.int32)
                dense_cs = np.zeros((G, U), dtype=np.int32)
                for g, s in enumerate(sketches):
                    nk = len(s.seed_kmers)
                    if not nk:
                        continue
                    r = np.searchsorted(union, s.seed_kmers).astype(np.int32)
                    gid[g, :nk] = r
                    cnts = np.minimum(np.diff(s.seed_starts), 4095)
                    dense_cs[g, r] = (cnts.astype(np.int32) << 17) \
                        | starts[g, :nk]
                self.U = U
                self.gid = put(gid)
                self.dense_cs = put(dense_cs)
                self.arrays["gid"] = self.gid
                self.arrays["dense_cs"] = self.dense_cs
        elif mode == "sorted":
            self.pos = put(pos)
            self.ctgc = put(ctgc)
            self.spos = put(spos)
            self.sctgc = put(sctgc)
            self.skid = put(skid)
            self.arrays = dict(kmers=self.kmers, starts=self.starts,
                               counts=self.counts, pos=self.pos,
                               ctgc=self.ctgc, spos=self.spos,
                               sctgc=self.sctgc, skid=self.skid,
                               n_pos=self.n_pos)
        else:
            self.pos = put(pos)
            self.ctgc = put(ctgc)
            self.arrays = dict(kmers=self.kmers, starts=self.starts,
                               counts=self.counts, pos=self.pos,
                               ctgc=self.ctgc)
