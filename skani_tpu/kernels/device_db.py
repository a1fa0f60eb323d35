"""Device-resident sketch database.

Genome sketches are uploaded once as padded tensors and stay in HBM; pair
batches index into them on device.  This is the layout the multi-host path
shards along the genome axis (each host's chips hold a slice of the DB).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

KMER_SENTINEL = np.uint32(0xFFFFFFFF)
CTG_SENTINEL = np.int32(0x3FFFFFFF)


def _round_up(x: int, step: int = 4096, floor: int = 4096) -> int:
    return max(floor, ((x + step - 1) // step) * step)


class DeviceDb:
    """Padded per-genome sketch tensors on device.

    K = padded unique-kmer count, P = padded seed-position count.
    kmers are sorted ascending with KMER_SENTINEL padding; positions are in
    CSR (kmer-grouped) order with a parallel kmer-id per position.
    """

    def __init__(self, sketches: Sequence, device=None):
        G = len(sketches)
        self.sketches = list(sketches)
        K = _round_up(max((len(s.seed_kmers) for s in sketches), default=16))
        P = _round_up(max((len(s.seed_pos) for s in sketches), default=16))
        self.max_n_pos = max((len(s.seed_pos) for s in sketches), default=16)
        kmers = np.full((G, K), KMER_SENTINEL, dtype=np.uint32)
        starts = np.zeros((G, K), dtype=np.int32)
        counts = np.zeros((G, K), dtype=np.int32)
        pos = np.zeros((G, P), dtype=np.int32)
        ctg = np.full((G, P), CTG_SENTINEL, dtype=np.int32)
        canon = np.zeros((G, P), dtype=bool)
        pos_kid = np.zeros((G, P), dtype=np.int32)
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
            pos[g, :npos] = s.seed_pos
            ctg[g, :npos] = s.seed_contig
            canon[g, :npos] = s.seed_canon
            pos_kid[g, :npos] = np.repeat(
                np.arange(nk, dtype=np.int32), np.diff(s.seed_starts))
            n_kmers[g] = nk
            n_pos[g] = npos
        self.K, self.P, self.G = K, P, G
        dev = device or jax.devices()[0]
        put = lambda x: jax.device_put(jnp.asarray(x), dev)
        self.kmers = put(kmers)
        self.starts = put(starts)
        self.counts = put(counts)
        self.pos = put(pos)
        self.ctg = put(ctg)
        self.canon = put(canon)
        # packed per-position (contig << 1 | canonical): one gather instead
        # of two in the anchor-expansion hot path
        self.ctgc = put(ctg * 2 + canon.astype(np.int32))
        self.pos_kid = put(pos_kid)
        self.n_kmers = put(n_kmers)
        self.n_pos = put(n_pos)
