"""Marker-based screening (pre-filter before chaining).

Hash-set semantics become sorted-array set ops (reference: src/screen.rs).
The inverted index marker->sketch_ids is stored CSR-style so a query's
membership test is one searchsorted + bincount — the same masked sparse
lookup the sharded multi-host path broadcasts.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .params import K_MARKER_AA, K_MARKER_DNA, SCREEN_MINIMUM_KMERS


def check_markers_quickly(ref_sketch, query_sketch, screen_val: float,
                          rescue_small: bool) -> bool:
    """reference: src/screen.rs:84-142"""
    if screen_val == 0.0:
        return True
    min_card = min(len(ref_sketch.marker_seeds), len(query_sketch.marker_seeds))
    if min_card < SCREEN_MINIMUM_KMERS and rescue_small:
        return True
    if min_card == 0:
        return rescue_small
    assert ref_sketch.amino_acid == query_sketch.amino_acid
    k = K_MARKER_AA if ref_sketch.amino_acid else K_MARKER_DNA
    ratio = int(screen_val ** k * min_card)
    if ratio == 0:
        ratio = 1
    # Both marker arrays are sorted unique.  Mirror the reference's early
    # exit (reference: src/screen.rs:131-137 breaks once intersect_len >=
    # ratio): scan the smaller array in growing chunks and stop as soon as
    # the verdict is decided either way (the extra early-False exit cannot
    # change the boolean — the remaining elements can't reach ratio).
    a, b = ref_sketch.marker_seeds, query_sketch.marker_seeds
    if len(a) > len(b):
        a, b = b, a
    inter = 0
    start = 0
    n = len(a)
    chunk = max(256, 2 * ratio)
    while start < n:
        end = min(n, start + chunk)
        seg = a[start:end]
        idx = np.searchsorted(b, seg)
        idx = np.minimum(idx, len(b) - 1)
        inter += int((b[idx] == seg).sum())
        if inter >= ratio:
            return True
        start = end
        if inter + (n - start) < ratio:
            return False
        chunk *= 4
    return inter >= ratio


class MarkerIndex:
    """Inverted index marker k-mer -> sketch ids
    (reference: src/screen.rs:190-210 kmer_to_sketch_from_refs)."""

    def __init__(self, sketches: Sequence):
        parts_k = []
        parts_i = []
        self.marker_counts = np.array(
            [len(s.marker_seeds) for s in sketches], dtype=np.int64)
        for i, s in enumerate(sketches):
            if len(s.marker_seeds):
                parts_k.append(s.marker_seeds)
                parts_i.append(np.full(len(s.marker_seeds), i, dtype=np.uint32))
        if parts_k:
            allk = np.concatenate(parts_k)
            alli = np.concatenate(parts_i)
            order = np.argsort(allk, kind="stable")
            allk = allk[order]
            self.sketch_ids = alli[order]
            self.markers, starts = np.unique(allk, return_index=True)
            self.starts = np.append(starts, len(allk)).astype(np.int64)
        else:
            self.markers = np.zeros(0, dtype=np.uint64)
            self.starts = np.zeros(1, dtype=np.int64)
            self.sketch_ids = np.zeros(0, dtype=np.uint32)
        self.n_sketches = len(sketches)

    def counts_for(self, query_markers: np.ndarray) -> np.ndarray:
        """#shared markers per reference sketch for one query."""
        if len(query_markers) == 0 or len(self.markers) == 0:
            return np.zeros(self.n_sketches, dtype=np.int64)
        idx = np.searchsorted(self.markers, query_markers)
        idx = np.minimum(idx, len(self.markers) - 1)
        hit = self.markers[idx] == query_markers
        hit_idx = idx[hit]
        if len(hit_idx) == 0:
            return np.zeros(self.n_sketches, dtype=np.int64)
        # expand CSR ranges of the hit markers
        cnts = (self.starts[hit_idx + 1] - self.starts[hit_idx])
        base = np.repeat(self.starts[hit_idx], cnts)
        offs = np.arange(int(cnts.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(cnts) - cnts, cnts)
        ids = self.sketch_ids[base + offs]
        return np.bincount(ids, minlength=self.n_sketches).astype(np.int64)


def _screen_cutoffs(index: MarkerIndex, query_sketch, identity: float,
                    use_aa: bool) -> np.ndarray:
    k = K_MARKER_AA if use_aa else K_MARKER_DNA
    cutoff = identity ** k
    qn = len(query_sketch.marker_seeds)
    return np.maximum(
        (cutoff * np.minimum(index.marker_counts, qn)).astype(np.int64), 1)


def screen_refs(identity: float, index: MarkerIndex, query_sketch,
                sketch_params, rescue_small: bool) -> np.ndarray:
    """Returns indices passing the filter; used by dist/triangle
    (reference: src/screen.rs:148-189)."""
    if len(query_sketch.marker_seeds) < 20 and rescue_small:
        return np.arange(index.n_sketches)
    counts = index.counts_for(query_sketch.marker_seeds)
    cut = _screen_cutoffs(index, query_sketch, identity, sketch_params.use_aa)
    return np.nonzero(counts > cut)[0]


def screen_refs_indices(identity: float, index: MarkerIndex, query_sketch,
                        sketch_params) -> np.ndarray:
    """Search-mode variant, no rescue (reference: src/screen.rs:39-77)."""
    counts = index.counts_for(query_sketch.marker_seeds)
    cut = _screen_cutoffs(index, query_sketch, identity, sketch_params.use_aa)
    return np.nonzero(counts > cut)[0]


def check_small_contigs(ref_sketches, query_sketches, warn) -> None:
    """reference: src/screen.rs:10-36"""
    small = sum(1 for s in list(ref_sketches) + list(query_sketches)
                if len(s.marker_seeds) < SCREEN_MINIMUM_KMERS)
    total = len(ref_sketches) + len(query_sketches)
    if total == 0:
        return
    if small / total > 0.25 and total > 10_000:
        warn("Lots of small genomes detected with < 20 marker k-mers. "
             "Consider -m or using --faster-small for faster runtimes.")
