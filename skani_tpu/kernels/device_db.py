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

import functools
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

KMER_SENTINEL = np.uint32(0xFFFFFFFF)
# host->device upload accounting (bytes): DB builds + row updates.  The
# search scale demo reads this to show that per-query traffic is O(query)
# once the DB is resident.
UPLOAD_BYTES = [0]
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


def _pack_genome(s, K: int, P: int, srt: bool):
    """One genome's padded row pieces at widths (K, P).  Returns a dict of
    1-D arrays: kmers, starts, counts, pos, ctgc (+ spos, sctgc, skid when
    srt).  Raises ValueError when the sketch exceeds the padded widths."""
    nk = len(s.seed_kmers)
    npos = len(s.seed_pos)
    if nk > K or npos > P:
        raise ValueError("sketch exceeds DeviceDb padded widths")
    out = dict(
        kmers=np.full(K, KMER_SENTINEL, dtype=np.uint32),
        starts=np.zeros(K, dtype=np.int32),
        counts=np.zeros(K, dtype=np.int32),
        pos=np.zeros(P, dtype=np.int32),
        ctgc=np.full(P, CTG_SENTINEL * 2, dtype=np.int32),
        n_kmers=np.int32(nk), n_pos=np.int32(npos),
    )
    if srt:
        out["spos"] = np.zeros(P, dtype=np.int32)
        out["sctgc"] = np.full(P, CTG_SENTINEL * 2, dtype=np.int32)
        out["skid"] = np.zeros(P, dtype=np.int32)
    if nk:
        out["kmers"][:nk] = s.seed_kmers
        out["starts"][:nk] = s.seed_starts[:-1]
        out["counts"][:nk] = np.diff(s.seed_starts)
        kid = np.repeat(np.arange(nk, dtype=np.int32),
                        np.diff(s.seed_starts))
        # CSR with runs sorted by (contig, position) — see module doc
        order = np.lexsort((s.seed_pos, s.seed_contig, kid))
        p = s.seed_pos[order].astype(np.int64)
        c2 = (s.seed_contig[order].astype(np.int32) * 2
              + s.seed_canon[order].astype(np.int32))
        out["pos"][:npos] = p
        out["ctgc"][:npos] = c2
        if srt:
            sorder = np.lexsort((p, c2 >> 1))
            out["spos"][:npos] = p[sorder]
            out["sctgc"][:npos] = c2[sorder]
            out["skid"][:npos] = kid[order][sorder]
    return out


class DeviceDb:
    """Padded per-genome sketch tensors on device.

    K = padded unique-kmer count, P = padded seed-position count.
    kmers are sorted ascending with KMER_SENTINEL padding.
    """

    def __init__(self, sketches: Sequence, device=None,
                 mode: str = "legacy", dense_join_budget: int = 0,
                 band: int = 0, min_k: int = 0, min_p: int = 0):
        G = len(sketches)
        self.sketches = list(sketches)
        self.mode = mode
        # K at 2048 granularity (every K-domain op accepts 1024; the join
        # word tables ride gathers whose cost scales with K).  P keeps
        # the 4096 stride: it is the expansion scatter's source width and
        # the wide scatter chunks it at 4096 (P % PC == 0).
        K = _round_up(max([min_k] + [len(s.seed_kmers) for s in sketches]
                          + [16]), step=2048, floor=4096)
        P = _round_up(max([min_p] + [len(s.seed_pos) for s in sketches]
                          + [16]))
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
            rowd = _pack_genome(s, K, P, srt)
            kmers[g] = rowd["kmers"]
            starts[g] = rowd["starts"]
            counts[g] = rowd["counts"]
            pos[g] = rowd["pos"]
            ctgc[g] = rowd["ctgc"]
            if srt:
                spos[g] = rowd["spos"]
                sctgc[g] = rowd["sctgc"]
                skid[g] = rowd["skid"]
            n_kmers[g] = rowd["n_kmers"]
            n_pos[g] = rowd["n_pos"]
        self.K, self.P, self.G = K, P, G
        dev = device or jax.devices()[0]

        def put(x):
            UPLOAD_BYTES[0] += x.nbytes
            return jax.device_put(jnp.asarray(x), dev)
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
                # 1024-multiple so the windowed sorted gather's (UB, 128)
                # sublane view tiles cleanly (UB % 8 == 0)
                U = _round_up(max(len(union), 1024), 1024, 1024)
            else:
                union, U = None, 1 << 62
            if union is not None and dense_join_budget \
                    and G * U * 4 <= dense_join_budget and P < (1 << 17):
                gid = np.full((G, K), -1, dtype=np.int32)
                dense_cs = np.zeros((G, U), dtype=np.int32)
                # POSITION-AXIS global ids (the faster join): gidp[g, p] is
                # the union rank of the kmer owning sorted-position slot p,
                # or -1 when the slot is padding OR the kmer's own count
                # exceeds the repeat band (the query-side a_cnt <= band
                # test, reference: src/chain.rs:674-676, baked in at build
                # time).  phase_a's per-pair join is then ONE row gather of
                # the ref's dense (cnt | start) table directly on the
                # position axis — the kmer-axis join pass and the
                # kmer->position jw gather both disappear.
                self.band = band
                gidp = np.full((G, P), -1, dtype=np.int32)
                for g, s in enumerate(sketches):
                    nk = len(s.seed_kmers)
                    if not nk:
                        continue
                    r = np.searchsorted(union, s.seed_kmers).astype(np.int32)
                    gid[g, :nk] = r
                    cnts = np.minimum(np.diff(s.seed_starts), 4095)
                    dense_cs[g, r] = (cnts.astype(np.int32) << 17) \
                        | starts[g, :nk]
                    if band > 0:
                        npos = len(s.seed_pos)
                        kid_p = np.asarray(skid[g, :npos])
                        gp = r[kid_p]
                        gp[np.asarray(np.diff(s.seed_starts))[kid_p]
                           > band] = -1
                        gidp[g, :npos] = gp
                self.U = U
                self.gid = put(gid)
                self.dense_cs = put(dense_cs)
                self.arrays["gid"] = self.gid
                self.arrays["dense_cs"] = self.dense_cs
                if band > 0:
                    self.gidp = put(gidp)
                    self.arrays["gidp"] = self.gidp
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

    def update_rows(self, slots: Sequence, sketches: Sequence) -> None:
        """Replace genome rows IN PLACE via a device-side scatter — only
        the new rows cross the host link, so swapping Q query genomes
        into a resident N-genome DB costs O(Q), not O(N).  This is what
        makes upload-once `search` possible (the TPU-native analog of the
        reference's mmap lazy loads, reference: src/sketch_db.rs:84-123).

        Raises ValueError when a sketch exceeds the padded widths or when
        the DB carries dense-join tables (their DB-wide kmer-union axis
        cannot be updated incrementally; build with dense_join_budget=0
        for updatable DBs)."""
        if "gid" in self.arrays or "gidp" in self.arrays:
            raise ValueError("dense-join DeviceDb rows are not updatable")
        srt = self.mode in ("sorted", "sorted_packed")
        rows = [_pack_genome(s, self.K, self.P, srt) for s in sketches]

        def stack(name):
            return np.stack([r[name] for r in rows])

        upd = dict(kmers=stack("kmers"), starts=stack("starts"),
                   counts=stack("counts"))
        if self.mode == "sorted_packed":
            upd["apk"] = (stack("sctgc") << PACK_POS_BITS) | stack("spos")
            upd["bpk"] = (stack("ctgc") << PACK_POS_BITS) | stack("pos")
            upd["skid"] = stack("skid")
            upd["n_pos"] = np.stack([r["n_pos"] for r in rows])
        elif self.mode == "sorted":
            for name in ("pos", "ctgc", "spos", "sctgc", "skid"):
                upd[name] = stack(name)
            upd["n_pos"] = np.stack([r["n_pos"] for r in rows])
        else:
            upd["pos"] = stack("pos")
            upd["ctgc"] = stack("ctgc")
        idx = jnp.asarray(np.asarray(slots, dtype=np.int32))
        for name, v in upd.items():
            arr = self.arrays[name]
            new = _scatter_rows(arr, idx, jnp.asarray(v).astype(arr.dtype))
            self.arrays[name] = new
            UPLOAD_BYTES[0] += v.nbytes
            if hasattr(self, name):
                setattr(self, name, new)
        for g, s in zip(slots, sketches):
            self.sketches[g] = s
        self.max_n_pos = max(
            [self.max_n_pos] + [len(s.seed_pos) for s in sketches])


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(arr, idx, rows):
    # donation keeps the update in place (no 2x HBM transient); the old
    # buffer is dead — every caller rebinds self.arrays[name]
    return arr.at[idx].set(rows)
