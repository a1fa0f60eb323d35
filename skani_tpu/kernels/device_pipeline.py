"""Device-resident pair engine (V5): join -> chunk -> DP -> chains on device.

The per-pair hot path of the reference (reference: src/chain.rs:144-171)
executed entirely on the TPU for a BATCH of genome pairs against the
device-resident DeviceDb:

  phase A (one jit):
    * seed join: either the dense GLOBAL-AXIS join (DB-wide kmer union
      ranked once; per pair, ONE MXU row gather of the ref's dense
      (cnt | start) table — the all-pairs posting-list amortization) or
      a sorted-merge searchsorted join, both with the reference's repeat
      band caps (reference: src/chain.rs:666-712);
    * anchor expansion DIRECTLY IN SORTED ORDER: the expansion walks the
      query's (contig, position)-sorted seed table (device_db `skid`)
      and each ref kmer run is itself run-sorted, so emitted anchors are
      already in the reference's Anchor Ord (types.rs:499-506) — there
      is NO per-pair anchor sort.  Slot->source mapping is one scatter
      + forward-fill cummax over the per-position offset table;
      positions+contigs are pre-packed (ctgc << 24 | pos), one gather
      per anchor side (AAI / out-of-range DBs keep a legacy kmer-order
      + 5-key-sort path);
    * fragment chunking in CLOSED FORM: the reference's sequential
      cep-advance scan (reference: src/chain.rs:738-826) reduces, per contig
      segment, to m_t = min(q_t, t+1, t + prefmin_s(q_s - s)) where
      q_t = max(0, (qp_t - qp_first - 1) // fragment_length) — q_t is
      nondecreasing because anchors are sorted, so the cascade counter is a
      segmented prefix-min, computed here as a single lax.cummax over
      (segment_id << VBITS | encoded value) packed keys; per-chunk
      metadata lands in ONE packed (hi | ctg | new) .set scatter;
    * banded chaining DP, two layouts: COMPACT-STREAM (default target,
      kernels/dp_compact.py, SKANI_TPU_COMPACT_DP) walks the anchors
      exactly where the expansion left them — chunk identity rides
      in-band (cid tag / full-cid plane), rows split into segment-lanes
      with an L_CAP halo, and the regroup scatters AND the extraction
      gather disappear entirely; or PADDED (kernels/dp_pallas.py, the
      fallback for legacy/AAI and the wide+wide-band combination) with
      anchors regrouped to rows-per-chunk so the sequential length is
      the chunk cap.  Both are Pallas VMEM kernels on TPU with
      bit-identical lax.scan/interpret fallbacks; chain ROOT and DEPTH
      propagate through the band ring buffer, so no pointer-chasing
      pass is needed afterwards;
    * chain extraction by SORT AGGREGATION: anchors sorted by (root,
      key desc) put each chain's best (score, col) key first in its root
      group; good roots compact with a second 2-array sort, and every
      other per-chain field comes from tiny (R, I_CAP) gathers at the
      root columns.  (The reference's set-size >= min_anchors check is
      implied by num_anchors <= size.);
    * row-local lookups route through an MXU one-hot gather kernel
      (kernels/gather_pallas.py) on TPU;
    * ALL outputs packed into one int32 tensor (one host roundtrip;
      6 words per interval + 1 per chunk in packed mode).
  host: greedy overlap resolution + per-chunk aggregation (native C++);
    the seed-rank queries it emits are answered from HOST-side sorted
    position tables (kernels/rank_host.py: rank_all - rank_own_repeats -
    rank_shared_banned, pair-independent except for a tiny banned set), so
    there is no second device round trip per batch.

  run_pairs buckets pairs into power-of-two anchor-buffer sizes, drains a
  shared work queue from both ends (device batches from the front, several
  in flight; optional host C++ worker threads stealing single pairs from
  the back when spare cores exist), and computes mirrored pair
  orientations once.

Performance notes (measured on TPU v5e over a tunneled link; full cost
model and stage profile in PERF.md): XLA scatters/gathers cost ~5-9
ns/element at these shapes, MXU one-hot gathers ~half that, lax.sort and
cum-scans are near-free, and .set scatters are ~2.5x cheaper than .max —
V5 is written to minimize the scatter/gather pass count per anchor.

Only sketches (once per genome) and tiny per-pair results cross the host
link — the design premise for both the slow-link single chip and the
multi-host sharded DB (see __graft_entry__.dryrun_multichip and
skani_tpu/multihost.py).
"""
from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache: phase A is a large graph (~minutes to
# compile over the remote-compile link); cache it across processes.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SKANI_TPU_JAX_CACHE",
                                 os.path.expanduser("~/.cache/skani_jax")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .. import stats
from .device_db import PACK_RC_SHIFT, DeviceDb
from .dp_pallas import dp_chain, dp_chain_packed
from .expand_pallas import expand_anchors
from .gather_pallas import (genome_map_gather, genome_map_gather_ok,
                            mxu_gather_ok, mxu_row_gather, mxu_row_scatter,
                            mxu_row_scatter_multi_wide, mxu_scatter_ok,
                            windowed_gather_ok, windowed_sorted_gather)

I32MAX = np.int32(2 ** 31 - 1)
BIG = jnp.int32(1 << 30)


def _ceil_log2(n: int) -> int:
    return int(np.ceil(np.log2(max(n, 2))))


def _contig_quants(sk):
    """Cached 10/50/90% contig-length quantiles, pre-cast through f32
    exactly as finalize_ani computes them (reference: src/chain.rs:519-554)."""
    qs = getattr(sk, "_quants_cache", None)
    if qs is None:
        s = np.sort(sk.contig_lengths)
        n = len(s)
        qs = (float(np.float32(s[n * 10 // 100])),
              float(np.float32(s[n * 50 // 100])),
              float(np.float32(s[n * 90 // 100])))
        sk._quants_cache = qs
    return qs


def _row_gather(mat, idx):
    """take_along_axis(mat, idx, axis=1) as a flat 1-D gather.

    XLA lowers 1-D gathers far better than 2-D take_along_axis on TPU
    (~3ms vs ~60ms per million elements at our shapes).
    """
    R, N = mat.shape
    rows = jnp.arange(R, dtype=jnp.int32)[:, None]
    return mat.reshape(-1)[(rows * N + idx).reshape(-1)].reshape(idx.shape)


# ---------------------------------------------------------------------------
# phase A
# ---------------------------------------------------------------------------

def _chk(*xs):
    """Tiny checksum forcing full evaluation (profiling early-returns)."""
    return jnp.stack([jnp.sum(x.astype(jnp.int32)) for x in xs])


@functools.partial(
    jax.jit,
    static_argnames=("A", "I_CAP", "C_CAP", "L_CAP", "band", "fl", "pcl",
                     "max_gap", "anchor_score", "min_anchors", "min_score",
                     "use_pallas", "gen_mode", "join_mode", "stage",
                     "fused_regroup", "compact_dp", "compact_wide"))
def phase_a(db, ab_idx,
            A: int, I_CAP: int, C_CAP: int, L_CAP: int, band: int, fl: int,
            pcl: int, max_gap: float, anchor_score: float, min_anchors: int,
            min_score: float, use_pallas: bool = False,
            gen_mode: str = "legacy", join_mode: str = "merge",
            stage: int = 99, fused_regroup: bool = False,
            compact_dp: int = 0, compact_wide: bool = False):
    # the pair indices arrive STACKED (2, R) — one host->device transfer
    # per batch instead of two (each put is a roundtrip on tunneled links)
    a_idx, b_idx = ab_idx[0], ab_idx[1]
    R = a_idx.shape[0]
    K = db["kmers"].shape[1]
    P = (db["apk"] if gen_mode == "sorted_packed" else db["pos"]).shape[1]

    a_cnt = db["counts"][a_idx]

    def rg(table, index):
        """Row gather: MXU one-hot kernel when shapes allow, XLA flat
        gather otherwise (CPU, narrow tables like small chunk caps, or
        tables too WIDE for the one-hot kernel — its matmul cost and its
        VMEM row block both scale with table width, so big-genome
        position tables route to XLA; see gather_pallas.mxu_gather_ok)."""
        if use_pallas and mxu_gather_ok(table.shape[0], table.shape[1],
                                        index.shape[1]):
            return mxu_row_gather(table, index)
        return _row_gather(table, index)

    assert band < 4096

    join_ovf = jnp.zeros((R,), bool)
    pos_join = join_mode == "dense_pos"
    if pos_join:
        # --- POSITION-AXIS dense join (see device_db.gidp): the per-pair
        # join is ONE row gather of the ref's dense (cnt << 17 | start)
        # table at the query's per-position global kmer ids; the kmer-axis
        # join pass and the kmer->position jw mapping gather are gone.
        # The query-side repeat test (a_cnt <= band) is baked into gidp
        # (-1), matching the engine's band check at dispatch.
        gidp_a = db["gidp"][a_idx]                     # (R, P)
        csb_p = rg(db["dense_cs"][b_idx], jnp.maximum(gidp_a, 0))
        okp = (gidp_a >= 0) & (csb_p != 0) & ((csb_p >> 17) <= band)
        cnt_p = jnp.where(okp, csb_p >> 17, 0)
        bs_p = jnp.where(okp, csb_p & ((1 << 17) - 1), 0)
        if stage == 1:   # join only
            return _chk(okp, cnt_p, bs_p)
    elif join_mode == "dense":
        # --- GLOBAL-AXIS join (all-pairs posting-list amortization):
        # kmers are pre-ranked on the DB-wide union axis, so the per-pair
        # sorted-merge collapses to ONE row gather of the ref genome's
        # dense (cnt << 17 | start) table (0 = absent; present => cnt >= 1)
        gid_a = db["gid"][a_idx]                      # (R, K)
        if stage == 21:  # join: query-side gid row gather only
            return _chk(gid_a)
        valid_k = gid_a >= 0
        U = db["dense_cs"].shape[1]
        dcs_b = db["dense_cs"][b_idx]                 # (R, U)
        if stage == 22:  # join: + ref-side dense table row gather
            return _chk(dcs_b)
        if use_pallas and K % 1024 == 0 and windowed_gather_ok(R, U, K):
            # gid is ASCENDING per row (searchsorted ranks of the sorted
            # kmer table), so the union-axis gather takes the windowed
            # kernel (~0.4 ms vs ~7.5 ms full one-hot at U~126k, R=32).
            # Padding kmers (-1) fill with the row max to stay sorted;
            # rows whose tile range exceeds the window overflow to the
            # exact native path (never observed at real kmer densities)
            gmax = jnp.max(gid_a, axis=1, keepdims=True)
            idx_sorted = jnp.maximum(jnp.where(valid_k, gid_a, gmax), 0)
            csb, join_ovf = windowed_sorted_gather(dcs_b, idx_sorted)
        else:
            csb = rg(dcs_b, jnp.maximum(gid_a, 0))
        if stage == 23:  # join: + union-axis windowed gather
            return _chk(csb, join_ovf)
        hit = valid_k & (csb != 0)
        b_cnt_hit = jnp.where(hit, csb >> 17, 0)
        b_start_hit = jnp.where(hit, csb & ((1 << 17) - 1), 0)
        a_ok = (a_cnt <= band) & valid_k
    else:
        # --- sorted-merge join (reference: src/chain.rs:666-712) ---
        ak = db["kmers"][a_idx]   # (R, K)
        bk = db["kmers"][b_idx]
        b_cnt = db["counts"][b_idx]
        b_start = db["starts"][b_idx]
        idx = jax.vmap(functools.partial(jnp.searchsorted,
                                         method="sort"))(bk, ak)
        idx = jnp.minimum(idx, K - 1)
        a_valid = ak != jnp.uint32(0xFFFFFFFF)
        bk_i = jax.lax.bitcast_convert_type(bk, jnp.int32)
        ak_i = jax.lax.bitcast_convert_type(ak, jnp.int32)
        hit = (rg(bk_i, idx) == ak_i) & a_valid
        if P < (1 << 17):
            # pack (count, start) so the join needs two gathers, not three
            # (count clipped to 4095 — only compared against band < 4096)
            pk_cs = (jnp.minimum(b_cnt, 4095) << 17) | b_start
            cs = rg(pk_cs, idx)
            b_cnt_hit = jnp.where(hit, cs >> 17, 0)
            b_start_hit = jnp.where(hit, cs & ((1 << 17) - 1), 0)
        else:
            b_cnt_hit = jnp.where(hit, rg(b_cnt, idx), 0)
            b_start_hit = jnp.where(hit, rg(b_start, idx), 0)
        a_ok = (a_cnt <= band) & a_valid
    if not pos_join:
        pair_ok = hit & a_ok & (b_cnt_hit <= band)
        if stage == 1:   # join only
            return _chk(hit, b_cnt_hit, b_start_hit, pair_ok)

    # (the per-pair kept-position rank table that used to be sorted here is
    # now answered host-side — kernels/rank_host.py — as
    # rank_all - rank_own_repeats - rank_shared_banned, all of which are
    # pair-independent or tiny; phase B and its device round trip are gone)

    slots = jnp.arange(A, dtype=jnp.int32)[None, :]
    rowi = jnp.arange(R)[:, None]

    expand_ovf = jnp.zeros((R,), jnp.int32)
    if gen_mode == "legacy":
        # --- anchor expansion in KMER order + 5-key sort ---
        # slot -> kmer assignment: scatter each emitting kmer's id at its
        # first output slot, then forward-fill with cummax (offsets strictly
        # increase across emitting kmers, so each slot sees the right kmer).
        pos_a = db["pos"][a_idx]
        ctgc_a = db["ctgc"][a_idx]    # packed contig*2 + canonical
        a_start = db["starts"][a_idx]
        pair_counts = jnp.where(pair_ok, a_cnt * b_cnt_hit, 0)
        offs = jnp.cumsum(pair_counts, axis=1) - pair_counts
        total = offs[:, -1] + pair_counts[:, -1]
        kcols = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :], (R, K))
        emit = pair_ok & (pair_counts > 0) & (offs < A)
        g = jnp.full((R, A), -1, jnp.int32).at[
            rowi, jnp.where(emit, offs, A)].max(kcols, mode="drop")
        g = jnp.clip(jax.lax.cummax(g, axis=1), 0, K - 1)
        anchor_valid = slots < jnp.minimum(total, A)[:, None]
        # the big (R, A)-index gathers route through the MXU one-hot kernel
        # on TPU (~2x the XLA gather); fuse the per-kmer lookups into as few
        # of them as possible: (offset, count) pack into one int32;
        # (a_start, b_start) pack when the position table is small (16+16)
        pk_oc = (jnp.minimum(offs, A) << 12) | jnp.minimum(b_cnt_hit, 4095)
        oc = rg(pk_oc, g)
        rank = slots - (oc >> 12)
        bc = jnp.maximum(oc & 4095, 1)
        if P <= 65536:
            pk_ab = (a_start << 16) | b_start_hit
            ab = rg(pk_ab, g)
            a_start_g = (ab >> 16) & 0xFFFF
            b_start_g = ab & 0xFFFF
        else:
            a_start_g = rg(a_start, g)
            b_start_g = rg(b_start_hit, g)
        arow = jnp.clip(a_start_g + rank // bc, 0, P - 1)
        brow = jnp.clip(b_start_g + rank % bc, 0, P - 1)

        pos_b = db["pos"][b_idx]
        ctgc_b = db["ctgc"][b_idx]
        qp = jnp.where(anchor_valid, rg(pos_a, arow), I32MAX)
        qcc = rg(ctgc_a, arow)
        rp = jnp.where(anchor_valid, rg(pos_b, brow), I32MAX)
        rcc = rg(ctgc_b, brow)
        qc = jnp.where(anchor_valid, qcc >> 1, I32MAX)
        rc = jnp.where(anchor_valid, rcc >> 1, I32MAX)
        rev = ((qcc & 1) != (rcc & 1)) & anchor_valid
        if stage == 3:   # + anchor expansion
            return _chk(qp, rp, qc, rc, rev)

        # --- anchor sort (reference: src/types.rs:499-506 Ord) ---
        qc, qp, rc, rp, rev_s, anchor_valid = jax.lax.sort(
            (qc, qp, rc, rp, rev.astype(jnp.int32), anchor_valid),
            dimension=1, num_keys=5)
        rev = rev_s.astype(bool)
        if stage == 4:   # + anchor sort
            return _chk(qc, qp, rc, rp, rev)
    else:
        # --- anchor expansion in SORTED order (no anchor sort needed) ---
        # The expansion walks the query's (contig, position)-sorted seed
        # table; each position's anchors are its ref kmer run (itself
        # (contig, position)-sorted — device_db sorts CSR runs), so emitted
        # anchors are ALREADY in the reference's Anchor Ord
        # (types.rs:499-506).  DNA seeds have unique (contig, position), so
        # this order is total; AAI mode uses the legacy path.
        if not pos_join:
            n_pos_a = db["n_pos"][a_idx][:, None]
            pcols_v = jnp.broadcast_to(
                jnp.arange(P, dtype=jnp.int32)[None, :], (R, P))
            valid_p = pcols_v < n_pos_a
            if P < (1 << 19):
                # per-kmer join word -> position domain (one row-local
                # gather); b_start < 2^19, count <= band < 2^12
                jw = jnp.where(pair_ok, (b_start_hit << 12) | b_cnt_hit, 0)
                if use_pallas \
                        and genome_map_gather_ok(db["skid"].shape[0], P, K) \
                        and os.environ.get("SKANI_TPU_GMAP", "1") == "1":
                    # skid is per-GENOME constant, so the one-hot factors
                    # cache across a genome's rows (batch rows arrive
                    # sorted by query genome) — and the (R, P) skid row
                    # gather disappears with them
                    jw_p = jnp.where(
                        valid_p, genome_map_gather(db["skid"], a_idx, jw),
                        0)
                else:
                    jw_p = jnp.where(valid_p, rg(jw, db["skid"][a_idx]), 0)
                cnt_p = jw_p & 0xFFF
                bs_p = jw_p >> 12
            else:
                # big-genome buckets (> 2^19 seed positions, 60+ Mbp at
                # c=125): start offsets no longer fit the packed join
                # word — two separate mapping gathers
                cnt_w = jnp.where(pair_ok, b_cnt_hit, 0)
                bs_w = jnp.where(pair_ok, b_start_hit, 0)
                skid_a = db["skid"][a_idx]
                cnt_p = jnp.where(valid_p, rg(cnt_w, skid_a), 0)
                bs_p = jnp.where(valid_p, rg(bs_w, skid_a), 0)
        pcols = jnp.broadcast_to(
            jnp.arange(P, dtype=jnp.int32)[None, :], (R, P))
        offs_p = jnp.cumsum(cnt_p, axis=1) - cnt_p
        total = offs_p[:, -1] + cnt_p[:, -1]
        anchor_valid = slots < jnp.minimum(total, A)[:, None]
        if gen_mode == "sorted_packed" and use_pallas \
                and A % 1024 == 0 and P % 128 == 0 and P >= 2048 \
                and os.environ.get("SKANI_TPU_EXPAND_KERNEL") == "1":
            # EXPERIMENTAL banded Pallas expansion (expand_pallas.py).
            # Exact on hardware, but measured ~60x slower than theory:
            # the windowed compare-count formulation does ~2k VPU ops per
            # anchor slot and Mosaic's degenerate-layout handling of the
            # (TILE, 1)-shaped intermediates multiplies that further —
            # the XLA scatter+cummax path below wins at ~5-9 ns/element.
            # Kept behind an env flag as the measured record of the
            # experiment (see PERF.md).
            aw, brow_k, expand_ovf = expand_anchors(
                offs_p, bs_p, db["apk"][a_idx], total, A)
            bw = rg(db["bpk"][b_idx], jnp.clip(brow_k, 0, P - 1))
            qp_r = aw & 0xFFFFFF
            qcc = (aw >> 24) & 0xFF
            rp_r = bw & 0xFFFFFF
            rcc = (bw >> 24) & 0xFF
        else:
            # slot -> source position: scatter each emitting position's
            # index at its first output slot, forward-fill with cummax
            # (measured 2x cheaper than the equivalent sorted-merge
            # searchsorted at these shapes); block starts recover the
            # intra-block rank
            emit = (cnt_p > 0) & (offs_p < A)
            # FUSED query-side expansion (sorted_packed): the apk gather at
            # g is a forward-fill of apk VALUES, because g itself is a
            # forward-fill of position indices and apk is sorted.  Scatter
            # a monotone repack of apk (ctg<<25 | pos<<1 | canon — the
            # canonical bit moves BELOW pos so the word is nondecreasing
            # in (ctg, pos) order; 6+24+1 = 31 bits, fits int32) as a
            # second payload of the SAME fill scatter and cummax it: the
            # entire (R, A) query-side gather pass disappears for the cost
            # of 4 extra plane matmuls inside the scatter + one cummax.
            fused_apk = (gen_mode == "sorted_packed" and P <= 65536
                         and os.environ.get("SKANI_TPU_FUSED_APK", "1")
                         == "1")
            aw_fill = None
            if P <= 65536:
                # both the position index and its ref-run start fit 16
                # bits, so ONE packed (p << 16 | bs) fill carries both —
                # the fill word stays monotone in p, and the separate
                # (R, A) bs gather (a full random-access pass) is gone
                pk = ((pcols.astype(jnp.uint32) << 16)
                      | bs_p.astype(jnp.uint32))
                if fused_apk:
                    apk_a = db["apk"][a_idx]
                    awf = (((apk_a >> 25) << 25)
                           | ((apk_a & 0xFFFFFF) << 1)
                           | ((apk_a >> 24) & 1))
                tgt = jnp.where(emit, offs_p, A)
                if use_pallas \
                        and mxu_scatter_ok(R, P, A, 2 if fused_apk else 1) \
                        and os.environ.get("SKANI_TPU_MXU_SCATTER",
                                           "1") == "1":
                    # MXU one-hot scatter (unique targets): measured
                    # 2.6 ms vs 7.3 ms for the XLA fill+cummax at
                    # (32, 40960)->(32, 49152).  Bitcast to uint32 so
                    # the forward-fill cummax compares unsigned (pk's
                    # top bit is set for pcols >= 32768).
                    if fused_apk:
                        outs = mxu_row_scatter_multi_wide(
                            tgt,
                            jnp.stack([jax.lax.bitcast_convert_type(
                                pk, jnp.int32), awf], axis=1), A)
                        fw = jax.lax.bitcast_convert_type(
                            outs[:, 0], jnp.uint32)
                        aw_fill = outs[:, 1]
                    else:
                        fw_i = mxu_row_scatter(
                            tgt,
                            jax.lax.bitcast_convert_type(pk, jnp.int32), A)
                        fw = jax.lax.bitcast_convert_type(fw_i, jnp.uint32)
                else:
                    fw = jnp.zeros((R, A), jnp.uint32).at[
                        rowi, tgt].max(
                        jnp.where(emit, pk, jnp.uint32(0)), mode="drop")
                    if fused_apk:
                        aw_fill = jnp.zeros((R, A), jnp.int32).at[
                            rowi, tgt].max(
                            jnp.where(emit, awf, 0), mode="drop")
                if stage == 31:  # expansion: fill scatter only
                    return _chk(fw)
                fwm = jax.lax.cummax(fw, axis=1)
                g = jnp.minimum(fwm >> 16, jnp.uint32(P - 1)
                                ).astype(jnp.int32)
                bs = (fwm & jnp.uint32(0xFFFF)).astype(jnp.int32)
            else:
                fw = jnp.full((R, A), -1, jnp.int32).at[
                    rowi, jnp.where(emit, offs_p, A)].max(
                    jnp.where(emit, pcols, -1), mode="drop")
                g = jnp.clip(jax.lax.cummax(fw, axis=1), 0, P - 1)
                bs = None
            prev_g = jnp.concatenate(
                [jnp.full((R, 1), -2, jnp.int32), g[:, :-1]], axis=1)
            block_start = jax.lax.cummax(
                jnp.where(g != prev_g, slots, 0), axis=1)
            rank = slots - block_start
            if bs is None:
                bs = rg(bs_p, g)
            brow = jnp.clip(bs + rank, 0, P - 1)
            if stage == 32:  # expansion: + forward-fill, rank, brow
                return _chk(g, bs, brow)
            if gen_mode == "sorted_packed":
                # ONE gather per side: positions pre-packed ctgc<<24 | pos.
                # g is a cummax forward-fill => NONDECREASING per row, so
                # the query-side gather takes the windowed kernel when the
                # shapes allow (microbench: 1.9 ms vs 8.5 ms MXU one-hot
                # at (32, 40960) x (32, 49152)).  Sparse-hit pairs whose
                # 1024-anchor tile spans more than WB*128 positions set
                # the per-row overflow and ride the exact native fallback
                # (never hit on screened-in pairs at default presets).
                if aw_fill is not None:
                    # fused path: forward-fill the scattered monotone apk
                    # word — no gather pass
                    awm = jax.lax.cummax(aw_fill, axis=1)
                    qp_r = (awm >> 1) & 0xFFFFFF
                    qcc = ((awm >> 25) << 1) | (awm & 1)
                    if stage == 33:  # expansion: + query-side fill
                        return _chk(awm)
                else:
                    apk_wb = int(os.environ.get("SKANI_TPU_APK_WB", "64"))
                    if use_pallas and apk_wb > 0 \
                            and windowed_gather_ok(R, P, A, WB=apk_wb):
                        aw, apk_ovf = windowed_sorted_gather(
                            db["apk"][a_idx], g, WB=apk_wb)
                        join_ovf = join_ovf | apk_ovf
                    else:
                        aw = rg(db["apk"][a_idx], g)
                    if stage == 33:  # expansion: + query-side gather
                        return _chk(aw)
                    qp_r = aw & 0xFFFFFF
                    qcc = (aw >> 24) & 0xFF
                bw = rg(db["bpk"][b_idx], brow)
                if stage == 34:  # expansion: + ref-side gather
                    return _chk(bw)
                rp_r = bw & 0xFFFFFF
                rcc = (bw >> 24) & 0xFF
            else:
                qp_r = rg(db["spos"][a_idx], g)
                qcc = rg(db["sctgc"][a_idx], g)
                rp_r = rg(db["pos"][b_idx], brow)
                rcc = rg(db["ctgc"][b_idx], brow)
        qp = jnp.where(anchor_valid, qp_r, I32MAX)
        rp = jnp.where(anchor_valid, rp_r, I32MAX)
        qc = jnp.where(anchor_valid, qcc >> 1, I32MAX)
        rc = jnp.where(anchor_valid, rcc >> 1, I32MAX)
        rev = ((qcc ^ rcc) & 1).astype(bool) & anchor_valid
        if stage in (3, 4):   # + anchor expansion (already sorted)
            return _chk(qc, qp, rc, rp, rev)

    # --- closed-form fragment chunking (see module docstring) ---
    cols = jnp.broadcast_to(jnp.arange(A, dtype=jnp.int32)[None, :], (R, A))
    prev_qc = jnp.concatenate([jnp.full((R, 1), -1, jnp.int32),
                               qc[:, :-1]], axis=1)
    seg_start = anchor_valid & (qc != prev_qc)
    # first column of the current segment: forward-fill of flagged columns
    seg_idx0 = jnp.maximum(
        jax.lax.cummax(jnp.where(seg_start, cols, -1), axis=1), 0)
    if gen_mode == "sorted_packed":
        # anchors are (qc, qp)-sorted and qc < 64 (db_pack_ok), so the
        # packed (qc << 24 | qp) word is nondecreasing along the row: a
        # seg-start-masked cummax forward-fills the segment's FIRST word
        # — replacing a full (R, A) gather with one cheap scan pass
        # (microbench: 0.7 ms vs 2.7-13 ms for the gather at R=32)
        qp_first = jax.lax.cummax(
            jnp.where(seg_start, (qc << 24) | qp, -1), axis=1) & 0xFFFFFF
    else:
        qp_first = rg(qp, seg_idx0)
    t_in_seg = cols - seg_idx0
    u = qp - qp_first
    q_units = jnp.maximum(0, (u - 1) // fl).astype(jnp.int32)
    # segmented prefix-min of (q_units - t_in_seg) via one packed cummax:
    # high bits = segment id (resets the running min at each new segment),
    # low VBITS = descending encoding of the value (so max picks the min).
    VBITS = _ceil_log2(A) + 1
    VCAP = (1 << VBITS) - 1
    QMAX = VCAP - A - 1
    seg_id = jnp.cumsum(seg_start.astype(jnp.int32), axis=1)
    seg_overflow = seg_id[:, -1] >= (1 << (30 - VBITS))
    qu_overflow = jnp.any(anchor_valid & (q_units > QMAX), axis=1)
    q_units = jnp.minimum(q_units, QMAX)
    v_enc = VCAP - (q_units - t_in_seg + A)    # in [0, VCAP-1], desc in v
    packed = (seg_id << VBITS) | v_enc
    pm = (VCAP - (jax.lax.cummax(packed, axis=1) & VCAP)) - A
    m = jnp.minimum(jnp.minimum(q_units, t_in_seg + 1), t_in_seg + pm)
    prev_m = jnp.concatenate([jnp.zeros((R, 1), jnp.int32), m[:, :-1]],
                             axis=1)
    chunk_start = seg_start | (anchor_valid & ~seg_start & (m != prev_m))
    cid = jnp.cumsum(chunk_start.astype(jnp.int32), axis=1) - 1
    cid = jnp.where(anchor_valid, cid, -1)
    n_chunks = jnp.max(cid, axis=1) + 1

    # per-chunk metadata (scatter at chunk-start anchors; OOB -> drop)
    # hi = qp_first + (m+1)*fl, except the globally last chunk: the LAST
    # anchor's query position in sorted order (reference closes the final
    # chunk at a_qp[n-1], NOT the max position across contigs —
    # src/chain.rs:804-817)
    hi_vals = qp_first + (m + 1) * fl
    # compact chunk-start metadata to columns 0..n_chunks-1 with a SORT,
    # not a scatter: cids are distinct and contiguous over chunk starts,
    # so sorting on where(chunk_start, cid, BIG) lands chunk c's payload
    # exactly at column c (sorts are ~free on the VPU — microbench 1-2 ms
    # vs 6-9 ms for an (R, A)-source XLA scatter)
    skey = jnp.where(chunk_start, cid, BIG)
    ccols = jnp.arange(C_CAP, dtype=jnp.int32)[None, :]
    if gen_mode == "sorted_packed":
        # ONE packed metadata payload (hi < 2^24 guaranteed by
        # db_pack_ok's position margin, ctg < 64): hi<<7 | ctg<<1 | new
        wmeta = (hi_vals << 7) | (qc << 1) | seg_start.astype(jnp.int32)
        skey_s, wmeta_s = jax.lax.sort((skey, wmeta), dimension=1,
                                       num_keys=1)
        present = skey_s[:, :C_CAP] == ccols
        meta_buf = jnp.where(present, wmeta_s[:, :C_CAP], -1)
        miss = meta_buf < 0
        chunk_ctg = jnp.where(miss, -1, (meta_buf >> 1) & 0x3F)
        chunk_new_ctg = jnp.where(miss, False, (meta_buf & 1) == 1)
        chunk_hi = jnp.where(miss, -1, meta_buf >> 7)
    else:
        skey_s, qc_s, new_s, hi_s = jax.lax.sort(
            (skey, qc, seg_start.astype(jnp.int32), hi_vals),
            dimension=1, num_keys=1)
        present = skey_s[:, :C_CAP] == ccols
        chunk_ctg = jnp.where(present, qc_s[:, :C_CAP], -1)
        chunk_new_ctg = present & (new_s[:, :C_CAP] == 1)
        chunk_hi = jnp.where(present, hi_s[:, :C_CAP], -1)
    last_idx = jnp.clip(jnp.minimum(total, A) - 1, 0, A - 1)
    last_qp = jnp.take_along_axis(qp, last_idx[:, None], axis=1)[:, 0]
    last_cid = n_chunks - 1
    chunk_hi = chunk_hi.at[jnp.arange(R),
                           jnp.clip(last_cid, 0, C_CAP - 1)].set(
        jnp.where(last_cid >= 0, last_qp, -1))
    if stage == 5:   # + chunking
        return _chk(cid, chunk_hi, chunk_ctg, chunk_new_ctg)

    # --- regroup anchors to rows-per-chunk for the DP ---
    # a chunk's anchors are CONSECUTIVE columns, so the chunk-local column
    # is a forward-fill of chunk-start columns — no lookup table
    col_in_chunk = cols - jnp.maximum(
        jax.lax.cummax(jnp.where(chunk_start, cols, -1), axis=1), 0)
    ok_place = anchor_valid & (cid >= 0) & (cid < C_CAP) \
        & (col_in_chunk < L_CAP)
    overflow = (total > A) | (n_chunks > C_CAP) \
        | jnp.any(anchor_valid & ~ok_place, axis=1) \
        | seg_overflow | qu_overflow | (expand_ovf > 0) | join_ovf
    RC = R * C_CAP
    flat_row = (rowi * C_CAP + jnp.clip(cid, 0, C_CAP - 1)).reshape(-1)
    flat_col = jnp.clip(col_in_chunk, 0, L_CAP - 1).reshape(-1)
    keep = ok_place.reshape(-1)
    flat_row = jnp.where(keep, flat_row, RC)

    # TRANSPOSED padded layout (L_CAP, RC): the DP walks the anchor index
    # (major dim) sequentially, vectorized over chunk rows (lanes)
    def scatter_t(vals, fill):
        buf = jnp.full((L_CAP, RC + 1), fill, vals.dtype)
        return buf.at[flat_col, flat_row].set(vals.reshape(-1),
                                              mode="drop")[:, :RC]

    def scatter_t_multi(vals_fills):
        """All regroup payloads in ONE windowed scatter: the index set is
        identical across payloads, so a trailing window dim amortizes the
        per-index processing (the same trick lax.sort uses for payloads).
        A/B knob vs the per-payload scatter_t (fused_regroup)."""
        n = len(vals_fills)
        fills = jnp.array([f for _v, f in vals_fills], jnp.int32)
        buf = jnp.broadcast_to(fills, (L_CAP, RC + 1, n))
        vals = jnp.stack([v.reshape(-1) for v, _f in vals_fills], axis=-1)
        out = buf.at[flat_col, flat_row].set(vals, mode="drop")[:, :RC]
        return [out[..., i] for i in range(n)]

    # --- banded chaining DP (reference: src/chain.rs:838-896) ---
    # Pallas kernel on TPU, lax.scan elsewhere; the scan PROPAGATES each
    # anchor's chain root (padded anchor index) and depth through the band
    # ring buffer, which makes V2's post-DP pointer-chasing unnecessary.
    # dp_packed (sorted_packed DBs with small L_CAP): two packed scatter_t
    # inputs instead of three, ONE packed DP output word, ONE padded->
    # compact extraction gather instead of two.
    dp_packed = (gen_mode == "sorted_packed"
                 and L_CAP * int(anchor_score) < (1 << (32 - 2 * _ceil_log2(L_CAP))))
    dest = flat_col * RC + jnp.minimum(flat_row, RC - 1)  # compact->padded
    dest_c = dest.reshape(R, A)
    from .dp_compact import (CID_SHIFT, dp_chain_compact,
                             dp_chain_compact_wide)
    from .dp_pallas import ring_size
    # compact-stream DP (kernels/dp_compact.py): the regroup scatters,
    # the padded DP domain, AND the padded->compact extraction gather all
    # disappear — the DP walks the anchors where the expansion left them.
    # Three packings share the two kernels:
    #  * packed, band < 32: the cid mod-32 tag rides in w1 (2 planes);
    #  * packed, band >= 32 (slow preset): the FULL cid and rc (< 64)
    #    pack into a third plane — no tag-ambiguity band limit;
    #  * wide ('sorted' tier — positions > 24 bits, host-verified bounds
    #    via compact_wide): qp/rp in their own planes, tag<<26|rc third
    #    (band < 32 only: no spare bits for a full cid next to rc).
    compact_common = (compact_dp > 0 and A <= (1 << 20)
                      and L_CAP <= 2047
                      and (L_CAP * int(anchor_score) + 1) * ring_size(band)
                      < (1 << 31))
    use_compact2 = (compact_common and gen_mode == "sorted_packed"
                    and band < 32)
    use_compact3 = (compact_common and gen_mode == "sorted_packed"
                    and band >= 32 and C_CAP * 64 < (1 << 31))
    use_compact_w = (compact_common and gen_mode == "sorted"
                     and compact_wide and band < 32)
    valid_c = ok_place
    if use_compact2 or use_compact3 or use_compact_w:
        itp = compact_dp == 2
        if use_compact2:
            w1 = jnp.where(
                ok_place,
                ((cid & 31) << CID_SHIFT) | (qp * 4 + rev * 2 + 1), 0)
            w2 = jnp.where(ok_place, (rc << PACK_RC_SHIFT) | rp, 0)
            if stage == 6:   # + DP input packing (no regroup)
                return _chk(w1, w2)
            dp_c, dr_c = dp_chain_compact(
                w1, w2, col_in_chunk, band, pcl, max_gap, anchor_score,
                L_CAP, interpret=itp)
        else:
            w1 = jnp.where(ok_place, qp * 4 + rev * 2 + 1, 0)
            w2 = jnp.where(ok_place, rp, 0)
            if use_compact3:
                w3 = jnp.where(ok_place, cid * 64 + rc, -1)
            else:
                w3 = jnp.where(ok_place,
                               ((cid & 31) << CID_SHIFT) | rc, -1)
            if stage == 6:   # + DP input packing (no regroup)
                return _chk(w1, w2, w3)
            dp_c, dr_c = dp_chain_compact_wide(
                w1, w2, w3, col_in_chunk, band, pcl, max_gap,
                anchor_score, L_CAP, interpret=itp)
        if stage == 7:   # + chaining DP
            return _chk(dp_c, dr_c)
        dep_c = dr_c >> 20
        root_cid = dr_c & ((1 << 20) - 1)
        if stage == 8:   # (no extraction gather in compact mode)
            return _chk(dp_c, root_cid)
    elif dp_packed:
        EBITS = _ceil_log2(L_CAP)
        vq = jnp.where(ok_place, qp * 4 + rev * 2 + 1, 0)
        vr = jnp.where(ok_place, (rc << PACK_RC_SHIFT) | rp, 0)
        if fused_regroup:
            gqprv, grprc = scatter_t_multi([(vq, 0), (vr, 0)])
        else:
            gqprv = scatter_t(vq, 0)
            grprc = scatter_t(vr, 0)
        if stage == 6:   # + DP regroup scatters
            return _chk(gqprv, grprc)
        ddr = dp_chain_packed(gqprv, grprc, band, pcl, max_gap,
                              anchor_score, EBITS, use_pallas=use_pallas)
        if stage == 7:   # + chaining DP
            return _chk(ddr)
        ddr_c = ddr.reshape(-1)[dest_c.reshape(-1)].reshape(R, A)
        dp_c = (ddr_c >> (2 * EBITS)) & ((1 << (32 - 2 * EBITS)) - 1)
        dep_c = (ddr_c >> EBITS) & ((1 << EBITS) - 1)
        root_pad = ddr_c & ((1 << EBITS) - 1)
        # a chunk's anchors occupy CONSECUTIVE compact columns (the anchor
        # sort orders by (contig, position) and chunk ids are
        # nondecreasing), so the root's compact column is elementwise
        # arithmetic — no lookup table:
        root_cid = cols - col_in_chunk + root_pad
        if stage == 8:   # + extraction gathers (padded -> compact)
            return _chk(dp_c, root_cid)
    else:
        # contig ids are small (< 2^28 checked host-side): pack rc/rev/valid
        vrcv = jnp.where(ok_place, rc * 4 + rev * 2 + 1, 0)
        if fused_regroup:
            gqp, grp, grcv = scatter_t_multi(
                [(qp, int(I32MAX)), (rp, int(I32MAX)), (vrcv, 0)])
        else:
            gqp = scatter_t(qp, I32MAX)
            grp = scatter_t(rp, I32MAX)
            grcv = scatter_t(vrcv, 0)
        if stage == 6:   # + DP regroup scatters
            return _chk(gqp, grp, grcv)
        dd, root = dp_chain(gqp, grp, grcv, band, pcl, max_gap,
                            anchor_score, use_pallas=use_pallas)
        if stage == 7:   # + chaining DP
            return _chk(dd, root)
        # two flat padded->compact gathers
        DBITS = _ceil_log2(L_CAP + 1)   # matches dp_pallas.dbits(L_CAP)
        dd_c = dd.reshape(-1)[dest_c.reshape(-1)].reshape(R, A)
        root_pad = root.reshape(-1)[dest_c.reshape(-1)].reshape(R, A)
        dp_c = dd_c >> DBITS
        dep_c = dd_c & ((1 << DBITS) - 1)
        root_cid = cols - col_in_chunk + root_pad
        if stage == 8:   # + extraction gathers (padded -> compact)
            return _chk(dp_c, root_cid)

    INVBITS = _ceil_log2(A)
    # packing headroom: `key` needs score < 2^(31-INVBITS), `packed_sn`
    # needs score < 2^15.  L_CAP*anchor_score fits both at default shapes,
    # but l_cap/anchor_score are parameters — pairs whose best score would
    # overflow the packing fall back to the exact native path instead of
    # silently corrupting best-anchor selection.
    score_lim = min(1 << (31 - INVBITS), 1 << 15)
    # the packed (score << INVBITS | col) key needs score < score_lim;
    # large anchor buffers (big-genome buckets, A >= 2^20) or dense
    # presets (L_CAP 2048) can exceed it — those shapes use a 3-key sort
    # with score and column as separate arrays (identical semantics)
    wide_agg = score_lim <= L_CAP * int(anchor_score)
    if not wide_agg:
        overflow |= jnp.any(valid_c & (dp_c >= score_lim), axis=1)

    # --- per-chain aggregation with a multi-key sort (measured cheaper
    # than a scatter-max at these shapes): sorting anchors by (root asc,
    # score desc, col asc) puts each chain's best (score, smallest-col)
    # key first in its root group.  The reference's set-size >=
    # min_anchors test (src/chain.rs:954-976) is IMPLIED: the best path's
    # length num_anchors <= set size, and good requires num_anchors >=
    # min_anchors, so no size count is kept.
    if wide_agg:
        s_root, s_negs, s_col = jax.lax.sort(
            (jnp.where(valid_c, root_cid, BIG), -dp_c, cols),
            dimension=1, num_keys=3)
        agg_score = -s_negs
    else:
        # packed single key halves the sort payloads
        key = (dp_c << INVBITS) | (A - 1 - cols)
        s_root, s_nk = jax.lax.sort(
            (jnp.where(valid_c, root_cid, BIG), -key),
            dimension=1, num_keys=2)
        agg_score = (-s_nk) >> INVBITS
    prev_root = jnp.concatenate(
        [jnp.full((R, 1), -1, jnp.int32), s_root[:, :-1]], axis=1)
    first = (s_root != prev_root) & (s_root != BIG)
    good_pre = first & (agg_score.astype(jnp.float32) >= min_score)
    # conservative I_CAP check: good_pre is a superset of the final good
    # set (the num_anchors filter lands after compaction)
    overflow |= jnp.sum(good_pre, axis=1) > I_CAP
    if stage == 9:   # + chain aggregation sort
        return _chk(good_pre, s_root)

    # --- compact the good roots (sort on the root column with the best
    # key as payload), then fetch every other per-chain field with tiny
    # (R, I_CAP) gathers at the root columns
    if wide_agg:
        rcols, g_negs, g_col = jax.lax.sort(
            (jnp.where(good_pre, s_root, BIG), s_negs, s_col),
            dimension=1, num_keys=1)
        rcols = rcols[:, :I_CAP]
        g_score = -g_negs[:, :I_CAP]
        bcl = jnp.clip(g_col[:, :I_CAP], 0, A - 1)
    else:
        rcols, g_nk = jax.lax.sort(
            (jnp.where(good_pre, s_root, BIG), s_nk),
            dimension=1, num_keys=1)
        rcols = rcols[:, :I_CAP]
        g_best = -g_nk[:, :I_CAP]
        g_score = g_best >> INVBITS
        bcl = jnp.clip((A - 1) - (g_best & ((1 << INVBITS) - 1)), 0, A - 1)
    if stage == 10:  # + root compaction sort
        return _chk(rcols, g_score)
    has = rcols != BIG
    rcl = jnp.minimum(rcols, A - 1)
    num_anchors = _row_gather(dep_c, bcl) + 1
    good = has & (num_anchors >= min_anchors)
    if gen_mode == "sorted_packed":
        # the packed readback carries num_anchors in 10 bits; chain depth
        # is bounded only by L_CAP (1024+ for dense presets), so deeper
        # chains fall back to the exact native path instead of wrapping
        # into the adjacent score field (mirrors the score_lim guard)
        overflow |= jnp.any(good & (num_anchors > 0x3FF), axis=1)
    g_qp0 = _row_gather(qp, rcl)
    g_rp0 = _row_gather(rp, rcl)
    g_qp1 = _row_gather(qp, bcl)
    g_rp1 = _row_gather(rp, bcl)
    if stage == 11:  # + per-chain field gathers
        return _chk(g_qp0, g_rp0, g_qp1, g_rp1, num_anchors, good)
    scalars = jnp.stack([n_chunks,
                         jnp.minimum(total, I32MAX).astype(jnp.int32),
                         overflow.astype(jnp.int32)], axis=1)
    if gen_mode == "sorted_packed":
        # pack the readback (the link is the scarce resource): interval
        # metadata in 2 words (score<<11|num<<1|good; cid<<7|rc<<1|rev) and
        # chunk metadata re-packed into the hi<<7|ctg<<1|new word
        wm1 = (g_score << 11) | (num_anchors << 1) | good.astype(jnp.int32)
        wm2 = (_row_gather(cid, rcl) << 7) | (_row_gather(rc, rcl) << 1) \
            | _row_gather(rev.astype(jnp.int32), rcl)
        out_meta = jnp.where(
            chunk_hi < 0, -1,
            (chunk_hi << 7) | ((chunk_ctg & 0x3F) << 1)
            | chunk_new_ctg.astype(jnp.int32))
        packed_out = jnp.concatenate([
            wm1, wm2, g_qp0, g_qp1,
            jnp.minimum(g_rp0, g_rp1), jnp.maximum(g_rp0, g_rp1),
            out_meta, scalars,
        ], axis=1)
        return packed_out
    iv_block = jnp.concatenate([
        good.astype(jnp.int32),
        g_score,
        num_anchors,
        g_qp0,
        g_qp1,
        jnp.minimum(g_rp0, g_rp1),
        jnp.maximum(g_rp0, g_rp1),
        _row_gather(rc, rcl),
        _row_gather(cid, rcl),
        _row_gather(rev.astype(jnp.int32), rcl)], axis=1)
    packed_out = jnp.concatenate([
        iv_block,
        chunk_hi, chunk_ctg, chunk_new_ctg.astype(jnp.int32),
        scalars,
    ], axis=1)
    return packed_out


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

class DevicePairEngine:
    """Batched pair scoring against a device-resident DeviceDb."""

    N_IV_FIELDS = 10  # valid, score, num, q0, q1, r0, r1, rc, cid, rev

    def __init__(self, sketches: Sequence, sketch_params, command_params,
                 model=None, batch: int = None,
                 i_cap: int = None, c_cap: int = 512, l_cap: int = None,
                 device=None, reserved_slots: int = 0,
                 min_k: int = 0, min_p: int = 0):
        from .device_db import db_has_duplicate_positions, db_pack_ok

        # Reserved slots: trailing DB rows whose contents are swapped at
        # runtime (load_slots) — queries stream through them while the
        # reference rows stay resident (upload-once `search`).  Reserved
        # DBs use the merge join (the dense global-kmer axis cannot be
        # updated incrementally).
        self.reserved_base = len(sketches)
        self.reserved_slots = reserved_slots
        if reserved_slots:
            from ..sketch import Sketch
            empties = []
            for _ in range(reserved_slots):
                e = Sketch(file_name="", marker_c=getattr(
                    sketch_params, "marker_c", 1000),
                    c=getattr(sketch_params, "c", 125),
                    k=getattr(sketch_params, "k", 15))
                empties.append(e)
            sketches = list(sketches) + empties
            self._forced_merge = True
        else:
            self._forced_merge = False

        if batch is None:
            # larger batches amortize the per-dispatch sync floor (~29 ms
            # on the tunneled link) and XLA's fixed per-op overheads; CPU
            # (tests) keeps smaller graphs
            dev0 = device or jax.devices()[0]
            batch = int(os.environ.get(
                "SKANI_TPU_BATCH", "32" if dev0.platform == "tpu" else "12"))

        self.sketches = list(sketches)
        self.device = device
        # anchor generation mode (see device_db module doc): sorted-order
        # generation skips the per-pair anchor sort but requires a total
        # (contig, position) order (not AAI) and b_start < 2^19 for the
        # join-word packing; the packed variant additionally needs
        # positions < 2^24 and < 128 contigs
        if getattr(sketch_params, "use_aa", False) \
                or db_has_duplicate_positions(sketches):
            self.gen_mode = "legacy"
        elif db_pack_ok(sketches):
            self.gen_mode = "sorted_packed"
        else:
            self.gen_mode = "sorted"
        # compact-DP wide-tier bounds (dp_compact.dp_chain_compact_wide):
        # positions fit 28 bits, contig ids 26 — true for any realistic
        # genome, but verified rather than assumed
        self._compact_wide_ok = all(
            (len(s.contig_lengths) == 0
             or int(max(s.contig_lengths)) < (1 << 28))
            and len(s.contigs) < (1 << 26) for s in sketches)
        dense_budget = 0 if self._forced_merge else int(os.environ.get(
            "SKANI_TPU_DENSE_JOIN_MB", "512")) << 20
        db_band = 0
        if self.gen_mode == "sorted_packed" and len(self.sketches):
            from ..params import map_params_from_sketch
            db_band = map_params_from_sketch(
                self.sketches[0], getattr(sketch_params, "use_aa", False),
                command_params, None).index_chain_band
        self.db = DeviceDb(self.sketches, device=device, mode=self.gen_mode,
                           dense_join_budget=dense_budget, band=db_band,
                           min_k=min_k, min_p=min_p)
        dev0 = (device or jax.devices()[0])
        if "gid" in self.db.arrays and dev0.platform == "tpu" \
                and self.db.U % 1024 == 0 \
                and os.environ.get("SKANI_TPU_JOIN", "auto") == "auto" \
                and not ("gidp" in self.db.arrays
                         and self.db.U <= (1 << 16)):
            # kmer-axis join over the union axis (windowed sorted gather
            # + kmer->position mapping gather): wins when U is LARGE
            # (~126k: windowed ~0.4 ms vs ~7.5 ms for dense_pos's
            # unsorted U-wide one-hot).  At small U the position-axis
            # join's single gather beats windowed+mapping (hardware A/B,
            # round 4: 911 vs 836 pairs/s at U=41k), so auto prefers
            # dense_pos below 64k.
            self.join_mode = "dense"
        elif "gidp" in self.db.arrays \
                and os.environ.get("SKANI_TPU_JOIN") != "dense":
            self.join_mode = "dense_pos"
        elif "gid" in self.db.arrays:
            self.join_mode = "dense"
        else:
            self.join_mode = "merge"
        self.sketch_params = sketch_params
        self.command_params = command_params
        self.model = model
        self.R = batch
        # anchors rarely exceed ~1.1x the larger position count (the repeat
        # band caps the blowup); overflow pairs fall back to the exact
        # native path, so a tight buffer only costs speed on outliers
        # 2^19 anchors covers ~65 Mbp eukaryote MAGs at c=125; batches of
        # large buckets shrink (see _r_for) so the padded (R, A) domain
        # stays bounded instead of the pairs falling back to the host
        # 2048-granular A (the tightest stride every A-domain op accepts:
        # dp_compact segment length 2048, windowed/one-hot index tiles
        # 1024, scatter target 128) — the old 8192 rounding padded the
        # E. coli bucket 14% past need, and every (R, A) pass pays it
        a = int(1.15 * self.db.max_n_pos)
        self.A = min(max(((a + 2047) // 2048) * 2048, 8192), 1 << 20)
        self._icap_explicit = (i_cap is not None
                               or "SKANI_TPU_ICAP" in os.environ)
        if i_cap is None:
            # E. coli-scale pairs produce ~420 intervals; 512 halves the
            # packed readback vs 1024 and pairs with more chains fall
            # back to the exact path via the good_pre > I_CAP overflow
            i_cap = int(os.environ.get("SKANI_TPU_ICAP", "512"))
        self.I_CAP = i_cap
        self.C_CAP = c_cap
        if l_cap is None:
            # per-chunk anchor cap sized to the sketch density: ~20kb/c
            # positions per fragment.  512 (the packed-DP limit) covers the
            # default/medium presets with >= 1.8x headroom; denser
            # sketches (slow preset c=30) step up and use the unpacked DP.
            # Overflowing chunks fall back to the exact native path.
            if getattr(sketch_params, "use_aa", False):
                l_cap = 768
            else:
                min_c = max(min((int(s.c) for s in sketches), default=125),
                            1)
                need = int(1.5 * 20000 / min_c)
                l_cap = 512 if need <= 512 else (
                    1024 if need <= 1024 else 2048)
            # A/B knob: a tighter per-chunk cap halves the padded DP
            # domain but raises the exact-fallback rate for deep chunks —
            # measure both (stats pairs_host counts the fallbacks)
            l_cap = int(os.environ.get("SKANI_TPU_LCAP", "0")) or l_cap
        self.L_CAP = l_cap

    def _unpack(self, packed: np.ndarray, I: int = None, C: int = None):
        """Split the packed i32 output into fields (layout depends on the
        generation mode — sorted_packed transfers 6 interval words + one
        chunk-metadata word instead of 10 + 3)."""
        I = self.I_CAP if I is None else I
        C = self.C_CAP if C is None else C
        iv = {}
        if self.gen_mode == "sorted_packed":
            wm1 = packed[:, 0:I]
            wm2 = packed[:, I:2 * I]
            iv["valid"] = wm1 & 1
            iv["score"] = wm1 >> 11
            iv["num"] = (wm1 >> 1) & 0x3FF
            iv["q0"] = packed[:, 2 * I:3 * I]
            iv["q1"] = packed[:, 3 * I:4 * I]
            iv["r0"] = packed[:, 4 * I:5 * I]
            iv["r1"] = packed[:, 5 * I:6 * I]
            iv["cid"] = wm2 >> 7
            iv["rc"] = (wm2 >> 1) & 0x3F
            iv["rev"] = wm2 & 1
            o = 6 * I
            meta = packed[:, o:o + C]
            miss = meta < 0
            chunk_hi = np.where(miss, -1, meta >> 7)
            chunk_ctg = np.where(miss, -1, (meta >> 1) & 0x3F)
            chunk_new = np.where(miss, 0, meta & 1)
            o += C
        else:
            o = 0
            for name in ("valid", "score", "num", "q0", "q1", "r0", "r1",
                         "rc", "cid", "rev"):
                iv[name] = packed[:, o:o + I]
                o += I
            chunk_hi = packed[:, o:o + C]; o += C
            chunk_ctg = packed[:, o:o + C]; o += C
            chunk_new = packed[:, o:o + C]; o += C
        n_chunks = packed[:, o]
        n_anchors = packed[:, o + 1]
        overflow = packed[:, o + 2]
        return iv, chunk_hi, chunk_ctg, chunk_new, n_chunks, n_anchors, \
            overflow

    def load_slots(self, slots: Sequence[int], sketches: Sequence) -> bool:
        """Swap new genomes into reserved DB rows (device-side scatter;
        only the new rows cross the link).  Returns False when a sketch
        does not fit the DB's padded widths or breaks the generation-mode
        invariants — the caller then scores those pairs through the exact
        host path instead."""
        from .device_db import db_has_duplicate_positions, db_pack_ok
        if self.gen_mode != "legacy":
            if any(len(s.seed_pos) >= (1 << 19) for s in sketches) \
                    or db_has_duplicate_positions(sketches):
                return False
            if self.gen_mode == "sorted_packed" and not db_pack_ok(sketches):
                return False
            if self._compact_wide_ok and not all(
                    (len(s.contig_lengths) == 0
                     or int(max(s.contig_lengths)) < (1 << 28))
                    and len(s.contigs) < (1 << 26) for s in sketches):
                return False   # would invalidate the compiled wide-tier DP
        try:
            self.db.update_rows(slots, sketches)
        except ValueError:
            return False
        for g, s in zip(slots, sketches):
            self.sketches[g] = s
        return True

    def _caps_for(self, bucket_a: int, group=()):
        """(I_CAP, C_CAP) for one batch: chunk count scales with genome
        length (~ bucket * c / 20000, since anchors ~ positions ~ len/c)
        PLUS the query side's contig count (every contig with anchors
        opens at least one chunk — fragmented draft MAGs need chunk
        capacity their length/20000 term alone underestimates), so
        big-genome buckets (eukaryote MAGs) get wider chunk and interval
        buffers instead of falling back to the host, and SMALL buckets
        (150 kb-scale genomes in `search` DBs) shrink both caps — the
        padded metadata sorts and the packed readback then scale with
        the genomes, not with the engine's E. coli-sized defaults.  A
        pair that overflows a shrunken cap falls back to the exact
        native path (the same overflow guard big pairs use), so the caps
        are purely a throughput choice."""
        c0 = max(int(getattr(self.sketches[0], "c", 125) or 125), 1) \
            if self.sketches else 125
        cmax = max((len(self.sketches[item[1]].contig_lengths)
                    for item in group), default=0)
        # chunk count scales with the QUERY GENOME LENGTH (~positions*c /
        # 20000), NOT with the anchor bucket: a distant pair has few
        # anchors (small bucket) spread over the whole genome, so it
        # opens just as many 20 kb fragments as a near-identical pair
        pmax = max((len(self.sketches[item[1]].seed_pos)
                    for item in group), default=0)
        est = int(1.3 * max(bucket_a, pmax) * c0 / 20000) + 2 + cmax
        cc = min(self.C_CAP, 64)
        while cc < est and cc < 8192:
            cc *= 2
        cc = min(cc, self.C_CAP) if est <= self.C_CAP else cc
        # intervals run ~1.5-2 per chunk on real genomes; cc already
        # carries ~2x headroom over the bucket's chunk estimate.  Small
        # buckets shrink toward 2*cc (>= 128); big buckets keep the old
        # max(I_CAP, cc) growth.  An EXPLICIT i_cap (ctor arg or
        # SKANI_TPU_ICAP) is a floor, not a hint — users raise it
        # precisely to avoid interval-overflow fallbacks
        icap = max(128, min(2 * cc, max(self.I_CAP, cc)))
        if self._icap_explicit:
            icap = max(icap, self.I_CAP)
        return icap, cc

    def _marker_survival(self, ri: int, qi: int) -> float:
        """Predicted per-seed anchor survival for a pair from its marker
        sketches: shared-marker containment c_m ~ ani^21 (21-mer
        markers), so the k-mer seed hit rate ~ ani^k = c_m^(k/21).  The
        intersect runs on the tiny sorted marker arrays (~len/1000
        entries, tens of microseconds) — the same signal the screen uses
        (reference: src/screen.rs:84-142), reused here to size the
        anchor buffer instead of to reject the pair."""
        key = (ri, qi) if ri <= qi else (qi, ri)
        cache = getattr(self, "_surv_cache", None)
        if cache is None:
            cache = self._surv_cache = {}
        s = cache.get(key)
        if s is not None:
            return s
        a, b = self.sketches[ri], self.sketches[qi]

        def sorted_markers(sk):
            m = getattr(sk, "_markers_sorted", None)
            if m is None:
                m = np.asarray(sk.marker_seeds)
                if len(m) > 1 and not bool((m[1:] >= m[:-1]).all()):
                    m = np.sort(m)   # DB-deserialized sketches may carry
                sk._markers_sorted = m  # the reference's hash-set order
            return m

        ma, mb = sorted_markers(a), sorted_markers(b)
        if len(ma) < 20 or len(mb) < 20:   # rescue_small regime: no signal
            s = 1.0
        else:
            if len(mb) < len(ma):
                ma, mb = mb, ma
            # a searchsorted membership count on the cached sorted arrays
            # avoids intersect1d's per-call re-sorts
            idx = np.searchsorted(mb, ma)
            idx_c = np.minimum(idx, len(mb) - 1)
            shared = int(np.count_nonzero(mb[idx_c] == ma))
            c_m = shared / min(len(ma), len(mb))
            k = int(getattr(a, "k", 15) or 15)
            s = min(1.0, c_m ** (k / 21.0)) if c_m > 0 else 0.0
        cache[key] = s
        return s

    def _bucket_a(self, ri: int, qi: int) -> int:
        """Anchor-buffer size for one pair: the smallest power-of-two
        bucket covering the PREDICTED anchor count — the larger
        seed-position count scaled by the marker-predicted seed survival
        (x1.6 safety).  Near-identical pairs keep the old ~1.15x
        positions sizing; DISTANT pairs (82-95% ANI, where survival is
        0.03-0.45) drop to much smaller buckets, so the A-domain passes
        stop paying near-identical-sized padding for sparse anchors.  An
        underestimate is safe: the total > A overflow guard routes the
        pair to the exact native path.  A pair only drops to a smaller
        bucket when that saves >= 3x — each distinct bucket is a
        separate phase_a compilation, so the shape set is kept tiny."""
        pmax = max(len(self.sketches[ri].seed_pos),
                   len(self.sketches[qi].seed_pos))
        if os.environ.get("SKANI_TPU_ANCHOR_BUCKETS", "1") == "1" \
                and not getattr(self.sketch_params, "use_aa", False):
            surv = self._marker_survival(ri, qi)
            need = int(1.6 * pmax * max(surv, 0.02)) + 64
            need = min(need, int(1.15 * pmax))
        else:
            need = int(1.15 * pmax)
        b = 8192
        while b < need:
            b *= 2
        return b if 3 * b <= self.A else self.A

    def _r_for(self, bucket_a: int) -> int:
        """Batch rows for one anchor bucket.  Two bounds meet here:

        * huge-genome buckets shrink R so the padded (R, A) domain stays
          ~8M slots (HBM / VMEM bound);
        * SMALL buckets (150 kb-scale `search` DBs) WIDEN R so the batch
          carries ~ the same total anchor slots as the default
          (R, 49152) shape — the fixed per-XLA-op and per-dispatch costs
          then amortize over 6-24x more pairs.  Hardware A/B (round 4,
          10k-genome search): warm 3.41 -> ~1 s/query from this alone.

        Capped by SKANI_TPU_RMAX (default 256 on TPU: the packed readback
        and the single-core host finalize stay comfortably pipelined; 0
        disables).  CPU (tests) keeps the narrow width — small workloads
        would pay the padded slots without the fixed costs to amortize —
        and tests/test_device_fuzz.py::test_device_engine_wide_batch_small_bucket
        pins wide-batch exactness via an explicit SKANI_TPU_RMAX."""
        r_big = min(self.R, (8 << 20) // bucket_a)
        dev0 = self.device or jax.devices()[0]
        rmax = int(os.environ.get(
            "SKANI_TPU_RMAX", "256" if dev0.platform == "tpu" else "0"))
        r_small = min(rmax, (self.R * 49152) // bucket_a)
        return max(2, r_big, r_small)

    def _r_shape(self, group) -> int:
        """Batch SHAPE for one formed group: _r_for's width, halved while
        the group fills less than half of it (min 8).  Padded rows cost
        the same as real rows under fixed shapes — a 23-pair workload in
        a 192-row wide batch would pay 169 rows of full device work.
        Halving keeps the compiled-shape set small and disk-cached."""
        r = self._r_for(group[0][7])
        n = max(len(group), 8)
        while r // 2 >= n and r > 8:
            r //= 2
        return r

    def _dispatch_phase_a(self, group, mp0, idx_dev=None):
        dev = self.device or jax.devices()[0]
        put = lambda x: jax.device_put(jnp.asarray(x), dev)
        if idx_dev is None:
            r_b = self._r_shape(group)
            a_idx = np.zeros(r_b, dtype=np.int32)
            b_idx = np.zeros(r_b, dtype=np.int32)
            for w, item in enumerate(group):
                a_idx[w] = item[1]
                b_idx[w] = item[2]
            idx_dev = put(np.stack([a_idx, b_idx]))
        jm = self.join_mode
        if jm == "dense_pos" \
                and mp0.index_chain_band != getattr(self.db, "band", -1):
            jm = "dense"   # gidp was baked for a different repeat band
        icap, ccap = self._caps_for(group[0][7], group)
        ph = phase_a(
            self.db.arrays,
            idx_dev,
            A=group[0][7], I_CAP=icap, C_CAP=ccap,
            L_CAP=self.L_CAP,
            band=mp0.index_chain_band, fl=mp0.fragment_length,
            pcl=min(mp0.fragment_length // 2, mp0.bp_chain_band),
            max_gap=mp0.max_gap_length, anchor_score=mp0.anchor_score,
            min_anchors=mp0.min_anchors, min_score=mp0.min_score,
            use_pallas=dev.platform == "tpu", gen_mode=self.gen_mode,
            join_mode=jm,
            fused_regroup=os.environ.get(
                "SKANI_TPU_FUSED_REGROUP", "0") == "1",
            compact_dp=self._compact_dp(dev),
            compact_wide=self._compact_wide_ok)
        if os.environ.get("SKANI_TPU_ASYNC_READBACK", "1") == "1" \
                and int(os.environ.get("SKANI_TPU_MERGE_READ", "1")) <= 1:
            # start the D2H copy the moment compute finishes, instead of
            # when the pipeline loop reaches np.asarray — overlaps the
            # transfer with the next batch's device work (same-thread
            # hint; safe even on the tunneled client).  Skipped under
            # merged readback: the bytes would cross the link twice.
            try:
                ph.copy_to_host_async()
            except Exception:
                pass
        return ph, icap, ccap

    @staticmethod
    def _compact_dp(dev) -> int:
        """Compact-stream DP mode (kernels/dp_compact.py): 1 = Pallas
        kernel (TPU only), 2 = interpret mode (CPU exactness tests),
        0 = padded layout.  SKANI_TPU_COMPACT_DP overrides.

        Default is ON for TPU since the round-3 hardware A/B (runlist
        step 1, 2026-08-18): 486 vs 326 unique pairs/s on the 190-pair
        bench, mismatches 0 — the compact layout removes both DP regroup
        scatters and the padded->compact extraction gather."""
        v = os.environ.get("SKANI_TPU_COMPACT_DP", "1")
        if v == "2":
            return 2
        if v == "1" and dev.platform == "tpu":
            return 1
        return 0

    def _host_process(self, group, packed, icap=None, ccap=None):
        """Per-batch host stage: unpack, overlap-resolve, answer the seed-
        rank queries from the host-side tables (kernels/rank_host.py)."""
        from .. import native
        from . import rank_host

        (iv_all, chunk_hi, chunk_ctg, chunk_new, n_chunks_v,
         _n_anchors, overflow) = self._unpack(packed, icap, ccap)
        ranks = []
        batch_recs = []
        for w, (_t, a, b, sw, mp, ri, _qi, _ba) in enumerate(group):
            if overflow[w]:
                batch_recs.append(None)
                ranks.append(None)
                continue
            m = iv_all["valid"][w].astype(bool)
            nm = int(m.sum())
            iv = dict(
                score=iv_all["score"][w][m].astype(np.float64),
                num=iv_all["num"][w][m].astype(np.int64),
                q0=iv_all["q0"][w][m].astype(np.uint32),
                q1=iv_all["q1"][w][m].astype(np.uint32),
                r0=iv_all["r0"][w][m].astype(np.uint32),
                r1=iv_all["r1"][w][m].astype(np.uint32),
                rc=iv_all["rc"][w][m].astype(np.int64),
                cid=iv_all["cid"][w][m].astype(np.int64),
                rev=iv_all["rev"][w][m].astype(np.uint8),
            )
            nch = int(n_chunks_v[w])
            # query contig of each interval = contig of its chunk
            iv["qc"] = chunk_ctg[w][iv["cid"].astype(np.int64)
                                    ].astype(np.int64)
            recs, qc, qv, totals = native.process_intervals_native(
                iv, nm, chunk_hi[w][:nch].astype(np.int64),
                chunk_ctg[w][:nch].astype(np.int64),
                chunk_new[w][:nch].astype(np.uint8), nch,
                mp.k, int(self.sketches[ri].c), sw,
                mp.amino_acid, mp.min_length_cover)
            batch_recs.append((recs, totals))
            ranks.append(rank_host.rank_queries(
                self.sketches[a], self.sketches[b], mp.index_chain_band,
                np.asarray(qc), np.asarray(qv)))
        return batch_recs, ranks

    def _process_batch_native(self, group, packed, out,
                              icap=None, ccap=None) -> bool:
        """One native call for the whole batch's post-readback work:
        unpack + overlap resolution + rank answering + estimator tail +
        trimmed mean + bootstrap CI (native/skani_core.cpp
        finalize_device_batch).  Replaces ~10 Python/ctypes hops per pair;
        bit-identical results (the C++ shares bootstrap_ci with
        finalize_ani and transcribes _finalize_chunks' float ops).
        Returns False when the native lib is unavailable or the Python
        path is forced (SKANI_TPU_PY_FINALIZE=1)."""
        import ctypes

        from .. import native
        from ..ani import AniEstResult, chain_seeds_native
        from ..gbdt import predict_from_ani_res_batch
        from . import rank_host

        lib = native.get_lib()
        if lib is None or os.environ.get("SKANI_TPU_PY_FINALIZE") == "1":
            return False
        n = len(group)
        layout = 1 if self.gen_mode == "sorted_packed" else 0
        k_a = np.empty(n, np.int64)
        c_a = np.empty(n, np.int64)
        sw_a = np.empty(n, np.uint8)
        am_a = np.empty(n, np.uint8)
        mlc_a = np.empty(n, np.int64)
        rb_a = np.empty(n, np.uint8)
        md_a = np.empty(n, np.uint8)
        bc_a = np.empty(n, np.float64)
        fc_a = np.empty(n, np.float64)
        ql_a = np.empty(n, np.int64)
        rl_a = np.empty(n, np.int64)
        addrs = np.zeros((3, n), np.int64)
        lens = np.zeros((3, n), np.int64)
        keep = []   # keep the table arrays alive across the C call
        for w, (_t, a, b, sw, mp, ri, qi, _ba) in enumerate(group):
            k_a[w] = mp.k
            c_a[w] = int(self.sketches[ri].c)
            sw_a[w] = 1 if sw else 0
            am_a[w] = 1 if mp.amino_acid else 0
            mlc_a[w] = mp.min_length_cover
            rb_a[w] = 1 if mp.robust else 0
            md_a[w] = 1 if mp.median else 0
            bc_a[w] = mp.both_frac_cover_cutoff
            fc_a[w] = mp.frac_cover_cutoff
            ql_a[w] = self.sketches[qi].total_sequence_length
            rl_a[w] = self.sketches[ri].total_sequence_length
            qsk, rsk = self.sketches[a], self.sketches[b]
            packed_all, own_excl, _rep, _cnt = rank_host._tables(
                qsk, mp.index_chain_band)
            banned = rank_host.pair_banned_positions(qsk, rsk,
                                                     mp.index_chain_band)
            for s, t_arr in enumerate((packed_all, own_excl, banned)):
                addrs[s, w] = t_arr.ctypes.data if len(t_arr) else 0
                lens[s, w] = len(t_arr)
                keep.append(t_arr)
        out_f = np.zeros((n, 6), np.float64)
        out_i = np.zeros((n, 4), np.int64)
        packed = np.ascontiguousarray(packed, np.int32)
        lib.finalize_device_batch(
            packed, packed.shape[1], n,
            self.I_CAP if icap is None else icap,
            self.C_CAP if ccap is None else ccap, layout,
            k_a, c_a, sw_a, am_a, mlc_a, rb_a, md_a, bc_a, fc_a, ql_a,
            rl_a,
            np.ascontiguousarray(addrs[0]), np.ascontiguousarray(lens[0]),
            np.ascontiguousarray(addrs[1]), np.ascontiguousarray(lens[1]),
            np.ascontiguousarray(addrs[2]), np.ascontiguousarray(lens[2]),
            out_f.reshape(-1), out_i.reshape(-1),
            min(getattr(self.command_params, "threads", 1) or 1,
                os.cpu_count() or 1))
        del keep
        f32 = np.float32
        fresh, fresh_model = [], None
        for w, (t, _a, _b, sw, mp, ri, qi, _ba) in enumerate(group):
            status = out_i[w, 0]
            if status == 2:       # overflow -> exact per-pair fallback
                out[t] = chain_seeds_native(self.sketches[ri],
                                            self.sketches[qi], mp)
                continue
            if status == 1:       # no chains -> nan result
                r = AniEstResult()
                r.ani = float("nan")
                out[t] = r
                continue
            ref = self.sketches[ri]
            q = self.sketches[qi]
            qt = _contig_quants(q)
            rt = _contig_quants(ref)
            res = AniEstResult(
                ani=float(f32(out_f[w, 0])),
                align_fraction_query=float(f32(out_f[w, 1])),
                align_fraction_ref=float(f32(out_f[w, 2])),
                ref_file=ref.file_name,
                query_file=q.file_name,
                query_contig=q.contigs[0],
                ref_contig=ref.contigs[0],
                num_contigs_r=len(ref.contigs),
                num_contigs_q=len(q.contigs),
                ci_lower=float(f32(out_f[w, 3])),
                ci_upper=float(f32(out_f[w, 4])),
                aai=mp.amino_acid,
                quant_90_contig_len_q=qt[2], quant_90_contig_len_r=rt[2],
                quant_50_contig_len_q=qt[1], quant_50_contig_len_r=rt[1],
                quant_10_contig_len_q=qt[0], quant_10_contig_len_r=rt[0],
                std=float(f32(out_f[w, 5])),
                avg_chain_int_len=int(out_i[w, 1]),
                total_bases_covered=int(out_i[w, 3]),
            )
            if mp.model is not None:
                fresh.append(res)
                fresh_model = mp.model
            out[t] = res
        predict_from_ani_res_batch(fresh, fresh_model)
        return True

    def _finalize_batch(self, group, batch_recs, ranks, out):
        from ..ani import chain_seeds_native, finalize_ani
        from ..gbdt import predict_from_ani_res_batch

        fresh, fresh_model = [], None
        for w, (t, _a, _b, sw, mp, ri, qi, _ba) in enumerate(group):
            ref = self.sketches[ri]
            q = self.sketches[qi]
            if batch_recs[w] is None:
                out[t] = chain_seeds_native(ref, q, mp)   # applies GBDT
                continue
            recs, totals = batch_recs[w]
            ani_ests = self._finalize_chunks(recs, ranks[w], int(ref.c), mp)
            tqb, trr, avg_sum, num_chains = totals
            avg_len = avg_sum // num_chains if num_chains else 0
            res = finalize_ani(ani_ests, tqb, trr, avg_len, num_chains,
                               ref, q, mp, avg_already_divided=True)
            if mp.model is not None:
                fresh.append(res)
                fresh_model = mp.model
            out[t] = res
        # ONE batched tree-ensemble readout for the whole device batch
        # (bit-identical to the per-pair call; the 195-tree accumulation
        # loop amortizes across pairs)
        predict_from_ani_res_batch(fresh, fresh_model)

    @staticmethod
    def _mirror_result(res):
        """The (ref, query) -> (query, ref) mirror of a result.  chain_seeds
        canonicalizes the pair internally (switch_qr, reference:
        src/chain.rs:15-26), so the reverse-direction result is exactly the
        field-swapped copy (validated against the native path)."""
        import copy
        m = copy.copy(res)
        m.align_fraction_query, m.align_fraction_ref = \
            res.align_fraction_ref, res.align_fraction_query
        m.ref_file, m.query_file = res.query_file, res.ref_file
        m.ref_contig, m.query_contig = res.query_contig, res.ref_contig
        m.quant_90_contig_len_q, m.quant_90_contig_len_r = \
            res.quant_90_contig_len_r, res.quant_90_contig_len_q
        m.quant_50_contig_len_q, m.quant_50_contig_len_r = \
            res.quant_50_contig_len_r, res.quant_50_contig_len_q
        m.quant_10_contig_len_q, m.quant_10_contig_len_r = \
            res.quant_10_contig_len_r, res.quant_10_contig_len_q
        m.num_contigs_q, m.num_contigs_r = \
            res.num_contigs_r, res.num_contigs_q
        return m

    def run_pairs(self, pairs: List[Tuple[int, int]],
                  host_workers: Optional[int] = None):
        """Score pairs in pipelined batches: the device consumes batches of
        R pairs from the front of the work queue (two batches in flight, so
        host interval resolution of batch k overlaps device execution of
        batch k+1); optional HOST WORKER threads steal single pairs from the
        back of the queue and score them with the native C++ path — both
        paths are exact, so the dynamic split never changes results.

        Ordered duplicates of the same unordered pair are computed once and
        mirrored (the estimator is orientation-invariant by construction)."""
        import threading

        from ..ani import AniEstResult, chain_seeds_native
        from ..params import map_params_from_sketch
        from ..chain import compute_switch

        if host_workers is None:
            # steal-workers only pay off when spare cores exist beyond the
            # one running the engine's own host stage (interval resolution
            # + rank queries); on a 1-core host they just create stragglers
            spare = max(0, (os.cpu_count() or 1) - 2)
            host_workers = int(os.environ.get("SKANI_TPU_HOST_WORKERS",
                                              str(min(2, spare))))

        out = [None] * len(pairs)
        meta = []
        seen = {}      # (ri, qi) -> output slot of the first occurrence
        mirrors = []   # (t, source slot)
        for t, (ri, qi) in enumerate(pairs):
            ref = self.sketches[ri]
            q = self.sketches[qi]
            mp = map_params_from_sketch(ref, self.sketch_params.use_aa,
                                        self.command_params, self.model)
            if len(ref.contig_lengths) == 0 or len(q.contig_lengths) == 0:
                r = AniEstResult()
                r.ani = float("nan")
                out[t] = r
                continue
            if (qi, ri) in seen:
                mirrors.append((t, seen[(qi, ri)]))
                continue
            if (ri, qi) not in seen:
                seen[(ri, qi)] = t
            sw = compute_switch(ref, q)
            meta.append((t, ri if sw else qi, qi if sw else ri, sw, mp,
                         ri, qi, self._bucket_a(ri, qi)))
        # group same-bucket pairs so each device batch compiles/runs at its
        # own (R, A) shape; the secondary key groups a bucket's pairs by
        # QUERY genome so genome_map_gather's cached one-hot factors
        # amortize across each genome's rows (per-pair results are
        # order-independent; the stable sort keeps input order otherwise)
        meta.sort(key=lambda m: (m[7], m[1]))

        lock = threading.Lock()
        lo_hi = [0, len(meta)]   # [front, back) of the shared work queue

        def take_front():
            with lock:
                lo = lo_hi[0]
                if lo >= lo_hi[1]:
                    return []
                hi = min(lo + self._r_for(meta[lo][7]), lo_hi[1])
                while hi > lo + 1 and meta[hi - 1][7] != meta[lo][7]:
                    hi -= 1     # stop at a bucket boundary
                lo_hi[0] = hi
                return meta[lo:hi]

        def take_back():
            with lock:
                if lo_hi[0] >= lo_hi[1]:
                    return None
                lo_hi[1] -= 1
                return meta[lo_hi[1]]

        worker_errors = []

        # Merged pair-index upload (SKANI_TPU_MERGE_PUT=K): on the tunneled
        # link each device_put is a full roundtrip (~30-50 ms) regardless of
        # size, so the per-batch (2, R) index transfer costs as much as the
        # readback.  Grab up to K same-bucket batches from the queue, ship
        # ONE (K, 2, R) block, and hand each dispatch its device-side slice
        # (big[i] is an async on-device gather, not a transfer).  Pure
        # transfer scheduling — results are bit-identical.
        put_k = max(1, int(os.environ.get("SKANI_TPU_MERGE_PUT", "1")))
        _pend = []    # [(group, idx_dev)] formed but not yet dispatched
        _held = []    # one group popped past a bucket boundary

        def next_dispatch():
            """Next (group, (ph, icap, ccap)) entry, or None when drained."""
            if not _pend:
                g = _held.pop() if _held else take_front()
                if not g:
                    return None
                if put_k <= 1:
                    _pend.append((g, None))
                else:
                    groups = [g]
                    while len(groups) < put_k:
                        g2 = take_front()
                        if not g2:
                            break
                        if g2[0][7] != g[0][7]:
                            _held.append(g2)   # next bucket starts here
                            break
                        groups.append(g2)
                    r_b = max(self._r_shape(gr) for gr in groups)
                    idx = np.zeros((len(groups), 2, r_b), dtype=np.int32)
                    for i, gr in enumerate(groups):
                        for w, item in enumerate(gr):
                            idx[i, 0, w] = item[1]
                            idx[i, 1, w] = item[2]
                    dev = self.device or jax.devices()[0]
                    big = jax.device_put(jnp.asarray(idx), dev)
                    _pend.extend((gr, big[i])
                                 for i, gr in enumerate(groups))
            group, idx_dev = _pend.pop(0)
            return group, self._dispatch_phase_a(group, group[0][4],
                                                 idx_dev)

        def host_loop():
            while True:
                item = take_back()
                if item is None:
                    return
                t, _a, _b, _sw, mp, ri, qi, _ba = item
                try:
                    out[t] = chain_seeds_native(self.sketches[ri],
                                                self.sketches[qi], mp)
                    stats.add("pairs_host")
                except BaseException as e:  # surfaced after join
                    worker_errors.append(e)
                    return

        timing = os.environ.get("SKANI_TPU_TIMING") == "1"

        def finalize(group, packed, icap, ccap, t_read):
            import time
            t1 = time.perf_counter()
            if not self._process_batch_native(group, packed, out,
                                              icap, ccap):
                batch_recs, ranks = self._host_process(group, packed,
                                                       icap, ccap)
                self._finalize_batch(group, batch_recs, ranks, out)
            stats.add("device_batches")
            stats.add("pairs_device", len(group))
            stats.add("readback_s", t_read)
            stats.add("finalize_s", time.perf_counter() - t1)
            if timing:
                import sys
                sys.stderr.write(
                    f"# batch n={len(group)} readback {1e3 * t_read:.1f}"
                    f"ms host+finalize "
                    f"{1e3 * (time.perf_counter() - t1):.1f}ms\n")

        def process(entry):
            import time
            group, (ph, icap, ccap) = entry
            t0 = time.perf_counter()
            packed = np.asarray(ph)
            finalize(group, packed, icap, ccap, time.perf_counter() - t0)

        workers = []
        if host_workers > 0 and len(meta) > 2 * self.R:
            from .. import native
            if native.available():
                workers = [threading.Thread(target=host_loop)
                           for _ in range(host_workers)]
                for w in workers:
                    w.start()

        depth = int(os.environ.get("SKANI_TPU_INFLIGHT", "3"))
        merge_k = max(1, int(os.environ.get("SKANI_TPU_MERGE_READ", "1")))
        if merge_k > 1:
            depth = max(depth, merge_k + 2)
        # Host pipeline modes (SKANI_TPU_READER):
        #   1 (default) — dispatch and readback stay on the MAIN thread
        #     (the tunneled axon client wedges when a second thread issues
        #     jax calls concurrently, measured: a reader-thread np.asarray
        #     alongside main-thread dispatch deadlocked the pool);
        #     the CPU-bound finalize (pure C/numpy, no jax) runs on ONE
        #     worker thread so the ~25 ms native finalize overlaps the
        #     next batch's network readback.
        #   2 — full three-stage pipeline with a dedicated reader thread
        #     doing the readback too (for local-link hosts with a
        #     thread-safe PJRT client).
        #   0 — fully serial (the round-2 behavior).
        mode = os.environ.get("SKANI_TPU_READER", "1")
        use_threads = mode in ("1", "2") and len(meta) > self.R
        if use_threads:
            import queue
            import time as _time
            fin_q = queue.Queue(maxsize=depth)

            def finalize_loop():
                failed = False
                while True:
                    item = fin_q.get()
                    if item is None:
                        return
                    if failed:
                        continue     # drain so the producer never blocks
                    try:
                        finalize(*item)
                    except BaseException as e:
                        worker_errors.append(e)
                        failed = True

            fz = threading.Thread(target=finalize_loop)
            fz.start()
            if mode == "2":
                read_q = queue.Queue(maxsize=depth)

                def reader_loop():
                    failed = False
                    while True:
                        entry = read_q.get()
                        if entry is None:
                            fin_q.put(None)
                            return
                        if failed:
                            continue   # drain so dispatch never blocks
                        group, (ph, icap, ccap) = entry
                        t0 = _time.perf_counter()
                        try:
                            packed = np.asarray(ph)
                        except BaseException as e:
                            worker_errors.append(e)
                            failed = True
                            continue
                        fin_q.put((group, packed, icap, ccap,
                                   _time.perf_counter() - t0))

                rd = threading.Thread(target=reader_loop)
                rd.start()
                while True:
                    entry = next_dispatch()
                    if entry is None:
                        break
                    read_q.put(entry)
                read_q.put(None)
                rd.join()
            else:
                inflight = []
                # Merged readback (SKANI_TPU_MERGE_READ=K): pop up to K
                # same-shape in-flight batches, concatenate their packed
                # outputs ON DEVICE (an async dispatch) and fetch the lot
                # with ONE np.asarray.  On the tunneled link the readback
                # cost is per-ROUNDTRIP, not per-byte, so K batches share
                # one ~50 ms floor instead of paying it each.  Pure
                # transfer scheduling — the split reproduces each batch's
                # array bit-for-bit.

                def _key(entry):
                    ph, icap, ccap = entry[1]
                    return (icap, ccap, ph.shape[1:], ph.dtype)

                def read_one():
                    take = 1
                    while take < min(merge_k, len(inflight)) \
                            and _key(inflight[take]) == _key(inflight[0]):
                        take += 1
                    entries = [inflight.pop(0) for _ in range(take)]
                    t0 = _time.perf_counter()
                    if take == 1:
                        packed_all = np.asarray(entries[0][1][0])
                    else:
                        packed_all = np.asarray(jnp.concatenate(
                            [e[1][0] for e in entries], axis=0))
                    dt = (_time.perf_counter() - t0) / take
                    off = 0
                    for group, (ph, icap, ccap) in entries:
                        n = ph.shape[0]
                        fin_q.put((group, packed_all[off:off + n],
                                   icap, ccap, dt))
                        off += n

                try:
                    while True:
                        entry = next_dispatch()
                        if entry is not None:
                            inflight.append(entry)
                        if (entry is None and inflight) \
                                or len(inflight) >= depth:
                            read_one()
                        if entry is None and not inflight:
                            break
                finally:
                    fin_q.put(None)
            fz.join()
        else:
            inflight = []
            while True:
                entry = next_dispatch()
                if entry is not None:
                    inflight.append(entry)
                if (entry is None and inflight) or len(inflight) >= depth:
                    process(inflight.pop(0))
                if entry is None and not inflight:
                    break
        for w in workers:
            w.join()
        if worker_errors:
            raise worker_errors[0]
        for t, src in mirrors:
            out[t] = self._mirror_result(out[src])
        stats.add("pairs_mirrored", len(mirrors))
        return out

    @staticmethod
    def _finalize_chunks(recs: np.ndarray, rk: np.ndarray, c: int,
                         mp) -> list:
        """Vectorized per-chunk estimator tail (reference:
        src/chain.rs:326-396) from aggregation records + seed ranks."""
        if len(recs) == 0:
            return []
        k = mp.k
        total_anchors = recs[:, 1].astype(np.float64)
        tbc_query = recs[:, 2]
        trq0 = recs[:, 3]
        trq1 = recs[:, 4]
        uoff = recs[:, 8]
        n_union = recs[:, 9]
        total_seeds = rk[uoff + 1] - rk[uoff]
        in_range = rk[uoff + 3] - rk[uoff + 2]
        # union sums (ragged): segment sums over consecutive query pairs
        tot_u = int(n_union.sum())
        if tot_u:
            seg = np.repeat(np.arange(len(recs)), n_union)
            base = np.repeat(uoff + 4, n_union)
            off = np.arange(tot_u) - np.repeat(
                np.cumsum(n_union) - n_union, n_union)
            lo_i = base + 2 * off
            in_union = np.bincount(
                seg, weights=(rk[lo_i + 1] - rk[lo_i]).astype(np.float64),
                minlength=len(recs))
        else:
            in_union = np.zeros(len(recs))
        with np.errstate(divide="ignore", invalid="ignore"):
            putative = np.power(total_anchors / in_union, 1.0 / k)
            considered = total_seeds.astype(np.int64).copy()
            switch = ((putative > 0.950) & (tbc_query > c * 4)
                      & (not mp.amino_acid)
                      & (trq1 - trq0 < 18000)
                      & (considered > 1.05 * in_range))
            considered = np.where(switch, in_range, considered)
            if mp.amino_acid:
                ml = np.minimum(1.0, total_anchors / considered * 6.0)
                weights = (total_seeds // 6).astype(np.int64)
            else:
                ml = np.minimum(1.0, total_anchors / considered)
                weights = considered
            ests = np.power(ml, 1.0 / k)
        return list(zip(ests.tolist(), weights.tolist()))
