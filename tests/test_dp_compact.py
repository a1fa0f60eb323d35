"""Compact-stream chaining DP (kernels/dp_compact.py) vs the padded
layout: same recurrence, no regroup/extraction passes.

The synthetic streams exercise the tricky structure: chunks of random
length (including the 1-anchor cascade runs chunking produces), chunks
crossing segment boundaries (the halo + elementwise-select path), an
invalid tail, and multiple rows.  Expected values come from the padded
lax.scan (_dp_scan_packed), the semantic reference the Pallas kernels
are pinned to.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from skani_tpu.kernels.dp_compact import (CID_SHIFT, dp_chain_compact,
                                          seg_len)
from skani_tpu.kernels.dp_pallas import _dp_scan, dbits, I32MAX

BAND = 20       # default-preset band; band=31 is the tag-ambiguity edge
PCL = 10000
MAX_GAP = 2000
SCORE = 50


def _synth(rng, R, A, l_cap, n_pos=24_000, n_ctg=3):
    """Random anchor streams with chunk structure; returns the compact
    planes (w1, w2, col_in_chunk) plus the per-row chunk table for the
    padded reference."""
    w1 = np.zeros((R, A), np.int32)
    w2 = np.zeros((R, A), np.int32)
    colc = np.zeros((R, A), np.int32)
    chunks = []      # per row: list of (start, length)
    for r in range(R):
        total = rng.integers(A // 2, A)
        row_chunks = []
        t = 0
        qp = rng.integers(0, 1000)
        while t < total:
            ln = int(min(rng.choice([1, 1, 2, 5, rng.integers(1, l_cap)]),
                         total - t))
            row_chunks.append((t, ln))
            rcv = rng.integers(0, n_ctg)
            rp0 = rng.integers(0, n_pos)
            for i in range(ln):
                qp += rng.integers(1, 40)
                rev = rng.integers(0, 2)
                rp = int(np.clip(rp0 + (i * rng.integers(1, 30)
                                        + rng.integers(-20, 20)),
                                 0, (1 << 24) - 1))
                cid = len(row_chunks) - 1
                w1[r, t + i] = ((cid & 31) << CID_SHIFT) \
                    | (int(qp) << 2) | (rev << 1) | 1
                w2[r, t + i] = (rcv << 25) | rp
                colc[r, t + i] = i
            t += ln
        chunks.append(row_chunks)
    return w1, w2, colc, chunks


def _padded_reference(w1, w2, chunks, l_cap, band=BAND):
    """Regroup to (L_CAP, total_chunks) in numpy and run the padded
    (unpacked) scan; map results back to compact order."""
    R, A = w1.shape
    rows = sum(len(c) for c in chunks)
    qp = np.full((l_cap, rows), I32MAX, np.int32)
    rp = np.full((l_cap, rows), I32MAX, np.int32)
    rcv = np.zeros((l_cap, rows), np.int32)
    meta = []
    j = 0
    for r, row_chunks in enumerate(chunks):
        for (start, ln) in row_chunks:
            sl = slice(start, start + ln)
            qp[:ln, j] = (w1[r, sl] >> 2) & 0xFFFFFF
            rp[:ln, j] = w2[r, sl] & ((1 << 25) - 1)
            rcv[:ln, j] = (w2[r, sl] >> 25) * 4 + ((w1[r, sl] >> 1) & 1) * 2 \
                + (w1[r, sl] & 1)
            meta.append((r, start, ln))
            j += 1
    dd, root = _dp_scan(jnp.asarray(qp), jnp.asarray(rp), jnp.asarray(rcv),
                        band, PCL, MAX_GAP, SCORE, unroll=1)
    dd = np.asarray(dd)
    root_p = np.asarray(root)
    DBITS = dbits(l_cap)
    score = np.zeros((R, A), np.int64)
    dep = np.zeros((R, A), np.int64)
    root = np.zeros((R, A), np.int64)
    for j, (r, start, ln) in enumerate(meta):
        score[r, start:start + ln] = dd[:ln, j] >> DBITS
        dep[r, start:start + ln] = dd[:ln, j] & ((1 << DBITS) - 1)
        root[r, start:start + ln] = root_p[:ln, j] + start
    return score, dep, root


@pytest.mark.parametrize("seed,R,A,l_cap,band", [
    (0, 2, 8192, 512, BAND),
    (1, 3, 8192, 512, BAND),
    (2, 1, 16384, 512, BAND),   # multiple segments per row
    (3, 2, 8192, 257, BAND),    # l_cap not a power of two
    (4, 2, 8192, 512, 31),      # widest legal band: a window can span 31
    #                             chunk boundaries (1-anchor cascade runs)
    #                             — the mod-32 cid tag's ambiguity edge
])
def test_compact_matches_padded_reference(seed, R, A, l_cap, band):
    rng = np.random.default_rng(seed)
    w1, w2, colc, chunks = _synth(rng, R, A, l_cap)
    # sanity: the synth must produce at least one boundary-crossing chunk
    S = seg_len(A, l_cap)
    crossing = any(start // S != (start + ln - 1) // S
                   for row in chunks for (start, ln) in row)
    if A > S:
        assert crossing
    score_c, dr_c = dp_chain_compact(
        jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(colc),
        band, PCL, MAX_GAP, SCORE, l_cap, interpret=True)
    score_c = np.asarray(score_c)
    dep_c = np.asarray(dr_c) >> 20
    root_c = np.asarray(dr_c) & ((1 << 20) - 1)

    score_e, dep_e, root_e = _padded_reference(w1, w2, chunks, l_cap, band)
    valid = (w1 & 1) == 1
    np.testing.assert_array_equal(score_c[valid], score_e[valid])
    np.testing.assert_array_equal(dep_c[valid], dep_e[valid])
    np.testing.assert_array_equal(root_c[valid], root_e[valid])


def test_compact_kernel_compiled_on_tpu():
    """The real Mosaic lowering (interpret=False) vs interpret mode on
    hardware — the only place mode 1 is exercised outside bench runs."""
    import jax

    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU backend in this session")
    rng = np.random.default_rng(11)
    w1, w2, colc, _chunks = _synth(rng, 2, 8192, 512)
    a = dp_chain_compact(jnp.asarray(w1), jnp.asarray(w2),
                         jnp.asarray(colc), BAND, PCL, MAX_GAP, SCORE,
                         512, interpret=False)
    b = dp_chain_compact(jnp.asarray(w1), jnp.asarray(w2),
                         jnp.asarray(colc), BAND, PCL, MAX_GAP, SCORE,
                         512, interpret=True)
    valid = (w1 & 1) == 1
    np.testing.assert_array_equal(np.asarray(a[0])[valid],
                                  np.asarray(b[0])[valid])
    np.testing.assert_array_equal(np.asarray(a[1])[valid],
                                  np.asarray(b[1])[valid])

    from skani_tpu.kernels.dp_compact import dp_chain_compact_wide
    w3 = np.where((w1 & 1) == 1,
                  (w1 >> CID_SHIFT << CID_SHIFT) | (w2 >> 25), -1)
    w1p = w1 & ~(0x1F << CID_SHIFT)    # wide w1 carries no tag
    w2p = np.where((w1 & 1) == 1, w2 & ((1 << 25) - 1), 0)
    aw = dp_chain_compact_wide(
        jnp.asarray(w1p), jnp.asarray(w2p), jnp.asarray(w3),
        jnp.asarray(colc), BAND, PCL, MAX_GAP, SCORE, 512,
        interpret=False)
    bw = dp_chain_compact_wide(
        jnp.asarray(w1p), jnp.asarray(w2p), jnp.asarray(w3),
        jnp.asarray(colc), BAND, PCL, MAX_GAP, SCORE, 512,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(aw[0])[valid],
                                  np.asarray(bw[0])[valid])
    np.testing.assert_array_equal(np.asarray(aw[1])[valid],
                                  np.asarray(bw[1])[valid])


def test_engine_fuzz_compact_interpret(tmp_path):
    """Full-engine differential check with the compact DP in interpret
    mode: device engine == exact native path on small random genomes."""
    os.environ["SKANI_TPU_COMPACT_DP"] = "2"
    try:
        from skani_tpu import CommandParams, SketchParams
        from skani_tpu.ani import chain_seeds_native
        from skani_tpu.kernels.device_pipeline import DevicePairEngine
        from skani_tpu.params import map_params_from_sketch
        from skani_tpu.sketch import Sketch, default_seeder, _finalize_sketch

        rng = np.random.default_rng(5)
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        params = SketchParams()
        seeder = default_seeder()
        sketches = []
        base = bases[rng.integers(0, 4, size=250_000)]
        for i in range(4):
            s = base.copy()
            pos = rng.choice(len(s), size=int(len(s) * 0.01 * (i + 1)),
                             replace=False)
            s[pos] = bases[rng.integers(0, 4, size=len(pos))]
            sk = Sketch(file_name=f"g{i}", marker_c=params.c, c=params.c,
                        k=params.k)
            sk.contigs = [f"g{i}"]
            sk.contig_lengths = np.array([len(s)], dtype=np.uint32)
            sk.total_sequence_length = len(s)
            km, po, ca, ma = seeder(s, params)
            _finalize_sketch(sk, [km], [po], [ca],
                             [np.zeros(len(km), dtype=np.uint32)], [ma])
            sketches.append(sk)
        cp = CommandParams()
        eng = DevicePairEngine(sketches, params, cp, batch=3)
        assert eng.gen_mode == "sorted_packed"
        pairs = [(i, j) for i in range(4) for j in range(4) if i != j]
        from skani_tpu import stats
        before = stats.snapshot().get("compact_dp_traces", 0)
        got = eng.run_pairs(pairs, host_workers=0)
        assert stats.snapshot().get("compact_dp_traces", 0) > before, \
            "compact DP path did not engage"
        for (i, j), g in zip(pairs, got):
            mp = map_params_from_sketch(sketches[i], False, cp, None)
            want = chain_seeds_native(sketches[i], sketches[j], mp)
            if np.isnan(want.ani):
                assert np.isnan(g.ani), (i, j)
            else:
                assert g.ani == want.ani, (i, j, g.ani, want.ani)
                assert g.align_fraction_query == want.align_fraction_query
                assert g.align_fraction_ref == want.align_fraction_ref
    finally:
        os.environ.pop("SKANI_TPU_COMPACT_DP", None)


def test_engine_fuzz_compact_wide_tier():
    """Compact DP wide variant (3 planes, interpret) on > 64-contig
    genomes — the unpacked 'sorted' generation mode the big-genome /
    MAG tier uses."""
    import test_device_fuzz as fz

    os.environ["SKANI_TPU_COMPACT_DP"] = "2"
    try:
        from skani_tpu import CommandParams, SketchParams, stats
        from skani_tpu.kernels.device_pipeline import DevicePairEngine

        rng = np.random.default_rng(77)
        # band = 2500/c must stay < 32 for compact eligibility -> c=100
        sp = SketchParams(c=100, k=14, marker_c=200)
        cp = CommandParams()
        base = fz.BASES[rng.integers(0, 4, size=200000)]
        sks = []
        for g in range(3):
            parts = []
            for ci in range(80):        # 80 contigs > PACK_MAX_CTGS
                lo = ci * 2500
                s = base[lo:lo + 2400].copy()
                nm = int(len(s) * rng.uniform(0, 0.03))
                if nm:
                    p = rng.choice(len(s), size=nm, replace=False)
                    s[p] = fz.BASES[rng.integers(0, 4, size=nm)]
                parts.append(s)
            sks.append(fz._mk_sketch(parts, sp, f"wc{g}"))
        eng = DevicePairEngine(sks, sp, cp, batch=3, i_cap=512, c_cap=128,
                               l_cap=512)
        assert eng.gen_mode == "sorted", eng.gen_mode
        assert eng._compact_wide_ok
        pairs = [(i, j) for i in range(3) for j in range(3) if i != j]
        before = stats.snapshot().get("compact_dp_traces", 0)
        res = eng.run_pairs(pairs, host_workers=0)
        assert stats.snapshot().get("compact_dp_traces", 0) > before, \
            "wide compact DP path did not engage"
        fz._assert_matches_native(sks, cp, pairs, res)
    finally:
        os.environ.pop("SKANI_TPU_COMPACT_DP", None)


def test_engine_fuzz_compact_slow_preset_band():
    """Slow-preset band (c=30 -> band 83 >= 32) routes to the 3-plane
    full-cid packing — no tag-ambiguity limit — and stays exact."""
    import test_device_fuzz as fz

    os.environ["SKANI_TPU_COMPACT_DP"] = "2"
    try:
        from skani_tpu import CommandParams, SketchParams, stats
        from skani_tpu.kernels.device_pipeline import DevicePairEngine
        from skani_tpu.params import map_params_from_sketch

        rng = np.random.default_rng(7)
        sp = SketchParams(c=30, k=12, marker_c=200)
        cp = CommandParams()
        base = fz.BASES[rng.integers(0, 4, size=90000)]
        sks = []
        for g in range(3):
            parts = fz._rand_genome(rng, 90000, int(rng.integers(1, 4)),
                                    repeat=(g == 2), src=base)
            sks.append(fz._mk_sketch(parts, sp, f"sb{g}"))
        mp = map_params_from_sketch(sks[0], False, cp, None)
        assert mp.index_chain_band >= 32, mp.index_chain_band
        eng = DevicePairEngine(sks, sp, cp, batch=3, i_cap=512, c_cap=64,
                               l_cap=1024)
        assert eng.gen_mode == "sorted_packed"
        pairs = [(i, j) for i in range(3) for j in range(3) if i != j]
        before = stats.snapshot().get("compact_dp_traces", 0)
        res = eng.run_pairs(pairs, host_workers=0)
        assert stats.snapshot().get("compact_dp_traces", 0) > before, \
            "full-cid compact DP path did not engage"
        fz._assert_matches_native(sks, cp, pairs, res)
    finally:
        os.environ.pop("SKANI_TPU_COMPACT_DP", None)


def test_engine_fuzz_compact_multi_contig():
    """Compact DP (interpret) on multi-contig, repeat-heavy genomes —
    contig transitions and cascade chunking stress the cid-tag path."""
    import test_device_fuzz as fz

    os.environ["SKANI_TPU_COMPACT_DP"] = "2"
    try:
        from skani_tpu import CommandParams, SketchParams, stats
        from skani_tpu.kernels.device_pipeline import DevicePairEngine

        rng = np.random.default_rng(17)
        sp = SketchParams(c=200, k=15, marker_c=200)
        cp = CommandParams()
        base = fz.BASES[rng.integers(0, 4, size=120000)]
        sks = []
        for g in range(4):
            parts = fz._rand_genome(rng, 120000, int(rng.integers(2, 6)),
                                    repeat=(g == 3),
                                    src=base if g < 3 else None)
            sks.append(fz._mk_sketch(parts, sp, f"cmp{g}"))
        eng = DevicePairEngine(sks, sp, cp, batch=4, i_cap=256, c_cap=64,
                               l_cap=512)
        assert eng.gen_mode == "sorted_packed"
        pairs = [(i, j) for i in range(4) for j in range(4) if i != j]
        before = stats.snapshot().get("compact_dp_traces", 0)
        res = eng.run_pairs(pairs, host_workers=0)
        assert stats.snapshot().get("compact_dp_traces", 0) > before
        fz._assert_matches_native(sks, cp, pairs, res)
    finally:
        os.environ.pop("SKANI_TPU_COMPACT_DP", None)
