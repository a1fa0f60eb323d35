"""Randomized differential test: device engine vs native across
multi-contig, repeat-heavy, N-laden genomes and random (c, k, mode)
configurations.  This caught a real divergence (the final chunk's seed
range must close at the LAST anchor's query position in sorted order, not
the max position across contigs — reference: src/chain.rs:804-817)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skani_tpu import CommandParams, SketchParams
from skani_tpu.ani import chain_seeds_native
from skani_tpu.kernels.device_pipeline import DevicePairEngine
from skani_tpu.params import map_params_from_sketch
from skani_tpu.sketch import Sketch, _finalize_sketch, default_seeder

BASES = np.frombuffer(b"ACGTacgtNn", dtype=np.uint8)


def _rand_genome(rng, L, n_contigs, repeat=False, src=None):
    parts = []
    for _ in range(n_contigs):
        cl = max(600, int(rng.integers(600, max(L // n_contigs, 700))))
        if src is not None:
            s = src[:cl].copy()
            nm = int(cl * rng.uniform(0.001, 0.05))
            p = rng.choice(cl, size=nm, replace=False)
            s[p] = BASES[rng.integers(0, 4, size=nm)]
        else:
            s = BASES[rng.integers(0, len(BASES), size=cl)]
        if repeat:
            s = np.concatenate([s] + [s[:2000]] * int(rng.integers(2, 20)))
        parts.append(s)
    return parts


def _mk_sketch(parts, sp, name):
    seeder = default_seeder()
    sk = Sketch(file_name=name, marker_c=sp.c, c=sp.c, k=sp.k)
    kms, pos, cas, ctg, mas = [], [], [], [], []
    j = 0
    for s in parts:
        if len(s) < 500:
            continue
        sk.contigs.append(f"{name}_c{j}")
        sk.contig_lengths = np.append(sk.contig_lengths, np.uint32(len(s)))
        sk.total_sequence_length += len(s)
        km, po, ca, ma = seeder(s, sp)
        if len(km):
            kms.append(km)
            pos.append(po)
            cas.append(ca)
            ctg.append(np.full(len(km), j, np.uint32))
        if len(ma):
            mas.append(ma)
        j += 1
    _finalize_sketch(sk, kms, pos, cas, ctg, mas)
    return sk


@pytest.mark.parametrize("seed,c,k", [(99, 200, 15), (7, 30, 12),
                                      (23, 125, 16)])
def test_device_engine_fuzz(seed, c, k):
    rng = np.random.default_rng(seed)
    sp = SketchParams(c=c, k=k, marker_c=max(c, 200))
    cp = CommandParams(robust=bool(seed % 2))
    base = BASES[rng.integers(0, 4, size=120000)]
    sks = []
    for g in range(4):
        parts = _rand_genome(rng, 120000, int(rng.integers(1, 5)),
                             repeat=(g == 3), src=base if g < 3 else None)
        sks.append(_mk_sketch(parts, sp, f"f{seed}g{g}"))
    eng = DevicePairEngine(sks, sp, cp, batch=4, i_cap=256, c_cap=32,
                           l_cap=512)
    pairs = [(i, j) for i in range(4) for j in range(4) if i != j]
    res = eng.run_pairs(pairs, host_workers=0)
    for (i, j), a in zip(pairs, res):
        mp = map_params_from_sketch(sks[i], False, cp, None)
        b = chain_seeds_native(sks[i], sks[j], mp)
        if np.isnan(a.ani) and np.isnan(b.ani):
            continue
        assert a.ani == b.ani, (i, j, a.ani, b.ani)
        assert a.align_fraction_query == b.align_fraction_query
        assert a.ci_lower == b.ci_lower


def test_device_engine_fuzz_mixed_buckets():
    """Genomes spanning multiple anchor-size buckets in one engine (tiny
    plasmid-scale through ~3 Mbp) — exercises per-bucket batch sizing,
    the dense global-axis join, and the packed DP together."""
    rng = np.random.default_rng(31)
    sp = SketchParams()           # default c=125/k=15: the packed path
    cp = CommandParams()
    sizes = [3000, 9000, 150000, 3000000, 3050000]
    sks = []
    base = BASES[rng.integers(0, 4, size=max(sizes))]
    for g, n in enumerate(sizes):
        s = base[:n].copy()
        nm = int(n * rng.uniform(0.001, 0.04))
        if nm:
            p = rng.choice(n, size=nm, replace=False)
            s[p] = BASES[rng.integers(0, 4, size=nm)]
        sks.append(_mk_sketch([s], sp, f"mb{g}"))
    eng = DevicePairEngine(sks, sp, cp, batch=4, i_cap=256, c_cap=64)
    # TPU default is the kmer-axis dense join (windowed sorted gather);
    # CPU keeps the position-axis variant — both are the dense join
    assert eng.gen_mode == "sorted_packed" \
        and eng.join_mode in ("dense", "dense_pos")
    assert len({eng._bucket_a(i, j) for i in range(5) for j in range(5)
                if i != j}) >= 2   # really spans buckets
    pairs = [(i, j) for i in range(5) for j in range(5) if i != j]
    res = eng.run_pairs(pairs, host_workers=0)
    bad = 0
    for (i, j), a in zip(pairs, res):
        mp = map_params_from_sketch(sks[i], False, cp, None)
        b = chain_seeds_native(sks[i], sks[j], mp)
        if np.isnan(a.ani) and np.isnan(b.ani):
            continue
        ok = (a.ani == b.ani
              and a.align_fraction_query == b.align_fraction_query
              and a.ci_lower == b.ci_lower)
        bad += not ok
    assert bad == 0


def test_device_engine_fuzz_many_contigs_sorted_mode():
    """Genomes with > 64 contigs fall off the packed position word and
    must use the UNPACKED sorted-generation mode (separate position /
    contig gathers, 3-plane DP) — still exact."""
    rng = np.random.default_rng(77)
    sp = SketchParams(c=70, k=14, marker_c=200)
    cp = CommandParams()
    base = BASES[rng.integers(0, 4, size=200000)]
    sks = []
    for g in range(3):
        parts = []
        for ci in range(80):            # 80 contigs > PACK_MAX_CTGS
            lo = ci * 2500
            s = base[lo:lo + 2400].copy()
            nm = int(len(s) * rng.uniform(0, 0.03))
            if nm:
                p = rng.choice(len(s), size=nm, replace=False)
                s[p] = BASES[rng.integers(0, 4, size=nm)]
            parts.append(s)
        sks.append(_mk_sketch(parts, sp, f"mc{g}"))
    eng = DevicePairEngine(sks, sp, cp, batch=3, i_cap=512, c_cap=128,
                           l_cap=512)
    assert eng.gen_mode == "sorted", eng.gen_mode
    pairs = [(i, j) for i in range(3) for j in range(3) if i != j]
    res = eng.run_pairs(pairs, host_workers=0)
    bad = 0
    for (i, j), a in zip(pairs, res):
        mp = map_params_from_sketch(sks[i], False, cp, None)
        b = chain_seeds_native(sks[i], sks[j], mp)
        if np.isnan(a.ani) and np.isnan(b.ani):
            continue
        bad += not (a.ani == b.ani
                    and a.align_fraction_query == b.align_fraction_query
                    and a.ci_lower == b.ci_lower)
    assert bad == 0


def _assert_matches_native(sks, cp, pairs, res):
    bad = 0
    for (i, j), a in zip(pairs, res):
        mp = map_params_from_sketch(sks[i], False, cp, None)
        b = chain_seeds_native(sks[i], sks[j], mp)
        if np.isnan(a.ani) and np.isnan(b.ani):
            continue
        bad += not (a.ani == b.ani
                    and a.align_fraction_query == b.align_fraction_query
                    and a.ci_lower == b.ci_lower)
    assert bad == 0


def test_device_engine_big_position_table():
    """The eukaryote-MAG tier's join layout: genomes whose seed-position
    tables exceed 2^19 rows no longer fit the packed (b_start << 12 |
    cnt) join word and must take the split-gather branch (the same
    branch a real 60+ Mbp genome takes; forced here via min_p so the CPU
    suite stays fast) — still exact.  Matches the reference's eukaryote
    tier, reference: tests/tests.rs:82-128."""
    rng = np.random.default_rng(5)
    sp = SketchParams()
    cp = CommandParams()
    base = BASES[rng.integers(0, 4, size=400000)]
    sks = []
    for g in range(3):
        s = base.copy()
        nm = int(len(s) * (0.002 + 0.01 * g))
        p = rng.choice(len(s), size=nm, replace=False)
        s[p] = BASES[rng.integers(0, 4, size=nm)]
        sks.append(_mk_sketch([s], sp, f"bp{g}"))
    eng = DevicePairEngine(sks, sp, cp, batch=3, i_cap=256, c_cap=64,
                           l_cap=512, min_p=(1 << 19) + 4096)
    assert eng.db.P >= (1 << 19)
    pairs = [(i, j) for i in range(3) for j in range(3) if i != j]
    res = eng.run_pairs(pairs, host_workers=0)
    _assert_matches_native(sks, cp, pairs, res)


def test_device_engine_unpacked_split_gather():
    """The full eukaryote-MAG tier COMBINATION: unpacked sorted mode
    (> 64 contigs falls off the packed position word, like a > 16.7 Mbp
    contig does) AND a > 2^19-row position table (split-gather join
    branch, forced via min_p so the CPU suite stays fast).  A real 65
    Mbp single-contig genome takes exactly this configuration —
    scripts/mag_scale_demo.py runs it at true scale on hardware.
    Reference tier: tests/tests.rs:82-128."""
    rng = np.random.default_rng(17)
    sp = SketchParams(c=70, k=14, marker_c=200)
    cp = CommandParams()
    base = BASES[rng.integers(0, 4, size=200000)]
    sks = []
    for g in range(3):
        parts = []
        for ci in range(80):            # 80 contigs > PACK_MAX_CTGS
            lo = ci * 2500
            s = base[lo:lo + 2400].copy()
            nm = int(len(s) * rng.uniform(0, 0.03))
            if nm:
                p = rng.choice(len(s), size=nm, replace=False)
                s[p] = BASES[rng.integers(0, 4, size=nm)]
            parts.append(s)
        sks.append(_mk_sketch(parts, sp, f"us{g}"))
    eng = DevicePairEngine(sks, sp, cp, batch=3, i_cap=512, c_cap=128,
                           l_cap=512, min_p=(1 << 19) + 4096)
    assert eng.gen_mode == "sorted", eng.gen_mode
    assert eng.db.P >= (1 << 19)
    pairs = [(i, j) for i in range(3) for j in range(3) if i != j]
    res = eng.run_pairs(pairs, host_workers=0)
    _assert_matches_native(sks, cp, pairs, res)


def test_device_engine_wide_aggregation_keys():
    """Dense presets (L_CAP 2048) overflow the packed (score << INVBITS |
    col) aggregation key; the wide 3-key sort path must be exact."""
    rng = np.random.default_rng(13)
    sp = SketchParams(c=30, marker_c=200)
    cp = CommandParams()
    base = BASES[rng.integers(0, 4, size=150000)]
    sks = []
    for g in range(3):
        s = base.copy()
        nm = int(len(s) * (0.003 + 0.02 * g))
        p = rng.choice(len(s), size=nm, replace=False)
        s[p] = BASES[rng.integers(0, 4, size=nm)]
        sks.append(_mk_sketch([s], sp, f"wa{g}"))
    eng = DevicePairEngine(sks, sp, cp, batch=3, i_cap=512, c_cap=32,
                           l_cap=2048)
    pairs = [(i, j) for i in range(3) for j in range(3) if i != j]
    res = eng.run_pairs(pairs, host_workers=0)
    _assert_matches_native(sks, cp, pairs, res)


def test_device_engine_bucket_scaled_caps():
    """Multi-megabase genomes need more than the default 512 chunk slots;
    per-bucket C_CAP/I_CAP scaling keeps them on device (exact) instead
    of overflowing to the host."""
    rng = np.random.default_rng(41)
    sp = SketchParams()
    cp = CommandParams()
    n = 14_000_000
    base = BASES[rng.integers(0, 4, size=n)]
    sks = []
    for g in range(2):
        s = base.copy()
        nm = int(n * (0.002 + 0.01 * g))
        p = rng.choice(n, size=nm, replace=False)
        s[p] = BASES[rng.integers(0, 4, size=nm)]
        sks.append(_mk_sketch([s], sp, f"bc{g}"))
    eng = DevicePairEngine(sks, sp, cp, batch=2, i_cap=512, c_cap=512,
                           l_cap=512)
    icap, ccap = eng._caps_for(eng._bucket_a(0, 1))
    assert ccap > 512 and icap >= ccap
    pairs = [(0, 1), (1, 0)]
    res = eng.run_pairs(pairs, host_workers=0)
    assert not np.isnan(res[0].ani)
    _assert_matches_native(sks, cp, pairs, res)


def test_device_engine_wide_batch_small_bucket(monkeypatch):
    """Small-genome buckets WIDEN the batch (search-at-scale: fixed
    per-dispatch/per-op costs amortize over 6-24x more pairs) and SHRINK
    the chunk/interval caps to the bucket's genome scale.  Exactness of
    the widened (R, A) shape and the shrunken caps vs native."""
    monkeypatch.setenv("SKANI_TPU_RMAX", "64")
    rng = np.random.default_rng(53)
    sp = SketchParams()
    cp = CommandParams()
    n = 40_000
    base = BASES[rng.integers(0, 4, size=n)]
    sks = []
    for g in range(12):
        s = base.copy()
        nm = int(n * (0.004 + 0.03 * g / 11))
        p = rng.choice(n, size=nm, replace=False)
        s[p] = BASES[rng.integers(0, 4, size=nm)]
        sks.append(_mk_sketch([s], sp, f"wb{g}"))
    eng = DevicePairEngine(sks, sp, cp)
    b = eng._bucket_a(0, 1)
    assert eng._r_for(b) == 64          # widened past the CPU default
    icap, ccap = eng._caps_for(b)
    assert ccap < 512 and icap < 512    # caps shrunk to the bucket
    pairs = [(i, j) for i in range(12) for j in range(12) if i < j]
    res = eng.run_pairs(pairs, host_workers=0)
    assert sum(not np.isnan(r.ani) for r in res) > 30
    _assert_matches_native(sks, cp, pairs, res)
