"""Device pair engine vs the native host path: bit-exactness across modes.

Runs on CPU (the lax.scan DP fallback); the Pallas kernel is covered by
test_dp_pallas.py in interpret mode and has its own scan-equivalence
contract.  Fixtures are the small genomes (plasmid + viruses) so the padded
device shapes stay modest.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skani_tpu import CommandParams, SketchParams
from skani_tpu.ani import chain_seeds_native
from skani_tpu.kernels.device_pipeline import DevicePairEngine
from skani_tpu.params import map_params_from_sketch
from skani_tpu.sketch import sketch_file

FILES = ["/root/reference/test_files/o157_plasmid.fasta",
         "/root/reference/test_files/viruses.fna"]


def _check(sketches, sp, cp, use_aa=False):
    eng = DevicePairEngine(sketches, sp, cp)
    n = len(sketches)
    pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
    res = eng.run_pairs(pairs)
    for (i, j), a in zip(pairs, res):
        mp = map_params_from_sketch(sketches[i], use_aa, cp, None)
        b = chain_seeds_native(sketches[i], sketches[j], mp)
        if np.isnan(a.ani) and np.isnan(b.ani):
            continue
        assert a.ani == b.ani, (i, j, a.ani, b.ani)
        assert a.align_fraction_query == b.align_fraction_query
        assert a.align_fraction_ref == b.align_fraction_ref
        assert a.ci_lower == b.ci_lower and a.ci_upper == b.ci_upper


def test_device_engine_default_params():
    sp = SketchParams()
    sks = [s for s in (sketch_file(f, sp) for f in FILES) if s is not None]
    _check(sks, sp, CommandParams())


def test_device_engine_slow_preset():
    """c=30 changes the repeat band (2500/c) and anchor densities."""
    sp = SketchParams(c=30, marker_c=200)
    sks = [s for s in (sketch_file(f, sp) for f in FILES) if s is not None]
    _check(sks, sp, CommandParams())


def test_device_engine_aai_mode():
    """Amino-acid mode: 6-frame ORFs, k=6/c=15, different chunking."""
    sp = SketchParams(use_aa=True, c=15, k=6, marker_c=1000)
    sks = [s for s in (sketch_file(f, sp) for f in FILES) if s is not None]
    _check(sks, sp, CommandParams(), use_aa=True)


def test_device_engine_mirrors_ordered_duplicates():
    """(i, j) and (j, i) produce exact field-swapped copies."""
    sp = SketchParams()
    sks = [s for s in (sketch_file(f, sp) for f in FILES) if s is not None]
    eng = DevicePairEngine(sks, sp, CommandParams())
    res = eng.run_pairs([(0, 0), (0, 1), (1, 0)])
    a, b = res[1], res[2]
    assert (a.ani == b.ani) or (np.isnan(a.ani) and np.isnan(b.ani))
    assert a.align_fraction_query == b.align_fraction_ref
    assert a.align_fraction_ref == b.align_fraction_query
    assert a.ref_file == b.query_file and a.query_file == b.ref_file
    self_r = res[0]
    assert self_r.ani == 1.0


def test_device_engine_hybrid_stealing_with_model():
    """Host workers steal pairs from the device queue; results must be
    byte-identical to the pure paths, including GBDT-debias application."""
    import gzip
    from skani_tpu import gbdt
    from skani_tpu.sketch import Sketch, _finalize_sketch, default_seeder

    with gzip.open("/root/reference/test_files/e.coli-W.fasta.gz") as f:
        lines = f.read().splitlines()
    seq = np.frombuffer(b"".join(l for l in lines if not l.startswith(b">")),
                        dtype=np.uint8)[:600000].copy()
    rng = np.random.default_rng(2)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    sp = SketchParams()
    sks = []
    seeder = default_seeder()
    for i in range(6):
        s = seq.copy()
        nmut = int(len(s) * 0.01 * (1 + i))
        pos = rng.choice(len(s), size=nmut, replace=False)
        s[pos] = bases[rng.integers(0, 4, size=nmut)]
        sk = Sketch(file_name=f"m{i}", marker_c=sp.c, c=sp.c, k=sp.k)
        sk.contigs = [f"m{i}"]
        sk.contig_lengths = np.array([len(s)], dtype=np.uint32)
        sk.total_sequence_length = len(s)
        km, po, ca, ma = seeder(s, sp)
        _finalize_sketch(sk, [km], [po], [ca],
                         [np.zeros(len(km), dtype=np.uint32)], [ma])
        sks.append(sk)
    model = gbdt.get_model(sp.c, True)
    cp = CommandParams()
    pairs = [(i, j) for i in range(6) for j in range(6) if i != j]
    eng = DevicePairEngine(sks, sp, cp, model=model, batch=4)
    res = eng.run_pairs(pairs, host_workers=2)
    for (i, j), a in zip(pairs, res):
        mp = map_params_from_sketch(sks[i], False, cp, model)
        b = chain_seeds_native(sks[i], sks[j], mp)
        assert a.ani == b.ani, (i, j, a.ani, b.ani)
        assert a.ci_lower == b.ci_lower and a.ci_upper == b.ci_upper


def test_dense_join_matches_merge_join():
    """The dense global-axis join and the sorted-merge join are exact
    equivalents (SKANI_TPU_DENSE_JOIN_MB=0 disables the dense tables)."""
    import os

    import numpy as np

    from skani_tpu import CommandParams, SketchParams, map_params_from_sketch
    from skani_tpu.ani import chain_seeds_native
    from skani_tpu.kernels.device_pipeline import DevicePairEngine
    from skani_tpu.sketch import sketch_file, sketch_file_individual

    sp = SketchParams(c=30, marker_c=200)
    cp = CommandParams()
    sk = sketch_file_individual(
        "/root/reference/test_files/viruses.fna", sp)
    sk += [sketch_file("/root/reference/test_files/o157_plasmid.fasta", sp)]
    pairs = [(i, j) for i in range(len(sk)) for j in range(len(sk))
             if i != j]
    old = os.environ.pop("SKANI_TPU_DENSE_JOIN_MB", None)
    old_join = os.environ.pop("SKANI_TPU_JOIN", None)
    try:
        # pin the POSITION-axis dense join (the TPU default is the
        # kmer-axis dense join since the windowed sorted gather landed)
        os.environ["SKANI_TPU_JOIN"] = "dense_pos"
        eng_d = DevicePairEngine(sk, sp, cp, batch=4, i_cap=128, c_cap=64,
                                 l_cap=512)
        os.environ.pop("SKANI_TPU_JOIN", None)
        assert eng_d.join_mode == "dense_pos"
        res_d = eng_d.run_pairs(pairs, host_workers=0)
        # global-KMER-axis dense join (the dense_pos fallback when the
        # repeat band differs from the baked gidp band)
        eng_k = DevicePairEngine(sk, sp, cp, batch=4, i_cap=128, c_cap=64,
                                 l_cap=512)
        eng_k.join_mode = "dense"
        res_k = eng_k.run_pairs(pairs, host_workers=0)
        os.environ["SKANI_TPU_DENSE_JOIN_MB"] = "0"
        eng_m = DevicePairEngine(sk, sp, cp, batch=4, i_cap=128, c_cap=64,
                                 l_cap=512)
        assert eng_m.join_mode == "merge"
        res_m = eng_m.run_pairs(pairs, host_workers=0)
    finally:
        os.environ.pop("SKANI_TPU_DENSE_JOIN_MB", None)
        os.environ.pop("SKANI_TPU_JOIN", None)
        if old is not None:
            os.environ["SKANI_TPU_DENSE_JOIN_MB"] = old
        if old_join is not None:
            os.environ["SKANI_TPU_JOIN"] = old_join
    for (i, j), a, b, c in zip(pairs, res_d, res_m, res_k):
        native = chain_seeds_native(
            sk[i], sk[j], map_params_from_sketch(sk[i], False, cp, None))
        for r in (a, b, c):
            assert (np.isnan(r.ani) and np.isnan(native.ani)) \
                or (r.ani == native.ani
                    and r.ci_lower == native.ci_lower), (i, j)


def test_device_engine_merged_readback(monkeypatch):
    """SKANI_TPU_MERGE_READ=K fetches K in-flight batches with one
    device-side concat + single readback; the host-side split must
    reproduce the per-batch results bit-for-bit (pure transfer
    scheduling, no numeric effect)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import test_device_fuzz as fz

    rng = np.random.default_rng(20260817)
    sp = SketchParams()
    base = fz.BASES[rng.integers(0, 4, size=80_000)]
    sks = [fz._mk_sketch(
        fz._rand_genome(rng, 80_000, 2, src=None if g == 0 else base),
        sp, f"m{g}") for g in range(4)]
    pairs = [(i, j) for i in range(4) for j in range(4) if i < j]
    cp = CommandParams()

    monkeypatch.delenv("SKANI_TPU_MERGE_READ", raising=False)
    base_res = DevicePairEngine(sks, sp, cp, batch=2, i_cap=256,
                                c_cap=64).run_pairs(pairs, host_workers=0)
    monkeypatch.setenv("SKANI_TPU_MERGE_READ", "3")
    merged = DevicePairEngine(sks, sp, cp, batch=2, i_cap=256,
                              c_cap=64).run_pairs(pairs, host_workers=0)
    # merged pair-index UPLOAD on top of merged readback: one (K, 2, R)
    # device_put per K batches, each dispatch slicing its row on device —
    # again pure transfer scheduling, bit-identical results required
    monkeypatch.setenv("SKANI_TPU_MERGE_PUT", "3")
    merged_put = DevicePairEngine(sks, sp, cp, batch=2, i_cap=256,
                                  c_cap=64).run_pairs(pairs, host_workers=0)
    monkeypatch.delenv("SKANI_TPU_MERGE_PUT", raising=False)
    for (i, j), a, b, c in zip(pairs, base_res, merged, merged_put):
        for r in (b, c):
            assert (np.isnan(a.ani) and np.isnan(r.ani)) or (
                a.ani == r.ani
                and a.align_fraction_query == r.align_fraction_query
                and a.align_fraction_ref == r.align_fraction_ref
                and a.ci_lower == r.ci_lower
                and a.ci_upper == r.ci_upper), (i, j)
