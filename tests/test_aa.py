"""AAI (amino-acid) path tests. The reference marks AAI unstable
(reference: src/cli.rs:77), so value windows are loose."""
import numpy as np
import pytest

from conftest import fixture_path
from skani_tpu import (CommandParams, SketchParams, chain_seeds,
                       map_params_from_sketch)
from skani_tpu.aa import fmh_seeds_aa_np, get_orfs_np
from skani_tpu.params import DEFAULT_C_AAI, DEFAULT_K_AAI
from skani_tpu.sketch import sketch_file


def aa_params():
    return SketchParams(c=DEFAULT_C_AAI, k=DEFAULT_K_AAI, use_aa=True)


def test_orf_detection_basic():
    rng = np.random.default_rng(3)
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=3000)
    orfs = get_orfs_np(seq, aa_params())
    assert len(orfs) > 0
    for s, e, p in orfs:
        assert 0 <= s < e < len(seq)
        assert 0 <= p < 6
    # sorted by descending length
    lens = [e - s for s, e, _ in orfs]
    assert lens == sorted(lens, reverse=True)


def test_aa_seeds_nonempty_and_bounded():
    rng = np.random.default_rng(4)
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=20000)
    km, po, ca, ma = fmh_seeds_aa_np(seq, aa_params())
    assert len(km) > 0
    assert po.max() < len(seq)
    # 6-AA kmers fit in 30 bits
    assert int(km.max()) < 1 << 30


def test_self_aai():
    sp = aa_params()
    cp = CommandParams(min_aligned_frac=-1.0)
    pl = sketch_file(fixture_path("o157_plasmid.fasta"), sp)
    mp = map_params_from_sketch(pl, True, cp, None)
    r = chain_seeds(pl, pl, mp)
    assert r.ani >= 0.999
    assert r.align_fraction_query >= 0.99


def test_aai_native_equals_numpy():
    from skani_tpu.ani import chain_seeds_native, chain_seeds_numpy
    from skani_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    sp = aa_params()
    cp = CommandParams(min_aligned_frac=-1.0)
    pl = sketch_file(fixture_path("o157_plasmid.fasta"), sp)
    v = sketch_file(fixture_path("viruses.fna"), sp)
    for r_sk, q_sk in [(pl, v), (v, pl), (pl, pl)]:
        mp = map_params_from_sketch(r_sk, True, cp, None)
        a = chain_seeds_numpy(r_sk, q_sk, mp)
        b = chain_seeds_native(r_sk, q_sk, mp)
        if np.isnan(a.ani):
            assert np.isnan(b.ani)
        else:
            assert a.ani == b.ani
            assert a.align_fraction_query == b.align_fraction_query
