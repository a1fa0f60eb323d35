"""Native (C++) core vs NumPy reference path — must be bit-identical.

This is the analog of the reference's AVX2-vs-scalar equivalence test
(reference: tests/tests.rs:130-144), applied to our native kernels.
"""
import numpy as np
import pytest

from conftest import fixture_path
from skani_tpu import (CommandParams, SketchParams, fmh_seeds_np,
                       map_params_from_sketch)
from skani_tpu import db, native
from skani_tpu.ani import chain_seeds_native, chain_seeds_numpy
from skani_tpu.sketch import sketch_file

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_seeder_bit_exact_random():
    rng = np.random.default_rng(42)
    for trial in range(5):
        n = int(rng.integers(50, 5000))
        seq = rng.choice(np.frombuffer(b"ACGTacgtNn", dtype=np.uint8),
                         size=n, p=[.23, .23, .23, .23, .02, .01, .01,
                                    .01, .02, .01])
        p = SketchParams(c=int(rng.integers(2, 50)),
                         marker_c=int(rng.integers(50, 200)))
        a = fmh_seeds_np(seq, p)
        b = native.fmh_seeds_native(seq, p)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_native_seeder_bit_exact_genome():
    p = SketchParams()
    a = sketch_file(fixture_path("o157_plasmid.fasta"), p,
                    seeder=fmh_seeds_np)
    b = sketch_file(fixture_path("o157_plasmid.fasta"), p,
                    seeder=native.fmh_seeds_native)
    assert np.array_equal(a.seed_kmers, b.seed_kmers)
    assert np.array_equal(a.seed_pos, b.seed_pos)
    assert np.array_equal(a.seed_canon, b.seed_canon)
    assert np.array_equal(a.marker_seeds, b.marker_seeds)


@pytest.fixture(scope="module")
def sketches():
    sp = SketchParams()
    _p, o157 = db.read_sketch_file_legacy(
        fixture_path("e.coli-o157.fasta.sketch"))
    w = sketch_file(fixture_path("e.coli-W.fasta.gz"), sp)
    pl = sketch_file(fixture_path("o157_plasmid.fasta"), sp)
    return o157, w, pl


def _assert_same(a, b):
    for f in ("ani", "align_fraction_query", "align_fraction_ref",
              "ci_lower", "ci_upper", "std", "avg_chain_int_len",
              "total_bases_covered", "quant_90_contig_len_q"):
        x, y = getattr(a, f), getattr(b, f)
        if isinstance(x, float) and np.isnan(x) and np.isnan(y):
            continue
        assert x == y, f"{f}: {x} != {y}"


def test_native_pair_pipeline_bit_exact(sketches):
    o157, w, pl = sketches
    cp = CommandParams()
    for r, q in [(o157, w), (w, o157), (o157, pl), (pl, o157), (w, pl),
                 (o157, o157), (pl, pl)]:
        mp = map_params_from_sketch(r, False, cp, None)
        _assert_same(chain_seeds_numpy(r, q, mp),
                     chain_seeds_native(r, q, mp))


def test_native_pair_pipeline_small_genomes_preset(sketches):
    _o157, w, pl = sketches
    sp = SketchParams(c=30, marker_c=200)
    w30 = sketch_file(fixture_path("o157_plasmid.fasta"), sp)
    v30 = sketch_file(fixture_path("viruses.fna"), sp)
    cp = CommandParams(rescue_small=False)
    for r, q in [(w30, v30), (v30, w30), (w30, w30)]:
        mp = map_params_from_sketch(r, False, cp, None)
        _assert_same(chain_seeds_numpy(r, q, mp),
                     chain_seeds_native(r, q, mp))
