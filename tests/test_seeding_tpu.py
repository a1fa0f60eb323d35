"""Device (jnp/XLA) seeding kernel vs the NumPy scalar spec.

The analog of skani's AVX2-vs-scalar sketch equivalence test
(reference: tests/tests.rs:130-144): the batched device sketcher must
produce bit-identical seeds, positions, canonical flags, and markers.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skani_tpu.kernels.seeding_tpu import fmh_seeds_tpu
from skani_tpu.params import SketchParams
from skani_tpu.sketch import fmh_seeds_np, sketch_file


def _assert_same(a, b):
    for x, y, nm in zip(a, b, ("kmers", "pos", "canon", "markers")):
        np.testing.assert_array_equal(x, y, err_msg=nm)


def test_device_seeder_matches_numpy_random():
    rng = np.random.default_rng(11)
    params = SketchParams()
    alphabet = np.frombuffer(b"ACGTacgtNn", dtype=np.uint8)
    for L in (41, 42, 100, 4097, 70000):
        seq = rng.choice(alphabet, size=L)
        _assert_same(fmh_seeds_np(seq, params), fmh_seeds_tpu(seq, params))


def test_device_seeder_all_ns():
    """All-N input yields zero seeds (reference: tests/tests.rs:149-157)."""
    params = SketchParams()
    seq = np.full(10000, ord("N"), dtype=np.uint8)
    km, po, ca, ma = fmh_seeds_tpu(seq, params)
    assert len(km) == 0 and len(ma) == 0


def test_device_seeder_through_sketch_file():
    params = SketchParams()
    path = "/root/reference/test_files/o157_plasmid.fasta"
    ref = sketch_file(path, params)
    dev = sketch_file(path, params, seeder=fmh_seeds_tpu)
    np.testing.assert_array_equal(ref.seed_kmers, dev.seed_kmers)
    np.testing.assert_array_equal(ref.seed_pos, dev.seed_pos)
    np.testing.assert_array_equal(ref.seed_canon, dev.seed_canon)
    np.testing.assert_array_equal(ref.marker_seeds, dev.marker_seeds)
