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


def test_batched_device_seeder_matches_per_contig():
    """fmh_seeds_tpu_batch must equal fmh_seeds_tpu per contig across
    mixed lengths/buckets (incl. N runs and sub-minimum contigs)."""
    import numpy as np
    from skani_tpu import SketchParams
    from skani_tpu.kernels.seeding_tpu import (fmh_seeds_tpu,
                                               fmh_seeds_tpu_batch)
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    sp = SketchParams(c=40, marker_c=120)
    seqs = [bases[rng.integers(0, 5 if i % 3 == 0 else 4, size=n)]
            for i, n in enumerate([30, 700, 5000, 40000, 70000, 2000])]
    batched = fmh_seeds_tpu_batch(seqs, sp)
    for s, b in zip(seqs, batched):
        a = fmh_seeds_tpu(s, sp)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_batched_sketch_files_match_per_file(tmp_path):
    """fastx_to_sketches through the batched device path == the native
    per-file path, sketch for sketch."""
    import numpy as np
    from skani_tpu import SketchParams
    from skani_tpu.sketch import fastx_to_sketches
    from skani_tpu import native
    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    paths = []
    for i in range(3):
        p = tmp_path / f"g{i}.fa"
        recs = []
        for j in range(1 + i):
            s = bases[rng.integers(0, 4, size=int(rng.integers(400, 9000)))]
            recs.append(b">c%d\n" % j + s.tobytes())
        p.write_bytes(b"\n".join(recs) + b"\n")
        paths.append(str(p))
    sp = SketchParams(c=50, marker_c=150)
    from skani_tpu.kernels.seeding_tpu import fmh_seeds_tpu
    dev = fastx_to_sketches(paths, sp, seeder=fmh_seeds_tpu)
    nat = fastx_to_sketches(paths, sp, seeder=native.fmh_seeds_native)
    assert len(dev) == len(nat)
    for a, b in zip(dev, nat):
        np.testing.assert_array_equal(a.seed_kmers, b.seed_kmers)
        np.testing.assert_array_equal(a.seed_pos, b.seed_pos)
        np.testing.assert_array_equal(a.seed_canon, b.seed_canon)
        np.testing.assert_array_equal(a.seed_contig, b.seed_contig)
        np.testing.assert_array_equal(a.marker_seeds, b.marker_seeds)
        assert a.contigs == b.contigs
