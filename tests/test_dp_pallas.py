"""Pallas chaining-DP kernel vs the lax.scan reference implementation.

The analog of skani's AVX2-vs-scalar seeding equivalence test
(reference: tests/tests.rs:130-144): every acceleration path must produce
bit-identical output.  The Pallas kernel runs in interpreter mode here
(no TPU in CI); on hardware the same kernel is selected by phase_a.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from skani_tpu.kernels.dp_pallas import (_dp_pallas, _dp_pallas_packed,
                                         _dp_scan, _dp_scan_packed, dbits)


def _random_rows(rng, L, RC, n_contigs=2, p_valid=0.85):
    qp = np.sort(rng.integers(0, 6000, (L, RC)), axis=0).astype(np.int32)
    rp = rng.integers(0, 6000, (L, RC)).astype(np.int32)
    rc = rng.integers(0, n_contigs, (L, RC)).astype(np.int32)
    rev = rng.integers(0, 2, (L, RC)).astype(np.int32)
    val = (rng.random((L, RC)) < p_valid).astype(np.int32)
    # invalid slots look like padding (I32MAX positions)
    I32MAX = np.int32(2 ** 31 - 1)
    qp = np.where(val == 1, qp, I32MAX)
    rp = np.where(val == 1, rp, I32MAX)
    rcv = np.where(val == 1, rc * 4 + rev * 2 + 1, 0).astype(np.int32)
    return qp, rp, rcv


@pytest.mark.parametrize("band,pcl,max_gap,L,RC", [
    (20, 2500, 300, 64, 256),
    (5, 100, 50, 64, 256),
    # bands above 32 exercise the band-sized ring buffer (slow preset:
    # 2500//30 = 83, medium: 2500//70 = 35); L > band so predecessors
    # near the full band depth are reachable
    (35, 2500, 300, 48, 128),
    (83, 2500, 300, 96, 128),
])
def test_pallas_dp_matches_scan(band, pcl, max_gap, L, RC):
    rng = np.random.default_rng(42)
    qp, rp, rcv = _random_rows(rng, L, RC)
    dd_s, root_s = _dp_scan(qp, rp, rcv, band, pcl, max_gap, 20, unroll=8)
    dd_p, root_p = _dp_pallas(qp, rp, rcv, band, pcl, max_gap, 20,
                              rc_block=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(dd_s), np.asarray(dd_p))
    np.testing.assert_array_equal(np.asarray(root_s), np.asarray(root_p))


def _pack_inputs(qp, rp, rcv):
    """(qp, rp, rcv) -> (qprv, rprc) packed layout; rcv = rc*4+rev*2+valid.
    Invalid slots become all-zero words (valid bit 0)."""
    valid = (rcv & 1) == 1
    rev = (rcv >> 1) & 1
    rc = rcv >> 2
    qprv = np.where(valid, qp * 4 + rev * 2 + 1, 0).astype(np.int32)
    rprc = np.where(valid, (rc << 25) | rp, 0).astype(np.int32)
    return qprv, rprc


def test_packed_dp_matches_unpacked():
    """The packed two-word DP must agree with the reference scan exactly
    (same scores/depths/roots) on multi-contig, mixed-orientation rows."""
    rng = np.random.default_rng(7)
    L, RC = 64, 256
    band, pcl, max_gap = 20, 2500, 300
    qp, rp, rcv = _random_rows(rng, L, RC, n_contigs=3)
    dd_s, root_s = _dp_scan(qp, rp, rcv, band, pcl, max_gap, 20, unroll=8)
    EBITS = int(np.ceil(np.log2(L)))
    ddr = np.asarray(_dp_scan_packed(*_pack_inputs(qp, rp, rcv), band, pcl,
                                     max_gap, 20, EBITS, unroll=8))
    DBITS = dbits(L)
    np.testing.assert_array_equal(
        np.asarray(dd_s) >> DBITS,
        (ddr >> (2 * EBITS)) & ((1 << (32 - 2 * EBITS)) - 1))
    np.testing.assert_array_equal(np.asarray(dd_s) & ((1 << DBITS) - 1),
                                  (ddr >> EBITS) & ((1 << EBITS) - 1))
    np.testing.assert_array_equal(np.asarray(root_s),
                                  ddr & ((1 << EBITS) - 1))


def test_packed_pallas_matches_packed_scan():
    rng = np.random.default_rng(11)
    L, RC = 48, 128
    band, pcl, max_gap = 20, 2500, 300
    qp, rp, rcv = _random_rows(rng, L, RC, n_contigs=3)
    qprv, rprc = _pack_inputs(qp, rp, rcv)
    EBITS = int(np.ceil(np.log2(L)))
    ddr_s = _dp_scan_packed(qprv, rprc, band, pcl, max_gap, 20, EBITS,
                            unroll=8)
    ddr_p = _dp_pallas_packed(qprv, rprc, band, pcl, max_gap, 20, EBITS,
                              rc_block=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(ddr_s), np.asarray(ddr_p))


@pytest.mark.parametrize("RC", [384, 320, 96])
def test_pallas_dp_odd_lane_counts(RC):
    """Constructor-driven shapes yield RC = R*C_CAP values that are not
    multiples of 256 (the round-2 TPU-suite failure: batch=3, c_cap=128 ->
    RC=384); the kernel must pick a dividing block or pad lanes."""
    rng = np.random.default_rng(3)
    L, band, pcl, max_gap = 32, 20, 2500, 300
    qp, rp, rcv = _random_rows(rng, L, RC)
    dd_s, root_s = _dp_scan(qp, rp, rcv, band, pcl, max_gap, 20, unroll=8)
    dd_p, root_p = _dp_pallas(qp, rp, rcv, band, pcl, max_gap, 20,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(dd_s), np.asarray(dd_p))
    np.testing.assert_array_equal(np.asarray(root_s), np.asarray(root_p))
    qprv, rprc = _pack_inputs(qp, rp, rcv)
    EBITS = int(np.ceil(np.log2(L)))
    ddr_s = _dp_scan_packed(qprv, rprc, band, pcl, max_gap, 20, EBITS,
                            unroll=8)
    ddr_p = _dp_pallas_packed(qprv, rprc, band, pcl, max_gap, 20, EBITS,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(ddr_s), np.asarray(ddr_p))


def test_scan_dp_chains_elementary():
    """Three colinear anchors chain with score 2*anchor_score and the root
    column propagates (reference: src/chain.rs:557-603 scoring)."""
    L, RC = 8, 128
    I32MAX = np.int32(2 ** 31 - 1)
    qp = np.full((L, RC), I32MAX, np.int32)
    rp = np.full((L, RC), I32MAX, np.int32)
    rcv = np.zeros((L, RC), np.int32)
    qp[:3, 0] = [100, 200, 300]
    rp[:3, 0] = [1100, 1200, 1300]
    rcv[:3, 0] = 1  # contig 0, forward, valid
    dd, root = _dp_scan(qp, rp, rcv, 20, 2500, 300, 20, unroll=8)
    dd = np.asarray(dd)
    root = np.asarray(root)
    DBITS = 4  # ceil(log2(8+1))
    assert dd[1, 0] >> DBITS == 20 and dd[2, 0] >> DBITS == 40
    assert (dd[1, 0] & 15, dd[2, 0] & 15) == (1, 2)  # depths
    assert root[0, 0] == 0 and root[1, 0] == 0 and root[2, 0] == 0
