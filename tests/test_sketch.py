"""Sketcher tests, including bit-exact validation against a genuine
skani-produced artifact (test_files/e.coli-o157.fasta.sketch, whose contig 1
is exactly test_files/o157_plasmid.fasta)."""
import numpy as np
import pytest

from conftest import fixture_path
from skani_tpu import SketchParams, db, fmh_seeds_np
from skani_tpu.sketch import sketch_file


def flat_seeds(sk, contig=None):
    k = np.repeat(sk.seed_kmers, np.diff(sk.seed_starts))
    sel = np.ones(len(k), dtype=bool) if contig is None \
        else sk.seed_contig == contig
    return sorted(zip(k[sel].tolist(), sk.seed_pos[sel].tolist(),
                      sk.seed_canon[sel].tolist()))


def test_all_ns_no_seeds():
    """reference: tests/tests.rs:149-157"""
    seq = np.frombuffer(b"N" * 155 + b"n", dtype=np.uint8)
    params = SketchParams(c=30)
    km, po, ca, ma = fmh_seeds_np(seq, params)
    assert len(km) == 0


def test_short_contig_no_seeds():
    seq = np.frombuffer(b"ACGT" * 10, dtype=np.uint8)  # < 2*21
    km, po, ca, ma = fmh_seeds_np(seq, SketchParams())
    assert len(km) == 0


def test_n_masking_resume():
    """Positions within k of an N (at index >= 20) are suppressed."""
    rng = np.random.default_rng(1)
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=2000)
    seq2 = seq.copy()
    seq2[1000] = ord("N")
    p = SketchParams(c=5)
    km1, po1, _, _ = fmh_seeds_np(seq, p)
    km2, po2, _, _ = fmh_seeds_np(seq2, p)
    # all positions within [1000, 1000+15) of the N must be gone
    assert not np.any((po2 >= 1000) & (po2 < 1015))


def test_golden_sketch_bit_exact_plasmid():
    """Our sketcher must reproduce skani's exact seeds for the o157 plasmid
    (golden fixture from the reference repo)."""
    _p, gold = db.read_sketch_file_legacy(
        fixture_path("e.coli-o157.fasta.sketch"))
    mine = sketch_file(fixture_path("o157_plasmid.fasta"), SketchParams())
    assert mine.total_sequence_length == int(gold.contig_lengths[1])
    g = flat_seeds(gold, contig=1)
    # golden positions are per-contig already
    m = flat_seeds(mine)
    assert len(m) == len(g) == 759
    assert m == g
    assert np.isin(mine.marker_seeds, gold.marker_seeds).all()


def test_golden_sketch_hash_thresholds():
    """Every seed k-mer in the skani-produced sketch passes our hash filter —
    cross-validates mm_hash64 + FracMinHash threshold semantics."""
    from skani_tpu.hashing import mm_hash64
    p, gold = db.read_sketch_file_legacy(
        fixture_path("e.coli-o157.fasta.sketch"))
    h = mm_hash64(gold.seed_kmers.astype(np.uint64))
    assert bool((h < np.uint64((2 ** 64 - 1) // p.c)).all())


def test_sketch_roundtrip_v03_format():
    mine = sketch_file(fixture_path("o157_plasmid.fasta"), SketchParams())
    p = SketchParams()
    blob = db.serialize_sketch(p, mine)
    r = db._Reader(blob)
    p2 = db._read_sketch_params(r)
    sk2 = db._read_sketch(r)
    assert p2 == p
    assert flat_seeds(mine) == flat_seeds(sk2)
    assert np.array_equal(mine.marker_seeds, sk2.marker_seeds)
    assert mine.contigs == sk2.contigs
    assert np.array_equal(mine.contig_lengths, sk2.contig_lengths)


def test_link_probe_disk_cache(tmp_path, monkeypatch):
    """The accelerator link-speed probe persists its verdict on disk:
    the probe costs a device claim + first-touch (minutes on a
    contended tunneled pool), so a fresh process must read the cached
    verdict instead of re-paying it (round-5 fix: the CLI triangle
    spent 69 s of 73 s re-probing a link it had already measured)."""
    import json
    import time

    import skani_tpu.sketch as sk
    from skani_tpu import engine

    monkeypatch.setenv("SKANI_TPU_CACHE_DIR", str(tmp_path))

    # 1. no accelerator -> False, fast, and no cache write (no probe paid)
    monkeypatch.setattr(sk, "_LINK_FAST", None)
    monkeypatch.setattr(engine, "_accelerator_present", lambda: False)
    assert sk._accelerator_link_is_fast() is False
    assert not (tmp_path / "link_probe.json").exists()

    # 2. a cached verdict is honored without touching the accelerator
    (tmp_path / "link_probe.json").write_text(json.dumps(
        {"key": sk._link_probe_key(), "fast": True, "ts": time.time()}))
    monkeypatch.setattr(sk, "_LINK_FAST", None)

    def boom():
        raise AssertionError("probe ran despite fresh cache")

    monkeypatch.setattr(engine, "_accelerator_present", boom)
    assert sk._accelerator_link_is_fast() is True

    # 3. a stale or mismatched-endpoint entry is ignored
    (tmp_path / "link_probe.json").write_text(json.dumps(
        {"key": "elsewhere", "fast": True, "ts": time.time()}))
    monkeypatch.setattr(sk, "_LINK_FAST", None)
    monkeypatch.setattr(engine, "_accelerator_present", lambda: False)
    assert sk._accelerator_link_is_fast() is False
