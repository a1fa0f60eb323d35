"""End-to-end estimator tests on real genomes (value windows follow the
reference's own tests, reference: tests/tests.rs + tests/integration_test.rs).
"""
import numpy as np
import pytest

from conftest import fixture_path
from skani_tpu import (CommandParams, SketchParams, chain_seeds,
                       map_params_from_sketch)
from skani_tpu import db
from skani_tpu.sketch import sketch_file


def default_cp():
    return CommandParams(min_aligned_frac=0.15, rescue_small=True)


@pytest.fixture(scope="module")
def ecoli_w():
    return sketch_file(fixture_path("e.coli-W.fasta.gz"), SketchParams())


@pytest.fixture(scope="module")
def o157_golden():
    _p, sk = db.read_sketch_file_legacy(fixture_path("e.coli-o157.fasta.sketch"))
    return sk


def test_self_ani_ecoli(ecoli_w):
    """reference: tests/tests.rs:42-60 — self ANI >= 1.0, AF >= .99"""
    mp = map_params_from_sketch(ecoli_w, False, default_cp(), None)
    res = chain_seeds(ecoli_w, ecoli_w, mp)
    assert res.ani >= 1.0
    assert res.align_fraction_query >= 0.99
    assert res.align_fraction_ref >= 0.99


def test_plasmid_vs_o157_genome(o157_golden):
    """reference: tests/tests.rs:63-80 — the o157 plasmid is contained in the
    o157 assembly: ANI >= 1.0, AF_query >= .99, AF_ref >= .005."""
    plasmid = sketch_file(fixture_path("o157_plasmid.fasta"), SketchParams())
    mp = map_params_from_sketch(o157_golden, False, default_cp(), None)
    res = chain_seeds(o157_golden, plasmid, mp)
    assert res.ani >= 1.0
    assert res.align_fraction_query >= 0.99
    assert res.align_fraction_ref >= 0.005


def test_w_vs_o157(ecoli_w, o157_golden):
    """Two E. coli strains: ANI in the high-90s, substantial AF.  Window
    follows the reference's E. coli pair integration asserts
    (reference: tests/integration_test.rs:194-197 uses (99,100), AF>90 for
    EC590/K12; W vs O157 is a more distant pair so we use a wider window)."""
    mp = map_params_from_sketch(o157_golden, False, default_cp(), None)
    res = chain_seeds(o157_golden, ecoli_w, mp)
    assert 96.0 < res.ani * 100 < 100.0
    assert res.align_fraction_query * 100 > 50
    assert res.align_fraction_ref * 100 > 50


def test_w_vs_o157_learned_ani_lowers(ecoli_w, o157_golden):
    """Learned ANI adjusts the estimate (reference: tests/tests.rs:118-126
    asserts learned <= raw on a eukaryote pair; same direction here)."""
    from skani_tpu.gbdt import get_model
    cp = default_cp()
    mp = map_params_from_sketch(o157_golden, False, cp, None)
    raw = chain_seeds(o157_golden, ecoli_w, mp)
    model = get_model(125, True)
    mp2 = map_params_from_sketch(o157_golden, False, cp, model)
    learned = chain_seeds(o157_golden, ecoli_w, mp2)
    assert learned.ani != raw.ani  # model engaged (>=150kb covered, ani>0.9)
    assert abs(learned.ani - raw.ani) < 0.02


def test_ci_bootstrap_deterministic(ecoli_w, o157_golden):
    mp = map_params_from_sketch(o157_golden, False, default_cp(), None)
    r1 = chain_seeds(o157_golden, ecoli_w, mp)
    r2 = chain_seeds(o157_golden, ecoli_w, mp)
    assert r1.ci_lower == r2.ci_lower and r1.ci_upper == r2.ci_upper
    assert r1.ci_lower <= r1.ani <= r1.ci_upper or r1.ci_lower == 0.0


def test_empty_vs_genome(ecoli_w):
    from skani_tpu.sketch import Sketch
    empty = Sketch(file_name="empty", c=125, k=15, marker_c=125)
    mp = map_params_from_sketch(ecoli_w, False, default_cp(), None)
    res = chain_seeds(ecoli_w, empty, mp)
    assert np.isnan(res.ani)
