"""Estimator modes (--robust/--median/--both-min-af/--ci) + frozen goldens.

The golden values freeze this build's outputs for the fixture pair
(o157 golden sketch vs E. coli W at default c=125/k=15) — any estimator
change that shifts them is a compatibility break.
"""
import numpy as np
import pytest

from conftest import fixture_path
from skani_tpu import (CommandParams, SketchParams, chain_seeds,
                       map_params_from_sketch)
from skani_tpu import db
from skani_tpu.sketch import sketch_file


@pytest.fixture(scope="module")
def pair():
    _p, o157 = db.read_sketch_file_legacy(
        fixture_path("e.coli-o157.fasta.sketch"))
    w = sketch_file(fixture_path("e.coli-W.fasta.gz"), SketchParams())
    return o157, w


def run(pair, **cp_kw):
    o157, w = pair
    cp = CommandParams(**cp_kw)
    mp = map_params_from_sketch(o157, False, cp, None)
    return chain_seeds(o157, w, mp)


def test_frozen_golden_default(pair):
    r = run(pair)
    assert round(r.ani * 100, 4) == 98.0958
    assert round(r.align_fraction_query * 100, 2) == 85.46
    assert round(r.align_fraction_ref * 100, 2) == 75.97
    assert round(r.ci_lower * 100, 2) == 97.97
    assert round(r.ci_upper * 100, 2) == 98.20


def test_robust_and_median_modes(pair):
    base = run(pair)
    robust = run(pair, robust=True)
    median = run(pair, median=True)
    # different trimming -> different (but close) estimates
    assert abs(robust.ani - base.ani) < 0.01
    assert abs(median.ani - base.ani) < 0.01
    assert len({base.ani, robust.ani, median.ani}) >= 2


def test_both_min_af_gating(pair):
    # AF_q=85.5, AF_r=76.0: both pass 50, both fail 90
    ok = run(pair, both_min_aligned_frac=0.50)
    assert ok.ani > 0
    filtered = run(pair, both_min_aligned_frac=0.90)
    assert filtered.ani == -1.0


def test_min_af_one_sided_gating(pair):
    # default rule: nulled only when BOTH sides below min-af
    r = run(pair, min_aligned_frac=0.80)  # q passes (85), r fails (76)
    assert r.ani > 0
    r2 = run(pair, min_aligned_frac=0.90)  # both fail
    assert r2.ani == -1.0


def test_symmetric_pair_same_ani(pair):
    """switch_qr picks a canonical orientation, so (A,B) and (B,A) agree on
    ANI; AFs swap roles by genome length, not argument order."""
    o157, w = pair
    cp = CommandParams()
    a = chain_seeds(o157, w, map_params_from_sketch(o157, False, cp, None))
    b = chain_seeds(w, o157, map_params_from_sketch(w, False, cp, None))
    assert a.ani == b.ani
    assert a.align_fraction_query == b.align_fraction_ref
    assert a.align_fraction_ref == b.align_fraction_query


def test_learned_ani_golden(pair):
    from skani_tpu.gbdt import get_model
    o157, w = pair
    cp = CommandParams()
    mp = map_params_from_sketch(o157, False, cp, get_model(125, True))
    r = chain_seeds(o157, w, mp)
    assert round(r.ani * 100, 4) == 98.0470
