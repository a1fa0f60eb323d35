"""Exact-golden pinning against skani v0.3.0's own recorded output.

`/root/reference/test_results_versions/0.3.0` is the reference's release
log: the verbatim stdout of `cargo test` for v0.3.0, including full TSV
result rows.  This suite PARSES that file and asserts this repo
reproduces every row computable from fixtures present in the mount, to
the golden's own 2-decimal precision.

The search section's rows come from (reference: tests/integration_test.rs:60-66)

    skani search -d <db> ./test_files/e.coli-o157.fasta --median -n 5

— note `--median`: the estimator is the 0.499-0.501 quantile trim
(reference: src/chain.rs:428-435) AND learned ANI is disabled
(reference: src/regression.rs:8-10 `!median`).  Reproducing these rows
with the default weighted-mean estimator yields ~98.10 for the W pair
instead of the golden 98.39 — a mode mismatch, not an estimator
deviation (see PARITY.md "v0.3.0 golden rows").

Fixtures present in this mount: e.coli-W.fasta.gz, o157_plasmid.fasta,
and e.coli-o157.fasta.sketch (a genuine skani-produced sketch standing
in for the absent e.coli-o157.fasta; the sketcher is pinned bit-exact
against this artifact in test_sketch.py).  EC590/K12 rows are skipped.
"""
import os
import re

import numpy as np
import pytest

from skani_tpu import db
from skani_tpu.ani import chain_seeds
from skani_tpu.params import CommandParams, SketchParams, map_params_from_sketch
from skani_tpu.sketch import sketch_file

GOLDEN = "/root/reference/test_results_versions/0.3.0"
TEST_FILES = "/root/reference/test_files"


def _parse_search_rows():
    """TSV rows of the 'ANI search test' golden section, and separately
    the 'ANI search test learned' section (identical by construction:
    --median disables the model, so both runs are the same computation)."""
    with open(GOLDEN) as f:
        text = f.read()
    m = re.search(
        r"---- full_test_sketch_and_search stdout ----(.*?)\n\[", text,
        re.DOTALL)
    assert m, "golden search section not found"
    sections = {}
    current = None
    for line in m.group(1).splitlines():
        if line.startswith("ANI search test"):
            current = line.strip()
            sections[current] = []
        elif current and "\t" in line and not line.startswith("Ref_file"):
            parts = line.split("\t")
            sections[current].append({
                "ref": parts[0], "query": parts[1], "ani": float(parts[2]),
                "af_ref": float(parts[3]), "af_query": float(parts[4]),
            })
    return sections


@pytest.fixture(scope="module")
def golden_sections():
    if not os.path.exists(GOLDEN):
        pytest.skip("reference golden log not mounted")
    return _parse_search_rows()


@pytest.fixture(scope="module")
def sketches():
    _p, o157 = db.read_sketch_file_legacy(
        os.path.join(TEST_FILES, "e.coli-o157.fasta.sketch"))
    return {
        "e.coli-o157.fasta": o157,
        "e.coli-W.fasta": sketch_file(
            os.path.join(TEST_FILES, "e.coli-W.fasta.gz"), SketchParams()),
        "o157_plasmid.fasta": sketch_file(
            os.path.join(TEST_FILES, "o157_plasmid.fasta"), SketchParams()),
    }


def _compute_median_search_row(ref_sk, query_sk):
    """One search pair exactly as the golden invocation ran it:
    --median => median estimator, model=None (reference:
    src/regression.rs:8-10, src/search.rs:168-175)."""
    cp = CommandParams(median=True)
    mp = map_params_from_sketch(ref_sk, False, cp, None)
    return chain_seeds(ref_sk, query_sk, mp)


def test_golden_sections_identical(golden_sections):
    # --median disables the learned model, so the 'learned' rerun in the
    # golden log must equal the plain run — a consistency check on our
    # reading of the golden itself.
    plain = golden_sections["ANI search test"]
    learned = golden_sections["ANI search test learned"]
    assert plain == learned and len(plain) == 5


def test_golden_search_rows_reproduced(golden_sections, sketches):
    """Every golden search row whose fixtures exist must match to the
    golden's own 2-decimal precision (ANI, AF_ref, AF_query)."""
    rows = golden_sections["ANI search test"]
    checked = 0
    for row in rows:
        ref_name = os.path.basename(row["ref"])
        ref_sk = sketches.get(ref_name)
        if ref_sk is None:
            continue  # EC590/K12: fixture absent from this mount
        query_sk = sketches[os.path.basename(row["query"])]
        res = _compute_median_search_row(ref_sk, query_sk)
        got = (round(res.ani * 100, 2),
               round(res.align_fraction_ref * 100, 2),
               round(res.align_fraction_query * 100, 2))
        want = (row["ani"], row["af_ref"], row["af_query"])
        assert got == want, f"{ref_name}: got {got}, golden {want}"
        checked += 1
    # plasmid + o157 self + W must all have been verified
    assert checked == 3


def test_w_vs_o157_default_mode_value(sketches):
    """The same W pair under the DEFAULT estimator (weighted mean,
    learned ANI on) — no reference golden exists for this mode, so pin
    this repo's own 4-tier-agreed values as a regression anchor.
    Raw (pre-model) 98.10 was confirmed against a hand-instrumented
    per-chunk walk of reference: src/chain.rs:173-555."""
    from skani_tpu.gbdt import get_model
    w, o157 = sketches["e.coli-W.fasta"], sketches["e.coli-o157.fasta"]
    mp = map_params_from_sketch(w, False, CommandParams(), None)
    raw = chain_seeds(w, o157, mp)
    assert round(raw.ani * 100, 2) == 98.10
    mp = map_params_from_sketch(w, False, CommandParams(), get_model(125, True))
    learned = chain_seeds(w, o157, mp)
    assert round(learned.ani * 100, 2) == 98.05
    for r in (raw, learned):
        assert round(r.align_fraction_ref * 100, 2) == 85.46
        assert round(r.align_fraction_query * 100, 2) == 75.97
