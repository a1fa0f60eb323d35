"""Output-format fidelity tests (reference: tests/integration_test.rs
format-related cases)."""
import os
import subprocess
import sys

import pytest

from conftest import fixture_path

REPO = os.path.join(os.path.dirname(__file__), "..")


def run_cli(args, **kw):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run([sys.executable, "-m", "skani_tpu"] + args,
                          capture_output=True, text=True, env=env, **kw)


VIRUS_ARGS = [fixture_path("viruses.fna"), "-i", "--small-genomes"]


def test_short_header_truncates():
    """reference: tests/integration_test.rs:764-890"""
    full = run_cli(["dist", fixture_path("o157_plasmid.fasta"),
                    fixture_path("o157_plasmid.fasta")])
    short = run_cli(["dist", fixture_path("o157_plasmid.fasta"),
                     fixture_path("o157_plasmid.fasta"), "--short-header"])
    row_f = full.stdout.strip().split("\n")[1].split("\t")
    row_s = short.stdout.strip().split("\n")[1].split("\t")
    assert " " in row_f[5]
    assert " " not in row_s[5]
    assert row_f[5].startswith(row_s[5])


def test_triangle_stdout_vs_file_equal(tmp_path):
    """reference: tests/integration_test.rs:570-595"""
    out = str(tmp_path / "m")
    # stdout mode drops a companion skani_matrix.af in the CWD (reference
    # behavior) — run from tmp_path so the repo root stays clean.
    a = run_cli(["triangle"] + VIRUS_ARGS + ["--full-matrix"],
                cwd=str(tmp_path))
    b = run_cli(["triangle"] + VIRUS_ARGS + ["--full-matrix", "-o", out])
    assert a.returncode == 0 and b.returncode == 0
    assert a.stdout.strip() == open(out).read().strip()


def test_triangle_distance_matrix(tmp_path):
    out = str(tmp_path / "m")
    run_cli(["triangle"] + VIRUS_ARGS + ["--full-matrix", "-o", out])
    run_cli(["triangle"] + VIRUS_ARGS + ["--full-matrix", "--distance",
                                         "-o", out + "d"])
    rows_a = [l.split("\t") for l in open(out).read().strip().split("\n")[1:]]
    rows_d = [l.split("\t")
              for l in open(out + "d").read().strip().split("\n")[1:]]
    for ra, rd in zip(rows_a, rows_d):
        for va, vd in zip(ra[1:], rd[1:]):
            assert abs((100.0 - float(va)) - float(vd)) < 1e-9


def test_triangle_diagonal_sparse():
    """reference: tests/int_test_new.rs:89-99 — --diagonal emits 100 self
    rows (integer-formatted, matching the reference's precision quirk)."""
    r = run_cli(["triangle"] + VIRUS_ARGS + ["--sparse", "--diagonal"])
    lines = r.stdout.strip().split("\n")[1:]
    self_rows = [l for l in lines if l.split("\t")[2] == "100"]
    assert len(self_rows) == 3  # one per virus contig


def test_triangle_lower_vs_full_consistent(tmp_path):
    out_l = str(tmp_path / "lower")
    out_f = str(tmp_path / "full")
    run_cli(["triangle"] + VIRUS_ARGS + ["-o", out_l])
    run_cli(["triangle"] + VIRUS_ARGS + ["--full-matrix", "-o", out_f])
    ll = open(out_l).read().strip().split("\n")
    fl = open(out_f).read().strip().split("\n")
    n = int(ll[0])
    assert int(fl[0]) == n
    for i in range(1, n + 1):
        lo = ll[i].split("\t")
        fu = fl[i].split("\t")
        assert lo[0] == fu[0]
        assert lo[1:] == fu[1:len(lo)]
    # full matrix symmetric
    m = [r.split("\t")[1:] for r in fl[1:]]
    for i in range(n):
        for j in range(n):
            assert m[i][j] == m[j][i]


def test_af_matrix_always_full(tmp_path):
    out = str(tmp_path / "m")
    run_cli(["triangle"] + VIRUS_ARGS + ["-o", out])
    af = open(out + ".af").read().strip().split("\n")
    n = int(af[0])
    for row in af[1:]:
        assert len(row.split("\t")) == n + 1


def test_dist_sketch_file_inputs(tmp_path):
    """dist accepts .sketch files as ref/query
    (reference: src/file_io.rs:680-718)."""
    dbdir = str(tmp_path / "db")
    run_cli(["sketch", fixture_path("o157_plasmid.fasta"), "-o", dbdir,
             "--separate-sketches"])
    sk = os.path.join(dbdir, "o157_plasmid.fasta.sketch")
    direct = run_cli(["dist", fixture_path("o157_plasmid.fasta"),
                      fixture_path("o157_plasmid.fasta")])
    via_sketch = run_cli(["dist", sk, sk])
    row_a = direct.stdout.strip().split("\n")[1].split("\t")[2:5]
    row_b = via_sketch.stdout.strip().split("\n")[1].split("\t")[2:5]
    assert row_a == row_b


def test_fastq_multiline_records(tmp_path):
    """Multi-line FASTQ (legal, rare) parses like needletail would
    (reference dep); 4-line records unchanged."""
    import numpy as np

    from skani_tpu import fastx
    p = tmp_path / "ml.fastq"
    p.write_bytes(b"@r1\nACGT\nACGT\n+\nIIII\nIIII\n@r2\nGGGG\n+r2\nIIII\n")
    recs = list(fastx.iter_fastx(str(p)))
    assert recs[0][0] == "r1" and recs[0][1].tobytes() == b"ACGTACGT"
    assert recs[1][0] == "r2" and recs[1][1].tobytes() == b"GGGG"
