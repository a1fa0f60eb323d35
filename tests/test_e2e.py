"""End-to-end CLI / engine workflow tests (modeled on the reference's
integration tests, reference: tests/integration_test.rs)."""
import io
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import fixture_path

REPO = os.path.join(os.path.dirname(__file__), "..")


def run_cli(args, **kw):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run([sys.executable, "-m", "skani_tpu"] + args,
                          capture_output=True, text=True, env=env, **kw)


def parse_tsv(text):
    lines = [l for l in text.strip().split("\n") if l]
    header = lines[0].split("\t")
    return [dict(zip(header, l.split("\t"))) for l in lines[1:]]


def test_dist_cli_header_only_for_no_hits():
    r = run_cli(["dist", fixture_path("o157_plasmid.fasta"),
                 fixture_path("viruses.fna")])
    assert r.returncode == 0
    rows = parse_tsv(r.stdout)
    assert rows == []


def test_dist_self():
    r = run_cli(["dist", fixture_path("o157_plasmid.fasta"),
                 fixture_path("o157_plasmid.fasta")])
    assert r.returncode == 0
    rows = parse_tsv(r.stdout)
    assert len(rows) == 1
    assert float(rows[0]["ANI"]) == 100.00
    assert float(rows[0]["Align_fraction_ref"]) > 99.0


def test_triangle_individual_sparse_small_genomes():
    r = run_cli(["triangle", fixture_path("viruses.fna"), "-i", "--sparse",
                 "--small-genomes"])
    assert r.returncode == 0
    rows = parse_tsv(r.stdout)
    assert len(rows) >= 3
    anis = {(row["Ref_name"], row["Query_name"]): float(row["ANI"])
            for row in rows}
    # SARS-CoV-2 reference vs variant genome
    assert 99.0 < anis[("NC_045512.2", "OR649331.1")] <= 100.0


def test_small_genomes_equals_explicit_flags():
    """reference: tests/int_test_new.rs:75-81 — --small-genomes ==
    -c 30 -m 200 --faster-small"""
    a = run_cli(["triangle", fixture_path("viruses.fna"), "-i", "--sparse",
                 "--small-genomes"])
    b = run_cli(["triangle", fixture_path("viruses.fna"), "-i", "--sparse",
                 "-c", "30", "-m", "200", "--faster-small"])
    assert a.stdout == b.stdout


def test_sketch_search_roundtrip(tmp_path):
    """reference: tests/integration_test.rs:598-701 — sketch DB then search
    gives identical ANI to direct dist."""
    dbdir = str(tmp_path / "db")
    r = run_cli(["sketch", fixture_path("e.coli-W.fasta.gz"),
                 fixture_path("o157_plasmid.fasta"), "-o", dbdir])
    assert r.returncode == 0, r.stderr
    assert sorted(os.listdir(dbdir)) == ["index.db", "markers.bin",
                                         "sketches.db"]
    s = run_cli(["search", "-d", dbdir, fixture_path("o157_plasmid.fasta")])
    assert s.returncode == 0, s.stderr
    rows = parse_tsv(s.stdout)
    assert len(rows) == 1
    d = run_cli(["dist", fixture_path("o157_plasmid.fasta"),
                 fixture_path("o157_plasmid.fasta")])
    drows = parse_tsv(d.stdout)
    assert abs(float(rows[0]["ANI"]) - float(drows[0]["ANI"])) <= 0.01


def test_sketch_separate_and_consolidated_agree(tmp_path):
    db1 = str(tmp_path / "db1")
    db2 = str(tmp_path / "db2")
    run_cli(["sketch", fixture_path("o157_plasmid.fasta"), "-o", db1])
    run_cli(["sketch", fixture_path("o157_plasmid.fasta"), "-o", db2,
             "--separate-sketches"])
    assert os.path.exists(os.path.join(db2, "o157_plasmid.fasta.sketch"))
    s1 = run_cli(["search", "-d", db1, fixture_path("o157_plasmid.fasta")])
    s2 = run_cli(["search", "-d", db2, fixture_path("o157_plasmid.fasta")])
    assert s1.stdout == s2.stdout


def test_sketch_refuses_existing_dir(tmp_path):
    d = str(tmp_path / "exists")
    os.makedirs(d)
    r = run_cli(["sketch", fixture_path("o157_plasmid.fasta"), "-o", d])
    assert r.returncode != 0


def test_degenerate_inputs_warn_not_crash(tmp_path):
    """reference: tests/int_test_new.rs:135-163"""
    r = run_cli(["dist", fixture_path("empty_fasta.fa"),
                 fixture_path("all_ns.fa")])
    assert r.returncode != 0 or parse_tsv(r.stdout) == []
    r2 = run_cli(["dist", "/does/not/exist.fa",
                  fixture_path("o157_plasmid.fasta")])
    assert "Traceback" not in r2.stderr


def test_triangle_matrix_output(tmp_path):
    out = str(tmp_path / "m.txt")
    r = run_cli(["triangle", fixture_path("viruses.fna"), "-i",
                 "--small-genomes", "-o", out])
    assert r.returncode == 0, r.stderr
    lines = open(out).read().strip().split("\n")
    n = int(lines[0])
    assert len(lines) == n + 1
    af_lines = open(out + ".af").read().strip().split("\n")
    assert int(af_lines[0]) == n
    # AF matrix is always full: every row has n entries
    assert all(len(l.split("\t")) == n + 1 for l in af_lines[1:])


def test_dist_output_file_and_ci(tmp_path):
    out = str(tmp_path / "o.tsv")
    r = run_cli(["dist", fixture_path("o157_plasmid.fasta"),
                 fixture_path("o157_plasmid.fasta"), "--ci", "-o", out])
    assert r.returncode == 0
    rows = parse_tsv(open(out).read())
    assert "ANI_5_percentile" in rows[0]


def test_sketch_qi_search_equals_dist_qi_ri(tmp_path):
    """reference: tests/integration_test.rs:980-1104 — `sketch -i` +
    `search --qi` reports the same (ref contig, query contig) -> ANI map
    as `dist --qi --ri` for every pair passing search's ani > 0.5 keep
    rule (dist keeps ani > 0.1, so it is a superset)."""
    dbdir = str(tmp_path / "dbq")
    r = run_cli(["sketch", fixture_path("viruses.fna"), "-i", "-o", dbdir])
    assert r.returncode == 0, r.stderr
    s = run_cli(["search", "-d", dbdir, fixture_path("viruses.fna"),
                 "--qi"])
    assert s.returncode == 0, s.stderr
    d = run_cli(["dist", fixture_path("viruses.fna"),
                 fixture_path("viruses.fna"), "--qi", "--ri"])
    assert d.returncode == 0, d.stderr
    skey = {(row["Ref_name"], row["Query_name"]):
            (row["ANI"], row["Align_fraction_ref"],
             row["Align_fraction_query"])
            for row in parse_tsv(s.stdout)}
    dkey = {(row["Ref_name"], row["Query_name"]):
            (row["ANI"], row["Align_fraction_ref"],
             row["Align_fraction_query"])
            for row in parse_tsv(d.stdout)}
    assert skey, "search reported nothing"
    for pair, vals in skey.items():
        assert dkey.get(pair) == vals, pair
    # dist-only rows (if any) must all be below search's 50% keep rule
    for pair in set(dkey) - set(skey):
        assert float(dkey[pair][0]) <= 50.0, pair
