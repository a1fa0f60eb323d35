"""Streaming driver behavior: triangle's sparse intermediate flush and
search's cross-query executor windows must not change results
(reference: src/triangle.rs:113-138 flush semantics; windowing is a
TPU-build batching layer, exactness required).
"""
import os
import subprocess
import sys

from conftest import fixture_path

REPO = os.path.join(os.path.dirname(__file__), "..")


def _run(args, env_extra=None, cwd=REPO):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(env_extra or {})
    r = subprocess.run([sys.executable, "-m", "skani_tpu"] + args,
                       capture_output=True, text=True, env=env, cwd=cwd,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def test_triangle_sparse_flush_matches_unflushed(tmp_path):
    """Forcing an intermediate flush every row produces the same data rows
    as the single final write (order may differ across flush boundaries,
    as the reference documents)."""
    out_a = tmp_path / "a.tsv"
    out_b = tmp_path / "b.tsv"
    vir = fixture_path("viruses.fna")
    _run(["triangle", vir, "-i", "--sparse", "-o", str(out_a)])
    script = (
        "import skani_tpu.engine as e, skani_tpu.cli as cli, sys\n"
        "e.INTERMEDIATE_WRITE_COUNT = 1\n"
        "sys.argv = ['skani-tpu', 'triangle', %r, '-i', '--sparse', "
        "'-o', %r]\n"
        "cli.main()\n" % (vir, str(out_b)))
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    rows_a = sorted(out_a.read_text().splitlines()[1:])
    lines_b = out_b.read_text().splitlines()
    rows_b = sorted(ln for ln in lines_b[1:] if not ln.startswith("Ref_file"))
    assert rows_a == rows_b and len(rows_a) >= 3


def test_search_window_size_invariant(tmp_path):
    """SKANI_TPU_SEARCH_BATCH=1 (flush after every pair) == default."""
    db_dir = tmp_path / "db"
    _run(["sketch", fixture_path("viruses.fna"),
          fixture_path("o157_plasmid.fasta"), "-i",
          "-o", str(db_dir)])
    outs = []
    for batch in ("1", "4096"):
        out = tmp_path / f"s{batch}.tsv"
        _run(["search", "-d", str(db_dir), fixture_path("viruses.fna"),
              "-o", str(out)],
             env_extra={"SKANI_TPU_SEARCH_BATCH": batch})
        outs.append(sorted(out.read_text().splitlines()))
    assert outs[0] == outs[1] and len(outs[0]) >= 3
