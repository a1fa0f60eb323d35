"""Driver-level equivalence: SKANI_TPU_EXECUTOR=tpu vs the native default.

Runs the real CLI (subprocess) for dist / triangle / search on a mixed set
of related and unrelated genomes and requires BYTE-identical output files —
the framework-level version of the per-pair exactness tests.
"""
import gzip
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
FIX = "/root/reference/test_files"


def _write_mutants(dirname, n=6):
    """Derive n genomes from e.coli-W at 0.5-3% divergence + two unrelated."""
    with gzip.open(os.path.join(FIX, "e.coli-W.fasta.gz"), "rb") as f:
        lines = f.read().splitlines()
    seq = np.frombuffer(b"".join(l for l in lines if not l.startswith(b">")),
                        dtype=np.uint8).copy()
    seq = seq[:600000]  # keep the test fast
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    paths = []
    for i in range(n):
        s = seq.copy()
        nmut = int(len(s) * (0.005 + 0.025 * i / max(n - 1, 1)))
        pos = rng.choice(len(s), size=nmut, replace=False)
        s[pos] = bases[rng.integers(0, 4, size=nmut)]
        p = os.path.join(dirname, f"mut_{i}.fa")
        with open(p, "wb") as f:
            f.write(b">mut_%d\n" % i + s.tobytes() + b"\n")
        paths.append(p)
    for extra in ("o157_plasmid.fasta", "viruses.fna"):
        paths.append(os.path.join(FIX, extra))
    return paths


def _run(args, executor, cwd, extra_env=None):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    if executor:
        env["SKANI_TPU_EXECUTOR"] = executor
    else:
        env.pop("SKANI_TPU_EXECUTOR", None)
    if extra_env:
        env.update(extra_env)
    r = subprocess.run([sys.executable, "-m", "skani_tpu"] + args,
                       capture_output=True, text=True, env=env, cwd=cwd,
                       timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


@pytest.fixture(scope="module")
def genomes(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("genomes"))
    return d, _write_mutants(d)


def _diff(a, b):
    with open(a, "rb") as f1, open(b, "rb") as f2:
        assert f1.read() == f2.read()


def test_dist_executor_equivalence(genomes, tmp_path):
    d, paths = genomes
    out_n = str(tmp_path / "n.tsv")
    out_t = str(tmp_path / "t.tsv")
    args = ["dist", "-q"] + paths[:3] + ["-r"] + paths + ["--ci"]
    _run(args + ["-o", out_n], None, d)
    _run(args + ["-o", out_t], "tpu", d)
    _diff(out_n, out_t)


def test_triangle_executor_equivalence(genomes, tmp_path):
    d, paths = genomes
    out_n = str(tmp_path / "n.tsv")
    out_t = str(tmp_path / "t.tsv")
    args = ["triangle"] + paths + ["--sparse", "--detailed"]
    _run(args + ["-o", out_n], None, d)
    _run(args + ["-o", out_t], "tpu", d)
    _diff(out_n, out_t)


def test_search_executor_equivalence(genomes, tmp_path):
    d, paths = genomes
    db = str(tmp_path / "db")
    _run(["sketch"] + paths + ["-o", db], None, d)
    out_n = str(tmp_path / "n.tsv")
    out_t = str(tmp_path / "t.tsv")
    args = ["search", "-d", db, "-q"] + paths[:3]
    _run(args + ["-o", out_n], None, d)
    _run(args + ["-o", out_t], "tpu", d)
    _diff(out_n, out_t)


def test_search_device_resident_paged(genomes, tmp_path):
    """The upload-once resident search must produce byte-identical output
    when the DB is forced into many HBM pages and queries rotate through
    a tiny reserved-slot window — page iteration and slot reuse are pure
    scheduling."""
    d, paths = genomes
    db = str(tmp_path / "db")
    _run(["sketch"] + paths + ["-o", db], None, d)
    out_n = str(tmp_path / "n.tsv")
    out_p = str(tmp_path / "p.tsv")
    args = ["search", "-d", db, "-q"] + paths[:3]
    _run(args + ["-o", out_n], None, d)
    _run(args + ["-o", out_p], "tpu", d,
         extra_env={"SKANI_TPU_SEARCH_HBM_MB": "1",
                    "SKANI_TPU_SEARCH_QSLOTS": "2"})
    _diff(out_n, out_p)


def test_search_lru_keeps_pages_resident(genomes, tmp_path):
    """Multi-page DB whose pages ALL fit in the HBM budget: the LRU must
    keep them resident across mega-windows, so the page-upload count
    equals the page count even when every query flushes its own window
    (SKANI_TPU_SEARCH_BATCH=1).  Output stays byte-identical."""
    import re
    d, paths = genomes
    db = str(tmp_path / "db")
    _run(["sketch"] + paths + ["-o", db], None, d)
    out_n = str(tmp_path / "n.tsv")
    out_p = str(tmp_path / "p.tsv")
    args = ["search", "-d", db, "-q"] + paths[:3] + ["-v"]
    _run(args + ["-o", out_n], None, d)
    r = _run(args + ["-o", out_p], "tpu", d,
             extra_env={"SKANI_TPU_SEARCH_PAGE_KB": "64",
                        "SKANI_TPU_SEARCH_BATCH": "1",
                        "SKANI_TPU_SEARCH_QSLOTS": "2"})
    _diff(out_n, out_p)
    m = re.search(r"(\d+) page upload\(s\) across (\d+) page\(s\)", r.stderr)
    assert m, r.stderr[-2000:]
    uploads, pages = int(m.group(1)), int(m.group(2))
    assert pages >= 2, r.stderr[-2000:]
    # every touched page uploads exactly once; untouched pages (no query
    # screens into them) never upload — so uploads can be < pages but a
    # single re-upload would push it past the page count
    assert 2 <= uploads <= pages, (uploads, pages)


def test_search_windowed_fallback_equivalence(genomes, tmp_path):
    """SKANI_TPU_SEARCH_RESIDENT=0 forces the windowed executor path —
    still byte-identical."""
    d, paths = genomes
    db = str(tmp_path / "db")
    _run(["sketch"] + paths + ["-o", db], None, d)
    out_n = str(tmp_path / "n.tsv")
    out_w = str(tmp_path / "w.tsv")
    args = ["search", "-d", db, "-q"] + paths[:2]
    _run(args + ["-o", out_n], None, d)
    _run(args + ["-o", out_w], "tpu", d,
         extra_env={"SKANI_TPU_SEARCH_RESIDENT": "0"})
    _diff(out_n, out_w)


def test_dist_qi_ri_executor_equivalence(genomes, tmp_path):
    """Per-contig mode (--qi/--ri): many small sketches through the device
    engine, byte-identical to the native path."""
    d, paths = genomes
    out_n = str(tmp_path / "n.tsv")
    out_t = str(tmp_path / "t.tsv")
    args = ["dist", "-q", paths[-1], "-r", paths[0], paths[-1],
            "--qi", "--ri"]
    _run(args + ["-o", out_n], None, d)
    _run(args + ["-o", out_t], "tpu", d)
    _diff(out_n, out_t)
