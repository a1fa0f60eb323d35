"""DB reader robustness: truncated / bit-flipped / garbage databases must
fail with a clean CorruptDbError (the reference hard-errors with a clear
message, reference: src/search.rs:92-95, src/file_io.rs:703-709), never an
arbitrary struct/numpy/index exception."""
import os
import sys

import numpy as np
import pytest

from conftest import fixture_path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import skani_tpu as st  # noqa: E402
from skani_tpu import db  # noqa: E402


@pytest.fixture(scope="module")
def small_db(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cdb"))
    params = st.SketchParams()
    sks = [st.sketch_file(fixture_path("o157_plasmid.fasta"), params)]
    from skani_tpu.sketch import sketch_file_individual
    sks += sketch_file_individual(fixture_path("viruses.fna"), params)
    w = db.SketchDbWriter(d)
    for sk in sks:
        w.add_sketch(params, sk)
    w.finalize()
    db.write_markers_bin(os.path.join(d, "markers.bin"), params,
                         [sk.get_markers_only() for sk in sks])
    return d


def _read_everything(d):
    """Full read path over a database directory."""
    params, markers = db.read_markers_bin(os.path.join(d, "markers.bin"))
    r = db.SketchDbReader(d)
    try:
        for i in range(len(r)):
            r.get_sketch(i)
    finally:
        r.close()
    return len(markers)


def test_intact_db_reads(small_db):
    assert _read_everything(small_db) >= 2


@pytest.mark.parametrize("victim", ["markers.bin", "index.db",
                                    "sketches.db"])
def test_truncation_is_clean(small_db, tmp_path, victim):
    import shutil
    d = str(tmp_path / "t")
    shutil.copytree(small_db, d)
    path = os.path.join(d, victim)
    size = os.path.getsize(path)
    for frac in (0.0, 0.1, 0.5, 0.9, 0.99):
        with open(os.path.join(small_db, victim), "rb") as f:
            data = f.read(int(size * frac))
        with open(path, "wb") as f:
            f.write(data)
        try:
            _read_everything(d)
        except db.CorruptDbError:
            pass
        # any other exception type propagates and fails the test


def test_bitflip_fuzz(small_db, tmp_path):
    """One random bit flipped anywhere in any DB file: the read path must
    either still parse (the flip hit payload data) or raise CorruptDbError
    — never leak a low-level exception."""
    import shutil
    d = str(tmp_path / "f")
    shutil.copytree(small_db, d)
    rng = np.random.default_rng(7)
    files = ["markers.bin", "index.db", "sketches.db"]
    originals = {}
    for name in files:
        with open(os.path.join(small_db, name), "rb") as f:
            originals[name] = bytearray(f.read())
    n_corrupt = 0
    for _ in range(120):
        name = files[int(rng.integers(len(files)))]
        data = bytearray(originals[name])
        bit = int(rng.integers(len(data) * 8))
        data[bit // 8] ^= 1 << (bit % 8)
        with open(os.path.join(d, name), "wb") as f:
            f.write(bytes(data))
        try:
            _read_everything(d)
        except db.CorruptDbError:
            n_corrupt += 1
        finally:
            with open(os.path.join(d, name), "wb") as f:
                f.write(bytes(originals[name]))
    # sanity: the fuzz actually exercises the failure path sometimes
    assert n_corrupt > 0


def test_garbage_sketch_file(tmp_path):
    p = str(tmp_path / "junk.sketch")
    with open(p, "wb") as f:
        f.write(np.random.default_rng(0).integers(
            0, 255, 4096, dtype=np.uint8).tobytes())
    with pytest.raises(db.CorruptDbError):
        db.read_sketch_file(p)
    with pytest.raises(db.CorruptDbError):
        db.sketches_from_sketch([p])
    # a fasta is not a sketch either
    with pytest.raises(db.CorruptDbError):
        db.read_sketch_file(fixture_path("o157_plasmid.fasta"))


def test_search_cli_hard_error(small_db, tmp_path):
    """Corrupt markers.bin through the CLI: clean error + nonzero exit,
    no traceback (reference: src/search.rs:92-95 hard exit)."""
    import shutil
    import subprocess
    d = str(tmp_path / "cli")
    shutil.copytree(small_db, d)
    path = os.path.join(d, "markers.bin")
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.truncate(size // 2)
    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ, PYTHONPATH=repo)
    r = subprocess.run(
        [sys.executable, "-m", "skani_tpu", "search", "-d", d,
         fixture_path("o157_plasmid.fasta")],
        capture_output=True, text=True, env=env)
    assert r.returncode != 0
    assert "Traceback" not in r.stderr
    assert "corrupt" in r.stderr.lower() or "truncat" in r.stderr.lower()
