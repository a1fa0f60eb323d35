"""Multi-host pair fleet: 2 jax.distributed processes x 4 virtual CPU
devices — the CPU analog of a 2-host TPU slice (SURVEY §4: the multi-host
test mode skani lacks).  Both processes must return the SAME full result
list, equal to the single-process native path.
"""
import os
import socket
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

WORKER = r"""
import sys
sys.path.insert(0, %r)
import numpy as np
from skani_tpu import multihost
assert multihost.init_from_env()
import jax
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

from skani_tpu import CommandParams, SketchParams
from skani_tpu.sketch import sketch_file, sketch_file_individual

sp = SketchParams(c=30, marker_c=200)
cp = CommandParams()
refs = sketch_file_individual("/root/reference/test_files/viruses.fna", sp)
refs += [sketch_file("/root/reference/test_files/o157_plasmid.fasta", sp)]
refs = refs * 2          # 8 refs over 8 global devices
queries = refs[:3]
fleet = multihost.MultiHostPairFleet(refs, queries, sp, cp, batch=4,
                                     i_cap=128, c_cap=64, l_cap=512)
pairs = [(rg, qg) for rg in range(len(refs)) for qg in range(len(queries))]
res = fleet.run_pairs(pairs)
# Gloo writes its connection log lines straight to fd 1 during collectives,
# interleaving mid-line with print(); buffer everything and emit with one
# atomic write after the last collective.
lines = []
for (rg, qg), r in zip(pairs, res):
    lines.append(" ".join(["PAIR", str(rg), str(qg),
                           repr(float(np.float32(r.ani))),
                           repr(float(np.float32(r.align_fraction_query))),
                           repr(float(np.float32(r.align_fraction_ref)))]))
lines.append("WORKER_DONE")
import os
os.write(1, ("\n".join(lines) + "\n").encode())
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_fleet_matches_native():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ, PYTHONPATH=REPO,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   SKANI_TPU_COORDINATOR=f"localhost:{port}",
                   SKANI_TPU_NUM_PROCS="2",
                   SKANI_TPU_PROC_ID=str(pid))
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER % REPO],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1800)
        assert "WORKER_DONE" in out, out[-2000:] + err[-2000:]
        outs.append([ln for ln in out.splitlines() if ln.startswith("PAIR")])

    # both processes see the identical merged result list
    assert outs[0] == outs[1]
    assert len(outs[0]) == 24

    # and it matches the single-process native path
    import numpy as np

    from skani_tpu import CommandParams, SketchParams
    from skani_tpu.ani import chain_seeds_native
    from skani_tpu.params import map_params_from_sketch
    from skani_tpu.sketch import sketch_file, sketch_file_individual

    sp = SketchParams(c=30, marker_c=200)
    cp = CommandParams()
    refs = sketch_file_individual("/root/reference/test_files/viruses.fna",
                                  sp)
    refs += [sketch_file("/root/reference/test_files/o157_plasmid.fasta",
                         sp)]
    refs = refs * 2
    queries = refs[:3]
    got = {}
    for ln in outs[0]:
        _tag, rg, qg, ani, afq, afr = ln.split()
        got[(int(rg), int(qg))] = (ani, afq, afr)
    for (rg, qg), (ani, afq, afr) in got.items():
        mp = map_params_from_sketch(refs[rg], False, cp, None)
        b = chain_seeds_native(refs[rg], queries[qg], mp)
        want = (repr(float(np.float32(b.ani))),
                repr(float(np.float32(b.align_fraction_query))),
                repr(float(np.float32(b.align_fraction_ref))))
        if "nan" in want[0]:
            assert "nan" in ani, (rg, qg, ani, want)
        else:
            assert (ani, afq, afr) == want, (rg, qg, (ani, afq, afr), want)


def test_multihost_cli_triangle_matches_single(tmp_path):
    """Full CLI under a 2-process jax.distributed runtime: host 0's output
    file equals the single-process run byte-for-byte (host 1 writes to
    /dev/null)."""
    vir = "/root/reference/test_files/viruses.fna"
    single = tmp_path / "single.tsv"
    env0 = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    env0.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, "-m", "skani_tpu", "triangle", vir,
                        "-i", "--sparse", "-o", str(single)],
                       capture_output=True, text=True, env=env0,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    port = _free_port()
    outs = [tmp_path / "mh0.tsv", tmp_path / "mh1.tsv"]
    procs = []
    for pid in range(2):
        env = dict(os.environ, PYTHONPATH=REPO,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   SKANI_TPU_COORDINATOR=f"localhost:{port}",
                   SKANI_TPU_NUM_PROCS="2",
                   SKANI_TPU_PROC_ID=str(pid),
                   # force the device executor so the multi-host fleet
                   # actually routes these tiny batches
                   SKANI_TPU_EXECUTOR="tpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "skani_tpu", "triangle", vir, "-i",
             "--sparse", "-o", str(outs[pid])],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env))
    for p in procs:
        _out, err = p.communicate(timeout=1800)
        assert p.returncode == 0, err[-2000:]
    assert sorted(single.read_text().splitlines()) == \
        sorted(outs[0].read_text().splitlines())


def test_multihost_search_owner_sharded(tmp_path):
    """2-process search against a sharded consolidated DB: each host loads
    only its owned sketches (the rest pass as marker stubs) and host 0's
    output equals the single-process run."""
    db_dir = tmp_path / "db"
    env0 = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    env0.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-m", "skani_tpu", "sketch",
         "/root/reference/test_files/viruses.fna",
         "/root/reference/test_files/o157_plasmid.fasta", "-i",
         "-o", str(db_dir), "--shards", "2"],
        capture_output=True, text=True, env=env0, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    single = tmp_path / "single.tsv"
    r = subprocess.run(
        [sys.executable, "-m", "skani_tpu", "search", "-d", str(db_dir),
         "/root/reference/test_files/viruses.fna", "-o", str(single)],
        capture_output=True, text=True, env=env0, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    port = _free_port()
    outs = [tmp_path / "mh0.tsv", tmp_path / "mh1.tsv"]
    procs = []
    for pid in range(2):
        env = dict(env0,
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   SKANI_TPU_COORDINATOR=f"localhost:{port}",
                   SKANI_TPU_NUM_PROCS="2",
                   SKANI_TPU_PROC_ID=str(pid),
                   SKANI_TPU_EXECUTOR="tpu")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "skani_tpu", "search", "-d", str(db_dir),
             "/root/reference/test_files/viruses.fna", "-o",
             str(outs[pid])],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env))
    for p in procs:
        _out, err = p.communicate(timeout=1800)
        assert p.returncode == 0, err[-2000:]
    assert sorted(single.read_text().splitlines()) == \
        sorted(outs[0].read_text().splitlines())
    assert len(single.read_text().splitlines()) >= 3
