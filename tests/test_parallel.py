"""Sharded screening: exactness vs host MarkerIndex on a virtual CPU mesh.

Runs in a subprocess so the CPU device count can be forced before jax init.
"""
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

SCRIPT = r"""
import numpy as np
import sys
sys.path.insert(0, %r)
from skani_tpu import SketchParams
from skani_tpu.sketch import sketch_file
from skani_tpu.screen import MarkerIndex
from skani_tpu.parallel import ShardedMarkerScreen

sp = SketchParams(c=30, marker_c=200)
pl = sketch_file("/root/reference/test_files/o157_plasmid.fasta", sp)
v = sketch_file("/root/reference/test_files/viruses.fna", sp)
import skani_tpu.sketch as sk
sketches = [pl, v] * 5  # 10 genomes over 8 shards -> uneven shards
host = MarkerIndex(sketches)
dev = ShardedMarkerScreen(sketches)
assert dev.n_dev == 8, dev.n_dev
for q in (pl, v):
    a = host.counts_for(q.marker_seeds)
    b = dev.counts(q.marker_seeds)
    assert np.array_equal(a, b), (a, b)
    s1 = set(dev.screen(q, 0.8, False, False).tolist())
    from skani_tpu.screen import screen_refs
    s2 = set(screen_refs(0.8, host, q, sp, False).tolist())
    assert s1 == s2, (s1, s2)
print("SHARDED_OK")
"""


def test_sharded_screen_matches_host():
    env = dict(os.environ, PYTHONPATH=REPO,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, "-c", SCRIPT % REPO],
                       capture_output=True, text=True, env=env, timeout=300)
    assert "SHARDED_OK" in r.stdout, r.stdout + r.stderr


FLEET_SCRIPT = r"""
import numpy as np
import sys
sys.path.insert(0, %r)
from skani_tpu import CommandParams, SketchParams
from skani_tpu.sketch import sketch_file
from skani_tpu.parallel import ShardedPairFleet
from skani_tpu.ani import chain_seeds_native
from skani_tpu.params import map_params_from_sketch
import jax
assert len(jax.devices()) == 8

sp = SketchParams()
files = ["/root/reference/test_files/o157_plasmid.fasta",
         "/root/reference/test_files/viruses.fna",
         "/root/reference/test_files/e.coli-W.fasta.gz"]
refs = [sketch_file(f, sp) for f in files] * 3   # 9 refs over 8 devices
queries = [sketch_file(files[2], sp), sketch_file(files[0], sp)]
cp = CommandParams()
fleet = ShardedPairFleet(refs, queries, sp, cp)
pairs = [(rg, qg) for rg in range(len(refs)) for qg in range(len(queries))]
res = fleet.run_pairs(pairs)
bad = 0
for (rg, qg), a in zip(pairs, res):
    mp = map_params_from_sketch(refs[rg], False, cp, None)
    b = chain_seeds_native(refs[rg], queries[qg], mp)
    eq = (np.isnan(a.ani) and np.isnan(b.ani)) or (
        a.ani == b.ani and a.align_fraction_query == b.align_fraction_query
        and a.align_fraction_ref == b.align_fraction_ref)
    if not eq:
        bad += 1
        print("MISMATCH", rg, qg, a.ani, b.ani)
assert bad == 0, bad
print("FLEET_OK")
"""


import pytest


@pytest.mark.parametrize("compact", ["0", "2"])
def test_sharded_pair_fleet_matches_native(compact):
    """compact='2' re-runs the fleet with the compact-stream DP in
    interpret mode — the multi-device path under the compact kernel."""
    env = dict(os.environ, PYTHONPATH=REPO,
               JAX_PLATFORMS="cpu",
               SKANI_TPU_COMPACT_DP=compact,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, "-c", FLEET_SCRIPT % REPO],
                       capture_output=True, text=True, env=env, timeout=600)
    assert "FLEET_OK" in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]


FLEET_FUZZ_SCRIPT = r"""
import sys, numpy as np
sys.path.insert(0, %r)
from skani_tpu import CommandParams, SketchParams
from skani_tpu.sketch import Sketch, _finalize_sketch, default_seeder
from skani_tpu.ani import chain_seeds_native
from skani_tpu.params import map_params_from_sketch
from skani_tpu.parallel import ShardedPairFleet
import jax
assert len(jax.devices()) == 8
BASES = np.frombuffer(b"ACGTacgtNn", dtype=np.uint8)
def mk(rng, parts, sp, name):
    seeder = default_seeder()
    sk = Sketch(file_name=name, marker_c=sp.c, c=sp.c, k=sp.k)
    kms, pos, cas, ctg, mas = [], [], [], [], []
    j = 0
    for s in parts:
        if len(s) < 500: continue
        sk.contigs.append(f"{name}_c{j}")
        sk.contig_lengths = np.append(sk.contig_lengths, np.uint32(len(s)))
        sk.total_sequence_length += len(s)
        km, po, ca, ma = seeder(s, sp)
        if len(km):
            kms.append(km); pos.append(po); cas.append(ca)
            ctg.append(np.full(len(km), j, np.uint32))
        if len(ma): mas.append(ma)
        j += 1
    _finalize_sketch(sk, kms, pos, cas, ctg, mas)
    return sk
rng = np.random.default_rng(321)
sp = SketchParams(c=70, k=14, marker_c=200)
cp = CommandParams(robust=True)
base = BASES[rng.integers(0,4,size=80000)]
refs = []
for g in range(11):   # uneven across 8 shards
    nc = int(rng.integers(1,4))
    parts = []
    for _ in range(nc):
        cl = int(rng.integers(700, 80000//nc))
        s = base[:cl].copy()
        nm = int(cl*rng.uniform(0.0, 0.05))
        if nm:
            p = rng.choice(cl, size=nm, replace=False)
            s[p] = BASES[rng.integers(0,4,size=nm)]
        parts.append(s)
    refs.append(mk(rng, parts, sp, f"r{g}"))
queries = refs[:2] + [refs[7]]
fleet = ShardedPairFleet(refs, queries, sp, cp, batch=3,
                         i_cap=128, c_cap=16, l_cap=512)
pairs = [(rg, qg) for rg in range(11) for qg in range(3)]
res = fleet.run_pairs(pairs)
bad = 0
for (rg, qg), a in zip(pairs, res):
    mp = map_params_from_sketch(refs[rg], False, cp, None)
    b = chain_seeds_native(refs[rg], queries[qg], mp)
    ok = (np.isnan(a.ani) and np.isnan(b.ani)) or (a.ani==b.ani and a.align_fraction_query==b.align_fraction_query and a.ci_lower==b.ci_lower)
    if not ok:
        bad += 1
        print("FLEET MISMATCH", rg, qg, a.ani, b.ani)
print(f"fleet fuzz: {len(pairs)} pairs, {bad} mismatches")
"""


def test_sharded_pair_fleet_fuzz():
    """Randomized multi-contig genomes over an uneven 8-shard fleet."""
    env = dict(os.environ, PYTHONPATH=REPO,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, "-c", FLEET_FUZZ_SCRIPT % REPO],
                       capture_output=True, text=True, env=env, timeout=900)
    assert "fleet fuzz: 33 pairs, 0 mismatches" in r.stdout, \
        r.stdout[-2000:] + r.stderr[-2000:]
