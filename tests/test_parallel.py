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
