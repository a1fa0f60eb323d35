#!/usr/bin/env python3
"""Scaling-efficiency probe for the sharded pair fleet on a virtual mesh.

Runs the same all-vs-all workload through ShardedPairFleet at 1/2/4/8
virtual CPU devices and reports, per device count:

  * total wall time and pairs/s;
  * per-device assigned pair counts and busy seconds -> load imbalance
    (max busy / mean busy — the quantity that eats scaling efficiency on
    real multi-chip hardware);
  * scheduling+merge overhead: wall - max(busy) (the time not explained
    by the busiest device's own work).

On this 1-core host all virtual devices share one core, so WALL times do
not show speedup — imbalance and overhead are the meaningful outputs, and
they are exactly what bounds efficiency the moment real chips appear:

  efficiency(n) <= mean_busy / max_busy * (1 - overhead_frac)

Each device count runs in a fresh subprocess (the CPU device count is
fixed at JAX init).  Usage: python scripts/scaling_probe.py [n_genomes]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import bench
from skani_tpu import CommandParams
from skani_tpu.parallel import ShardedPairFleet

n = %(n_genomes)d
genomes = bench.make_genomes(n)
sketches, params = bench.sketch_genomes(genomes)
pairs = [(i, j) for i in range(n) for j in range(n) if i < j]

import jax
devs = jax.devices()
fleet = ShardedPairFleet(sketches, sketches, params, CommandParams(),
                         batch=12, devices=devs)

# instrument per-device busy time
busy = [0.0] * len(devs)
counts = [0] * len(devs)
orig = [e.run_pairs for e in fleet.engines]
def wrap(d):
    def f(p, **kw):
        t0 = time.perf_counter()
        r = orig[d](p, **kw)
        busy[d] += time.perf_counter() - t0
        counts[d] += len(p)
        return r
    return f
for d, e in enumerate(fleet.engines):
    e.run_pairs = wrap(d)

fleet.run_pairs(pairs[: 2 * len(devs)])      # warm compiles
for d in range(len(devs)):
    busy[d] = 0.0; counts[d] = 0
t0 = time.perf_counter()
res = fleet.run_pairs(pairs)
wall = time.perf_counter() - t0
assert all(r is not None for r in res)
print(json.dumps(dict(n_dev=len(devs), wall=wall, busy=busy,
                      counts=counts, pairs=len(pairs))))
"""


def main():
    n_genomes = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"# scaling probe: {n_genomes} genomes, "
          f"{n_genomes * (n_genomes - 1) // 2} unique pairs, "
          f"virtual CPU mesh (1-core host: read imbalance/overhead, "
          f"not wall)")
    print(f"{'n_dev':>5} {'pairs/s':>8} {'imbalance':>9} "
          f"{'overhead%':>9} {'eff_bound':>9}")
    for n_dev in (1, 2, 4, 8):
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS=f"--xla_force_host_platform_device_count="
                             f"{n_dev}",
                   PYTHONPATH=REPO)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        code = WORKER % dict(repo=REPO, n_genomes=n_genomes)
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            print(f"{n_dev:>5} FAILED: {r.stderr[-500:]}")
            continue
        d = json.loads(r.stdout.strip().splitlines()[-1])
        busy = [b for b in d["busy"] if b > 0]
        mean_busy = sum(busy) / max(len(busy), 1)
        max_busy = max(busy) if busy else 0.0
        imb = max_busy / mean_busy if mean_busy else 1.0
        overhead = max(0.0, d["wall"] - sum(busy))  # 1-core: busy serializes
        ofrac = overhead / d["wall"] if d["wall"] else 0.0
        eff_bound = (1.0 / imb) * (1.0 - ofrac)
        print(f"{n_dev:>5} {d['pairs'] / d['wall']:>8.1f} {imb:>9.2f} "
              f"{100 * ofrac:>8.1f}% {100 * eff_bound:>8.1f}%")


if __name__ == "__main__":
    main()
