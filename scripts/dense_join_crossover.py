#!/usr/bin/env python3
"""Measure the dense-join memory-budget crossover (VERDICT r2 weak #7).

The device engine picks between three join layouts (kernels/device_db.py):
merge (sorted-merge per pair), dense (DB-wide kmer-union axis), and
dense_pos (position-axis row gather).  The dense layouts cost
G x U(nion) device words up front but make the per-pair join a single
row gather; SKANI_TPU_DENSE_JOIN_MB (default 512) gates them by table
size.  This probe times the same pair workload under each layout at
several DB sizes so the budget default is a measurement, not a guess.

Usage: python scripts/dense_join_crossover.py [n_genomes ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("SKANI_TPU_SEEDER", "native")

import bench
from skani_tpu import CommandParams
from skani_tpu.kernels.device_pipeline import DevicePairEngine


def run(sketches, params, pairs, budget_mb):
    os.environ["SKANI_TPU_DENSE_JOIN_MB"] = str(budget_mb)
    eng = DevicePairEngine(sketches, params, CommandParams())
    t0 = time.time()
    eng.run_pairs(pairs[:4], host_workers=0)       # warm compiles
    warm = time.time() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        res = eng.run_pairs(pairs, host_workers=0)
        best = min(best, time.time() - t0)
    assert all(r is not None for r in res)
    return eng.join_mode, len(pairs) / best, warm


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [10, 20, 40]
    print(f"{'n_gen':>5} {'pairs':>6} {'join_mode':>9} {'pairs/s':>8} "
          f"{'warm_s':>7}")
    for n in sizes:
        genomes = bench.make_genomes(n)
        sketches, params = bench.sketch_genomes(genomes)
        pairs = [(i, j) for i in range(n) for j in range(n) if i < j]
        for budget in (4096, 0):       # dense (ample budget) vs forced merge
            mode, rate, warm = run(sketches, params, pairs, budget)
            print(f"{n:>5} {len(pairs):>6} {mode:>9} {rate:>8.1f} "
                  f"{warm:>7.1f}")


if __name__ == "__main__":
    main()
