#!/usr/bin/env python3
"""Time-bounded randomized differential soak: device engine vs native.

Rolls random sketch params / genome shapes / engine configs and checks
the device engine (padded or compact DP, alternating) against the exact
native path.  Unlike tests/ (fixed seeds, fast), this explores the
config space for as long as you let it — run it before flipping an
engine default.

Usage: python scripts/soak_fuzz.py [minutes] [base_seed]
Env:   JAX_PLATFORMS=cpu recommended (the point is semantics, not speed)
Exit:  0 = every config matched; 1 = a mismatch was found (printed).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import test_device_fuzz as fz  # noqa: E402  (reuses the fuzz generators)

from skani_tpu import CommandParams, SketchParams  # noqa: E402
from skani_tpu.ani import chain_seeds_native  # noqa: E402
from skani_tpu.params import map_params_from_sketch  # noqa: E402


def one_config(seed: int) -> int:
    """Returns the number of mismatching pairs for one random config."""
    from skani_tpu.kernels.device_pipeline import DevicePairEngine

    rng = np.random.default_rng(seed)
    c = int(rng.choice([30, 70, 100, 125, 200]))
    k = int(rng.choice([12, 14, 15, 16]))
    n_genomes = int(rng.integers(3, 6))
    glen = int(rng.integers(60_000, 200_000))
    compact = str(rng.integers(0, 2) * 2)    # "0" (padded) or "2"
    sp = SketchParams(c=c, k=k, marker_c=max(c, 200))
    cp = CommandParams(robust=bool(rng.integers(0, 2)),
                       median=bool(rng.integers(0, 2)))
    if cp.median:
        cp.robust = False
    base = fz.BASES[rng.integers(0, 4, size=glen)]
    sks = []
    for g in range(n_genomes):
        parts = fz._rand_genome(rng, glen, int(rng.integers(1, 7)),
                                repeat=(g == n_genomes - 1),
                                src=base if g else None)
        sks.append(fz._mk_sketch(parts, sp, f"s{seed}g{g}"))
    os.environ["SKANI_TPU_COMPACT_DP"] = compact
    os.environ["SKANI_TPU_FUSED_REGROUP"] = str(rng.integers(0, 2))
    eng = DevicePairEngine(sks, sp, cp, batch=int(rng.integers(2, 5)),
                           i_cap=256, c_cap=64,
                           l_cap=int(rng.choice([512, 1024])))
    pairs = [(i, j) for i in range(n_genomes) for j in range(n_genomes)
             if i != j]
    res = eng.run_pairs(pairs, host_workers=0)
    bad = 0
    for (i, j), a in zip(pairs, res):
        mp = map_params_from_sketch(sks[i], False, cp, None)
        b = chain_seeds_native(sks[i], sks[j], mp)
        if np.isnan(a.ani) and np.isnan(b.ani):
            continue
        if not (a.ani == b.ani
                and a.align_fraction_query == b.align_fraction_query
                and a.align_fraction_ref == b.align_fraction_ref
                and a.ci_lower == b.ci_lower and a.ci_upper == b.ci_upper):
            bad += 1
            print(f"  MISMATCH seed={seed} pair=({i},{j}) "
                  f"dev={a.ani} native={b.ani} c={c} k={k} "
                  f"compact={compact}", flush=True)
    print(f"seed={seed:6d} c={c:3d} k={k} n={n_genomes} glen={glen} "
          f"mode={eng.gen_mode:14s} compact={compact} "
          f"fused={os.environ['SKANI_TPU_FUSED_REGROUP']} "
          f"pairs={len(pairs)} mismatches={bad}", flush=True)
    return bad


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    # Long soaks self-slice into ~6-minute CHILD subprocesses: a single
    # long-lived XLA:CPU process accumulates one mmap region per
    # compiled shape and eventually exhausts vm.max_map_count (LLVM
    # "Cannot allocate memory", then SIGSEGV) — an XLA:CPU limitation,
    # not an engine bug; every config before the crash matched.
    slice_min = float(os.environ.get("SOAK_SLICE_MIN", "6"))
    if "SOAK_CHILD" not in os.environ and minutes > slice_min:
        import subprocess
        deadline = time.time() + minutes * 60
        seed = base
        total_bad = n = 0
        while time.time() < deadline:
            left = (deadline - time.time()) / 60
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 str(min(slice_min, left)), str(seed)],
                env=dict(os.environ, SOAK_CHILD="1"), capture_output=True,
                text=True)
            sys.stdout.write(r.stdout)
            last = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("soak:")]
            if last:
                parts = last[-1].split()
                n += int(parts[1])
                total_bad += int(parts[3])
                seed += int(parts[1])
            else:   # child crashed mid-config (resource exhaustion)
                sys.stderr.write(f"# soak child rc={r.returncode}; "
                                 f"restarting past seed {seed}\n")
                done = r.stdout.count("seed=") or 1
                seed += done
            if r.returncode not in (0, -11) and last and total_bad:
                break
        print(f"soak TOTAL: {n} configs, {total_bad} mismatching pairs")
        sys.exit(1 if total_bad else 0)
    deadline = time.time() + minutes * 60
    seed = base
    total_bad = 0
    n = 0
    while time.time() < deadline:
        total_bad += one_config(seed)
        seed += 1
        n += 1
    print(f"soak: {n} configs, {total_bad} mismatching pairs")
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
