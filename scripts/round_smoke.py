#!/usr/bin/env python3
"""Round-start env-flag smoke: every shipping flag combination must
compile and match the native path on the attached accelerator.

Round 4 shipped with the non-default merged-readback path broken at
HEAD because nothing exercised the flag matrix on hardware after the
kernels changed.  This script runs a small fixed workload (6 unique
pairs of E. coli-scale mutants) through the device engine under each
flag combination IN A SUBPROCESS (env flags are read at import/trace
time) and bit-compares against the native reference path.

Usage: python scripts/round_smoke.py          # all combos
       python scripts/round_smoke.py fast     # default combo only
Exit code: number of failing combos.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# one entry per shipping flag, exercising its non-default value(s);
# SKANI_TPU_EXPAND_KERNEL is a documented negative-result knob and only
# smoke-checked for exactness, not speed
COMBOS = [
    ("default", {}),
    ("merge_read", {"SKANI_TPU_MERGE_READ": "3"}),
    ("merge_put", {"SKANI_TPU_MERGE_READ": "3", "SKANI_TPU_MERGE_PUT": "3"}),
    ("fused_regroup", {"SKANI_TPU_FUSED_REGROUP": "1",
                       "SKANI_TPU_COMPACT_DP": "0"}),
    ("padded_dp", {"SKANI_TPU_COMPACT_DP": "0"}),
    ("join_dense", {"SKANI_TPU_JOIN": "dense"}),
    ("join_merge", {"SKANI_TPU_JOIN": "merge",
                    "SKANI_TPU_DENSE_JOIN_MB": "0"}),
    ("bf16_onehot", {"SKANI_TPU_ONEHOT_I8": "0"}),
    ("no_mxu_scatter", {"SKANI_TPU_MXU_SCATTER": "0"}),
    ("no_fused_apk", {"SKANI_TPU_FUSED_APK": "0"}),
    ("narrow_batch", {"SKANI_TPU_RMAX": "0"}),
    ("wide_batch", {"SKANI_TPU_RMAX": "256"}),
    ("expand_kernel", {"SKANI_TPU_EXPAND_KERNEL": "1"}),
]

WORKER = r"""
import os, sys
import numpy as np
sys.path.insert(0, %(root)r)
import bench
from skani_tpu import CommandParams, map_params_from_sketch
from skani_tpu.ani import chain_seeds_native

genomes = bench.make_genomes(4)
sketches, params = bench.sketch_genomes(genomes)
pairs = [(i, j) for i in range(4) for j in range(4) if i < j]
res = bench.run_pairs_device(sketches, params, pairs, host_workers=0)
cp = CommandParams()
bad = 0
for (i, j), a in zip(pairs, res):
    mp = map_params_from_sketch(sketches[i], False, cp, None)
    b = chain_seeds_native(sketches[i], sketches[j], mp)
    if np.isnan(a.ani) and np.isnan(b.ani):
        continue
    bad += not (a.ani == b.ani
                and a.align_fraction_query == b.align_fraction_query
                and a.ci_lower == b.ci_lower)
print("SMOKE_RESULT", bad)
sys.exit(1 if bad else 0)
"""


def main():
    combos = COMBOS[:1] if "fast" in sys.argv[1:] else COMBOS
    root = os.path.dirname(HERE)
    failures = []
    for name, env in combos:
        e = dict(os.environ)
        e.update(env)
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c",
                            WORKER % {"root": root}],
                           env=e, capture_output=True, text=True,
                           timeout=1800)
        dt = time.time() - t0
        ok = r.returncode == 0 and "SMOKE_RESULT 0" in r.stdout
        print(f"{name:16s} {'OK' if ok else 'FAIL'}  {dt:6.1f}s  {env}",
              flush=True)
        if not ok:
            failures.append(name)
            tail = (r.stdout + r.stderr).strip().splitlines()[-8:]
            for line in tail:
                print("    " + line)
    print(json.dumps({"combos": len(combos), "failures": failures}))
    sys.exit(len(failures))


if __name__ == "__main__":
    main()
